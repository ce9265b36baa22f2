"""Attack targets: zero flow, negated flow, custom flow field from file.

Rebuild of `helper_functions/targets.py` for channels-last (..., H, W, 2)
flow. Target selection is static (trace-time); the custom target is loaded
host-side with numpy and adapted (right/bottom reflect-pad or crop) to the
prediction size, matching `targets.py:33-86`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def zero_flow(flow: jnp.ndarray) -> jnp.ndarray:
    """`targets.py:9-18`"""
    return jnp.zeros_like(flow)


def neg_flow(flow: jnp.ndarray) -> jnp.ndarray:
    """`targets.py:21-30`"""
    return -flow


def load_custom_target(path_to_custom_target: str) -> np.ndarray:
    """Host-side load of a custom target flow file → (H, W, 2) float32.

    Accepts .npy/.flo/... via the generic reader (`targets.py:52`). The
    reference permutes to channels-first; we stay channels-last."""
    from pcfa_tpu.io.flow_io import read_gen

    data = read_gen(path_to_custom_target)
    if data is None or len(np.shape(data)) < 2:
        raise ValueError(
            f"The specified custom target file is not a valid flow file at "
            f"{path_to_custom_target}. Please specify a valid flow file via "
            f"--custom_target_path"
        )
    data = np.array(data).astype(np.float32)
    if data.ndim == 4:
        data = data[0]
    # Accept channels-first (2, H, W) artifacts (reference layout) as well.
    if data.ndim == 3 and data.shape[0] == 2 and data.shape[-1] != 2:
        data = np.transpose(data, (1, 2, 0))
    if data.ndim != 3 or data.shape[-1] != 2:
        raise ValueError(
            f"Custom target at {path_to_custom_target} has invalid shape {data.shape}"
        )
    return data


def fit_custom_target(target: np.ndarray, height: int, width: int) -> np.ndarray:
    """Crop or reflect-pad (right/bottom) a (H, W, 2) target to (height, width),
    mirroring the per-axis logic of `targets.py:60-78`."""
    # width axis
    if width < target.shape[1]:
        target = target[:, :width, :]
    elif width > target.shape[1]:
        target = np.pad(
            target, ((0, 0), (0, width - target.shape[1]), (0, 0)), mode="reflect"
        )
    # height axis
    if height < target.shape[0]:
        target = target[:height, :, :]
    elif height > target.shape[0]:
        target = np.pad(
            target, ((0, height - target.shape[0]), (0, 0), (0, 0)), mode="reflect"
        )
    return target


def make_target_fn(target_name: str, custom_target_path: str = ""):
    """Return a jit-safe function flow_pred_init (b, H, W, 2) → target.

    The returned closure is traced into the attack program; for 'custom' the
    file is read once here and becomes a constant (`targets.py:89-115`)."""
    if target_name == "zero":
        return zero_flow
    if target_name == "neg_flow":
        return neg_flow
    if target_name == "custom":
        data = load_custom_target(custom_target_path)

        def custom(flow: jnp.ndarray) -> jnp.ndarray:
            fitted = fit_custom_target(data, flow.shape[-3], flow.shape[-2])
            tgt = jnp.asarray(fitted)
            return jnp.broadcast_to(tgt, flow.shape)

        return custom
    raise ValueError(
        f'The specified target type "{target_name}" is not defined and cannot be '
        'used. Select one of "zero", "neg_flow" or "custom". Aborting.'
    )
