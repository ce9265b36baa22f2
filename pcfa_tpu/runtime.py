"""Model runtime: load a flow estimator and build the attack-facing flow_fn.

Equivalent of the reference's `import_and_load` + `preprocess_img` +
`compute_flow` + `postprocess_flow` pipeline (`ownutilities.py:64-343`),
collapsed into two calls:

    loaded = load_model("RAFT")                       # module + params + spec
    padder, flow_fn = make_flow_fn(loaded, (H, W))    # jittable, unpadded out

`flow_fn(x1, x2)` takes *padded* unit-range NHWC images and returns the
unpadded flow — the exact quantity entering the attack loss. There is no
`.cpu()` per forward (the reference syncs to host every prediction,
`ownutilities.py:297`); results stay on device until the caller fetches them.

Weights: looked up under `models/_pretrained_weights/` like the reference
(`ownutilities.py:98-160`; same filenames, so the reference's download
scripts populate us too). If absent, `load_model(..., init_random=True)`
builds deterministic random params — used by tests and benchmarks.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable

import jax
import jax.numpy as jnp

from pcfa_tpu.models import get_spec, make_model
from pcfa_tpu.utils.padder import InputPadder

#: default checkpoint locations, mirroring `ownutilities.py:98,113,130,154`
#: and `SpyNet.py:78`
WEIGHT_PATHS = {
    "RAFT": "models/_pretrained_weights/raft-sintel.pth",
    "GMA": "models/_pretrained_weights/gma-sintel.pth",
    "PWCNet": "models/_pretrained_weights/pwc_net_chairs.pth.tar",
    "FlowNet2": "models/_pretrained_weights/FlowNet2_checkpoint.pth.tar",
    "SpyNet": "models/_pretrained_weights/spynet_weights",
}


def _cache_path(name: str) -> str:
    return os.path.join("models", "_converted", f"{name}.msgpack")


def _ckpt_mtime(path: str) -> float:
    if os.path.isdir(path):  # SpyNet per-layer weight dir
        return max(
            (os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)),
            default=0.0,
        )
    return os.path.getmtime(path)


def _load_converted_cached(name: str, path: str, spec) -> dict:
    """Convert the torch checkpoint, caching the Flax tree as msgpack.

    Conversion needs torch and (for FlowNet2) unpickles 650 MB — the cache
    makes repeated CLI starts torch-free and fast. Invalidated when the
    checkpoint is newer than the cache."""
    from flax import serialization

    cache = _cache_path(name)
    try:
        if os.path.exists(cache) and (
            os.path.getmtime(cache) >= _ckpt_mtime(path)
        ):
            with open(cache, "rb") as f:
                return serialization.msgpack_restore(f.read())
    except OSError:
        pass

    params = spec.convert(path)
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(
                jax.tree.map(lambda a: __import__("numpy").asarray(a), params)
            ))
        os.replace(tmp, cache)
    except OSError:
        pass  # cache is best-effort
    return params


@dataclasses.dataclass
class LoadedModel:
    name: str
    module: object
    params: dict
    spec: object


def load_model(
    name: str,
    checkpoint: str | None = None,
    init_random: bool = False,
    seed: int = 0,
    **overrides,
) -> LoadedModel:
    """Build the Flax module for `name` and load converted torch weights.

    `checkpoint`: explicit path (file, or weights dir for SpyNet). Falls back
    to `WEIGHT_PATHS[name]`. With `init_random=True` missing weights are
    replaced by deterministic random init instead of raising."""
    module, spec = make_model(name, **overrides)
    path = checkpoint or WEIGHT_PATHS.get(name)

    params = None
    if path and os.path.exists(path):
        try:
            params = _load_converted_cached(name, path, spec)
        except FileNotFoundError as e:
            # e.g. an empty weights dir left behind by an aborted download
            # script: treat exactly like an absent checkpoint
            if not init_random:
                raise FileNotFoundError(
                    f"Loading the model failed, because the checkpoint at "
                    f"{path} is incomplete ({e}). Consider re-running "
                    f"scripts/load_all_weights.sh"
                ) from e
    if params is None:
        if not init_random:
            raise FileNotFoundError(
                f"Loading the model failed, because the checkpoint path was "
                f"invalid. Are the checkpoints placed in "
                f"models/_pretrained_weights/? Consider executing the "
                f"checkpoint loading script from scripts/load_all_weights.sh "
                f"(missing: {path})"
            )
        d = spec.pad_divisor
        x = jnp.zeros((1, 2 * d, 2 * d, 3), jnp.float32)
        params = module.init(jax.random.PRNGKey(seed), x, x)["params"]
    return LoadedModel(name=name, module=module, params=params, spec=spec)


def make_flow_fn_p(
    loaded: LoadedModel, image_hw: tuple[int, int], pad_mode: str = "sintel"
) -> tuple[InputPadder, Callable]:
    """(padder, flow_fn_p) with EXPLICIT params:
    `flow_fn_p(params, x1, x2)` maps PADDED unit-range (B,H',W',3) pairs →
    UNPADDED (B,H,W,2) flow; recurrent nets' (flow_lr, flow_up) tuples
    collapse to flow_up like `compute_flow` (`ownutilities.py:323-327`).

    Pass `loaded.params` as a jit ARGUMENT, never a closure: closed-over
    weights are embedded into the compile payload, which breaks remote
    compilation for FlowNet2's 650 MB of parameters.

    PCFA_COMPUTE_DTYPE=bfloat16 runs the network (params, activations,
    corr-volume storage) in bf16 while the flow entering the attack math
    stays fp32 — ~2× on HBM-bound TPU passes; see BASELINE.md for the
    measured attack-quality deviation before enabling it."""
    H, W = image_hw
    padder = InputPadder((H, W, 3), divisor=loaded.spec.pad_divisor,
                         mode=pad_mode)
    cdtype = os.environ.get("PCFA_COMPUTE_DTYPE")
    if cdtype in ("", "float32"):
        cdtype = None

    def flow_fn_p(params, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        if cdtype:
            params = jax.tree.map(lambda t: t.astype(cdtype), params)
            x1, x2 = x1.astype(cdtype), x2.astype(cdtype)
        out = loaded.module.apply({"params": params}, x1, x2)
        if isinstance(out, tuple):
            out = out[-1]
        return padder.unpad(out.astype(jnp.float32))

    return padder, flow_fn_p


def make_flow_fn(
    loaded: LoadedModel, image_hw: tuple[int, int], pad_mode: str = "sintel"
) -> tuple[InputPadder, Callable]:
    """(padder, flow_fn) with params closed over — convenient for small
    models and tests; prefer `make_flow_fn_p` at jit boundaries."""
    padder, flow_fn_p = make_flow_fn_p(loaded, image_hw, pad_mode)

    def flow_fn(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        return flow_fn_p(loaded.params, x1, x2)

    return padder, flow_fn
