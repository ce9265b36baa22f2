"""Universal-perturbation PCFA trainer: one δ for a whole dataset.

Rebuild of `attack_l2_universal` (`attack_PCFA.py:297-566`): a single
(H', W', C) perturbation added to every frame of every batch (broadcast over
the batch like `ScaledInputModel`'s `repeat`, `own_models.py:63-70`),
optimized by torch-semantics L-BFGS whose state persists across ALL batches
and epochs (`attack_PCFA.py:382-388`). Universal mode always uses clipping
(the perturbed images are clamped inside the model; there is no
change-of-variables path, `attack_PCFA.py:363`), and the penalty acts on the
raw δ.

The jitted unit is `universal_batch_attack`: `steps` L-BFGS segments on one
batch, taking and returning the on-device optimizer state. The host loop
(CLI) iterates epochs × batches, keeping state on device throughout.

Data parallelism: vmap/shard_map the `flow_fn` over a batch sharded across
devices; the δ-gradient then needs one `lax.psum` — see
`pcfa_tpu/parallel/`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from pcfa_tpu.attack.lbfgs import LBFGSState, lbfgs_init, lbfgs_iteration
from pcfa_tpu.attack.losses import (
    avg_epe,
    loss_delta_constraint,
    two_norm_avg,
    two_norm_avg_delta,
)


@dataclasses.dataclass(frozen=True)
class UniversalConfig:
    steps: int = 20
    max_iter: int = 10
    delta_bound: float = 0.005
    mu: float = 100.0          # resolve via PCFAConfig.resolved_mu upstream
    loss: str = "aee"
    joint_perturbation: bool = False
    lr: float = 1.0
    history_size: int = 100
    lbfgs_direction: str = "two_loop"   # see PCFAConfig.lbfgs_direction
    lbfgs_history_dtype: str | None = None


class UniversalMetrics(NamedTuple):
    loss: jnp.ndarray
    aee_adv_tgt: jnp.ndarray
    aee_adv_pred: jnp.ndarray
    l2_delta1: jnp.ndarray
    l2_delta2: jnp.ndarray
    l2_delta12: jnp.ndarray


def universal_init(
    delta_shape: tuple[int, ...], config: UniversalConfig
) -> LBFGSState:
    """Fresh L-BFGS state for δ=0 (`attack_PCFA.py:373-376`). `delta_shape`
    is the single-image padded shape (H', W', C)."""
    n = 1
    for s in delta_shape:
        n *= s
    if not config.joint_perturbation:
        n *= 2
    hdtype = (jnp.dtype(config.lbfgs_history_dtype)
              if config.lbfgs_history_dtype else None)
    return lbfgs_init(jnp.zeros((n,), jnp.float32), config.history_size,
                      hdtype)


def unpack_deltas(
    x: jnp.ndarray, delta_shape: tuple[int, ...], joint: bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    if joint:
        d1 = x.reshape(delta_shape)
        return d1, d1
    n = x.shape[0] // 2
    return x[:n].reshape(delta_shape), x[n:].reshape(delta_shape)


def universal_batch_attack(
    flow_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    images1: jnp.ndarray,
    images2: jnp.ndarray,
    target: jnp.ndarray,
    opt_state: LBFGSState,
    config: UniversalConfig,
) -> tuple[LBFGSState, UniversalMetrics, jnp.ndarray, jnp.ndarray]:
    """Run `steps` L-BFGS segments of `max_iter` iterations on one batch.

    images1/2: padded unit-range (B, H', W', 3); δ broadcasts over B.
    Returns (opt_state', per-step metrics, flow_pred_init, flow_pred)."""
    cfg = config
    delta_shape = images1.shape[1:]

    def perturbed(x):
        d1, d2 = unpack_deltas(x, delta_shape, cfg.joint_perturbation)
        px1 = jnp.clip(images1 + d1[None], 0.0, 1.0)
        px2 = jnp.clip(images2 + d2[None], 0.0, 1.0)
        return px1, px2, d1, d2

    def objective(x):
        px1, px2, d1, d2 = perturbed(x)
        flow = flow_fn(px1, px2)
        return loss_delta_constraint(
            flow, target, d1, d2, cfg.delta_bound, cfg.mu, cfg.loss
        )

    value_and_grad = jax.value_and_grad(objective)
    flow_pred_init = flow_fn(images1, images2)

    def outer(opt, _):
        def inner(opt, pos):
            return lbfgs_iteration(value_and_grad, opt, pos, lr=cfg.lr,
                                   direction=cfg.lbfgs_direction)

        opt, seg_losses = jax.lax.scan(
            inner, opt, jnp.arange(cfg.max_iter, dtype=jnp.int32)
        )
        px1, px2, d1, d2 = perturbed(opt.x)
        flow_pred = flow_fn(px1, px2)
        metrics = UniversalMetrics(
            loss=seg_losses[-1],
            aee_adv_tgt=avg_epe(flow_pred, target),
            aee_adv_pred=avg_epe(flow_pred, flow_pred_init),
            l2_delta1=two_norm_avg(d1),
            l2_delta2=two_norm_avg(d2),
            l2_delta12=two_norm_avg_delta(d1, d2),
        )
        return opt, (metrics, flow_pred)

    opt_state, (metrics, flows) = jax.lax.scan(
        outer, opt_state, None, length=cfg.steps
    )
    return opt_state, metrics, flow_pred_init, flows[-1]
