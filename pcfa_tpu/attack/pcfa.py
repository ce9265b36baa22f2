"""PCFA attack engine: the whole perturbation optimization as ONE jitted scan.

TPU-native rebuild of `pcfa_attack` (`attack_PCFA.py:40-294`). The reference
runs a host loop of 20 outer steps, each calling torch-L-BFGS with a closure
that re-runs forward+backward through the frozen flow net (≈200+ full passes,
each synchronizing to host). Here the full optimization — L-BFGS iterations,
flow re-predictions, metric bookkeeping, best-δ tracking — is a single
`lax.scan` over outer steps with an inner scan over L-BFGS iterations,
compiled once per (network, shape): zero host round-trips until the final
result fetch. The per-outer-step unit is also exposed (`pcfa_init` /
`pcfa_outer_step`) for host-driven stepping (streaming logs, bounded device
program runtimes).

Semantics preserved (vs reference):
  * torch L-BFGS(max_iter=10, lr=1, no line search), optimizer state
    persisting across outer steps (`attack_PCFA.py:97,114,192`) — see
    `pcfa_tpu/attack/lbfgs.py` for the exact iteration mapping. The
    reference's extra `loss.backward()` before `.step(closure)`
    (`attack_PCFA.py:173`) has no optimization effect (the closure starts by
    zeroing grads), so it is not replicated.
  * disjoint mode optimizes the two network inputs directly (clipping) or
    their tanh-space preimages (change_of_variables); joint mode optimizes
    one δ added to both frames, clipped inside the model
    (`own_models.py:62-80`); joint+COV is rejected (`attack_PCFA.py:91-92`).
  * best-δ-under-bound tracking with the reference's exact update rule
    (`attack_PCFA.py:226-247`), including the float-equality tie-break.
  * per-outer-step metric vocabulary (`aee_predadv-tgt`, `aee_pred-predadv`,
    `l2_delta1/2/-avg`, `*_min`) as arrays of shape (steps,).

The engine is shape-generic and vmap/shard_map-compatible: `flow_fn` maps
*padded* unit-range image batches to the flow used in the loss (the caller
composes `model.apply` with `InputPadder.unpad`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from pcfa_tpu.attack import boxconstraint as bc
from pcfa_tpu.attack.lbfgs import LBFGSState, lbfgs_init, lbfgs_iteration
from pcfa_tpu.attack.losses import (
    avg_epe,
    default_mu,
    loss_delta_constraint,
    two_norm_avg,
    two_norm_avg_delta,
)


@dataclasses.dataclass(frozen=True)
class PCFAConfig:
    """Static attack hyper-parameters (defaults = `parsing_file.py:52,72-77`)."""

    steps: int = 20
    max_iter: int = 10           # torch LBFGS max_iter (`attack_PCFA.py:97,114`)
    delta_bound: float = 0.005
    mu: float | None = None      # None → 2500/bound heuristic (`:580-584`)
    loss: str = "aee"
    target: str = "zero"         # used only for the mu heuristic here
    boxconstraint: str = "clipping"
    joint_perturbation: bool = False
    eps_box: float = 1e-7        # `attack_PCFA.py:330,608`
    lr: float = 1.0
    history_size: int = 100      # torch LBFGS default
    # 'two_loop' (torch-identical rounding) or 'compact' (Byrd–Nocedal–
    # Schnabel matmul form — algebraically identical, MXU-friendly; 2.1×
    # cheaper per full-history iteration on v5e: 100.9 → 47.8 ms)
    lbfgs_direction: str = "two_loop"
    # None → fp32 curvature-pair storage; 'bfloat16' halves the optimizer's
    # HBM footprint/streams (2.25 → 1.12 GB per KITTI pair)
    lbfgs_history_dtype: str | None = None

    def resolved_mu(self) -> float:
        if self.mu is not None and self.mu >= 0:
            return self.mu
        return default_mu(self.delta_bound, self.target)

    def __post_init__(self):
        if self.joint_perturbation and self.boxconstraint == "change_of_variables":
            raise ValueError(
                "Training a --joint_perturbation with "
                "--boxconstraint=change_of_variables is not defined. "
                "Please use --boxconstraint=clipping."
            )


class PCFAMetrics(NamedTuple):
    """Per-outer-step metric trajectories, shape (steps,)."""

    loss: jnp.ndarray
    aee_adv_tgt: jnp.ndarray      # aee_predadv-tgt
    aee_adv_pred: jnp.ndarray     # aee_pred-predadv
    l2_delta1: jnp.ndarray
    l2_delta2: jnp.ndarray
    l2_delta12: jnp.ndarray       # l2_delta-avg
    aee_adv_tgt_min: jnp.ndarray  # aee_pred-tgt_min
    aee_adv_pred_min: jnp.ndarray
    l2_delta12_min: jnp.ndarray   # l2_delta-avg_min


class PCFABest(NamedTuple):
    """Best-δ-under-bound tracking state (`attack_PCFA.py:147-153`)."""

    below: jnp.ndarray
    l2_min: jnp.ndarray
    aee_tgt_min: jnp.ndarray
    aee_pred_min: jnp.ndarray
    delta1: jnp.ndarray
    delta2: jnp.ndarray
    flow: jnp.ndarray


class PCFAState(NamedTuple):
    opt: LBFGSState
    best: PCFABest


class PCFAResult(NamedTuple):
    delta1: jnp.ndarray           # final effective δ1 (image shape)
    delta2: jnp.ndarray
    delta1_best: jnp.ndarray      # best-under-bound δ (`attack_PCFA.py:241-242`)
    delta2_best: jnp.ndarray
    flow_pred_init: jnp.ndarray   # unattacked prediction
    flow_pred: jnp.ndarray        # prediction with final δ
    flow_pred_best: jnp.ndarray   # prediction at the best δ
    metrics: PCFAMetrics


def _flatten2(a: jnp.ndarray, b: jnp.ndarray):
    return jnp.concatenate([a.ravel(), b.ravel()])


def _make_problem(flow_fn, image1, image2, target, cfg: PCFAConfig):
    """Closures mapping the flat optimizer variable to inputs/δs/loss."""
    mu = cfg.resolved_mu()
    img_shape = image1.shape
    n_img = image1.size

    if cfg.joint_perturbation:
        images_max = jnp.maximum(image1, image2)
        images_min = jnp.minimum(image1, image2)

        def network_inputs(x):
            d = x.reshape(img_shape)
            return (
                jnp.clip(image1 + d, 0.0, 1.0),
                jnp.clip(image2 + d, 0.0, 1.0),
            )

        def deltas(x):
            return bc.extract_deltas_joint(
                x.reshape(img_shape), images_max, images_min
            )

        x0 = jnp.zeros((n_img,), image1.dtype)
    else:
        def unpack(x):
            return x[:n_img].reshape(img_shape), x[n_img:].reshape(img_shape)

        def network_inputs(x):
            n1, n2 = unpack(x)
            return bc.perturbed_images(n1, n2, cfg.boxconstraint, cfg.eps_box)

        def deltas(x):
            n1, n2 = unpack(x)
            return bc.extract_deltas(
                n1, n2, image1, image2, cfg.boxconstraint, cfg.eps_box
            )

        i1, i2 = bc.init_nw_inputs(image1, image2, cfg.boxconstraint,
                                   cfg.eps_box)
        x0 = _flatten2(i1, i2)

    def objective(x):
        px1, px2 = network_inputs(x)
        flow = flow_fn(px1, px2)
        d1, d2 = deltas(x)
        return loss_delta_constraint(
            flow, target, d1, d2, cfg.delta_bound, mu, cfg.loss
        )

    return x0, network_inputs, deltas, jax.value_and_grad(objective)


def pcfa_init(
    flow_fn, image1, image2, config: PCFAConfig
) -> tuple[PCFAState, jnp.ndarray]:
    """(initial state, flow_pred_init) for one image pair/batch."""
    cfg = config
    x0, _, _, _ = _make_problem(flow_fn, image1, image2, None, cfg)
    flow_pred_init = flow_fn(image1, image2)
    best0 = PCFABest(
        below=jnp.asarray(False),
        l2_min=jnp.asarray(jnp.inf, image1.dtype),
        aee_tgt_min=jnp.asarray(jnp.inf, image1.dtype),
        aee_pred_min=jnp.asarray(0.0, image1.dtype),
        delta1=jnp.zeros(image1.shape, image1.dtype),
        delta2=jnp.zeros(image1.shape, image1.dtype),
        flow=flow_pred_init,
    )
    hdtype = (jnp.dtype(cfg.lbfgs_history_dtype)
              if cfg.lbfgs_history_dtype else None)
    return PCFAState(opt=lbfgs_init(x0, cfg.history_size, hdtype),
                     best=best0), flow_pred_init


def pcfa_outer_step(
    flow_fn,
    image1,
    image2,
    target,
    flow_pred_init,
    state: PCFAState,
    config: PCFAConfig,
) -> tuple[PCFAState, PCFAMetrics, jnp.ndarray]:
    """One reference outer step: a `max_iter` L-BFGS segment, flow
    re-prediction, metrics, best-δ update (`attack_PCFA.py:155-247`)."""
    cfg = config
    _, network_inputs, deltas, value_and_grad = _make_problem(
        flow_fn, image1, image2, target, cfg
    )
    opt, best = state

    def inner(opt, pos):
        return lbfgs_iteration(value_and_grad, opt, pos, lr=cfg.lr,
                               direction=cfg.lbfgs_direction)

    opt, seg_losses = jax.lax.scan(
        inner, opt, jnp.arange(cfg.max_iter, dtype=jnp.int32)
    )

    # re-predict with the updated variables (`attack_PCFA.py:206-212`)
    px1, px2 = network_inputs(opt.x)
    flow_pred = flow_fn(px1, px2)
    d1, d2 = deltas(opt.x)

    aee_adv_tgt = avg_epe(flow_pred, target)
    aee_adv_pred = avg_epe(flow_pred, flow_pred_init)
    l2_d12 = two_norm_avg_delta(d1, d2)

    # update rule `attack_PCFA.py:226-243`
    in_bound = l2_d12 <= cfg.delta_bound
    upd_not_below = (l2_d12 < best.l2_min) | (
        (l2_d12 == best.l2_min) & (aee_adv_tgt < best.aee_tgt_min)
    )
    upd_below = in_bound & (aee_adv_tgt < best.aee_tgt_min)
    update = jnp.where(best.below, upd_below, upd_not_below)
    below = best.below | (update & in_bound)

    def pick(new, old):
        return jnp.where(update, new, old)

    best = PCFABest(
        below=below,
        l2_min=pick(l2_d12, best.l2_min),
        aee_tgt_min=pick(aee_adv_tgt, best.aee_tgt_min),
        aee_pred_min=pick(aee_adv_pred, best.aee_pred_min),
        delta1=pick(d1, best.delta1),
        delta2=pick(d2, best.delta2),
        flow=pick(flow_pred, best.flow),
    )

    metrics = PCFAMetrics(
        loss=seg_losses[-1],
        aee_adv_tgt=aee_adv_tgt,
        aee_adv_pred=aee_adv_pred,
        l2_delta1=two_norm_avg(d1),
        l2_delta2=two_norm_avg(d2),
        l2_delta12=l2_d12,
        aee_adv_tgt_min=best.aee_tgt_min,
        aee_adv_pred_min=best.aee_pred_min,
        l2_delta12_min=best.l2_min,
    )
    return PCFAState(opt=opt, best=best), metrics, flow_pred


def pcfa_attack(
    flow_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    image1: jnp.ndarray,
    image2: jnp.ndarray,
    target: jnp.ndarray,
    config: PCFAConfig,
) -> PCFAResult:
    """Run the full PCFA optimization for one (batch of) image pair(s).

    image1/image2: unit-range, already padded to the network divisor
    (δ lives at padded size, like the reference — `attack_PCFA.py:63,72-73`).
    `flow_fn(x1, x2)` returns the (unpadded) flow entering the loss.
    `target` must match `flow_fn`'s output shape.
    """
    cfg = config
    state0, flow_pred_init = pcfa_init(flow_fn, image1, image2, cfg)
    _, _, deltas, _ = _make_problem(flow_fn, image1, image2, target, cfg)

    def outer(state, _):
        state, metrics, flow_pred = pcfa_outer_step(
            flow_fn, image1, image2, target, flow_pred_init, state, cfg
        )
        return state, (metrics, flow_pred)

    state, (metrics, flows) = jax.lax.scan(
        outer, state0, None, length=cfg.steps
    )

    d1_final, d2_final = deltas(state.opt.x)
    return PCFAResult(
        delta1=d1_final,
        delta2=d2_final,
        delta1_best=state.best.delta1,
        delta2_best=state.best.delta2,
        flow_pred_init=flow_pred_init,
        flow_pred=flows[-1],
        flow_pred_best=state.best.flow,
        metrics=metrics,
    )
