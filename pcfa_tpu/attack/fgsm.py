"""I-FGSM attack engine as one jitted scan.

Rebuild of `attack_FGSM.py:21-56,199-241`: iterated fast-gradient-sign steps
on the two network inputs, targeted (gradient *descent* toward the target,
`x ← clamp(x − ε·sign(∇x loss), 0, 1)`). Joint mode averages the two image
gradients before the sign (`attack_FGSM.py:42-45`).

One step = one forward+backward for the gradient plus one forward for the
metrics re-prediction, matching the reference's cost profile — but compiled
into a single `lax.scan` with no host synchronization.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from pcfa_tpu.attack.losses import avg_epe, get_loss, two_norm_avg, two_norm_avg_delta


@dataclasses.dataclass(frozen=True)
class FGSMConfig:
    steps: int = 20
    epsilon: float = 0.00025  # parsing_file.py:62 fgsm default
    loss: str = "aee"
    joint_perturbation: bool = False


class FGSMMetrics(NamedTuple):
    loss: jnp.ndarray
    aee_adv_tgt: jnp.ndarray
    aee_adv_pred: jnp.ndarray
    l2_delta1: jnp.ndarray
    l2_delta2: jnp.ndarray
    l2_delta12: jnp.ndarray


class FGSMResult(NamedTuple):
    delta1: jnp.ndarray
    delta2: jnp.ndarray
    flow_pred_init: jnp.ndarray
    flow_pred: jnp.ndarray
    metrics: FGSMMetrics


def fgsm_step(
    flow_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    image1: jnp.ndarray,
    image2: jnp.ndarray,
    target: jnp.ndarray,
    flow_pred_init: jnp.ndarray,
    carry: tuple[jnp.ndarray, jnp.ndarray],
    config: FGSMConfig,
):
    """ONE I-FGSM step: `carry = (nw1, nw2)` → updated carry +
    (metrics, flow_pred). `fgsm_attack` scans this; the bench drives it
    from host (bounded per-dispatch programs through tunneled backends,
    same pattern as `pcfa_outer_step`)."""
    cfg = config

    def loss_of(a, b):
        return get_loss(cfg.loss, flow_fn(a, b), target)

    grad_fn = jax.value_and_grad(loss_of, argnums=(0, 1))

    nw1, nw2 = carry
    loss, (g1, g2) = grad_fn(nw1, nw2)
    if cfg.joint_perturbation:
        g = 0.5 * (g1 + g2)
        s1 = s2 = jnp.sign(g)
    else:
        s1, s2 = jnp.sign(g1), jnp.sign(g2)
    nw1 = jnp.clip(nw1 - cfg.epsilon * s1, 0.0, 1.0)
    nw2 = jnp.clip(nw2 - cfg.epsilon * s2, 0.0, 1.0)

    d1 = nw1 - image1  # already clipped (`attack_FGSM.py:217-218`)
    d2 = nw2 - image2
    flow_pred = flow_fn(nw1, nw2)
    metrics = FGSMMetrics(
        loss=loss,
        aee_adv_tgt=avg_epe(flow_pred, target),
        aee_adv_pred=avg_epe(flow_pred, flow_pred_init),
        l2_delta1=two_norm_avg(d1),
        l2_delta2=two_norm_avg(d2),
        l2_delta12=two_norm_avg_delta(d1, d2),
    )
    return (nw1, nw2), (metrics, flow_pred)


def fgsm_attack(
    flow_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    image1: jnp.ndarray,
    image2: jnp.ndarray,
    target: jnp.ndarray,
    config: FGSMConfig,
) -> FGSMResult:
    """Run I-FGSM on one (batch of) padded unit-range image pair(s)."""
    cfg = config
    flow_pred_init = flow_fn(image1, image2)

    def step(carry, _):
        return fgsm_step(flow_fn, image1, image2, target, flow_pred_init,
                         carry, cfg)

    (nw1, nw2), (metrics, flows) = jax.lax.scan(
        step, (image1, image2), None, length=cfg.steps
    )
    return FGSMResult(
        delta1=nw1 - image1,
        delta2=nw2 - image2,
        flow_pred_init=flow_pred_init,
        flow_pred=flows[-1],
        metrics=metrics,
    )
