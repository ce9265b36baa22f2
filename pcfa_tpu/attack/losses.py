"""Attack losses and perturbation norms (pure jnp, differentiable, jit-safe).

Numerics-compatible rebuild of `helper_functions/losses.py`. Flow fields are
channels-last (..., H, W, 2); perturbations are any shape.

One deliberate deviation: the reference's cosine-similarity loss has an
operator-precedence bug (`losses.py:88` divides by ‖pred‖ but *multiplies* by
‖target‖). We implement the mathematically correct
`1 - <p,t> / (‖p‖·‖t‖)`; published robustness numbers use the default 'aee'
loss and are unaffected.
"""

from __future__ import annotations

import jax.numpy as jnp


def avg_epe(flow1: jnp.ndarray, flow2: jnp.ndarray) -> jnp.ndarray:
    """Average endpoint error: mean over pixels of sqrt((Δu)² + (Δv)²).

    Matches `losses.py:3-30` for both (H, W, 2) and (b, H, W, 2) input
    (channel reduction happens before the square root).
    """
    diff_sq = (flow1 - flow2) ** 2
    return jnp.mean(jnp.sqrt(jnp.sum(diff_sq, axis=-1)))


def avg_mse(flow1: jnp.ndarray, flow2: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error (`losses.py:32-44`)."""
    return jnp.mean((flow1 - flow2) ** 2)


def f_cosim(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - global cosine similarity between flattened flow fields.

    Corrected form of `losses.py:76-88` (see module docstring)."""
    dot = jnp.sum(pred * target)
    denom = jnp.sqrt(jnp.sum(pred * pred)) * jnp.sqrt(jnp.sum(target * target))
    return 1.0 - dot / denom


def get_loss(f_type: str, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Dispatcher, `f_type` in {aee, mse, cosim} (`losses.py:145-174`).

    `f_type` must be a static Python string (selected at trace time)."""
    if f_type == "aee":
        return avg_epe(pred, target)
    if f_type == "mse":
        return avg_mse(pred, target)
    if f_type == "cosim":
        return f_cosim(pred, target)
    raise NotImplementedError(
        f"The requested loss type {f_type} does not exist. "
        "Please choose one of 'aee', 'mse' or 'cosim'"
    )


def two_norm_avg(x: jnp.ndarray) -> jnp.ndarray:
    """‖x‖₂ / sqrt(numel) (`losses.py:129-142`)."""
    sqrt_numels = float(x.size) ** 0.5
    return jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2)) / sqrt_numels


def two_norm_avg_delta(delta1: jnp.ndarray, delta2: jnp.ndarray) -> jnp.ndarray:
    """sqrt(‖δ1‖² + ‖δ2‖²) / sqrt(numel1 + numel2) (`losses.py:91-107`)."""
    sqrt_numels = float(delta1.size + delta2.size) ** 0.5
    two_norm = jnp.sqrt(jnp.sum(delta1**2) + jnp.sum(delta2**2))
    return two_norm / sqrt_numels


def two_norm_avg_delta_squared(delta1: jnp.ndarray, delta2: jnp.ndarray) -> jnp.ndarray:
    """(‖δ1‖² + ‖δ2‖²) / (numel1 + numel2) (`losses.py:110-126`)."""
    numels = float(delta1.size + delta2.size)
    return (jnp.sum(delta1**2) + jnp.sum(delta2**2)) / numels


def relu_penalty(
    delta1: jnp.ndarray, delta2: jnp.ndarray, delta_bound: float = 0.001
) -> jnp.ndarray:
    """Exact-penalty term relu(‖δ‖²_avg − bound²) (`losses.py:177-197`)."""
    return jnp.maximum(
        0.0, two_norm_avg_delta_squared(delta1, delta2) - delta_bound**2
    )


def loss_delta_constraint(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    delta1: jnp.ndarray,
    delta2: jnp.ndarray,
    delta_bound: float = 0.001,
    mu: float = 100.0,
    f_type: str = "aee",
) -> jnp.ndarray:
    """Penalty-method objective: similarity(pred, target) + mu·relu-penalty(δ)
    (`losses.py:200-230`)."""
    return get_loss(f_type, pred, target) + mu * relu_penalty(
        delta1, delta2, delta_bound
    )


def default_mu(delta_bound: float, target: str) -> float:
    """Auto heuristic for the penalty weight: 2500/bound, ×1.5 for non-zero
    targets (`attack_PCFA.py:304-308,580-584`)."""
    mu = 2500.0 / delta_bound
    if target not in ("zero",):
        mu = 1.5 * mu
    return mu
