"""Box-constraint parameterizations for the perturbation optimization.

Two ways to keep the perturbed images inside [0,1], matching the reference:

* clipping — optimize the network input directly; the effective perturbation
  is `clamp(x, 0, 1) - image` (`attack_PCFA.py:25-29`).
* change_of_variables — Carlini&Wagner tanh-space: optimize w with
  image+δ = 0.5/(1-ε)·(tanh(w) + (1-ε)) (`attack_PCFA.py:20-24,104-106`,
  `own_models.py:73-75`), so the constraint holds by construction.

Joint mode (one δ for both frames) uses a double-clamp against per-pixel
max/min over the two images (`attack_PCFA.py:32-37`); joint + COV is undefined
(reference raises, `attack_PCFA.py:91-92`).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_BOX_DEFAULT = 1e-7  # attack_PCFA.py:330,608


def cov_forward(w: jnp.ndarray, eps_box: float = EPS_BOX_DEFAULT) -> jnp.ndarray:
    """w-variable → image-space value in (0, 1): 0.5/(1-ε)·(tanh(w)+(1-ε))."""
    return 0.5 / (1.0 - eps_box) * (jnp.tanh(w) + (1.0 - eps_box))


def cov_inverse(x: jnp.ndarray, eps_box: float = EPS_BOX_DEFAULT) -> jnp.ndarray:
    """image-space → w-variable: atanh(2(1-ε)x − (1-ε)) (`attack_PCFA.py:104-106`)."""
    return jnp.arctanh(2.0 * (1.0 - eps_box) * x - (1.0 - eps_box))


def extract_deltas(
    nw_input1: jnp.ndarray,
    nw_input2: jnp.ndarray,
    image1: jnp.ndarray,
    image2: jnp.ndarray,
    boxconstraint: str,
    eps_box: float = 0.0,
):
    """Recover (δ1, δ2) from the optimizer variables (`attack_PCFA.py:20-29`)."""
    if boxconstraint == "change_of_variables":
        delta1 = cov_forward(nw_input1, eps_box) - image1
        delta2 = cov_forward(nw_input2, eps_box) - image2
    else:
        delta1 = jnp.clip(nw_input1, 0.0, 1.0) - image1
        delta2 = jnp.clip(nw_input2, 0.0, 1.0) - image2
    return delta1, delta2


def extract_deltas_joint(
    nw_delta: jnp.ndarray, images_max: jnp.ndarray, images_min: jnp.ndarray
):
    """Joint-mode effective δ via double clamp (`attack_PCFA.py:32-37`)."""
    delta_upper = jnp.clip(nw_delta + images_max, 0.0, 1.0) - images_max
    delta = jnp.clip(delta_upper + images_min, 0.0, 1.0) - images_min
    return delta, delta


def init_nw_inputs(
    image1: jnp.ndarray,
    image2: jnp.ndarray,
    boxconstraint: str,
    eps_box: float = EPS_BOX_DEFAULT,
):
    """Initial optimizer variables for δ=0 (`attack_PCFA.py:97-114`)."""
    if boxconstraint == "change_of_variables":
        return cov_inverse(image1, eps_box), cov_inverse(image2, eps_box)
    return image1, image2


def perturbed_images(
    nw_input1: jnp.ndarray,
    nw_input2: jnp.ndarray,
    boxconstraint: str,
    eps_box: float = EPS_BOX_DEFAULT,
):
    """Map optimizer variables to in-range network inputs, mirroring
    `ScaledInputModel.forward` (`own_models.py:72-80`): COV transform if
    configured, then clamp to [0,1]."""
    if boxconstraint == "change_of_variables":
        x1 = cov_forward(nw_input1, eps_box)
        x2 = cov_forward(nw_input2, eps_box)
    else:
        x1, x2 = nw_input1, nw_input2
    return jnp.clip(x1, 0.0, 1.0), jnp.clip(x2, 0.0, 1.0)
