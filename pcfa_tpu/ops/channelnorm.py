"""Per-pixel channel L2 norm.

Replaces FlowNet2's `channelnorm_cuda` extension
(`channelnorm_package/channelnorm_kernel.cu:19-60`, SURVEY.md §2.5 #4) with a
one-liner that XLA fuses into neighboring ops; autodiff supplies the backward
pass the reference hand-writes.
"""

from __future__ import annotations

import jax.numpy as jnp


def channel_norm(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """(B, H, W, C) → (B, H, W, 1): sqrt(Σ_c x²)."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)
