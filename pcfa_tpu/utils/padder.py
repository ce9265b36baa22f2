"""Input padding to divisor-aligned spatial shapes.

Behavior-compatible with the reference `InputPadder`
(`helper_functions/ownutilities.py:21-62`): pad H and W up to the next
multiple of `divisor` with replicate (edge) padding; 'sintel' mode centers the
padding, other modes pad bottom/right-biased. Unlike the reference (NCHW
torch tensors), arrays here are channels-last (..., H, W, C) — the layout XLA
prefers on TPU — and padding is computed statically so `pad`/`unpad` trace
into jitted programs with fixed shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class InputPadder:
    """Pads (..., H, W, C) arrays so H and W are divisible by `divisor`."""

    def __init__(self, dims, divisor: int = 8, mode: str = "sintel"):
        # dims: array shape (..., H, W, C)
        self.ht, self.wd = int(dims[-3]), int(dims[-2])
        pad_ht = (((self.ht // divisor) + 1) * divisor - self.ht) % divisor
        pad_wd = (((self.wd // divisor) + 1) * divisor - self.wd) % divisor
        if mode == "sintel":
            # [w_left, w_right, h_top, h_bottom] as in ownutilities.py:31
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    @property
    def padded_shape(self) -> tuple[int, int]:
        return (
            self.ht + self._pad[2] + self._pad[3],
            self.wd + self._pad[0] + self._pad[1],
        )

    def pad(self, *inputs):
        """Replicate-pad each (..., H, W, C) input. Works on jnp and np arrays."""
        wl, wr, ht, hb = self._pad
        out = []
        for x in inputs:
            pad_width = [(0, 0)] * (x.ndim - 3) + [(ht, hb), (wl, wr), (0, 0)]
            xp = jnp if isinstance(x, jnp.ndarray) else np
            out.append(xp.pad(x, pad_width, mode="edge"))
        return out

    def get_dimensions(self):
        return self.ht, self.wd

    def unpad(self, x):
        """Crop back to the original spatial size."""
        ht, wd = x.shape[-3], x.shape[-2]
        c = [self._pad[2], ht - self._pad[3], self._pad[0], wd - self._pad[1]]
        return x[..., c[0] : c[1], c[2] : c[3], :]
