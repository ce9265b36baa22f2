"""Fused local (patch) correlation as a Pallas TPU kernel.

PWCNet's cost volume (`PWCNet.py:45-58`; CUDA/OpenMP in the reference,
SURVEY.md §2.5 #1): 81 shifted dot-products per pixel. The XLA formulation
(`ops/correlation.py:local_correlation`) materializes 81 shifted slices —
up to 81 separate HBM passes over f2. This kernel keeps the padded f2 map
in VMEM (PWCNet's largest level is ~4 MB) and streams f1 row-tiles past it,
emitting all 81 output channels in one pass: HBM traffic drops from
O(patch²·C·HW) to O(C·HW).

Forward kernel + `jax.custom_vjp`: the backward pass reuses the XLA
formulation (autodiff of shift-and-sum), keeping the VJP exactly consistent
with the reference semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcfa_tpu.ops.correlation import local_correlation as _xla_local_correlation


def _kernel(f1_ref, f2p_ref, out_ref, *, patch: int, tile_h: int,
            inv_c: float):
    f1 = f1_ref[0]  # (tile_h, W, C)
    W = f1.shape[1]
    row0 = pl.program_id(1) * tile_h
    for dy in range(patch):
        rows = f2p_ref[0, pl.ds(row0 + dy, tile_h), :, :]  # (tile_h, W+2R, C)
        for dx in range(patch):
            f2s = rows[:, dx : dx + W, :]
            out_ref[0, :, :, dy * patch + dx] = (
                jnp.sum(f1 * f2s, axis=-1) * inv_c
            )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def local_correlation_pallas(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, patch_size: int = 9
) -> jnp.ndarray:
    """Drop-in replacement for `ops.correlation.local_correlation`
    (normalize_by_channels=True) on TPU. (B, H, W, C) → (B, H, W, patch²)."""
    return _forward(fmap1, fmap2, patch_size)


def _pick_tile_h(H: int) -> int:
    for t in (8, 4, 2, 1):
        if H % t == 0:
            return t
    return 1


def _forward(fmap1, fmap2, patch_size, interpret=False):
    B, H, W, C = fmap1.shape
    R = (patch_size - 1) // 2
    tile_h = _pick_tile_h(H)
    f2p = jnp.pad(fmap2, ((0, 0), (R, R), (R, R), (0, 0)))

    return pl.pallas_call(
        functools.partial(
            _kernel, patch=patch_size, tile_h=tile_h, inv_c=1.0 / C
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, H, W, patch_size * patch_size), fmap1.dtype
        ),
        grid=(B, H // tile_h),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, W, C),
                lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # whole padded f2 map per batch element stays resident in VMEM
            pl.BlockSpec(
                (1, H + 2 * R, W + 2 * R, C),
                lambda b, i: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, patch_size * patch_size),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(fmap1, f2p)


def _fwd(fmap1, fmap2, patch_size):
    return _forward(fmap1, fmap2, patch_size), (fmap1, fmap2)


def _bwd(patch_size, res, g):
    fmap1, fmap2 = res
    _, vjp = jax.vjp(
        lambda a, b: _xla_local_correlation(a, b, patch_size), fmap1, fmap2
    )
    return vjp(g)


local_correlation_pallas.defvjp(_fwd, _bwd)
