"""Fused patch-correlation Pallas TPU kernels.

Covers both correlation flavors the reference implements natively
(SURVEY.md §2.5 #1 and #2):

* PWCNet local correlation (`PWCNet.py:45-58`): patch 9, stride 1 —
  `local_correlation_pallas`.
* FlowNetC global correlation (`correlation_cuda_kernel.cu:85-135`):
  displacements ±20 on a stride-2 grid → 441 channels —
  `global_correlation_pallas`.

The XLA formulations (`ops/correlation.py`) materialize one shifted slice
per displacement — up to patch² HBM passes over f2. The kernel keeps the
padded f2 map resident in VMEM and streams f1 row-tiles past it, emitting
every output channel in one pass. For channel counts whose padded map would
exceed VMEM (FlowNetC: 256ch at /8), the channel axis is chunked via a
third (innermost) grid dimension that accumulates into the same output
block.

Forward kernels + `jax.custom_vjp`: backward reuses the XLA shift-and-sum
formulation (exactly consistent gradients, no scatters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcfa_tpu.ops.correlation import (
    global_correlation as _xla_global_correlation,
    local_correlation as _xla_local_correlation,
)


def _kernel(f1_ref, f2p_ref, out_ref, *, patch: int, stride: int,
            tile_h: int, inv_c: float, c_chunks: int):
    f1 = f1_ref[0]  # (tile_h, W, Cc)
    W = f1.shape[1]
    row0 = pl.program_id(1) * tile_h
    first_chunk = pl.program_id(2) == 0 if c_chunks > 1 else None
    for iy in range(patch):
        dy = iy * stride
        rows = f2p_ref[0, pl.ds(row0 + dy, tile_h), :, :]
        for ix in range(patch):
            dx = ix * stride
            val = jnp.sum(f1 * rows[:, dx : dx + W, :], axis=-1) * inv_c
            ch = iy * patch + ix
            if c_chunks == 1:
                out_ref[0, :, :, ch] = val
            else:
                @pl.when(first_chunk)
                def _():
                    out_ref[0, :, :, ch] = val

                @pl.when(jnp.logical_not(first_chunk))
                def _():
                    out_ref[0, :, :, ch] += val


def _pick_tile_h(H: int, target: int = 8) -> int:
    for t in (target, 4, 2, 1):
        if H % t == 0:
            return t
    return 1


def _pick_c_chunks(H, W, C, R, dtype_bytes=4, budget=10 * 2**20) -> int:
    """Smallest channel split whose padded f2 chunk fits the VMEM budget."""
    for chunks in (1, 2, 4, 8):
        if C % chunks:
            continue
        if (H + 2 * R) * (W + 2 * R) * (C // chunks) * dtype_bytes <= budget:
            return chunks
    return max(c for c in (1, 2, 4, 8) if C % c == 0)


def _forward(fmap1, fmap2, patch, stride, interpret=False):
    B, H, W, C = fmap1.shape
    R = (patch - 1) // 2 * stride
    tile_h = _pick_tile_h(H)
    c_chunks = _pick_c_chunks(H, W, C, R)
    Cc = C // c_chunks
    f2p = jnp.pad(fmap2, ((0, 0), (R, R), (R, R), (0, 0)))

    return pl.pallas_call(
        functools.partial(
            _kernel, patch=patch, stride=stride, tile_h=tile_h,
            inv_c=1.0 / C, c_chunks=c_chunks,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, patch * patch),
                                       fmap1.dtype),
        grid=(B, H // tile_h, c_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, W, Cc),
                lambda b, i, c: (b, i, 0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, H + 2 * R, W + 2 * R, Cc),
                lambda b, i, c: (b, 0, 0, c),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, patch * patch),
            lambda b, i, c: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(fmap1, f2p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def local_correlation_pallas(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, patch_size: int = 9
) -> jnp.ndarray:
    """Drop-in for `ops.correlation.local_correlation`
    (normalize_by_channels=True) on TPU. (B, H, W, C) → (B, H, W, patch²)."""
    return _forward(fmap1, fmap2, patch_size, 1)


def _local_fwd(fmap1, fmap2, patch_size):
    return _forward(fmap1, fmap2, patch_size, 1), (fmap1, fmap2)


def _local_bwd(patch_size, res, g):
    fmap1, fmap2 = res
    _, vjp = jax.vjp(
        lambda a, b: _xla_local_correlation(a, b, patch_size), fmap1, fmap2
    )
    return vjp(g)


local_correlation_pallas.defvjp(_local_fwd, _local_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def global_correlation_pallas(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray,
    max_displacement: int = 20, stride2: int = 2,
) -> jnp.ndarray:
    """Drop-in for `ops.correlation.global_correlation` on TPU.
    (B, H, W, C) → (B, H, W, (2·max_disp/stride2 + 1)²)."""
    patch = 2 * (max_displacement // stride2) + 1
    return _forward(fmap1, fmap2, patch, stride2)


def _global_fwd(fmap1, fmap2, max_displacement, stride2):
    patch = 2 * (max_displacement // stride2) + 1
    return _forward(fmap1, fmap2, patch, stride2), (fmap1, fmap2)


def _global_bwd(max_displacement, stride2, res, g):
    fmap1, fmap2 = res
    _, vjp = jax.vjp(
        lambda a, b: _xla_global_correlation(a, b, max_displacement, stride2),
        fmap1, fmap2,
    )
    return vjp(g)


global_correlation_pallas.defvjp(_global_fwd, _global_bwd)
