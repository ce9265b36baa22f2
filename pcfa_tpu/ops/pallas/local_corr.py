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


def _kernel_dma(f1_ref, f2p_ref, out_ref, scratch, sem, *, patch: int,
                stride: int, tile_h: int, inv_c: float, R: int, Cc: int,
                c_chunks: int):
    """Streaming variant: padded f2 stays in HBM; each grid step DMAs its
    (tile_h + 2R)-row halo slab for its channel chunk into VMEM scratch."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2) if c_chunks > 1 else 0
    row0 = i * tile_h
    cp = pltpu.make_async_copy(
        f2p_ref.at[b, pl.ds(row0, tile_h + 2 * R), :,
                   pl.ds(c * Cc, Cc)],
        scratch,
        sem,
    )
    cp.start()
    cp.wait()

    f1 = f1_ref[0]
    W = f1.shape[1]
    first_chunk = pl.program_id(2) == 0 if c_chunks > 1 else None
    for iy in range(patch):
        rows = scratch[pl.ds(iy * stride, tile_h), :, :]
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


#: VMEM budgets (bytes); module-level so tests can force the streaming path
_RESIDENT_BUDGET = 9 * 2**20
_SLAB_BUDGET = 6 * 2**20


def _pick_tile_h(H: int, target: int = 8) -> int:
    for t in (target, 4, 2, 1):
        if H % t == 0:
            return t
    return 1


def _valid_c_chunks(C: int):
    """Mosaic requires the lane (last) block dim to be 128-divisible or the
    full dimension, so channel chunks must keep Cc % 128 == 0 (or Cc == C)."""
    return [n for n in (1, 2, 4, 8)
            if C % n == 0 and (n == 1 or (C // n) % 128 == 0)]


def _forward(fmap1, fmap2, patch, stride, interpret=False):
    B, H, W, C = fmap1.shape
    R = (patch - 1) // 2 * stride
    dtype_bytes = fmap1.dtype.itemsize

    # resident path: whole padded f2 (double-buffered by the pipeline) must
    # fit VMEM together with the f1/out blocks
    resident_bytes = 2 * (H + 2 * R) * (W + 2 * R) * C * dtype_bytes
    use_resident = resident_bytes <= _RESIDENT_BUDGET

    if use_resident:
        tile_h = _pick_tile_h(H)
        f2p = jnp.pad(fmap2, ((0, 0), (R, R), (R, R), (0, 0)))
        return pl.pallas_call(
            functools.partial(
                _kernel, patch=patch, stride=stride, tile_h=tile_h,
                inv_c=1.0 / C, c_chunks=1,
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, W, patch * patch),
                                           fmap1.dtype),
            grid=(B, H // tile_h, 1),
            in_specs=[
                pl.BlockSpec(
                    (1, tile_h, W, C),
                    lambda b, i, c: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, H + 2 * R, W + 2 * R, C),
                    lambda b, i, c: (b, 0, 0, 0),
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

    # streaming path: f2 stays in HBM, halo slabs DMA'd per tile; channels
    # chunked (lane-aligned) so the slab fits VMEM
    tile_h = 8
    Hp = ((H + tile_h - 1) // tile_h) * tile_h
    # DMA slices need 8-aligned sublane (width) extents: pad W+2R up to 8
    W2 = W + 2 * R
    W2p = ((W2 + 7) // 8) * 8
    f1p = jnp.pad(fmap1, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
    f2p = jnp.pad(fmap2,
                  ((0, 0), (R, R + Hp - H), (R, W2p - W2 + R), (0, 0)))

    c_chunks = 1
    for n in _valid_c_chunks(C):
        slab = (tile_h + 2 * R) * (W + 2 * R) * (C // n) * dtype_bytes
        if slab <= _SLAB_BUDGET:
            c_chunks = n
            break
    else:
        c_chunks = _valid_c_chunks(C)[-1]
    Cc = C // c_chunks

    out = pl.pallas_call(
        functools.partial(
            _kernel_dma, patch=patch, stride=stride, tile_h=tile_h,
            inv_c=1.0 / C, R=R, Cc=Cc, c_chunks=c_chunks,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, patch * patch),
                                       fmap1.dtype),
        grid=(B, Hp // tile_h, c_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, W, Cc),
                lambda b, i, c: (b, i, 0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, patch * patch),
            lambda b, i, c: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * R, W2p, Cc), fmap1.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(f1p, f2p)
    return out[:, :H]


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
