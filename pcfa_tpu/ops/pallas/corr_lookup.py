"""Pallas vertical-window slice+blend for the RAFT/GMA corr lookup.

The materialized-pyramid window lookup (`ops/correlation.py:corr_lookup_mm`,
the `alt_cuda_corr` analog — reference `models/raft/corr.py:29-50`) costs
7.8 ms fwd+bwd per refinement iteration at KITTI size on v5e, ~80% of the
iteration: its separable matmuls run M = 2r+1 = 9 rows against 128-lane MXU
tiles (<1% utilization), and the flat-gather reformulation measured 3.5-4×
worse (BASELINE.md round-3 ablations). The insight this kernel exploits:
all (2r+1)² window samples of one query share a single fractional offset
(window offsets are integers), so the vertical contraction per query is a
2-tap blend of P+1 = 2r+2 *contiguous* correlation-map rows — a per-query
dynamic sublane slice, which Pallas does natively on a VMEM-resident block
while XLA has no batched-dynamic-slice primitive (it lowers to gather).

Forward: grid over query blocks; each grid step holds QB queries' zero-
padded correlation maps in VMEM, loops over them with `pl.ds(row_start,
P+1)` slices, blends with (1-fy, fy), and emits vrow (N, P, W2) — exactly
the first einsum of `corr_lookup_mm` (tmp[n, b, :] = Σ_j wy[n,b,j]·cmap).
The horizontal step stays the existing XLA einsum (K = W2, small).

Boundary semantics are mask-free by construction: the map is zero-padded
(P+1 rows on top, _SLAB+7 below — the extra rows cover the kernel's
8-aligned slab over-read) and the slice start is clipped into the padded
range, so out-of-image rows read zeros — identical to the hat-weight
masking of `corr_lookup_mm` (grid_sample zeros padding).

Backward: a mirror kernel scatters each query's (P+1)-row cotangent slab
(the blend's transpose — a 2-tap correlation of the P output rows) into
its zero-initialized padded map with the same dynamic sublane slice.

Gradients w.r.t. coords are intentionally ZERO (`stop_gradient` applied in
the wrapper): every caller detaches coords before the lookup (reference
raft.py:123), and the wrapper enforces the same contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Mosaic requires dynamic sublane offsets to be provably 8-aligned: load a
# 24-row slab at the 8-aligned floor of the window start and rotate the
# residual (< 8) away with pltpu.roll (dynamic-shift sublane rotate).
_SLAB = 24


def _fwd_kernel(ys_ref, fy_ref, cmap_ref, out_ref, *, P: int, QB: int):
    def body(q, _):
        ys = ys_ref[q, 0]
        fy = fy_ref[q, 0]
        hi = pl.multiple_of((ys // 8) * 8, 8)
        lo = ys - hi
        # cast before the rotate: Mosaic's dynamic rotate is 32-bit-only
        slab24 = cmap_ref[q, pl.ds(hi, _SLAB), :].astype(jnp.float32)
        # roll(x, s)[i] = x[(i - s) mod n] → shift 24-lo puts row ys at 0
        slab = pltpu.roll(slab24, (_SLAB - lo) % _SLAB, axis=0)[:P + 1]
        out_ref[q] = ((1.0 - fy) * slab[:P] + fy * slab[1:]).astype(
            out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, QB, body, 0)


def _bwd_kernel(ys_ref, fy_ref, g_ref, dcmap_ref, *, P: int, QB: int):
    dcmap_ref[:] = jnp.zeros_like(dcmap_ref)

    def body(q, _):
        ys = ys_ref[q, 0]
        fy = fy_ref[q, 0]
        hi = pl.multiple_of((ys // 8) * 8, 8)
        lo = ys - hi
        g = g_ref[q].astype(jnp.float32)  # (P, W2)
        zpad = jnp.zeros((_SLAB - P - 1,) + g.shape[1:], jnp.float32)
        zrow = zpad[:1]
        # d_slab[u] = (1-fy)·g[u] + fy·g[u-1],  u ∈ [0, P]
        d_slab = (1.0 - fy) * jnp.concatenate([g, zrow, zpad], axis=0) \
            + fy * jnp.concatenate([zrow, g, zpad], axis=0)  # (24, W2)
        # rotate the window down to rows lo..lo+P; wrapped rows are zeros
        buf = pltpu.roll(d_slab, lo, axis=0)
        dcmap_ref[q, pl.ds(hi, _SLAB), :] = buf.astype(dcmap_ref.dtype)
        return 0

    jax.lax.fori_loop(0, QB, body, 0)


def _pad_args(cmap: jnp.ndarray, cy: jnp.ndarray, radius: int,
              qb: int):
    """Zero-pad rows by P+1 top/bottom, clip slice starts into the padded
    range, and pad the query axis to a QB multiple."""
    P = 2 * radius + 1
    N, H2, W2 = cmap.shape
    pad = P + 1
    npad = (-N) % qb
    y0 = jnp.floor(cy)
    fy = (cy - y0).astype(jnp.float32)[:, None]
    # window rows y0-r … y0-r+P; starts clipped so fully-out windows land
    # entirely in the zero padding (identical to masked hat weights). The
    # bottom padding also covers the kernel's 8-aligned _SLAB over-read
    # (hi ≤ ys ≤ H2+pad, hi+_SLAB ≤ Hp).
    ys = (jnp.clip(y0.astype(jnp.int32) - radius, -pad, H2) + pad)[:, None]
    cmap_p = jnp.pad(cmap, ((0, npad), (pad, _SLAB + 7), (0, 0)))
    ys = jnp.pad(ys, ((0, npad), (0, 0)))
    fy = jnp.pad(fy, ((0, npad), (0, 0)))
    return cmap_p, ys, fy, npad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def vslice_blend(cmap: jnp.ndarray, cy: jnp.ndarray, radius: int = 4,
                 qb: int = 64, interpret: bool = False) -> jnp.ndarray:
    """vrow[n, b, :] = Σ_j hat(cy[n]+b-r − j)·cmap[n, j, :]  (b ∈ [0, 2r+1))

    cmap: (N, H2, W2); cy: (N,) float sample centers (level coordinates).
    Exactly the vertical einsum of `corr_lookup_mm`, zero outside the map.
    d/d_cy is defined as ZERO (callers stop-gradient coords)."""
    return _vslice_fwd_impl(cmap, cy, radius, qb, interpret)


def _vslice_fwd_impl(cmap, cy, radius, qb, interpret):
    if (2 * radius + 2) + 7 > _SLAB:
        # the forward's pltpu.roll would wrap window rows around the slab
        # and silently return wrong values: P+1 window rows plus the ≤7-row
        # 8-alignment residual must fit the fixed slab
        raise ValueError(
            f"vslice_blend: radius={radius} needs a "
            f"{(2 * radius + 2) + 7}-row slab > _SLAB={_SLAB} "
            "(supported: radius <= 7)")
    P = 2 * radius + 1
    N, H2, W2 = cmap.shape
    cmap_p, ys, fy, npad = _pad_args(cmap, cy, radius, qb)
    Hp = H2 + (P + 1) + _SLAB + 7
    grid = (N + npad) // qb
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, P=P, QB=qb),
        out_shape=jax.ShapeDtypeStruct((N + npad, P, W2), cmap.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((qb, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, Hp, W2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, P, W2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ys, fy, cmap_p)
    return out[:N]


def _vslice_fwd(cmap, cy, radius, qb, interpret):
    return _vslice_fwd_impl(cmap, cy, radius, qb, interpret), (cmap.shape, cy)


def _vslice_bwd(radius, qb, interpret, res, g):
    (N, H2, W2), cy = res
    P = 2 * radius + 1
    pad = P + 1
    npad = (-N) % qb
    y0 = jnp.floor(cy)
    fy = (cy - y0).astype(jnp.float32)[:, None]
    ys = (jnp.clip(y0.astype(jnp.int32) - radius, -pad, H2) + pad)[:, None]
    ys = jnp.pad(ys, ((0, npad), (0, 0)))
    fy = jnp.pad(fy, ((0, npad), (0, 0)))
    gp = jnp.pad(g, ((0, npad), (0, 0), (0, 0)))
    Hp = H2 + pad + _SLAB + 7
    grid = (N + npad) // qb
    dcmap_p = pl.pallas_call(
        functools.partial(_bwd_kernel, P=P, QB=qb),
        out_shape=jax.ShapeDtypeStruct((N + npad, Hp, W2), g.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((qb, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, P, W2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, Hp, W2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ys, fy, gp)
    dcmap = dcmap_p[:N, pad:pad + H2, :]
    return dcmap, jnp.zeros_like(cy)


vslice_blend.defvjp(_vslice_fwd, _vslice_bwd)


def corr_lookup_pallas(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in `corr_lookup_mm` replacement: Pallas vertical slice+blend +
    XLA horizontal einsum. Output layout identical (x gets the first offset
    axis — the reference's transposed-window quirk `raft/corr.py:37-43`).
    Coords gradients are zero by contract (stop_gradient applied here;
    every caller already detaches coords, reference raft.py:123)."""
    r = radius
    P = 2 * r + 1
    B, H1, W1, _ = coords.shape
    N = B * H1 * W1
    coords = jax.lax.stop_gradient(coords)
    lin = jnp.linspace(-r, r, P, dtype=jnp.float32)

    out_pyramid = []
    for i, corr in enumerate(pyramid):
        _, H2, W2, _ = corr.shape
        cmap = corr.reshape(N, H2, W2)
        c = coords.reshape(N, 2).astype(jnp.float32) / 2**i
        vrow = vslice_blend(cmap, c[:, 1], r, 64, interpret)  # (N, P, W2)
        sx = c[:, 0:1, None] + lin[None, :, None]  # (N, P, 1)
        ix = jnp.arange(W2, dtype=jnp.float32)[None, None, :]
        # weights in the map dtype — see corr_lookup_mm (avoids the silent
        # fp32 promotion of the big vrow operand under the bf16 stack)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - ix)).astype(cmap.dtype)
        win = jnp.einsum("nak,nbk->nab", wx, vrow,
                         precision=jax.lax.Precision.HIGHEST)  # (N, P, P)
        out_pyramid.append(win.reshape(B, H1, W1, P * P))
    return jnp.concatenate(out_pyramid, axis=-1)
