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

Forward kernels + `jax.custom_vjp` with Pallas BACKWARD kernels: df1 is the
same shifted-product structure as the forward (per-shift broadcast FMA over
channels instead of a channel reduce) and df2 is its adjoint, both W-blocked
over pre-gathered halo-slab VMEM blocks — one (slab-amplified) HBM pass each
instead of the XLA shift-and-sum VJP's up-to-patch² passes (the reference
hand-writes exactly these backward kernels: `correlation.cpp:126-178`,
`correlation_cuda_kernel.cu`). Each gradient independently falls back to the
XLA formulation when its slab set exceeds VMEM (the 441-lane global-corr g
slab does).
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
#: budget for one backward-kernel slab set (df2 loads g AND f1 halos)
_BWD_SLAB_BUDGET = 8 * 2**20
#: tests set True to run the custom-VJP kernels interpreted on CPU
_INTERPRET = False


def _dgrad1_kernel(g_ref, slab_ref, out_ref, acc_ref, *, patch: int,
                   stride: int, TH: int, WB: int, R: int, inv_c: float):
    """df1[y,x,c] = inv_c · Σ_p g[y,x,p] · f2p[y+dy_p, x+dx_p, c].

    Same shifted-product structure as the forward (the reference hand-writes
    exactly this kernel, `correlation.cpp:126-150`), with the channel reduce
    replaced by a per-shift broadcast FMA over C. The f2 halo slab arrives
    pre-gathered as an ordinary VMEM block (the pattern `small_conv.py`
    uses): raw-HBM-ref + manual-DMA kernels make the chipless-AOT compiler
    scope-allocate every operand in VMEM and blow its 16 MB stack limit
    (measured 72 MB at patch 9). Accumulation goes through a VMEM scratch
    ref so the scheduler cannot keep patch² temporaries alive."""
    g = g_ref[0]  # (TH, WB, patch²)
    slab = slab_ref[0, 0, 0]  # (TH + 2R, WB + 2R, C)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for iy in range(patch):
        dy = iy * stride
        for ix in range(patch):
            dx = ix * stride
            ch = iy * patch + ix
            rows = slab[dy : dy + TH, dx : dx + WB, :]
            acc_ref[...] += (
                g[:, :, ch : ch + 1].astype(jnp.float32)
                * rows.astype(jnp.float32)
            )
    out_ref[0] = (acc_ref[...] * inv_c).astype(out_ref.dtype)


def _dgrad2_kernel(gslab_ref, fslab_ref, out_ref, acc_ref, *, patch: int,
                   stride: int, TH: int, WB: int, R: int, inv_c: float):
    """df2[y,x,c] = inv_c · Σ_p g[y−δy_p, x−δx_p, p] · f1[y−δy_p, x−δx_p, c]
    (δ = shift − R): the adjoint of the forward's shifted products
    (reference `correlation.cpp:152-178`). With g and f1 zero-padded by R,
    the read window for an output row tile is rows [y₀, y₀+TH+2R) — the
    same halo-slab geometry as df1, both slabs pre-gathered as VMEM
    blocks."""
    gs = gslab_ref[0, 0, 0]  # (TH + 2R, WB + 2R, patch²)
    fs = fslab_ref[0, 0, 0]  # (TH + 2R, WB + 2R, C)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for iy in range(patch):
        sy = 2 * R - iy * stride
        for ix in range(patch):
            sx = 2 * R - ix * stride
            ch = iy * patch + ix
            gw = gs[sy : sy + TH, sx : sx + WB, ch : ch + 1]
            fw = fs[sy : sy + TH, sx : sx + WB, :]
            acc_ref[...] += gw.astype(jnp.float32) * fw.astype(jnp.float32)
    out_ref[0] = (acc_ref[...] * inv_c).astype(out_ref.dtype)


def _bwd_plan(W: int, lane_sum: int, R: int, dtype_bytes: int):
    """(TH, WB) such that one slab set (lane_sum channels of halo slabs,
    double-buffered by the pipeline) fits the VMEM budget, or None → XLA
    fallback. WB capped at 256 to bound per-shift temporaries; the first
    candidate is the exact (8-rounded) map width so narrow maps aren't
    over-padded to a full block."""
    w8 = -(-W // 8) * 8
    cands = [w8] if w8 <= 256 else []
    cands += [c for c in (256, 128, 64, 32, 16, 8) if c < w8]
    for TH in (8, 4, 2, 1):
        for WB in cands:
            slab = 2 * (TH + 2 * R) * (WB + 2 * R) * lane_sum * dtype_bytes
            if slab <= _BWD_SLAB_BUDGET:
                return TH, WB
    return None


def _gather_slabs(arr, n_h: int, n_w: int, TH: int, WB: int, R: int):
    """(B, Hp+2R, Wp+2R, C) → (B, n_h, n_w, TH+2R, WB+2R, C): each grid
    step's halo'd window as an ordinary block (rows/cols overlap by 2R)."""
    return jnp.stack([
        jnp.stack([
            arr[:, i * TH : i * TH + TH + 2 * R,
                j * WB : j * WB + WB + 2 * R, :]
            for j in range(n_w)
        ], axis=1)
        for i in range(n_h)
    ], axis=1)


def _backward(fmap1, fmap2, g, patch, stride, interpret=False):
    """Pallas backward for `out = corr(f1, f2)` cotangent g.

    Returns (df1, df2); either may be None when its slab set exceeds VMEM
    (e.g. the 441-channel global-corr g slab) — the caller falls back to
    the XLA formulation for that operand only."""
    B, H, W, C = fmap1.shape
    P = patch * patch
    R = (patch - 1) // 2 * stride
    nbytes = fmap1.dtype.itemsize

    if H * W < 1024:
        # tiny maps: XLA's shift-and-sum is fine and the extra pallas
        # calls only add to the program's scoped-vmem pressure
        return None, None
    if P > 128:
        # the kernels unroll all patch² shifts; at FlowNetC's patch 21
        # (441 shifts) Mosaic's register allocator spills ~200 MB of
        # scoped VMEM and the AOT compile dies. Use the banded-matmul XLA
        # backward instead (two MXU einsums vs 441 shift-and-sum passes).
        from pcfa_tpu.ops.correlation import correlation_matmul_bwd

        return correlation_matmul_bwd(fmap1, fmap2, g, patch, stride)
    plan1 = _bwd_plan(W, C, R, nbytes)       # df1: f2 slab (+ g block)
    plan2 = _bwd_plan(W, P + C, R, nbytes)   # df2: g slab + f1 slab
    df1 = df2 = None

    if plan1 is not None:
        TH, WB = plan1
        Hp = -(-H // TH) * TH
        Wp = -(-W // WB) * WB
        n_h, n_w = Hp // TH, Wp // WB
        f2p = jnp.pad(fmap2, ((0, 0), (R, R + Hp - H), (R, R + Wp - W),
                              (0, 0)))
        gpad = jnp.pad(g, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        slabs = _gather_slabs(f2p, n_h, n_w, TH, WB, R)

        def run_dgrad1(g_in, slabs_in):
            return pl.pallas_call(
                functools.partial(_dgrad1_kernel, patch=patch, stride=stride,
                                  TH=TH, WB=WB, R=R, inv_c=1.0 / C),
                out_shape=jax.ShapeDtypeStruct(
                    (g_in.shape[0], Hp, Wp, C), fmap1.dtype),
                grid=(g_in.shape[0], n_h, n_w),
                in_specs=[
                    pl.BlockSpec((1, TH, WB, P),
                                 lambda b, i, j: (b, i, j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 1, TH + 2 * R, WB + 2 * R, C),
                                 lambda b, i, j: (b, i, j, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, TH, WB, C),
                                       lambda b, i, j: (b, i, j, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((TH, WB, C), jnp.float32)],
                interpret=interpret,
            )(g_in, slabs_in)

        df1 = _fold_vmap(run_dgrad1)(gpad, slabs)[:, :H, :W]

    if plan2 is not None:
        TH, WB = plan2
        Hp = -(-H // TH) * TH
        Wp = -(-W // WB) * WB
        n_h, n_w = Hp // TH, Wp // WB
        f1p = jnp.pad(fmap1, ((0, 0), (R, R + Hp - H), (R, R + Wp - W),
                              (0, 0)))
        gp = jnp.pad(g, ((0, 0), (R, R + Hp - H), (R, R + Wp - W), (0, 0)))
        gslabs = _gather_slabs(gp, n_h, n_w, TH, WB, R)
        fslabs = _gather_slabs(f1p, n_h, n_w, TH, WB, R)

        def run_dgrad2(gslabs_in, fslabs_in):
            return pl.pallas_call(
                functools.partial(_dgrad2_kernel, patch=patch, stride=stride,
                                  TH=TH, WB=WB, R=R, inv_c=1.0 / C),
                out_shape=jax.ShapeDtypeStruct(
                    (gslabs_in.shape[0], Hp, Wp, C), fmap2.dtype),
                grid=(gslabs_in.shape[0], n_h, n_w),
                in_specs=[
                    pl.BlockSpec((1, 1, 1, TH + 2 * R, WB + 2 * R, P),
                                 lambda b, i, j: (b, i, j, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 1, TH + 2 * R, WB + 2 * R, C),
                                 lambda b, i, j: (b, i, j, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, TH, WB, C),
                                       lambda b, i, j: (b, i, j, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((TH, WB, C), jnp.float32)],
                interpret=interpret,
            )(gslabs_in, fslabs_in)

        df2 = _fold_vmap(run_dgrad2)(gslabs, fslabs)[:, :H, :W]

    return df1, df2


def _fold_vmap(fn):
    """Make a pallas-calling `(x, y) -> out` function vmap-safe by folding
    the mapped axis into the arrays' leading (batch) axis — the kernels'
    grids already iterate over it — instead of letting JAX's generic
    pallas batching rule run, which cannot block ANY/HBM-space operands
    (`jax.vmap` of the streaming `_kernel_dma` raises at lowering time).
    `fn` must read B from its operands' shapes. Composes with nesting:
    a second vmap level folds again through the same rule."""
    call = jax.custom_batching.custom_vmap(fn)

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if bt else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, bt in zip(args, in_batched)]
        lead = args[0].shape[:2]
        flat = [a.reshape((lead[0] * lead[1],) + a.shape[2:]) for a in args]
        out = call(*flat)
        return out.reshape(lead + out.shape[1:]), True

    return call


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

        def run_resident(f1, f2pad):
            return pl.pallas_call(
                functools.partial(
                    _kernel, patch=patch, stride=stride, tile_h=tile_h,
                    inv_c=1.0 / C, c_chunks=1,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (f1.shape[0], H, W, patch * patch), f1.dtype),
                grid=(f1.shape[0], H // tile_h, 1),
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
            )(f1, f2pad)

        return _fold_vmap(run_resident)(fmap1, f2p)

    # streaming path: f2 stays in HBM, halo slabs DMA'd per tile; channels
    # chunked (lane-aligned) so the slab fits VMEM. Manual DMAs need
    # 128-aligned lane extents → pad C up (zero channels add 0 to the dot).
    tile_h = 8
    Hp = ((H + tile_h - 1) // tile_h) * tile_h
    # DMA slices need 8-aligned sublane (width) extents: pad W+2R up to 8
    W2 = W + 2 * R
    W2p = ((W2 + 7) // 8) * 8
    inv_c = 1.0 / C  # normalize by the REAL channel count, not the padded
    C128 = ((C + 127) // 128) * 128
    f1p = jnp.pad(fmap1, ((0, 0), (0, Hp - H), (0, 0), (0, C128 - C)))
    f2p = jnp.pad(fmap2,
                  ((0, 0), (R, R + Hp - H), (R, W2p - W2 + R),
                   (0, C128 - C)))
    C = C128

    c_chunks = 1
    for n in _valid_c_chunks(C):
        slab = (tile_h + 2 * R) * (W + 2 * R) * (C // n) * dtype_bytes
        if slab <= _SLAB_BUDGET:
            c_chunks = n
            break
    else:
        c_chunks = _valid_c_chunks(C)[-1]
    Cc = C // c_chunks

    def run_streaming(f1, f2):
        return pl.pallas_call(
            functools.partial(
                _kernel_dma, patch=patch, stride=stride, tile_h=tile_h,
                inv_c=inv_c, R=R, Cc=Cc, c_chunks=c_chunks,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (f1.shape[0], Hp, W, patch * patch), f1.dtype),
            grid=(f1.shape[0], Hp // tile_h, c_chunks),
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
                pltpu.VMEM((tile_h + 2 * R, W2p, Cc), f1.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(f1, f2)

    out = _fold_vmap(run_streaming)(f1p, f2p)
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
    df1, df2 = _backward(fmap1, fmap2, g, patch_size, 1,
                         interpret=_INTERPRET)
    if df1 is None:
        df1 = jax.vjp(
            lambda a: _xla_local_correlation(a, fmap2, patch_size), fmap1
        )[1](g)[0]
    if df2 is None:
        df2 = jax.vjp(
            lambda b: _xla_local_correlation(fmap1, b, patch_size), fmap2
        )[1](g)[0]
    return df1, df2


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
    patch = 2 * (max_displacement // stride2) + 1
    df1, df2 = _backward(fmap1, fmap2, g, patch, stride2,
                         interpret=_INTERPRET)
    if df1 is None:
        df1 = jax.vjp(
            lambda a: _xla_global_correlation(a, fmap2, max_displacement,
                                              stride2), fmap1
        )[1](g)[0]
    if df2 is None:
        df2 = jax.vjp(
            lambda b: _xla_global_correlation(fmap1, b, max_displacement,
                                              stride2), fmap2
        )[1](g)[0]
    return df1, df2


global_correlation_pallas.defvjp(_global_fwd, _global_bwd)
