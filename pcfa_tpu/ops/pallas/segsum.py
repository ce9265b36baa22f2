"""Sorted segment row-sum — the scatter-free warp image gradient, on the MXU.

The adjoint of the warp's packed-corner gather accumulates N update rows
into B·(H+1)·(W+1) destination cells (`ops/warp.py:_dimg_rows`); the
reference hand-writes this splat as a CUDA `atomicAdd` kernel
(`models/FlowNet/resample2d_package/resample2d_kernel.cu:77+`). On TPU an
XLA `scatter_add` with conflicting indices lowers to a SERIAL per-row loop
(~27 ms for FlowNet2's 491k-row full-res warp, round 4), and the pure-XLA
sorted-splat alternative (sorts + cumsum + adjacent difference,
`ops/warp.py:_segment_rows_sorted`) is 2× faster isolated but blows up the
XLA-TPU *compile* when four instances share one program (>30 min, round 4).

This module reformulates the splat as BLOCKED ONE-HOT MATMULS over the
sorted rows — scatter becomes MXU work, the TPU-native answer:

1. XLA sorts rows by destination cell (one `sort_key_val` + one flat row
   gather — both vectorize fine and compile small).
2. The sorted order is cut into input chunks of BN rows; the destination
   range into output blocks of BM cells. Because both are contiguous
   interval partitions of the same sorted order, at most J + T − 1
   (chunk, block) pairs intersect — a STATIC bound, so the ragged
   chunk↔block incidence becomes a fixed-length pair list computed with a
   few tiny searchsorteds (`_plan_pairs`).
3. Each pair contributes `onehot(local_cell)ᵀ @ rows` — a (BM, BN)·(BN, K)
   matmul whose 0/1 lhs is generated on the fly — accumulated into the
   pair's output block. Two interchangeable executors:
   * `segment_rows_pallas` — a Pallas kernel, grid over pairs with the
     (jarr, tarr) pair list as scalar prefetch driving the block index
     maps; the one-hot lives only in VMEM and consecutive same-block pairs
     accumulate in the resident output block. Opaque to XLA ⇒ immune to
     the fusion-planner compile blowup.
   * `segment_rows_scan` — the same plan as ONE `lax.scan` over pairs with
     dynamic-slice/update on the output buffer: ~10 HLO ops total, for
     platforms without Mosaic (CPU fallback) and as a compile-safety
     baseline.

fp32 note: the one-hot lhs is exactly representable at every precision;
`precision=HIGHEST` keeps the row values at full fp32 through the MXU's
bf16-pass decomposition, so the result matches the scatter path to normal
fp32 summation error (K·eps), unlike the cumsum formulation's N·eps
cancellation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tests set True to run the kernel interpreted on CPU
_INTERPRET = False

_BN = 512  # input chunk rows
_SENTINEL = jnp.int32(2**30)  # > any real cell index; lands in no block


def _pow2_floor(v: int) -> int:
    return 1 << (max(int(v), 1).bit_length() - 1)


def _block_sizes(K: int) -> tuple[int, int]:
    """(BN, BM) sized so onehot (BN·BM·4 B) + double-buffered out block
    (2·BM·Kpad·4 B) stay well under the 16 MB scoped-VMEM AOT limit."""
    kpad = -(-K // 128) * 128
    bm = min(2048, max(128, _pow2_floor((2 << 20) // (kpad * 4))))
    return _BN, bm


def _plan_pairs(skeys_padded: jnp.ndarray, T: int, J: int, BN: int, BM: int):
    """Static-length (jarr, tarr) pair list over the sorted order.

    skeys_padded: ((T+1)·BN,) ascending keys, padding = _SENTINEL; the
    sentinel chunk T is all-padding, used for dummy/fill pairs (its keys
    fall in no block, so they contribute an empty one-hot).

    Every output block j ∈ [0, J) appears in EXACTLY ONE consecutive run
    (empty blocks get one dummy pair so their output block is still
    zero-initialized), and jarr is non-decreasing — the contract the
    Pallas executor's first-visit / accumulate logic relies on.
    """
    P = 2 * J + T  # Σ_j max(chunks_j, 1) ≤ (J + T − 1) + J
    bounds = jnp.arange(J + 1, dtype=jnp.int32) * BM
    bnd = jnp.searchsorted(skeys_padded, bounds, side="left").astype(jnp.int32)
    lo, hi = bnd[:-1], bnd[1:]
    nonempty = hi > lo
    cstart = lo // BN
    cend = jnp.where(nonempty, (hi - 1) // BN, cstart)
    cnt = jnp.where(nonempty, cend - cstart + 1, 1)
    ends = jnp.cumsum(cnt)
    starts = ends - cnt
    total = ends[-1]

    p = jnp.arange(P, dtype=jnp.int32)
    j_of = jnp.minimum(
        jnp.searchsorted(ends, p, side="right").astype(jnp.int32), J - 1)
    t_of = cstart[j_of] + (p - starts[j_of])
    # dummy pairs (empty block) and fill pairs (p ≥ total, which keep
    # j = J−1, the last run) read the sentinel chunk: all-masked, += 0
    t_of = jnp.where((p < total) & nonempty[j_of], t_of, T)
    return j_of, t_of, P


def _sort_pad(idx: jnp.ndarray, upd: jnp.ndarray, BN: int):
    N, K = upd.shape
    order = jnp.arange(N, dtype=jnp.int32)
    skeys, perm = jax.lax.sort_key_val(idx.astype(jnp.int32), order)
    srows = jnp.take(upd, perm, axis=0)
    T = -(-N // BN)
    pad = (T + 1) * BN - N
    skeys = jnp.pad(skeys, (0, pad), constant_values=_SENTINEL)
    srows = jnp.pad(srows, ((0, pad), (0, 0)))
    return skeys, srows, T


def _kernel(jarr_ref, tarr_ref, keys_ref, rows_ref, out_ref, *, BM: int):
    p = pl.program_id(0)
    j = jarr_ref[p]
    local = keys_ref[0] - j * BM  # (1, BN)
    valid = (local >= 0) & (local < BM)
    BN = local.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 0)
    onehot = jnp.where((iota == local) & valid, 1.0, 0.0).astype(jnp.float32)
    blk = jax.lax.dot_general(
        onehot, rows_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    first = jnp.logical_or(p == 0, jarr_ref[jnp.maximum(p - 1, 0)] != j)

    @pl.when(first)
    def _init():
        out_ref[...] = blk

    @pl.when(jnp.logical_not(first))
    def _acc():
        out_ref[...] += blk


def segment_rows_pallas(idx: jnp.ndarray, upd: jnp.ndarray, nrows: int,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Σ of `upd` rows per destination cell: `zeros((nrows, K)).at[idx].add(upd)`
    as sorted blocked one-hot matmuls in one Pallas kernel (see module doc)."""
    if interpret is None:
        interpret = _INTERPRET
    N, K = upd.shape
    dtype = upd.dtype
    BN, BM = _block_sizes(K)
    J = -(-nrows // BM)
    skeys, srows, T = _sort_pad(idx, upd.astype(jnp.float32), BN)
    jarr, tarr, P = _plan_pairs(skeys, T, J, BN, BM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P,),
        in_specs=[
            # keys ride as (T+1, 1, BN): Mosaic requires the last two
            # block dims be (8-, 128-divisible) OR equal to the array
            # dims — (1, BN) against a (T+1, BN) array is neither
            pl.BlockSpec((1, 1, BN), lambda p, jarr, tarr: (tarr[p], 0, 0)),
            pl.BlockSpec((1, BN, K), lambda p, jarr, tarr: (tarr[p], 0, 0)),
        ],
        out_specs=pl.BlockSpec((BM, K), lambda p, jarr, tarr: (jarr[p], 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, BM=BM),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((J * BM, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jarr, tarr, skeys.reshape(T + 1, 1, BN), srows.reshape(T + 1, BN, K))
    return out[:nrows].astype(dtype)


def segment_rows_scan(idx: jnp.ndarray, upd: jnp.ndarray,
                      nrows: int) -> jnp.ndarray:
    """The same plan as one `lax.scan` of dynamic-slice + one-hot matmul +
    dynamic-update-slice steps — pure XLA (~10 ops), no Mosaic."""
    N, K = upd.shape
    dtype = upd.dtype
    BN, BM = _block_sizes(K)
    J = -(-nrows // BM)
    skeys, srows, T = _sort_pad(idx, upd.astype(jnp.float32), BN)
    jarr, tarr, P = _plan_pairs(skeys, T, J, BN, BM)
    iota_bm = jnp.arange(BM, dtype=jnp.int32)[:, None]

    def step(buf, jt):
        jp, tp = jt
        keys = jax.lax.dynamic_slice(skeys, (tp * BN,), (BN,))
        rows = jax.lax.dynamic_slice(srows, (tp * BN, 0), (BN, K))
        local = keys - jp * BM
        m = (local >= 0) & (local < BM)
        onehot = jnp.where((iota_bm == local[None, :]) & m[None, :], 1.0, 0.0)
        blk = jax.lax.dot_general(
            onehot, rows,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        cur = jax.lax.dynamic_slice(buf, (jp * BM, 0), (BM, K))
        return jax.lax.dynamic_update_slice(buf, cur + blk, (jp * BM, 0)), None

    buf, _ = jax.lax.scan(
        step, jnp.zeros((J * BM, K), jnp.float32), (jarr, tarr))
    return buf[:nrows].astype(dtype)
