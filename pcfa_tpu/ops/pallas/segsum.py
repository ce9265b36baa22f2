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
3. Each pair contributes `onehot(local_cell)ᵀ @ rows` — a matmul whose 0/1
   lhs is generated on the fly — accumulated into the pair's output block.
   The matmul is LANE-PACKED: with K ≪ 128 a naive (BM, BN)·(BN, K) dot
   wastes both the lane tile (K of 128) and the sublane extent (BM rows
   for BN useful values) — measured 23.8 ms/warp-call, matmul-pass-bound.
   Packing S = ⌊128/K⌋₂ cells into the lane axis (cell m → sublane m//S,
   lane slot m%S) shrinks the one-hot to (BM/S, BN) and widens the rhs to
   (BN, S·K) — S× fewer MXU passes and S× fewer one-hot compares for the
   same math; the packed (J·BM/S, S·K) output reshapes back to
   (J·BM, K) row-major for free. Two interchangeable executors:
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

_SENTINEL = jnp.int32(2**30)  # > any real cell index; lands in no block


def _pow2_floor(v: int) -> int:
    return 1 << (max(int(v), 1).bit_length() - 1)


def _block_sizes(K: int) -> tuple[int, int, int]:
    """(BN, BM, S): input chunk rows, output block cells, lane-packing
    factor S = ⌊128/K⌋₂ (1 for wide rows). The out block keeps a fixed
    R = BM/S = 256 sublane rows (2 tiles): total matmul passes ≈
    2·nrows·BN/(S·128²) + N·R/128² and grid steps ≈ 2·nrows/(S·R) + N/BN
    balance near BN=1024 at the FlowNet2 warp shapes (N ≈ nrows ≈ 491k,
    K=12 → S=8). For wide rows (kpad > 256) BN drops to 512 to keep the
    rhs + out blocks under the 16 MB scoped-VMEM AOT limit."""
    s = _pow2_floor(128 // K) if K <= 64 else 1
    kpad = -(-(s * K) // 128) * 128
    bn = 512 if kpad > 256 else 1024
    return bn, 256 * s, s


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


def _kernel(jarr_ref, tarr_ref, keys_row_ref, keys_col_ref, rows_ref,
            out_ref, *, BM: int, S: int):
    p = pl.program_id(0)
    j = jarr_ref[p]
    lrow = keys_row_ref[0] - j * BM  # (1, BN) — lane-oriented keys
    valid = (lrow >= 0) & (lrow < BM)
    BN = lrow.shape[-1]
    # sublane index of cell m = m // S; −1 on invalid rows → no match
    a = jnp.where(valid, jnp.clip(lrow, 0, BM - 1) // S, -1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (BM // S, BN), 0)
    onehot = jnp.where(iota_r == a, 1.0, 0.0).astype(jnp.float32)
    rows = rows_ref[0]  # (BN, K)
    if S == 1:
        rows_exp = rows
    else:
        # lane slot m % S from the sublane-oriented copy of the keys
        # (avoids an in-kernel (1,BN)→(BN,1) relayout); invalid rows'
        # slot is arbitrary — their one-hot column is all-zero anyway
        lcol = keys_col_ref[0] - j * BM  # (BN, 1)
        slot = jnp.clip(lcol, 0, BM - 1) % S
        rows_exp = jnp.concatenate(
            [rows * (slot == s).astype(rows.dtype) for s in range(S)],
            axis=1)  # (BN, S·K)
    blk = jax.lax.dot_general(
        onehot, rows_exp,
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
    as sorted lane-packed one-hot matmuls in one Pallas kernel (module doc)."""
    if interpret is None:
        interpret = _INTERPRET
    N, K = upd.shape
    dtype = upd.dtype
    BN, BM, S = _block_sizes(K)
    R = BM // S
    J = -(-nrows // BM)
    skeys, srows, T = _sort_pad(idx, upd.astype(jnp.float32), BN)
    jarr, tarr, P = _plan_pairs(skeys, T, J, BN, BM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P,),
        in_specs=[
            # keys ride twice — (T+1, 1, BN) lane-oriented for the one-hot
            # and (T+1, BN, 1) sublane-oriented for the slot select.
            # Mosaic requires the last two block dims be (8-, 128-
            # divisible) OR equal to the array dims, hence the unit axes.
            pl.BlockSpec((1, 1, BN), lambda p, jarr, tarr: (tarr[p], 0, 0)),
            pl.BlockSpec((1, BN, 1), lambda p, jarr, tarr: (tarr[p], 0, 0)),
            pl.BlockSpec((1, BN, K), lambda p, jarr, tarr: (tarr[p], 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, S * K),
                               lambda p, jarr, tarr: (jarr[p], 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, BM=BM, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((J * R, S * K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jarr, tarr, skeys.reshape(T + 1, 1, BN), skeys.reshape(T + 1, BN, 1),
      srows.reshape(T + 1, BN, K))
    # (J·R, S·K) → (J·BM, K) is a row-major bijection: cell a·S+s ↔
    # (row a, lanes s·K..s·K+K)
    return out.reshape(J * BM, K)[:nrows].astype(dtype)


def segment_rows_scan(idx: jnp.ndarray, upd: jnp.ndarray,
                      nrows: int) -> jnp.ndarray:
    """The same plan as one `lax.scan` of dynamic-slice + one-hot matmul +
    dynamic-update-slice steps — pure XLA (~10 ops), no Mosaic."""
    N, K = upd.shape
    dtype = upd.dtype
    BN, BM, S = _block_sizes(K)
    R = BM // S
    J = -(-nrows // BM)
    skeys, srows, T = _sort_pad(idx, upd.astype(jnp.float32), BN)
    jarr, tarr, P = _plan_pairs(skeys, T, J, BN, BM)
    iota_r = jnp.arange(R, dtype=jnp.int32)[:, None]

    def step(buf, jt):
        jp, tp = jt
        keys = jax.lax.dynamic_slice(skeys, (tp * BN,), (BN,))
        rows = jax.lax.dynamic_slice(srows, (tp * BN, 0), (BN, K))
        local = keys - jp * BM
        m = (local >= 0) & (local < BM)
        lc = jnp.clip(local, 0, BM - 1)
        a = jnp.where(m, lc // S, -1)
        onehot = jnp.where(iota_r == a[None, :], 1.0, 0.0)
        if S == 1:
            rows_exp = rows
        else:
            slot = (lc % S)[:, None]
            rows_exp = jnp.concatenate(
                [rows * (slot == s).astype(rows.dtype) for s in range(S)],
                axis=1)
        blk = jax.lax.dot_general(
            onehot, rows_exp,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        cur = jax.lax.dynamic_slice(buf, (jp * R, 0), (R, S * K))
        return jax.lax.dynamic_update_slice(buf, cur + blk, (jp * R, 0)), None

    buf, _ = jax.lax.scan(
        step, jnp.zeros((J * R, S * K), jnp.float32), (jarr, tarr))
    return buf.reshape(J * BM, K)[:nrows].astype(dtype)
