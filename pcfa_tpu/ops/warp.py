"""Differentiable sampling / warping / resizing primitives (channels-last).

These are the shared building blocks behind every flow estimator in the zoo
(SURVEY.md §2.5 #7): SpyNet's `Backward` warp (`SpyNet.py:86-102`), PWCNet's
`warp` (`PWCNet.py:166-206`), RAFT/GMA's `bilinear_sampler`
(`raft/utils/utils.py:57-71`), and the various bilinear up-samplings.

All functions are pure jnp (autodiff gives the backward passes the reference
implements by hand in CUDA), use static shapes, and are written to be
bit-compatible with the corresponding `torch.nn.functional` ops:

* `grid_sample`  — torch F.grid_sample (bilinear), both `align_corners`
  conventions, `zeros` / `border` padding.
* `interpolate_bilinear` — torch F.interpolate(mode='bilinear'), both
  `align_corners` conventions, implemented as two separable matmuls so the
  MXU does the interpolation instead of a scalar gather.
* `avg_pool2d` — torch F.avg_pool2d(k, stride=k).

Layout: images (B, H, W, C); point grids (B, Hg, Wg, 2) with (x, y) order in
the last axis, like torch.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def coords_grid(batch: int, ht: int, wd: int) -> jnp.ndarray:
    """Pixel-coordinate grid (B, H, W, 2) with (x, y) channels
    (`raft/utils/utils.py:74-77`, channels-last)."""
    y, x = jnp.meshgrid(jnp.arange(ht), jnp.arange(wd), indexing="ij")
    coords = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return jnp.broadcast_to(coords[None], (batch, ht, wd, 2))


def _bilinear_abs_reference(img, ix, iy, zeros: bool):
    """Bilinear sample at absolute pixel coords via 4 corner gathers.

    The production TPU path (see `_bilinear`): its backward is 4
    scalar-indexed scatter-adds, which XLA-TPU vectorizes far better
    than the windowed 2×2-slice scatter of `_bilinear_abs` (86 vs
    3091 ms fwd+bwd at FlowNet2's full-res warp on v5e)."""
    B, H, W, C = img.shape
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    flat = img.reshape(B, H * W, C)
    bhw = ix.shape  # (B, Hg, Wg)

    def corner(cx, cy, w):
        if zeros:
            valid = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
            w = jnp.where(valid, w, 0.0)
        cxc = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
        cyc = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
        idx = (cyc * W + cxc).reshape(B, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1).reshape(*bhw, C)
        return vals * w[..., None]

    return (
        corner(x0, y0, (1 - wx) * (1 - wy))
        + corner(x0 + 1, y0, wx * (1 - wy))
        + corner(x0, y0 + 1, (1 - wx) * wy)
        + corner(x0 + 1, y0 + 1, wx * wy)
    )


def _window_parts(img, ix, iy, zeros: bool):
    """Shared fwd/bwd machinery of the windowed bilinear sample.

    Returns (win, wm, indices, shapes...) where `win` is the (N, 2, 2, C)
    corner-value windows from ONE `lax.gather` of 2×2 slices out of an
    edge-replicated pad of `img`, and `wm` the (N, 2, 2) masked bilinear
    weights. Independent per-corner border clamping (both torch
    `padding_mode='border'` after pre-clip and `resample2d_kernel.cu:16-74`'s
    raw-frac clamping) is reproduced by clipping the window BASE to
    [-1, dim-1] in the padded array: an out-of-range corner then lands on a
    replicated border cell — the same value the per-corner clamp reads (and
    for the scatter transpose, the pad lines fold back onto the border
    rows/cols, which is exactly where the clamp would have accumulated)."""
    B, H, W, C = img.shape
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    a = (ix - x0)[..., None]  # (B, Hg, Wg, 1)
    b = (iy - y0)[..., None]

    r0 = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
    c0 = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
    N = r0.size
    brow = (jnp.arange(B, dtype=jnp.int32) * (H + 2))[:, None, None]
    indices = jnp.stack(
        [(brow + r0).reshape(N), c0.reshape(N)], axis=-1)  # (N, 2)

    padded = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    win = jax.lax.gather(
        padded.reshape(B * (H + 2), W + 2, C),
        indices,
        dnums,
        slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # (N, 2, 2, C)

    wxs = jnp.stack([1.0 - a, a], axis=-2)        # (B, Hg, Wg, 2, 1)
    wys = jnp.stack([1.0 - b, b], axis=-2)
    w = (wys[..., :, None, 0] * wxs[..., None, :, 0])  # (B, Hg, Wg, 2, 2)
    if zeros:
        vx = jnp.stack([(x0 >= 0) & (x0 < W), (x0 + 1 >= 0) & (x0 + 1 < W)],
                       axis=-1)
        vy = jnp.stack([(y0 >= 0) & (y0 < H), (y0 + 1 >= 0) & (y0 + 1 < H)],
                       axis=-1)
        mask = (vy[..., :, None] & vx[..., None, :]).reshape(N, 2, 2)
        w = jnp.where(vy[..., :, None] & vx[..., None, :], w, 0.0)
    else:
        mask = None
    wm = w.reshape(N, 2, 2)
    return win, wm, mask, indices, a, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bilinear_abs(img, ix, iy, zeros: bool):
    """Bilinear sample of `img` (B, H, W, C) at absolute pixel coordinates
    `ix`/`iy` (B, Hg, Wg). `zeros=True` zeroes out-of-range corner weights
    (grid_sample 'zeros'); False clamps corners to the border (resample2d /
    pre-clipped 'border').

    custom_vjp: the image gradient — 4 scalar-indexed scatter-adds under
    plain autodiff, the hottest op of the FlowNet2 attack closure — becomes
    ONE windowed (2, 2, C) `scatter_add` into the padded buffer, whose pad
    lines fold back onto the borders; the coordinate gradients come
    analytically from the same single windowed gather."""
    win, wm, _, _, _, _ = _window_parts(img, ix, iy, zeros)
    B, H, W, C = img.shape
    # preserve the reference's promotion semantics: vals(img.dtype) · w(coord
    # dtype) — bf16 features sampled at fp32 coords come out fp32, exactly
    # like the 4-corner formulation the models were validated against
    rt = jnp.result_type(img.dtype, ix.dtype)
    out = jnp.einsum("nkl,nklc->nc", wm.astype(rt), win.astype(rt))
    return out.reshape(*ix.shape, C)


def _bilinear_abs_fwd(img, ix, iy, zeros):
    return _bilinear_abs(img, ix, iy, zeros), (img, ix, iy)


def _bilinear_abs_bwd(zeros, res, g):
    img, ix, iy = res
    B, H, W, C = img.shape
    win, wm, mask, indices, a, b = _window_parts(img, ix, iy, zeros)
    N = wm.shape[0]
    gf = g.reshape(N, C).astype(jnp.float32)

    # d img: one windowed scatter-add (transpose of the windowed gather)
    upd = wm[..., None].astype(jnp.float32) * gf[:, None, None, :]
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1),
    )
    acc = jax.lax.scatter_add(
        jnp.zeros((B * (H + 2), W + 2, C), jnp.float32),
        indices,
        upd,
        dnums,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(B, H + 2, W + 2, C)
    acc = acc[:, 1:-1].at[:, 0].add(acc[:, 0]).at[:, -1].add(acc[:, -1])
    dimg = (
        acc[:, :, 1:-1].at[:, :, 0].add(acc[:, :, 0])
        .at[:, :, -1].add(acc[:, :, -1])
    ).astype(img.dtype)

    # d ix / d iy: per-corner ⟨value, g⟩ dots from the same window. In
    # zeros-mode an out-of-range corner contributes nothing (the `where`
    # zeroes its weight FACTOR, so autodiff — and torch's grid_sample
    # backward — drop its v·∂w term too).
    dot = jnp.einsum("nklc,nc->nkl", win.astype(jnp.float32), gf)
    if mask is not None:
        dot = jnp.where(mask, dot, 0.0)
    af = a.reshape(N).astype(jnp.float32)
    bf = b.reshape(N).astype(jnp.float32)
    dix = ((1.0 - bf) * (dot[:, 0, 1] - dot[:, 0, 0])
           + bf * (dot[:, 1, 1] - dot[:, 1, 0]))
    diy = ((1.0 - af) * (dot[:, 1, 0] - dot[:, 0, 0])
           + af * (dot[:, 1, 1] - dot[:, 0, 1]))
    return (dimg, dix.reshape(ix.shape).astype(ix.dtype),
            diy.reshape(iy.shape).astype(iy.dtype))


_bilinear_abs.defvjp(_bilinear_abs_fwd, _bilinear_abs_bwd)


def _corner_weights(img_shape, ix, iy, zeros: bool):
    """Shared coordinate machinery of the packed-corner sampler.

    Returns (idx, w4, mask4, a, b) where `idx` (N,) flat-indexes the
    (B, H+1, W+1) grid of padded window BASES, `w4` (N, 4) are the bilinear
    corner weights in slot order [(0,0), (0,1), (1,0), (1,1)] = [tl, tr,
    bl, br], and `mask4` (N, 4) the zeros-mode corner validity (None in
    border mode). Border semantics are the `_window_parts` trick: clip the
    window base to [-1, dim-1] in an edge-replicated pad, so out-of-range
    corners read (and, transposed, accumulate onto) the border cells that
    torch's per-corner clamp uses."""
    B, H, W, C = img_shape
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    a = ix - x0  # horizontal frac (B, Hg, Wg)
    b = iy - y0

    r0 = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
    c0 = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
    N = r0.size
    brow = (jnp.arange(B, dtype=jnp.int32) * (H + 1))[:, None, None]
    idx = ((brow + r0) * (W + 1) + c0).reshape(N)

    wx = jnp.stack([1.0 - a, a], axis=-1)  # (B, Hg, Wg, 2)
    wy = jnp.stack([1.0 - b, b], axis=-1)
    w4 = (wy[..., :, None] * wx[..., None, :]).reshape(N, 4)
    if zeros:
        vx = jnp.stack([(x0 >= 0) & (x0 < W), (x0 + 1 >= 0) & (x0 + 1 < W)],
                       axis=-1)
        vy = jnp.stack([(y0 >= 0) & (y0 < H), (y0 + 1 >= 0) & (y0 + 1 < H)],
                       axis=-1)
        mask4 = (vy[..., :, None] & vx[..., None, :]).reshape(N, 4)
        w4 = jnp.where(mask4, w4, 0.0)
    else:
        mask4 = None
    return idx, w4, mask4, a, b


def _pack_windows(img):
    """(B, H, W, C) → (B·(H+1)·(W+1), 4C) where row (b, r, c) holds the 2×2
    edge-replicated window at padded base (r, c), corners concatenated in
    slot order. Four static-slice copies — vector work, no gather."""
    B, H, W, C = img.shape
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    win4 = jnp.concatenate(
        [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]],
        axis=-1,
    )  # (B, H+1, W+1, 4C)
    return win4.reshape(B * (H + 1) * (W + 1), 4 * C)


def _segment_rows_sorted(idx: jnp.ndarray, upd: jnp.ndarray,
                         nrows: int) -> jnp.ndarray:
    """Σ of `upd` rows per destination row — scatter-free sorted splat.

    Equivalent to `zeros((nrows, K)).at[idx].add(upd)`, but XLA-TPU lowers
    a conflicting scatter-add as a SERIAL per-row loop (~55 ns/row — 27 ms
    for FlowNet2's 491k-row full-res warp backward, measured round 4).
    Instead: sort rows by destination, prefix-sum them, and read each
    destination's segment sum as a difference of the cumsum at its segment
    endpoints. The endpoints are written with UNIQUE-index scatters (one
    `last` per destination + per-row dump slots past `nrows`), which XLA
    vectorizes — every step is a sort, a flat row gather, a cumsum, or a
    unique store; nothing conflict-serialized.

    Measured (v5e, N=491k, K=12): XLA scatter is serial EVEN WITH
    unique_indices promised (29.3 ms — same as the conflicting add), so
    the segment endpoints cannot be scattered either. Instead they come
    from a MERGE: hi(p) = #keys ≤ p is the merged-sort position of a
    per-cell sentinel minus its sentinel rank, and positions are the
    inverse permutation of the sort — itself computable by a second
    sort. Everything is sorts (≈free at these sizes), one row gather,
    one cumsum, a contiguous slice, and an adjacent difference.

    fp32 note: the per-cell sum emerges as `S[p] − S[p−1]` of gathered
    prefix sums; cancellation error is O(‖running sum‖·eps) ≈ 1e-5
    relative at these shapes — below the bf16 compute noise the attack
    path already carries (parity-tested against the scatter path).
    """
    N, K = upd.shape
    iota_n = jnp.arange(N, dtype=jnp.int32)
    # data-only sorted order → prefix sums over rows grouped by key.
    # Center each column first: systematic-sign cotangents (e.g. a
    # mean-square loss) make the raw prefix sum grow ~N·u, and the
    # adjacent-difference then loses N·eps ≈ 3e-2 relative at N=491k
    # (measured 2.4e-3 on the full-res warp). Centered, the sum is a
    # ~√N random walk; the exact per-cell count × mean is added back.
    _, perm_d = jax.lax.sort_key_val(idx, iota_n)
    cmean = jnp.mean(upd, axis=0, keepdims=True)
    u = jnp.take(upd - cmean, perm_d, axis=0)
    csum = jnp.concatenate(
        [jnp.zeros((1, K), upd.dtype), jnp.cumsum(u, axis=0)])  # (N+1, K)

    # merged sort of data keys (tag 0) and one sentinel per cell (tag 1,
    # i.e. AFTER equal data keys): sentinel p's merged position, minus the
    # p sentinels before it, is hi(p) = #data keys ≤ p
    l_total = N + nrows
    comp = jnp.concatenate(
        [idx * 2, jnp.arange(nrows, dtype=jnp.int32) * 2 + 1])
    iota_l = jnp.arange(l_total, dtype=jnp.int32)
    _, perm_m = jax.lax.sort_key_val(comp, iota_l)
    _, inv = jax.lax.sort_key_val(perm_m, iota_l)   # inverse permutation
    hi = inv[N:] - jnp.arange(nrows, dtype=jnp.int32)

    s = jnp.take(csum, hi, axis=0)                  # S[p] = Σ rows(key ≤ p)
    seg = s - jnp.concatenate([jnp.zeros((1, K), s.dtype), s[:-1]])
    count = hi - jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), hi[:-1]])      # exact rows per cell
    return seg + count[:, None].astype(seg.dtype) * cmean


def _dimg_rows(idx: jnp.ndarray, upd: jnp.ndarray,
               nrows: int) -> jnp.ndarray:
    """Per-destination row sums for the warp image gradient.

    `PCFA_WARP_DIMG` selects the formulation:
    * 'onehot' (default on TPU) — sorted blocked one-hot matmuls in ONE
      Pallas kernel (`ops/pallas/segsum.py`): the splat runs on the MXU
      and the kernel is opaque to XLA, so it dodges BOTH the scatter's
      serial lowering and the sorted-splat's fusion-planner compile
      blowup (round-4 failure: 4 sorted splats in the FlowNet2 closure
      never finished compiling).
    * 'onehot_scan' — the same plan as one tiny lax.scan, pure XLA.
    * 'sorted' — sorts + cumsum + merge-based adjacent difference.
    * 'scatter' (default off-TPU) — XLA scatter-add; conflict-serialized
      on TPU (~55 ns/row — 27 ms at FlowNet2's 491k-row full-res warp)
      but the fastest lowering on CPU.

    Default history: 'sorted' won isolated on v5e (round 4) but was
    reverted for the compile blowup. 'onehot' (round 5) wins 2× isolated
    on v5e (32.4 → 16.7 ms/warp fwd+bwd, parity 8e-8) and compiles the
    FlowNet2 closure fine — but EXECUTING that closure through the axon
    tunnel crashes its client (Rust panic, client.rs:2008 index==len on
    the 246-arg step program; deterministic, scatter-leg executes clean;
    the trigger needs the full network — six reduced probes at real
    sizes all pass, BASELINE.md round-5 log). Default is therefore
    'onehot' on real TPU backends and 'scatter' under the tunnel
    (JAX_PLATFORMS=axon); PCFA_WARP_DIMG overrides both ways."""
    mode = os.environ.get("PCFA_WARP_DIMG")
    if mode is None:
        on_tpu = jax.default_backend() == "tpu"
        tunneled = os.environ.get("JAX_PLATFORMS", "") == "axon"
        mode = ("onehot" if on_tpu and not tunneled else "scatter")
    if mode == "onehot":
        from pcfa_tpu.ops.pallas import segsum

        if jax.default_backend() == "tpu" or segsum._INTERPRET:
            return segsum.segment_rows_pallas(idx, upd, nrows)
        return segsum.segment_rows_scan(idx, upd, nrows)
    if mode == "onehot_scan":
        from pcfa_tpu.ops.pallas import segsum

        return segsum.segment_rows_scan(idx, upd, nrows)
    if mode == "sorted":
        return _segment_rows_sorted(idx, upd, nrows)
    if mode != "scatter":
        raise ValueError(
            f"PCFA_WARP_DIMG={mode!r}: expected 'onehot', 'onehot_scan', "
            "'sorted' or 'scatter'")
    return jnp.zeros((nrows, upd.shape[1]), upd.dtype).at[idx].add(
        upd, mode="promise_in_bounds")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bilinear_abs_packed(img, ix, iy, zeros: bool):
    """Packed-corner bilinear sample: ONE flat gather of 4C-wide rows.

    The 4-corner formulation issues 4 gathers (and, transposed, 4
    scatter-adds) of C-wide rows; at image C=3 that is 4× the index rows
    at 3/128-lane row width — the dominant cost of the FlowNet2 attack
    closure (a full-res warp measured 35.4 ms fwd / 119.9 ms fwd+bwd on
    v5e, vs ~45 ms for a whole FlowNetC fwd+bwd). Packing the 2×2 window
    into one 4C-contiguous row quarters the index rows and widens each
    transferred row 4×, for both the gather and its scatter transpose."""
    B, H, W, C = img.shape
    idx, w4, _, _, _ = _corner_weights(img.shape, ix, iy, zeros)
    win = _pack_windows(img).at[idx].get(
        mode="promise_in_bounds").reshape(-1, 4, C)  # (N, 4, C)
    rt = jnp.result_type(img.dtype, ix.dtype)
    out = jnp.einsum("nk,nkc->nc", w4.astype(rt), win.astype(rt))
    return out.reshape(*ix.shape, C)


def _bilinear_abs_packed_fwd(img, ix, iy, zeros):
    B, H, W, C = img.shape
    idx, w4, mask4, a, b = _corner_weights(img.shape, ix, iy, zeros)
    win = _pack_windows(img).at[idx].get(
        mode="promise_in_bounds").reshape(-1, 4, C)
    rt = jnp.result_type(img.dtype, ix.dtype)
    out = jnp.einsum("nk,nkc->nc", w4.astype(rt), win.astype(rt))
    # save the gathered windows: the backward's coordinate grads need the
    # corner VALUES — re-gathering them would repeat the hot op. `img`
    # rides along only for its (static) shape/dtype — statics can't be
    # pytree leaves in custom_vjp residuals.
    return out.reshape(*ix.shape, C), (img, win, idx, w4, mask4, a, b)


def _bilinear_abs_packed_bwd(zeros, res, g):
    img, win, idx, w4, mask4, a, b = res
    B, H, W, C = img.shape
    img_dtype, coord_dtype = img.dtype, a.dtype
    N = w4.shape[0]
    gf = g.reshape(N, C).astype(jnp.float32)

    # d img: ONE flat scatter-add of 4C-wide rows into the padded-base
    # grid, then four static shifted adds place each corner slot at its
    # true (base + (dy, dx)) cell of the (H+2, W+2) padded image, and the
    # pad lines fold onto the borders (exactly the clamp's accumulation
    # targets; in zeros mode the masked weights already zero them).
    upd = (w4.astype(jnp.float32)[:, :, None] * gf[:, None, :]).reshape(
        N, 4 * C)
    buf = _dimg_rows(idx, upd, B * (H + 1) * (W + 1))
    buf = buf.reshape(B, H + 1, W + 1, 4, C)
    acc = jnp.zeros((B, H + 2, W + 2, C), jnp.float32)
    acc = acc.at[:, :-1, :-1].add(buf[..., 0, :])
    acc = acc.at[:, :-1, 1:].add(buf[..., 1, :])
    acc = acc.at[:, 1:, :-1].add(buf[..., 2, :])
    acc = acc.at[:, 1:, 1:].add(buf[..., 3, :])
    acc = acc[:, 1:-1].at[:, 0].add(acc[:, 0]).at[:, -1].add(acc[:, -1])
    dimg = (
        acc[:, :, 1:-1].at[:, :, 0].add(acc[:, :, 0])
        .at[:, :, -1].add(acc[:, :, -1])
    ).astype(img_dtype)

    # d ix / d iy from the saved corner values (slot order tl, tr, bl, br).
    dot = jnp.einsum("nkc,nc->nk", win.astype(jnp.float32), gf)
    if mask4 is not None:
        dot = jnp.where(mask4, dot, 0.0)
    af = a.reshape(N).astype(jnp.float32)
    bf = b.reshape(N).astype(jnp.float32)
    dix = ((1.0 - bf) * (dot[:, 1] - dot[:, 0])
           + bf * (dot[:, 3] - dot[:, 2]))
    diy = ((1.0 - af) * (dot[:, 2] - dot[:, 0])
           + af * (dot[:, 3] - dot[:, 1]))
    return (dimg, dix.reshape(a.shape).astype(coord_dtype),
            diy.reshape(b.shape).astype(coord_dtype))


_bilinear_abs_packed.defvjp(_bilinear_abs_packed_fwd, _bilinear_abs_packed_bwd)


def _bilinear(img, ix, iy, zeros: bool):
    """Dispatch between the bilinear-sampler formulations
    (`PCFA_WARP_VJP=packed|reference|windowed`, default packed).

    Measured on v5e at FlowNet2's full-res warp (384×1280×3, bf16): the
    windowed (2,2,C)-slice gather/scatter lowers to a SERIAL per-index
    loop on TPU — fwd 1028 ms / fwd+bwd 3091 ms vs the 4-corner
    `take_along_axis` formulation's 60 / 86 ms. XLA vectorizes flat 1-D
    gathers along the minor dim; it cannot vectorize multi-dim window
    slices. `packed` keeps the flat-1-D lowering but moves the whole 2×2
    window per index row (see `_bilinear_abs_packed`)."""
    mode = os.environ.get("PCFA_WARP_VJP", "packed")
    if mode == "windowed":
        return _bilinear_abs(img, ix, iy, zeros)
    if mode == "reference":
        return _bilinear_abs_reference(img, ix, iy, zeros)
    return _bilinear_abs_packed(img, ix, iy, zeros)


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sampling with torch `F.grid_sample` semantics.

    img:  (B, H, W, C); grid: (B, Hg, Wg, 2) in [-1, 1], (x, y) order.
    Returns (B, Hg, Wg, C).
    """
    B, H, W, C = img.shape
    x, y = grid[..., 0], grid[..., 1]

    if align_corners:
        ix = (x + 1.0) * 0.5 * (W - 1)
        iy = (y + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((x + 1.0) * W - 1.0) * 0.5
        iy = ((y + 1.0) * H - 1.0) * 0.5

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    return _bilinear(img, ix, iy, padding_mode == "zeros")


def bilinear_sampler(
    img: jnp.ndarray, coords: jnp.ndarray, mask: bool = False
):
    """RAFT-style sampling at absolute pixel coordinates
    (`raft/utils/utils.py:57-71`): normalize with align_corners=True and
    grid-sample with zero padding."""
    H, W = img.shape[1], img.shape[2]
    xgrid = 2.0 * coords[..., 0] / (W - 1) - 1.0
    ygrid = 2.0 * coords[..., 1] / (H - 1) - 1.0
    grid = jnp.stack([xgrid, ygrid], axis=-1)
    out = grid_sample(img, grid, align_corners=True, padding_mode="zeros")
    if mask:
        m = (xgrid > -1) & (ygrid > -1) & (xgrid < 1) & (ygrid < 1)
        return out, m.astype(img.dtype)
    return out


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix matching torch
    F.interpolate. Built host-side once per static shape."""
    if align_corners and out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    x0 = np.floor(src)
    frac = src - x0
    # Edge handling: clamp corner indices into range (torch semantics); the
    # weights still sum to 1 so out-of-range sources read the border value.
    lo = np.clip(x0, 0, in_size - 1).astype(np.int64)
    hi = np.clip(x0 + 1, 0, in_size - 1).astype(np.int64)
    M = np.zeros((out_size, in_size), np.float32)
    np.add.at(M, (np.arange(out_size), lo), 1.0 - frac)
    np.add.at(M, (np.arange(out_size), hi), frac)
    return M


def interpolate_bilinear(
    img: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch `F.interpolate(..., mode='bilinear')` on (B, H, W, C) arrays,
    expressed as two dense matmuls (MXU-friendly; no gather)."""
    H_out, W_out = out_hw
    Mh = jnp.asarray(_resize_matrix(img.shape[1], H_out, align_corners))
    Mw = jnp.asarray(_resize_matrix(img.shape[2], W_out, align_corners))
    out = jnp.einsum("oh,bhwc->bowc", Mh, img, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("pw,bowc->bopc", Mw, out, precision=jax.lax.Precision.HIGHEST)
    return out


def upflow(flow: jnp.ndarray, factor: int = 8, align_corners: bool = True) -> jnp.ndarray:
    """Upsample a flow field spatially by `factor` and scale its magnitude
    (`raft/utils/utils.py:80-82` upflow8)."""
    B, H, W, C = flow.shape
    return factor * interpolate_bilinear(
        flow, (factor * H, factor * W), align_corners=align_corners
    )


def avg_pool2d(img: jnp.ndarray, window: int = 2, stride: int | None = None) -> jnp.ndarray:
    """Average pooling on (B, H, W, C), VALID padding — matches torch
    F.avg_pool2d(k, stride)."""
    stride = stride or window
    summed = jax.lax.reduce_window(
        img,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return summed / (window * window)


def resample2d(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """FlowNet2 warp (`resample2d_kernel.cu:16-74`, SURVEY.md §2.5 #3):
    out(x,y) = bilinear(img at (x+u, y+v)), corner indices clamped to the
    borders with weights from the unclamped fracs (`_bilinear` with
    zeros=False); autodiff of the 4-corner gather stands in for the two
    backward kernels the reference hand-writes (`resample2d_kernel.cu:77+`)
    — measured faster on TPU than the windowed-scatter custom VJP, whose
    window ops lower serially (see `_bilinear`)."""
    B, H, W, C = img.shape
    xs = jnp.arange(W, dtype=img.dtype)
    ys = jnp.arange(H, dtype=img.dtype)
    gx = xs[None, None, :] + flow[..., 0]
    gy = ys[None, :, None] + flow[..., 1]
    return _bilinear(img, gx, gy, False)
