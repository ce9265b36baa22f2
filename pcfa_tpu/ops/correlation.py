"""Correlation volumes: the compute hot spots of every flow network.

Pure-jnp/XLA reference implementations of the three correlation flavors whose
reference counterparts are hand-written C++/CUDA (SURVEY.md §2.5):

* `allpairs_correlation` + `corr_pyramid` + `corr_lookup` — RAFT/GMA
  CorrBlock (`models/raft/corr.py:12-60`): one (H·W)×(H·W) matmul / sqrt(C),
  4-level avg-pooled pyramid, per-iteration bilinear window lookup.
* `local_correlation` — PWCNet's `spatial_correlation_sample` with
  kernel=1, patch=9, stride=1 (vendored OpenMP kernel
  `Correlation_Module/correlation.cpp:39-73,78-125`): 81 shifted
  dot-products with zero padding, normalized by channel count
  (`PWCNet.py:45-58`).
* `global_correlation` — FlowNetC's `correlation_cuda` with
  max_displacement=20, stride2=2 → 21×21=441 channels
  (`FlowNetC.py:28-31`, `correlation_cuda_kernel.cu:46-120`).

Everything here lowers to XLA dot/conv/gather; the Pallas kernels in
`pcfa_tpu/ops/pallas/` provide fused versions of the lookup for large
problems. Layout is channels-last (B, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcfa_tpu.ops.warp import avg_pool2d, bilinear_sampler


def allpairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation ⟨f1, f2⟩ / sqrt(C) (`raft/corr.py:52-60`).

    fmap1: (B, H1, W1, C), fmap2: (B, H2, W2, C) → (B, H1, W1, H2, W2).
    The spatial shapes may differ (spatial sharding hands in a row shard of
    fmap1 against the full fmap2 — `parallel/sp.py`).
    """
    B, H1, W1, C = fmap1.shape
    _, H2, W2, _ = fmap2.shape
    f1 = fmap1.reshape(B, H1 * W1, C)
    f2 = fmap2.reshape(B, H2 * W2, C)
    corr = jnp.einsum(
        "bnc,bmc->bnm", f1, f2, precision=jax.lax.Precision.HIGHEST
    )
    corr = corr / jnp.sqrt(jnp.asarray(C, dtype=fmap1.dtype))
    return corr.reshape(B, H1, W1, H2, W2)


def corr_pyramid(corr: jnp.ndarray, num_levels: int = 4) -> list[jnp.ndarray]:
    """Average-pool pyramid over the *second* pair of spatial axes
    (`raft/corr.py:21-27`). corr: (B, H1, W1, H2, W2) → list of
    (B·H1·W1, H2/2^i, W2/2^i, 1) arrays ready for bilinear lookup."""
    B, H1, W1, H2, W2 = corr.shape
    level = corr.reshape(B * H1 * W1, H2, W2, 1)
    pyramid = [level]
    for _ in range(num_levels - 1):
        level = avg_pool2d(level, 2, 2)
        pyramid.append(level)
    return pyramid


def resolve_corr_impl(
    impl: str,
    fmap1_shape: tuple,
    fmap2_shape: tuple,
    num_levels: int,
    dtype,
    spatial_shards: int = 1,
) -> str:
    """Resolve `corr_impl='auto'` → 'materialized' | 'fused' (trace-time).

    The reference leaves this choice to a build flag (`alt_cuda_corr`
    installed or not, `raft/corr.py:63-91`); here it is a static per-shape
    policy: materialize the pyramid when its forward+cotangent footprint
    fits an HBM budget (default 6 GiB, `PCFA_CORR_HBM_BUDGET_MB`), else run
    the blockwise volume-free lookup. Shapes are static under jit, so the
    decision costs nothing at runtime. At KITTI size (bf16, batch 2) the
    estimate is ~0.6 GB → materialized (the faster path, BASELINE.md);
    at 2× KITTI (752×2496) batch=1 it is ~4.6 GB → still materialized
    (measured round 5: materialized 0.007095 pairs/s fits v5e HBM under
    remat and beats hybrid 0.006606 and fused 0.006202 — the 4 GiB
    round-2 budget mispredicted this shape); at 2× KITTI batch=2 (~9 GB)
    → fused, the only path that fits."""
    if impl != "auto":
        return impl
    import os

    budget = int(os.environ.get("PCFA_CORR_HBM_BUDGET_MB", "6144")) << 20
    B, H1, W1, _ = fmap1_shape
    _, H2, W2, _ = fmap2_shape
    pyr_elems = 0
    h, w = H2, W2
    for _ in range(num_levels):
        pyr_elems += h * w
        h, w = max(h // 2, 1), max(w // 2, 1)
    itemsize = jnp.dtype(dtype).itemsize
    # forward pyramid + backward cotangent buffers ≈ 2× the pyramid; under
    # spatial sharding each device holds only its f1 row shard
    est = 2 * B * (H1 * W1 // max(spatial_shards, 1)) * pyr_elems * itemsize
    return "materialized" if est <= budget else "fused"


def corr_pyramid_pooled(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4,
    start_level: int = 0,
) -> list[jnp.ndarray]:
    """Correlation pyramid built per-level from POOLED f2 features.

    Average-pooling the (H2, W2) axes of the all-pairs volume commutes with
    the channel dot product, so level l equals a direct correlation against
    `avgpool²ˡ(f2)` — the same identity `alt_cuda_corr` uses
    (`raft/corr.py:63-91`) and `f2_feature_pyramid` exploits for the fused
    path. Same output list as
    `corr_pyramid(allpairs_correlation(f1, f2), L)` (exact up to fp
    association), but the autodiff graph is radically cheaper on TPU: the
    volume-pooling form backpropagates through a dpyramid → unpool →
    dvolume → dfmap chain over O(N²) buffers (measured ~47 ms one-time in
    the RAFT closure, BASELINE.md round-2 dissection); here every level's
    cotangent feeds two MXU matmuls directly (df1 += dcmapₗ @ f2ₗ,
    df2ₗ = dcmapₗᵀ @ f1) and the remaining pooling backward runs over the
    tiny O(N·C) feature maps. Forward cost rises only by the pooled-level
    matmuls (Σ 1/4ˡ ≈ 1.33× of level 0) — pure MXU work.

    fmap1: (B, H1, W1, C); fmap2: (B, H2, W2, C) → list of
    (B·H1·W1, H2/2ˡ, W2/2ˡ, 1), level-0-first, ready for `corr_lookup_mm`.
    `start_level` skips the first levels' matmuls (the hybrid corr path
    materializes only levels ≥ 1, rebuilding level 0 per lookup).
    """
    B, H1, W1, C = fmap1.shape
    f1 = fmap1.reshape(B, H1 * W1, C)
    inv_sqrt_c = jnp.asarray(1.0, fmap1.dtype) / jnp.sqrt(
        jnp.asarray(C, dtype=fmap1.dtype)
    )
    pyramid = []
    f2_l = fmap2
    for _ in range(start_level):
        f2_l = avg_pool2d(f2_l, 2, 2)
    for _ in range(num_levels - start_level):
        _, H2, W2, _ = f2_l.shape
        cmap = jnp.einsum(
            "bnc,bmc->bnm", f1, f2_l.reshape(B, H2 * W2, C),
            precision=jax.lax.Precision.HIGHEST,
        ) * inv_sqrt_c
        pyramid.append(cmap.reshape(B * H1 * W1, H2, W2, 1))
        f2_l = avg_pool2d(f2_l, 2, 2)
    return pyramid


def corr_lookup(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Radius-r window lookup in each pyramid level (`raft/corr.py:29-50`).

    coords: (B, H1, W1, 2) current correspondence estimates in level-0 pixels.
    Returns (B, H1, W1, num_levels·(2r+1)²), channel order identical to the
    reference: per level, index a·(2r+1)+b samples at
    (x + lin[a], y + lin[b]) — note the reference adds the *first* meshgrid
    axis to x (`raft/corr.py:37-43`), which we reproduce exactly.
    """
    r = radius
    B, H1, W1, _ = coords.shape
    lin = jnp.linspace(-r, r, 2 * r + 1)
    # reference: delta = stack(meshgrid(dy, dx, indexing='ij'), -1) then
    # coords(x,y) + delta → x gets the row offset, y the column offset.
    da, db = jnp.meshgrid(lin, lin, indexing="ij")
    delta = jnp.stack([da, db], axis=-1)  # (2r+1, 2r+1, 2), [...,0] added to x

    out_pyramid = []
    for i, corr in enumerate(pyramid):
        centroid = coords.reshape(B * H1 * W1, 1, 1, 2) / 2**i
        coords_lvl = centroid + delta[None]
        sampled = bilinear_sampler(corr, coords_lvl)  # (B·H1·W1, 2r+1, 2r+1, 1)
        out_pyramid.append(sampled.reshape(B, H1, W1, (2 * r + 1) ** 2))
    return jnp.concatenate(out_pyramid, axis=-1)


def corr_lookup_mm(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Gather-free `corr_lookup`: bilinear window sampling as two batched
    matmuls per pyramid level (MXU) instead of 4-corner gathers (TPU
    gathers/scatters run on the scalar core and dominate the attack's
    runtime; this is the `alt_cuda_corr` analog, SURVEY.md §2.5 #5).

    Bilinear interpolation with zero padding is linear in the correlation
    map, and the (2r+1)² window factorizes over the two axes:
        out[p, a, b] = Σ_{i,j} Wx_p[a, i] · corr_p[i, j] · Wy_p[b, j]
    where the weight rows are hat functions `relu(1 - |s - iota|)` — which
    equal the 2-corner bilinear weights, and vanish outside the map exactly
    like `grid_sample`'s zero padding. The reference's transposed window
    quirk (x gets the FIRST offset axis, `raft/corr.py:37-43`) is preserved:
    `a` offsets x, `b` offsets y.

    Identical (up to fp association) to `corr_lookup`; fully differentiable
    (the VJP is two transposed matmuls — also gather-free).
    """
    r = radius
    P = 2 * r + 1
    B, H1, W1, _ = coords.shape
    N = B * H1 * W1
    lin = jnp.linspace(-r, r, P, dtype=coords.dtype)

    out_pyramid = []
    for i, corr in enumerate(pyramid):
        _, H2, W2, _ = corr.shape
        c = coords.reshape(N, 2) / 2**i
        sx = c[:, 0:1, None] + lin[None, :, None]  # (N, P, 1) x-samples
        sy = c[:, 1:2, None] + lin[None, :, None]  # (N, P, 1) y-samples
        ix = jnp.arange(W2, dtype=coords.dtype)[None, None, :]
        iy = jnp.arange(H2, dtype=coords.dtype)[None, None, :]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - ix))  # (N, P, W2)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - iy))  # (N, P, H2)

        cmap = corr.reshape(N, H2, W2)
        # match the map's dtype: under a bf16 compute stack, fp32 weights
        # would silently promote the BIG cmap operand to fp32 and turn
        # these into 6-pass HIGHEST matmuls (precision only relaxes to the
        # fast bf16 path when the operands themselves are bf16)
        wy = wy.astype(cmap.dtype)
        wx = wx.astype(cmap.dtype)
        # rows first (y), then columns (x): out[n, a, b]
        tmp = jnp.einsum("nbj,njk->nbk", wy, cmap,
                         precision=jax.lax.Precision.HIGHEST)  # (N, P, W2)
        win = jnp.einsum("nak,nbk->nab", wx, tmp,
                         precision=jax.lax.Precision.HIGHEST)  # (N, P, P)
        out_pyramid.append(win.reshape(B, H1, W1, P * P))
    return jnp.concatenate(out_pyramid, axis=-1)


def corr_lookup_mm_rf(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """`corr_lookup_mm` with a per-level association order:
    win = wy @ (cmap @ wxᵀ) on wide levels (W2 > 128), the left-first
    (wy @ cmap) @ wxᵀ on the rest.

    Same math to fp association. Why it matters: the per-query matmuls are
    MXU-PASS-bound (M=9 burns ~93% of every 128-wide pass), so runtime
    scales with ceil-tile pass COUNT, not FLOPs. Contracting the wide W2
    axis first keeps the big operand's ≥2 N-tiles out of the second matmul
    and its backward (level-0 fwd+bwd 12 → 9 passes/query); on one-tile
    levels the right-first backward's tmp2 recompute makes it a net loss
    (4 → 5), so those stay left-first. Measured:
    scripts/profile_lookup_forms.py."""
    r = radius
    P = 2 * r + 1
    B, H1, W1, _ = coords.shape
    N = B * H1 * W1
    lin = jnp.linspace(-r, r, P, dtype=coords.dtype)

    out_pyramid = []
    for i, corr in enumerate(pyramid):
        _, H2, W2, _ = corr.shape
        c = coords.reshape(N, 2) / 2**i
        sx = c[:, 0:1, None] + lin[None, :, None]
        sy = c[:, 1:2, None] + lin[None, :, None]
        ix = jnp.arange(W2, dtype=coords.dtype)[None, None, :]
        iy = jnp.arange(H2, dtype=coords.dtype)[None, None, :]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - ix))  # (N, P, W2)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - iy))  # (N, P, H2)

        cmap = corr.reshape(N, H2, W2)
        wy = wy.astype(cmap.dtype)
        wx = wx.astype(cmap.dtype)
        if W2 > 128:
            # columns first (x), then rows (y): same output layout as _mm
            tmp = jnp.einsum("njk,nak->nja", cmap, wx,
                             precision=jax.lax.Precision.HIGHEST)
            win = jnp.einsum("nbj,nja->nab", wy, tmp,
                             precision=jax.lax.Precision.HIGHEST)
        else:
            # small levels: one W2 lane-tile — the left-first order's
            # backward needs no tmp2 recompute and wins (pass-count 4 vs 5)
            tmp = jnp.einsum("nbj,njk->nbk", wy, cmap,
                             precision=jax.lax.Precision.HIGHEST)
            win = jnp.einsum("nak,nbk->nab", wx, tmp,
                             precision=jax.lax.Precision.HIGHEST)
        out_pyramid.append(win.reshape(B, H1, W1, P * P))
    return jnp.concatenate(out_pyramid, axis=-1)


def corr_lookup_gather(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """`corr_lookup_mm` re-formulated as flat row gathers + VPU blends.

    The separable-matmul lookup keeps every byte on the MXU, but its tiles
    are tiny (M = 2r+1 = 9 rows against 128-lane tiles → <1% utilization;
    measured 7.8 ms fwd+bwd per RAFT iteration at KITTI size, ~80% of the
    iteration). This form exploits that all (2r+1)² window samples of one
    query share a single fractional offset (the window offsets are
    integers): per query it gathers the P+1 = 2r+2 full correlation-map
    rows the window can touch — ONE flat gather of (1, W2) row slices, the
    contiguous-minor-dim shape TPU gathers vectorize (the packed-corner
    warp lesson, `ops/warp.py`) — then blends vertically, transposes the
    small slab, gathers the P+1 column slices, and blends horizontally.
    Zero padding outside the map is folded into the blend weights (masked
    hat weights), matching `corr_lookup`/`corr_lookup_mm` exactly.

    Identical output layout to `corr_lookup_mm` (x gets the first offset
    axis — the reference's transposed-window quirk `raft/corr.py:37-43`).
    Differentiable through the gathers (VJP = row scatter-adds); coords are
    `stop_gradient`ed HERE (raft.py:123 semantics, same contract as the
    Pallas path) — the gather formulation's natural coords-VJP would be a
    truncated fx-only gradient, not the mm hat-weight gradient.
    """
    coords = jax.lax.stop_gradient(coords)
    r = radius
    P = 2 * r + 1
    B, H1, W1, _ = coords.shape
    N = B * H1 * W1
    u = jnp.arange(P + 1, dtype=jnp.int32)

    out_pyramid = []
    for i, corr in enumerate(pyramid):
        _, H2, W2, _ = corr.shape
        cmap = corr.reshape(N, H2, W2)
        c = coords.reshape(N, 2).astype(jnp.float32) / 2**i
        ix0f = jnp.floor(c[:, 0])
        iy0f = jnp.floor(c[:, 1])
        fx = (c[:, 0] - ix0f).astype(cmap.dtype)[:, None, None]
        fy = (c[:, 1] - iy0f).astype(cmap.dtype)[:, None, None]
        ix0 = ix0f.astype(jnp.int32)
        iy0 = iy0f.astype(jnp.int32)

        rows = iy0[:, None] - r + u[None]                      # (N, P+1)
        mv = ((rows >= 0) & (rows < H2)).astype(cmap.dtype)[:, :, None]
        slab = jnp.take_along_axis(
            cmap, jnp.clip(rows, 0, H2 - 1)[:, :, None], axis=1
        )                                                      # (N, P+1, W2)
        vrow = ((1 - fy) * mv[:, :P]) * slab[:, :P] \
            + (fy * mv[:, 1:]) * slab[:, 1:]                   # (N, P, W2)

        cols = ix0[:, None] - r + u[None]                      # (N, P+1)
        mh = ((cols >= 0) & (cols < W2)).astype(cmap.dtype)[:, :, None]
        vrt = vrow.transpose(0, 2, 1)                          # (N, W2, P)
        wslab = jnp.take_along_axis(
            vrt, jnp.clip(cols, 0, W2 - 1)[:, :, None], axis=1
        )                                                      # (N, P+1, P)
        win = ((1 - fx) * mh[:, :P]) * wslab[:, :P] \
            + (fx * mh[:, 1:]) * wslab[:, 1:]                  # (N, a, b)
        out_pyramid.append(win.reshape(B, H1, W1, P * P))
    return jnp.concatenate(out_pyramid, axis=-1)


def corr_lookup_window(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Dispatch the materialized-pyramid window lookup implementation.

    `PCFA_CORR_LOOKUP` ∈ {'mm_rf', 'mm', 'pallas', 'gather'}, default
    'mm_rf' (per-level association order — fwd+bwd 6.2 vs mm's 7.3
    ms/lookup at KITTI size, see `corr_lookup_mm_rf`). The rest measured
    SLOWER on v5e (KITTI size, bf16, fwd / fwd+bwd per iteration): mm
    4.3/7.8 (left-first separable matmuls; M=9 tile padding is ugly but
    everything stays on the MXU), gather 15.0/33.6 (take_along_axis rows —
    even full-row (1, W2) slices lose 3.5×), pallas 8.9/14.2
    (`ops/pallas/corr_lookup.py`: per-query dynamic sublane slice+blend —
    the 14.7k-iteration scalar loop costs ~570 cycles/query and cannot be
    vectorized across queries because Mosaic rotates are per-plane). All
    stay as parity-tested ablations."""
    import os

    impl = os.environ.get("PCFA_CORR_LOOKUP", "mm_rf")
    if impl not in ("mm_rf", "mm", "pallas", "gather"):
        raise ValueError(
            f"PCFA_CORR_LOOKUP={impl!r}: expected one of "
            "'mm_rf', 'mm', 'pallas', 'gather'")
    if impl == "pallas":
        from pcfa_tpu.ops.pallas.corr_lookup import corr_lookup_pallas

        return corr_lookup_pallas(pyramid, coords, radius)
    if impl == "mm_rf":
        return corr_lookup_mm_rf(pyramid, coords, radius)
    if impl == "mm":
        return corr_lookup_mm(pyramid, coords, radius)
    return corr_lookup_gather(pyramid, coords, radius)


def f2_feature_pyramid(fmap2: jnp.ndarray, num_levels: int = 4) -> list[jnp.ndarray]:
    """Pooled FEATURE pyramid for the fused (non-materializing) corr path.

    Average-pooling the correlation volume over its (i, j) axes commutes
    with the channel dot product:
        avgpool²ˡ(⟨f1[n], f2[·,·]⟩)[i, j] = ⟨f1[n], avgpool²ˡ(f2)[i, j]⟩,
    so the level-l corr map equals a correlation against the pooled feature
    map — exactly the trick `alt_cuda_corr` uses (`raft/corr.py:63-91`
    pools fmap2, not the volume). fmap2: (B, H2, W2, C) → list of
    (B, H2/2ˡ, W2/2ˡ, C)."""
    levels = [fmap2]
    for _ in range(num_levels - 1):
        levels.append(avg_pool2d(levels[-1], 2, 2))
    return levels


def corr_lookup_fused(
    fmap1: jnp.ndarray,
    f2_levels: list[jnp.ndarray],
    coords: jnp.ndarray,
    radius: int = 4,
    block: int = 1024,
) -> jnp.ndarray:
    """Fused all-pairs-correlation + window lookup that NEVER materializes
    the O(N²) volume (the `alt_cuda_corr` analog, SURVEY.md §2.5 #5 /
    §5 "flagship"; reference stub `raft/corr.py:63-91`).

    Equivalent (up to fp association) to
        corr_lookup_mm(corr_pyramid(allpairs_correlation(f1, f2), L), coords)
    but blockwise over queries: for each block of `block` query positions it
    builds the corr rows `f1_blk @ f2_lᵀ / √C` on the fly (MXU matmul
    against the VMEM-resident pooled feature map) and immediately applies
    the separable bilinear window matmuls of `corr_lookup_mm`. Peak live
    memory per block is `block · H2·W2` instead of `N · H2·W2`; the block
    body is `jax.checkpoint`ed so the backward pass recomputes the corr
    rows instead of storing them. This is what makes ≥2× KITTI-resolution
    attacks fit v5e HBM.

    fmap1: (B, H1, W1, C); f2_levels from `f2_feature_pyramid`;
    coords: (B, H1, W1, 2). Returns (B, H1, W1, L·(2r+1)²) in fmap1's
    dtype, channel order identical to `corr_lookup` (x gets the first
    offset axis, the reference's transposed-window quirk
    `raft/corr.py:37-43`).
    """
    r = radius
    P = 2 * r + 1
    B, H1, W1, C = fmap1.shape
    L = len(f2_levels)
    N = H1 * W1
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    lin = jnp.linspace(-r, r, P, dtype=jnp.float32)

    T = min(block, N)
    nb = -(-N // T)
    pad = nb * T - N

    def single(f1, c, levels):
        # f1: (N, C), c: (N, 2)
        f1p = jnp.pad(f1, ((0, pad), (0, 0))).reshape(nb, T, C)
        cp = jnp.pad(c, ((0, pad), (0, 0))).reshape(nb, T, 2)

        @jax.checkpoint
        def block_fn(f1_blk, c_blk):
            outs = []
            for i, f2_l in enumerate(levels):
                H2, W2, _ = f2_l.shape
                corr = (
                    jnp.einsum(
                        "tc,mc->tm", f1_blk, f2_l.reshape(H2 * W2, C),
                        precision=jax.lax.Precision.HIGHEST,
                    ).astype(jnp.float32)
                    * inv_sqrt_c
                ).reshape(T, H2, W2).astype(f1_blk.dtype)
                cl = c_blk.astype(jnp.float32) / 2**i
                sx = cl[:, 0:1, None] + lin[None, :, None]  # (T, P, 1)
                sy = cl[:, 1:2, None] + lin[None, :, None]
                ix = jnp.arange(W2, dtype=jnp.float32)[None, None, :]
                iy = jnp.arange(H2, dtype=jnp.float32)[None, None, :]
                # weights in the map dtype — see corr_lookup_mm (avoids the
                # silent fp32 promotion of the big corr operand)
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - ix)).astype(
                    corr.dtype)  # (T, P, W2)
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - iy)).astype(
                    corr.dtype)  # (T, P, H2)
                tmp = jnp.einsum("tbj,tjk->tbk", wy, corr,
                                 precision=jax.lax.Precision.HIGHEST)
                win = jnp.einsum("tak,tbk->tab", wx, tmp,
                                 precision=jax.lax.Precision.HIGHEST)
                outs.append(win.reshape(T, P * P))
            return jnp.concatenate(outs, axis=-1)

        out = jax.lax.map(lambda ab: block_fn(*ab), (f1p, cp))
        return out.reshape(nb * T, L * P * P)[:N]

    out = jax.vmap(single)(
        fmap1.reshape(B, N, C), coords.reshape(B, N, 2),
        [lvl for lvl in f2_levels],
    )
    return out.reshape(B, H1, W1, L * P * P)


def corr_lookup_hybrid(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    pyramid_rest: list[jnp.ndarray],
    coords: jnp.ndarray,
    radius: int = 4,
    block: int = 1024,
) -> jnp.ndarray:
    """Hybrid materialized/fused window lookup: levels 1..L−1 read the
    MATERIALIZED pooled-f2 correlation maps (`corr_lookup_mm_rf`, the
    measured-fastest path for small maps), while the big level-0 window
    rows are rebuilt BLOCKWISE from the raw feature maps per lookup
    (`corr_lookup_fused` machinery restricted to one level) — trading idle
    MXU FLOPs for the ~B·N·H2·W2 HBM stream of the persistent level-0 map
    every iteration (fwd + cotangent accumulate in bwd). Motivation:
    `raft/corr.py:52-60` materializes everything; `alt_cuda_corr`
    (`raft/corr.py:63-91`) rebuilds everything; level 0 holds ¾ of the
    pyramid's bytes but only requires one extra N×N×C matmul to rebuild.

    fmap1/fmap2: (B, H, W, C); pyramid_rest: materialized levels 1..L−1
    (from `corr_pyramid_pooled` on the ONCE-pooled f2). Output identical
    (up to fp association) to `corr_lookup_mm` over the full pyramid.
    """
    lvl0 = corr_lookup_fused(fmap1, [fmap2], coords, radius, block)
    # pre-divide coords once: inside the sublist, level l is scaled 2^l
    # relative to the /2 coords → total /2^(l+1) as required
    rest = corr_lookup_mm_rf(pyramid_rest, coords / 2, radius)
    return jnp.concatenate([lvl0, rest], axis=-1)


def local_correlation(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    patch_size: int = 9,
    normalize_by_channels: bool = True,
) -> jnp.ndarray:
    """Local (patch) correlation, PWCNet flavor (`PWCNet.py:45-58`).

    out[b, h, w, (dy+R)·P + (dx+R)] = Σ_c f1[b,h,w,c] · f2[b,h+dy,w+dx,c] / C
    with zero padding outside the image (`correlation.cpp:6,20-36`: the
    output-channel index pairs (ph, pw) shift rows resp. columns).
    """
    B, H, W, C = fmap1.shape
    R = (patch_size - 1) // 2
    f2p = jnp.pad(fmap2, ((0, 0), (R, R), (R, R), (0, 0)))
    out = []
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy + R, dx + R, 0), (B, H, W, C)
            )
            out.append(jnp.sum(fmap1 * shifted, axis=-1))
    corr = jnp.stack(out, axis=-1)
    if normalize_by_channels:
        corr = corr / C
    return corr


def _band_from_taps(taps: jnp.ndarray, K: int) -> jnp.ndarray:
    """(..., W, K) tap matrix → (..., W, W+K−1) banded matrix with
    band[..., x, x+k] = taps[..., x, k], pure pad/reshape (no scatter):
    pad the tap axis to K+W, flatten the last two axes, truncate to
    W·(K+W−1), reshape — row x then lands shifted by x columns."""
    *lead, W, _ = taps.shape
    z = jnp.pad(taps, [(0, 0)] * len(lead) + [(0, 0), (0, W)])
    z = z.reshape(*lead, W * (K + W))[..., : W * (K + W - 1)]
    return z.reshape(*lead, W, K + W - 1)


def correlation_matmul_bwd(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    g: jnp.ndarray,
    patch: int,
    stride: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MXU-form backward for the patch-correlation ops (both flavors).

    The XLA shift-and-sum VJP materializes one shifted elementwise pass per
    displacement — patch² = 441 HBM passes for FlowNetC's global correlation
    (`correlation_cuda_kernel.cu` backward), where the Pallas backward
    kernels are gated off (they unroll all shifts and spill at patch 21).
    Instead, fold the dx displacement axis into a banded (W, W+2R) matrix
    per (row, dy) — built from the cotangent by a pad/reshape trick, no
    scatter — and contract it against row-shifted slabs of the other
    operand:

        df1[y] = Σ_dy  band(g)[y, dy] @ f2p[y + dy·s]          (W×W2)·(W2×C)
        df2p[y + dy·s] += band(g)[y, dy]ᵀ @ f1[y]              (W2×W)·(W×C)

    Two batched einsums (B·H·patch matmuls each) at 2·B·H·P·W·W2·C FLOPs —
    MXU work instead of patch² gradient streams. Exact (fp32-accumulated)
    match of the shift-and-sum VJP.
    """
    B, H, W, C = fmap1.shape
    P = patch
    R = (P - 1) // 2 * stride
    K = 2 * R + 1
    W2 = W + 2 * R
    f32 = jnp.float32

    # (B, H, W, P·P) → (B, H, P_dy, W, P_dx) → interleave stride zeros on
    # the dx tap axis → (B, H, P, W, K) → banded (B, H, P, W, W2)
    g4 = g.reshape(B, H, W, P, P).transpose(0, 1, 3, 2, 4)
    if stride > 1:
        z = jnp.zeros((B, H, P, W, P, stride), g.dtype)
        z = z.at[..., 0].set(g4)
        taps = z.reshape(B, H, P, W, P * stride)[..., :K]
    else:
        taps = g4
    band = _band_from_taps(taps, K)

    f2p = jnp.pad(fmap2, ((0, 0), (R, R), (R, R), (0, 0)))
    # F[b, y, d] = f2p rows y + d·stride, all padded cols: (B, H, P, W2, C)
    F = jnp.stack(
        [f2p[:, d * stride : d * stride + H] for d in range(P)], axis=2
    )
    df1 = jnp.einsum(
        "bhdxk,bhdkc->bhxc", band, F, preferred_element_type=f32
    ) / C

    T = jnp.einsum(
        "bhdxk,bhxc->bhdkc", band, fmap1, preferred_element_type=f32
    ) / C
    df2p = jnp.zeros((B, H + 2 * R, W2, C), f32)
    for d in range(P):
        df2p = df2p.at[:, d * stride : d * stride + H].add(T[:, :, d])
    df2 = df2p[:, R : R + H, R : R + W]
    return df1.astype(fmap1.dtype), df2.astype(fmap2.dtype)


def global_correlation(
    fmap1: jnp.ndarray,
    fmap2: jnp.ndarray,
    max_displacement: int = 20,
    stride2: int = 2,
) -> jnp.ndarray:
    """Global correlation, FlowNetC flavor (`correlation_cuda_kernel.cu:46-120`,
    params `FlowNetC.py:31`): displacements on a stride-2 grid in
    [-max_disp, max_disp]², kernel 1, zero padding, normalized by the channel
    count. Channel index = (dy_idx)·D + (dx_idx), D = 2·max_disp/stride2 + 1.
    """
    B, H, W, C = fmap1.shape
    R = max_displacement
    f2p = jnp.pad(fmap2, ((0, 0), (R, R), (R, R), (0, 0)))
    out = []
    for dy in range(-R, R + 1, stride2):
        for dx in range(-R, R + 1, stride2):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy + R, dx + R, 0), (B, H, W, C)
            )
            out.append(jnp.sum(fmap1 * shifted, axis=-1))
    corr = jnp.stack(out, axis=-1)
    return corr / C
