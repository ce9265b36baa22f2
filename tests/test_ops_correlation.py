"""Correlation volumes vs the reference CorrBlock and a naive numpy oracle."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from pcfa_tpu.ops import correlation

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def _naive_local_corr(f1, f2, patch):
    """Direct transcription of the OpenMP kernel semantics
    (correlation.cpp:20-36) as a numpy loop oracle."""
    B, H, W, C = f1.shape
    R = (patch - 1) // 2
    out = np.zeros((B, H, W, patch * patch), np.float32)
    for b in range(B):
        for h in range(H):
            for w in range(W):
                for pi, dy in enumerate(range(-R, R + 1)):
                    for pj, dx in enumerate(range(-R, R + 1)):
                        hh, ww = h + dy, w + dx
                        if 0 <= hh < H and 0 <= ww < W:
                            out[b, h, w, pi * patch + pj] = np.dot(
                                f1[b, h, w], f2[b, hh, ww]
                            )
    return out / C


def test_local_correlation_matches_oracle(rng):
    f1 = rng.standard_normal((1, 6, 7, 4)).astype(np.float32)
    f2 = rng.standard_normal((1, 6, 7, 4)).astype(np.float32)
    ours = np.asarray(correlation.local_correlation(jnp.asarray(f1), jnp.asarray(f2), 5))
    np.testing.assert_allclose(ours, _naive_local_corr(f1, f2, 5), atol=1e-5)


def test_global_correlation_channels_and_center(rng):
    f1 = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    f2 = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    out = np.asarray(
        correlation.global_correlation(jnp.asarray(f1), jnp.asarray(f2), 4, 2)
    )
    D = 2 * 4 // 2 + 1
    assert out.shape == (1, 8, 8, D * D)
    center = D * D // 2  # zero displacement channel
    np.testing.assert_allclose(
        out[0, :, :, center], (f1[0] * f2[0]).sum(-1) / 4, atol=1e-5
    )
    # displacement (+2, 0): channel (dy_idx=D//2+1, dx_idx=D//2)
    ch = (D // 2 + 1) * D + D // 2
    np.testing.assert_allclose(
        out[0, :6, :, ch], (f1[0, :6] * f2[0, 2:]).sum(-1) / 4, atol=1e-5
    )


def test_allpairs_matches_reference_corrblock(rng):
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.raft.corr import CorrBlock  # reference implementation

    f1 = rng.standard_normal((1, 6, 8, 16)).astype(np.float32)
    f2 = rng.standard_normal((1, 6, 8, 16)).astype(np.float32)
    t1 = torch.from_numpy(np.transpose(f1, (0, 3, 1, 2)))
    t2 = torch.from_numpy(np.transpose(f2, (0, 3, 1, 2)))

    ref_corr = CorrBlock.corr(t1, t2).numpy()  # (b, h1, w1, 1, h2, w2)
    ours = np.asarray(correlation.allpairs_correlation(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(ours, ref_corr[:, :, :, 0], atol=1e-5)


def test_corr_lookup_matches_reference_corrblock(rng):
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.raft.corr import CorrBlock

    # 16×16 so the smallest pyramid level is 2×2 (1×1 degenerates to NaN in
    # the reference's own coordinate normalization).
    B, H, W, C = 1, 16, 16, 16
    f1 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    f2 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    t1 = torch.from_numpy(np.transpose(f1, (0, 3, 1, 2)))
    t2 = torch.from_numpy(np.transpose(f2, (0, 3, 1, 2)))

    block = CorrBlock(t1, t2, num_levels=4, radius=4)
    coords = rng.uniform(0, 15, (B, H, W, 2)).astype(np.float32)
    coords_nchw = torch.from_numpy(np.transpose(coords, (0, 3, 1, 2)))
    ref = block(coords_nchw).numpy()  # (B, L*81, H, W)

    corr = correlation.allpairs_correlation(jnp.asarray(f1), jnp.asarray(f2))
    pyramid = correlation.corr_pyramid(corr, num_levels=4)
    ours = np.asarray(correlation.corr_lookup(pyramid, jnp.asarray(coords), radius=4))
    np.testing.assert_allclose(
        ours, np.transpose(ref, (0, 2, 3, 1)), atol=1e-4
    )


def test_channel_norm(rng):
    from pcfa_tpu.ops import channel_norm

    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    out = np.asarray(channel_norm(jnp.asarray(x)))
    np.testing.assert_allclose(
        out[..., 0], np.sqrt((x**2).sum(-1)), atol=1e-5
    )


def test_corr_lookup_mm_equals_gather(rng):
    """Gather-free separable-matmul lookup == the gather formulation,
    values and pyramid-gradients (SURVEY.md §2.5 #5)."""
    import jax

    f1 = jnp.asarray(rng.standard_normal((2, 16, 24, 32)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((2, 16, 24, 32)), jnp.float32)
    pyr = correlation.corr_pyramid(correlation.allpairs_correlation(f1, f2), 4)
    coords = jnp.asarray(rng.uniform(-3, 27, (2, 16, 24, 2)), jnp.float32)

    a = correlation.corr_lookup(pyr, coords, 4)
    b = correlation.corr_lookup_mm(pyr, coords, 4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    ga = jax.grad(lambda p: jnp.sum(correlation.corr_lookup(p, coords, 4) ** 2))(pyr)
    gb = jax.grad(lambda p: jnp.sum(correlation.corr_lookup_mm(p, coords, 4) ** 2))(pyr)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_corr_lookup_mm_rf_matches_mm(rng):
    """Per-level association order (corr_lookup_mm_rf, the TPU default via
    corr_lookup_window) == the left-first form: values and
    pyramid/coords-gradients. W2 = 136 > 128 so level 0 actually takes the
    right-first branch (the narrow test shapes elsewhere never would)."""
    import jax

    f1 = jnp.asarray(rng.standard_normal((1, 8, 136, 16)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 8, 136, 16)), jnp.float32)
    pyr = correlation.corr_pyramid(correlation.allpairs_correlation(f1, f2), 4)
    coords = jnp.asarray(rng.uniform(-4, 140, (1, 8, 136, 2)), jnp.float32)

    a = correlation.corr_lookup_mm(pyr, coords, 4)
    b = correlation.corr_lookup_mm_rf(pyr, coords, 4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)

    def loss(fn):
        def inner(p, c):
            return jnp.sum(fn(p, c, 4) ** 2) * 1e-3
        return jax.grad(inner, argnums=(0, 1))

    ga = loss(correlation.corr_lookup_mm)(pyr, coords)
    gb = loss(correlation.corr_lookup_mm_rf)(pyr, coords)
    for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-3, rtol=1e-3)


def test_corr_lookup_gather_matches_mm(rng):
    """Flat-gather lookup (corr_lookup_gather — a parity-tested ABLATION,
    measured 3.5× slower than the mm_rf default; see corr_lookup_window)
    == the separable-matmul form: values and pyramid-gradients, including
    far-out-of-range and exactly-integer coords, fp32 and bf16 maps.
    (test_corr_lookup_mm_rf_matches_mm covers the actual default.)"""
    import jax

    f1 = jnp.asarray(rng.standard_normal((2, 16, 24, 32)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((2, 16, 24, 32)), jnp.float32)
    pyr = correlation.corr_pyramid(correlation.allpairs_correlation(f1, f2), 4)
    coords = jnp.asarray(rng.uniform(-6, 30, (2, 16, 24, 2)), jnp.float32)
    # exercise exact-integer and boundary samples explicitly
    coords = coords.at[0, 0, 0].set(jnp.asarray([0.0, 0.0]))
    coords = coords.at[0, 0, 1].set(jnp.asarray([23.0, 15.0]))
    coords = coords.at[0, 1, 0].set(jnp.asarray([-40.0, 100.0]))

    a = correlation.corr_lookup_mm(pyr, coords, 4)
    b = correlation.corr_lookup_gather(pyr, coords, 4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    ga = jax.grad(
        lambda p: jnp.sum(correlation.corr_lookup_mm(p, coords, 4) ** 2))(pyr)
    gb = jax.grad(
        lambda p: jnp.sum(correlation.corr_lookup_gather(p, coords, 4) ** 2))(
            pyr)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)

    # bf16 maps (the bench compute dtype): blends stay in the map dtype
    pyr16 = [lvl.astype(jnp.bfloat16) for lvl in pyr]
    a16 = correlation.corr_lookup_mm(pyr16, coords, 4)
    b16 = correlation.corr_lookup_gather(pyr16, coords, 4)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(a16, np.float32),
                               np.asarray(b16, np.float32),
                               atol=0.05, rtol=0.05)


def test_corr_lookup_window_dispatch(monkeypatch):
    """PCFA_CORR_LOOKUP selects the implementation."""
    pyr = [jnp.ones((4, 8, 8, 1), jnp.float32)]
    coords = jnp.full((1, 2, 2, 2), 3.2, jnp.float32)
    monkeypatch.setenv("PCFA_CORR_LOOKUP", "mm")
    a = correlation.corr_lookup_window(pyr, coords, 2)
    monkeypatch.setenv("PCFA_CORR_LOOKUP", "gather")
    b = correlation.corr_lookup_window(pyr, coords, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # typos must raise, not silently fall through to the slowest path
    monkeypatch.setenv("PCFA_CORR_LOOKUP", "mmrf")
    with pytest.raises(ValueError, match="PCFA_CORR_LOOKUP"):
        correlation.corr_lookup_window(pyr, coords, 2)


def test_corr_lookup_gather_coords_stop_gradient():
    """corr_lookup_gather stop-gradients coords (same contract as the
    Pallas path): its natural coords-VJP would be a truncated fx-only
    gradient, not the mm hat-weight gradient."""
    import jax

    pyr = [jnp.ones((4, 8, 8, 1), jnp.float32)]
    coords = jnp.full((1, 2, 2, 2), 3.2, jnp.float32)
    g = jax.grad(lambda c: jnp.sum(
        correlation.corr_lookup_gather(pyr, c, 2) ** 2))(coords)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_vslice_blend_radius_guard():
    """The fixed 24-row Pallas slab supports radius ≤ 7; larger radii must
    fail loudly instead of wrapping window rows around the slab."""
    from pcfa_tpu.ops.pallas.corr_lookup import vslice_blend

    cmap = jnp.ones((8, 16, 128), jnp.float32)
    cy = jnp.full((8,), 4.0, jnp.float32)
    with pytest.raises(ValueError, match="radius"):
        vslice_blend(cmap, cy, 8, 8, True)


def test_corr_pyramid_pooled_matches_volume_pooling(rng):
    """Per-level pooled-f2 pyramid == avg-pooling the all-pairs volume
    (linearity of pooling in the channel dot), values AND both feature
    gradients — the backward path is the whole point: the pooled form
    replaces the dpyramid→dvolume unpool chain with direct MXU matmuls."""
    import jax

    B, H, W, C, L = 2, 16, 24, 32, 4
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    ref = correlation.corr_pyramid(correlation.allpairs_correlation(f1, f2), L)
    pooled = correlation.corr_pyramid_pooled(f1, f2, L)
    assert len(pooled) == L
    for a, b in zip(ref, pooled):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def loss_ref(a, b):
        pyr = correlation.corr_pyramid(correlation.allpairs_correlation(a, b), L)
        return sum(jnp.sum(jnp.sin(p)) for p in pyr)

    def loss_pooled(a, b):
        return sum(jnp.sum(jnp.sin(p))
                   for p in correlation.corr_pyramid_pooled(a, b, L))

    ga = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    gb = jax.grad(loss_pooled, argnums=(0, 1))(f1, f2)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_resolve_corr_impl_policy(monkeypatch):
    """'auto' → materialized while the pyramid + cotangents fit the HBM
    budget, fused beyond; explicit choices pass through untouched."""
    monkeypatch.delenv("PCFA_CORR_HBM_BUDGET_MB", raising=False)
    kitti = (2, 47, 156, 256)   # KITTI/8 feature map, bench batch
    twox = (2, 94, 312, 256)    # 2× KITTI — must pick fused (v5e HBM)
    for explicit in ("materialized", "fused"):
        assert correlation.resolve_corr_impl(
            explicit, twox, twox, 4, jnp.bfloat16) == explicit
    assert correlation.resolve_corr_impl(
        "auto", kitti, kitti, 4, jnp.bfloat16) == "materialized"
    assert correlation.resolve_corr_impl(
        "auto", twox, twox, 4, jnp.bfloat16) == "fused"
    # spatial sharding divides the per-device footprint
    assert correlation.resolve_corr_impl(
        "auto", twox, twox, 4, jnp.bfloat16, spatial_shards=8
    ) == "materialized"
    # budget knob
    monkeypatch.setenv("PCFA_CORR_HBM_BUDGET_MB", "1")
    assert correlation.resolve_corr_impl(
        "auto", kitti, kitti, 4, jnp.bfloat16) == "fused"


def test_corr_lookup_fused_matches_materialized(rng):
    """The non-materializing blockwise lookup (alt_cuda_corr analog,
    SURVEY.md §5 flagship) == volume + pyramid + mm lookup: values and all
    three gradients (f1, f2, coords), including a ragged final block."""
    import jax

    B, H, W, C, L = 2, 16, 24, 32, 3
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-3, 27, (B, H, W, 2)), jnp.float32)

    def ref(a, b, c):
        pyr = correlation.corr_pyramid(correlation.allpairs_correlation(a, b), L)
        return correlation.corr_lookup_mm(pyr, c, 4)

    def fused(a, b, c):
        return correlation.corr_lookup_fused(
            a, correlation.f2_feature_pyramid(b, L), c, 4, block=100
        )  # block=100 ∤ 384 queries → exercises the padded ragged tail

    np.testing.assert_allclose(
        np.asarray(ref(f1, f2, coords)), np.asarray(fused(f1, f2, coords)),
        atol=2e-5,
    )
    ga = jax.grad(lambda a, b, c: jnp.sum(jnp.sin(ref(a, b, c))),
                  argnums=(0, 1, 2))(f1, f2, coords)
    gb = jax.grad(lambda a, b, c: jnp.sum(jnp.sin(fused(a, b, c))),
                  argnums=(0, 1, 2))(f1, f2, coords)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


@pytest.mark.parametrize("case", [
    (10, 14, 8, 20, 2),   # FlowNetC flavor (patch 21) at toy size
    (9, 13, 5, 4, 1),     # PWCNet flavor (patch 9)
])
def test_correlation_matmul_bwd_matches_autodiff(case, rng):
    """The banded-matmul backward (the patch-21 Pallas-gate fallback) must
    equal the shift-and-sum autodiff VJP exactly for both flavors."""
    import jax

    from pcfa_tpu.ops.correlation import correlation_matmul_bwd

    H, W, C, md, s = case
    P = 2 * (md // s) + 1
    f1 = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32))
    out, vjp = jax.vjp(
        lambda a, b: correlation.global_correlation(a, b, md, s), f1, f2)
    g = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    d1_ref, d2_ref = vjp(g)
    d1, d2 = correlation_matmul_bwd(f1, f2, g, P, s)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_ref), atol=1e-5)


def test_corr_lookup_hybrid_matches_mm(rng):
    """Hybrid lookup (blockwise-rebuilt level 0 + materialized levels 1..3)
    == the all-materialized separable-matmul form: values and feature
    gradients (the hybrid path differentiates through the level-0 rebuild
    matmul instead of a persistent cmap cotangent)."""
    import jax

    B, H, W, C, L = 2, 16, 24, 32, 4
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-6, 30, (B, H, W, 2)), jnp.float32)

    def hybrid(a, b):
        rest = correlation.corr_pyramid_pooled(a, b, L, start_level=1)
        return correlation.corr_lookup_hybrid(a, b, rest, coords, 4, 128)

    def ref(a, b):
        pyr = correlation.corr_pyramid_pooled(a, b, L)
        return correlation.corr_lookup_mm(pyr, coords, 4)

    np.testing.assert_allclose(np.asarray(hybrid(f1, f2)),
                               np.asarray(ref(f1, f2)),
                               atol=3e-5, rtol=1e-5)

    ga = jax.grad(lambda a, b: jnp.sum(hybrid(a, b) ** 2), argnums=(0, 1))(
        f1, f2)
    gb = jax.grad(lambda a, b: jnp.sum(ref(a, b) ** 2), argnums=(0, 1))(
        f1, f2)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-4, rtol=1e-4)


def test_corr_pyramid_pooled_start_level(rng):
    """start_level=k returns exactly pyramid[k:] of the full build."""
    f1 = jnp.asarray(rng.standard_normal((1, 8, 16, 8)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 8, 16, 8)), jnp.float32)
    full = correlation.corr_pyramid_pooled(f1, f2, 3)
    tail = correlation.corr_pyramid_pooled(f1, f2, 3, start_level=1)
    assert len(tail) == 2
    for a, b in zip(full[1:], tail):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
