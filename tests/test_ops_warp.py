"""Sampling/resizing primitives vs torch.nn.functional (bit-level parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcfa_tpu.ops import warp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(align_corners, padding_mode, rng):
    img = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 5, 6, 2)).astype(np.float32)  # incl. OOB
    ref = F.grid_sample(
        _nchw(img),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    ours = warp.grid_sample(
        jnp.asarray(img), jnp.asarray(grid), align_corners, padding_mode
    )
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(ref), atol=1e-5)


def test_grid_sample_grad_matches_torch(rng):
    img = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    grid = rng.uniform(-1, 1, (1, 4, 4, 2)).astype(np.float32)

    t_img = _nchw(img).requires_grad_(True)
    t_grid = torch.from_numpy(grid).requires_grad_(True)
    F.grid_sample(t_img, t_grid, align_corners=True).sum().backward()

    import jax

    g_img, g_grid = jax.grad(
        lambda i, g: warp.grid_sample(i, g, True, "zeros").sum(), argnums=(0, 1)
    )(jnp.asarray(img), jnp.asarray(grid))
    np.testing.assert_allclose(
        np.asarray(g_img), _to_nhwc(t_img.grad.detach()), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(g_grid), t_grid.grad.numpy(), atol=1e-4)


def test_bilinear_sampler_matches_raft_reference(rng):
    """Compare against the reference bilinear_sampler (raft/utils/utils.py:57)."""
    img = rng.standard_normal((2, 8, 10, 3)).astype(np.float32)
    coords = rng.uniform(-1, 11, (2, 4, 5, 2)).astype(np.float32)

    H, W = 8, 10
    xg = 2 * torch.from_numpy(coords[..., :1]) / (W - 1) - 1
    yg = 2 * torch.from_numpy(coords[..., 1:]) / (H - 1) - 1
    ref = F.grid_sample(_nchw(img), torch.cat([xg, yg], -1), align_corners=True)

    ours = warp.bilinear_sampler(jnp.asarray(img), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(ref), atol=1e-5)


def test_bilinear_sampler_mask(rng):
    img = jnp.ones((1, 8, 8, 1))
    coords = jnp.asarray(
        np.array([[[[4.0, 4.0], [-2.0, 4.0], [4.0, 9.0]]]], dtype=np.float32)
    )
    _, mask = warp.bilinear_sampler(img, coords, mask=True)
    np.testing.assert_array_equal(np.asarray(mask[0, 0]), [1.0, 0.0, 0.0])


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("scale", [2, 4])
def test_interpolate_up_matches_torch(align_corners, scale, rng):
    img = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    ref = F.interpolate(
        _nchw(img), scale_factor=scale, mode="bilinear", align_corners=align_corners
    )
    ours = warp.interpolate_bilinear(
        jnp.asarray(img), (5 * scale, 7 * scale), align_corners
    )
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(ref), atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_interpolate_down_matches_torch(align_corners, rng):
    img = rng.standard_normal((1, 8, 12, 2)).astype(np.float32)
    ref = F.interpolate(
        _nchw(img), size=(5, 7), mode="bilinear", align_corners=align_corners
    )
    ours = warp.interpolate_bilinear(jnp.asarray(img), (5, 7), align_corners)
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(ref), atol=1e-5)


def test_upflow8_matches_raft(rng):
    flow = rng.standard_normal((1, 4, 6, 2)).astype(np.float32)
    ref = 8 * F.interpolate(
        _nchw(flow), size=(32, 48), mode="bilinear", align_corners=True
    )
    ours = warp.upflow(jnp.asarray(flow), 8)
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(ref), atol=1e-4)


def test_avg_pool_matches_torch(rng):
    img = rng.standard_normal((2, 8, 10, 3)).astype(np.float32)
    ref = F.avg_pool2d(_nchw(img), 2, stride=2)
    ours = warp.avg_pool2d(jnp.asarray(img), 2, 2)
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(ref), atol=1e-6)


def test_coords_grid():
    grid = np.asarray(warp.coords_grid(2, 3, 4))
    assert grid.shape == (2, 3, 4, 2)
    np.testing.assert_array_equal(grid[0, :, :, 0], np.tile(np.arange(4), (3, 1)))
    np.testing.assert_array_equal(grid[1, :, :, 1], np.tile(np.arange(3)[:, None], (1, 4)))


@pytest.mark.parametrize("zeros", [True, False])
def test_windowed_vjp_matches_reference(zeros, rng):
    """_bilinear_abs's custom VJP (one windowed gather/scatter) must equal
    plain autodiff of the 4-corner formulation exactly — values and all
    three gradients, including far-out-of-range and integer-exact coords."""
    import jax

    img = jnp.asarray(rng.standard_normal((2, 13, 17, 3)).astype(np.float32))
    ix = jnp.asarray(rng.uniform(-6, 22, (2, 11, 19)).astype(np.float32))
    iy = jnp.asarray(rng.uniform(-6, 18, (2, 11, 19)).astype(np.float32))
    ix = ix.at[0, 0, :5].set(jnp.arange(5, dtype=jnp.float32))
    iy = iy.at[0, 0, :5].set(3.0)
    g = jnp.asarray(rng.standard_normal((2, 11, 19, 3)).astype(np.float32))

    o_ref = warp._bilinear_abs_reference(img, ix, iy, zeros)
    o_new = warp._bilinear_abs(img, ix, iy, zeros)
    np.testing.assert_allclose(np.asarray(o_new), np.asarray(o_ref), atol=1e-6)

    gr = jax.grad(
        lambda im, x, y: jnp.sum(warp._bilinear_abs_reference(im, x, y, zeros) * g),
        argnums=(0, 1, 2),
    )(img, ix, iy)
    gn = jax.grad(
        lambda im, x, y: jnp.sum(warp._bilinear_abs(im, x, y, zeros) * g),
        argnums=(0, 1, 2),
    )(img, ix, iy)
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)


@pytest.mark.parametrize("zeros", [True, False])
def test_packed_vjp_matches_reference(zeros, rng):
    """_bilinear_abs_packed (ONE 4C-wide gather / scatter, the TPU default)
    must equal plain autodiff of the 4-corner formulation exactly — values
    and all three gradients, including far-out-of-range, border-exact and
    integer-exact coords, and bf16→fp32 promotion semantics."""
    import jax

    img = jnp.asarray(rng.standard_normal((2, 13, 17, 3)).astype(np.float32))
    ix = jnp.asarray(rng.uniform(-6, 22, (2, 11, 19)).astype(np.float32))
    iy = jnp.asarray(rng.uniform(-6, 18, (2, 11, 19)).astype(np.float32))
    ix = ix.at[0, 0, :5].set(jnp.arange(5, dtype=jnp.float32))
    iy = iy.at[0, 0, :5].set(3.0)
    ix = ix.at[0, 1, :4].set(jnp.asarray([0.0, 16.0, -1.0, 17.0]))
    iy = iy.at[0, 1, :4].set(jnp.asarray([0.0, 12.0, -1.0, 13.0]))
    g = jnp.asarray(rng.standard_normal((2, 11, 19, 3)).astype(np.float32))

    o_ref = warp._bilinear_abs_reference(img, ix, iy, zeros)
    o_new = warp._bilinear_abs_packed(img, ix, iy, zeros)
    np.testing.assert_allclose(np.asarray(o_new), np.asarray(o_ref), atol=1e-6)

    gr = jax.grad(
        lambda im, x, y: jnp.sum(warp._bilinear_abs_reference(im, x, y, zeros) * g),
        argnums=(0, 1, 2),
    )(img, ix, iy)
    gn = jax.grad(
        lambda im, x, y: jnp.sum(warp._bilinear_abs_packed(im, x, y, zeros) * g),
        argnums=(0, 1, 2),
    )(img, ix, iy)
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)

    ob = warp._bilinear_abs_packed(img.astype(jnp.bfloat16), ix, iy, zeros)
    assert ob.dtype == jnp.float32  # bf16 values at fp32 coords promote


@pytest.mark.parametrize("zeros", [True, False])
def test_sorted_splat_dimg_matches_scatter(zeros, rng, monkeypatch):
    """The sorted-splat image gradient (PCFA_WARP_DIMG=sorted — sort +
    cumsum + unique-index endpoint stores, replacing the conflict-
    serialized scatter-add that costs ~27 ms/warp on TPU) must match the
    scatter path on values and all three packed-VJP gradients, including
    heavy index collisions (many queries landing on the same cell)."""
    import jax

    img = jnp.asarray(rng.standard_normal((2, 13, 17, 3)).astype(np.float32))
    ix = jnp.asarray(rng.uniform(-6, 22, (2, 21, 23)).astype(np.float32))
    iy = jnp.asarray(rng.uniform(-6, 18, (2, 21, 23)).astype(np.float32))
    # collision hotspot: a block of queries sampling the same few cells
    ix = ix.at[0, :8, :8].set(5.25)
    iy = iy.at[0, :8, :8].set(7.75)
    g = jnp.asarray(rng.standard_normal((2, 21, 23, 3)).astype(np.float32))

    def grads(im, x, y):
        return jax.grad(
            lambda a, b, c: jnp.sum(
                warp._bilinear_abs_packed(a, b, c, zeros) * g),
            argnums=(0, 1, 2),
        )(im, x, y)

    monkeypatch.setenv("PCFA_WARP_DIMG", "scatter")
    g_sc = grads(img, ix, iy)
    monkeypatch.setenv("PCFA_WARP_DIMG", "sorted")
    g_so = grads(img, ix, iy)
    for a, b in zip(g_sc, g_so):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)

    monkeypatch.setenv("PCFA_WARP_DIMG", "typo")
    with pytest.raises(ValueError, match="PCFA_WARP_DIMG"):
        grads(img, ix, iy)


def test_segment_rows_sorted_exact(rng):
    """_segment_rows_sorted == scatter-add on a raw (idx, upd) problem with
    empty rows, full-row collisions, and single-element segments."""
    idx = jnp.asarray(
        np.concatenate([np.full(50, 3), [0], np.arange(5, 40, 2),
                        np.full(17, 99)]).astype(np.int32))
    upd = jnp.asarray(rng.standard_normal((idx.size, 12)).astype(np.float32))
    want = np.zeros((120, 12), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(upd))
    got = warp._segment_rows_sorted(idx, upd, 120)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("case", ["uniform", "one_cell", "sparse_tail",
                                  "tiny", "multi_chunk"])
def test_segment_rows_onehot_exact(case, rng):
    """The blocked one-hot matmul executors (Pallas interpreted + the
    lax.scan twin) == scatter-add, including the ragged-plan edge cases:
    every row in ONE cell (a single pair does all the work), a huge empty
    block range past the data (dummy pairs must still zero those output
    blocks), fewer rows than one chunk, and N ≫ BN (multi-chunk runs
    crossing block boundaries)."""
    import jax

    from pcfa_tpu.ops.pallas import segsum

    N, nrows = {
        "uniform": (3000, 2500),
        "one_cell": (2000, 5000),
        "sparse_tail": (300, 9000),
        "tiny": (17, 40),
        "multi_chunk": (6000, 300),
    }[case]
    if case == "one_cell":
        idx = np.full(N, 4321, np.int32)
    elif case == "sparse_tail":
        idx = rng.integers(0, 50, N).astype(np.int32)  # blocks 1.. empty
    else:
        idx = rng.integers(0, nrows, N).astype(np.int32)
    upd = rng.standard_normal((N, 12)).astype(np.float32)
    # fp64 truth: the blocked-matmul summation order differs from a
    # sequential fp32 np.add.at, and at 2000-way collisions BOTH carry
    # ~1e-4 fp32 summation noise (the matmul is the closer of the two)
    want = np.zeros((nrows, 12))
    np.add.at(want, idx, upd.astype(np.float64))
    tol = dict(atol=2e-5, rtol=2e-4)

    idx_j, upd_j = jnp.asarray(idx), jnp.asarray(upd)
    got_scan = jax.jit(segsum.segment_rows_scan, static_argnums=2)(
        idx_j, upd_j, nrows)
    np.testing.assert_allclose(np.asarray(got_scan), want, **tol)
    got_pl = segsum.segment_rows_pallas(idx_j, upd_j, nrows, interpret=True)
    np.testing.assert_allclose(np.asarray(got_pl), want, **tol)


def test_onehot_dimg_matches_scatter_through_vjp(rng, monkeypatch):
    """PCFA_WARP_DIMG=onehot / onehot_scan through the packed warp VJP ==
    the scatter path on all three gradients (collision hotspot included)."""
    import jax

    from pcfa_tpu.ops.pallas import segsum

    img = jnp.asarray(rng.standard_normal((2, 13, 17, 3)).astype(np.float32))
    ix = jnp.asarray(rng.uniform(-6, 22, (2, 21, 23)).astype(np.float32))
    iy = jnp.asarray(rng.uniform(-6, 18, (2, 21, 23)).astype(np.float32))
    ix = ix.at[0, :8, :8].set(5.25)
    iy = iy.at[0, :8, :8].set(7.75)
    g = jnp.asarray(rng.standard_normal((2, 21, 23, 3)).astype(np.float32))

    def grads(im, x, y):
        return jax.grad(
            lambda a, b, c: jnp.sum(
                warp._bilinear_abs_packed(a, b, c, False) * g),
            argnums=(0, 1, 2),
        )(im, x, y)

    monkeypatch.setenv("PCFA_WARP_DIMG", "scatter")
    g_sc = grads(img, ix, iy)
    monkeypatch.setattr(segsum, "_INTERPRET", True)  # 'onehot' → Pallas
    for mode in ("onehot", "onehot_scan"):
        monkeypatch.setenv("PCFA_WARP_DIMG", mode)
        g_oh = grads(img, ix, iy)
        for a, b in zip(g_sc, g_oh):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-5)


def test_grid_sample_grads_match_torch(rng):
    """grid_sample input/grid gradients vs torch (both padding modes)."""
    import jax
    import torch

    img = rng.standard_normal((1, 9, 12, 2)).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, (1, 7, 10, 2)).astype(np.float32)
    g = rng.standard_normal((1, 7, 10, 2)).astype(np.float32)

    for mode in ("zeros", "border"):
        ti = torch.tensor(img.transpose(0, 3, 1, 2), requires_grad=True)
        tg = torch.tensor(grid, requires_grad=True)
        out = F.grid_sample(ti, tg, mode="bilinear", padding_mode=mode,
                            align_corners=True)
        out.backward(torch.tensor(g.transpose(0, 3, 1, 2)))

        ours = jax.grad(
            lambda im, gr: jnp.sum(
                warp.grid_sample(im, gr, align_corners=True, padding_mode=mode)
                * jnp.asarray(g)),
            argnums=(0, 1),
        )(jnp.asarray(img), jnp.asarray(grid))
        np.testing.assert_allclose(
            np.asarray(ours[0]),
            ti.grad.numpy().transpose(0, 2, 3, 1), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ours[1]), tg.grad.numpy(), atol=1e-4)
