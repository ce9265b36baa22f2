"""Pallas TPU kernels vs XLA references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcfa_tpu.ops.correlation import local_correlation
from pcfa_tpu.ops.pallas.local_corr import _forward, local_correlation_pallas


def test_local_corr_pallas_forward(rng):
    f1 = jnp.asarray(rng.standard_normal((2, 12, 16, 8)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((2, 12, 16, 8)), jnp.float32)
    out = _forward(f1, f2, 9, 1, interpret=True)
    ref = local_correlation(f1, f2, 9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_local_corr_pallas_odd_height(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 7, 10, 4)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 7, 10, 4)), jnp.float32)
    out = _forward(f1, f2, 5, 1, interpret=True)
    ref = local_correlation(f1, f2, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_local_corr_pallas_gradients(rng, monkeypatch):
    """custom_vjp with the Pallas backward kernels (interpret mode) matches
    autodiff of the XLA op."""
    # force the pallas forward + backward to run interpreted on CPU
    import pcfa_tpu.ops.pallas.local_corr as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda a, b, p, s=1, interpret=True: orig(a, b, p, s, interpret=True),
    )
    monkeypatch.setattr(m, "_INTERPRET", True)

    f1 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)

    g1 = jax.grad(lambda a, b: jnp.sum(local_correlation_pallas(a, b, 5) ** 2),
                  argnums=(0, 1))(f1, f2)
    g2 = jax.grad(lambda a, b: jnp.sum(local_correlation(a, b, 5) ** 2),
                  argnums=(0, 1))(f1, f2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_corr_pallas_backward_kernels(rng):
    """The dedicated df1/df2 Pallas kernels == the XLA shift-and-sum VJP for
    both corr flavors (incl. stride 2 and a ragged W block), fp32 and bf16."""
    from pcfa_tpu.ops.correlation import global_correlation
    from pcfa_tpu.ops.pallas.local_corr import _backward

    B, H, W, C = 2, 32, 40, 16  # H·W above the tiny-map XLA floor
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    # local: patch 9, stride 1
    g = jnp.asarray(rng.standard_normal((B, H, W, 81)), jnp.float32)
    d1, d2 = _backward(f1, f2, g, 9, 1, interpret=True)
    _, vjp = jax.vjp(lambda a, b: local_correlation(a, b, 9), f1, f2)
    r1, r2 = vjp(g)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), atol=1e-5)

    # global flavor: max_disp 4 → patch 5, stride 2
    g = jnp.asarray(rng.standard_normal((B, H, W, 25)), jnp.float32)
    d1, d2 = _backward(f1, f2, g, 5, 2, interpret=True)
    _, vjp = jax.vjp(lambda a, b: global_correlation(a, b, 4, 2), f1, f2)
    r1, r2 = vjp(g)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), atol=1e-5)

    # bf16 inputs keep the fp32 accumulator
    d1, d2 = _backward(f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16),
                       g.astype(jnp.bfloat16), 5, 2, interpret=True)
    assert d1.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(d1, np.float32), np.asarray(r1),
                               atol=0.1)


@pytest.mark.parametrize("shape", [
    (1, 16, 8, 40, 32, 7, True),    # SpyNet conv0 (C_in padded to G)
    (2, 12, 32, 130, 64, 7, False),  # SpyNet conv1, batch>1, W>128
    (1, 24, 64, 33, 32, 7, True),    # SpyNet conv2
    (1, 8, 16, 20, 2, 7, False),     # SpyNet conv4 (tiny C_out)
    (1, 12, 3, 36, 16, 3, True),     # k=3, C_in below one sublane tile
])
def test_small_conv_pallas_forward(rng, shape):
    from pcfa_tpu.ops.pallas.small_conv import _forward, conv_reference

    B, H, C_in, W, C_out, k, relu = shape
    x = jnp.asarray(rng.standard_normal((B, H, C_in, W)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, C_in, C_out)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(C_out), jnp.float32)
    out = _forward(x, w, b, relu, interpret=True)
    ref = conv_reference(x, w, b, relu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_small_conv_pallas_bf16(rng):
    """bf16 operands (the PCFA_COMPUTE_DTYPE path) with fp32 accumulation."""
    from pcfa_tpu.ops.pallas.small_conv import _forward, conv_reference

    x = jnp.asarray(rng.standard_normal((1, 8, 16, 40)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 7, 16, 32)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(32), jnp.bfloat16)
    out = _forward(x, w, b, True, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = conv_reference(x.astype(jnp.float32), w.astype(jnp.float32),
                         b.astype(jnp.float32), True)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.1)


def test_small_conv_pallas_gradients(rng, monkeypatch):
    """custom_vjp (Pallas dx, XLA dW/db) matches autodiff of the XLA conv."""
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 36)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 8, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(32), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.sum(m.small_conv2d(*a, True) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda *a: jnp.sum(m.conv_reference(*a, True) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_small_conv_dx_im2col_adjoint(rng, monkeypatch):
    """Strided dx via the im2col-adjoint matmul (k²·C_in ≤ 256 — the RAFT
    stem class) == autodiff of the XLA conv, fp32 and bf16."""
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    monkeypatch.setenv("PCFA_DX_IM2COL", "1")  # ablation path, default off
    x = jnp.asarray(rng.standard_normal((2, 16, 3, 40)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64), jnp.float32)
    assert 7 * 7 * 3 <= 256  # the im2col-adjoint size gate
    g1 = jax.grad(lambda *a: jnp.sum(m.small_conv2d(*a, None, 2) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda *a: jnp.sum(m.conv_reference(*a, None, stride=2)
                                     ** 2), argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        # dW reaches O(1e2); deviations are fp-association noise (~1e-6 rel)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3)

    # bf16 + a 3x3 stride-2 case (k²C = 576 would gate off; use C_in=16)
    x16 = jnp.asarray(rng.standard_normal((1, 8, 16, 24)), jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.1,
                      jnp.bfloat16)
    b16 = jnp.zeros((32,), jnp.bfloat16)
    d1 = jax.grad(lambda a: jnp.sum(
        m.small_conv2d(a, w16, b16, None, 2).astype(jnp.float32) ** 2))(x16)
    d2 = jax.grad(lambda a: jnp.sum(
        m.conv_reference(a.astype(jnp.float32), w16.astype(jnp.float32),
                         b16.astype(jnp.float32), None,
                         stride=2) ** 2))(x16.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(d1, np.float32), np.asarray(d2),
                               atol=0.35, rtol=0.1)


def test_small_conv_dx_strided_xla_mode(rng, monkeypatch):
    """PCFA_DX_STRIDED=xla (native conv-transpose vjp for the bf16 strided
    dx, bypassing the zero-dilate Pallas kernel) == autodiff of the XLA
    conv. A/B knob for the stem-dx lever (BASELINE.md round 3)."""
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    monkeypatch.setenv("PCFA_DX_STRIDED", "xla")
    x16 = jnp.asarray(rng.standard_normal((2, 16, 3, 40)), jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1,
                      jnp.bfloat16)
    b16 = jnp.zeros((64,), jnp.bfloat16)
    d1 = jax.grad(lambda a: jnp.sum(
        m.small_conv2d(a, w16, b16, "relu", 2).astype(jnp.float32) ** 2))(
            x16)
    d2 = jax.grad(lambda a: jnp.sum(
        m.conv_reference(a.astype(jnp.float32), w16.astype(jnp.float32),
                         b16.astype(jnp.float32), "relu",
                         stride=2) ** 2))(x16.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(d1, np.float32), np.asarray(d2),
                               atol=0.35, rtol=0.1)


@pytest.mark.parametrize("shape", [
    (1, 16, 6, 40, 64, 7, 2),    # FlowNetC conv1 (stride 2)
    (1, 16, 64, 40, 128, 5, 2),  # FlowNetC conv2
    (2, 12, 12, 36, 64, 7, 2),   # FlowNetS conv1, batch>1
    (1, 12, 11, 36, 64, 3, 1),   # FlowNetFusion conv0
    (1, 12, 82, 36, 16, 3, 1),   # Fusion inter_conv0: c_in ∤ G (pad path)
    (1, 8, 162, 24, 32, 3, 1),   # Fusion inter_conv1: c_in ∤ G
])
def test_small_conv_pallas_strided(rng, shape):
    from pcfa_tpu.ops.pallas.small_conv import _forward, conv_reference

    B, H, C_in, W, C_out, k, s = shape
    x = jnp.asarray(rng.standard_normal((B, H, C_in, W)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, C_in, C_out)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(C_out), jnp.float32)
    out = _forward(x, w, b, "leaky", interpret=True, stride=s)
    ref = conv_reference(x, w, b, "leaky", stride=s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_small_conv_pallas_strided_gradients(rng, monkeypatch):
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    x = jnp.asarray(rng.standard_normal((1, 8, 6, 24)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 6, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(32), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.sum(m.small_conv2d(*a, "leaky", 2) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda *a: jnp.sum(m.conv_reference(*a, "leaky", 2) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 9, 6, 23), (1, 36, 3, 17)])
def test_small_conv_strided_odd_shape_gradients(rng, shape):
    """Odd H/W under stride: the forward falls back to the ceil-semantics
    XLA conv (Ho = ceil(H/s)), and the backward must mirror it — the deep
    NHCW encoder mode reaches this with e.g. Sintel 436-height inputs
    (layer3 input height 109). Regression for the round-3 advisor finding:
    _bwd assumed Ho = H//s and raised a trace-time einsum shape error."""
    import pcfa_tpu.ops.pallas.small_conv as m

    B, H, C_in, W = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, C_in, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    out = m.small_conv2d(x, w, b, "leaky", 2)
    ref = m.conv_reference(x, w, b, "leaky", 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    g1 = jax.grad(lambda *a: jnp.sum(m.small_conv2d(*a, "leaky", 2) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda *a: jnp.sum(m.conv_reference(*a, "leaky", 2) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flownetc_pallas_branch_matches_xla(rng, monkeypatch):
    """FlowNetC with the Pallas CL branch (interpret) == the XLA branch."""
    import pcfa_tpu.models.flownet2 as fn2
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    x = jnp.asarray(rng.random((1, 64, 64, 6)), jnp.float32)
    ref_model = fn2.FlowNetC(use_pallas=False)
    params = ref_model.init(jax.random.PRNGKey(0), x)["params"]
    ref = ref_model.apply({"params": params}, x)
    monkeypatch.setattr(fn2, "_cl_pallas_default", lambda: True)
    out = fn2.FlowNetC(use_pallas=False).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_fusion_decode_pallas_matches_xla(rng, monkeypatch):
    """FlowNetFusion with the decode-tail Pallas branch (PlainConv →
    interpret kernel; c_in = 82/162 exercise the channel-pad planner) ==
    the XLA branch, values AND input gradients."""
    import pcfa_tpu.models.flownet2 as fn2
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    x = jnp.asarray(rng.random((1, 32, 48, 11)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 32, 48, 2)), jnp.float32)
    model = fn2.FlowNetFusion()
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss(x):
        return jnp.sum(model.apply({"params": params}, x) * g)

    monkeypatch.setattr(fn2, "_decode_pallas_default", lambda: False)
    ref, dref = jax.value_and_grad(loss)(x)
    monkeypatch.setattr(fn2, "_decode_pallas_default", lambda: True)
    out, dout = jax.value_and_grad(loss)(x)
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dout), np.asarray(dref),
                               atol=2e-4, rtol=1e-4)


def test_local_corr_vmap_folds_batch(rng, monkeypatch):
    """`jax.vmap` over the Pallas correlation folds into the kernels' batch
    grid axis (custom_vmap rule) instead of JAX's generic pallas batching,
    which cannot block the streaming path's HBM-space operand — regression
    for `bench --batch 2` / DP-vmapped FlowNet2 raising at lowering time.
    Covers the streaming forward (resident budget forced to 0) and the
    Pallas dgrad backward under vmap."""
    import pcfa_tpu.ops.pallas.local_corr as lc

    orig = lc._forward
    monkeypatch.setattr(
        lc, "_forward",
        lambda f1, f2, p, s, interpret=False: orig(f1, f2, p, s,
                                                   interpret=True))
    monkeypatch.setattr(lc, "_INTERPRET", True)

    V, B, H, W, C = 2, 1, 16, 24, 8
    f1 = jnp.asarray(rng.standard_normal((V, B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((V, B, H, W, C)), jnp.float32)

    # streaming forward under vmap
    monkeypatch.setattr(lc, "_RESIDENT_BUDGET", 0)
    out_v = jax.vmap(lambda a, b: lc._forward(a, b, 5, 1))(f1, f2)
    ref = jnp.stack([lc._forward(f1[i], f2[i], 5, 1) for i in range(V)])
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref), atol=1e-5)

    # Pallas dgrad backward under vmap (H·W ≥ 1024 so plans materialize)
    monkeypatch.setattr(lc, "_RESIDENT_BUDGET", 9 * 2**20)
    H, W = 32, 48
    f1 = jnp.asarray(rng.standard_normal((V, B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((V, B, H, W, C)), jnp.float32)

    def loss(a, b):
        return jnp.sum(lc.local_correlation_pallas(a, b, 9) ** 2)

    g_v = jax.vmap(jax.grad(loss, argnums=(0, 1)))(f1, f2)
    for k in range(2):
        g_ref = jnp.stack([jax.grad(loss, argnums=(0, 1))(f1[i], f2[i])[k]
                           for i in range(V)])
        np.testing.assert_allclose(np.asarray(g_v[k]), np.asarray(g_ref),
                                   atol=1e-4)


def test_flownet_nhcw_chain_matches_unchained(rng, monkeypatch):
    """FlowNetSD's conv0→conv1→conv1_1 NHCW chain (PCFA_FN2_CHAIN=1, the
    default) is layout-only: forward and input-grad match the unchained
    per-conv-transpose path bit-for-bit through the Pallas interpret
    branch (the kernel sees identical NHCW operands either way)."""
    import pcfa_tpu.models.flownet2 as fn2
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    monkeypatch.setattr(fn2, "_cl_pallas_default", lambda: True)
    x = jnp.asarray(rng.random((1, 64, 64, 6)), jnp.float32)
    model = fn2.FlowNetSD()

    monkeypatch.setenv("PCFA_FN2_CHAIN", "0")
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)
    gref = jax.grad(
        lambda a: jnp.sum(model.apply({"params": params}, a) ** 2))(x)

    monkeypatch.setenv("PCFA_FN2_CHAIN", "1")
    out = model.apply({"params": params}, x)
    g = jax.grad(
        lambda a: jnp.sum(model.apply({"params": params}, a) ** 2))(x)

    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               atol=1e-6, rtol=1e-6)


def test_basic_encoder_stem_pallas_matches_xla(rng, monkeypatch):
    """RAFT/GMA BasicEncoder with the Pallas 7×7/2 stem == XLA branch."""
    import pcfa_tpu.models.layers as ly
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    x = jnp.asarray(rng.random((1, 32, 48, 3)), jnp.float32)
    enc = ly.BasicEncoder(output_dim=64, norm_fn="instance")
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    ref = enc.apply({"params": params}, x)
    monkeypatch.setattr(ly, "_stem_pallas_default", lambda: True)
    out = enc.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("norm_fn", ["instance", "batch"])
def test_basic_encoder_nhcw_layer1_matches_nhwc(rng, monkeypatch, norm_fn):
    """BasicEncoder with the Pallas NHCW layer1 path (PConv residual blocks,
    norms on channel axis 2) == the NHWC branch, forward AND input-grad."""
    import pcfa_tpu.models.layers as ly
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    x = jnp.asarray(rng.random((1, 32, 48, 3)), jnp.float32)
    enc = ly.BasicEncoder(output_dim=64, norm_fn=norm_fn)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, xx):
        return jnp.sum(jnp.sin(enc.apply({"params": p}, xx)))

    ref, gref = jax.value_and_grad(loss, argnums=1)(params, x)
    monkeypatch.setattr(ly, "_stem_pallas_default", lambda: True)
    monkeypatch.setattr(ly, "_encoder_nhcw_default", lambda: True)
    out, gout = jax.value_and_grad(loss, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gout), np.asarray(gref),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("shape",
                         [(1, 32, 48, 3), (1, 56, 48, 3), (1, 36, 48, 3)])
def test_basic_encoder_nhcw_deep_matches_nhwc(rng, monkeypatch, shape):
    """PCFA_PALLAS_ENCODER=2 (deep NHCW: strided residual stages + 1×1
    output conv stay in the Pallas layout) == the NHWC branch, forward AND
    input-grad. H=56 makes layer3's output height odd (7) so the strided
    block exercises small_conv2d's XLA-NHCW fallback; H=36 gives layer3 an
    ODD input height (9) so the strided fallback's BACKWARD is exercised
    too (round-3 advisor regression — Sintel 436-height hits this); H=32
    keeps every stage on the Pallas plan. Param tree is shared across all
    three modes (init under NHWC, applied under deep)."""
    import pcfa_tpu.models.layers as ly
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    x = jnp.asarray(rng.random(shape), jnp.float32)
    enc = ly.BasicEncoder(output_dim=64, norm_fn="instance")
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, xx):
        return jnp.sum(jnp.sin(enc.apply({"params": p}, xx)))

    ref, gref = jax.value_and_grad(loss, argnums=1)(params, x)
    monkeypatch.setattr(ly, "_stem_pallas_default", lambda: True)
    monkeypatch.setattr(ly, "_encoder_nhcw_default", lambda: True)
    monkeypatch.setattr(ly, "_encoder_nhcw_deep", lambda: True)
    out, gout = jax.value_and_grad(loss, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gout), np.asarray(gref),
                               atol=2e-4, rtol=1e-3)
    # depth-truncation hooks return NHWC in every mode
    for depth in (1, 2, 3, 4):
        a = enc.apply({"params": params}, x, depth=depth)
        monkeypatch.setattr(ly, "_encoder_nhcw_default", lambda: False)
        b = enc.apply({"params": params}, x, depth=depth)
        monkeypatch.setattr(ly, "_encoder_nhcw_default", lambda: True)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_corr_lookup_pallas_matches_mm(rng):
    """Pallas vertical slice+blend lookup (interpret) == corr_lookup_mm:
    values + pyramid gradients, OOB and integer coords, fp32 and bf16."""
    from pcfa_tpu.ops import correlation
    from pcfa_tpu.ops.pallas.corr_lookup import corr_lookup_pallas

    f1 = jnp.asarray(rng.standard_normal((2, 16, 24, 32)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((2, 16, 24, 32)), jnp.float32)
    pyr = correlation.corr_pyramid(
        correlation.allpairs_correlation(f1, f2), 4)
    coords = jnp.asarray(rng.uniform(-6, 30, (2, 16, 24, 2)), jnp.float32)
    coords = coords.at[0, 0, 0].set(jnp.asarray([0.0, 0.0]))
    coords = coords.at[0, 0, 1].set(jnp.asarray([23.0, 15.0]))
    coords = coords.at[0, 1, 0].set(jnp.asarray([-40.0, 100.0]))

    a = correlation.corr_lookup_mm(pyr, coords, 4)
    b = corr_lookup_pallas(pyr, coords, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    ga = jax.grad(
        lambda p: jnp.sum(correlation.corr_lookup_mm(p, coords, 4) ** 2))(
            pyr)
    gb = jax.grad(
        lambda p: jnp.sum(
            corr_lookup_pallas(p, coords, 4, interpret=True) ** 2))(pyr)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)

    pyr16 = [lvl.astype(jnp.bfloat16) for lvl in pyr]
    a16 = correlation.corr_lookup_mm(pyr16, coords, 4)
    b16 = corr_lookup_pallas(pyr16, coords, 4, interpret=True)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(a16, np.float32),
                               np.asarray(b16, np.float32),
                               atol=0.05, rtol=0.05)


def test_raft_with_pallas_lookup_matches_mm(rng, monkeypatch):
    """Full RAFT forward + input-grad with PCFA_CORR_LOOKUP=pallas
    (interpret) == the mm lookup path."""
    import functools

    import pcfa_tpu.ops.pallas.corr_lookup as cl
    from pcfa_tpu.models import make_model

    model, _ = make_model("RAFT", iters=2)
    x1 = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x1, x2)["params"]

    def loss(a):
        out = model.apply({"params": params}, a, x2)
        f = out[-1] if isinstance(out, (tuple, list)) else out
        return jnp.sum(f ** 2)

    monkeypatch.setenv("PCFA_CORR_LOOKUP", "mm")
    ref, gref = jax.value_and_grad(loss)(x1)
    monkeypatch.setattr(
        cl, "corr_lookup_pallas",
        functools.partial(cl.corr_lookup_pallas.__wrapped__, interpret=True)
        if hasattr(cl.corr_lookup_pallas, "__wrapped__")
        else functools.partial(cl.corr_lookup_pallas, interpret=True))
    monkeypatch.setenv("PCFA_CORR_LOOKUP", "pallas")
    out, gout = jax.value_and_grad(loss)(x1)
    np.testing.assert_allclose(float(ref), float(out), rtol=1e-4)
    # grads reach O(1e3); deviations measured at ~1e-6 of the grad scale
    # (fp association through the 2-iteration recurrence)
    np.testing.assert_allclose(np.asarray(gout), np.asarray(gref),
                               atol=1e-2, rtol=1e-3)


def test_pwcnet_pallas_conv_branch_matches_xla(rng, monkeypatch):
    """PWCNet with the Pallas ConvLeaky branch (interpret) == XLA branch."""
    import pcfa_tpu.models.pwcnet as pw
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    x1 = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ref_model = pw.PWCDCNet(use_pallas=False)
    params = ref_model.init(jax.random.PRNGKey(0), x1, x2)["params"]
    ref = ref_model.apply({"params": params}, x1, x2)
    monkeypatch.setattr(pw, "_conv_pallas_default", lambda: True)
    out = pw.PWCDCNet(use_pallas=False).apply({"params": params}, x1, x2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_spynet_pallas_branch_matches_xla(rng, monkeypatch):
    """SpyNet with use_pallas=True (interpret mode) == the XLA branch."""
    import pcfa_tpu.ops.pallas.small_conv as m

    orig = m._forward
    monkeypatch.setattr(
        m, "_forward",
        lambda x, k, b, act, interpret=True, plan=None, stride=1: orig(
            x, k, b, act, interpret=True, stride=stride),
    )
    from pcfa_tpu.models.spynet import SpyNet

    x1 = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ref_model = SpyNet(use_pallas=False)
    params = ref_model.init(jax.random.PRNGKey(0), x1, x2)["params"]
    ref = ref_model.apply({"params": params}, x1, x2)
    out = SpyNet(use_pallas=True).apply({"params": params}, x1, x2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_global_corr_pallas_forward(rng):
    from pcfa_tpu.ops.correlation import global_correlation

    f1 = jnp.asarray(rng.standard_normal((1, 12, 14, 16)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 12, 14, 16)), jnp.float32)
    out = _forward(f1, f2, 2 * (4 // 2) + 1, 2, interpret=True)
    ref = global_correlation(f1, f2, 4, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_corr_pallas_streaming_path(rng, monkeypatch):
    """Force the HBM-streaming DMA path (resident budget exceeded), with an
    odd height exercising the H padding."""
    import pcfa_tpu.ops.pallas.local_corr as m

    monkeypatch.setattr(m, "_RESIDENT_BUDGET", 0)
    f1 = jnp.asarray(rng.standard_normal((1, 11, 10, 8)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 11, 10, 8)), jnp.float32)
    out = _forward(f1, f2, 5, 1, interpret=True)
    ref = local_correlation(f1, f2, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_corr_pallas_streaming_chunked(rng, monkeypatch):
    """Streaming + channel chunking (lane-aligned 128 chunks)."""
    import pcfa_tpu.ops.pallas.local_corr as m

    monkeypatch.setattr(m, "_RESIDENT_BUDGET", 0)
    monkeypatch.setattr(m, "_SLAB_BUDGET", 10 * 2**10)
    f1 = jnp.asarray(rng.standard_normal((1, 8, 6, 256)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 8, 6, 256)), jnp.float32)
    out = _forward(f1, f2, 3, 2, interpret=True)
    from pcfa_tpu.ops.correlation import global_correlation

    ref = global_correlation(f1, f2, 2, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
