"""RAFT parity: Flax RAFT vs the reference torch implementation as oracle.

The reference RAFT (`/root/reference/models/raft/`) is pure torch (no CUDA
extensions), so we import it directly, run it with random weights in eval
mode, convert the state dict, and compare forward outputs (SURVEY.md §4
item 2). No reference code is copied — it is exercised as a black box.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pcfa_tpu.models import make_model
from pcfa_tpu.models.convert import raft_params_from_state, load_torch_state

REF = "/root/reference"

H, W = 128, 128  # coarsest corr level must be ≥2×2 (grid normalization divides by W-1)
ITERS = 3


@pytest.fixture(scope="module")
def torch_raft():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.raft.raft import RAFT as TorchRAFT

    cfg = {"small": False, "mixed_precision": False, "dropout": 0,
           "alternate_corr": False}
    torch.manual_seed(0)
    model = TorchRAFT(cfg)
    # random-init RAFT diverges over iterations (delta_flow explodes);
    # damp the flow head so the recurrent oracle stays finite
    with torch.no_grad():
        model.update_block.flow_head.conv2.weight *= 0.01
        model.update_block.flow_head.conv2.bias *= 0.01
    model.eval()
    return model


def test_raft_matches_reference(torch_raft):
    rng = np.random.default_rng(0)
    i1 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    i2 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)

    with torch.no_grad():
        flow_lr_t, flow_up_t = torch_raft(
            torch.from_numpy(i1), torch.from_numpy(i2),
            iters=ITERS, test_mode=True,
        )

    sd = {k: v.numpy() for k, v in torch_raft.state_dict().items()
          if "num_batches_tracked" not in k}
    params = raft_params_from_state(sd)

    model, _ = make_model("RAFT", iters=ITERS)
    flow_lr, flow_up = model.apply(
        {"params": params},
        jnp.asarray(i1.transpose(0, 2, 3, 1) / 255.0),
        jnp.asarray(i2.transpose(0, 2, 3, 1) / 255.0),
    )

    np.testing.assert_allclose(
        np.transpose(np.asarray(flow_lr), (0, 3, 1, 2)),
        flow_lr_t.numpy(), rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(flow_up), (0, 3, 1, 2)),
        flow_up_t.numpy(), rtol=1e-3, atol=1e-3,
    )


def test_raft_param_tree_matches_init(torch_raft):
    sd = {k: v.numpy() for k, v in torch_raft.state_dict().items()
          if "num_batches_tracked" not in k}
    conv = raft_params_from_state(sd)

    model, _ = make_model("RAFT", iters=1)
    x = jnp.zeros((1, 32, 32, 3))
    init = model.init(jax.random.PRNGKey(0), x, x)["params"]
    assert jax.tree.map(np.shape, init) == jax.tree.map(np.shape, conv)


def test_raft_input_gradients_flow(torch_raft):
    """Attack requirement: gradients wrt inputs through the whole net,
    including the stop_gradient on coords1 (`raft.py:123`)."""
    sd = {k: v.numpy() for k, v in torch_raft.state_dict().items()
          if "num_batches_tracked" not in k}
    params = raft_params_from_state(sd)
    model, _ = make_model("RAFT", iters=2)

    rng = np.random.default_rng(1)
    i1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    i2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)

    def loss(x1, x2):
        _, up = model.apply({"params": params}, x1, x2)
        return jnp.mean(up**2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(i1, i2)
    assert np.isfinite(np.asarray(g1)).all()
    assert float(jnp.abs(g1).max()) > 0
    assert float(jnp.abs(g2).max()) > 0


def test_raft_fused_corr_matches_materialized(torch_raft):
    """`corr_impl='fused'` (blockwise volume-free lookup, the alt_cuda_corr
    analog `raft/corr.py:63-91`) must reproduce the materialized path's flow
    AND input gradients — the quantities PCFA optimizes on."""
    sd = {k: v.numpy() for k, v in torch_raft.state_dict().items()
          if "num_batches_tracked" not in k}
    params = raft_params_from_state(sd)
    m_mat, _ = make_model("RAFT", iters=2)
    m_fus, _ = make_model("RAFT", iters=2, corr_impl="fused", corr_block=100)

    rng = np.random.default_rng(2)
    i1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    i2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)

    def flow_and_grad(model):
        def loss(x1, x2):
            _, up = model.apply({"params": params}, x1, x2)
            return jnp.mean(up**2), up

        (val, up), (g1, g2) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(i1, i2)
        return up, g1, g2

    up_m, g1_m, g2_m = flow_and_grad(m_mat)
    up_f, g1_f, g2_f = flow_and_grad(m_fus)
    np.testing.assert_allclose(np.asarray(up_m), np.asarray(up_f),
                               rtol=1e-4, atol=1e-4)
    scale = float(jnp.abs(g1_m).max())
    np.testing.assert_allclose(np.asarray(g1_m), np.asarray(g1_f),
                               atol=1e-4 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(g2_m), np.asarray(g2_f),
                               atol=1e-4 * max(scale, 1.0))


def test_raft_hybrid_corr_matches_materialized(torch_raft):
    """`corr_impl='hybrid'` (materialized levels 1..3, level 0 rebuilt
    blockwise per lookup) must reproduce the materialized path's flow AND
    input gradients."""
    sd = {k: v.numpy() for k, v in torch_raft.state_dict().items()
          if "num_batches_tracked" not in k}
    params = raft_params_from_state(sd)
    m_mat, _ = make_model("RAFT", iters=2)
    m_hyb, _ = make_model("RAFT", iters=2, corr_impl="hybrid",
                          corr_block=100)

    rng = np.random.default_rng(3)
    i1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    i2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)

    def flow_and_grad(model):
        def loss(x1, x2):
            _, up = model.apply({"params": params}, x1, x2)
            return jnp.mean(up**2), up

        (val, up), (g1, g2) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(i1, i2)
        return up, g1, g2

    up_m, g1_m, g2_m = flow_and_grad(m_mat)
    up_h, g1_h, g2_h = flow_and_grad(m_hyb)
    np.testing.assert_allclose(np.asarray(up_m), np.asarray(up_h),
                               rtol=1e-4, atol=1e-4)
    scale = float(jnp.abs(g1_m).max())
    np.testing.assert_allclose(np.asarray(g1_m), np.asarray(g1_h),
                               atol=1e-4 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(g2_m), np.asarray(g2_h),
                               atol=1e-4 * max(scale, 1.0))


def test_raft_small_matches_reference():
    """RAFT small=true variant vs the reference (`raft.py:29-33,48-51`)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.raft.raft import RAFT as TorchRAFT

    # the reference's SmallMotionEncoder mixes attr and dict access on args
    # (`update.py:65`), so it needs a dict with attribute access
    class _AttrDict(dict):
        __getattr__ = dict.__getitem__

    cfg = _AttrDict(small=True, mixed_precision=False, dropout=0,
                    alternate_corr=False)
    torch.manual_seed(3)
    tm = TorchRAFT(cfg)
    with torch.no_grad():
        tm.update_block.flow_head.conv2.weight *= 0.01
        tm.update_block.flow_head.conv2.bias *= 0.01
    tm.eval()

    rng = np.random.default_rng(4)
    i1 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    i2 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    with torch.no_grad():
        lr_t, up_t = tm(torch.from_numpy(i1), torch.from_numpy(i2),
                        iters=2, test_mode=True)

    from pcfa_tpu.models.convert import raft_small_params_from_state

    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    model, spec = make_model("RAFT-small", iters=2)
    assert spec.pad_divisor == 8
    lr, up = model.apply(
        {"params": raft_small_params_from_state(sd)},
        jnp.asarray(i1.transpose(0, 2, 3, 1) / 255.0),
        jnp.asarray(i2.transpose(0, 2, 3, 1) / 255.0),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(up), (0, 3, 1, 2)), up_t.numpy(),
        rtol=1e-3, atol=1e-3,
    )


def test_upsample_convex_vpu_matches_einsum():
    """Pin the VPU multiply-reduce `upsample_flow_convex` to the reference
    einsum formulation (`raft.py:72-83` semantics): identical math, only the
    lowering differs. Covers fp32 and the bf16-mask/fp32-flow mixed case the
    bf16 compute stack produces (ADVICE r2: promotion must go UP to fp32)."""
    from pcfa_tpu.models.raft import upsample_flow_convex

    rng = np.random.default_rng(7)
    B, H8, W8, f = 2, 6, 9, 8
    flow = jnp.asarray(rng.standard_normal((B, H8, W8, 2)), jnp.float32)
    mask_logits = jnp.asarray(
        rng.standard_normal((B, H8, W8, 9 * f * f)), jnp.float32)

    def einsum_form(flow, mask):
        m = jax.nn.softmax(
            mask.reshape(B, H8, W8, 9, f, f).astype(jnp.float32), axis=3)
        fp = jnp.pad(f * flow.astype(jnp.float32),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        nb = jnp.stack(
            [jax.lax.dynamic_slice(fp, (0, dy, dx, 0), (B, H8, W8, 2))
             for dy in range(3) for dx in range(3)], axis=3)
        up = jnp.einsum("bhwkij,bhwkc->bhwijc", m, nb,
                        precision=jax.lax.Precision.HIGHEST)
        return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, f * H8, f * W8, 2)

    ref = einsum_form(flow, mask_logits)

    got_fp32 = upsample_flow_convex(flow, mask_logits, f)
    assert got_fp32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got_fp32), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # bf16 mask (compute-dtype stack) + fp32 flow carry: result must be fp32
    # and match the fp32 reference to bf16 resolution — the mask must not
    # drag the convex combination down to bf16
    got_mixed = upsample_flow_convex(flow, mask_logits.astype(jnp.bfloat16), f)
    assert got_mixed.dtype == jnp.float32
    # absolute tolerance on the ~8-scale flow signal (bf16 logit rounding
    # shifts softmax weights ~0.4% → ~0.07 abs here; relative error is
    # meaningless at the flow's zero crossings)
    np.testing.assert_allclose(np.asarray(got_mixed), np.asarray(ref),
                               rtol=0, atol=0.15)


def test_sepconvgru_fused_matches_unfused():
    """PCFA_GRU_FUSED: the double-width z/r gate conv (kernels concatenated
    on the output axis at apply time) == the two-conv reference form —
    values AND (h, x) gradients, shared param tree, fp32 and bf16."""
    from pcfa_tpu.models.raft import SepConvGRU

    rng = np.random.default_rng(3)
    B, H, W, hd = 2, 5, 7, 16
    h0 = jnp.asarray(rng.standard_normal((B, H, W, hd)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((B, H, W, 2 * hd)), jnp.float32)

    ref_gru = SepConvGRU(hd, fused=False)
    params = ref_gru.init(jax.random.PRNGKey(0), h0, x0)["params"]
    fused_gru = SepConvGRU(hd, fused=True)
    assert (jax.tree.structure(fused_gru.init(
        jax.random.PRNGKey(0), h0, x0)["params"])
        == jax.tree.structure(params))

    for dt, atol in ((jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)):
        p = jax.tree.map(lambda t: t.astype(dt), params)
        h, x = h0.astype(dt), x0.astype(dt)

        def loss(mod, hh, xx):
            return jnp.sum(
                jnp.sin(mod.apply({"params": p}, hh, xx).astype(jnp.float32)))

        ref, gref = jax.value_and_grad(
            lambda hh, xx: loss(ref_gru, hh, xx), argnums=(0, 1))(h, x)
        out, gout = jax.value_and_grad(
            lambda hh, xx: loss(fused_gru, hh, xx), argnums=(0, 1))(h, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=atol)
        for a, b in zip(gout, gref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=atol)
