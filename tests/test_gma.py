"""GMA parity vs the reference torch implementation (black-box oracle)."""

import sys
from argparse import Namespace

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pcfa_tpu.models import make_model
from pcfa_tpu.models.convert import gma_params_from_state

REF = "/root/reference"

H, W = 128, 128
ITERS = 2


@pytest.fixture(scope="module")
def torch_gma():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.gma.network import RAFTGMA

    cfg = Namespace(
        num_heads=1, mixed_precision=False, position_only=False,
        position_and_content=False, dropout=0,
    )
    torch.manual_seed(0)
    model = RAFTGMA(cfg)
    with torch.no_grad():
        model.update_block.flow_head.conv2.weight *= 0.01
        model.update_block.flow_head.conv2.bias *= 0.01
    model.eval()
    return model


def _params(torch_gma):
    sd = {k: v.numpy() for k, v in torch_gma.state_dict().items()
          if "num_batches_tracked" not in k}
    return gma_params_from_state(sd)


def test_gma_matches_reference(torch_gma):
    rng = np.random.default_rng(0)
    i1 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    i2 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)

    with torch.no_grad():
        lr_t, up_t = torch_gma(
            torch.from_numpy(i1), torch.from_numpy(i2),
            iters=ITERS, test_mode=True,
        )

    model, _ = make_model("GMA", iters=ITERS)
    lr, up = model.apply(
        {"params": _params(torch_gma)},
        jnp.asarray(i1.transpose(0, 2, 3, 1) / 255.0),
        jnp.asarray(i2.transpose(0, 2, 3, 1) / 255.0),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(lr), (0, 3, 1, 2)), lr_t.numpy(),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(up), (0, 3, 1, 2)), up_t.numpy(),
        rtol=1e-3, atol=1e-3,
    )


def test_gma_fused_corr_matches_materialized(torch_gma):
    """corr_impl='fused' reproduces the materialized path's flow and input
    gradients (same lever as RAFT's, `models/raft.py`)."""
    params = _params(torch_gma)
    m_mat, _ = make_model("GMA", iters=2)
    m_fus, _ = make_model("GMA", iters=2, corr_impl="fused", corr_block=100)

    rng = np.random.default_rng(5)
    i1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    i2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)

    def run(model):
        def loss(x1):
            _, up = model.apply({"params": params}, x1, i2)
            return jnp.mean(up**2), up

        (_, up), g = jax.value_and_grad(loss, has_aux=True)(i1)
        return up, g

    up_m, g_m = run(m_mat)
    up_f, g_f = run(m_fus)
    np.testing.assert_allclose(np.asarray(up_m), np.asarray(up_f),
                               rtol=1e-4, atol=1e-4)
    scale = float(jnp.abs(g_m).max())
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_f),
                               atol=1e-4 * max(scale, 1.0))


def test_gma_param_tree_matches_init(torch_gma):
    model, _ = make_model("GMA", iters=1)
    x = jnp.zeros((1, 32, 32, 3))
    init = model.init(jax.random.PRNGKey(0), x, x)["params"]
    conv = _params(torch_gma)
    assert jax.tree.map(np.shape, init) == jax.tree.map(np.shape, conv)


@pytest.mark.parametrize("mode", ["position_only", "position_and_content"])
def test_gma_positional_attention_matches_reference(mode):
    """The positional-attention variants (off in the shipped config) match
    the reference with the same random weights."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.gma.network import RAFTGMA

    cfg = Namespace(
        num_heads=1, mixed_precision=False,
        position_only=(mode == "position_only"),
        position_and_content=(mode == "position_and_content"), dropout=0,
    )
    torch.manual_seed(1)
    tm = RAFTGMA(cfg)
    with torch.no_grad():
        tm.update_block.flow_head.conv2.weight *= 0.01
        tm.update_block.flow_head.conv2.bias *= 0.01
    tm.eval()

    rng = np.random.default_rng(2)
    i1 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    i2 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    with torch.no_grad():
        _, up_t = tm(torch.from_numpy(i1), torch.from_numpy(i2),
                     iters=1, test_mode=True)

    from pcfa_tpu.models.convert import gma_params_from_state as conv

    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    model, _ = make_model(
        "GMA", iters=1,
        position_only=(mode == "position_only"),
        position_and_content=(mode == "position_and_content"),
    )
    _, up = model.apply(
        {"params": conv(sd, include_pos_emb=True)},
        jnp.asarray(i1.transpose(0, 2, 3, 1) / 255.0),
        jnp.asarray(i2.transpose(0, 2, 3, 1) / 255.0),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(up), (0, 3, 1, 2)), up_t.numpy(),
        rtol=1e-3, atol=1e-3,
    )
