"""PWCNet parity vs the reference torch implementation.

The reference imports the CUDA/OpenMP `spatial_correlation_sampler` package
at module scope; we inject a tiny torch stub with the documented semantics
(validated independently against the numpy oracle in
`test_ops_correlation.py`) and neutralize the unconditional `.cuda()` in
`warp` so the oracle runs on CPU torch.
"""

import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pcfa_tpu.models import make_model
from pcfa_tpu.models.convert import pwcnet_params_from_state

REF = "/root/reference"
H, W = 128, 192


def _stub_scs():
    """Torch stub of `spatial_correlation_sample` (kernel=1, stride=1)."""

    def spatial_correlation_sample(x1, x2, kernel_size=1, patch_size=9, stride=1):
        assert kernel_size == 1 and stride == 1
        B, C, Hh, Ww = x1.shape
        R = (patch_size - 1) // 2
        x2p = F.pad(x2, (R, R, R, R))
        rows = []
        for pi in range(patch_size):
            for pj in range(patch_size):
                rows.append((x1 * x2p[:, :, pi : pi + Hh, pj : pj + Ww]).sum(1))
        out = torch.stack(rows, 1).view(B, patch_size, patch_size, Hh, Ww)
        return out

    mod = types.ModuleType("spatial_correlation_sampler")
    mod.spatial_correlation_sample = spatial_correlation_sample
    return mod


@pytest.fixture(scope="module")
def torch_pwcnet(request):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    sys.modules.setdefault("spatial_correlation_sampler", _stub_scs())
    # PWCNet.warp calls `.cuda()` unconditionally (`PWCNet.py:194`) — no-op it
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    request.addfinalizer(lambda: setattr(torch.Tensor, "cuda", orig_cuda))

    from models.PWCNet.PWCNet import PWCDCNet as TorchPWC

    torch.manual_seed(0)
    model = TorchPWC()
    model.eval()
    return model


def test_pwcnet_matches_reference(torch_pwcnet):
    rng = np.random.default_rng(0)
    i1 = rng.random((1, 3, H, W)).astype(np.float32)
    i2 = rng.random((1, 3, H, W)).astype(np.float32)

    with torch.no_grad():
        ref = torch_pwcnet(torch.from_numpy(i1), torch.from_numpy(i2)).numpy()

    model, spec = make_model("PWCNet")
    assert spec.pad_divisor == 64
    out = model.apply(
        {"params": pwcnet_params_from_state(
            {k: v.numpy() for k, v in torch_pwcnet.state_dict().items()}
        )},
        jnp.asarray(i1.transpose(0, 2, 3, 1)),
        jnp.asarray(i2.transpose(0, 2, 3, 1)),
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_pwcnet_param_tree_matches_init(torch_pwcnet):
    model, _ = make_model("PWCNet")
    x = jnp.zeros((1, 64, 64, 3))
    init = model.init(jax.random.PRNGKey(0), x, x)["params"]
    conv = pwcnet_params_from_state(
        {k: v.numpy() for k, v in torch_pwcnet.state_dict().items()}
    )
    assert jax.tree.map(np.shape, init) == jax.tree.map(np.shape, conv)
