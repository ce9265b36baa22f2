"""FlowNet2 parity vs the reference torch implementation.

The reference imports three CUDA extension packages at module scope
(correlation / resample2d / channelnorm). We inject torch stubs with the
kernels' documented semantics (`correlation_cuda_kernel.cu:85-135`,
`resample2d_kernel.cu:16-74`, `channelnorm_kernel.cu:19-60`) and use the
reference cascade as a black-box oracle with random weights.
"""

import sys
import types
from argparse import Namespace

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pcfa_tpu.models import make_model
from pcfa_tpu.models.convert import flownet2_params_from_state

REF = "/root/reference"
H, W = 128, 192


def _install_stubs():
    class Correlation(tnn.Module):
        def __init__(self, pad_size=20, kernel_size=1, max_displacement=20,
                     stride1=1, stride2=2, corr_multiply=1):
            super().__init__()
            self.R, self.s2 = max_displacement, stride2

        def forward(self, f1, f2):
            B, C, Hh, Ww = f1.shape
            R, s2 = self.R, self.s2
            f2p = F.pad(f2, (R, R, R, R))
            outs = [
                (f1 * f2p[:, :, dy + R : dy + R + Hh, dx + R : dx + R + Ww]).sum(1)
                for dy in range(-R, R + 1, s2)
                for dx in range(-R, R + 1, s2)
            ]
            return torch.stack(outs, 1) / C

    class Resample2d(tnn.Module):
        def __init__(self, kernel_size=1, bilinear=True):
            super().__init__()

        def forward(self, img, flow):
            B, C, Hh, Ww = img.shape
            gx = torch.arange(Ww).view(1, 1, Ww) + flow[:, 0]
            gy = torch.arange(Hh).view(1, Hh, 1) + flow[:, 1]
            x0 = gx.floor()
            y0 = gy.floor()
            a = (gx - x0).unsqueeze(1)
            b = (gy - y0).unsqueeze(1)

            def gather(yc, xc):
                yc = yc.clamp(0, Hh - 1).long()
                xc = xc.clamp(0, Ww - 1).long()
                idx = (yc * Ww + xc).view(B, 1, -1).expand(B, C, Hh * Ww)
                return img.reshape(B, C, -1).gather(2, idx).view(B, C, Hh, Ww)

            return (
                (1 - a) * (1 - b) * gather(y0, x0)
                + a * (1 - b) * gather(y0, x0 + 1)
                + (1 - a) * b * gather(y0 + 1, x0)
                + a * b * gather(y0 + 1, x0 + 1)
            )

    class ChannelNorm(tnn.Module):
        def __init__(self, norm_deg=2):
            super().__init__()

        def forward(self, x):
            return x.pow(2).sum(1, keepdim=True).sqrt()

    for name, cls in (
        ("models.FlowNet.correlation_package.correlation", ("Correlation", Correlation)),
        ("models.FlowNet.resample2d_package.resample2d", ("Resample2d", Resample2d)),
        ("models.FlowNet.channelnorm_package.channelnorm", ("ChannelNorm", ChannelNorm)),
    ):
        mod = types.ModuleType(name)
        setattr(mod, *cls)
        sys.modules[name] = mod


@pytest.fixture(scope="module")
def torch_flownet2():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_stubs()
    from models.FlowNet.FlowNet2 import FlowNet2 as TorchFN2

    torch.manual_seed(0)
    model = TorchFN2(Namespace(fp16=False, rgb_max=255.0), batchNorm=False)
    model.eval()
    return model


def test_flownet2_matches_reference(torch_flownet2):
    rng = np.random.default_rng(0)
    i1 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    i2 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    stacked = torch.from_numpy(np.stack([i1, i2], axis=2))  # (1,3,2,H,W)

    with torch.no_grad():
        ref = torch_flownet2(stacked).numpy()

    model, spec = make_model("FlowNet2")
    assert spec.pad_divisor == 64
    out = model.apply(
        {"params": flownet2_params_from_state(
            {k: v.numpy() for k, v in torch_flownet2.state_dict().items()}
        )},
        jnp.asarray(i1.transpose(0, 2, 3, 1) / 255.0),
        jnp.asarray(i2.transpose(0, 2, 3, 1) / 255.0),
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_flownet2_param_tree_matches_init(torch_flownet2):
    model, _ = make_model("FlowNet2")
    x = jnp.zeros((1, 64, 64, 3))
    init = model.init(jax.random.PRNGKey(0), x, x)["params"]
    conv = flownet2_params_from_state(
        {k: v.numpy() for k, v in torch_flownet2.state_dict().items()}
    )
    assert jax.tree.map(np.shape, init) == jax.tree.map(np.shape, conv)
    n = sum(a.size for a in jax.tree.leaves(init))
    assert n == 162_518_834  # 'Parameter count' (`FlowNet2.py:21`)
