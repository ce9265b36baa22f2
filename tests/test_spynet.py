"""SpyNet parity: Flax model vs a torch oracle of the reference forward.

The oracle re-enacts `models/SpyNet/SpyNet.py:104-158` with torch primitives
and random weights; the same weights are converted to flax params and the
outputs compared. This validates conv/pool/upsample/grid_sample semantics and
the weight converter in one shot (SURVEY.md §4 item 2).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pcfa_tpu.models import make_model
from pcfa_tpu.models.convert import spynet_params_from_arrays

NLEVELS = 4  # full recipe, smaller pyramid for test speed (divisor 2**NLEVELS)


def torch_spynet_forward(img1, img2, levels):
    """Reference recipe (`SpyNet.py:130-158`) with eval-mode output."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    pyr1 = [(img1 - mean) / std]
    pyr2 = [(img2 - mean) / std]
    for _ in range(NLEVELS - 1):
        pyr1.insert(0, F.avg_pool2d(pyr1[0], 2, 2))
        pyr2.insert(0, F.avg_pool2d(pyr2[0], 2, 2))

    B, _, h0, w0 = pyr1[0].shape
    flow = torch.zeros(B, 2, h0 // 2, w0 // 2)

    for lvl in range(NLEVELS):
        up = F.interpolate(flow, scale_factor=2, mode="bilinear") * 2.0
        H, W = pyr1[lvl].shape[2:]
        # backward warp (SpyNet.py:90-102)
        gx = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, 1, H, W)
        gy = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, 1, H, W)
        norm_flow = torch.cat(
            [up[:, 0:1] / ((W - 1) / 2.0), up[:, 1:2] / ((H - 1) / 2.0)], 1
        )
        grid = (torch.cat([gx, gy], 1) + norm_flow).clamp(-1, 1)
        warped = F.grid_sample(
            pyr2[lvl], grid.permute(0, 2, 3, 1), mode="bilinear",
            align_corners=False,
        )
        inp = torch.cat([pyr1[lvl], warped, up], 1)
        x = inp
        for w, b in levels[lvl][:-1]:
            x = F.relu(F.conv2d(x, w, b, padding=3))
        w, b = levels[lvl][-1]
        flow = F.conv2d(x, w, b, padding=3) + up
    return flow


@pytest.fixture
def random_levels(rng):
    chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    levels = []
    for _ in range(NLEVELS):
        convs = []
        for cin, cout in chans:
            w = rng.standard_normal((cout, cin, 7, 7)).astype(np.float32) * 0.1
            b = rng.standard_normal((cout,)).astype(np.float32) * 0.1
            convs.append((torch.from_numpy(w), torch.from_numpy(b)))
        levels.append(convs)
    return levels


def test_spynet_matches_torch_oracle(rng, random_levels):
    H, W = 2 ** NLEVELS * 2, 2 ** NLEVELS * 3
    i1 = rng.random((1, 3, H, W), dtype=np.float32)
    i2 = rng.random((1, 3, H, W), dtype=np.float32)

    ref = torch_spynet_forward(
        torch.from_numpy(i1), torch.from_numpy(i2), random_levels
    ).numpy()

    model, spec = make_model("SpyNet", nlevels=NLEVELS)
    params = spynet_params_from_arrays(
        [[(w.numpy(), b.numpy()) for (w, b) in lvl] for lvl in random_levels]
    )
    out = model.apply(
        {"params": params},
        jnp.asarray(i1.transpose(0, 2, 3, 1)),
        jnp.asarray(i2.transpose(0, 2, 3, 1)),
    )
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, rtol=1e-3, atol=1e-3)


def test_spynet_param_tree_matches_init(rng, random_levels):
    """Converted params must be drop-in for flax-initialized ones."""
    import jax

    model, _ = make_model("SpyNet", nlevels=NLEVELS)
    x = jnp.zeros((1, 2 ** NLEVELS, 2 ** NLEVELS, 3))
    init = model.init(jax.random.PRNGKey(0), x, x)["params"]
    conv = spynet_params_from_arrays(
        [[(w.numpy(), b.numpy()) for (w, b) in lvl] for lvl in random_levels]
    )
    ref_shapes = jax.tree.map(lambda a: a.shape, init)
    got_shapes = jax.tree.map(lambda a: a.shape, conv)
    assert ref_shapes == got_shapes
