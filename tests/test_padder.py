"""InputPadder vs the reference torch implementation (`ownutilities.py:21-62`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcfa_tpu.utils.padder import InputPadder

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _ref_pad(x_nchw, divisor, mode):
    ht, wd = x_nchw.shape[-2:]
    pad_ht = (((ht // divisor) + 1) * divisor - ht) % divisor
    pad_wd = (((wd // divisor) + 1) * divisor - wd) % divisor
    if mode == "sintel":
        pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
    else:
        pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]
    return F.pad(torch.from_numpy(x_nchw), pad, mode="replicate").numpy()


@pytest.mark.parametrize("divisor", [8, 64])
@pytest.mark.parametrize("mode", ["sintel", "kitti"])
@pytest.mark.parametrize("hw", [(375, 1242), (436, 1024), (37, 61), (64, 64)])
def test_pad_matches_reference(divisor, mode, hw, rng):
    h, w = hw
    x = rng.standard_normal((1, 3, h, w)).astype(np.float32)
    ref = _ref_pad(x, divisor, mode)  # NCHW

    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    padder = InputPadder(x_nhwc.shape, divisor=divisor, mode=mode)
    [out] = padder.pad(jnp.asarray(x_nhwc))
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_array_equal(out_nchw, ref)
    assert out.shape[1] % divisor == 0 and out.shape[2] % divisor == 0
    assert out.shape[1:3] == padder.padded_shape


@pytest.mark.parametrize("divisor", [8, 64])
def test_unpad_inverts_pad(divisor, rng):
    x = rng.standard_normal((2, 37, 61, 3)).astype(np.float32)
    padder = InputPadder(x.shape, divisor=divisor)
    [padded] = padder.pad(jnp.asarray(x))
    back = np.asarray(padder.unpad(padded))
    np.testing.assert_array_equal(back, x)


def test_pad_numpy_input(rng):
    x = rng.standard_normal((1, 30, 30, 2)).astype(np.float32)
    padder = InputPadder(x.shape, divisor=8)
    [padded] = padder.pad(x)
    assert isinstance(padded, np.ndarray)
    assert padded.shape == (1, 32, 32, 2)
