"""Target construction: zero / neg_flow / custom crop-pad logic."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcfa_tpu.attack import targets

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_zero_and_neg(rng):
    flow = jnp.asarray(rng.standard_normal((1, 5, 7, 2)).astype(np.float32))
    assert float(jnp.abs(targets.make_target_fn("zero")(flow)).max()) == 0.0
    np.testing.assert_array_equal(
        np.asarray(targets.make_target_fn("neg_flow")(flow)), -np.asarray(flow)
    )


def test_unknown_target_raises():
    with pytest.raises(ValueError):
        targets.make_target_fn("bogus")


@pytest.mark.parametrize("tgt_hw,flow_hw", [((6, 6), (6, 6)), ((4, 9), (6, 6)), ((9, 4), (6, 6)), ((10, 10), (6, 6))])
def test_fit_custom_target_matches_reference(tgt_hw, flow_hw, rng):
    th, tw = tgt_hw
    fh, fw = flow_hw
    tgt = rng.standard_normal((th, tw, 2)).astype(np.float32)

    # Reference logic on (C, H, W) per targets.py:60-78
    ref = torch.from_numpy(np.transpose(tgt, (2, 0, 1)))
    if fw < tw:
        ref = ref[:, :, :fw]
    elif fw > tw:
        ref = F.pad(ref, (0, fw - tw), "reflect")
    if fh < th:
        ref = ref[:, :fh, :]
    elif fh > th:
        ref = F.pad(ref, (0, 0, 0, fh - th), "reflect")
    ref = np.transpose(ref.numpy(), (1, 2, 0))

    ours = targets.fit_custom_target(tgt, fh, fw)
    np.testing.assert_array_equal(ours, ref)


def test_custom_target_from_npy(tmp_path, rng):
    data = rng.standard_normal((4, 5, 2)).astype(np.float32)
    path = str(tmp_path / "target.npy")
    np.save(path, data)
    fn = targets.make_target_fn("custom", path)
    flow = jnp.zeros((2, 8, 8, 2))
    out = np.asarray(fn(flow))
    assert out.shape == (2, 8, 8, 2)
    np.testing.assert_array_equal(out[0, :4, :5], data)
    np.testing.assert_array_equal(out[0], out[1])  # batch broadcast


def test_custom_target_channels_first_npy(tmp_path, rng):
    data = rng.standard_normal((2, 4, 5)).astype(np.float32)
    path = str(tmp_path / "target.npy")
    np.save(path, data)
    loaded = targets.load_custom_target(path)
    assert loaded.shape == (4, 5, 2)


def test_custom_target_invalid_file(tmp_path):
    path = str(tmp_path / "bad.npy")
    np.save(path, np.zeros(3))
    with pytest.raises(ValueError):
        targets.load_custom_target(path)
