"""MpiSintel / KITTI dataset classes against generated on-disk trees."""

import numpy as np
import pytest
from PIL import Image

from pcfa_tpu.data.datasets import KITTI, MpiSintel
from pcfa_tpu.io import write_flo, write_kitti_png


def _png(path, arr):
    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.fixture
def sintel_tree(tmp_path, rng):
    root = tmp_path / "sintel"
    scene = root / "training" / "clean" / "alley_9"
    flow = root / "training" / "flow" / "alley_9"
    scene.mkdir(parents=True)
    flow.mkdir(parents=True)
    frames = [rng.integers(0, 255, (20, 30, 3)) for _ in range(3)]
    for i, f in enumerate(frames, 1):
        _png(scene / f"frame_{i:04d}.png", f)
    for i in range(1, 3):
        write_flo(rng.standard_normal((20, 30, 2)).astype(np.float32),
                  str(flow / f"frame_{i:04d}.flo"))
    return root, frames


def test_sintel_pairs_and_gt(sintel_tree):
    root, frames = sintel_tree
    ds = MpiSintel(split="training", root=str(root), dstype="clean",
                   has_gt=True)
    assert len(ds) == 2
    img1, img2, flow, valid = ds[0]
    assert img1.shape == (20, 30, 3) and flow.shape == (20, 30, 2)
    np.testing.assert_array_equal(img1, frames[0].astype(np.float32))
    np.testing.assert_array_equal(img2, frames[1].astype(np.float32))
    assert valid.all()  # dense GT, all |uv| < 1000


def test_sintel_missing_root():
    with pytest.raises(FileNotFoundError):
        MpiSintel(split="training", root="/nonexistent", dstype="clean")


@pytest.fixture
def kitti_tree(tmp_path, rng):
    root = tmp_path / "kitti"
    img = root / "training" / "image_2"
    occ = root / "training" / "flow_occ"
    img.mkdir(parents=True)
    occ.mkdir(parents=True)
    a = rng.integers(0, 255, (370, 1224, 3))
    b = rng.integers(0, 255, (370, 1224, 3))
    _png(img / "000000_10.png", a)
    _png(img / "000000_11.png", b)
    flow = rng.uniform(-10, 10, (370, 1224, 2)).astype(np.float32)
    flow[5:, :] = np.nan  # sparse GT: invalid below row 5
    write_kitti_png(flow, str(occ / "000000_10.png"))
    return root, a, flow


def test_kitti_enforced_dims_and_sparse_gt(kitti_tree):
    root, a, flow = kitti_tree
    ds = KITTI(split="training", root=str(root), has_gt=True)
    assert len(ds) == 1
    img1, img2, flow_out, valid = ds[0]
    # zero-padded to the fixed KITTI shape (`datasets.py:185-187`)
    assert img1.shape == (375, 1242, 3)
    np.testing.assert_array_equal(img1[:370, :1224], a.astype(np.float32))
    assert (img1[370:] == 0).all()
    assert valid[:5, :1224].all() and not valid[5:].any()
    # KITTI png quantizes to 1/64 px
    np.testing.assert_allclose(flow_out[:5, :1224], flow[:5], atol=1 / 64)
