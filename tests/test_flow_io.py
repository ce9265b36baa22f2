"""Flow-file IO round trips, NaN/unknown handling (SURVEY.md §4 unit list)."""

import numpy as np
import pytest

from pcfa_tpu.io import flow_io


def _random_flow(rng, h=17, w=23, with_nan=True):
    flow = rng.standard_normal((h, w, 2)).astype(np.float32) * 10
    if with_nan:
        flow[2, 3] = np.nan
        flow[10, 1, 0] = np.nan
        flow[10, 1, 1] = np.nan
    return flow


def test_flo_roundtrip(tmp_path, rng):
    flow = _random_flow(rng, with_nan=False)
    path = str(tmp_path / "f.flo")
    flow_io.write_flo(flow, path)
    back = flow_io.read_flo(path)
    np.testing.assert_array_equal(back, flow)


def test_flo_nan_roundtrip(tmp_path, rng):
    flow = _random_flow(rng, with_nan=True)
    path = str(tmp_path / "f.flo")
    flow_io.write_flo(flow, path)
    back = flow_io.read_flo(path)
    assert np.isnan(back[2, 3]).all()
    valid = ~np.isnan(flow)
    np.testing.assert_array_equal(back[valid], flow[valid])


def test_flo_rejects_wrong_tag(tmp_path):
    path = tmp_path / "bad.flo"
    path.write_bytes(b"XXXX" + b"\x01\x00\x00\x00" * 2)
    with pytest.raises(IOError):
        flow_io.read_flo(str(path))


def test_flo_rejects_truncated(tmp_path, rng):
    flow = _random_flow(rng, with_nan=False)
    path = str(tmp_path / "f.flo")
    flow_io.write_flo(flow, path)
    with open(path, "rb") as f:
        data = f.read()
    with open(path, "wb") as f:
        f.write(data[:-4])
    with pytest.raises(IOError):
        flow_io.read_flo(path)


def test_kitti_png_roundtrip(tmp_path, rng):
    # KITTI encoding quantizes to 1/64 px — use representable values.
    flow = (rng.integers(-2000, 2000, (14, 9, 2)) / 64.0).astype(np.float32)
    flow[3, 4] = np.nan
    path = str(tmp_path / "f.png")
    flow_io.write_kitti_png(flow, path)
    back = flow_io.read_kitti_png(path)
    assert np.isnan(back[3, 4]).all()
    valid = ~np.isnan(flow)
    np.testing.assert_allclose(back[valid], flow[valid], atol=1e-6)


def test_kitti_png_with_valid(tmp_path, rng):
    flow = (rng.integers(-200, 200, (8, 8, 2)) / 64.0).astype(np.float32)
    flow[0, 0] = np.nan
    path = str(tmp_path / "f.png")
    flow_io.write_kitti_png(flow, path)
    back, valid = flow_io.read_kitti_png_with_valid(path)
    assert valid[0, 0] == 0
    assert valid[1:].all()
    np.testing.assert_allclose(back[1:], flow[1:], atol=1e-6)


def test_dispatch_npy(tmp_path, rng):
    flow = _random_flow(rng, with_nan=False)
    path = str(tmp_path / "f.npy")
    flow_io.write_flow(flow, path)
    np.testing.assert_array_equal(flow_io.read_flow(path), flow)


def test_write_flow_validates_shape(tmp_path):
    with pytest.raises(IOError):
        flow_io.write_flow(np.zeros((4, 4, 3)), str(tmp_path / "f.flo"))


def test_read_image_grayscale_tiled(tmp_path):
    from PIL import Image

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = str(tmp_path / "g.png")
    Image.fromarray(img).save(p)
    out = flow_io.read_image(p)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[..., 0], img)
    np.testing.assert_array_equal(out[..., 2], img)
