"""Data layer tests: synthetic dataset semantics and loader batching."""

import numpy as np

from pcfa_tpu.data import SyntheticDataset, prepare_dataloader
from pcfa_tpu.data.loader import DataLoader


def test_synthetic_flow_is_exact():
    ds = SyntheticDataset(num_samples=4, size=(32, 64), max_shift=3, seed=1)
    img1, img2, flow, valid = ds[2]
    assert img1.shape == (32, 64, 3) and flow.shape == (32, 64, 2)
    assert img1.max() > 1.0  # [0,255] scale
    u, v = int(flow[0, 0, 0]), int(flow[0, 0, 1])
    # img2 is the exact roll of img1 by the GT flow
    np.testing.assert_array_equal(np.roll(img1, (v, u), axis=(0, 1)), img2)
    assert valid.all()
    # determinism
    again = SyntheticDataset(num_samples=4, size=(32, 64), max_shift=3, seed=1)[2]
    np.testing.assert_array_equal(again[0], img1)


def test_loader_batches_and_prefetch():
    ds = SyntheticDataset(num_samples=5, size=(16, 16))
    for prefetch in (False, True):
        dl = DataLoader(ds, batch_size=2, prefetch=prefetch)
        batches = list(dl)
        assert [b[0].shape[0] for b in batches] == [2, 2, 1]
        assert len(dl) == 3


def test_prepare_dataloader_synthetic_small_run():
    dl, has_gt = prepare_dataloader(
        mode="training", dataset="Synthetic", small_run=True, batch_size=4
    )
    assert has_gt
    b = next(iter(dl))
    assert b[0].shape == (4, 128, 256, 3)


def test_loader_shuffle_permutes():
    ds = SyntheticDataset(num_samples=8, size=(16, 16))
    dl = DataLoader(ds, batch_size=8, shuffle=True, seed=1, prefetch=False)
    b1 = next(iter(dl))[0]
    dl2 = DataLoader(ds, batch_size=8, shuffle=False, prefetch=False)
    b2 = next(iter(dl2))[0]
    assert b1.shape == b2.shape
    # same multiset of samples, different order (w.h.p.)
    s1 = np.sort(b1.reshape(8, -1).sum(1))
    s2 = np.sort(b2.reshape(8, -1).sum(1))
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
