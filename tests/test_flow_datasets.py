"""flow_datasets indexers against a synthetic $DATASETS tree."""

import os

import numpy as np
import pytest

from pcfa_tpu.data import flow_datasets as fd
from pcfa_tpu.io import write_flo


@pytest.fixture
def fake_datasets(tmp_path, monkeypatch):
    monkeypatch.setenv("DATASETS", str(tmp_path))
    # kitti15 training: 200 sequences indexed; create the dirs + 2 files
    k15 = tmp_path / "kitti15" / "training"
    (k15 / "image_2").mkdir(parents=True)
    (k15 / "flow_occ").mkdir(parents=True)
    (k15 / "image_2" / "000000_10.png").write_bytes(b"")
    (k15 / "image_2" / "000000_11.png").write_bytes(b"")
    (k15 / "flow_occ" / "000000_10.png").write_bytes(b"")
    # sintel training: one scene with 3 frames + 2 flows
    si = tmp_path / "mpi_sintel" / "training"
    (si / "clean" / "alley_1").mkdir(parents=True)
    (si / "flow" / "alley_1").mkdir(parents=True)
    for f in (1, 2, 3):
        (si / "clean" / "alley_1" / f"frame_{f:04d}.png").write_bytes(b"")
    for f in (1, 2):
        write_flo(np.zeros((4, 5, 2), np.float32),
                  str(si / "flow" / "alley_1" / f"frame_{f:04d}.flo"))
    return tmp_path


def test_kitti15_train_index(fake_datasets):
    ds = fd.getKITTI15Train()
    assert len(ds) == 200
    assert ds["000000"]["images"][0].endswith("000000_10.png")
    assert ds["000000"]["flows"][0].endswith("flow_occ/000000_10.png")


def test_sintel_train_index_and_completeness(fake_datasets):
    ds = fd.getSintelTrainClean()
    assert len(ds) == len(fd.SINTEL_TRAIN_SEQUENCES)
    assert len(ds["alley_1"]["images"]) == 50  # indexed count, not on-disk
    missing = fd.testDatasetCompleteness({"alley_1": ds["alley_1"]})
    # frames 1-3 exist, flows 1-2 exist; the rest are reported missing
    assert len(missing) == (50 - 3) + (49 - 2)


def test_find_groundtruth_sintel(fake_datasets):
    gt = fd.findGroundtruth(
        str(fake_datasets / "whatever" / "alley_1" / "frame_0002.png")
    )
    assert gt is not None and gt.endswith("alley_1/frame_0002.flo")


def test_find_groundtruth_kitti(fake_datasets):
    gt = fd.findGroundtruth("/results/kitti15/000000_10_flow.npy")
    assert gt is not None and gt.endswith("000000_10.png")


def test_requires_env(monkeypatch):
    monkeypatch.delenv("DATASETS", raising=False)
    with pytest.raises(ValueError):
        fd.getKITTI15Train()


def test_unknown_dataset(fake_datasets):
    with pytest.raises(ValueError):
        fd.getTrainDataset("nonsense")
