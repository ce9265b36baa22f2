"""Batching data loader + dataset factory (torch-free).

Rebuild of `prepare_dataloader` (`ownutilities.py:171-238`) plus a simple
double-buffered background prefetcher: while the TPU optimizes batch N, the
host thread decodes batch N+1 (the reference decodes synchronously on the
attack thread).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from pcfa_tpu import config
from pcfa_tpu.data.datasets import KITTI, MpiSintel
from pcfa_tpu.data.synthetic import SyntheticDataset


class DataLoader:
    """Minimal batched loader: stacks samples along axis 0.

    Yields (img1, img2, flow, valid) float32 numpy batches. `shuffle` uses a
    fresh permutation per epoch (torch DataLoader behavior)."""

    def __init__(self, dataset, batch_size=1, shuffle=False, seed=0,
                 prefetch=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _make_batch(self, idx_chunk) -> tuple:
        samples = [self.dataset[int(i)] for i in idx_chunk]
        return tuple(
            np.stack([s[k] for s in samples]) for k in range(4)
        )

    def __iter__(self) -> Iterator[tuple]:
        idx = self._indices()
        chunks = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if not self.prefetch:
            for c in chunks:
                yield self._make_batch(c)
            return

        q: queue.Queue = queue.Queue(maxsize=2)
        _SENTINEL = object()

        def worker():
            try:
                for c in chunks:
                    q.put(self._make_batch(c))
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()


def prepare_dataloader(
    mode: str = "training",
    dataset: str = "Sintel",
    shuffle: bool = False,
    batch_size: int = 1,
    small_run: bool = False,
    dstype: str = "clean",
    prefetch: bool = True,
    process_shard: bool = False,
):
    """Dataset factory mirroring `ownutilities.py:171-238`.

    `dataset` ∈ {Sintel, Kitti15, Synthetic}; returns (loader, has_gt).
    `small_run` truncates to the first 32 samples (`ownutilities.py:233-236`).
    `process_shard=True` restricts this host to its contiguous slice of the
    dataset under multi-host execution (`parallel/multihost.py`); a no-op
    in single-process runs.
    """
    if dataset == "Sintel":
        if mode == "training":
            ds = MpiSintel(
                split=config.splits("sintel_train"),
                root=config.paths("sintel_mpi"), dstype=dstype, has_gt=True,
            )
        elif mode == "evaluation":
            ds = MpiSintel(
                split=config.splits("sintel_eval"),
                root=config.paths("sintel_mpi"), dstype=dstype, has_gt=False,
            )
        else:
            raise ValueError(f"The specified mode: {mode} is unknown.")
    elif dataset == "Kitti15":
        if mode == "training":
            ds = KITTI(
                split=config.splits("kitti_train"),
                root=config.paths("kitti15"), has_gt=True,
            )
        elif mode == "evaluation":
            ds = KITTI(
                split=config.splits("kitti_eval"),
                root=config.paths("kitti15"), has_gt=False,
            )
        else:
            raise ValueError(f"The specified mode: {mode} is unknown.")
    elif dataset == "Synthetic":
        # smoke-run knobs: PCFA_SYNTHETIC_COUNT / PCFA_SYNTHETIC_SIZE=HxW
        import os

        count = int(os.environ.get("PCFA_SYNTHETIC_COUNT", 32))
        size_s = os.environ.get("PCFA_SYNTHETIC_SIZE", "128x256")
        h, w = (int(v) for v in size_s.split("x"))
        ds = SyntheticDataset(
            num_samples=count, size=(h, w), has_gt=(mode == "training")
        )
    else:
        raise ValueError(
            f"Unknown dataset {dataset}, use 'Sintel', 'Kitti15' or 'Synthetic'."
        )

    has_gt = ds.has_groundtruth()

    if small_run:
        ds = _Subset(ds, list(range(min(32, len(ds)))))

    if process_shard:
        import jax

        if jax.process_count() > 1:
            from pcfa_tpu.parallel.multihost import process_shard as _shard

            ds = _Subset(ds, _shard(len(ds)))

    return DataLoader(ds, batch_size=batch_size, shuffle=shuffle,
                      prefetch=prefetch), has_gt


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = indices

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def has_groundtruth(self):
        return self.dataset.has_groundtruth()
