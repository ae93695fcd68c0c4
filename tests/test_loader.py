"""DataLoader behaviour: ordering, bounded prefetch, shuffling, errors."""

import threading
import time

import numpy as np
import pytest

from unimm_tpu.data.loader import DataLoader, batch_iter


class CountingDataset:
    """Tracks how many items have been constructed concurrently/total."""

    def __init__(self, n, delay=0.0):
        self.n = n
        self.delay = delay
        self.constructed = []
        self.lock = threading.Lock()
        self.epoch = 0

    def set_epoch(self, e):
        self.epoch = e

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        with self.lock:
            self.constructed.append(i)
        return {"x": np.asarray([i, self.epoch])}


def test_order_and_completeness():
    ds = CountingDataset(23)
    loader = DataLoader(ds, 5, shuffle=False, num_workers=3)
    batches = list(loader)
    assert len(batches) == 5
    got = np.concatenate([b["x"][:, 0] for b in batches])
    np.testing.assert_array_equal(np.sort(got), np.arange(23))
    # in-order when not shuffled
    np.testing.assert_array_equal(batches[0]["x"][:, 0], np.arange(5))


def test_drop_last_and_len():
    ds = CountingDataset(23)
    loader = DataLoader(ds, 5, drop_last=True)
    assert len(loader) == 4
    assert sum(1 for _ in loader) == 4


def test_training_loader_rejects_nondivisible_process_shard():
    """drop_last=True consumers (training) ignore the 'valid' padding mask,
    so a non-divisible process shard must fail LOUDLY at construction, not
    silently train duplicated rows every batch."""
    ds = CountingDataset(23)
    with pytest.raises(ValueError, match="divide"):
        DataLoader(ds, 5, drop_last=True, process_index=0, process_count=2)
    # eval loaders (drop_last=False) pad and flag instead — allowed
    DataLoader(ds, 5, drop_last=False, process_index=0, process_count=2)


def test_bounded_construction():
    """Item construction must stay within the prefetch window — not the whole
    epoch (the pre-fix behaviour submitted everything up front)."""
    ds = CountingDataset(100, delay=0.002)
    loader = DataLoader(ds, 10, num_workers=2, prefetch=1)
    it = iter(loader)
    next(it)
    time.sleep(0.3)   # give the producer time to run ahead if unbounded
    constructed = len(ds.constructed)
    # window = prefetch+1 batches in flight + 1 delivered = <= 40 items
    assert constructed <= 40, constructed
    rest = list(it)
    assert len(rest) == 9


def test_shuffle_epochs_differ_and_reproduce():
    ds = CountingDataset(30)
    loader = DataLoader(ds, 10, shuffle=True, seed=7)
    loader.set_epoch(0)
    e0 = np.concatenate([b["x"][:, 0] for b in loader])
    loader.set_epoch(1)
    e1 = np.concatenate([b["x"][:, 0] for b in loader])
    assert not np.array_equal(e0, e1)
    loader2 = DataLoader(ds, 10, shuffle=True, seed=7)
    loader2.set_epoch(0)
    e0b = np.concatenate([b["x"][:, 0] for b in loader2])
    np.testing.assert_array_equal(e0, e0b)


def test_exception_propagates():
    class Boom(CountingDataset):
        def __getitem__(self, i):
            if i == 7:
                raise ValueError("boom")
            return super().__getitem__(i)

    loader = DataLoader(Boom(20), 5)
    with pytest.raises(ValueError, match="boom"):
        list(loader)


def test_batch_iter_epochs():
    ds = CountingDataset(6)
    loader = DataLoader(ds, 3)
    seen = [(e, i) for e, i, _ in batch_iter(loader, 2)]
    assert seen == [(0, 0), (0, 1), (1, 0), (1, 1)]
