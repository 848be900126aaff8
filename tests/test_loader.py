"""Host loader: shuffling, final-batch padding, prefetch error propagation."""

import numpy as np
import pytest

from stlt_tpu.data.loader import Loader


class ToyDataset:
    class config:
        train = False

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return {"x": np.full((3,), idx, dtype=np.int32)}


def collate(samples):
    return {"x": np.stack([s["x"] for s in samples])}


def test_final_batch_padded_with_valid_mask():
    loader = Loader(ToyDataset(10), 4, collate)
    batches = list(loader)
    assert len(batches) == 3
    assert all(b["x"].shape == (4, 3) for b in batches)
    np.testing.assert_array_equal(batches[-1]["valid"], [True, True, False, False])
    # padded rows repeat row 0 of the batch
    np.testing.assert_array_equal(batches[-1]["x"][2], batches[-1]["x"][0])


def test_drop_last():
    loader = Loader(ToyDataset(10), 4, collate, drop_last=True)
    assert len(loader) == 2
    assert all(b["valid"].all() for b in loader)


def test_shuffle_differs_per_epoch_and_is_seeded():
    loader = Loader(ToyDataset(16), 4, collate, shuffle=True, seed=3)
    epoch0 = np.concatenate([b["x"][:, 0] for b in loader])
    epoch1 = np.concatenate([b["x"][:, 0] for b in loader])
    assert sorted(epoch0) == list(range(16))
    assert not np.array_equal(epoch0, epoch1)
    loader2 = Loader(ToyDataset(16), 4, collate, shuffle=True, seed=3)
    np.testing.assert_array_equal(
        epoch0, np.concatenate([b["x"][:, 0] for b in loader2])
    )


def test_prefetch_propagates_worker_errors():
    class Exploding(ToyDataset):
        def __getitem__(self, idx):
            if idx == 5:
                raise RuntimeError("boom")
            return super().__getitem__(idx)

    loader = Loader(Exploding(8), 2, collate, prefetch=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_zero_prefetch_synchronous_path():
    loader = Loader(ToyDataset(6), 2, collate, prefetch=0)
    assert len(list(loader)) == 3


def test_threaded_workers_deterministic_and_equal():
    """workers>1 must produce byte-identical batches to workers=1 (per-sample
    child RNGs are seeded up front, independent of thread scheduling)."""

    class RngDataset(ToyDataset):
        class config:
            train = True

        def __getitem__(self, idx, rng=None):
            jitter = rng.integers(0, 1000) if rng is not None else 0
            return {"x": np.full((3,), idx * 1000 + int(jitter), dtype=np.int64)}

    a = Loader(RngDataset(12), 4, collate, shuffle=True, seed=9, workers=4)
    b = Loader(RngDataset(12), 4, collate, shuffle=True, seed=9, workers=1)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["x"], bb["x"])


def test_device_prefetch_order_and_tail():
    import jax

    from stlt_tpu.data.loader import device_prefetch

    sharding = jax.sharding.SingleDeviceSharding(jax.devices("cpu")[0])
    batches = [{"x": np.full((2,), i), "extra": i} for i in range(5)]
    out = list(device_prefetch(iter(batches), {"x": sharding}))
    assert len(out) == 5  # tail batch flushed
    for i, b in enumerate(out):  # order preserved
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2,), i))
        assert b["extra"] == i  # keys missing from shardings pass through
    assert list(device_prefetch(iter([]), {"x": sharding})) == []


def test_abandoned_iterator_releases_producer():
    import gc
    import threading
    import time

    before = threading.active_count()
    loader = Loader(ToyDataset(100), 2, collate, prefetch=2)
    it = iter(loader)
    next(it)  # producer running, queue full
    it.close()  # abandon mid-epoch
    del it
    gc.collect()
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
