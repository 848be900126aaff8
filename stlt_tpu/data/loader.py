"""Host-side batching loader with background prefetch.

The TPU-native replacement for ``torch.utils.data.DataLoader`` usage in the
reference (``src/train.py:70-84``): per-epoch shuffling, collation to fixed
static shapes, and a background thread that assembles the next batches while
the device computes (double buffering; the host↔device transfer overlaps via
``jax.device_put`` happening on the consumer side).

Static-shape policy: every batch has exactly ``batch_size`` rows. The final
partial batch is padded by repeating row 0 and carries a boolean ``valid``
mask (consumed by the masked-mean criterion and the evaluators), which is
loss- and metric-equivalent to the reference's smaller final batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np


def device_prefetch(iterator, shardings, *, global_batch_size: Optional[int] = None):
    """Overlap host→device transfer with device compute: device_put batch
    k+1 (async) before yielding batch k. ``shardings`` is a per-key
    sharding dict (from ``stlt_tpu.training.loop.batch_shardings``).

    Multi-process: each process's iterator yields only its LOCAL rows (see
    ``Loader(rows=...)``); pass ``global_batch_size`` and the yielded arrays
    become global ``jax.Array``s assembled across processes."""
    import jax

    multiprocess = jax.process_count() > 1

    def put(batch):
        if multiprocess:
            from stlt_tpu.parallel.distributed import make_global_batch

            assert global_batch_size is not None, (
                "device_prefetch needs global_batch_size in multi-process mode"
            )
            return make_global_batch(batch, shardings, global_batch_size)
        return {
            k: jax.device_put(v, shardings[k]) if k in shardings else v
            for k, v in batch.items()
        }

    pending = None
    for batch in iterator:
        staged = put(batch)
        if pending is not None:
            yield pending
        pending = staged
    if pending is not None:
        yield pending


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Callable[[List[dict]], Dict[str, np.ndarray]],
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        workers: int = 1,
        rows: Optional[tuple] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Multi-process data sharding: this loader materializes only global
        # batch rows [rows[0], rows[1]) of each batch (from
        # ``stlt_tpu.parallel.distributed.process_row_span``). Epoch order
        # and per-sample augmentation seeds are computed for the FULL global
        # batch on every process, so the global data stream is bit-identical
        # to a single-process run regardless of the process count.
        self.rows = rows if rows is not None else (0, batch_size)
        if not (0 <= self.rows[0] < self.rows[1] <= batch_size):
            raise ValueError(f"rows {rows} out of range for batch_size {batch_size}")
        # Intra-batch decode parallelism: PIL/libjpeg release the GIL, so
        # threads scale near-linearly for the JPEG-heavy appearance path.
        self.workers = max(1, workers)
        self._pool = None
        self.epoch = 0

    def _executor(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=self.workers)
        return self._pool

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        return order

    def _make_batch(self, idxs: np.ndarray, rng: Optional[np.random.Generator]):
        lo, hi = self.rows
        if rng is not None:
            # Deterministic regardless of thread scheduling or process
            # sharding: one child generator per GLOBAL sample, seeded
            # sequentially up front (every process draws the full batch's
            # seeds so the rng stream stays aligned across process counts).
            seeds = rng.integers(0, 2**63 - 1, size=len(idxs))
            fetch = lambda pair: self.dataset.__getitem__(
                int(pair[0]), rng=np.random.default_rng(int(pair[1]))
            )
            work = [(idxs[p], seeds[p]) for p in range(lo, min(hi, len(idxs)))]
            template_work = (idxs[0], seeds[0])
        else:
            fetch = lambda i: self.dataset[int(i)]
            work = [idxs[p] for p in range(lo, min(hi, len(idxs)))]
            template_work = idxs[0]
        if self.workers > 1 and work:
            samples = list(self._executor().map(fetch, work))
        else:
            samples = [fetch(w) for w in work]
        valid = np.zeros((hi - lo,), dtype=bool)
        valid[: len(work)] = True
        if len(samples) < hi - lo:
            # Pad rows (masked out by ``valid``) repeat a real sample so
            # shapes stay static; a process whose whole slice is padding
            # borrows the batch's first global sample.
            filler = samples[0] if samples else fetch(template_work)
            samples = samples + [filler] * (hi - lo - len(samples))
        batch = self.collate(samples)
        batch["valid"] = valid
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        # One generator per epoch: train-time sampling jitter is reproducible
        # given (seed, epoch) yet differs across epochs.
        rng = (
            np.random.default_rng((self.seed + 1, self.epoch))
            if getattr(self.dataset, "config", None) is not None
            and getattr(self.dataset.config, "train", False)
            else None
        )
        self.epoch += 1
        num_batches = len(self)
        chunks = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(num_batches)
        ]

        if self.prefetch <= 0:
            for chunk in chunks:
                yield self._make_batch(chunk, rng)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: List[BaseException] = []
        stop = threading.Event()

        def put(item) -> bool:
            # Bounded put: bail out if the consumer abandoned the iterator,
            # instead of blocking forever holding decoded batches.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for chunk in chunks:
                    if not put(self._make_batch(chunk, rng)):
                        return
            except BaseException as e:  # propagate to consumer
                error.append(e)
            finally:
                put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            # Runs on normal exhaustion AND on generator close/abandonment
            # (consumer exception, break, GC): release the producer.
            stop.set()
