"""Threaded, device-prefetching data loader.

The reference uses torch DataLoader with 16 time-seeded workers
(reference: modules/lsegmentation_module.py:177-196). Here: a thread
pool decodes/augments on host, batches are assembled into pinned NumPy
buffers, and up to `prefetch` batches are staged onto the device(s)
ahead of the training step — `jax.device_put` with the batch sharding
overlaps H2D with compute so the input pipeline rides under the step
time.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np


class DataLoader:
    """Minimal epoch-based loader: map-style dataset -> batched dicts.

    drop_last=True keeps shapes static (no retrace on the tail batch).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        sharding=None,
        process_count: int = 1,
        process_index: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.sharding = sharding
        # multi-host: each process loads its contiguous shard of the
        # (epoch-shuffled) index stream (reference multi-node loading is
        # per-rank via DistributedSampler; here per jax.process_index())
        self.process_count = process_count
        self.process_index = process_index
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle for `epoch` (DistributedSampler.set_epoch
        semantics); fit() calls this every epoch so order differs per
        epoch and resume does not replay epoch-0 order."""
        self.epoch = int(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.process_count > 1:
            n = n // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.process_count > 1:
            per = len(idx) // self.process_count
            idx = idx[self.process_index * per:
                      (self.process_index + 1) * per]
        return idx

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)
        idx = self._indices()
        n_batches = len(self)
        sample_q: "queue.Queue" = queue.Queue(
            maxsize=self.num_workers * self.batch_size * 2
        )
        stop = threading.Event()

        def worker(wid: int):
            for i in range(wid, n_batches * self.batch_size,
                           self.num_workers):
                if stop.is_set():
                    return
                try:
                    sample_q.put((i, self.dataset[int(idx[i])]))
                except Exception as e:  # propagate to the consumer
                    sample_q.put((i, e))

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        try:
            staged: Dict[int, Any] = {}
            next_i = 0
            pending = []
            for b in range(n_batches):
                samples = []
                while len(samples) < self.batch_size:
                    if next_i in staged:
                        samples.append(staged.pop(next_i))
                        next_i += 1
                        continue
                    i, s = sample_q.get()
                    if isinstance(s, Exception):
                        raise RuntimeError(
                            f"DataLoader worker failed on sample {i}"
                        ) from s
                    if i == next_i:
                        samples.append(s)
                        next_i += 1
                    else:
                        staged[i] = s
                batch = {
                    k: np.stack([s[k] for s in samples])
                    for k in samples[0]
                }
                if self.sharding is not None:
                    batch = jax.device_put(batch, self.sharding)
                pending.append(batch)
                if len(pending) > self.prefetch:
                    yield pending.pop(0)
            for batch in pending:
                yield batch
        finally:
            stop.set()
            # drain so worker puts don't block forever
            while not sample_q.empty():
                try:
                    sample_q.get_nowait()
                except queue.Empty:
                    break
        self.epoch += 1
