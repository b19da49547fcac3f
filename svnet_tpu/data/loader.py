"""Batched loader with background prefetch (single producer thread).

Replaces torch DataLoader(num_workers=8) (ref main_cls_dgcnn.py:119-120)
the host-Python way that actually feeds a TPU: a producer thread assembles
batches and a bounded queue double-buffers them ahead of the training
step, so host batch prep overlaps device compute. The expensive
augmentation (rotation) stays batched on-device inside the jitted step.

``num_workers=0`` degrades to the synchronous in-line path (useful in
tests and for determinism debugging); any value > 0 enables the single
producer thread. Iteration order and RNG use are identical in both paths,
so the two are batch-for-batch deterministic.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        pad_last: bool = False,
        num_workers: int = 0,
        prefetch: int = 3,
    ):
        """``pad_last``: pad the final short batch up to batch_size by
        repeating items (keeps a single static XLA program); the pad count is
        reported so metrics can mask it out.
        ``num_workers``: >0 enables the background producer thread (batch
        prep overlaps device compute). ``prefetch``: queue depth."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = order[start : start + bs]
            if len(idx) < bs:
                if self.drop_last:
                    return
                if self.pad_last:
                    pad = bs - len(idx)
                    idx = np.concatenate([idx, idx[:1].repeat(pad)])
                else:
                    pad = 0
            else:
                pad = 0
            yield idx, pad

    def _collate(self, items, pad):
        batch = {
            "points": np.stack([it[0] for it in items]).astype("float32"),
            "target": np.asarray([it[1] for it in items], dtype=np.int64),
            "pad": pad if self.pad_last else 0,
            "size": len(items) - (pad if self.pad_last else 0),
        }
        if len(items[0]) == 3:  # partseg: (points, label, seg)
            batch["label"] = _one_hot16(batch["target"])
            batch["seg"] = np.stack([it[2] for it in items]).astype(np.int64)
            batch["target"], batch["category"] = batch["seg"], batch["target"]
        return batch

    def __iter__(self) -> Iterator[dict]:
        if self.num_workers <= 0:
            for idx, pad in self._index_batches():
                items = [self.dataset[int(i)] for i in idx]
                yield self._collate(items, pad)
            return
        yield from self._iter_prefetch()

    def _iter_prefetch(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _SENTINEL = object()

        def produce():
            # items are fetched SEQUENTIALLY inside this one producer
            # thread: dataset __getitem__ mutates a shared numpy Generator
            # (augmentation), which is not thread-safe — a worker pool here
            # raced on it and corrupted batches (found as training NaNs,
            # round 2). The speedup comes from overlapping batch prep with
            # device compute via the queue, not from intra-batch threads.
            try:
                for idx, pad in self._index_batches():
                    if stop.is_set():
                        return
                    items = [self.dataset[int(i)] for i in idx]
                    q.put(self._collate(items, pad))
                q.put(_SENTINEL)
            except BaseException as e:  # surface producer errors
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                got = q.get()
                if got is _SENTINEL:
                    return
                if isinstance(got, BaseException):
                    raise got
                yield got
        finally:
            stop.set()
            # drain so the producer's q.put never blocks forever
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)


def _one_hot16(labels: np.ndarray) -> np.ndarray:
    """(B,) int -> (B, 16) f32 one-hot (ref main_partseg_dgcnn.py:170-174)."""
    out = np.zeros((labels.shape[0], 16), dtype=np.float32)
    out[np.arange(labels.shape[0]), labels] = 1.0
    return out
