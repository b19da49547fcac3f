"""Minimal batched loader: shuffling, drop_last, numpy collation.

Replaces torch DataLoader(num_workers=8) (ref main_cls_dgcnn.py:119-120).
Datasets here are in-RAM numpy arrays with cheap per-item augmentation, so
worker processes buy nothing; the expensive augmentation (rotation) is
batched on device inside the jitted step. The loader yields numpy batches;
jit's donate/commit machinery overlaps H2D transfer with compute.
"""

from __future__ import annotations

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
    ):
        """``pad_last``: pad the final short batch up to batch_size by
        repeating items (keeps a single static XLA program); the pad count is
        reported so metrics can mask it out."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
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
            items = [self.dataset[int(i)] for i in idx]
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
            yield batch


def _one_hot16(labels: np.ndarray) -> np.ndarray:
    """(B,) int -> (B, 16) f32 one-hot (ref main_partseg_dgcnn.py:170-174)."""
    out = np.zeros((labels.shape[0], 16), dtype=np.float32)
    out[np.arange(labels.shape[0]), labels] = 1.0
    return out
