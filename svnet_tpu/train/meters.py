"""Running meters. ref utils.py:174-196 (AverageMeter)."""

from __future__ import annotations


class AverageMeter:
    """Running mean/sum meter with the reference's accum semantics."""

    def __init__(self, accum: str = "mean"):
        self.accum = accum
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        if self.accum == "mean":
            self.sum += val * n
            self.val = val
        elif self.accum == "sum":
            self.sum += val
            self.val = val / n
        self.count += n
        self.avg = self.sum / self.count
        self.avg100 = self.avg * 100
        self.val100 = self.val * 100
