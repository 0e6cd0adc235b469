"""Console progress meters (reference ``rsuper_train/utils.py:64-105``)."""

from __future__ import annotations


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":.4f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.name} {format(self.val, self.fmt[1:])} ({format(self.avg, self.fmt[1:])})"


class ProgressMeter:
    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.num_batches = num_batches
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int) -> str:
        line = f"{self.prefix}[{batch}/{self.num_batches}] " + "  ".join(
            str(m) for m in self.meters
        )
        print(line, flush=True)
        return line
