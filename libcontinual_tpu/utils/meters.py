"""Running-average meters (reference core/utils/utils.py:11-52, sans pandas)."""

from __future__ import annotations

from typing import Dict, List


class AverageMeter:
    """Tracks running sums/averages for a set of named fields."""

    def __init__(self, name: str, keys: List[str]):
        self.name = name
        self.keys = list(keys)
        self.reset()

    def reset(self):
        self._sum: Dict[str, float] = {k: 0.0 for k in self.keys}
        self._count: Dict[str, float] = {k: 0.0 for k in self.keys}
        self._last: Dict[str, float] = {k: 0.0 for k in self.keys}

    def update(self, key: str, value: float, n: float = 1.0):
        value = float(value)
        self._sum[key] += value * n
        self._count[key] += n
        self._last[key] = value

    def avg(self, key: str) -> float:
        c = self._count[key]
        return self._sum[key] / c if c else 0.0

    def last(self, key: str) -> float:
        return self._last[key]
