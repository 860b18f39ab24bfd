"""Lightweight per-frame metrics registry (SURVEY §5 observability).

The reference's only observable output is the returned corner count
(reference src/orb.rs:550-556); here every pipeline stage can record
structured scalars (tracked features, inlier ratio, keyframe rate, stage
latency, ATE when GT is available) with cheap host-side aggregation and a
JSON export.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager


class Metrics:
    def __init__(self):
        self._series: dict[str, list[tuple[int, float]]] = defaultdict(list)
        self._step = 0

    def step(self, step: int | None = None) -> int:
        self._step = self._step + 1 if step is None else step
        return self._step

    def record(self, name: str, value: float, step: int | None = None) -> None:
        self._series[name].append(
            (self._step if step is None else step, float(value))
        )

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name + "_ms", (time.perf_counter() - t0) * 1e3)

    def last(self, name: str) -> float | None:
        s = self._series.get(name)
        return s[-1][1] if s else None

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, s in self._series.items():
            vals = [v for _, v in s]
            vals_sorted = sorted(vals)
            out[name] = {
                "count": len(vals),
                "mean": sum(vals) / len(vals),
                "min": vals_sorted[0],
                "max": vals_sorted[-1],
                "p50": vals_sorted[len(vals) // 2],
            }
        return out

    def to_json(self) -> str:
        return json.dumps(
            {k: v for k, v in self._series.items()}, separators=(",", ":")
        )

    def dump(self, path) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())
