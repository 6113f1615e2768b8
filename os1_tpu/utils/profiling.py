"""Lightweight stage timing for the host-orchestrated pipeline.

The reference has no systematic tracing (SURVEY.md §5: commented-out chrono
in main.cc:131-132, thread names for external profilers); here every pipeline
stage can be timed with one context manager and summarized per run — the
observability the reference lacked.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class StageTimer:
    """Accumulates wall-clock per named stage.

    Usage::

        timer = StageTimer()
        with timer("extract"):
            feats = extractor(img)   # add jax.block_until_ready for accuracy
        print(timer.report())
    """

    def __init__(self, sync: bool = False):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        total = sum(self.totals.values()) or 1.0
        lines = [
            f"{name:<28s} {tot:8.3f}s {self.counts[name]:6d}x "
            f"{tot / self.counts[name] * 1e3:8.2f}ms/call {tot / total * 100:5.1f}%"
            for name, tot in rows
        ]
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


def stage_report(timer: StageTimer) -> str:
    return timer.report()
