"""Profiling / observability hooks.

The reference's observability is timing meters + CUDA max-memory
(util/misc.py:193-245, SURVEY.md §5). TPU-native equivalents: jax.profiler
trace capture around training windows, named step annotations, and
throughput counters (QA pairs/s, edge traversals/s) computed from batch
shapes.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf) around a
    training window; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named annotation for one step (shows up in the trace timeline)."""
    return jax.profiler.StepTraceAnnotation(name)


class ThroughputMeter:
    """QA pairs/s and per-round edge traversals/s over a rolling window."""

    def __init__(self, engine_rounds: int = 5):
        self.engine_rounds = engine_rounds
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._pairs = 0
        self._edges = 0

    def update(self, num_questions: int, num_real_edges: int):
        self._pairs += num_questions
        self._edges += num_real_edges * self.engine_rounds

    @property
    def qa_pairs_per_s(self) -> float:
        return self._pairs / max(time.perf_counter() - self._t0, 1e-9)

    @property
    def edge_traversals_per_s(self) -> float:
        return self._edges / max(time.perf_counter() - self._t0, 1e-9)

    def summary(self) -> str:
        return (f"{self.qa_pairs_per_s:.1f} qa/s, "
                f"{self.edge_traversals_per_s:.3e} edges/s")
