"""Profiling + structured metrics (SURVEY §5 tracing/observability).

The reference's observability is a console MetricLogger plus manual timers
(ref:train_utils/train_and_eval.py:244-296, ref:train.py:263,336-339). The
TPU rebuild adds:
  * jax.profiler trace contexts (step-time / MXU utilization via the
    profiler dump, viewable in TensorBoard/XProf),
  * named annotations for hot regions,
  * a JSONL metrics writer alongside the parity results .txt file.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class JsonlLogger:
    """Append-only structured metrics: one JSON object per line with a
    wall-clock timestamp and step/epoch tags."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)

    def log(self, record: Dict[str, Any]) -> None:
        if not self.path:
            return
        record = {"ts": time.time(), **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
