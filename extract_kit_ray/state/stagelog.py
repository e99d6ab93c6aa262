"""Per-stage structured logging/metrics (SURVEY.md A10, the reference's
utils/logger.ts role).

Each actor holds a :class:`StageMetrics`; every batch records rows /
failures / wall-ms, and a structured JSON line goes to the
``extract_kit_ray.stages`` logger every ``emit_every`` batches (and can
be flushed explicitly).  Log lines land in the per-worker Ray logs —
greppable as JSON, one line per emission::

    {"stage": "extract", "pid": 123, "batches": 50, "rows": 3200,
     "failures": 4, "wall_ms": 8123.4, "rows_per_s": 394.1}

Cost discipline: a counter bump per batch and one JSON dump per
``emit_every`` batches — never per row, never a driver round-trip.
"""

from __future__ import annotations

import json
import logging
import os
import time

logger = logging.getLogger("extract_kit_ray.stages")


class StageMetrics:
    """Batch-granular stage metrics with periodic structured emission."""

    def __init__(self, stage: str, emit_every: int = 50):
        self.stage = stage
        self.emit_every = emit_every
        self.batches = 0
        self.rows = 0
        self.failures = 0
        self.wall_ms = 0.0
        self._t0: float | None = None

    def start_batch(self) -> None:
        self._t0 = time.perf_counter()

    def end_batch(self, n_rows: int, n_failures: int = 0) -> None:
        if self._t0 is not None:
            self.wall_ms += (time.perf_counter() - self._t0) * 1e3
            self._t0 = None
        self.batches += 1
        self.rows += n_rows
        self.failures += n_failures
        if self.emit_every and self.batches % self.emit_every == 0:
            self.emit()

    def snapshot(self) -> dict:
        secs = self.wall_ms / 1e3
        return {
            "stage": self.stage,
            "pid": os.getpid(),
            "batches": self.batches,
            "rows": self.rows,
            "failures": self.failures,
            "wall_ms": round(self.wall_ms, 1),
            "rows_per_s": round(self.rows / secs, 1) if secs > 0 else 0.0,
        }

    def emit(self) -> None:
        logger.info(json.dumps(self.snapshot(), sort_keys=True))
