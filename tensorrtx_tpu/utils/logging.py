"""Structured logging + metrics — the logging.h ILogger analog.

The reference ships a 466-line TensorRT ILogger with severity filtering
copied into ~50 subprojects (lenet/logging.h). Here: one severity-filtered
logger plus an optional JSON metrics sink (images/sec, p50 latency) matching
the observability deliverable in SURVEY.md §5.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Optional

__all__ = ["get_logger", "MetricsSink"]

_FMT = "%(asctime)s [%(levelname).1s] %(name)s: %(message)s"


def get_logger(name: str = "tensorrtx_tpu", level: str = "INFO") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT, datefmt="%H:%M:%S"))
        logger.addHandler(h)
    logger.setLevel(getattr(logging, level.upper()))
    return logger


class MetricsSink:
    """Append-only JSONL metrics (one record per event)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None

    def emit(self, **fields):
        rec = {"ts": time.time(), **fields}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
