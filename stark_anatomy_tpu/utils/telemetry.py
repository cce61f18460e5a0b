"""Per-phase tracing/metrics for the proving pipeline.

The reference has no tracing/metrics subsystem — its only artifact is a
leftover dbg! transcript dump (SURVEY.md section 5.1, intentionally not
replicated). This is ours: nested wall-clock phase timers feeding
structured logs and the bench metrics.

Usage:
    from stark_anatomy_tpu.utils.telemetry import phase, report
    with phase("trace-lde"):
        ...
    report()  # -> {"trace-lde": {"seconds": ..., "calls": ...}, ...}

Logging is off by default; set STARK_ANATOMY_LOG=1 to emit one JSON line
per completed phase on stderr (greppable, machine-parsable). For deep
kernel-level profiles use jax.profiler around the same phases.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator

_state = threading.local()
_totals: Dict[str, Dict[str, float]] = defaultdict(lambda: {"seconds": 0.0, "calls": 0})
_lock = threading.Lock()


def _log_enabled() -> bool:
    return bool(os.environ.get("STARK_ANATOMY_LOG"))


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Time a pipeline phase; nests (dotted names show the stack)."""
    stack = getattr(_state, "stack", [])
    full = ".".join(stack + [name])
    _state.stack = stack + [name]
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _state.stack = stack
        with _lock:
            _totals[full]["seconds"] += dt
            _totals[full]["calls"] += 1
        if _log_enabled():
            print(
                json.dumps({"phase": full, "seconds": round(dt, 6)}),
                file=sys.stderr,
                flush=True,
            )


def report() -> Dict[str, Dict[str, float]]:
    """Accumulated per-phase totals since the last reset."""
    with _lock:
        return {k: dict(v) for k, v in _totals.items()}


def reset() -> None:
    with _lock:
        _totals.clear()
