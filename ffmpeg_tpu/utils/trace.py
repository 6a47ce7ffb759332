"""Per-stage decode timing (the VVC_THREAD_DEBUG / checkasm --bench
analog, reference vvc_thread.c:568-603).

Enable with FFMPEG_TPU_TRACE=1: the decoder records wall-clock spans
for each pipeline stage (host parse, input build/pack, device dispatch,
device execute, fetch) keyed by POC, and `summary()` aggregates them.
Zero overhead when disabled (module-level flag, no-op span).
"""
from __future__ import annotations

import os
import threading
import time
from collections import defaultdict
from contextlib import contextmanager

ENABLED = bool(os.environ.get("FFMPEG_TPU_TRACE"))

_lock = threading.Lock()
_spans: dict[str, list[float]] = defaultdict(list)
_meta: dict[str, list] = defaultdict(list)


@contextmanager
def span(stage: str):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _spans[stage].append(dt)


def note(key: str, value) -> None:
    """Record a non-timing observation (chunk counts, unit counts)."""
    if not ENABLED:
        return
    with _lock:
        _meta[key].append(value)


def reset() -> None:
    with _lock:
        _spans.clear()
        _meta.clear()


def summary() -> dict:
    """Aggregated stage stats: {stage: {n, total_ms, mean_ms, max_ms}}."""
    out = {}
    with _lock:
        for stage, ts in _spans.items():
            out[stage] = {
                "n": len(ts),
                "total_ms": round(sum(ts) * 1e3, 2),
                "mean_ms": round(sum(ts) / len(ts) * 1e3, 3),
                "max_ms": round(max(ts) * 1e3, 3),
            }
        for key, vals in _meta.items():
            if vals and isinstance(vals[0], (int, float)):
                out[key] = {
                    "n": len(vals),
                    "mean": round(sum(vals) / len(vals), 2),
                    "max": max(vals),
                }
            else:
                out[key] = vals[:16]
    return out


def report() -> str:
    lines = []
    for stage, st in sorted(summary().items()):
        lines.append(f"{stage:28s} {st}")
    return "\n".join(lines)
