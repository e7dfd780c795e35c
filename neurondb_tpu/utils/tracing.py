"""Tracing / profiling hooks — jax.profiler integration + span timing.

Reference: SURVEY.md §5 names jax.profiler/xprof as the TPU equivalent
of the reference's metrics-based observability (pg_stat_neurondb view,
DEBUG1 elogs, NeuronAgent's tracing module). This module provides:

- ``trace(name)``: context manager that is simultaneously a
  jax.profiler.TraceAnnotation (visible in xprof/tensorboard timelines)
  and a wall-clock span recorded in the process-local registry;
- ``start_profile(logdir)`` / ``stop_profile()``: whole-program xprof
  capture (jax.profiler.start_trace);
- ``annotate_fn(name)``: decorator variant for hot entry points;
- ``spans()`` / ``summary()``: per-span counts and latency stats that
  feed the Prometheus exporter alongside engine metrics.
"""

from __future__ import annotations

import contextlib
import functools
import threading
import time
from typing import Any, Callable, Dict, List, Optional

_lock = threading.Lock()
_spans: Dict[str, Dict[str, float]] = {}
_active_logdir: Optional[str] = None


def _record(name: str, seconds: float) -> None:
    with _lock:
        s = _spans.setdefault(name, {"count": 0, "total_s": 0.0,
                                     "max_s": 0.0})
        s["count"] += 1
        s["total_s"] += seconds
        s["max_s"] = max(s["max_s"], seconds)


@contextlib.contextmanager
def trace(name: str):
    """Wall-clock span + xprof TraceAnnotation (shows up on the TPU
    timeline when a profile is being captured)."""
    import jax.profiler
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        try:
            yield
        finally:
            _record(name, time.perf_counter() - t0)


def annotate_fn(name: Optional[str] = None) -> Callable:
    def deco(fn: Callable) -> Callable:
        label = name or f"{fn.__module__}.{fn.__qualname__}"

        @functools.wraps(fn)
        def wrapped(*a, **k):
            with trace(label):
                return fn(*a, **k)
        return wrapped
    return deco


def start_profile(logdir: str) -> None:
    """Begin an xprof capture (view with tensorboard / xprof)."""
    global _active_logdir
    import jax.profiler
    jax.profiler.start_trace(logdir)
    _active_logdir = logdir


def stop_profile() -> Optional[str]:
    global _active_logdir
    import jax.profiler
    jax.profiler.stop_trace()
    out, _active_logdir = _active_logdir, None
    return out


@contextlib.contextmanager
def profile(logdir: str):
    start_profile(logdir)
    try:
        yield
    finally:
        stop_profile()


def device_memory_profile(path: Optional[str] = None) -> bytes:
    """Snapshot device memory (jax.profiler.device_memory_profile);
    optionally saved to ``path`` (pprof format)."""
    import jax.profiler
    blob = jax.profiler.device_memory_profile()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def spans() -> Dict[str, Dict[str, float]]:
    with _lock:
        return {k: dict(v) for k, v in _spans.items()}


def summary() -> List[Dict[str, Any]]:
    out = []
    for name, s in sorted(spans().items()):
        avg = s["total_s"] / s["count"] if s["count"] else 0.0
        out.append({"span": name, "count": int(s["count"]),
                    "avg_ms": round(avg * 1e3, 3),
                    "max_ms": round(s["max_s"] * 1e3, 3),
                    "total_s": round(s["total_s"], 3)})
    return out


def reset() -> None:
    with _lock:
        _spans.clear()


def prometheus_text() -> str:
    """Span stats in Prometheus exposition format (joins the metrics
    exporter's output)."""
    lines = []
    for row in summary():
        base = row["span"].replace(".", "_").replace("-", "_")
        lines.append(f"ndb_span_count{{span=\"{row['span']}\"}} "
                     f"{row['count']}")
        lines.append(f"ndb_span_total_seconds{{span=\"{row['span']}\"}} "
                     f"{row['total_s']}")
        _ = base
    return "\n".join(lines) + ("\n" if lines else "")
