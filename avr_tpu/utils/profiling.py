"""Profiling and memory observability.

The reference's only instrumentation is manual CUDA memory probes and
snapshot dumps (reference/avr_runner_memory_check.py:27-50,
renderer.py:5-10). The TPU build makes tracing first-class:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    a TensorBoard-loadable trace of device execution;
  * ``device_memory_stats()`` — live per-device HBM usage;
  * ``log_memory(tag)`` — the reference's log_gpu_memory equivalent;
  * ``memory_snapshot(path)`` — JSON dump of per-device stats + the
    largest live arrays (the memory_check runner's snapshot analog);
  * ``annotate(name)`` — named profiler span for phase attribution.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory stats in MB (empty dict entries if the backend
    does not expose them, e.g. CPU)."""
    out: Dict[str, Dict[str, float]] = {}
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out[str(d)] = {
            k: v / 1e6
            for k, v in s.items()
            if isinstance(v, (int, float)) and ("bytes" in k or "size" in k)
        }
    return out


def log_memory(tag: str = "", logger=None) -> str:
    """One-line device memory report (reference/renderer.py:5-10 analog)."""
    parts = []
    for dev, s in device_memory_stats().items():
        in_use = s.get("bytes_in_use", 0.0)
        peak = s.get("peak_bytes_in_use", 0.0)
        limit = s.get("bytes_limit", 0.0)
        parts.append(f"{dev}: in_use={in_use:.1f}MB peak={peak:.1f}MB limit={limit:.0f}MB")
    msg = f"[{tag}] " + "; ".join(parts) if parts else f"[{tag}] (no memory stats)"
    if logger is not None:
        logger.info(msg)
    return msg


def live_arrays_summary(top_k: int = 20):
    """Largest live device arrays: [(shape, dtype, MB)], descending."""
    rows = []
    for a in jax.live_arrays():
        try:
            rows.append((str(a.shape), str(a.dtype), a.nbytes / 1e6))
        except Exception:
            continue
    rows.sort(key=lambda r: -r[2])
    return rows[:top_k]


def memory_snapshot(path: Optional[str] = None) -> Dict:
    """JSON-able snapshot: per-device stats + biggest live arrays
    (reference/avr_runner_memory_check.py:33-40 analog)."""
    snap = {
        "ts": time.time(),
        "devices": device_memory_stats(),
        "largest_live_arrays": [
            {"shape": s, "dtype": d, "mb": round(mb, 2)}
            for s, d, mb in live_arrays_summary()
        ],
    }
    if path:
        with open(path, "w") as f:
            json.dump(snap, f, indent=2)
    return snap


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device-level profiler trace viewable in TensorBoard/
    Perfetto (replaces ad-hoc CUDA timing)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (works under jit via named_scope)."""
    return jax.profiler.TraceAnnotation(name)
