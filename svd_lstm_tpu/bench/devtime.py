"""Device-time measurement via the JAX profiler.

Wall-clock timing is unusable on tunneled TPU backends: per-call dispatch
overhead (tens of ms) dwarfs device compute. This utility runs a function
under ``jax.profiler.trace`` and extracts the on-device executable duration
from the trace, which matches the hardware's actual busy time.

The reference's protocol (``time.perf_counter`` around ``model.predict``,
code/svd_acceleration_v3.py:147-152) measured exactly this quantity in
effect, since its per-step Python overhead WAS the compute.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from typing import Callable

import jax


_BIG_TRACE_BYTES = 64 * 1024 * 1024


def _trace_dir_events(trace_dir: str, full: bool = False):
    """Complete ('X') events of the newest trace file under ``trace_dir``.

    ``full=False`` (the measurement path) switches to a regex fast path on
    traces over 64 MB that keeps only the top-level ``jit_*`` executable
    events — enough for :func:`_device_exec_ms`, pathologically cheaper
    than a full json parse. Pass ``full=True`` when every event is needed
    (the ``bench.trace`` per-op breakdown), at full parse cost.
    """
    paths = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise RuntimeError(f"no trace produced under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        raw = f.read()
    if not full and len(raw) > _BIG_TRACE_BYTES:
        # Long scans emit per-iteration events; full json parse of multi-
        # hundred-MB traces is pathologically slow. Regex-scan only the
        # top-level executable events instead.
        import re

        # The gap between "name" and "dur" may contain a nested object
        # (e.g. "args":{...}); a plain [^}]*? cannot cross its closing
        # brace and would silently drop those events, under-reporting one
        # impl's device time. One level of {...} nesting is allowed; the
        # region still cannot escape the event's own closing brace.
        gap = rb'(?:[^{}]|\{[^{}]*\})*?'
        events = []
        for m in re.finditer(
            rb'"name"\s*:\s*"(jit_[^"]*)"' + gap + rb'"dur"\s*:\s*([0-9.]+)', raw
        ):
            events.append({"ph": "X", "name": m.group(1).decode(), "dur": float(m.group(2))})
        for m in re.finditer(
            rb'"dur"\s*:\s*([0-9.]+)' + gap + rb'"name"\s*:\s*"(jit_[^"]*)"', raw
        ):
            events.append({"ph": "X", "name": m.group(2).decode(), "dur": float(m.group(1))})
        if events:
            return events
    data = json.loads(raw)
    return [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]


def _device_exec_ms(events) -> float:
    """Sum durations of top-level device-executable events (jit_* / named
    module launches). Falls back to the longest single event below the
    trace-wrapper level."""
    total = 0.0
    for e in events:
        name = e.get("name", "")
        if name.startswith("jit_"):
            total += e.get("dur", 0) / 1000.0
    if total > 0:
        return total
    # fall back: longest non-python event
    cand = [
        e.get("dur", 0)
        for e in events
        if not str(e.get("name", "")).startswith("$")
        and "profiler" not in str(e.get("name", ""))
    ]
    return max(cand) / 1000.0 if cand else 0.0


def device_time_ms(fn: Callable, *args, warmup: int = 1, repeats: int = 3) -> float:
    """Best-of-``repeats`` on-device execution time of ``fn(*args)`` in ms.

    ``fn`` should be jitted; its output is blocked on inside the trace.
    Works on real TPU; on CPU the profiler reports host-side execution which
    is still usable for relative comparisons.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                jax.block_until_ready(fn(*args))
            ms = _device_exec_ms(_trace_dir_events(td))
        if 0 < ms < best:
            best = ms
    if best == float("inf"):
        raise RuntimeError("could not extract device time from traces")
    return best
