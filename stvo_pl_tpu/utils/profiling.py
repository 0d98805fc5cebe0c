"""Structured tracing / profiling (SURVEY.md §5: the reference has only a
manual chrono Timer printed to stdout, src/timer.cpp:31-50).

Provides (a) the same simple wall-clock scope timer, (b) jax.profiler trace
capture, and (c) an xplane parser that ranks device ops by total time — the
tool used to drive this framework's own optimization.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timer:
    """Reference-equivalent scope timer (ms)."""

    def __init__(self):
        self._t0 = None
        self.ms = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        self.ms = (time.perf_counter() - self._t0) * 1e3
        return self.ms

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *a):
        self.stop()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace around a block."""
    import jax
    with jax.profiler.trace(logdir):
        yield


def summarize_trace(logdir: str, top: int = 25):
    """Parse the newest xplane.pb under logdir; return [(op, total_ms,
    count)] sorted by total device time.  Needs tensorflow's xplane proto
    (set PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if protobuf is
    strict)."""
    import glob
    import os
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for p in xs.planes:
        if "TPU" in p.name or "device" in p.name.lower():
            tot = defaultdict(float)
            cnt = defaultdict(int)
            for line in p.lines:
                for ev in line.events:
                    name = p.event_metadata[ev.metadata_id].name
                    tot[name] += ev.duration_ps / 1e9
                    cnt[name] += 1
            items = sorted(tot.items(), key=lambda kv: -kv[1])[:top]
            return [(name, ms, cnt[name]) for name, ms in items]
    return []
