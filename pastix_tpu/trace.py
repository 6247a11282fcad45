"""Execution tracing — the TRACE_SOPALIN analog.

The reference emits per-task (begin, end, thread, type, cblk) records to a
Paje trace for the ViTE viewer (``src/sopalin/src/trace.c`` — SURVEY.md
section 2 row 23).  Here the equivalents are:

  * :class:`Tracer` — phase/level event records dumped as Chrome
    trace-event JSON (open in ui.perfetto.dev or chrome://tracing);
  * :func:`profile_device` — context manager around ``jax.profiler`` for
    full XLA-level traces when running on real hardware.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class TraceEvent:
    name: str
    t0: float  # seconds since tracer epoch
    t1: float
    track: str = "host"
    args: dict = field(default_factory=dict)


class Tracer:
    """Collects phase/kernel spans; dumps perfetto-compatible JSON."""

    def __init__(self):
        self.epoch = time.perf_counter()
        self.events: list[TraceEvent] = []

    @contextlib.contextmanager
    def span(self, name: str, track: str = "host", **args):
        t0 = time.perf_counter() - self.epoch
        try:
            yield
        finally:
            t1 = time.perf_counter() - self.epoch
            self.events.append(TraceEvent(name, t0, t1, track, dict(args)))

    def record(self, name: str, t0: float, t1: float, track="host", **args):
        self.events.append(TraceEvent(name, t0, t1, track, dict(args)))

    def dump(self, path: str) -> None:
        """Write Chrome trace-event format (displayTimeUnit ms)."""
        tracks = {t: i + 1 for i, t in enumerate(
            dict.fromkeys(e.track for e in self.events)
        )}
        out = {
            "displayTimeUnit": "ms",
            "traceEvents": [
                {
                    "name": e.name,
                    "ph": "X",
                    "ts": e.t0 * 1e6,
                    "dur": (e.t1 - e.t0) * 1e6,
                    "pid": 1,
                    "tid": tracks[e.track],
                    "args": e.args,
                }
                for e in self.events
            ]
            + [
                {
                    "name": "thread_name",
                    "ph": "M",
                    "pid": 1,
                    "tid": tid,
                    "args": {"name": tname},
                }
                for tname, tid in tracks.items()
            ],
        }
        with open(path, "w") as f:
            json.dump(out, f)

    def summary(self) -> str:
        lines = []
        for e in self.events:
            lines.append(
                f"{e.track:>8} {1e3 * e.t0:10.2f}ms +{1e3 * (e.t1 - e.t0):8.2f}ms  {e.name}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def profile_device(logdir: str):
    """jax.profiler trace around a region (view in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
