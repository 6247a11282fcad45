"""Tracing subsystem (reference trace.c / TRACE_SOPALIN — SURVEY.md §2 row 23)."""

import json

import numpy as np

import pastix_tpu
from pastix_tpu.config import PastixConfig
from pastix_tpu.generators import laplacian_2d
from pastix_tpu.trace import Tracer


def test_phase_trace_dump(tmp_path):
    A = laplacian_2d(10)
    s = pastix_tpu.Pastix(A, PastixConfig(trace=True))
    b = A.to_scipy() @ np.ones(A.n)
    x = s.solve(b)
    assert np.abs(x - 1).max() < 1e-8
    p = str(tmp_path / "trace.json")
    s.dump_trace(p)
    d = json.load(open(p))
    names = {e["name"] for e in d["traceEvents"] if e["ph"] == "X"}
    assert {"order", "symbfact", "analyze", "numfact", "solve", "refine"} <= names
    # spans are well-formed
    for e in d["traceEvents"]:
        if e["ph"] == "X":
            assert e["dur"] >= 0


def test_tracer_span_and_summary():
    t = Tracer()
    with t.span("work", track="kernels", size=7):
        pass
    assert len(t.events) == 1
    assert t.events[0].args == {"size": 7}
    assert "work" in t.summary()


def test_trace_disabled_raises():
    A = laplacian_2d(6)
    s = pastix_tpu.Pastix(A)
    try:
        s.dump_trace("/tmp/x.json")
        assert False
    except ValueError:
        pass
