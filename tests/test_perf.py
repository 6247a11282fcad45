"""Measured kernel performance model (reference src/perf — SURVEY.md §2 row 8)."""

import numpy as np

from pastix_tpu.perf import estimate_fact_time, measure_kernels, speed_of_light


def test_measure_kernels_shapes_and_rates():
    t = measure_kernels(16, 8)
    assert set(t) == {"potrf", "trsm", "gemm"}
    for k in t.values():
        assert k.seconds > 0 and k.gflops > 0
    # cached: second call returns the same object
    assert measure_kernels(16, 8) is t


def test_estimate_and_roofline():
    from pastix_tpu.config import PastixConfig
    from pastix_tpu.generators import laplacian_2d
    from pastix_tpu.pastix import Pastix

    s = Pastix(laplacian_2d(12), PastixConfig(tile_size=8))
    s.analyze()
    est = estimate_fact_time(s.layout)
    assert est > 0
    sol = speed_of_light(s.layout, measured_seconds=1.0, peak_gflops=100.0)
    assert sol["padded_gflops"] > 0
    assert 0 < sol["peak_fraction"] < 100


def _fake_cal(overhead, marginal):
    k = {"overhead_s": overhead, "marginal_s": marginal}
    return {"potrf": dict(k), "trsm": dict(k), "gemm": dict(k)}


def test_calibrated_thresholds_follow_measurement(monkeypatch, tmp_path):
    """The unroll/scan cut is DERIVED from the calibration: a machine with
    expensive per-call dispatch unrolls less eagerly than one with cheap
    dispatch (VERDICT r2 next #6: the model must consume)."""
    import json

    import pastix_tpu.perf as perf

    cache = tmp_path / "perf.json"
    monkeypatch.setattr(perf, "_DISK_CACHE", str(cache))
    cache.write_text(json.dumps({"cpu:16:float32": _fake_cal(1e-3, 1e-6)}))
    th = perf.calibrated_thresholds(16)
    assert th["unroll_gemm"] == 4000  # 4 x overhead/marginal
    assert th["unroll_diag"] == 2048  # clamped at the program-size cap

    cache.write_text(json.dumps({"cpu:16:float32": _fake_cal(1e-5, 1e-6)}))
    th2 = perf.calibrated_thresholds(16)
    assert th2["unroll_gemm"] == 512  # clamped at the compile-cost floor
    assert th2["unroll_gemm"] < th["unroll_gemm"]


def test_group_plan_consumes_calibration(monkeypatch, tmp_path):
    """group_plan's thresholds come from the measured calibration when no
    env override is set, and the env override still wins."""
    import json

    import pastix_tpu.perf as perf
    from pastix_tpu.numeric import grouping

    cache = tmp_path / "perf.json"
    monkeypatch.setattr(perf, "_DISK_CACHE", str(cache))
    cache.write_text(json.dumps({"cpu:16:float32": _fake_cal(1e-3, 1e-6)}))
    monkeypatch.delenv("PASTIX_UNROLL_GEMM", raising=False)
    monkeypatch.delenv("PASTIX_UNROLL_DIAG", raising=False)
    assert grouping.resolve_thresholds(16) == (4000, 2048)

    monkeypatch.setenv("PASTIX_UNROLL_GEMM", "777")
    assert grouping.resolve_thresholds(16)[0] == 777


def test_predicted_vs_measured_in_report(monkeypatch, tmp_path):
    """Pastix.factorize reports the perf-model prediction next to the
    measured time (the blend-simulator analog in SolveReport)."""
    import json

    import pastix_tpu.perf as perf
    from pastix_tpu.config import PastixConfig
    from pastix_tpu.generators import laplacian_2d
    from pastix_tpu.pastix import Pastix

    cache = tmp_path / "perf.json"
    monkeypatch.setattr(perf, "_DISK_CACHE", str(cache))
    cache.write_text(json.dumps({"cpu:8:float32": _fake_cal(1e-4, 1e-7)}))
    s = Pastix(laplacian_2d(12), PastixConfig(tile_size=8))
    s.factorize()
    assert s.report.predicted_fact_time > 0
