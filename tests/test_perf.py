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
