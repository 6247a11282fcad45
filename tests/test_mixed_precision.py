"""Mixed-precision factorization (BASELINE config 5: bf16 trailing updates
+ fp32 panels + fp64 residual accumulation — SURVEY.md section 2 row 14)."""

import numpy as np
import pytest

import pastix_tpu
from pastix_tpu.config import Factorization, PastixConfig
from pastix_tpu.generators import laplacian_2d, poisson_3d


def test_bf16_updates_reach_reference_residual():
    A = poisson_3d(10)
    b = A.to_scipy() @ np.ones(A.n)
    s = pastix_tpu.Pastix(
        A, PastixConfig(update_dtype="bfloat16", refinement_eps=1e-10)
    )
    x = s.solve(b)
    assert s.report.residual < 1e-10
    assert np.abs(x - 1).max() < 1e-8
    # bf16 factors are coarser: refinement must genuinely iterate
    assert s.report.refine_iters >= 1


def test_bf16_ldlt():
    A = laplacian_2d(16)
    b = A.to_scipy() @ np.ones(A.n)
    s = pastix_tpu.Pastix(
        A,
        PastixConfig(
            factorization=Factorization.LDLT,
            update_dtype="bfloat16",
            refinement_eps=1e-10,
        ),
    )
    x = s.solve(b)
    assert s.report.residual < 1e-10


def test_fp32_vs_bf16_factor_gap():
    """Raw (unrefined) bf16-update factors are less accurate than fp32 —
    sanity that the knob actually changes the compute path."""
    A = laplacian_2d(16)
    b = A.to_scipy() @ np.ones(A.n)
    r = {}
    for upd in (None, "bfloat16"):
        s = pastix_tpu.Pastix(A, PastixConfig(update_dtype=upd))
        x = s.solve(b, refine=False)
        r[upd] = np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b)
    assert r["bfloat16"] > r[None]  # coarser
    assert r["bfloat16"] < 1e-1  # but not garbage
