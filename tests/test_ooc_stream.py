"""Streaming out-of-core factorization: the device window stays under the
configured HBM budget while the host pool is the backing store (reference
src/sopalin/src/ooc.c pages DURING factorization under IPARM_OOC_LIMIT —
SURVEY.md §2 row 15; VERDICT r1 item 6)."""

import numpy as np
import pytest

import pastix_tpu
from pastix_tpu import Pastix, PastixConfig
from pastix_tpu.generators import poisson_3d


def _solver(limit_mb):
    A = poisson_3d(14)  # pool ~2 MB at T=16: several segments at 1 MB
    return A, Pastix(
        A,
        PastixConfig(tile_size=16, ooc=True, ooc_limit_mb=limit_mb),
    )


def test_ooc_stream_segments_under_budget():
    A, s = _solver(1)
    s.analyze()
    plan = s._ooc_plan
    assert plan is not None and len(plan.segments) > 1
    T = s.layout.T
    budget_tiles = plan.budget_tiles
    for seg in plan.segments:
        # the greedy floor: a single level may exceed the budget alone,
        # but any multi-level segment must fit
        if len(seg.tables) > 1:
            assert seg.footprint_tiles() <= budget_tiles
    # the whole pool genuinely exceeds the budget (the point of the test)
    assert s.layout.npool > budget_tiles


def test_ooc_stream_factor_solve_matches_resident():
    A, s = _solver(1)
    b = A.to_scipy() @ np.ones(A.n)
    x = s.solve(b)
    assert s._ooc_plan is not None
    assert getattr(s.factors, "_streamed", False)
    # the factor pool lives on the host, not the device
    assert isinstance(s.factors.pool, np.ndarray)
    assert np.abs(x - 1).max() < 1e-8

    x_ref = Pastix(A, PastixConfig(tile_size=16)).solve(b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-8)


def test_ooc_stream_pattern_reuse():
    A, s = _solver(1)
    S = A.to_scipy()
    b = S @ np.ones(A.n)
    x = s.solve(b)
    assert np.abs(x - 1).max() < 1e-8
    s.factorize(values=A.values * 3.0)
    x2 = s.solve(b)
    assert np.abs(x2 - 1.0 / 3.0).max() < 1e-8


def test_ooc_small_pool_stays_resident():
    A, s = _solver(4096)  # budget far above the pool size
    s.analyze()
    assert s._ooc_plan is None  # fits: keep the resident fast path


def test_ooc_sufficient_budget_keeps_dense_tail():
    """ooc=True with a budget the pool FITS must not silently lose the
    dense-tail optimization (VERDICT r2 weak #7): the resident reset
    rebuilds the densified layout and the solve still verifies."""
    A = poisson_3d(14)
    resident = Pastix(A, PastixConfig(tile_size=16))
    resident.analyze()
    assert resident._dense_tail is not None  # tail active by default

    s = Pastix(A, PastixConfig(tile_size=16, ooc=True, ooc_limit_mb=4096))
    s.analyze()
    assert s._ooc_plan is None  # fits: resident
    assert s._dense_tail is not None  # ...and the tail came back
    assert s._dense_tail.m == resident._dense_tail.m
    b = A.to_scipy() @ np.ones(A.n)
    x = s.solve(b)
    assert np.abs(x - 1).max() < 1e-8


def test_ooc_stream_lu_matches_resident():
    """LU streams under an artificially small budget: two windows (L, Ut)
    per segment with separate export accumulators (VERDICT r2 missing #4;
    reference ooc.c pages all factorization kinds)."""
    from pastix_tpu.config import Factorization
    from pastix_tpu.generators import random_unsym

    A = random_unsym(800, density=0.02, seed=5)  # 2.5 MB of LU pools
    S = A.to_scipy()
    rng = np.random.default_rng(0)
    B = S @ rng.standard_normal((A.n, 3))
    s = Pastix(
        A,
        PastixConfig(
            tile_size=16, ooc=True, ooc_limit_mb=1,
            factorization=Factorization.LU,
        ),
    )
    X = s.solve(B)
    assert s._ooc_plan is not None and s._ooc_plan.two_pools
    assert len(s._ooc_plan.segments) > 1
    assert getattr(s.factors, "_streamed", False)
    assert s.factors.pool_u is not None
    res = np.linalg.norm(S @ X - B) / np.linalg.norm(B)
    assert res < 1e-8

    X_ref = Pastix(
        A, PastixConfig(tile_size=16, factorization=Factorization.LU)
    ).solve(B)
    np.testing.assert_allclose(X, X_ref, rtol=1e-5, atol=1e-7)


def test_ooc_transient_budget_accounting():
    """The plan's peak footprint INCLUDING the chunked GEMM/TRSM transient
    stays within the budget (VERDICT r2 missing #4: segment programs must
    not transiently exceed the limit the plan enforces)."""
    A, s = _solver(1)
    s.analyze()
    plan = s._ooc_plan
    assert plan.gemm_chunk > 0
    total_tiles = (1 * 1024 * 1024) // (16 * 16 * 4)
    # windows+exports were sized to (1-transient_frac) x budget; the
    # 4-tiles-per-chunk-element transient fills the reservation.  The
    # greedy floor (a single level alone over budget) is exempt, as in
    # test_ooc_stream_segments_under_budget.
    for seg in plan.segments:
        if len(seg.tables) > 1:
            assert seg.footprint_tiles() + 4 * plan.gemm_chunk <= total_tiles
    assert plan.budget_tiles + 4 * plan.gemm_chunk <= total_tiles


def test_ooc_stream_ldlt_matches_resident():
    """LDL^T streams too: d pivots and the pivot counter ride along as
    resident arrays (reference ooc.c is factorization-kind agnostic)."""
    from pastix_tpu.config import Factorization

    A = poisson_3d(14)
    S = A.to_scipy()
    b = S @ np.ones(A.n)
    s = Pastix(
        A,
        PastixConfig(
            tile_size=16, ooc=True, ooc_limit_mb=1,
            factorization=Factorization.LDLT,
        ),
    )
    x = s.solve(b)
    assert s._ooc_plan is not None
    assert getattr(s.factors, "_streamed", False)
    assert s.factors.d is not None
    assert np.abs(x - 1).max() < 1e-8

    x_ref = Pastix(
        A, PastixConfig(tile_size=16, factorization=Factorization.LDLT)
    ).solve(b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-8)


def test_auto_ooc_rescue(monkeypatch):
    """A pool beyond the HBM budget streams automatically (no
    IPARM_OOC_LIMIT needed) instead of OOMing at factorize — the
    accelerator guard is forced for the CPU test."""
    monkeypatch.setenv("PASTIX_FORCE_AUTO_OOC", "1")
    monkeypatch.setenv("PASTIX_HBM_GB", "0.001")  # ~1 MiB
    A = poisson_3d(14)
    s = Pastix(A, PastixConfig(tile_size=16))
    b = A.to_scipy() @ np.ones(A.n)
    x = s.solve(b)
    assert s._ooc_plan is not None
    assert len(s._ooc_plan.segments) > 1
    assert getattr(s.factors, "_streamed", False)
    assert np.abs(x - 1).max() < 1e-8


def test_plan_ooc_splits_oversized_levels():
    """A level whose tiles alone exceed the budget is split into
    column-subset sub-levels instead of emitting an over-budget window
    (found at the 10M rung: one level's window reached 60 GiB)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pastix_tpu.generators import poisson_3d
    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig
    from pastix_tpu.numeric.ooc import plan_ooc

    A = poisson_3d(12)
    s = Pastix(A, PastixConfig(tile_size=16, dense_tail=False))
    s.order(); s.symbfact(); s.analyze()
    lay = s.layout
    # tiny budget: forces splitting of the widest (leaf) levels
    tile_b = 16 * 16 * 4
    budget = 64 * tile_b
    plan = plan_ooc(lay, budget, dtype_bytes=4)
    mf = plan.max_footprint_tiles()
    widest = max(
        np.diff(np.searchsorted(lay.blk_col, np.arange(lay.nbc + 1)))[
            lv.cols
        ].sum()
        for lv in lay.levels
    )
    # the max window no longer scales with the widest level
    assert mf < widest or widest <= 64, (mf, widest)
    # every column appears exactly once across all segment tables
    seen = np.concatenate(
        [t["cols"] for seg in plan.segments for t in seg.tables]
    )
    assert np.array_equal(np.sort(seen), np.arange(lay.nbc))


def test_streamed_solve_host_branch(monkeypatch):
    """The host-CPU streamed-solve branch (factors are host-resident
    after streaming; re-streaming windows per refinement iteration made
    the device path transfer-dominated — a 40-minute 80^3 solve on the
    tunnel, round 4) produces the same answer."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pastix_tpu.generators import poisson_3d
    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig

    monkeypatch.setenv("PASTIX_FORCE_AUTO_OOC", "1")
    monkeypatch.setenv("PASTIX_HBM_GB", "0.0005")
    monkeypatch.setenv("PASTIX_OOC_HOST_SOLVE", "force")
    A = poisson_3d(12)
    s = Pastix(A, PastixConfig(tile_size=16))
    b = A.to_scipy() @ np.ones(A.n)
    x = s.solve(b)
    assert s._ooc_plan is not None and len(s._ooc_plan.segments) >= 2
    assert np.abs(x - 1).max() < 1e-8
