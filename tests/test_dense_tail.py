"""Dense terminal block (plan_dense_tail): the top-of-etree critical-path
optimization must be numerically equivalent to the per-tile-column chain."""

import numpy as np
import pytest

from pastix_tpu.config import PastixConfig, Factorization, RefinementMethod
from pastix_tpu.generators import poisson_3d, laplacian_2d
from pastix_tpu.pastix import Pastix


def _residual(A, x, b):
    As = A.to_scipy()
    return np.linalg.norm(b - As @ x) / np.linalg.norm(b)


def test_tail_detected_on_nd_poisson():
    A = poisson_3d(10)
    s = Pastix(A, PastixConfig(tile_size=16))
    s.analyze()
    assert s._dense_tail is not None, "ND top separators should be dense"
    dt = s._dense_tail
    assert dt.q >= 4
    assert dt.m == dt.q * s.layout.T
    # the filtered plan has strictly fewer levels than the raw chain
    assert len(dt.levels_lo) < len(s.layout.levels)
    # every tail tile exists and is a lower tile
    assert (dt.qi >= dt.qj).all()


def test_tail_matches_chain_numerically():
    A = poisson_3d(10)
    b = A.to_scipy() @ np.ones(A.n)
    x_on = Pastix(A, PastixConfig(tile_size=16, dense_tail=True)).solve(b)
    x_off = Pastix(A, PastixConfig(tile_size=16, dense_tail=False)).solve(b)
    assert _residual(A, x_on, b) < 1e-9
    assert _residual(A, x_off, b) < 1e-9
    np.testing.assert_allclose(x_on, x_off, rtol=1e-5, atol=1e-8)


def test_tail_factor_pool_matches_chain():
    """The scattered-back dense factor equals the tile-chain factor."""
    import jax.numpy as jnp

    A = laplacian_2d(24)
    # dense_tail_fill=0: keep the tile pattern identical to the chain path
    # (densify adds explicit-zero tiles, changing pool indexing)
    s_on = Pastix(
        A, PastixConfig(tile_size=16, dense_tail=True, dense_tail_fill=0.0)
    )
    s_off = Pastix(A, PastixConfig(tile_size=16, dense_tail=False))
    f_on = s_on.factorize()
    f_off = s_off.factorize()
    dt = s_on._dense_tail
    assert dt is not None
    p_on = np.asarray(f_on.pool)
    p_off = np.asarray(f_off.pool)
    # compare only the meaningful (lower-triangular per stored tile) values:
    # diag tiles' upper parts hold junk on the chain path, zeros on the tail
    tl = np.tril(np.ones((s_on.layout.T, s_on.layout.T), bool))
    diag = set(
        np.asarray(
            s_on.layout.lookup(
                np.arange(s_on.layout.nbc), np.arange(s_on.layout.nbc)
            )
        ).tolist()
    )
    for p in range(s_on.layout.npool):
        a, b_ = p_on[p], p_off[p]
        if p in diag:
            a, b_ = a[tl], b_[tl]
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=1e-5)


def test_tail_pattern_reuse():
    A = poisson_3d(8)
    As = A.to_scipy()
    s = Pastix(A, PastixConfig(tile_size=16))
    b = As @ np.arange(1.0, A.n + 1)
    x1 = s.solve(b)
    assert np.linalg.norm(b - As @ x1) / np.linalg.norm(b) < 1e-9
    # new values, same pattern (scaled matrix)
    s.factorize(A.values * 3.0)
    x2 = s.solve(b)
    assert np.linalg.norm(b - 3.0 * (As @ x2)) / np.linalg.norm(b) < 1e-9


def test_tail_disabled_for_non_llt():
    A = poisson_3d(8)
    s = Pastix(
        A, PastixConfig(tile_size=16, factorization=Factorization.LDLT)
    )
    s.analyze()
    assert s._dense_tail is None


def test_layout_check_invariants():
    """solver_check analog: the static plan passes its invariant checker
    in every mode, including the densified-tail pattern."""
    import numpy as np

    for cfg in (
        PastixConfig(tile_size=16),
        PastixConfig(tile_size=16, dense_tail=False),
        PastixConfig(tile_size=16, factorization=Factorization.LU),
        PastixConfig(tile_size=16, incomplete=True),
    ):
        s = Pastix(poisson_3d(8), cfg)
        s.analyze()
        s.layout.check()
    s2 = Pastix(laplacian_2d(16), PastixConfig(tile_size=16))
    s2.set_schur_unknowns(np.arange(240, 256))
    s2.analyze()
    s2.layout.check()


def test_tail_respects_min_q():
    from pastix_tpu.analyze.layout import plan_dense_tail

    A = laplacian_2d(12)
    s = Pastix(A, PastixConfig(tile_size=16))
    s.analyze()
    assert plan_dense_tail(s.layout, min_q=10**6) is None


def test_dense_tail_solve_falls_back_to_level_sweeps():
    """If the dense-tail solve program fails (HBM OOM on hardware), the
    classic per-level sweeps through the tail columns take over — the
    factor lives in the pool tiles either way."""
    import numpy as np

    from pastix_tpu import Pastix, PastixConfig
    from pastix_tpu.generators import poisson_3d

    A = poisson_3d(10)
    # classic-sweep path only (no fast-solve inverse, no fused refine)
    s = Pastix(
        A, PastixConfig(tile_size=8, fast_solve=False, device_refine=False)
    )
    s.factorize()
    assert s._dense_tail is not None

    def boom(*a, **k):
        raise RuntimeError("simulated remote-compile OOM")

    s._solve_fn = boom
    b = A.to_scipy() @ np.ones(A.n)
    x = s.solve(b)
    assert getattr(s, "_dense_tail_solve_off", False)
    assert np.abs(x - 1).max() < 1e-8
