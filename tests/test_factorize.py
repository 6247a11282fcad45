"""Numeric factorization tests: residual exactness in fp64 on all three
factorization kinds (the reference's residual-threshold acceptance model,
SURVEY.md §4 point 4)."""

import numpy as np
import pytest
import scipy.sparse as sp

from pastix_tpu import generators as gen
from pastix_tpu.config import PastixConfig, Factorization
from pastix_tpu.order import compute_ordering
from pastix_tpu.analyze import build_layout
from pastix_tpu.numeric import factorize
from pastix_tpu.solve import solve


def _pipeline(A, kind, T=16, dtype=np.float64):
    cfg = PastixConfig(factorization=kind)
    o = compute_ordering(A.pattern_sym_scipy(), cfg)
    Ap = A.permuted(o.permtab)
    layout = build_layout(
        Ap.pattern_sym_scipy(), T, for_lu=(kind == Factorization.LU)
    )
    F = factorize(layout, Ap.to_scipy(), kind, dtype=dtype)
    return o, layout, F


def _residual(A, o, F, rng, nrhs=1):
    x_true = rng.standard_normal((A.n, nrhs)) if nrhs > 1 else rng.standard_normal(A.n)
    S = A.to_scipy()
    b = S @ x_true
    xp = solve(F, b[o.peritab])
    x = np.empty_like(xp)
    x[o.peritab] = xp
    return np.linalg.norm(b - S @ x) / np.linalg.norm(b)


@pytest.mark.parametrize("T", [8, 16, 32])
def test_llt_exact_fp64(rng, T):
    A = gen.laplacian_2d(20)
    o, layout, F = _pipeline(A, Factorization.LLT, T=T)
    assert _residual(A, o, F, rng) < 1e-13


def test_llt_fp32(rng):
    A = gen.laplacian_2d(24)
    o, layout, F = _pipeline(A, Factorization.LLT, dtype=np.float32)
    assert _residual(A, o, F, rng) < 1e-5


def test_llt_poisson3d(rng):
    A = gen.poisson_3d(6)
    o, layout, F = _pipeline(A, Factorization.LLT)
    assert _residual(A, o, F, rng) < 1e-13


def test_ldlt_spd_and_indefinite(rng):
    A = gen.laplacian_2d(16)
    o, layout, F = _pipeline(A, Factorization.LDLT)
    assert _residual(A, o, F, rng) < 1e-13
    # indefinite shift
    from pastix_tpu.sparse import SparseMatrix

    Ai = SparseMatrix.from_scipy(
        (A.to_scipy() - 1.37 * sp.eye(A.n)).tocsc(), symmetric_storage=True
    )
    o2, l2, F2 = _pipeline(Ai, Factorization.LDLT)
    assert _residual(Ai, o2, F2, rng) < 1e-10


def test_lu_unsymmetric(rng):
    A = gen.random_unsym(300, density=0.02, seed=3)
    o, layout, F = _pipeline(A, Factorization.LU)
    assert _residual(A, o, F, rng) < 1e-12


def test_multiple_rhs(rng):
    A = gen.laplacian_2d(12)
    o, layout, F = _pipeline(A, Factorization.LLT)
    assert _residual(A, o, F, rng, nrhs=5) < 1e-13


def test_static_pivoting_counts(rng):
    """A matrix with a tiny pivot must be rescued by clamping (the
    IPARM_STATIC_PIVOTING contract)."""
    n = 64
    d = np.ones(n)
    d[10] = 1e-30  # would break unpivoted LU
    A_ = sp.diags(d).tocsc() + sp.random(n, n, 0.05, random_state=7, format="csc") * 0.1
    from pastix_tpu.sparse import SparseMatrix

    A = SparseMatrix.from_scipy(A_, symmetric_storage=False)
    cfg = PastixConfig(factorization=Factorization.LU)
    o = compute_ordering(A.pattern_sym_scipy(), cfg)
    Ap = A.permuted(o.permtab)
    layout = build_layout(Ap.pattern_sym_scipy(), 16, for_lu=True)
    F = factorize(layout, Ap.to_scipy(), Factorization.LU,
                  dtype=np.float64, pivot_threshold=1e-10)
    assert F.n_static_pivots >= 1
    # factorization stays finite
    assert np.isfinite(np.asarray(F.pool)).all()


def test_pattern_closure_property():
    """Tile pattern must be closed under right-looking updates: every gemm
    target exists in the pool (layout build would KeyError otherwise)."""
    A = gen.random_spd(200, 0.03, seed=5)
    o = compute_ordering(A.pattern_sym_scipy())
    Ap = A.permuted(o.permtab)
    layout = build_layout(Ap.pattern_sym_scipy(), 16)
    total = sum(lv.gemm_a.size for lv in layout.levels)
    assert total > 0
    for lv in layout.levels:
        assert np.all(lv.gemm_d < layout.npool)


def test_llt_breakdown_raises_clear_error():
    """Indefinite matrix under LL^T must fail loudly, not return NaNs
    (the reference contract: LLT assumes SPD; LDLT/LU clamp pivots)."""
    import pastix_tpu
    from pastix_tpu.generators import laplacian_2d

    A = laplacian_2d(10).to_scipy().tolil()
    A[5, 5] = -4.0
    A = A.tocsc()
    b = A @ np.ones(A.shape[0])
    with pytest.raises(FloatingPointError, match="not positive definite"):
        pastix_tpu.spsolve(A, b)


def test_fast_solve_matches_classic():
    """Inverse-diag fast solve == triangular-solve path (same plan)."""
    import pastix_tpu
    from pastix_tpu.generators import poisson_3d

    A = poisson_3d(8)
    b = A.to_scipy() @ np.ones(A.n)
    xs = {}
    for fast in (False, True):
        s = pastix_tpu.Pastix(A, PastixConfig(fast_solve=fast))
        xs[fast] = s.solve(b, refine=False)
    np.testing.assert_allclose(xs[True], xs[False], rtol=1e-4, atol=1e-5)
    # and LU
    from pastix_tpu.generators import random_unsym

    B = random_unsym(150, density=0.05, seed=3)
    bb = B.to_scipy() @ np.ones(B.n)
    for fast in (False, True):
        s = pastix_tpu.Pastix(
            B, PastixConfig(factorization=Factorization.LU, fast_solve=fast)
        )
        xs[fast] = s.solve(bb, refine=False)
    np.testing.assert_allclose(xs[True], xs[False], rtol=1e-4, atol=1e-5)


def test_device_coefinit_matches_host():
    """build_coefinit_fn (device scatter) == coefinit (host) bit-for-bit,
    LLT and LU pools."""
    import scipy.sparse as sp
    from pastix_tpu.generators import laplacian_2d
    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig, Factorization
    from pastix_tpu.numeric.factorize import build_coefinit_fn, coefinit
    import jax.numpy as jnp

    for kind in (Factorization.LLT, Factorization.LU):
        A = laplacian_2d(13).to_scipy()
        solver = Pastix(A, PastixConfig(tile_size=16, factorization=kind))
        solver.analyze()
        lay, Ap = solver.layout, solver._A_perm
        for_lu = kind == Factorization.LU
        pool_h, pool_u_h = coefinit(lay, Ap, dtype=np.float32, for_lu=for_lu)
        fn = build_coefinit_fn(lay, Ap, dtype=np.float32, for_lu=for_lu)
        vals = jnp.asarray(sp.coo_matrix(Ap).data.astype(np.float32))
        if for_lu:
            pool_d, pool_u_d = fn(vals)
            np.testing.assert_array_equal(np.asarray(pool_u_d), pool_u_h)
        else:
            pool_d = fn(vals)
        np.testing.assert_array_equal(np.asarray(pool_d), pool_h)


def test_gemm_scatter_chunked_matches_unchunked():
    """The HBM-bounding chunk scan (PASTIX_GEMM_CHUNK) is exact: same
    result as one unchunked batch, duplicates accumulated identically."""
    import jax.numpy as jnp

    from pastix_tpu.numeric import kernels as K

    rng = np.random.default_rng(0)
    npool, T, ng = 12, 8, 29
    pool = jnp.asarray(rng.standard_normal((npool, T, T)).astype(np.float32))
    # operands and targets must be disjoint tile sets, as in a real level
    # (the layout causality invariant: a level's GEMM targets live in
    # later columns than its operands) — chunks sequentially scatter, so
    # an operand that is also a target would read partial updates
    ga = jnp.asarray(rng.integers(0, 6, ng).astype(np.int32))
    gb = jnp.asarray(rng.integers(0, 6, ng).astype(np.int32))
    gd = jnp.asarray(rng.integers(6, npool, ng).astype(np.int32))
    sc = jnp.asarray(rng.standard_normal((ng, T)).astype(np.float32))
    ref = K.gemm_scatter(pool, ga, gb, gd, scale_cols=sc, chunk=0)
    out = K.gemm_scatter(pool, ga, gb, gd, scale_cols=sc, chunk=7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    ref2 = K.gemm_scatter_ab(pool, pool, pool, ga, gb, gd, chunk=0)
    out2 = K.gemm_scatter_ab(pool, pool, pool, ga, gb, gd, chunk=4)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)
