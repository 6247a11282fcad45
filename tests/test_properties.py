"""Property tests (SURVEY.md section 4d): permutation round-trips, symbolic
pattern coverage vs the exact scipy-computed factor pattern, random SPD."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.linalg import splu

import pastix_tpu
from pastix_tpu.config import PastixConfig
from pastix_tpu.generators import laplacian_2d, poisson_3d, random_spd
from pastix_tpu.order import compute_ordering


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_permutation_roundtrip(seed, rng):
    A = random_spd(150, density=0.04, seed=seed)
    o = compute_ordering(A.pattern_sym_scipy(), PastixConfig())
    Ap = A.permuted(o.permtab)
    # permute back: peritab inverts permtab
    back = Ap.permuted(o.peritab)
    d = (back.to_scipy() - A.to_scipy()).tocoo()
    assert d.nnz == 0 or abs(d.data).max() < 1e-14


@pytest.mark.parametrize(
    "gen", [lambda: laplacian_2d(10), lambda: poisson_3d(6),
            lambda: random_spd(120, 0.05, 9)]
)
def test_tile_pattern_covers_exact_factor_pattern(gen):
    """The tile-quotient symbolic pattern must be a superset of the exact
    scalar L pattern (no dropped fill => exact factorization)."""
    from pastix_tpu.analyze.blocksym import tile_symbolic

    A = gen()
    o = compute_ordering(A.pattern_sym_scipy(), PastixConfig())
    Ap = A.permuted(o.permtab).to_scipy().tocsc()
    n = Ap.shape[0]
    # exact L pattern from an unpivoted scipy LU on the permuted matrix
    lu = splu(
        Ap.astype(np.float64),
        permc_spec="NATURAL",
        diag_pivot_thresh=0.0,
        options={"SymmetricMode": True},
    )
    Lpat = sp.coo_matrix(abs(lu.L) > 0)
    T = 4
    br, bc, _, nbc = tile_symbolic(
        (abs(Ap) + abs(Ap).T + sp.eye(n)).astype(bool).tocsc(), T
    )
    tiles = set(zip(br.tolist(), bc.tolist()))
    need = set(
        zip((Lpat.row // T).tolist(), (Lpat.col // T).tolist())
    )
    missing = {t for t in need if t not in tiles}
    assert not missing, f"symbolic dropped tiles: {sorted(missing)[:5]}"


@pytest.mark.parametrize("seed", [3, 7])
def test_random_spd_solve(seed):
    A = random_spd(300, density=0.02, seed=seed)
    S = A.to_scipy()
    b = S @ np.ones(A.n)
    x = pastix_tpu.spsolve(S, b)
    assert np.linalg.norm(b - S @ x) / np.linalg.norm(b) < 1e-9
