"""Fill-quality gate: our ordering must stay within 1.5x of scipy's
minimum-degree fill on irregular matrices (SURVEY.md §7 M1 gate /
VERDICT r1 item 7).  The ND->AMD hybrid (native/ordering.cpp +
native/amd.cpp) is what passes this on expander-like graphs."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.linalg import splu

from pastix_tpu.config import OrderingMethod, PastixConfig
from pastix_tpu.generators import (
    elasticity_3d,
    helmholtz_2d,
    poisson_3d,
    random_spd,
)
from pastix_tpu.order import compute_ordering
from pastix_tpu.symbolic import compute_symbolic


def _nnz_l(A, order):
    pat = A.pattern_sym_scipy()
    P = sp.coo_matrix(pat)
    pp = sp.coo_matrix(
        (np.ones(P.nnz, bool), (order.permtab[P.row], order.permtab[P.col])),
        shape=pat.shape,
    ).tocsc()
    _, info = compute_symbolic(pp, order, PastixConfig())
    return info["nnz_l_exact"]


def _nnz_l_scipy(A):
    lu = splu(
        A.to_scipy().tocsc(), permc_spec="MMD_AT_PLUS_A",
        diag_pivot_thresh=0.0, options=dict(SymmetricMode=True),
    )
    return (lu.L.nnz + lu.U.nnz - A.n) // 2 + A.n


@pytest.mark.parametrize(
    "gen",
    [
        lambda: random_spd(2000, 0.005, seed=3),  # expander-like: AMD hybrid
        lambda: helmholtz_2d(40),
        lambda: poisson_3d(16),
        lambda: elasticity_3d(8),
    ],
    ids=["random_spd", "helmholtz_2d", "poisson_3d", "elasticity_3d"],
)
def test_nd_fill_within_gate(gen):
    A = gen()
    o = compute_ordering(A.pattern_sym_scipy(), PastixConfig())
    o.check()
    ratio = _nnz_l(A, o) / _nnz_l_scipy(A)
    assert ratio <= 1.5, f"fill {ratio:.2f}x exceeds the 1.5x gate"


def test_amd_matches_scipy_class():
    """The native AMD itself must be at scipy-MMD fill quality."""
    A = random_spd(2000, 0.005, seed=3)
    o = compute_ordering(
        A.pattern_sym_scipy(), PastixConfig(ordering=OrderingMethod.AMD)
    )
    o.check()
    ratio = _nnz_l(A, o) / _nnz_l_scipy(A)
    assert ratio <= 1.1, f"AMD fill {ratio:.2f}x vs scipy MMD"


def test_nd_fill_at_scale_irregular():
    """Ordering quality at BASELINE-rung-3 scale (0.3M-dof irregular FEM,
    dof_nbr=3): the multilevel ND must BEAT minimum-degree on 3D meshes
    (the reference uses Scotch ND for exactly this reason).  scipy-splu
    is too expensive at this size, so the in-house AMD (itself gated at
    scipy-MMD quality above) is the baseline.  VERDICT r2 next #4."""
    A = elasticity_3d(47)  # n = 311,469
    pat = A.pattern_sym_scipy()
    o_nd = compute_ordering(pat, PastixConfig())
    o_nd.check()
    o_amd = compute_ordering(
        pat, PastixConfig(ordering=OrderingMethod.AMD)
    )
    nd_fill = _nnz_l(A, o_nd)
    amd_fill = _nnz_l(A, o_amd)
    assert nd_fill < amd_fill, (
        f"ND fill {nd_fill:.3e} not better than AMD {amd_fill:.3e}"
    )
