"""Native etree/postorder/colcounts/symbolic vs the Python reference
implementations — must agree bit-for-bit (same algorithms)."""

import importlib
import os

import numpy as np
import pytest

import pastix_tpu.native as N
from pastix_tpu.generators import laplacian_2d, poisson_3d, random_spd

E = importlib.import_module("pastix_tpu.order.etree")

pytestmark = pytest.mark.skipif(
    N.get_lib() is None, reason="no native toolchain"
)


def _python_only():
    os.environ["PASTIX_TPU_NO_NATIVE"] = "1"
    N._LIB = None
    N._TRIED = False


def _native_back():
    os.environ.pop("PASTIX_TPU_NO_NATIVE", None)
    N._LIB = None
    N._TRIED = False


@pytest.fixture(autouse=True)
def _restore():
    yield
    _native_back()


@pytest.mark.parametrize(
    "gen",
    [lambda: laplacian_2d(14), lambda: poisson_3d(8),
     lambda: random_spd(400, 0.02, 5)],
)
def test_etree_toolkit_matches_python(gen):
    A = gen()
    pat = A.pattern_sym_scipy()
    pn = E.etree(pat)
    postn = E.postorder(pn)
    cn = E.col_counts(pat, pn, postn)
    _python_only()
    pp = E.etree(pat)
    postp = E.postorder(pp)
    cp = E.col_counts(pat, pp, postp)
    assert np.array_equal(pn, pp)
    assert np.array_equal(postn, postp)
    assert np.array_equal(cn, cp)


def test_symbolic_matches_python():
    from pastix_tpu.config import PastixConfig
    from pastix_tpu.order import compute_ordering
    import pastix_tpu.symbolic.fax as F

    A = poisson_3d(9)
    o = compute_ordering(A.pattern_sym_scipy(), PastixConfig())
    pat = A.permuted(o.permtab).pattern_sym_scipy()
    s_nat = F.symbolic_factorization(pat, o.rangtab)
    _python_only()
    s_py = F.symbolic_factorization(pat, o.rangtab)
    assert np.array_equal(s_nat.blok_ptr, s_py.blok_ptr)
    assert np.array_equal(s_nat.blok_frownum, s_py.blok_frownum)
    assert np.array_equal(s_nat.blok_lrownum, s_py.blok_lrownum)
    assert np.array_equal(s_nat.blok_target, s_py.blok_target)
