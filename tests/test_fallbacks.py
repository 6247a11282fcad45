"""The platform fallbacks must NOT fire on the CPU happy path.

The four remote-TPU degradation paths (pastix.py: dinv-compile,
fast-solve, dense-tail-solve, fused-refine) catch only runtime-layer
errors (_PLATFORM_ERRORS); a genuine shape/numeric bug must propagate,
and a healthy CPU run must take the primary paths (VERDICT r3 weak #6).
"""

import numpy as np
import pytest

from pastix_tpu import Pastix, PastixConfig
from pastix_tpu.config import Factorization
from pastix_tpu.generators import laplacian_2d, poisson_3d


@pytest.mark.parametrize("kind", [Factorization.LLT, Factorization.LDLT])
def test_no_fallback_fires_on_cpu(kind):
    A = poisson_3d(8)
    s = Pastix(A, PastixConfig(tile_size=16, factorization=kind))
    b = A.to_scipy() @ np.ones(A.n)
    x = s.solve(b)
    assert np.abs(x - 1).max() < 1e-8
    assert s.report.fallbacks == [], s.report.fallbacks
    # the primary (fast-solve / fused-refine) machinery stayed alive
    assert s._solve_fn_inv is not None


def test_platform_errors_exclude_bug_types():
    from pastix_tpu.pastix import _PLATFORM_ERRORS

    for exc in (ValueError("x"), TypeError("x"), FloatingPointError("x"),
                AssertionError("x"), KeyError("x")):
        assert not isinstance(exc, _PLATFORM_ERRORS), type(exc)
    import jax

    # the real failure modes ARE caught
    assert issubclass(jax.errors.JaxRuntimeError, _PLATFORM_ERRORS)
