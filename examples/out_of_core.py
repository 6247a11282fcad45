"""Out-of-core factorization under an HBM budget (reference
src/example + IPARM_OOC_LIMIT; src/sopalin/src/ooc.c pages coeftab
blocks DURING factorization).

The host pool is the backing store; the device holds one segment
window (plus chunked GEMM transients) at a time, so the max problem
size is bounded by host RAM instead of device memory.

Run: python examples/out_of_core.py
"""

import numpy as np

from pastix_tpu import Pastix, PastixConfig
from pastix_tpu.generators import poisson_3d


def main():
    A = poisson_3d(14)
    S = A.to_scipy()
    b = S @ np.ones(A.n)
    solver = Pastix(
        A, PastixConfig(tile_size=16, ooc=True, ooc_limit_mb=1, verbosity=1)
    )
    x = solver.solve(b)
    plan = solver._ooc_plan
    pool_mb = solver.layout.npool * solver.layout.T**2 * 4 / 2**20
    print(
        f"n={A.n} pool={pool_mb:.1f} MB streamed in "
        f"{len(plan.segments)} segments under a 1 MB window budget "
        f"(chunked transients: {plan.gemm_chunk} tiles)"
    )
    res = np.linalg.norm(S @ x - b) / np.linalg.norm(b)
    print(f"residual ||b-Ax||/||b|| = {res:.3e}")
    assert res < 1e-9


if __name__ == "__main__":
    main()
