"""Multiple independent solver instances (reference reentrant.c).

Two Pastix instances with different matrices/configs coexist; each keeps
its own cached analysis and factors (pastix_data_t instances don't share
state), including use from worker threads.
"""

import sys
import threading

import numpy as np

from pastix_tpu import Pastix, PastixConfig, Factorization
from pastix_tpu.generators import laplacian_2d, poisson_3d


def run(A, cfg, out, key):
    S = A.to_scipy()
    b = S @ np.ones(A.n)
    x = Pastix(A, cfg).solve(b)
    out[key] = np.linalg.norm(b - S @ x) / np.linalg.norm(b)


def main():
    jobs = {
        "llt-2d": (laplacian_2d(24), PastixConfig()),
        "ldlt-3d": (poisson_3d(8), PastixConfig(factorization=Factorization.LDLT)),
    }
    out = {}
    threads = [
        threading.Thread(target=run, args=(A, cfg, out, k))
        for k, (A, cfg) in jobs.items()
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    ok = True
    for k, r in out.items():
        print(f"{k}: residual {r:.3e}")
        ok &= r < 1e-8
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
