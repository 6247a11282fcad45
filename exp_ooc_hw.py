"""Hardware: end-to-end streamed (auto-OOC) factor + solve residual.

VERDICT r4 item 6: the beyond-HBM auto-OOC rescue's end-to-end
correctness rested on CPU tests after r3's session budget ran out.  This
forces the streamed path cheaply by lowering PASTIX_HBM_GB below the pool
size and measures the refined residual on the real chip.

Run on TPU: PASTIX_HBM_GB=3 python exp_ooc_hw.py [nx]
"""
import os
import sys
import time

import numpy as np

cache = "/root/.cache/pastix_jax"
import jax
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 80

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig

A = poisson_3d(nx)
print(f"n={A.n} HBM budget={os.environ.get('PASTIX_HBM_GB', '13')} GiB",
      flush=True)
s = Pastix(A, PastixConfig(tile_size=128, update_dtype="bfloat16",
                           verbosity=2))
t0 = time.time()
s.analyze()
print(f"analyze {time.time()-t0:.0f}s; ooc_plan="
      f"{'None' if s._ooc_plan is None else len(s._ooc_plan.segments)}",
      flush=True)
assert s._ooc_plan is not None, "expected the auto-OOC rescue to engage"
t0 = time.time()
s.factorize()
print(f"streamed factorize {time.time()-t0:.0f}s", flush=True)
b = A.to_scipy() @ np.ones(A.n)
t0 = time.time()
x = s.solve(b)
res = float(np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b))
print(f"streamed solve {time.time()-t0:.0f}s  "
      f"iters={s.report.refine_iters}  residual={res:.2e}", flush=True)
assert res < 1e-8
print("OK", flush=True)
