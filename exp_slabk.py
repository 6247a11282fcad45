"""Microbench (TPU): slab E2 kernel vs pipelined pair kernel on REAL level
tables from a 3D Poisson analysis (synthetic random triples lack the panel
contiguity the slab schedule exploits).

Times the op iterated K times inside ONE jitted program (per-call tunnel
sync ~50 ms).  Reports nominal TF/s (full-tile flop count / time) for both
kernels — with row bounding the slab kernel EXECUTES fewer flops, so its
nominal rate can exceed the MXU's; the honest comparison is ms per level.

Run on TPU: python exp_slabk.py [nx] [level_rank] [K_IT]
"""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

cache = "/root/.cache/pastix_jax"
try:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
lvl_rank = int(sys.argv[2]) if len(sys.argv) > 2 else 0
K_IT = int(sys.argv[3]) if len(sys.argv) > 3 else 10

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig
from pastix_tpu.numeric import kernels as K
from pastix_tpu.numeric.pallas_kernels import (
    build_pipeline_schedule, gemm_scatter_pipelined)
from pastix_tpu.numeric.slab_kernels import build_slab_plan, gemm_scatter_slab

A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128))
s.order(); s.symbfact(); s.analyze()
lay = s.layout
diag_of_col = np.asarray(lay.lookup(np.arange(lay.nbc), np.arange(lay.nbc)))
lvs = sorted(lay.levels, key=lambda lv: -lv.gemm_a.size)
lv = lvs[lvl_rank]
ng = lv.gemm_a.size
T = lay.T
print(f"n={A.n} level pairs={ng} npool={lay.npool} "
      f"cols={lv.cols.size}", flush=True)

rng = np.random.default_rng(0)
pool = jnp.asarray(
    rng.standard_normal((lay.npool, T, T)).astype(np.float32) * 1e-3
)
flops = 2.0 * ng * T**3

def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x[-1])[-1, -1])

def timeit(name, op, extra="", reps=3):
    @jax.jit
    def many(p):
        return lax.fori_loop(0, K_IT, lambda i, q: op(q), p)
    t0 = time.perf_counter()
    out = many(pool); sync(out)   # compile
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = many(pool); sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts) / K_IT
    print(f"{name:34s}: {t*1e3:8.2f} ms  {flops/t/1e12:6.2f} TF/s(nom) "
          f"{extra} [compile {tc:.0f}s]", flush=True)

upd = jnp.bfloat16
print(f"--- bf16 updates, level rank {lvl_rank} ---", flush=True)
timeit("XLA gather-GEMM-scatter",
       lambda p: K.gemm_scatter(p, lv.gemm_a, lv.gemm_b, lv.gemm_d,
                                update_dtype=upd, chunk=0))
sched = build_pipeline_schedule(lv.gemm_a, lv.gemm_b, lv.gemm_d, group=2)
timeit("pipelined r3 G=2",
       lambda p: gemm_scatter_pipelined(p, sched, update_dtype=upd))

rb = (lay.row_lo, lay.row_hi)
for C, H, G, bound in [(16, 32, 4, False), (16, 32, 4, True),
                       (16, 64, 4, True), (8, 32, 4, True),
                       (16, 32, 8, True), (16, 32, 2, True)]:
    plan = build_slab_plan(
        lv.gemm_a, lv.gemm_b, lv.gemm_d, lv.gemm_k, diag_of_col,
        lay.npool, C=C, H=H, G=G, min_panel=6,
        rbounds=rb if bound else None, T=T,
    )
    st = plan.stats
    fga, fgb, fgd, fgk = plan.fallback
    fb_sched = (
        build_pipeline_schedule(
            fga.astype(np.int32), fgb.astype(np.int32),
            fgd.astype(np.int32), group=2,
        ) if fga.size else None
    )

    def op(p, plan=plan, fb=fb_sched):
        p = gemm_scatter_slab(p, plan, update_dtype=upd)
        if fb is not None:
            p = gemm_scatter_pipelined(p, fb, update_dtype=upd)
        return p

    timeit(
        f"slab C={C} H={H} G={G} bound={int(bound)}",
        op,
        extra=(f"slab%={100*st['pairs_slab']/ng:.0f} "
               f"desc/pair={st['desc']/max(st['pairs_slab'],1):.2f} "
               f"ffrac={st['flop_frac']:.2f}"),
    )

print("--- fp32-high ---", flush=True)
timeit("pipelined r3 G=2 fp32",
       lambda p: gemm_scatter_pipelined(p, sched, update_dtype=None))
plan = build_slab_plan(
    lv.gemm_a, lv.gemm_b, lv.gemm_d, lv.gemm_k, diag_of_col,
    lay.npool, C=16, H=32, G=4, min_panel=6, rbounds=rb, T=T,
)
fga, fgb, fgd, _ = plan.fallback
fb_sched = (
    build_pipeline_schedule(
        fga.astype(np.int32), fgb.astype(np.int32), fgd.astype(np.int32),
        group=2,
    ) if fga.size else None
)

def op32(p):
    p = gemm_scatter_slab(p, plan, update_dtype=None)
    if fb_sched is not None:
        p = gemm_scatter_pipelined(p, fb_sched, update_dtype=None)
    return p

timeit("slab C=16 H=32 G=4 fp32", op32)
