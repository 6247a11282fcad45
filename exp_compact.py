"""A/B: pipelined E2 vs compact-operand variant, under realistic reuse.

Real plans reuse each operand tile across ~8-13 pairs (pairs ~ m^2/2 per
column over m tiles); the earlier microbench drew nearly-unique indices
and overstated the compact gather's cost.  Run: python exp_compact.py
[ng] [nsrc] [T] [seg]"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

ng = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
nsrc = int(sys.argv[2]) if len(sys.argv) > 2 else 1024   # 8x reuse
T = int(sys.argv[3]) if len(sys.argv) > 3 else 128
seg = int(sys.argv[4]) if len(sys.argv) > 4 else 3
K_IT = 20

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/pastix_jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
from pastix_tpu.numeric import kernels as K
from pastix_tpu.numeric.pallas_kernels import (
    build_pipeline_schedule, gemm_scatter_pipelined)

rng = np.random.default_rng(0)
npool = nsrc + ng // seg + 8
ga = rng.integers(0, nsrc, ng).astype(np.int32)
gb = rng.integers(0, nsrc, ng).astype(np.int32)
gd = (nsrc + rng.integers(0, ng // seg, ng)).astype(np.int32)
pool = jnp.asarray(rng.standard_normal((npool, T, T)).astype(np.float32))
flops = 2.0 * ng * T**3

def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x[-1])[-1, -1])

def timeit(name, op, reps=3):
    @jax.jit
    def many(p):
        return lax.fori_loop(0, K_IT, lambda i, q: op(q), p)
    out = many(pool); sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = many(pool); sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts) / K_IT
    print(f"{name:30s}: {t*1e3:7.2f} ms  {flops/t/1e12:5.2f} TF/s", flush=True)

print(f"--- reuse {ng/nsrc:.0f}x  ng={ng} nsrc={nsrc} T={T} seg~{seg} ---",
      flush=True)
for upd, tag in ((jnp.bfloat16, "bf16"), (None, "fp32-high")):
    timeit(f"XLA gather-GEMM-scatter {tag}",
           lambda p, u=upd: K.gemm_scatter(p, ga, gb, gd, update_dtype=u,
                                           chunk=0))
    sched = build_pipeline_schedule(ga, gb, gd, group=2)
    timeit(f"pipelined G=2 {tag}",
           lambda p, u=upd, s=sched: gemm_scatter_pipelined(
               p, s, update_dtype=u, compact=False))
    timeit(f"compact G=2 {tag}",
           lambda p, u=upd, s=sched: gemm_scatter_pipelined(
               p, s, update_dtype=u, compact=True))

print("--- slot-depth sweep (bf16, G=2) ---", flush=True)
sched = build_pipeline_schedule(ga, gb, gd, group=2)
for S in (2, 3, 4, 6):
    timeit(f"pipelined G=2 S={S}",
           lambda p, s=sched, S=S: gemm_scatter_pipelined(
               p, s, update_dtype=jnp.bfloat16, compact=False, slots=S))
