"""Bisect the block-kernel TPU fault: tiny problem, feature knobs."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
cache = "/root/.cache/pastix_jax"
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig
from pastix_tpu.numeric import kernels as K
from pastix_tpu.numeric.block_kernels import build_block_plan, gemm_scatter_block

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 16
A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128))
s.order(); s.symbfact(); s.analyze()
lay = s.layout
lvs = sorted(lay.levels, key=lambda lv: -lv.gemm_a.size)
lv = lvs[0]
print(f"pairs={lv.gemm_a.size} npool={lay.npool}", flush=True)
rng = np.random.default_rng(0)
pool = jnp.asarray(rng.standard_normal((lay.npool, 128, 128)).astype(np.float32) * 1e-3)
plan = build_block_plan(
    lv.gemm_a, lv.gemm_b, lv.gemm_d, lv.gemm_k,
    lay.blk_row, lay.blk_col, lay.keys, lay.nbc, lay.npool, gate=100.0,
)
print("blk pairs", plan.n_block_pairs, "entries", plan.stats["entries"], flush=True)
out = gemm_scatter_block(pool, plan, update_dtype=jnp.bfloat16)
jax.block_until_ready(out)
print("ran", float(np.asarray(out[0])[0,0]), flush=True)
ref = K.gemm_scatter(pool, lv.gemm_a, lv.gemm_b, lv.gemm_d, update_dtype=jnp.bfloat16)
fga, fgb, fgd, _ = plan.fallback
if fga.size:
    out = K.gemm_scatter(out, jnp.asarray(fga.astype(np.int32)), jnp.asarray(fgb.astype(np.int32)), jnp.asarray(fgd.astype(np.int32)), update_dtype=jnp.bfloat16)
err = float(jnp.max(jnp.abs(out - ref)))
print("max err vs XLA:", err, flush=True)
