"""Per-level time profile of the grid LLT factorization on the chip.

Times grid_fact truncated to the first k levels (and diag-chain-only
truncations) to locate where the 143 ms goes: front-loaded bandwidth on
the big early levels vs a fixed per-level latency floor.
Run: python exp_prof.py   (PASTIX_EXP_CPU=1, PASTIX_EXP_NX=)
"""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("PASTIX_EXP_CPU"):
        jax.config.update("jax_platforms", "cpu")
    cache_dir = "/root/.cache/pastix_jax"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    log(f"backend {jax.default_backend()}")

    nx = int(os.environ.get("PASTIX_EXP_NX", "48"))
    from pastix_tpu.generators import poisson_3d
    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig
    from pastix_tpu.numeric import kernels as K
    from pastix_tpu.numeric.factorize import coefinit

    A = poisson_3d(nx)
    solver = Pastix(A, PastixConfig(tile_size=128))
    solver.analyze()
    lay = solver.layout
    levels = (
        solver._dense_tail.levels_lo
        if solver._dense_tail is not None
        else lay.levels
    )
    T, npool = lay.T, lay.npool
    upd = jnp.bfloat16

    pool0, _ = coefinit(lay, solver._A_perm, dtype=np.float32)
    pool0 = jnp.asarray(pool0)

    def sync(x):
        jax.block_until_ready(x)
        return float(np.asarray(x.ravel()[-1]))

    def timeit(name, fn, reps=3):
        out = fn(pool0)
        sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(pool0)
            sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        log(f"{name}: {t*1e3:.1f} ms")
        return t

    gtabs = []
    for lv in levels:
        gtabs.append({
            "nd": lv.diag.size,
            "nt": lv.trsm_panel.size,
            "ng": lv.gemm_a.size,
            "diag": jnp.asarray(lv.diag),
            "tp": jnp.asarray(lv.trsm_panel),
            "tcpos": jnp.asarray(
                np.searchsorted(lv.cols, lv.trsm_col).astype(np.int32)
            ),
            "ga": jnp.asarray(lv.gemm_a),
            "gb": jnp.asarray(lv.gemm_b),
            "gd": jnp.asarray(lv.gemm_d),
        })
    log("level sizes (nd/nt/ng): "
        + " ".join(f"{t['nd']}/{t['nt']}/{t['ng']}" for t in gtabs))

    def grid_level(pool, t):
        diag = K.potrf_batch(jnp.tril(pool[t["diag"]]))
        pool = pool.at[t["diag"]].set(diag)
        if t["nt"]:
            eye = jnp.broadcast_to(
                jnp.eye(T, dtype=pool.dtype), diag.shape
            )
            dinv = lax.linalg.triangular_solve(
                diag, eye, left_side=True, lower=True
            )
            panels = jnp.einsum(
                "bij,bkj->bik", pool[t["tp"]], dinv[t["tcpos"]],
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGH,
            )
            pool = pool.at[t["tp"]].set(panels)
        if t["ng"]:
            W = jnp.einsum(
                "bij,bkj->bik",
                pool[t["ga"]].astype(upd), pool[t["gb"]].astype(upd),
                preferred_element_type=jnp.float32,
            )
            pool = pool.at[t["gd"]].add(-W)
        return pool

    nlev = len(gtabs)
    ks = sorted(set([1, 2, 4, 8, 16, 24, nlev]))
    prev = 0.0
    for k in ks:
        if k > nlev:
            continue

        def fact_k(pool, k=k):
            for t in gtabs[:k]:
                pool = grid_level(pool, t)
            return pool

        t = timeit(f"grid levels[:{k}]", jax.jit(fact_k))
        prev = t

    # diag-chain-only truncations
    for k in [8, nlev]:
        def diag_k(pool, k=k):
            for t in gtabs[:k]:
                diag = K.potrf_batch(jnp.tril(pool[t["diag"]]))
                pool = pool.at[t["diag"]].set(diag)
                if t["nt"]:
                    eye = jnp.broadcast_to(
                        jnp.eye(T, dtype=pool.dtype), diag.shape
                    )
                    dinv = lax.linalg.triangular_solve(
                        diag, eye, left_side=True, lower=True
                    )
                    panels = jnp.einsum(
                        "bij,bkj->bik", pool[t["tp"]], dinv[t["tcpos"]],
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGH,
                    )
                    pool = pool.at[t["tp"]].set(panels)
            return pool

        timeit(f"diag+trsm levels[:{k}]", jax.jit(diag_k))


if __name__ == "__main__":
    if os.environ.get("PASTIX_EXP_CHILD") or os.environ.get("PASTIX_EXP_CPU"):
        main()
    else:
        import subprocess

        env = dict(os.environ, PASTIX_EXP_CHILD="1")
        r = subprocess.run([sys.executable, __file__], env=env, timeout=3000,
                           capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            log(f"TPU child failed rc={r.returncode}")
