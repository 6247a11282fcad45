"""One-process TPU sweep: config knobs around the headline bench.

Variants (each = full analyze + steady-state factorization timing on the
48^3 Poisson LLT bench shape; tunnel/compile noise cancels in-session):
  base          — current defaults (dense_tail_fill=0.25, frac=0.5)
  tailfill=X    — relaxed terminal amalgamation sweep (more levels absorbed
                  into the one dense Cholesky vs more explicit-zero flops)
  frac=X        — amalgamation merge-target sweep
Knobs: SWEEP_NX (48), SWEEP_T (128), SWEEP_REPS (3), SWEEP_VARIANTS.
"""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    nx = int(os.environ.get("SWEEP_NX", "48"))
    T = int(os.environ.get("SWEEP_T", "128"))
    reps = int(os.environ.get("SWEEP_REPS", "3"))

    import jax

    cache = "/root/.cache/pastix_jax"
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()} {jax.devices()}")

    from pastix_tpu.generators import poisson_3d
    from pastix_tpu.pastix import Pastix
    from pastix_tpu.config import PastixConfig
    from pastix_tpu.numeric.factorize import coefinit

    A = poisson_3d(nx)
    n = A.n

    def sync(x):
        jax.block_until_ready(x)
        return float(np.asarray(x[-1])[-1, -1])

    variants = os.environ.get(
        "SWEEP_VARIANTS",
        "base,tailfill=0.4,tailfill=0.6,frac=0.4,frac=0.65",
    ).split(",")

    results = {}
    for v in variants:
        kw = dict(tile_size=T, update_dtype="bfloat16")
        if v.startswith("tailfill="):
            kw["dense_tail_fill"] = float(v.split("=")[1])
        elif v.startswith("frac="):
            kw["amalg_target_frac"] = float(v.split("=")[1])
        elif v != "base":
            log(f"unknown variant {v}")
            continue
        t0 = time.perf_counter()
        solver = Pastix(A, PastixConfig(**kw))
        solver.symbfact()
        solver.analyze()
        t_host = time.perf_counter() - t0
        lay = solver.layout
        flops_exact = solver.report.fact_flops
        pool0, _ = coefinit(lay, solver._A_perm, dtype=np.float32)
        fact = solver._fact_fn
        pool_dev = jax.device_put(jnp.asarray(pool0))

        def fresh():
            c = pool_dev + 0
            sync(c)
            return c

        t0 = time.perf_counter()
        out = fact(fresh())
        sync(out)
        t_first = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            p = fresh()
            t0 = time.perf_counter()
            out = fact(p)
            sync(out)
            times.append(time.perf_counter() - t0)
        t = min(times)
        results[v] = t
        log(
            f"{v:14s}: {t * 1e3:7.1f} ms ({flops_exact / t / 1e9:6.1f} GF/s) "
            f"levels={solver.report.n_levels} tiles={lay.npool} "
            f"tail_m={solver.report.dense_tail_m} "
            f"padded={solver.report.fact_flops_padded:.2e} "
            f"[host {t_host:.1f}s, first {t_first:.1f}s]"
        )
        del out, pool_dev, fact, solver
    best = min(results, key=results.get)
    log(f"best: {best} at {results[best] * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
