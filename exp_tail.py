"""One-process A/B on the TPU: dense-tail factor variants.

Variants (env PASTIX_TAIL read at program-build time):
  blocked — static unrolled tile-grid Cholesky, fused diag kernel,
            update_dtype honored in the trailing updates (bf16)
  xla     — lax.linalg.cholesky of the (q*T)^2 dense matrix
Also: notail — dense tail disabled entirely (full level chain).
"""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    nx = int(os.environ.get("AB_NX", "48"))
    reps = int(os.environ.get("AB_REPS", "3"))

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
    from pastix_tpu.numeric.factorize import build_factorize_fn, coefinit

    A = poisson_3d(nx)
    cfg = PastixConfig(
        tile_size=int(os.environ.get("AB_T", "128")),
        update_dtype=os.environ.get("AB_UPD", "bfloat16") or None,
    )
    solver = Pastix(A, cfg)
    solver.order()
    solver.symbfact()
    solver.analyze()
    layout = solver.layout
    flops = solver.report.fact_flops
    dt = solver._dense_tail
    log(
        f"n={A.n} T={layout.T} levels={len(layout.levels)} "
        f"tail q={dt.q if dt else None}"
    )

    pool0, _ = coefinit(layout, solver._A_perm, dtype=np.float32)
    pool_dev = jax.device_put(jnp.asarray(pool0))

    def sync(x):
        jax.block_until_ready(x)
        return float(np.asarray(x[-1])[-1, -1])

    upd = np.dtype(cfg.update_dtype).type if cfg.update_dtype else None
    modes = os.environ.get("AB_TAILS", "blocked,xla,notail").split(",")
    for mode in modes:
        os.environ["PASTIX_TAIL"] = mode
        fn = build_factorize_fn(
            layout, cfg.factorization, update_dtype=upd,
            hermitian=True, donate=True,
            dense_tail=None if mode == "notail" else dt,
        )
        c = pool_dev + 0
        sync(c)
        t0 = time.perf_counter()
        out = fn(c)
        sync(out)
        log(f"tail={mode}: first call {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(reps):
            c = pool_dev + 0
            sync(c)
            t0 = time.perf_counter()
            out = fn(c)
            sync(out)
            times.append(time.perf_counter() - t0)
        t = min(times)
        log(
            f"tail={mode}: {t * 1e3:.1f} ms -> {flops / t / 1e9:.1f} GFLOP/s"
            f"  (all: {[f'{x*1e3:.1f}' for x in times]})"
        )
        del out, c


if __name__ == "__main__":
    main()
