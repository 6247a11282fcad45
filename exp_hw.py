"""Hardware proof runs for BASELINE ladder rungs 3-4 (VERDICT r2 next #4).

  python exp_hw.py elasticity [nx=70]   3D elasticity LL^T, n = 3*nx^3
                                        (nx=70 -> 1.03M dof, irregular-ish
                                        pattern, dof_nbr=3 -> exercises the
                                        multilevel ND where grids cannot)
  python exp_hw.py convdiff [nx=70]     3D convection-diffusion LU with
                                        static pivoting, n = nx^3
                                        (nx=70 -> 343k, nonsymmetric)
  python exp_hw.py irregular [npts=150000]
                                        unstructured graded FEM graph
                                        (audikw_1/Fault_639 stand-in,
                                        generators.irregular_fem_3d),
                                        n = 3*npts, LL^T

Prints steady-state factorization GFLOP/s, nnz(L)/s, pivot count and the
refined residual; results are recorded in BASELINE.md section 4e.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "elasticity"
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 70
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import jax

    cache = "/root/.cache/pastix_jax"
    try:
        import os

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from pastix_tpu.config import Factorization, PastixConfig
    from pastix_tpu.generators import convection_diffusion_3d, elasticity_3d
    from pastix_tpu.pastix import Pastix

    log(f"backend: {jax.default_backend()}")
    if which == "elasticity":
        A = elasticity_3d(nx)
        cfg = PastixConfig(tile_size=128, update_dtype="bfloat16")
        kind = "LLT"
    elif which == "irregular":
        from pastix_tpu.generators import irregular_fem_3d

        npts = nx if nx > 1000 else 150000  # second arg is npts here
        t0 = time.perf_counter()
        A = irregular_fem_3d(npts, dof_nbr=3, seed=7)
        log(f"generated irregular FEM graph in {time.perf_counter()-t0:.1f}s")
        cfg = PastixConfig(
            tile_size=128, update_dtype="bfloat16", dof_nbr=3
        )
        kind = "LLT"
    else:
        A = convection_diffusion_3d(nx)
        cfg = PastixConfig(
            tile_size=128, update_dtype="bfloat16",
            factorization=Factorization.LU,
        )
        kind = "LU"
    n = A.n
    solver = Pastix(A, cfg)
    t0 = time.perf_counter()
    solver.order()
    solver.symbfact()
    solver.analyze()
    t_an = time.perf_counter() - t0
    lay = solver.layout
    flops = solver.report.fact_flops
    nnz_l = solver.report.nnz_l_exact
    log(
        f"{which} n={n} nnz(A)={A.to_scipy().nnz} T={lay.T} "
        f"tiles={lay.npool} levels={len(lay.levels)} nnz(L)={nnz_l:.3e} "
        f"flops={flops:.3e} padded={lay.padded_flops(kind.lower()):.3e} "
        f"(analysis {t_an:.1f}s)"
    )

    def sync(x):
        jax.block_until_ready(x)
        return float(np.asarray(x[-1])[-1, -1])

    import scipy.sparse as sp

    vals = jnp.asarray(sp.coo_matrix(solver._A_perm).data.astype(np.float32))
    is_lu = kind == "LU"
    anorm = float(abs(solver._A_perm).max())
    eps = jnp.asarray(cfg.static_pivoting_threshold * anorm, np.float32)

    def run_once():
        out = solver._coef_fn(vals)
        if is_lu:
            pool, pool_u = out
            sync(pool)
            t0 = time.perf_counter()
            pool, pool_u, npiv = solver._fact_fn(pool, pool_u, eps)
            sync(pool)
            return time.perf_counter() - t0, int(npiv)
        sync(out)
        t0 = time.perf_counter()
        pool = solver._fact_fn(out)
        sync(pool)
        return time.perf_counter() - t0, 0

    t_first, _ = run_once()
    log(f"first call (compile+run): {t_first:.1f}s")
    times, npiv = [], 0
    for _ in range(reps):
        t, npiv = run_once()
        times.append(t)
    t_fact = min(times)
    log(
        f"steady-state fact: {t_fact*1e3:.1f} ms -> "
        f"{flops/t_fact/1e9:.1f} useful GFLOP/s "
        f"({lay.padded_flops(kind.lower())/t_fact/1e9:.1f} device), "
        f"nnz(L)/s {nnz_l/t_fact:.3e}, pivots={npiv}"
    )

    b = A.to_scipy() @ np.ones(n)
    t0 = time.perf_counter()
    x = solver.solve(b)
    res = float(np.linalg.norm(b - A.to_scipy() @ x) / np.linalg.norm(b))
    log(
        f"refined solve: {time.perf_counter()-t0:.1f}s, "
        f"{solver.report.refine_iters} iters -> residual {res:.2e}"
    )
    print(
        f"RESULT {which} n={n} fact_ms={t_fact*1e3:.1f} "
        f"gflops={flops/t_fact/1e9:.1f} nnzl_s={nnz_l/t_fact:.3e} "
        f"pivots={npiv} residual={res:.2e}"
    )


if __name__ == "__main__":
    main()
