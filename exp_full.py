"""Full-factorization A/B variants: find why packed loses to grid on TPU.

Builds minimal all-unrolled LLT programs over the REAL bench tables and
times on the chip:
  grid          : tile gather/gemm/tile-scatter per level  (reference)
  packed        : row gather -> TRSM -> row scatter, (ng,T) dst
  packed-flat   : same, scatter indices flattened to (ng*T,)
  packed-2d     : whole program on the (npool*T, T) view (no per-level
                  3D<->2D reshape; diag/b gathers via one-shot reshape)
  packed-noscat : scatter replaced by sum-into-corner (gemm cost only)
  packed-nogemm : gemm replaced by broadcast W (scatter cost only)
Run: python exp_full.py   (PASTIX_EXP_CPU=1, PASTIX_EXP_NX=)
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
    solver = Pastix(A, PastixConfig(tile_size=128, packed_update=True))
    solver.analyze()
    lay = solver.layout
    plan = solver._packed_plan
    levels = (
        solver._dense_tail.levels_lo
        if solver._dense_tail is not None
        else lay.levels
    )
    T, npool = lay.T, lay.npool
    flops = solver.report.fact_flops
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
        log(f"{name}: {t*1e3:.1f} ms ({flops/t/1e9:.0f} useful GFLOP/s)")
        return t

    # device tables
    gtabs = []
    ptabs = []
    for lv, pl in zip(levels, plan.levels):
        gtabs.append({
            "diag": jnp.asarray(lv.diag),
            "tp": jnp.asarray(lv.trsm_panel),
            "tcpos": jnp.asarray(
                np.searchsorted(lv.cols, lv.trsm_col).astype(np.int32)
            ),
            "ga": jnp.asarray(lv.gemm_a),
            "gb": jnp.asarray(lv.gemm_b),
            "gd": jnp.asarray(lv.gemm_d),
        })
        ptabs.append({
            "diag": jnp.asarray(lv.diag),
            "gidx": jnp.asarray(pl.gidx),
            "cpos": jnp.asarray(pl.cpos),
            "pa": jnp.asarray(pl.pa),
            "pgb": jnp.asarray(pl.pgb),
            "dst": jnp.asarray(pl.dst),
            "dstf": jnp.asarray(pl.dst.reshape(-1)),
        })

    def dinv_of(diag, nd):
        eye = jnp.broadcast_to(jnp.eye(T, dtype=jnp.float32), (nd, T, T))
        return lax.linalg.triangular_solve(
            diag, eye, left_side=True, lower=True
        )

    def grid_level(pool, t):
        diag = K.potrf_batch(jnp.tril(pool[t["diag"]]))
        pool = pool.at[t["diag"]].set(diag)
        if t["tp"].shape[0]:
            dinv = dinv_of(diag, t["diag"].shape[0])
            panels = jnp.einsum(
                "bij,bkj->bik", pool[t["tp"]], dinv[t["tcpos"]],
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGH,
            )
            pool = pool.at[t["tp"]].set(panels)
        if t["ga"].shape[0]:
            W = jnp.einsum(
                "bij,bkj->bik",
                pool[t["ga"]].astype(upd), pool[t["gb"]].astype(upd),
                preferred_element_type=jnp.float32,
            )
            pool = pool.at[t["gd"]].add(-W)
        return pool

    def grid_fact(pool):
        for t in gtabs:
            pool = grid_level(pool, t)
        return pool

    def packed_level(pool, t, flat_idx=False, noscat=False, nogemm=False):
        diag = K.potrf_batch(jnp.tril(pool[t["diag"]]))
        dinv = dinv_of(diag, t["diag"].shape[0])
        pool = pool.at[t["diag"]].set(diag)
        p2 = pool.reshape(npool * T, T)
        O = jnp.einsum(
            "cij,ckj->cik", p2[t["gidx"]], dinv[t["cpos"]],
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGH,
        )
        p2 = p2.at[t["gidx"]].set(O)
        if t["pa"].shape[0]:
            if nogemm:
                W = jnp.broadcast_to(
                    p2[:T], (t["pa"].shape[0], T, T)
                ).astype(jnp.float32)
            else:
                b = p2.reshape(npool, T, T)[t["pgb"]]
                W = jnp.einsum(
                    "gij,gkj->gik", O[t["pa"]].astype(upd), b.astype(upd),
                    preferred_element_type=jnp.float32,
                )
            if noscat:
                p2 = p2.at[0, 0].add(W.sum().astype(jnp.float32) * 1e-30)
            elif flat_idx:
                p2 = p2.at[t["dstf"]].add(-W.reshape(-1, T))
            else:
                p2 = p2.at[t["dst"]].add(-W)
        return p2.reshape(npool, T, T)

    def packed_fact(pool, **kw):
        for t in ptabs:
            pool = packed_level(pool, t, **kw)
        return pool

    def packed_level_2d(p2, t):
        p3 = p2.reshape(npool, T, T)
        diag = K.potrf_batch(jnp.tril(p3[t["diag"]]))
        dinv = dinv_of(diag, t["diag"].shape[0])
        drows = (t["diag"][:, None] * T
                 + jnp.arange(T, dtype=jnp.int32)[None, :]).reshape(-1)
        p2 = p2.at[drows].set(diag.reshape(-1, T))
        O = jnp.einsum(
            "cij,ckj->cik", p2[t["gidx"]], dinv[t["cpos"]],
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGH,
        )
        p2 = p2.at[t["gidx"]].set(O)
        if t["pa"].shape[0]:
            brows = (t["pgb"][:, None] * T
                     + jnp.arange(T, dtype=jnp.int32)[None, :])
            b = p2[brows]
            W = jnp.einsum(
                "gij,gkj->gik", O[t["pa"]].astype(upd), b.astype(upd),
                preferred_element_type=jnp.float32,
            )
            p2 = p2.at[t["dst"]].add(-W)
        return p2

    def packed_fact_2d(pool):
        p2 = pool.reshape(npool * T, T)
        for t in ptabs:
            p2 = packed_level_2d(p2, t)
        return p2.reshape(npool, T, T)

    # --- piece-based extend-add: gather-position W rows per target tile,
    # then scatter at TILE granularity (index count == grid path) ---------
    piece_tabs = []
    for lv, pl in zip(levels, plan.levels):
        ng = pl.pa.size
        gd_list, rsrc_list = [], []
        if ng:
            # reconstruct per-pair metadata from the host plan
            # pair i: a-chunk pl.pa[i], b-tile pool idx pl.pgb[i]
            # dst rows pl.dst[i] give the target tile directly: tile = dst // T
            dtile = pl.dst // T  # (ng, T); npool for OOB rows
            rloc = pl.dst % T
            for i in range(ng):
                tiles_i = np.unique(dtile[i])
                tiles_i = tiles_i[tiles_i < npool]
                for dt_ in tiles_i:
                    sel = dtile[i] == dt_
                    rs = np.full(T, ng * T, np.int64)  # zero row
                    rs[rloc[i][sel]] = i * T + np.flatnonzero(sel)
                    gd_list.append(dt_)
                    rsrc_list.append(rs)
        gd = np.asarray(gd_list, np.int32) if gd_list else np.empty(0, np.int32)
        rsrc = (
            np.stack(rsrc_list).astype(np.int32)
            if rsrc_list
            else np.empty((0, T), np.int32)
        )
        piece_tabs.append({
            "gd": jnp.asarray(gd), "rsrc": jnp.asarray(rsrc), "ng": ng,
        })
    log(f"pieces total={sum(int(t['gd'].shape[0]) for t in piece_tabs)} "
        f"(grid pairs={sum(lv.gemm_a.size for lv in levels)})")

    def packed_level_pieces(pool, t, pt):
        diag = K.potrf_batch(jnp.tril(pool[t["diag"]]))
        dinv = dinv_of(diag, t["diag"].shape[0])
        pool = pool.at[t["diag"]].set(diag)
        p2 = pool.reshape(npool * T, T)
        O = jnp.einsum(
            "cij,ckj->cik", p2[t["gidx"]], dinv[t["cpos"]],
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGH,
        )
        p2 = p2.at[t["gidx"]].set(O)
        pool = p2.reshape(npool, T, T)
        if t["pa"].shape[0]:
            b = pool[t["pgb"]]
            W = jnp.einsum(
                "gij,gkj->gik", O[t["pa"]].astype(upd), b.astype(upd),
                preferred_element_type=jnp.float32,
            )
            Wz = jnp.concatenate(
                [W.reshape(-1, T), jnp.zeros((1, T), jnp.float32)]
            )
            Wfull = Wz[pt["rsrc"]]  # (npiece, T, T) positioned rows
            pool = pool.at[pt["gd"]].add(-Wfull)
        return pool

    def packed_fact_pieces(pool):
        for t, pt in zip(ptabs, piece_tabs):
            pool = packed_level_pieces(pool, t, pt)
        return pool

    # --- latency floor: the per-level diag/TRSM chain without updates ----
    def diag_trsm_fact(pool):
        for t in ptabs:
            diag = K.potrf_batch(jnp.tril(pool[t["diag"]]))
            dinv = dinv_of(diag, t["diag"].shape[0])
            pool = pool.at[t["diag"]].set(diag)
            p2 = pool.reshape(npool * T, T)
            O = jnp.einsum(
                "cij,ckj->cik", p2[t["gidx"]], dinv[t["cpos"]],
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGH,
            )
            pool = p2.at[t["gidx"]].set(O).reshape(npool, T, T)
        return pool

    def chol_only_fact(pool):
        for t in ptabs:
            diag = K.potrf_batch(jnp.tril(pool[t["diag"]]))
            pool = pool.at[t["diag"]].set(diag)
        return pool

    # --- pallas fused chol+inv for the diag chain ------------------------
    from pastix_tpu.numeric.pallas_kernels import (
        chol_inv_pallas,
        chol_inv_pool_pallas,
    )

    GBLK = 8

    pad_tabs = []
    dpad_np = []
    for lv in levels:
        nd_ = lv.diag.size
        npad = -(-nd_ // GBLK) * GBLK
        dpad = np.full(npad, npool, np.int32)  # sentinel: DMA skipped
        dpad[:nd_] = lv.diag
        pad_tabs.append(jnp.asarray(dpad))
        dpad_np.append(dpad)

    def _symf(tiles):
        lo = jnp.tril(tiles)
        return lo + jnp.swapaxes(jnp.tril(tiles, -1), -1, -2)

    def grid_level_pallas(pool, t, dpad):
        pool, dinv = chol_inv_pool_pallas(pool, dpad, block=GBLK)
        if t["tp"].shape[0]:
            panels = jnp.einsum(
                "bij,bkj->bik", pool[t["tp"]], dinv[t["tcpos"]],
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGH,
            )
            pool = pool.at[t["tp"]].set(panels)
        if t["ga"].shape[0]:
            W = jnp.einsum(
                "bij,bkj->bik",
                pool[t["ga"]].astype(upd), pool[t["gb"]].astype(upd),
                preferred_element_type=jnp.float32,
            )
            pool = pool.at[t["gd"]].add(-W)
        return pool

    def grid_fact_pallas(pool):
        for t, dpad in zip(gtabs, pad_tabs):
            pool = grid_level_pallas(pool, t, dpad)
        return pool

    def pallas_diag_only(pool):
        for t, dpad in zip(gtabs, pad_tabs):
            pool, dinv = chol_inv_pool_pallas(pool, dpad, block=GBLK)
        return pool

    # correctness: the two programs must produce the same factor
    out_g = np.asarray(jax.jit(grid_fact)(pool0))
    out_p = np.asarray(jax.jit(grid_fact_pallas)(pool0))
    dd = np.nanmax(np.abs(out_g - out_p))
    log(f"grid vs pallas-diag factor max |diff|: {dd:.3e}")

    timeit("grid", jax.jit(grid_fact))
    timeit("grid+pallas-diag", jax.jit(grid_fact_pallas))
    timeit("pallas-diag only", jax.jit(pallas_diag_only))
    timeit("packed", jax.jit(lambda p: packed_fact(p)))
    timeit("packed-pieces", jax.jit(packed_fact_pieces))
    timeit("packed-noscat", jax.jit(lambda p: packed_fact(p, noscat=True)))
    timeit("packed-nogemm", jax.jit(lambda p: packed_fact(p, nogemm=True)))
    timeit("diag+trsm only", jax.jit(diag_trsm_fact))
    timeit("chol only", jax.jit(chol_only_fact))


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
