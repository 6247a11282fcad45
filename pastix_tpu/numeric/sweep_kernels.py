"""Whole-sweep Pallas triangular-solve kernel (round-5 solve redesign).

The reference's updown phase (``src/sopalin/src/updo.c``, SURVEY §3.4)
is latency-bound: per-cblk GEMV/TRSV chains.  Our XLA analog at the 1M
flagship ran ~200 levels x (chunked gather + einsum + scatter) per sweep
= 647 ms for ~21 GB of tile traffic (~33 GB/s effective) — dominated by
per-level dispatch and HBM round-trips of gathered operands, not
arithmetic.

This kernel runs ONE sweep as a single Pallas program (chunked only by
SMEM table capacity, all chunks shape-identical so they share one
compile):

  * the RHS lives in VMEM for the whole sweep — zero HBM traffic for y;
  * every stored tile is visited exactly once as a flat op stream
    (diag ops read the inverted diagonal tiles, update ops the pool),
    ordered by elimination level on the host;
  * tile fetches ride a deep slotted DMA pipeline (>= 8 in flight,
    the exp_dma depth rule) straight into MXU matvecs — no gathered
    transients in HBM;
  * ops are G-batched per grid step; chunks are padded with null ops
    that write a dummy RHS row (no predication in the hot loop).

Op encoding (host-built, int32): tile index (pool or dinv by flag),
src block-row, dst block-row, diag flag.  The RHS uses a row-vector
layout (nbc*R, T) so the lane dimension stays 128-aligned.

Forward (y = L^{-1} b): per level, diag ops y[c] = dinv[c]·y[c] then
update ops y[r] -= L[r,c]·y[c].  Backward (x = L^{-T} y): reversed
levels, update ops x[c] -= L[r,c]^T·x[r] then diag x[c] = dinv[c]^T·x[c]
(LU: U from its own pool, untransposed diag).  All ops become
dot_generals with per-direction static contraction dims.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # tests set True to run off-TPU


def build_sweep_schedule(layout, chunk_max: int = 16384, group: int = 4):
    """Host-built flat op streams for both sweeps.

    Returns {"fwd": chunks, "bwd": chunks, "nsteps": per-chunk steps}.
    Each chunk: dict(tidx, src, dst, kd) int32 arrays of length
    nsteps*group (uniformly padded so every chunk shares one kernel
    compile).  Null pad ops write the dummy RHS row (index nbc).
    """
    G = int(group)
    fwd_parts = []
    bwd_parts = []
    for lv in layout.levels:
        cols = np.asarray(lv.cols, np.int32)
        tp = np.asarray(lv.trsm_panel, np.int32)
        tr = np.asarray(lv.trsm_row, np.int32)
        tc = np.asarray(lv.trsm_col, np.int32)
        one = np.ones(cols.size, np.int32)
        zero = np.zeros(tp.size, np.int32)
        # fwd: diag ops then updates
        fwd_parts.append((cols, cols, cols, one))
        if tp.size:
            fwd_parts.append((tp, tc, tr, zero))
        # bwd (built in forward order; reversed below): updates then diag
        bwd_parts.append(((tp, tr, tc, zero), (cols, cols, cols, one)))

    def _cat(parts):
        return tuple(
            np.concatenate([p[f] for p in parts]) if parts
            else np.empty(0, np.int32)
            for f in range(4)
        )

    fwd = _cat(fwd_parts)
    bwd = _cat(
        [p for upd_diag in reversed(bwd_parts) for p in upd_diag]
    )

    nsteps = max(1, chunk_max // G)
    csz = nsteps * G
    dummy = layout.nbc  # null ops write the extra RHS row

    def _chunks(ops):
        tidx, src, dst, kd = ops
        n = tidx.size
        out = []
        for lo in range(0, max(n, 1), csz):
            hi = min(lo + csz, n)
            m = hi - lo
            c = {
                "tidx": np.zeros(csz, np.int32),
                "src": np.zeros(csz, np.int32),
                "dst": np.full(csz, dummy, np.int32),
                "kd": np.zeros(csz, np.int32),
            }
            c["tidx"][:m] = tidx[lo:hi]
            c["src"][:m] = src[lo:hi]
            c["dst"][:m] = dst[lo:hi]
            c["kd"][:m] = kd[lo:hi]
            out.append(c)
        return out

    return {
        "fwd": _chunks(fwd),
        "bwd": _chunks(bwd),
        "nsteps": nsteps,
        "group": G,
        "nbc": layout.nbc,
        "T": layout.T,
    }


def _mk_sweep_kernel(nsteps, G, R, nbc, cu, cd, slots, precision):
    """One grid step = G ops.  cu/cd: contraction dim of the TILE for
    update/diag ops (RHS row-vectors always contract their dim 1)."""
    S = slots

    def kernel(tidx, src, dst, kd, pool, dinv, y_in, y_out,
               ybuf, tbuf, tsem, ysem):
        i = pl.program_id(0)

        def issue(step, u):
            j = step * G + u
            sl = step % S

            @pl.when(kd[j] == 1)
            def _():
                pltpu.make_async_copy(
                    dinv.at[tidx[j]], tbuf.at[sl, u], tsem.at[sl, u]
                ).start()

            @pl.when(kd[j] == 0)
            def _():
                pltpu.make_async_copy(
                    pool.at[tidx[j]], tbuf.at[sl, u], tsem.at[sl, u]
                ).start()

        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(
                y_in, ybuf.at[pl.ds(0, nbc * R)], ysem
            )
            cp.start()
            for s0 in range(min(S - 1, nsteps)):
                for u in range(G):
                    issue(s0, u)
            cp.wait()

        @pl.when(i + S - 1 < nsteps)
        def _():
            for u in range(G):
                issue(i + S - 1, u)

        sl = i % S
        for u in range(G):
            j = i * G + u
            pltpu.make_async_copy(
                pool.at[tidx[j]], tbuf.at[sl, u], tsem.at[sl, u]
            ).wait()
            yv = ybuf[pl.ds(src[j] * R, R), :]
            t = tbuf[sl, u]
            res_u = jax.lax.dot_general(
                yv, t, (((1,), (cu,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            if cd == cu:
                res_d = res_u
            else:
                res_d = jax.lax.dot_general(
                    yv, t, (((1,), (cd,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
            kf = kd[j].astype(jnp.float32)
            res = jnp.where(kd[j] == 1, res_d, res_u)
            beta = 1.0 - kf
            sgn = 2.0 * kf - 1.0
            ds = pl.ds(dst[j] * R, R)
            ybuf[ds, :] = beta * ybuf[ds, :] + sgn * res.astype(ybuf.dtype)

        @pl.when(i == nsteps - 1)
        def _():
            cp = pltpu.make_async_copy(
                ybuf.at[pl.ds(0, nbc * R)], y_out, ysem
            )
            cp.start()
            cp.wait()

    return kernel


def _precision():
    p = os.environ.get("PASTIX_SWEEP_PREC", "")
    if p == "highest":
        return jax.lax.Precision.HIGHEST
    if p == "high":
        return jax.lax.Precision.HIGH
    return None


def run_sweep(pool, dinv, y2, chunks, nsteps, G, nbc, cu, cd,
              slots=None, interpret=None):
    """Run one sweep over ``y2`` (nbc*R, T) through the chunked kernel.

    ``pool``/``dinv``: tile sources (ANY/HBM).  cu/cd: tile contraction
    dims for update/diag ops.  Returns the updated (nbc*R, T) array.
    """
    if interpret is None:
        interpret = _INTERPRET
    if slots is None:
        slots = int(os.environ.get("PASTIX_SWEEP_SLOTS", "4"))
    T = pool.shape[1]
    R = y2.shape[0] // nbc
    prec = _precision()
    kernel = _mk_sweep_kernel(nsteps, G, R, nbc, cu, cd, slots, prec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pool
            pl.BlockSpec(memory_space=pl.ANY),  # dinv
            pl.BlockSpec(memory_space=pl.ANY),  # y (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(((nbc + 1) * R, T), jnp.float32),  # resident RHS
            pltpu.VMEM((slots, G, T, T), pool.dtype),     # tile buffers
            pltpu.SemaphoreType.DMA((slots, G)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    for c in chunks:
        y2 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(y2.shape, y2.dtype),
            input_output_aliases={6: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * nsteps * G * R * T * T,
                bytes_accessed=nsteps * G * T * T * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(
            jnp.asarray(c["tidx"]), jnp.asarray(c["src"]),
            jnp.asarray(c["dst"]), jnp.asarray(c["kd"]),
            pool, dinv, y2,
        )
    return y2


def _to_rowvec(y):
    """(nbc, T, R) block RHS -> (nbc*R, T) row-vector layout."""
    nbc, T, R = y.shape
    return jnp.transpose(y, (0, 2, 1)).reshape(nbc * R, T)


def _from_rowvec(y2, nbc, T):
    R = y2.shape[0] // nbc
    return jnp.transpose(y2.reshape(nbc, R, T), (0, 2, 1))


def sweep_fwd(pool, dinv, y2, sched, slots=None, interpret=None):
    """y2 <- L^{-1} y2 (row-vector layout)."""
    return run_sweep(
        pool, dinv, y2, sched["fwd"], sched["nsteps"], sched["group"],
        sched["nbc"], cu=1, cd=1, slots=slots, interpret=interpret,
    )


def sweep_bwd(pool, dinv, y2, sched, lu=False, slots=None, interpret=None):
    """Symmetric kinds: y2 <- L^{-T} y2.  LU: y2 <- U^{-1} y2 with
    ``pool``/``dinv`` the U-side tiles (contributions transposed as
    stored, diag untransposed)."""
    return run_sweep(
        pool, dinv, y2, sched["bwd"], sched["nsteps"], sched["group"],
        sched["nbc"], cu=0, cd=(1 if lu else 0),
        slots=slots, interpret=interpret,
    )
