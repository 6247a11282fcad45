"""Device-resident preconditioned Krylov refinement (reference phase 6).

The reference refines on the CPU with MPI allreduces per dot product
(``pastix_task_raff`` dispatching to ``pivot_smp`` / ``grad_smp`` /
``gmres_smp`` / ``bicgstab_smp`` in ``src/sopalin/src/raff.c`` —
SURVEY.md section 2 row 14 and call stack 3.5).  Here the *entire*
refinement loop runs inside one jitted device program: the factored
triangular solve (the preconditioner M⁻¹) is inlined as batched MXU
matmuls, the residual SpMV is a device COO scatter-add, and the
iteration is a ``lax.while_loop`` — one dispatch over the host↔TPU
link per solve instead of one per iteration.

Device programs compute in the factor dtype (fp32): they descend to the
fp32 residual floor (~1e-7 relative); the host fp64 loop in
:mod:`pastix_tpu.refine` finishes the descent when ``refinement_eps``
asks for more, re-using the same device solve as preconditioner.

Method map (IPARM_REFINEMENT):
  API_RAF_PIVOT    -> richardson   (simple iterative refinement)
  API_RAF_GRAD     -> cg           (preconditioned conjugate gradient)
  API_RAF_GMRES    -> gmres        (right-preconditioned GMRES(m))
  API_RAF_BICGSTAB -> bicgstab
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pastix_tpu.analyze.layout import SolverLayout
from pastix_tpu.config import Factorization, RefinementMethod
from pastix_tpu.solve import (
    _run_bwd_inv,
    _run_fwd_inv,
    _solve_plan,
    _tail_ops,
)

_TINY = 1e-30


def _build_precond(layout: SolverLayout, kind: Factorization,
                   hermitian: bool, dense_tail, use_sweep: bool = False):
    """(prep, apply): prep(factor_args) gathers the dense-tail factor once
    per solve; apply(factor_args, prepped, r) runs M^{-1} r with the
    fast (inverse-diagonal) sweeps.

    ``use_sweep``: apply M^{-1} with the whole-sweep Pallas kernel
    (numeric/sweep_kernels.py) instead of the XLA level sweeps — the op
    stream covers the dense-tail columns, so no tail gather, and the
    resulting refine program is two pallas calls per solve instead of
    ~2x levels of HLO (the 1M fused program crashed the remote compiler
    on size; this is the split-the-program fix).
    """
    if use_sweep:
        from pastix_tpu.numeric.sweep_kernels import (
            build_sweep_schedule, sweep_fwd, sweep_bwd, _to_rowvec,
            _from_rowvec,
        )

        sched = build_sweep_schedule(layout)
        nbc, T = layout.nbc, layout.T

        def prep(fa):
            return None

        if kind == Factorization.LLT:

            def apply(fa, _, r):
                pool, dinv = fa
                y2 = sweep_fwd(pool, dinv, _to_rowvec(r), sched)
                y2 = sweep_bwd(pool, dinv, y2, sched)
                return _from_rowvec(y2, nbc, T).astype(r.dtype)

        elif kind in (Factorization.LDLT, Factorization.LDLH):

            def apply(fa, _, r):
                pool, dinv, d = fa
                R = r.shape[-1]
                y2 = sweep_fwd(pool, dinv, _to_rowvec(r), sched)
                y2 = (y2.reshape(nbc, R, T) / d[:, None, :]).reshape(
                    nbc * R, T
                )
                y2 = sweep_bwd(pool, dinv, y2, sched)
                return _from_rowvec(y2, nbc, T).astype(r.dtype)

        elif kind == Factorization.LU:

            def apply(fa, _, r):
                pool, pool_u, dinv_l, dinv_u = fa
                y2 = sweep_fwd(pool, dinv_l, _to_rowvec(r), sched)
                y2 = sweep_bwd(pool_u, dinv_u, y2, sched, lu=True)
                return _from_rowvec(y2, nbc, T).astype(r.dtype)

        else:
            raise ValueError(f"unsupported factorization: {kind}")

        return prep, apply
    plan = _solve_plan(layout, dense_tail)
    tail = (
        _tail_ops(layout, dense_tail, hermitian)
        if dense_tail is not None
        else None
    )

    if kind == Factorization.LLT:

        def prep(fa):
            return tail[0](fa[0]) if tail is not None else None

        def apply(fa, Ltail, r):
            pool, dinv = fa
            y = _run_fwd_inv(plan, pool, dinv, r)
            if tail is not None:
                _, tfwd, tbwd = tail
                y = tbwd(Ltail, tfwd(Ltail, y))
            return _run_bwd_inv(plan, pool, dinv, y, True, conj=hermitian)

        return prep, apply

    if kind in (Factorization.LDLT, Factorization.LDLH):

        def prep(fa):
            return None

        def apply(fa, _, r):
            pool, dinv, d = fa
            y = _run_fwd_inv(plan, pool, dinv, r)
            y = y / d[..., None]
            return _run_bwd_inv(plan, pool, dinv, y, True, conj=hermitian)

        return prep, apply

    if kind == Factorization.LU:

        def prep(fa):
            return None

        def apply(fa, _, r):
            pool, pool_u, dinv_l, dinv_u = fa
            y = _run_fwd_inv(plan, pool, dinv_l, r)
            return _run_bwd_inv(plan, pool_u, dinv_u, y, False)

        return prep, apply

    raise ValueError(f"unsupported factorization: {kind}")


def _col_dots(a, b):
    """Per-RHS-column dot products: (nbc, T, R) x (nbc, T, R) -> (R,)."""
    return jnp.sum(a * b, axis=(0, 1))


def build_ell(Acoo, nflat, dtype):
    """COO/CSR -> ELLPACK (cols, vals) numpy arrays, rows padded to the
    max row count.

    The device COO scatter-add SpMV measured 365 ms at the 1M flagship
    (~65 ns/row scatter, the round-2 packed-E2 lesson all over again);
    ELL turns it into one dense gather + reduce (<1 ms): padding slots
    point at column 0 with value 0.
    """
    csr = Acoo.tocsr()
    counts = np.diff(csr.indptr)
    k = max(1, int(counts.max()) if counts.size else 1)
    cols = np.zeros((nflat, k), np.int32)
    vals = np.zeros((nflat, k), dtype)
    r = np.repeat(np.arange(csr.shape[0]), counts)
    offs = np.arange(r.size) - np.repeat(csr.indptr[:-1], counts)
    cols[r, offs] = csr.indices
    vals[r, offs] = csr.data
    return cols, vals


def build_device_refine_fn(
    layout: SolverLayout,
    kind: Factorization,
    method: RefinementMethod = RefinementMethod.SIMPLE,
    hermitian: Optional[bool] = None,
    dense_tail=None,
    restart: int = 30,
    use_sweep: bool = False,
    amat_format: str = "coo",
):
    """Fused jitted solve + Krylov refinement, entirely on device.

    Returns fn(factor_args, A1, A2, A3, b, eps, itermax) ->
    (x, iters, rel_res) with
      factor_args: LLT (pool, dinv); LDLT/LDLH (pool, dinv, d);
                   LU (pool, pool_u, dinv_l, dinv_u)
      A1/A2/A3: device arrays of the full extended permuted A —
        amat_format="coo": (arow, acol, avals);
        amat_format="ell": (cols (nflat,k), vals (nflat,k), unused)
      b: (nbc, T, R) block RHS (all methods are block-capable; GMRES
         runs one Arnoldi basis per column with per-column Givens).
    ``use_sweep``: precondition with the whole-sweep Pallas kernel.

    Real dtypes only (the complex path refines on the host).
    """
    if hermitian is None:
        hermitian = kind in (Factorization.LLT, Factorization.LDLH)
    if dense_tail is not None and not (kind == Factorization.LLT and hermitian):
        dense_tail = None
    prep, M = _build_precond(
        layout, kind, hermitian, dense_tail, use_sweep=use_sweep
    )
    nbc, T = layout.nbc, layout.T

    def make_spmv(arow, acol, avals, R, like):
        if amat_format == "ell":
            cols, vals = arow, acol

            def spmv(x):
                xf = x.reshape(nbc * T, R)
                yf = jnp.sum(vals[:, :, None] * xf[cols], axis=1)
                return yf.reshape(nbc, T, R)

            return spmv

        def spmv(x):
            xf = x.reshape(nbc * T, R)
            yf = jnp.zeros_like(like)
            yf = yf.at[arow].add(avals[:, None] * xf[acol])
            return yf.reshape(nbc, T, R)

        return spmv

    # ------------------------------------------------------------------
    # Richardson (API_RAF_PIVOT): x += M^{-1}(b - Ax)
    # ------------------------------------------------------------------
    def richardson(fa, arow, acol, avals, b, eps, itermax):
        R = b.shape[-1]
        bf = b.reshape(nbc * T, R)
        spmv = make_spmv(arow, acol, avals, R, bf)
        bnorm2 = jnp.maximum(jnp.sum(bf * bf), _TINY)
        Ltail = prep(fa)
        x = M(fa, Ltail, b)
        r = b - spmv(x)

        def res2(rr):
            return jnp.sum(rr.reshape(nbc * T, R) ** 2)

        def cond(c):
            _, rr, prev2, it = c
            r2 = res2(rr)
            improving = r2 < 0.25 * prev2  # stop grinding at the fp32 floor
            return (r2 > eps * eps * bnorm2) & improving & (it < itermax)

        def body(c):
            x, rr, _, it = c
            x = x + M(fa, Ltail, rr)
            return x, b - spmv(x), res2(rr), it + 1

        x, r, _, it = lax.while_loop(
            cond, body,
            (x, r, jnp.full((), np.inf, dtype=bnorm2.dtype), jnp.int32(0)),
        )
        return x, it, jnp.sqrt(res2(r) / bnorm2)

    # ------------------------------------------------------------------
    # Preconditioned CG (API_RAF_GRAD) — SPD kinds; block RHS supported
    # (independent per-column step lengths, shared iteration count)
    # ------------------------------------------------------------------
    def cg(fa, arow, acol, avals, b, eps, itermax):
        R = b.shape[-1]
        bf = b.reshape(nbc * T, R)
        spmv = make_spmv(arow, acol, avals, R, bf)
        bn2 = jnp.maximum(_col_dots(b, b), _TINY)  # (R,)
        Ltail = prep(fa)
        x = M(fa, Ltail, b)
        r = b - spmv(x)
        z = M(fa, Ltail, r)
        p = z
        rz = _col_dots(r, z)

        def cond(c):
            x, r, p, rz, it = c
            r2 = _col_dots(r, r)
            active = (r2 > eps * eps * bn2).any()
            finite = jnp.isfinite(r2).all() & (r2 < 1e8 * bn2).all()
            return active & finite & (it < itermax)

        def body(c):
            x, r, p, rz, it = c
            Ap = spmv(p)
            pAp = _col_dots(p, Ap)
            alpha = jnp.where(jnp.abs(pAp) > _TINY, rz / pAp, 0.0)
            x = x + alpha[None, None, :] * p
            r = r - alpha[None, None, :] * Ap
            z = M(fa, Ltail, r)
            rz_new = _col_dots(r, z)
            beta = jnp.where(jnp.abs(rz) > _TINY, rz_new / rz, 0.0)
            p = z + beta[None, None, :] * p
            return x, r, p, rz_new, it + 1

        x, r, _, _, it = lax.while_loop(cond, body, (x, r, p, rz, jnp.int32(0)))
        rel = jnp.sqrt(jnp.max(_col_dots(r, r) / bn2))
        return x, it, rel

    # ------------------------------------------------------------------
    # Right-preconditioned BiCGStab (API_RAF_BICGSTAB) — any kind
    # ------------------------------------------------------------------
    def bicgstab(fa, arow, acol, avals, b, eps, itermax):
        R = b.shape[-1]
        bf = b.reshape(nbc * T, R)
        spmv = make_spmv(arow, acol, avals, R, bf)
        bn2 = jnp.maximum(_col_dots(b, b), _TINY)
        Ltail = prep(fa)
        x = M(fa, Ltail, b)
        r = b - spmv(x)
        rhat = r
        p = r
        rho = _col_dots(rhat, r)

        def cond(c):
            x, r, p, rho, it = c
            r2 = _col_dots(r, r)
            active = (r2 > eps * eps * bn2).any()
            finite = jnp.isfinite(r2).all() & (r2 < 1e8 * bn2).all()
            alive = (jnp.abs(rho) > _TINY).any()
            return active & finite & alive & (it < itermax)

        def body(c):
            x, r, p, rho, it = c
            ph = M(fa, Ltail, p)
            v = spmv(ph)
            rhv = _col_dots(rhat, v)
            alpha = jnp.where(jnp.abs(rhv) > _TINY, rho / rhv, 0.0)
            s = r - alpha[None, None, :] * v
            sh = M(fa, Ltail, s)
            t = spmv(sh)
            tt = _col_dots(t, t)
            omega = jnp.where(tt > _TINY, _col_dots(t, s) / tt, 0.0)
            x = x + alpha[None, None, :] * ph + omega[None, None, :] * sh
            r = s - omega[None, None, :] * t
            rho_new = _col_dots(rhat, r)
            safe = (jnp.abs(rho) > _TINY) & (jnp.abs(omega) > _TINY)
            beta = jnp.where(safe, (rho_new / rho) * (alpha / omega), 0.0)
            p = r + beta[None, None, :] * (p - omega[None, None, :] * v)
            return x, r, p, rho_new, it + 1

        x, r, _, _, it = lax.while_loop(cond, body, (x, r, p, rho, jnp.int32(0)))
        rel = jnp.sqrt(jnp.max(_col_dots(r, r) / bn2))
        return x, it, rel

    # ------------------------------------------------------------------
    # Right-preconditioned GMRES(m) (API_RAF_GMRES) — any kind, any R.
    # Fixed-m Arnoldi cycles (static shapes for XLA) with Givens
    # rotations tracking the residual; outer while_loop over restarts.
    # The whole RHS block iterates in lockstep: each column carries its
    # own Krylov basis/Hessenberg slice (the reference refines the full
    # block together, src/sopalin/src/raff.c).
    # ------------------------------------------------------------------
    m = int(restart)

    def gmres(fa, arow, acol, avals, b, eps, itermax):
        R = b.shape[-1]
        nf = nbc * T
        bf = b.reshape(nf, R)
        spmv = make_spmv(arow, acol, avals, R, bf)
        bnorm = jnp.sqrt(jnp.maximum(jnp.sum(bf * bf, axis=0), _TINY))  # (R,)
        Ltail = prep(fa)
        dt = b.dtype

        def safe_inv(a):
            return jnp.where(jnp.abs(a) > _TINY, 1.0 / a, 0.0)

        def precond_cols(v):  # (nf, R) -> (nf, R)
            return M(fa, Ltail, v.reshape(nbc, T, R)).reshape(nf, R)

        def cycle(x):
            r = (b - spmv(x)).reshape(nf, R)
            beta = jnp.sqrt(jnp.sum(r * r, axis=0))  # (R,)
            V = jnp.zeros((m + 1, nf, R), dt).at[0].set(r * safe_inv(beta))
            H = jnp.zeros((m + 1, m, R), dt)  # Givens-rotated columns
            cs = jnp.zeros((m, R), dt)
            sn = jnp.zeros((m, R), dt)
            g = jnp.zeros((m + 1, R), dt).at[0].set(beta)

            def arnoldi(j, st):
                V, H, cs, sn, g = st
                w = spmv(precond_cols(V[j]).reshape(nbc, T, R)).reshape(nf, R)
                # modified-Gram-Schmidt coefficients against rows <= j,
                # independently per column
                h = jnp.einsum("inr,nr->ir", V, w)  # (m+1, R)
                h = jnp.where(jnp.arange(m + 1)[:, None] <= j, h, 0.0)
                w = w - jnp.einsum("ir,inr->nr", h, V)
                hj1 = jnp.sqrt(jnp.sum(w * w, axis=0))  # (R,)
                V = V.at[j + 1].set(w * safe_inv(hj1))

                def rot(i, hh):
                    hi, hi1 = hh[i], hh[i + 1]
                    hh = hh.at[i].set(cs[i] * hi + sn[i] * hi1)
                    return hh.at[i + 1].set(-sn[i] * hi + cs[i] * hi1)

                h = lax.fori_loop(0, j, rot, h)
                hj = h[j]
                den = jnp.sqrt(hj * hj + hj1 * hj1)
                c = jnp.where(den > _TINY, hj / den, 1.0)
                s = jnp.where(den > _TINY, hj1 / den, 0.0)
                cs, sn = cs.at[j].set(c), sn.at[j].set(s)
                h = h.at[j].set(c * hj + s * hj1)
                H = H.at[:, j].set(h)
                g = g.at[j + 1].set(-s * g[j])
                g = g.at[j].set(c * g[j])
                return V, H, cs, sn, g

            V, H, cs, sn, g = lax.fori_loop(
                0, m, arnoldi, (V, H, cs, sn, g)
            )
            # back-substitute R y = g per column (breakdown columns get a
            # unit pivot so the solve stays finite)
            Rm = jnp.moveaxis(H[:m, :m], -1, 0)  # (R, m, m)
            diag = jnp.abs(Rm[:, jnp.arange(m), jnp.arange(m)])  # (R, m)
            fix = jnp.where(diag > _TINY, 0.0, 1.0)
            Rm = Rm + fix[:, :, None] * jnp.eye(m, dtype=dt)
            y = lax.linalg.triangular_solve(
                Rm, jnp.moveaxis(g[:m], -1, 0)[:, :, None],
                left_side=True, lower=False,
            )[:, :, 0]  # (R, m)
            u = jnp.einsum("rm,mnr->nr", y, V[:m])
            x = x + M(fa, Ltail, u.reshape(nbc, T, R))
            return x, jnp.abs(g[m])  # (R,) residual estimates

        x0 = M(fa, Ltail, b)

        def cond(c):
            _, it, res, prev = c
            worst = jnp.max(res / bnorm)
            prev_w = jnp.max(prev / bnorm)
            return (
                (worst > eps)
                & (worst < 0.5 * prev_w)  # restart must help; else floor
                & jnp.isfinite(worst)
                & (it < itermax)
            )

        def body(c):
            x, it, res, _ = c
            x, new_res = cycle(x)
            return x, it + m, new_res, res

        r0 = jnp.sqrt(
            jnp.maximum(jnp.sum((b - spmv(x0)) ** 2, axis=(0, 1)), 0.0)
        )
        x, it, res, _ = lax.while_loop(
            cond, body,
            (x0, jnp.int32(0), r0, jnp.full((R,), np.inf, dtype=dt)),
        )
        # res tracks the Givens estimate after the last cycle (== r0 before
        # any cycle); report the true residual of the returned x
        rtrue = jnp.sqrt(jnp.sum((b - spmv(x)) ** 2, axis=(0, 1)))
        return x, it, jnp.max(rtrue / bnorm)

    impl = {
        RefinementMethod.SIMPLE: richardson,
        RefinementMethod.CG: cg,
        RefinementMethod.BICGSTAB: bicgstab,
        RefinementMethod.GMRES: gmres,
    }[method]
    return jax.jit(impl)


# ---------------------------------------------------------------------------
# double-single ("two-float") arithmetic: fp64-grade residuals without fp64
# hardware (SURVEY §7 hard-part 4; the reference refines in double on CPU)
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    """Knuth TwoSum: a + b = s + e exactly (fp32)."""
    s = a + b
    t = s - a
    e = (a - (s - t)) + (b - t)
    return s, e


def _two_prod(a, b):
    """Dekker TwoProd (no FMA): a * b = p + e exactly (fp32).

    XLA does not contract or reassociate fp ops in HLO by default, so
    the splitting identities survive compilation (validated against the
    host fp64 residual in tests/test_sweep.py)."""
    p = a * b
    c = jnp.float32(4097.0)  # 2^12 + 1: split a 24-bit mantissa
    aa = a * c
    a1 = aa - (aa - a)
    a2 = a - a1
    bb = b * c
    b1 = bb - (bb - b)
    b2 = b - b1
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def df_split(a):
    """Host: fp64 array -> (hi, lo) fp32 pair with hi + lo ≈ a."""
    a = np.asarray(a, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def build_device_refine_step_fn(
    layout: SolverLayout,
    kind: Factorization,
    hermitian: Optional[bool] = None,
    use_sweep: bool = True,
    amat_format: str = "ell",
    unroll: int = 1,
):
    """One Richardson refinement step as a SMALL device program, with
    double-single residual arithmetic.

    The fused while_loop refine (build_device_refine_fn) wedges the
    remote TPU compiler beyond ~flagship scale; a host fp64 loop over
    the split solve pays ~600 ms/iteration in tunnel transfers against a
    69 ms device solve (1M measurements).  This keeps the whole loop
    device-resident — per-iteration host traffic is ONE scalar — AND
    reaches reference-grade residuals: A, b and the iterate x are stored
    as two-float (hi, lo) fp32 pairs, the ELL SpMV accumulates with
    TwoProd/TwoSum compensation (~1e-14 effective), and only the small
    correction solve runs in plain fp32.  This is the idiomatic TPU
    answer to the reference's double-precision refinement (raff.c): no
    fp64 units needed.

      r   = (b - A x)            (compensated two-float SpMV)
      x  += M^{-1} r             (whole-sweep preconditioner, fp32)
      r2' = ||b - A x'||^2       (driver checks convergence on sqrt)

    Returns (init_fn, step_fn):
      init_fn(fa, bh_blocks) -> (xh, xl)  [x0 = M^{-1} b]
      step_fn(fa, cols, vh, vl, bh, bl, xh, xl) -> (xh', xl', r2')
    with bh/bl flat (nflat,) splits of the fp64 RHS and vh/vl the ELL
    value splits; xh/xl are flat two-float iterates.
    """
    if hermitian is None:
        hermitian = kind in (Factorization.LLT, Factorization.LDLH)
    prep, M = _build_precond(
        layout, kind, hermitian, None, use_sweep=use_sweep
    )
    nbc, T = layout.nbc, layout.T
    nflat = nbc * T

    if amat_format != "ell":
        raise ValueError("step refine supports amat_format='ell' only")

    def residual_df(cols, vh, vl, bh, bl, xh, xl):
        """r ≈ b - A x to ~fp64 accuracy, returned as one fp32 array
        (the residual is SMALL, so single storage keeps full relative
        accuracy — the whole point of iterative refinement).

        The ELL gather is the step's dominant cost on TPU (~12 ns per
        gathered element, exp_step2.py): gather the (hi, lo) pair
        JOINTLY — one gather of 2-element slices costs about one
        per-row visit, not two."""
        k = cols.shape[1]
        X2 = jnp.stack([xh, xl], axis=-1)[cols]  # (nflat, k, 2)
        Xh = X2[..., 0]
        Xl = X2[..., 1]
        p, e = _two_prod(vh, Xh)
        e = e + vh * Xl + vl * Xh
        sh = p[:, 0]
        se = e[:, 0]
        for i in range(1, k):
            sh, e2 = _two_sum(sh, p[:, i])
            se = se + e2 + e[:, i]
        rh, re = _two_sum(bh, -sh)
        return rh + (re + (bl - se))

    def apply_M(fa, Ltail, r_flat):
        z = M(fa, Ltail, r_flat.reshape(nbc, T, 1))
        return z.reshape(nflat)

    def init(fa, b_blocks):
        Ltail = prep(fa)
        xh = M(fa, Ltail, b_blocks).reshape(nflat)
        return xh, jnp.zeros_like(xh)

    def step(fa, cols, vh, vl, bh, bl, xh, xl):
        # ONE residual per step (exp_step2.py: the compensated ELL
        # residual is ~3x the sweep solve's cost, and computing it both
        # before the correction and again for the convergence check
        # doubled it): the returned r2 is the norm of the residual the
        # correction was computed FROM — a one-step-lagged convergence
        # check.  The driver stops one correction later than an exact
        # check would, which only makes the final x better; the caller
        # verifies the true fp64 residual once at the end anyway.
        # ``unroll`` chains k such steps per dispatch (measured a null
        # at the flagship — kept for re-testing as the per-step cost
        # drops).
        Ltail = prep(fa)
        r2 = None
        for _ in range(max(1, unroll)):
            r = residual_df(cols, vh, vl, bh, bl, xh, xl)
            if r2 is None:
                r2 = jnp.sum(r * r)
            z = apply_M(fa, Ltail, r)
            # two-float accumulate x += z, then renormalize
            sh, e = _two_sum(xh, z)
            xl2 = xl + e
            xh, xl = _two_sum(sh, xl2)
        return xh, xl, r2

    return jax.jit(init), jax.jit(step)
