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
                   hermitian: bool, dense_tail):
    """(prep, apply): prep(factor_args) gathers the dense-tail factor once
    per solve; apply(factor_args, prepped, r) runs M^{-1} r with the
    fast (inverse-diagonal) sweeps."""
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


def build_device_refine_fn(
    layout: SolverLayout,
    kind: Factorization,
    method: RefinementMethod = RefinementMethod.SIMPLE,
    hermitian: Optional[bool] = None,
    dense_tail=None,
    restart: int = 30,
):
    """Fused jitted solve + Krylov refinement, entirely on device.

    Returns fn(factor_args, arow, acol, avals, b, eps, itermax) ->
    (x, iters, rel_res) with
      factor_args: LLT (pool, dinv); LDLT/LDLH (pool, dinv, d);
                   LU (pool, pool_u, dinv_l, dinv_u)
      arow/acol/avals: device COO of the full extended permuted A
      b: (nbc, T, R) block RHS (all methods are block-capable; GMRES
         runs one Arnoldi basis per column with per-column Givens).

    Real dtypes only (the complex path refines on the host).
    """
    if hermitian is None:
        hermitian = kind in (Factorization.LLT, Factorization.LDLH)
    if dense_tail is not None and not (kind == Factorization.LLT and hermitian):
        dense_tail = None
    prep, M = _build_precond(layout, kind, hermitian, dense_tail)
    nbc, T = layout.nbc, layout.T

    def make_spmv(arow, acol, avals, R, like):
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
