"""Krylov solvers: CG and BiCGStab, jitted with lax.while_loop.

TPU-native counterparts of the reference's CG (CG.h:20) and BCGStab
(BCGStab.h:20).  Like the reference, each takes a preconditioner that is
itself a LinearSolver (typically AMG or Jacobi); here the preconditioner
exposes ``precond_fn(A, r) -> z`` applying a fixed number of cycles/sweeps.
All reductions are jnp sums, which become ``psum`` collectives automatically
when the arrays are sharded over a device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ell import ELLMatrix
from ..ops import compdot
from .base import (
    LinearSolver, SolveStats, norm, prepared, condensed, pow2_equilibrate,
)


def _identity_precond(A: ELLMatrix, r: jnp.ndarray) -> jnp.ndarray:
    return r


def _setup_precond(precond, A):
    """Resolve a preconditioner to an r -> z function with setup hoisted
    out of the Krylov iteration loop."""
    if precond is None:
        return lambda r: r
    if hasattr(precond, "precond_setup"):
        return precond.precond_setup(A)
    M = precond.precond_fn()
    return lambda r: M(A, r)


class CG(LinearSolver):
    """Preconditioned conjugate gradients (for SPD systems)."""

    def __init__(self, preconditioner: LinearSolver | None = None, **kw):
        super().__init__(**kw)
        self.preconditioner = preconditioner

    def solve_fn(self, A: ELLMatrix, b: jnp.ndarray, x0: jnp.ndarray):
        A, b, recover = condensed(A, b)
        # see base.pow2_equilibrate (no-op off emulated-f64 backends)
        A, b, x0, unscale, nscale = pow2_equilibrate(A, b, x0)
        A = prepared(A)
        M = _setup_precond(self.preconditioner, A)
        rtol = self.relativeTolerance
        atol = self.absoluteTolerance
        maxit = self.nMaxIterations

        r0 = b - A.mv(x0)
        z0 = M(r0)
        rnorm0 = A.norm(r0)
        target = jnp.maximum(rtol * rnorm0, atol / nscale)

        def cond(state):
            i, x, r, z, p, rz, rn = state
            return (i < maxit) & (rn > target)

        def body(state):
            i, x, r, z, p, rz, rn = state
            Ap = A.mv(p)
            alpha = rz / A.dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = A.dot(r, z)
            beta = rz_new / rz
            p = z + beta * p
            return (i + 1, x, r, z, p, rz_new, A.norm(r))

        state = (jnp.int32(0), x0, r0, z0, z0, A.dot(r0, z0), rnorm0)
        i, x, r, *_ = jax.lax.while_loop(cond, body, state)
        rn = A.norm(r)
        return recover(unscale(x)), SolveStats(
            i, rnorm0 * nscale, rn * nscale, rn <= target
        )


def _stall_tol(dtype):
    """Shadow-orthogonality threshold for the rho-breakdown restart:
    when |<rhat, r>| < tol * |rhat| |r| the next beta/alpha are pure
    round-off and the iteration can stall PERMANENTLY (measured: the
    COMET Newton inner solve returned zero progress for every outer once
    the residual turned orthogonal to r0).  Restarting the shadow at the
    current residual (rhat = r, p = r) opens a fresh Krylov sequence from
    the current iterate — the classical BiCGStab breakdown cure.  OPT-IN
    (stall_restart=True): on near-symmetric systems (plate JFNK) rho
    legitimately passes through near-orthogonality and the forced
    restart destroys convergence."""
    return 1e-8 if dtype == jnp.float64 else 1e-4


class BiCGStab(LinearSolver):
    """Preconditioned BiCGStab (general nonsymmetric systems).

    ``stall_restart=True`` enables the rho-breakdown shadow restart
    (see _stall_tol) — used by the kinetic COMET inner solves."""

    def __init__(self, preconditioner: LinearSolver | None = None,
                 stall_restart: bool = False, **kw):
        super().__init__(**kw)
        self.preconditioner = preconditioner
        self.stall_restart = stall_restart

    def carry_template(self, vec_shape, dtype):
        """Zeros pytree with the carry's structure (host-side chunk
        drivers need a fresh-shaped placeholder before the first
        chunk)."""
        z = jnp.zeros(vec_shape, dtype)
        s = jnp.zeros((), dtype)
        return (jnp.int32(0), z, z, z, z, s, s, s, s, z, s, z, s)

    def init_carry(self, A, b: jnp.ndarray, x0: jnp.ndarray):
        """Full BiCGStab state for chunked solves: chunking is a DEVICE-
        PROGRAM split, not a mathematical restart — threading this carry
        through ``solve_chunk`` reproduces the single-program iteration
        exactly (a plain warm restart loses the Krylov shadow vector and
        search directions, and the non-monotone transient then never
        advances across small chunks; measured on the Newton endgame).
        Matrix-free / non-condensing operators only."""
        A = prepared(A)
        r0 = b - A.mv(x0)
        rnorm0 = A.norm(r0)
        one = jnp.asarray(1.0, b.dtype)
        return (
            jnp.int32(0), x0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
            one, one, one, rnorm0, x0, rnorm0, r0, rnorm0,
        )  # (i, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, rnorm0)

    def solve_chunk(self, A, carry, target):
        """Run up to ``max_iterations`` MORE BiCGStab iterations from a
        ``init_carry``/``solve_chunk`` carry toward the ABSOLUTE residual
        ``target``.  Returns (x, stats, carry_out) — x is the last
        iterate (best-seen on clear divergence), stats.iterations counts
        GLOBALLY across chunks.  Matrix-free operators only (no boundary
        condensation)."""
        A = prepared(A)
        M = _setup_precond(self.preconditioner, A)
        maxit = self.nMaxIterations
        atol = self.absoluteTolerance
        (i0, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, rnorm0) = carry
        dtype = x.dtype
        _compvec = compdot.use_vec(x)
        tiny = jnp.asarray(
            1e-300 if dtype == jnp.float64 else 1e-30, dtype
        )
        target = jnp.asarray(target, dtype)
        diverged_at = 1e8
        stol = _stall_tol(dtype) if self.stall_restart else 0.0
        rhn0 = A.norm(rhat)

        def cond(state):
            i, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, rhn = state
            ok = jnp.isfinite(rn) & (rn < diverged_at * (rnorm0 + atol))
            return (i < i0 + maxit) & (rn > target) & ok

        def body(state):
            i, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, rhn = state
            rho_raw = A.dot(rhat, r)
            stall = jnp.abs(rho_raw) < stol * rhn * rn
            rhat = jnp.where(stall, r, rhat)
            rhn = jnp.where(stall, rn, rhn)
            rho_new = jnp.where(stall, rn * rn, rho_raw)
            beta = (rho_new / jnp.where(jnp.abs(rho) > tiny, rho, tiny)) * (
                alpha / jnp.where(jnp.abs(omega) > tiny, omega, tiny)
            )
            if _compvec:
                p_upd = compdot.lincomb(
                    (1.0, r), (beta, p), (-beta * omega, v)
                )
            else:
                p_upd = r + beta * (p - omega * v)
            p = jnp.where(stall, r, p_upd)
            phat = M(p)
            v = A.mv(phat)
            denom = A.dot(rhat, v)
            alpha = rho_new / jnp.where(jnp.abs(denom) > tiny, denom, tiny)
            s = (
                compdot.lincomb((1.0, r), (-alpha, v))
                if _compvec
                else r - alpha * v
            )
            shat = M(s)
            t = A.mv(shat)
            tt = A.dot(t, t)
            omega = A.dot(t, s) / jnp.where(tt > tiny, tt, tiny)
            if _compvec:
                x = compdot.lincomb(
                    (1.0, x), (alpha, phat), (omega, shat)
                )
                r = compdot.lincomb((1.0, s), (-omega, t))
            else:
                x = x + alpha * phat + omega * shat
                r = s - omega * t
            rn = A.norm(r)
            better = jnp.isfinite(rn) & (rn < brn)
            bx = jnp.where(better, x, bx)
            brn = jnp.where(better, rn, brn)
            return (i + 1, x, r, p, v, rho_new, alpha, omega, rn, bx, brn,
                    rhat, rhn)

        out = jax.lax.while_loop(
            cond, body,
            (i0, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, rhn0),
        )
        (i, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, _rhn) = out
        ok_last = jnp.isfinite(rn) & (rn < 100.0 * (rnorm0 + atol))
        x_out = jnp.where(ok_last, x, bx)
        rn_out = jnp.where(ok_last, rn, brn)
        carry_out = (
            i, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, rnorm0
        )
        return x_out, SolveStats(
            i, rnorm0, rn_out, rn_out <= target
        ), carry_out

    def solve_fn(self, A: ELLMatrix, b: jnp.ndarray, x0: jnp.ndarray,
                 target=None):
        """``target``: optional traced ABSOLUTE residual-norm target that
        overrides the default max(rtol*|b - A x0|, atol)."""
        A, b, recover = condensed(A, b)
        # emulated-f64 backends: exact pow2 scaling keeps the recurrence
        # scalars inside the emulation's f32-grade exponent range (see
        # base.pow2_equilibrate; no-op on CPU / for operators)
        A, b, x0, unscale, nscale = pow2_equilibrate(A, b, x0)
        A = prepared(A)
        M = _setup_precond(self.preconditioner, A)
        rtol, atol, maxit = (
            self.relativeTolerance,
            self.absoluteTolerance,
            self.nMaxIterations,
        )
        tiny = jnp.asarray(1e-300, b.dtype) if b.dtype == jnp.float64 else jnp.asarray(1e-30, b.dtype)
        _compvec = compdot.use_vec(b)

        r0 = b - A.mv(x0)
        rnorm0 = A.norm(r0)
        if target is None:
            target = jnp.maximum(rtol * rnorm0, atol / nscale)
        else:
            target = jnp.asarray(target, b.dtype) / nscale

        # breakdown safety: when rhat . r or t . t degenerate (which
        # happens whenever the outer loop feeds a residual already at the
        # round-off floor), the iterates can diverge violently while the
        # while_loop keeps spinning to maxit.  Track the best iterate seen
        # and stop on clear divergence; return the best, not the last.
        # Shadow-orthogonality stalls instead RESTART the Krylov sequence
        # at the current residual (see _stall_tol).
        diverged_at = 1e8
        stol = _stall_tol(b.dtype) if self.stall_restart else 0.0

        def cond(state):
            i, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, rhn = state
            ok = jnp.isfinite(rn) & (rn < diverged_at * (rnorm0 + atol))
            return (i < maxit) & (rn > target) & ok

        def body(state):
            i, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, rhn = state
            rho_raw = A.dot(rhat, r)
            stall = jnp.abs(rho_raw) < stol * rhn * rn
            rhat = jnp.where(stall, r, rhat)
            rhn = jnp.where(stall, rn, rhn)
            rho_new = jnp.where(stall, rn * rn, rho_raw)
            beta = (rho_new / jnp.where(jnp.abs(rho) > tiny, rho, tiny)) * (
                alpha / jnp.where(jnp.abs(omega) > tiny, omega, tiny)
            )
            if _compvec:
                p_upd = compdot.lincomb(
                    (1.0, r), (beta, p), (-beta * omega, v)
                )
            else:
                p_upd = r + beta * (p - omega * v)
            p = jnp.where(stall, r, p_upd)
            phat = M(p)
            v = A.mv(phat)
            denom = A.dot(rhat, v)
            alpha = rho_new / jnp.where(jnp.abs(denom) > tiny, denom, tiny)
            s = (
                compdot.lincomb((1.0, r), (-alpha, v))
                if _compvec
                else r - alpha * v
            )
            shat = M(s)
            t = A.mv(shat)
            tt = A.dot(t, t)
            omega = A.dot(t, s) / jnp.where(tt > tiny, tt, tiny)
            if _compvec:
                x = compdot.lincomb(
                    (1.0, x), (alpha, phat), (omega, shat)
                )
                r = compdot.lincomb((1.0, s), (-omega, t))
            else:
                x = x + alpha * phat + omega * shat
                r = s - omega * t
            rn = A.norm(r)
            better = jnp.isfinite(rn) & (rn < brn)
            bx = jnp.where(better, x, bx)
            brn = jnp.where(better, rn, brn)
            return (i + 1, x, r, p, v, rho_new, alpha, omega, rn, bx, brn,
                    rhat, rhn)

        one = jnp.asarray(1.0, b.dtype)
        state = (
            jnp.int32(0),
            x0,
            r0,
            jnp.zeros_like(b),
            jnp.zeros_like(b),
            one,
            one,
            one,
            rnorm0,
            x0,
            rnorm0,
            r0,
            rnorm0,
        )
        out = jax.lax.while_loop(cond, body, state)
        (i, x, r, p, v, rho, alpha, omega, rn, bx, brn, rhat, rhn) = out
        return recover(unscale(bx)), SolveStats(
            i, rnorm0 * nscale, brn * nscale, brn <= target
        )


class GMRES(LinearSolver):
    """Right-preconditioned restarted GMRES(m) (reference role:
    CG.h/BCGStab.h's Krylov family — the reference ships no GMRES; this
    solver exists because BiCGStab's non-monotone f32-noise transient
    burns 800-1700 iterations per Newton step on the coupled flow
    system at 1M cells, while GMRES's least-squares residual is
    monotone within a cycle).

    TPU-shaped: the Arnoldi orthogonalization is classical Gram-Schmidt
    applied twice (CGS2) — two (m+1, n)x(n) einsum contractions per
    iteration instead of modified GS's m sequential dots — and the
    Hessenberg/Givens updates are fixed-size masked ops, so the whole
    cycle jits into one while_loop.  Memory: the basis holds
    ``restart + 1`` copies of the unknown vector.

    Supports the same ``init_carry``/``solve_chunk`` protocol as
    BiCGStab (chunk boundaries align to restart cycles, which lose
    nothing: a GMRES restart is a clean warm restart by construction).
    Matrix-free / non-condensing operators only for the chunked path."""

    def __init__(self, preconditioner: LinearSolver | None = None,
                 restart: int = 32, **kw):
        super().__init__(**kw)
        self.preconditioner = preconditioner
        self.restart = int(restart)

    # --- carry protocol ---------------------------------------------------

    def carry_template(self, vec_shape, dtype):
        """Zeros pytree with the carry's structure (host-side chunk
        drivers need a fresh-shaped placeholder before the first
        chunk)."""
        z = jnp.zeros(vec_shape, dtype)
        s = jnp.zeros((), dtype)
        return (jnp.int32(0), z, z, s, z, s, s)

    def init_carry(self, A, b: jnp.ndarray, x0: jnp.ndarray):
        A = prepared(A)
        r0 = b - A.mv(x0)
        rn = A.norm(r0)
        # (i, x, b, rn, bx, brn, rnorm0)
        return (jnp.int32(0), x0, b, rn, x0, rn, rn)

    def _one_cycle(self, A, M, x, b, rn, target):
        """One GMRES(m) cycle from iterate x with residual norm rn.
        Returns (x_new, rn_new, iterations_used)."""
        m = self.restart
        dtype = x.dtype
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        r = b - A.mv(x)
        beta = A.norm(r)
        v0 = r / jnp.maximum(beta, tiny)
        V = jnp.zeros((m + 1,) + x.shape, dtype).at[0].set(v0)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.ones(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        k_idx = jnp.arange(m + 1)

        def dots(Vb, w):
            # psum-aware batched inner products against the whole basis
            prods = jnp.einsum("k...,...->k", Vb, w)
            return A.psum(prods)

        def cond(st):
            j, V, H, cs, sn, g, res = st
            return (j < m) & (res > target) & jnp.isfinite(res)

        def body(st):
            j, V, H, cs, sn, g, res = st
            w = A.mv(M(V[j]))
            le = (k_idx <= j).astype(dtype)
            h1 = dots(V, w) * le
            w = w - jnp.einsum("k,k...->...", h1, V)
            h2 = dots(V, w) * le
            w = w - jnp.einsum("k,k...->...", h2, V)
            h = h1 + h2
            hw = A.norm(w)
            h = h + jnp.where(k_idx == j + 1, hw, 0.0)
            # apply the stored Givens rotations to the new column
            def rot(k, hcol):
                hk = hcol[k]
                hk1 = hcol[k + 1]
                apply = (k < j).astype(dtype)
                new_k = cs[k] * hk + sn[k] * hk1
                new_k1 = -sn[k] * hk + cs[k] * hk1
                hcol = hcol.at[k].set(apply * new_k + (1 - apply) * hk)
                return hcol.at[k + 1].set(
                    apply * new_k1 + (1 - apply) * hk1
                )

            h = jax.lax.fori_loop(0, m, rot, h)
            hj = h[j]
            hj1 = h[j + 1]
            denom = jnp.sqrt(hj * hj + hj1 * hj1)
            c_new = jnp.where(denom > tiny, hj / jnp.maximum(denom, tiny), 1.0)
            s_new = jnp.where(denom > tiny, hj1 / jnp.maximum(denom, tiny), 0.0)
            h = h.at[j].set(c_new * hj + s_new * hj1)
            h = h.at[j + 1].set(0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            gj = g[j]
            g = g.at[j].set(c_new * gj)
            g = g.at[j + 1].set(-s_new * gj)
            H = H.at[:, j].set(h)
            V = V.at[j + 1].set(w / jnp.maximum(hw, tiny))
            return (j + 1, V, H, cs, sn, g, jnp.abs(g[j + 1]))

        j, V, H, cs, sn, g, res = jax.lax.while_loop(
            cond, body, (jnp.int32(0), V, H, cs, sn, g, beta)
        )

        # masked back-substitution on the j-leading block of R = H[:m,:m]
        def back(kk, y):
            i = m - 1 - kk
            active = i < j
            num = g[i] - jnp.dot(H[i, :], y)
            Rii = H[i, i]
            safe = jnp.where(jnp.abs(Rii) > tiny, Rii, 1.0)
            return y.at[i].set(jnp.where(active, num / safe, 0.0))

        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype))
        dx = M(jnp.einsum("k,k...->...", y, V[:m]))
        x_new = x + dx
        r_new = b - A.mv(x_new)
        rn_new = A.norm(r_new)
        return x_new, rn_new, j

    def solve_chunk(self, A, carry, target):
        """Run up to ``max_iterations`` MORE GMRES iterations (whole
        restart cycles) toward the ABSOLUTE residual ``target``.
        Matrix-free operators only (no boundary condensation)."""
        A = prepared(A)
        M = _setup_precond(self.preconditioner, A)
        maxit = self.nMaxIterations
        atol = self.absoluteTolerance
        (i0, x, b, rn, bx, brn, rnorm0) = carry
        target = jnp.asarray(target, x.dtype)
        diverged_at = 1e8

        def cond(st):
            i, x, rn, bx, brn = st
            ok = jnp.isfinite(rn) & (rn < diverged_at * (rnorm0 + atol))
            return (i < i0 + maxit) & (rn > target) & ok

        def body(st):
            i, x, rn, bx, brn = st
            x, rn, used = self._one_cycle(A, M, x, b, rn, target)
            better = jnp.isfinite(rn) & (rn < brn)
            bx = jnp.where(better, x, bx)
            brn = jnp.where(better, rn, brn)
            return (i + used, x, rn, bx, brn)

        i, x, rn, bx, brn = jax.lax.while_loop(
            cond, body, (i0, x, rn, bx, brn)
        )
        ok_last = jnp.isfinite(rn) & (rn <= brn)
        x_out = jnp.where(ok_last, x, bx)
        rn_out = jnp.where(ok_last, rn, brn)
        carry_out = (i, x, b, rn, bx, brn, rnorm0)
        return x_out, SolveStats(
            i, rnorm0, rn_out, rn_out <= target
        ), carry_out

    def solve_fn(self, A, b: jnp.ndarray, x0: jnp.ndarray, target=None):
        A, b, recover = condensed(A, b)
        carry = self.init_carry(A, b, x0)
        rnorm0 = carry[3]
        if target is None:
            target = jnp.maximum(
                self.relativeTolerance * rnorm0, self.absoluteTolerance
            )
        x, stats, _ = self.solve_chunk(A, carry, target)
        return recover(x), stats


class JacobiSolver(LinearSolver):
    """Damped-Jacobi relaxation solver / preconditioner
    (reference: JacobiSolver.h:20)."""

    def __init__(self, omega: float = 0.7, sweeps: int = 5, **kw):
        super().__init__(**kw)
        self.omega = omega
        self.sweeps = sweeps

    def precond_setup(self, A):
        A = prepared(A)
        omega, sweeps = self.omega, self.sweeps

        def M(r: jnp.ndarray) -> jnp.ndarray:
            z = A.diag_solve(r)
            for _ in range(sweeps - 1):
                z = z + omega * A.diag_solve(r - A.mv(z))
            return z

        return M

    def solve_fn(self, A: ELLMatrix, b: jnp.ndarray, x0: jnp.ndarray):
        A, b, recover = condensed(A, b)
        A = prepared(A)
        rtol, atol, maxit = (
            self.relativeTolerance,
            self.absoluteTolerance,
            self.nMaxIterations,
        )
        omega = self.omega
        r0 = b - A.mv(x0)
        rnorm0 = A.norm(r0)
        target = jnp.maximum(rtol * rnorm0, atol)

        def cond(state):
            i, x, rn = state
            return (i < maxit) & (rn > target)

        def body(state):
            i, x, rn = state
            x = A.jacobi_step(x, b, omega)
            return (i + 1, x, A.norm(b - A.mv(x)))

        i, x, rn = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, rnorm0))
        return recover(x), SolveStats(i, rnorm0, rn, rn <= target)
