"""ILU(0) solver / preconditioner, TPU-native.

Counterpart of the reference's ILU0Solver (reference:
src/fvm/src/modules/fvmbase/ILU0Solver.h:20).  Classic ILU(0) is a
sequential elimination; the TPU-native formulation here is the
fine-grained fixed-point factorization of Chow & Patel (SIAM J. Sci.
Comput. 2015): each sweep updates every L/U entry from the ILU
equations simultaneously — on the DIA coefficient representation this
is a handful of rolls and elementwise ops per sweep, fully vectorized.
The triangular solves are approximated by truncated Jacobi iterations
on the (strictly) triangular parts, which converge geometrically for
the diagonally-dominant systems FVM assembly produces.

Requires a DIA-structured matrix (after boundary condensation every
solver matrix on a structured mesh is); falls back to damped Jacobi
sweeps otherwise so the solver remains usable on any mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ell import ELLMatrix
from .base import LinearSolver, SolveStats, condensed, prepared


def ilu0_factor(offsets, coef, diag, sweeps: int = 3):
    """Fixed-point ILU(0) factorization on DIA arrays.

    Returns (l (dict d<0 -> (n,)), u (dict d>0 -> (n,)), u_diag (n,)).
    A = L U on the sparsity pattern, L unit lower triangular.
    """
    offsets = [int(d) for d in offsets]
    neg = [d for d in offsets if d < 0]
    pos = [d for d in offsets if d > 0]
    a = {d: coef[i] for i, d in enumerate(offsets)}
    u_diag = diag
    l = {d: a[d] / jnp.roll(diag, -d) for d in neg}
    u = {d: a[d] for d in pos}

    def corrections(l, u, u_diag, t):
        """sum over k<min(i,j) of l_ik u_kj restricted to the pattern."""
        acc = None
        for d1 in neg:
            d2 = t - d1
            if d2 == 0:
                continue  # k == j (t<0) handled by the division; k==i never
            if d2 not in u:
                continue
            if t < 0 and not (d1 < t):
                continue  # need k < j for L entries
            term = l[d1] * jnp.roll(u[d2], -d1)
            acc = term if acc is None else acc + term
        return acc

    for _ in range(sweeps):
        new_l = {}
        for d in neg:
            c = corrections(l, u, u_diag, d)
            num = a[d] if c is None else a[d] - c
            new_l[d] = num / jnp.roll(u_diag, -d)
        new_u = {}
        for d in pos:
            c = corrections(l, u, u_diag, d)
            new_u[d] = a[d] if c is None else a[d] - c
        c0 = corrections(l, u, u_diag, 0)
        new_ud = diag if c0 is None else diag - c0
        l, u, u_diag = new_l, new_u, new_ud
    return l, u, u_diag


def ilu0_apply(l, u, u_diag, r, tri_sweeps: int = 4):
    """Approximate (LU)^-1 r via truncated Jacobi triangular solves."""
    def expand(v, x):
        # v: strictly triangular part applied to x: sum_d c_d * x_{i+d}
        acc = None
        for d, c in v.items():
            cc = c if x.ndim == 1 else c[:, None]
            term = cc * jnp.roll(x, -d, axis=0)
            acc = term if acc is None else acc + term
        if acc is None:
            return jnp.zeros_like(x)
        return acc

    z = r
    for _ in range(tri_sweeps):
        z = r - expand(l, z)
    ud = u_diag if r.ndim == 1 else u_diag[:, None]
    x = z / ud
    for _ in range(tri_sweeps):
        x = (z - expand(u, x)) / ud
    return x


class ILU0Solver(LinearSolver):
    """ILU(0) smoother / preconditioner / stationary solver."""

    def __init__(self, factor_sweeps: int = 3, tri_sweeps: int = 4,
                 omega: float = 1.0, **kw):
        kw.setdefault("max_iterations", 50)
        super().__init__(**kw)
        self.factor_sweeps = factor_sweeps
        self.tri_sweeps = tri_sweeps
        self.omega = omega

    def _factor(self, A: ELLMatrix):
        if getattr(A, "dia", None) is None or A.dia_coef is None:
            return None
        if A.dia.fb_rows.shape[0]:
            return None  # pattern not purely DIA; fall back
        return ilu0_factor(
            A.dia.offsets, A.dia_coef, A.diag, self.factor_sweeps
        )

    def precond_setup(self, A):
        A = prepared(A)
        fac = self._factor(A)
        if fac is None:
            def M(r):
                return A.diag_solve(r)
            return M
        l, u, ud = fac
        tri = self.tri_sweeps

        def M(r):
            return ilu0_apply(l, u, ud, r, tri)

        return M

    def solve_fn(self, A: ELLMatrix, b: jnp.ndarray, x0: jnp.ndarray):
        A, b, recover = condensed(A, b)
        A = prepared(A)
        M = self.precond_setup(A)
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
            r = b - A.mv(x)
            x = x + omega * M(r)
            return (i + 1, x, A.norm(b - A.mv(x)))

        i, x, rn = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, rnorm0))
        return recover(x), SolveStats(i, rnorm0, rn, rn <= target)
