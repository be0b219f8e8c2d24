"""Linear solver interfaces.

Mirrors the reference's ``LinearSolver`` base (reference: LinearSolver.h:15-35):
relative/absolute tolerances, max iterations, verbosity.  Solvers here are
functional at the core — ``solve_fn(A, b, x0) -> (x, stats)`` is jittable and
usable inside larger jitted model steps; the object layer holds options and
mirrors the reference driver API
(``options.linearSolver = fvm_tpu.linear.AMG(...)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.ell import ELLMatrix


@struct.dataclass
class SolveStats:
    iterations: jnp.ndarray  # int32 scalar
    residual0: jnp.ndarray  # initial residual norm
    residual: jnp.ndarray  # final residual norm
    converged: jnp.ndarray  # bool scalar


def norm(x: jnp.ndarray) -> jnp.ndarray:
    """Frobenius norm over all components (reference uses per-field L2)."""
    return jnp.sqrt(jnp.sum(x * x))


def prepared(A):
    """Precompute DIA coefficients once per solve (no-op for operators)."""
    return A.prepare() if hasattr(A, "prepare") else A


def condensed(A, b):
    """Boundary-row condensation at solve entry (no-op for operators).

    Returns (A', b', recover); solvers apply recover to the solution."""
    if hasattr(A, "condense"):
        return A.condense(b)
    return A, b, (lambda x: x)


def pow2_equilibrate(A, b, x0):
    """Exact power-of-two scaling of a solve, for emulated-f64 backends.

    The axon TPU emulates f64 with an f32-grade EXPONENT range: on
    physically-scaled systems (eps0 ~ 1e-11 electrostatics rows) the
    BiCGStab recurrence scalars rho = |r|^2 and tt = |t|^2 fall below
    the f32 subnormal floor once the absolute residual passes ~1e-19,
    and the iteration breaks down (measured round-5 closeout: the
    cav_tetra f64 floor pinned at rel ~2.3e-8 = sqrt(f32_min_normal) /
    |r0| with FULLY compensated dot/SpMV/vector paths — an exponent-
    RANGE artifact, not a precision one).  Power-of-two scaling is
    exact in binary floating point: solving (2^-kA A) y = (2^-kb b)
    walks a bit-identically scaled trajectory with every internal
    magnitude near O(1).

    Returns (A2, b2, x02, unscale, nscale): iterate on (A2, b2) from
    x02; ``unscale(y)`` restores solution units; reported residual
    norms multiply by ``nscale``.  No-op unless the dtype is f64, the
    backend emulates f64 (ops.compdot.enabled), and A exposes
    scale_coeffs (assembled matrices; matrix-free operators pass
    through).  Non-finite entries (dead padded dist rows) are ignored
    when picking the scale.
    """
    from ..ops import compdot

    one = jnp.ones((), b.dtype)
    if (
        b.dtype != jnp.float64
        or not compdot.enabled()
        or not hasattr(A, "scale_coeffs")
    ):
        return A, b, x0, (lambda y: y), one

    ax = getattr(A, "axis_name", None)

    def _absmax(v):
        m = jnp.max(jnp.where(jnp.isfinite(v), jnp.abs(v), 0.0))
        if ax is not None:
            m = jax.lax.pmax(m, ax)
        return m

    def _k(m):
        return jnp.where(m > 0, jnp.floor(jnp.log2(m)), 0.0).astype(b.dtype)

    kA = _k(_absmax(A.diag))
    kb = _k(_absmax(b))
    A2 = A.scale_coeffs(jnp.exp2(-kA))
    b2 = b * jnp.exp2(-kb)
    x02 = x0 * jnp.exp2(kA - kb)
    return (
        A2, b2, x02,
        (lambda y: y * jnp.exp2(kb - kA)),
        jnp.exp2(kb),
    )


class MatrixFreeOperator:
    """Exact-Jacobian operator via jax.jvp, with a surrogate matrix for
    preconditioning and reductions.

    The TPU/JAX-native replacement for hand-linearized Jacobians: models
    define a residual function R(x) and get A v = -dR/dx . v exactly from
    forward-mode AD (the role the reference's Tangent atype plays for
    sensitivities, atypes/tangent_double).  ``surrogate`` is an assembled
    ELL/BlockELL approximation used for diag_solve/preconditioning and for
    distribution-aware dot/norm.
    """

    def __init__(self, mv_fn, surrogate):
        self._mv = mv_fn
        self.surrogate = surrogate

    def mv(self, x):
        return self._mv(x)

    def dot(self, a, b):
        return self.surrogate.dot(a, b)

    def norm(self, x):
        return self.surrogate.norm(x)

    def psum(self, v):
        return self.surrogate.psum(v)

    def diag_solve(self, r):
        return self.surrogate.diag_solve(r)

    def jacobi_step(self, x, b, omega=1.0):
        return x + omega * self.diag_solve(b - self.mv(x))


def newton_operator(residual_fn, x):
    """A v = -dR/dx|_x . v via one jvp (linearized once at x)."""
    import jax

    def mv(v):
        return -jax.jvp(residual_fn, (x,), (v,))[1]

    return mv


class TransposedOperator:
    """A^T as a solver-facing operator (adjoint systems).

    FVM matrices are structurally symmetric (owner/neighbor face pairs),
    so diag(A^T) == diag(A) and the Jacobi preconditioner is shared; the
    matvec is the EXACT transpose obtained by ``jax.linear_transpose`` of
    ``A.mv`` — which covers the distributed operator too: the transpose of
    the halo refresh (all_to_all + scatter) is the REVERSED exchange that
    folds halo-slot cotangents back onto their owner cells, and the
    transpose of the owned-row mask keeps each global row counted once.
    Used by ``LinearSolver.transpose_solve_fn`` for the reverse-mode path
    that the reference's forward-only Tangent atype
    (atypes/tangent_double/atype.h:10) has no counterpart for.
    """

    def __init__(self, A):
        # the packed Pallas DIA kernel has no transpose rule; drop it so
        # linear_transpose goes through the XLA roll path
        if getattr(A, "dia_pk", None) is not None:
            A = A.replace(dia_pk=None)
        self._A = A

    @property
    def n(self):
        return self._A.n

    def mv(self, x):
        import jax

        (y,) = jax.linear_transpose(self._A.mv, x)(x)
        return y

    def dot(self, a, b):
        return self._A.dot(a, b)

    def norm(self, x):
        return self._A.norm(x)

    def psum(self, v):
        return self._A.psum(v)

    def diag_solve(self, r):
        return self._A.diag_solve(r)

    def jacobi_step(self, x, b, omega=1.0):
        return x + omega * self.diag_solve(b - self.mv(x))


class TransposedPrecond:
    """M^{-T} from a preconditioner that knows its own transpose.

    Preconditioners expose ``precond_setup_T`` returning the transposed
    application r -> M^{-T} r (exact for the closed-form Woodbury;
    symmetric cycles reuse themselves) — exactly as good for the
    transposed system as the original is for the primal.  Used by the
    kinetic adjoint solves to reuse the Woodbury(+DSA) composition on
    A^T.  (``jax.linear_transpose`` of the application is NOT usable
    here: the Gauss-elimination small solves mix constant matrix columns
    and linear rhs columns in one augmented array, which the linearity
    checker rejects.)"""

    def __init__(self, inner, example=None):
        self._inner = inner

    def precond_setup(self, op):
        return self._inner.precond_setup_T(op)


class LinearSolver:
    """Base options holder (reference: LinearSolver.h:22-35)."""

    def __init__(
        self,
        relative_tolerance: float = 1e-8,
        absolute_tolerance: float = 1e-50,
        max_iterations: int = 100,
        verbosity: int = 0,
    ):
        self.relativeTolerance = relative_tolerance
        self.absoluteTolerance = absolute_tolerance
        self.nMaxIterations = max_iterations
        self.verbosity = verbosity

    # subclasses implement: solve_fn(A, b, x0) -> (x, SolveStats)
    def solve_fn(self, A: ELLMatrix, b: jnp.ndarray, x0: jnp.ndarray):
        raise NotImplementedError

    def transpose_solve_fn(self, A, b):
        """Solve A^T y = b (adjoint systems).

        AMG/ILU hierarchies are set up for A, not A^T, so the adjoint
        path runs Jacobi-preconditioned BiCGStab on the exact transpose
        operator (the two share the diagonal).  Works distributed too:
        ``TransposedOperator.mv`` transposes the halo exchange (reversed
        all_to_all folding halo cotangents onto owners) and the Krylov
        reductions psum across shards exactly as in the forward solve.
        """
        from .krylov import BiCGStab, JacobiSolver

        solver = BiCGStab(
            preconditioner=JacobiSolver(sweeps=3),
            relative_tolerance=min(self.relativeTolerance, 1e-10),
            absolute_tolerance=self.absoluteTolerance,
            max_iterations=max(self.nMaxIterations * 4, 400),
        )
        y, _ = solver.solve_fn(TransposedOperator(A), b, jnp.zeros_like(b))
        return y

    def solve_fn_implicit(self, A, b, x0, transposable: bool = False):
        """AD-correct solve via lax.custom_linear_solve.

        Differentiating through an adaptive Krylov while_loop gives zero
        tangents when the loop exits at the primal solution; implicit
        differentiation solves the tangent system with the same solver
        instead (the reference gets the same effect from recompiling with
        the Tangent atype, atypes/tangent_double).  Stats are not
        returned.

        ``transposable=True`` additionally registers a transpose solve so
        reverse-mode AD (adjoint sensitivities) works through the solve;
        it is opt-in because custom_linear_solve traces the transpose
        solver eagerly, which would inflate every forward-only graph.
        """
        import jax

        def mv(x):
            return A.mv(x)

        def slv(matvec, bb):
            x, _ = self.solve_fn(A, bb, jnp.zeros_like(bb))
            return x

        kw = {}
        if transposable:

            def slv_t(vecmat, bb):
                return self.transpose_solve_fn(A, bb)

            kw["transpose_solve"] = slv_t
        x = jax.lax.custom_linear_solve(mv, b, slv, **kw)
        return x, None

    def solve(self, A: ELLMatrix, b: jnp.ndarray, x0: jnp.ndarray | None = None):
        if x0 is None:
            x0 = jnp.zeros_like(b)
        x, stats = self.solve_fn(A, b, x0)
        if self.verbosity > 0:
            print(
                f"{type(self).__name__}: iters={int(stats.iterations)} "
                f"r0={float(stats.residual0):.3e} r={float(stats.residual):.3e}"
            )
        return x, stats
