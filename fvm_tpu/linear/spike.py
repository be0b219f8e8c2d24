"""SPIKE solver / preconditioner, TPU-native.

Counterpart of the reference's SPIKE banded parallel solver (reference:
src/fvm/src/modules/fvmbase/SpikeSolver.h:21, SpikeMatrix.h:20,
SpikeStorage.h:15): there, each MPI rank factors its local band and the
ranks couple through a small reduced "spike" system at the partition
interfaces.

TPU-native reformulation (truncated SPIKE, Polizzi & Sameh 2006): the
role of "ranks" is played by fixed-length CHUNKS of the tridiagonal band
along the mesh's natural line ordering (slot-major structured meshes
couple x-neighbors at DIA offsets +-1):

  1. every chunk solves its local tridiagonal with a batched Thomas
     sweep (lax.scan over the chunk length, all chunks in the batch
     dimension — the sequential span is L, not n);
  2. the left/right spike tips v = T^-1 e_1, w = T^-1 e_L couple
     adjacent chunks; with diagonal dominance the far tips decay, so the
     reduced system splits into INDEPENDENT 2x2 interface solves (the
     truncated variant) — all interfaces in parallel;
  3. the interior is corrected with the spike vectors.

The off-band couplings (the +-nx diagonals of a 2D mesh) stay with the
outer Krylov iteration, making this a line-relaxation preconditioner —
the standard cure for the stretched/anisotropic meshes the reference
deploys SPIKE on.  Line ends decouple automatically (their +-1
coefficients are zero), so chunk boundaries may fall anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ell import ELLMatrix
from .base import LinearSolver, SolveStats, condensed, prepared


def _thomas(a, d, c, r):
    """Batched Thomas solve of tridiagonal chunks.

    a, d, c: (m, L) sub/diag/super coefficients (a[:, 0] and c[:, -1]
    belong to neighbor chunks and must NOT be included — pass them
    zeroed).  r: (m, L, k) right-hand sides.  Returns x (m, L, k).
    """
    aT = jnp.swapaxes(a, 0, 1)[..., None]  # (L, m, 1)
    dT = jnp.swapaxes(d, 0, 1)[..., None]
    cT = jnp.swapaxes(c, 0, 1)[..., None]
    rT = jnp.swapaxes(r, 0, 1)  # (L, m, k)

    def fwd(carry, inp):
        w_prev, g_prev = carry
        ai, di, ci, ri = inp
        denom = di - ai * w_prev
        denom = jnp.where(jnp.abs(denom) > 0.0, denom, 1.0)
        w = ci / denom
        g = (ri - ai * g_prev) / denom
        return (w, g), (w, g)

    zero_w = jnp.zeros_like(dT[0])
    zero_g = jnp.zeros_like(rT[0])
    _, (w, g) = jax.lax.scan(fwd, (zero_w, zero_g), (aT, dT, cT, rT))

    def bwd(x_next, inp):
        wi, gi = inp
        x = gi - wi * x_next
        return x, x

    _, xT = jax.lax.scan(bwd, jnp.zeros_like(rT[0]), (w, g), reverse=True)
    return jnp.swapaxes(xT, 0, 1)  # (m, L, k)


def spike_apply(a_full, d_full, c_full, r, L):
    """Truncated-SPIKE application M(r) ~ T^-1 r for the global
    tridiagonal T = tridiag(a, d, c) of size n (padded to m*L).

    r: (n,) or (n, k).
    """
    n = d_full.shape[0]
    squeeze = r.ndim == 1
    if squeeze:
        r = r[:, None]
    k = r.shape[1]
    m = -(-n // L)
    pad = m * L - n

    def padv(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        ) if pad else x

    a = padv(a_full, 0.0).reshape(m, L)
    d = padv(d_full, 1.0).reshape(m, L)
    c = padv(c_full, 0.0).reshape(m, L)
    rr = padv(r, 0.0).reshape(m, L, k)

    # couplings that cross chunk boundaries move to the spike RHS
    a_cross = a[:, 0]  # couples chunk j row 0 to chunk j-1 row L-1
    c_cross = c[:, -1]  # couples chunk j row L-1 to chunk j+1 row 0
    a_in = a.at[:, 0].set(0.0)
    c_in = c.at[:, -1].set(0.0)

    # one batched Thomas for [r | a_cross e_1 | c_cross e_L]
    e1 = jnp.zeros((m, L, 1), r.dtype).at[:, 0, 0].set(a_cross)
    eL = jnp.zeros((m, L, 1), r.dtype).at[:, -1, 0].set(c_cross)
    sol = _thomas(a_in, d, c_in, jnp.concatenate([rr, e1, eL], axis=2))
    y = sol[:, :, :k]  # (m, L, k)
    v = sol[:, :, k]  # (m, L) left spike
    w = sol[:, :, k + 1]  # (m, L) right spike

    # truncated reduced system: independent 2x2 solves per interface
    #   b_j     + w_j[L-1] t_{j+1} = y_j[L-1]
    #   v_{j+1}[0] b_j + t_{j+1}   = y_{j+1}[0]
    wL = w[:-1, -1]  # (m-1,)
    v0 = v[1:, 0]
    det = 1.0 - wL * v0
    det = jnp.where(jnp.abs(det) > 0.0, det, 1.0)
    yb = y[:-1, -1, :]  # (m-1, k)
    yt = y[1:, 0, :]
    b = (yb - wL[:, None] * yt) / det[:, None]  # x_j[L-1], j = 0..m-2
    t = (yt - v0[:, None] * yb) / det[:, None]  # x_{j+1}[0]

    # interior correction: x_j = y_j - v_j b_{j-1} - w_j t_{j+1}
    zero = jnp.zeros((1, k), r.dtype)
    b_prev = jnp.concatenate([zero, b], axis=0)  # (m, k): b_{j-1}
    t_next = jnp.concatenate([t, zero], axis=0)  # (m, k): t_{j+1}
    x = y - v[:, :, None] * b_prev[:, None, :] - w[:, :, None] * t_next[:, None, :]
    x = x.reshape(m * L, k)[:n]
    return x[:, 0] if squeeze else x


class SpikeSolver(LinearSolver):
    """Truncated-SPIKE line solver / preconditioner.

    ``chunk``: Thomas chunk length L (the sequential span of the scan;
    the parallel "rank count" is n/L).  Falls back to damped Jacobi when
    the matrix has no DIA +-1 band (e.g. unstructured orderings or
    per-shard matrices), so it stays usable anywhere.
    """

    def __init__(self, chunk: int = 64, omega: float = 1.0, **kw):
        kw.setdefault("max_iterations", 50)
        super().__init__(**kw)
        self.chunk = int(chunk)
        self.omega = omega

    def _band(self, A: ELLMatrix):
        if getattr(A, "dia", None) is None or A.dia_coef is None:
            return None
        if A.dia.fb_rows.shape[0]:
            return None
        offs = [int(o) for o in A.dia.offsets]
        if 1 not in offs or -1 not in offs:
            return None
        a = A.dia_coef[offs.index(-1)]
        c = A.dia_coef[offs.index(1)]
        # roll conventions: dia_coef[o][i] = A[i, i+o]; row 0 has no i-1
        # neighbor and row n-1 no i+1 (their coefficients are zero by
        # construction on line ends)
        a = a.at[0].set(0.0)
        c = c.at[-1].set(0.0)
        return a, A.diag, c

    def precond_setup(self, A):
        A = prepared(A)
        band = self._band(A)
        if band is None:
            def M(r):
                return A.diag_solve(r)

            return M
        a, d, c = band
        L = self.chunk

        def M(r):
            return spike_apply(a, d, c, r, L)

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
