"""Anderson acceleration of fixed-point (outer) iterations.

The SIMPLE outer loop is a relaxed fixed point x_{k+1} = G(x_k) whose
asymptotic contraction at large mesh sizes (~0.989/outer at 1M cells)
dominates time-to-solution (BASELINE.md target #2).  Windowed Anderson
mixing extrapolates over the last ``depth`` iterates:

    f_k = G(x_k) - x_k
    gamma = argmin || f_k - dF gamma ||_2          (depth x depth normal eqs)
    x_{k+1} = G(x_k) - dG gamma

with dF/dG the difference histories of residuals/images.  Everything is
jittable with STATIC shapes: circular buffers (depth, n) plus a step
counter; the normal-equations solve is an on-chip (depth x depth)
gauss_solve.  No reference counterpart (the reference iterates plain
SIMPLE, FlowModel_impl.h:1433); this is a TPU-side solver upgrade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dense import gauss_solve


class Anderson:
    """Windowed Anderson mixing over flattened state vectors."""

    def __init__(self, depth: int = 4, damping: float = 1.0,
                 regularization: float = 1e-10):
        self.depth = int(depth)
        self.damping = float(damping)
        self.reg = float(regularization)

    def init_state(self, n: int, dtype) -> dict:
        m = self.depth
        return {
            "dF": jnp.zeros((m, n), dtype),
            "dG": jnp.zeros((m, n), dtype),
            "f_prev": jnp.zeros((n,), dtype),
            "g_prev": jnp.zeros((n,), dtype),
            "k": jnp.zeros((), jnp.int32),
        }

    def mix(self, astate: dict, x_old: jnp.ndarray, g_new: jnp.ndarray):
        """One Anderson update.  x_old = x_k, g_new = G(x_k); returns
        (x_accelerated, new_astate)."""
        m = self.depth
        beta = self.damping
        f = g_new - x_old
        k = astate["k"]

        # push difference columns once a previous (f, g) pair exists
        slot = jnp.maximum(k - 1, 0) % m
        have_prev = k > 0
        dF = jnp.where(
            have_prev,
            astate["dF"].at[slot].set(f - astate["f_prev"]),
            astate["dF"],
        )
        dG = jnp.where(
            have_prev,
            astate["dG"].at[slot].set(g_new - astate["g_prev"]),
            astate["dG"],
        )
        n_hist = jnp.minimum(k, m)
        valid = (jnp.arange(m) < n_hist).astype(f.dtype)

        # normal equations with Tikhonov regularization scaled to the
        # Gram diagonal (keeps the solve well-posed when columns align).
        # The Gram reductions and the tiny solve run in f64 even for f32
        # states: near convergence the difference columns suffer f32
        # cancellation and a single-precision Gram turns the
        # extrapolation into noise at large n.
        hi = jnp.float64 if jax.config.read("jax_enable_x64") else f.dtype
        validh = valid.astype(hi)
        G_ = jnp.einsum("in,jn->ij", dF, dF, preferred_element_type=hi)
        G_ = G_ * validh[:, None] * validh[None, :]
        scale = jnp.trace(G_) / jnp.maximum(n_hist.astype(hi), 1.0)
        A = G_ + (self.reg * jnp.maximum(scale, 1e-30)
                  + 1e-30) * jnp.eye(m, dtype=hi)
        # dead history rows get identity equations (gamma_j = 0)
        A = A + jnp.diag(1.0 - validh)
        b = jnp.einsum("in,n->i", dF, f, preferred_element_type=hi) * validh
        gamma = gauss_solve(A, b).astype(f.dtype)
        x_acc = g_new - gamma @ dG
        if beta != 1.0:
            x_acc = x_acc - (1.0 - beta) * (f - gamma @ dF)
        # guard: non-finite extrapolation falls back to the plain step
        ok = jnp.isfinite(x_acc).all()
        x_acc = jnp.where(ok, x_acc, g_new)

        new_state = {
            "dF": dF,
            "dG": dG,
            "f_prev": f,
            "g_prev": g_new,
            "k": k + 1,
        }
        return x_acc, new_state
