"""OneDConduction: 1-D conduction mini-model.

TPU-native counterpart of the reference's OneDConduction
(reference: OneDConduction.h:26 with testOneDConduction.cpp /
testOneDConductionExactMC.cpp) — solves -d/dx(k dT/dx) = 0 on [0,1] with
T(0)=TL, T(1)=TR, variable k(x), via a jitted Thomas (tridiagonal) solve.
Useful as a fast exact-solution harness (incl. UQ via vmap over k fields,
replacing the reference's polynomial-chaos atype usage here).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def thomas_solve(lower, diag, upper, rhs):
    """Tridiagonal solve via lax.scan (jit/vmap friendly)."""

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a, b, c, d = inp
        denom = b - a * cp_prev
        cp = c / denom
        dp = (d - a * dp_prev) / denom
        return (cp, dp), (cp, dp)

    n = diag.shape[0]
    inputs = (lower, diag, upper, rhs)
    (_, _), (cps, dps) = jax.lax.scan(fwd, (jnp.zeros(()), jnp.zeros(())), inputs)

    def back(x_next, inp):
        cp, dp = inp
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(back, jnp.zeros(()), (cps, dps), reverse=True)
    return xs


class OneDConduction:
    def __init__(self, nx: int = 50, kConst=1.0):
        self.nx = nx
        self.kConst = kConst
        self.TL = 0.0
        self.TR = 0.0

    def setBoundaryTemperatures(self, TL, TR):
        self.TL = float(TL)
        self.TR = float(TR)

    def solve(self, k=None):
        """Return cell temperatures (nx,).  k may be (nx,) cell values."""
        nx = self.nx
        dx = 1.0 / nx
        if k is None:
            k = jnp.full(nx, float(self.kConst))
        else:
            k = jnp.asarray(k)
        # harmonic face conductivities, ghost at walls (half spacing)
        kf = 2.0 * k[:-1] * k[1:] / (k[:-1] + k[1:])  # interior faces
        aW = jnp.concatenate([jnp.zeros(1), -kf / dx])
        aE = jnp.concatenate([-kf / dx, jnp.zeros(1)])
        diag = -(aW + aE)
        rhs = jnp.zeros(nx)
        # wall coupling: face at distance dx/2
        diag = diag.at[0].add(2.0 * k[0] / dx)
        rhs = rhs.at[0].add(2.0 * k[0] / dx * self.TL)
        diag = diag.at[-1].add(2.0 * k[-1] / dx)
        rhs = rhs.at[-1].add(2.0 * k[-1] / dx * self.TR)
        return thomas_solve(aW, diag, aE, rhs)

    def solve_mc(self, k_samples):
        """Monte-Carlo / UQ sweep: vmap the solve over (nsamples, nx) k
        fields (replaces the reference's PC atype for this model)."""
        return jax.vmap(lambda kk: self.solve(kk))(jnp.asarray(k_samples))
