"""ShockTube: 1-D compressible Euler mini-model.

TPU-native counterpart of the reference's ShockTube model
(reference: ShockTube.h:12 — a 1-D compressible shock-tube mini-model used
for quick verification).  Redesigned as a jitted explicit FVM with an HLL
approximate Riemann flux and lax.scan time integration (the whole run is
one XLA computation).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class ShockTube:
    """Sod-type shock tube on [0, 1] with nx uniform cells."""

    def __init__(self, nx: int = 100, gamma: float = 1.4):
        self.nx = nx
        self.gamma = gamma
        x = (np.arange(nx) + 0.5) / nx
        self.x = x
        # classic Sod initial condition
        rho = np.where(x < 0.5, 1.0, 0.125)
        p = np.where(x < 0.5, 1.0, 0.1)
        u = np.zeros(nx)
        self.set_state(rho, u, p)

    def set_state(self, rho, u, p):
        g = self.gamma
        rho = jnp.asarray(rho, jnp.float64)
        u = jnp.asarray(u, jnp.float64)
        p = jnp.asarray(p, jnp.float64)
        E = p / (g - 1.0) + 0.5 * rho * u * u
        self.U = jnp.stack([rho, rho * u, E], axis=1)  # (nx, 3)

    def primitives(self):
        g = self.gamma
        rho = self.U[:, 0]
        u = self.U[:, 1] / rho
        E = self.U[:, 2]
        p = (g - 1.0) * (E - 0.5 * rho * u * u)
        return np.asarray(rho), np.asarray(u), np.asarray(p)

    @staticmethod
    def _hll_flux(UL, UR, gamma):
        def flux(U):
            rho = U[:, 0]
            u = U[:, 1] / rho
            E = U[:, 2]
            p = (gamma - 1.0) * (E - 0.5 * rho * u * u)
            return jnp.stack(
                [U[:, 1], U[:, 1] * u + p, (E + p) * u], axis=1
            ), u, p
        FL, uL, pL = flux(UL)
        FR, uR, pR = flux(UR)
        cL = jnp.sqrt(gamma * pL / UL[:, 0])
        cR = jnp.sqrt(gamma * pR / UR[:, 0])
        sL = jnp.minimum(uL - cL, uR - cR)
        sR = jnp.maximum(uL + cL, uR + cR)
        sL = jnp.minimum(sL, 0.0)[:, None]
        sR = jnp.maximum(sR, 0.0)[:, None]
        return (sR * FL - sL * FR + sL * sR * (UR - UL)) / (sR - sL)

    def run(self, t_end: float, cfl: float = 0.45):
        """Advance to t_end with fixed dt chosen from the initial state."""
        g = self.gamma
        nx = self.nx
        dx = 1.0 / nx
        rho = self.U[:, 0]
        u = self.U[:, 1] / rho
        p = (g - 1.0) * (self.U[:, 2] - 0.5 * rho * u * u)
        smax = float(jnp.max(jnp.abs(u) + jnp.sqrt(g * p / rho)))
        # conservative bound: max wave speed roughly doubles through the run
        dt = cfl * dx / (2.0 * smax)
        nsteps = int(np.ceil(t_end / dt))
        dt = t_end / nsteps

        def step(U, _):
            # transmissive boundaries via edge padding
            Upad = jnp.concatenate([U[:1], U, U[-1:]], axis=0)
            UL = Upad[:-1]
            UR = Upad[1:]
            F = self._hll_flux(UL, UR, g)  # (nx+1, 3)
            Unew = U - (dt / dx) * (F[1:] - F[:-1])
            return Unew, None

        U, _ = jax.lax.scan(step, self.U, None, length=nsteps)
        self.U = U
        return self
