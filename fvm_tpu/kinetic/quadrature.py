"""Velocity-space quadrature for discrete-velocity kinetic models.

TPU-native counterpart of the reference's ``Quadrature<T>``
(reference: esbgkbase/Quadrature.h:23 — cartesian and spherical ordinate
sets with weights; the distribution function is stored per ordinate,
DistFunctFields.h:28).

Here the ordinate set is a flat (N, 3) array + weights (N,), so the
distribution function is a single (n_cells, N) array — the ordinate axis
vectorizes on the VPU and shards across devices (the reference's
"direction-by-direction" sweeps become one batched operation).
"""

from __future__ import annotations

import numpy as np


class Quadrature:
    """Cartesian tensor-product Gauss-Hermite ordinates.

    cx/cy/cz: (N,) ordinate velocities (scaled by T0^(1/2) reference
    thermal speed), w: (N,) weights such that sum(w * f_maxwellian) = rho.
    """

    def __init__(self, n1: int = 8, n2: int = 8, n3: int = 8, T0: float = 1.0):
        # Gauss-Hermite nodes/weights for weight exp(-x^2)
        x1, w1 = np.polynomial.hermite.hermgauss(n1)
        x2, w2 = np.polynomial.hermite.hermgauss(n2)
        x3, w3 = np.polynomial.hermite.hermgauss(n3)
        s = np.sqrt(T0)  # thermal scaling
        CX, CY, CZ = np.meshgrid(x1 * s * np.sqrt(2), x2 * s * np.sqrt(2),
                                 x3 * s * np.sqrt(2), indexing="ij")
        WX, WY, WZ = np.meshgrid(w1, w2, w3, indexing="ij")
        self.c = np.stack([CX.ravel(), CY.ravel(), CZ.ravel()], axis=1)
        # Gauss-Hermite approximates int e^{-x^2} g dx = sum w g(x); with
        # c = sqrt(2 T0) x the velocity-space integral becomes
        #   int F(c) dc = (2 T0)^{3/2} sum w1w2w3 e^{|c|^2/(2T0)} F(c)
        # so the exponential is folded into the effective weight.
        c2 = (self.c**2).sum(axis=1)
        self.w = (WX * WY * WZ).ravel() * np.exp(c2 / (2.0 * T0)) * (
            (2.0 * T0) ** 1.5
        )
        self.N = self.c.shape[0]
        self.T0 = T0

    def maxwellian(self, rho, u, T):
        """Discrete Maxwellian at the ordinates.

        rho: (...,), u: (..., 3), T: (...,) -> f: (..., N)
        """
        import jax.numpy as jnp

        c = jnp.asarray(self.c)  # (N, 3)
        du = c[None, :, :] - jnp.asarray(u)[..., None, :]
        c2 = jnp.sum(du * du, axis=-1)
        rho = jnp.asarray(rho)[..., None]
        T = jnp.asarray(T)[..., None]
        return rho / (2.0 * jnp.pi * T) ** 1.5 * jnp.exp(-c2 / (2.0 * T))

    @staticmethod
    def spherical(n_r: int = 8, n_polar: int = 6, n_azimuthal: int = 8,
                  T0: float = 1.0, r_max: float = 6.0):
        """Spherical-coordinate ordinates (reference Quadrature.h spherical
        mode): Gauss-Legendre radial shells x S_N angular directions.

        Useful for flows where angular resolution matters more than the
        cartesian tensor structure (no specular-mirror permutation
        support: use cartesian for symmetry planes).
        """
        from .phonon import sn_directions

        q = Quadrature.__new__(Quadrature)
        xr, wr = np.polynomial.legendre.leggauss(n_r)
        rmax = r_max * np.sqrt(T0)
        r = 0.5 * rmax * (xr + 1.0)
        wr = 0.5 * rmax * wr
        s, ws = sn_directions(n_polar, n_azimuthal)
        q.c = (r[:, None, None] * s[None, :, :]).reshape(-1, 3)
        q.w = (wr[:, None] * r[:, None] ** 2 * ws[None, :]).reshape(-1)
        q.N = q.c.shape[0]
        q.T0 = T0
        return q

    def moments(self, f):
        """Conserved moments: rho (..., ), momentum (.., 3), energy."""
        import jax.numpy as jnp

        w = jnp.asarray(self.w)
        c = jnp.asarray(self.c)
        rho = jnp.sum(f * w, axis=-1)
        mom = jnp.einsum("...n,n,nd->...d", f, w, c)
        e = 0.5 * jnp.einsum("...n,n,n->...", f, w, jnp.sum(c * c, axis=1))
        return rho, mom, e
