"""Slope limiters for higher-order convection.

TPU-native counterparts of the reference's limiter set
(reference: FluxLimiters.h:19-41 vanLeer/superbee/minmod, Limiters.h).
Applied as limited second-order upwind: the deferred correction of
ConvectionDiscretization is scaled by psi(r) with r the ratio of
consecutive gradients.
"""

from __future__ import annotations

import jax.numpy as jnp


def van_leer(r):
    return (r + jnp.abs(r)) / (1.0 + jnp.abs(r))


def minmod(r):
    return jnp.clip(r, 0.0, 1.0)


def superbee(r):
    return jnp.maximum(
        jnp.clip(2.0 * r, 0.0, 1.0), jnp.clip(r, 0.0, 2.0)
    )


LIMITERS = {"vanLeer": van_leer, "minmod": minmod, "superbee": superbee}


def limited_sou_correction(mesh, phi, mass_flux, grad_phi, limiter="vanLeer"):
    """Deferred limited-SOU face-flux correction (add to upwind F).

    r = (2 grad_up . ds) / (phi_D - phi_U) - 1   (standard ratio),
    correction = 0.5 * psi(r) * mdot * (phi_D - phi_U).
    """
    psi = LIMITERS[limiter]
    up_is_owner = mass_flux >= 0
    po = mesh.take_owner(phi)
    pn = mesh.take_nbr(phi)
    phi_U = jnp.where(up_is_owner, po, pn)
    phi_D = jnp.where(up_is_owner, pn, po)
    go = mesh.take_owner(grad_phi)
    gn = mesh.take_nbr(grad_phi)
    g_up = jnp.where(up_is_owner[:, None], go, gn)
    ds = jnp.where(up_is_owner[:, None], mesh.face_ds, -mesh.face_ds)
    dphi = phi_D - phi_U
    denom = jnp.where(jnp.abs(dphi) > 1e-300, dphi, 1e-300)
    r = 2.0 * jnp.einsum("fd,fd->f", g_up, ds) / denom - 1.0
    return 0.5 * psi(r) * mass_flux * dphi
