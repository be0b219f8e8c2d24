"""Discretization kernels: diffusion, convection, transient, source.

TPU-native counterparts of the reference's header-template discretizations
(reference: DiffusionDiscretization.h:31, ConvectionDiscretization.h,
TimeDerivativeDiscretization.h, SourceDiscretization.h).  Each produces a
``FaceFlux`` (linearized two-point face flux) or cell-level (diag, residual)
contributions; a single gather-based ``assemble`` pass builds the system.

All functions are jit-safe: static shapes, no python branching on traced
values.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from .assembly import FaceFlux


def harmonic_face_gamma(mesh: DeviceMesh, gamma_cell: jnp.ndarray) -> jnp.ndarray:
    """Distance-weighted harmonic mean of a cell diffusivity at faces.

    (reference: DiffusionDiscretization.h:19 ``harmonicAverage``)
    Ghost cells should carry a copy of their owner's gamma (or a
    boundary-specific value) before calling.
    """
    go = mesh.take_owner(gamma_cell)
    gn = mesh.take_nbr(gamma_cell)
    # distance weights: fraction of the O->N segment on each side of the
    # face (w = 1 - face_wo, the precomputed owner weight)
    w = 1.0 - mesh.face_wo
    # AD-safe harmonic mean go*gn / ((1-w)*gn + w*go): the double-where
    # keeps jvp tangents finite when a gamma is exactly zero (e.g. lam=0
    # for nu=0 elasticity) — a reciprocal-of-clamp formulation overflows
    # 1/denom^2 in the tangent and poisons solve_tangent with NaNs
    den = (1.0 - w) * gn + w * go
    safe = den > jnp.finfo(den.dtype).tiny
    return jnp.where(safe, go * gn / jnp.where(safe, den, 1.0), 0.0)


def diffusion_flux(
    mesh: DeviceMesh,
    phi: jnp.ndarray,
    gamma_face: jnp.ndarray,
    grad_phi: jnp.ndarray | None = None,
) -> FaceFlux:
    """F = -gamma_f [ e_over_d (phi_N - phi_O) + grad_f . T ]  (per face).

    The second term is the deferred (explicit) non-orthogonal correction
    using the face-averaged gradient; on orthogonal meshes T = 0.
    phi may be (nc,) or (nc, m); gamma_face is (nf,).
    """
    dO = gamma_face * mesh.face_e_over_d
    po = mesh.take_owner(phi)
    pn = mesh.take_nbr(phi)
    if phi.ndim == 1:
        F = -dO * (pn - po)
    else:
        F = -dO[:, None] * (pn - po)
    if grad_phi is not None:
        # grad_phi: (nc, dim) or (nc, m, dim)
        gf = 0.5 * (mesh.take_owner(grad_phi) + mesh.take_nbr(grad_phi))
        corr = jnp.einsum("f...d,fd->f...", gf, mesh.face_t)
        if phi.ndim == 1:
            F = F - gamma_face * corr
        else:
            F = F - gamma_face[:, None] * corr
    return FaceFlux(F=F, dF_dO=dO, dF_dN=-dO)


def convection_flux(
    mesh: DeviceMesh,
    phi: jnp.ndarray,
    mass_flux: jnp.ndarray,
    scheme: str = "upwind",
    grad_phi: jnp.ndarray | None = None,
) -> FaceFlux:
    """F = mdot * phi_face with implicit upwind weighting.

    mass_flux (nf,) is the mass flow rate through each face in the direction
    of the face area vector (owner -> neighbor).
    scheme: 'upwind' (first-order, implicit), 'central', 'sou'
    (deferred second-order upwind), or a limiter name
    ('vanLeer' | 'minmod' | 'superbee') for limited SOU.
    (reference: ConvectionDiscretization.h, FluxLimiters.h:19-41)
    """
    mpos = jnp.maximum(mass_flux, 0.0)
    mneg = jnp.minimum(mass_flux, 0.0)
    if scheme == "central":
        dO = 0.5 * mass_flux
        dN = 0.5 * mass_flux
    else:  # upwind-based
        dO = mpos
        dN = mneg
    po = mesh.take_owner(phi)
    pn = mesh.take_nbr(phi)
    if phi.ndim == 1:
        F = dO * po + dN * pn
    else:
        F = dO[:, None] * po + dN[:, None] * pn
    if scheme in ("vanLeer", "minmod", "superbee") and grad_phi is not None:
        from .limiters import limited_sou_correction

        if phi.ndim == 1:
            F = F + limited_sou_correction(mesh, phi, mass_flux, grad_phi, scheme)
        else:
            for m in range(phi.shape[1]):
                F = F.at[:, m].add(
                    limited_sou_correction(
                        mesh, phi[:, m], mass_flux, grad_phi[:, m], scheme
                    )
                )
    if scheme == "sou" and grad_phi is not None:
        # deferred correction: extrapolate from the upwind cell centroid
        up_is_owner = mass_flux >= 0
        go_, gn_ = mesh.take_owner(grad_phi), mesh.take_nbr(grad_phi)
        co_, cn_ = mesh.take_owner(mesh.cell_centroid), mesh.take_nbr(mesh.cell_centroid)
        sel = up_is_owner.reshape((-1,) + (1,) * (grad_phi.ndim - 1))
        gup = jnp.where(sel, go_, gn_)
        xup = jnp.where(up_is_owner[:, None], co_, cn_)
        dx = mesh.face_centroid - xup
        corr = jnp.einsum("f...d,fd->f...", gup, dx)
        if phi.ndim == 1:
            F = F + mass_flux * corr
        else:
            F = F + mass_flux[:, None] * corr
    return FaceFlux(F=F, dF_dO=dO, dF_dN=dN)


def transient_term(
    mesh: DeviceMesh,
    phi: jnp.ndarray,
    phi_n1: jnp.ndarray,
    dt: float,
    rho_cp: jnp.ndarray | float = 1.0,
    phi_n2: jnp.ndarray | None = None,
):
    """BDF1/BDF2 time derivative as (diag_cell, r_cell) contributions.

    (reference: TimeDerivativeDiscretization.h — N1 state gives first order,
    N2 adds the three-level second-order formula.)
    Returns contributions with A = -dr/dx convention: diag += rho*V/dt,
    r -= rho*V/dt * (phi - phi_n1)  [BDF1].
    """
    V = mesh.cell_volume
    coeff = rho_cp * V / dt  # (nc,)
    if phi_n2 is None:
        dphidt = phi - phi_n1
        diag = coeff
    else:
        dphidt = 1.5 * phi - 2.0 * phi_n1 + 0.5 * phi_n2
        diag = 1.5 * coeff
    if phi.ndim == 1:
        r = -coeff * dphidt
    else:
        r = -coeff[:, None] * dphidt
    return diag, r


def source_term(mesh: DeviceMesh, S: jnp.ndarray | float, dS_dphi=None):
    """Volumetric source S (per volume): r += S*V; optional implicit part.

    Returns (diag_cell, r_cell); diag gets -dS/dphi*V (only when negative,
    for stability — the reference under-relaxes instead).
    (reference: SourceDiscretization.h)
    """
    V = mesh.cell_volume
    if isinstance(S, (int, float)):
        S = jnp.full_like(V, float(S))
    r = (S * V) if S.ndim == 1 else S * V[:, None]
    if dS_dphi is None:
        diag = jnp.zeros_like(V)
    else:
        diag = jnp.maximum(-dS_dphi, 0.0) * V
    return diag, r
