"""Boundary-condition kernels (the GenericBCS equivalent).

TPU-native counterpart of the reference's ``GenericBCS``
(reference: src/fvm/src/modules/fvmbase/GenericBCS.h:77-360 —
applyDirichletBC / applyNeumannBC / applyExtrapolationBC /
applyConvectionBC / applyRadiationBC / applyMixedBC).

Mechanics: every boundary face owns a ghost cell whose row in the system is
the *boundary equation*.  BCs act in two phases, both as functional updates
on static group slices (fixed shapes under jit):

1. patch the per-face flux linearization for the group (e.g. Neumann
   replaces the diffusion flux with the specified flux);
2. patch the ghost-cell rows after assembly (e.g. Dirichlet overwrites the
   ghost row with an identity equation; Robin adds a sink term to the
   natural ghost balance).

Sign conventions follow ops.assembly: A dx = r with A = -dr/dx.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..ops.assembly import FaceFlux
from ..ops.ell import ELLMatrix


def ghost_owner_cells(mesh: DeviceMesh):
    """(n_boundary_faces,) owner cell of each ghost cell (device array)."""
    return mesh.face_cell0[mesh.n_interior_faces :]


def extend_to_ghosts(mesh: DeviceMesh, x: jnp.ndarray) -> jnp.ndarray:
    """Copy owner-cell values into ghost-cell slots (zero-gradient copy).

    Only the boundary-ghost band is touched; on distributed shards the halo
    region beyond it is left alone.
    """
    owners = ghost_owner_cells(mesh)
    gh = slice(
        mesh.n_interior_cells, mesh.n_interior_cells + mesh.n_boundary_faces
    )
    x = x.at[gh].set(x[owners])
    if mesh.periodic_ghost is not None:
        # periodic ghosts mirror the wrapped partner owner instead
        x = x.at[mesh.periodic_ghost].set(x[mesh.periodic_src])
    return x


# ---------------------------------------------------------------------------
# phase 1: per-group face-flux patches
# ---------------------------------------------------------------------------


def set_flux_fixed(flux: FaceFlux, sl: slice, F_values) -> FaceFlux:
    """Replace the face flux on a group with a fixed (explicit) flux.

    Used for Neumann/specified-flux and symmetry (F = 0).
    (reference: applyNeumannBC, GenericBCS.h:129)
    """
    Fv = jnp.broadcast_to(F_values, flux.F[sl].shape)
    return FaceFlux(
        F=flux.F.at[sl].set(Fv),
        dF_dO=flux.dF_dO.at[sl].set(0.0),
        dF_dN=flux.dF_dN.at[sl].set(0.0),
    )


# ---------------------------------------------------------------------------
# phase 2: ghost-row patches (after assembly)
# ---------------------------------------------------------------------------


def dirichlet_rows(
    mesh: DeviceMesh, A: ELLMatrix, r, gc: slice, value, phi, valid=None, scale=None
) -> tuple[ELLMatrix, jnp.ndarray]:
    """Ghost equation: scale * dx_g = scale * (value - phi_g).
    (reference: applyDirichletBC, GenericBCS.h:77)

    ``scale`` (per-face, optional) should be the face transport coefficient
    (gamma_f * e_over_d); scaling the identity row to the magnitude of the
    interior coupling keeps the system well-conditioned for any material
    scale (e.g. permittivities ~1e-11) and makes the Dirichlet block
    symmetric against the interior row's -gamma_f*e_over_d coupling.
    ``valid`` (optional, (count,)) masks padded group slots on distributed
    shards: padded rows become dx_g = 0.
    """
    s = 1.0 if scale is None else jnp.where(jnp.asarray(scale) > 0, scale, 1.0)
    diag = A.diag.at[gc].set(s)
    off = A.off.at[:, gc].set(0.0)
    resid = (value - phi[gc]) * s
    if valid is not None:
        resid = jnp.where(valid, resid, 0.0)
    r = r.at[gc].set(resid if r.ndim == 1 else jnp.broadcast_to(resid, r[gc].shape))
    return A.replace(diag=diag, off=off), r


def extrapolation_rows(
    mesh: DeviceMesh, A: ELLMatrix, r, gc: slice, phi, valid=None, scale=None
) -> tuple[ELLMatrix, jnp.ndarray]:
    """Ghost equation: scale*(dx_g - dx_owner) = scale*(phi_owner - phi_g).
    (reference: applyExtrapolationBC, GenericBCS.h:180)

    Slot 0 of a ghost row is its single face, whose neighbor is the owner.
    ``scale`` as in dirichlet_rows.
    """
    s = 1.0 if scale is None else jnp.where(jnp.asarray(scale) > 0, scale, 1.0)
    diag = A.diag.at[gc].set(s)
    off = A.off.at[:, gc].set(0.0)
    off = off.at[0, gc].set(-s if scale is not None else -1.0)
    owners = ghost_owner_cells(mesh)
    sl0 = gc.start - mesh.n_interior_cells
    sl1 = gc.stop - mesh.n_interior_cells
    own = owners[sl0:sl1]
    resid = (phi[own] - phi[gc]) * s
    if valid is not None:
        resid = jnp.where(valid, resid, 0.0)
    r = r.at[gc].set(resid)
    return A.replace(diag=diag, off=off), r


def periodic_rows(
    mesh: DeviceMesh, A: ELLMatrix, r, gc: slice, phi, psrc, valid=None,
    scale=None,
) -> tuple[ELLMatrix, jnp.ndarray]:
    """IMPLICIT periodic ghost rows: scale*(dx_g - dx_partner) =
    scale*(phi_partner - phi_g).

    The partner-owner coupling lives in the extra ELL slot (slot 1) that
    mesh.device.assemble_device_mesh adds for every periodic ghost, so the
    wrap participates in the linear solve like an interior coupling —
    linear problems converge in ONE outer iteration instead of the
    ~0.7x/iter contraction of lagged ghost pinning (reference treats
    periodic pairs as ordinary implicit coupling, Mesh.h:259-265).
    ``psrc`` is the partner-owner cell per ghost (mesh.periodic_src order
    restricted to this group, as built by Model._periodic_group_src).
    """
    s = 1.0 if scale is None else jnp.where(jnp.asarray(scale) > 0, scale, 1.0)
    diag = A.diag.at[gc].set(s)
    off = A.off.at[:, gc].set(0.0)
    # padded group slots (distributed shards) must NOT get the partner
    # coupling: their slot-1 neighbor is the row itself, which would make
    # the identity row singular (dx_g - dx_g = 0)
    soff = jnp.broadcast_to(
        jnp.asarray(s, A.off.dtype), (gc.stop - gc.start,)
    )
    if valid is not None:
        soff = jnp.where(valid, soff, 0.0)
    off = off.at[1, gc].set(-soff)
    resid = (phi[psrc] - phi[gc]) * s
    if valid is not None:
        resid = jnp.where(valid, resid, 0.0)
    r = r.at[gc].set(resid if r.ndim == 1 else jnp.broadcast_to(resid, r[gc].shape))
    return A.replace(diag=diag, off=off), r


def robin_sink_rows(
    mesh: DeviceMesh, A: ELLMatrix, r, gc: slice, coeff, sink_residual
) -> tuple[ELLMatrix, jnp.ndarray]:
    """Augment the natural ghost balance with an external exchange term.

    For convective BCs (reference: applyConvectionBC, GenericBCS.h:214):
    ghost balance  F_face - h A (phi_g - T_inf) = 0 is the assembled face
    row plus diag += h*A and r += h*A*(T_inf - phi_g).
    ``coeff`` = d(sink)/d(phi_g) >= 0; ``sink_residual`` = current residual
    contribution of the exchange term.
    """
    diag = A.diag.at[gc].add(coeff)
    r = r.at[gc].add(sink_residual)
    return A.replace(diag=diag), r
