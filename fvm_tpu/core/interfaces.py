"""Double-shell interface kernels: flux-balance + jump-closure ghost rows.

TPU-native counterpart of the reference's shell-mesh interface linearizers
(reference: LinearizeInterfaceJump.h:24, LinearizeSpeciesInterface.h:24,
BatteryLinearizeSpeciesInterface.h, BatteryLinearizePotentialInterface.h,
LinearizeDielectric.h).  Where the reference inserts a separate shell Mesh
whose cells couple the two bulk meshes, fvm_tpu's ``Mesh.make_interface``
turns each interface face into TWO boundary-like faces with independent
ghost cells (the shell unknowns phi_L, phi_R); the kernels here overwrite
those ghost rows with

  balance row (ghost_L):  F_L + w * F_R = 0
      flux conservation across the interface; F_side is the usual face
      flux LEAVING the bulk owner into the interface, so both sides use
      the standard assembled linearization (dF_dO, dF_dN).  ``w`` carries
      e.g. the transference factor of the battery species closure.

  closure row (ghost_R), one of:
      linear jump:   phi_R = A * phi_L + B      (LinearizeInterfaceJump)
      flux-current:  F_R   = i(phi_L, phi_R)    (Butler-Volmer interfaces)

Slot layout (established by mesh.device.assemble_device_mesh): each shell
ghost row has slot 0 -> its own bulk owner, slot 1 -> the partner ghost,
slot 2 -> the partner bulk owner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interface_slices(mesh, name: str):
    """(fL, fR, gL, gR) slices for the named interface."""
    gl, gr = mesh.interface(name)
    return (
        mesh.group_faces(gl),
        mesh.group_faces(gr),
        mesh.ghost_cells_of_group(gl),
        mesh.ghost_cells_of_group(gr),
    )


def balance_rows(mesh, name, A, r, flux, weight_R=1.0, valid=None):
    """Overwrite the ghost_L rows with the flux-balance equation.

    Row form (A = -dr/dx convention): r = F_L + w F_R, so the diagonal
    -dF_L/dphi_gL = +gamma_L*e/d stays positive like any diffusion row.
    ``valid`` masks padded group slots on distributed shards: padded
    shell-ghost rows become identity equations.
    """
    fL, fR, gL, gR = interface_slices(mesh, name)
    v = jnp.ones(gL.stop - gL.start, bool) if valid is None else valid
    diag = A.diag.at[gL].set(jnp.where(v, -flux.dF_dN[fL], 1.0))
    off = A.off.at[:, gL].set(0.0)
    off = off.at[0, gL].set(jnp.where(v, -flux.dF_dO[fL], 0.0))
    off = off.at[1, gL].set(jnp.where(v, -weight_R * flux.dF_dN[fR], 0.0))
    off = off.at[2, gL].set(jnp.where(v, -weight_R * flux.dF_dO[fR], 0.0))
    r = r.at[gL].set(jnp.where(v, flux.F[fL] + weight_R * flux.F[fR], 0.0))
    return A.replace(diag=diag, off=off), r


def jump_rows(mesh, name, A, r, phi, A_coeff, B_coeff, scale=None, valid=None):
    """Overwrite the ghost_R rows with phi_R = A_coeff * phi_L + B_coeff.

    ``scale`` (typically gamma_R * e/d of the R faces) keeps the row on the
    same footing as the transport rows — unscaled unit rows wreck the
    conditioning for small-diffusivity materials (same reasoning as the
    scaled Dirichlet ghost rows in core.bcs).
    """
    fL, fR, gL, gR = interface_slices(mesh, name)
    s = 1.0 if scale is None else scale
    v = jnp.ones(gR.stop - gR.start, bool) if valid is None else valid
    ones = jnp.ones(gR.stop - gR.start, r.dtype)
    diag = A.diag.at[gR].set(jnp.where(v, s * ones, 1.0))
    off = A.off.at[:, gR].set(0.0)
    off = off.at[1, gR].set(jnp.where(v, -s * A_coeff * ones, 0.0))
    resid = jnp.where(v, s * (A_coeff * phi[gL] + B_coeff - phi[gR]), 0.0)
    r = r.at[gR].set(resid)
    return A.replace(diag=diag, off=off), r


def flux_closure_rows(
    mesh, name, A, r, flux, i_star, dI_dL, dI_dR, urf=1.0, valid=None
):
    """Overwrite the ghost_R rows with the F_R = i(phi_L, phi_R) closure.

    ``i_star`` is the closure flux at the current state and dI_dL/dI_dR its
    derivatives w.r.t. the shell unknowns (all per interface face, in the
    same units as flux.F).  Equation i - F_R = 0 in delta form:
    r = F_R - i_star; diag = dI_dR - dF_R/dphi_gR, with the dI_dR
    contribution dropped when it would weaken the diagonal (the reference's
    guard in BatteryLinearizeSpeciesInterface.h:244-250); ``urf``
    under-relaxes the diagonal (interfaceUnderRelax).
    """
    fL, fR, gL, gR = interface_slices(mesh, name)
    v = jnp.ones(gR.stop - gR.start, bool) if valid is None else valid
    base = -flux.dF_dN[fR]  # positive transport diagonal
    diag_val = (base + jnp.where(dI_dR > 0.0, dI_dR, 0.0)) / urf
    diag = A.diag.at[gR].set(jnp.where(v, diag_val, 1.0))
    off = A.off.at[:, gR].set(0.0)
    off = off.at[0, gR].set(jnp.where(v, -flux.dF_dO[fR], 0.0))
    off = off.at[1, gR].set(jnp.where(v, dI_dL, 0.0))
    r = r.at[gR].set(jnp.where(v, flux.F[fR] - i_star, 0.0))
    return A.replace(diag=diag, off=off), r


def apply_model_interfaces(mesh, interface_cfg, A, r, phi, flux, D_f):
    """Apply balance + closure rows for every interface of ``mesh``.

    ``interface_cfg`` maps interface name -> options dict:
      type "jump" (default): {"A_coeff", "B_coeff"} linear jump
          phi_R = A*phi_L + B (LinearizeInterfaceJump.h:140-142).
      type "flux": {"flux_fn": f} Butler-Volmer-style closure
          F_R = f(phi_L, phi_R) * face_area
        with f an elementwise scalar function returning the PER-AREA
        closure flux leaving the R bulk into the interface; its exact
        per-face derivatives come from jax.grad — the reference hand-codes
        these in BatteryLinearizeSpeciesInterface.h:219-221.
      common: {"weight_R": w} balance-row weight on the R flux (the
        species transference factor), {"urf": u} closure-diagonal
        under-relaxation (interfaceUnderRelax).
    """
    for nm, _, _ in mesh.interfaces:
        cfg = interface_cfg.get(nm, {})
        fL, fR, gL, gR = interface_slices(mesh, nm)
        # padded group slots (distributed shards) carry zero-area dummy
        # faces; their shell-ghost rows must stay identity equations
        valid = mesh.face_area_mag[fL] > 0
        A, r = balance_rows(
            mesh, nm, A, r, flux, weight_R=cfg.get("weight_R", 1.0),
            valid=valid,
        )
        if cfg.get("type", "jump") == "flux":
            ifn = cfg["flux_fn"]
            area = mesh.face_area_mag[fR]
            phiL, phiR = phi[gL], phi[gR]
            i_a, dL_a, dR_a = jax.vmap(
                lambda a, b: (ifn(a, b),) + jax.grad(ifn, (0, 1))(a, b)
            )(phiL, phiR)
            A, r = flux_closure_rows(
                mesh, nm, A, r, flux,
                i_a * area, dL_a * area, dR_a * area,
                urf=cfg.get("urf", 1.0), valid=valid,
            )
        else:
            scale = D_f[fR] * mesh.face_e_over_d[fR]
            A, r = jump_rows(
                mesh, nm, A, r, phi,
                cfg.get("A_coeff", 1.0), cfg.get("B_coeff", 0.0), scale,
                valid=valid,
            )
    return A, r
