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


def balance_rows(mesh, name, A, r, flux, weight_R=1.0):
    """Overwrite the ghost_L rows with the flux-balance equation.

    Row form (A = -dr/dx convention): r = F_L + w F_R, so the diagonal
    -dF_L/dphi_gL = +gamma_L*e/d stays positive like any diffusion row.
    """
    fL, fR, gL, gR = interface_slices(mesh, name)
    diag = A.diag.at[gL].set(-flux.dF_dN[fL])
    off = A.off.at[gL].set(0.0)
    off = off.at[gL, 0].set(-flux.dF_dO[fL])
    off = off.at[gL, 1].set(-weight_R * flux.dF_dN[fR])
    off = off.at[gL, 2].set(-weight_R * flux.dF_dO[fR])
    r = r.at[gL].set(flux.F[fL] + weight_R * flux.F[fR])
    return A.replace(diag=diag, off=off), r


def jump_rows(mesh, name, A, r, phi, A_coeff, B_coeff, scale=None):
    """Overwrite the ghost_R rows with phi_R = A_coeff * phi_L + B_coeff.

    ``scale`` (typically gamma_R * e/d of the R faces) keeps the row on the
    same footing as the transport rows — unscaled unit rows wreck the
    conditioning for small-diffusivity materials (same reasoning as the
    scaled Dirichlet ghost rows in core.bcs).
    """
    fL, fR, gL, gR = interface_slices(mesh, name)
    s = 1.0 if scale is None else scale
    diag = A.diag.at[gR].set(s * jnp.ones(gR.stop - gR.start, r.dtype))
    off = A.off.at[gR].set(0.0)
    off = off.at[gR, 1].set(-s * A_coeff * jnp.ones(gR.stop - gR.start, r.dtype))
    resid = s * (A_coeff * phi[gL] + B_coeff - phi[gR])
    r = r.at[gR].set(resid)
    return A.replace(diag=diag, off=off), r


def flux_closure_rows(mesh, name, A, r, flux, i_star, dI_dL, dI_dR, urf=1.0):
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
    base = -flux.dF_dN[fR]  # positive transport diagonal
    diag_val = (base + jnp.where(dI_dR > 0.0, dI_dR, 0.0)) / urf
    diag = A.diag.at[gR].set(diag_val)
    off = A.off.at[gR].set(0.0)
    off = off.at[gR, 0].set(-flux.dF_dO[fR])
    off = off.at[gR, 1].set(dI_dL)
    r = r.at[gR].set(flux.F[fR] - i_star)
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
        A, r = balance_rows(
            mesh, nm, A, r, flux, weight_R=cfg.get("weight_R", 1.0)
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
                urf=cfg.get("urf", 1.0),
            )
        else:
            scale = D_f[fR] * mesh.face_e_over_d[fR]
            A, r = jump_rows(
                mesh, nm, A, r, phi,
                cfg.get("A_coeff", 1.0), cfg.get("B_coeff", 0.0), scale,
            )
    return A, r
