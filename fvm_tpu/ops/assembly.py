"""Face-flux linearization and gather-based assembly.

TPU-native replacement for the reference's Discretization/Linearizer pipeline
(reference: Discretization.h:15-24, Linearizer.h:16-23, CRMatrix.h:117
``PairWiseAssembler``).  Instead of scatter-assembling a CSR matrix face by
face, every discretization accumulates three per-face arrays

    F       : flux of the conserved quantity leaving the owner cell
    dF_dO   : d F / d phi_owner
    dF_dN   : d F / d phi_neighbor

and a single ``assemble`` pass turns them into an ELL matrix + residual with
pure gathers over the cell->face table.

Conventions (defect-correction / Newton form, matching the reference's
LinearSystem semantics of solving for a delta):

    cell residual  r_c = S_c V_c - sum_f s_cf F_f          (want r -> 0)
    matrix         A = -dr/dx  (positive diagonal for diffusion)
    solve          A dx = r,   x <- x + dx
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..mesh.device import DeviceMesh
from .ell import ELLMatrix


@struct.dataclass
class FaceFlux:
    """Accumulated per-face flux linearization (all (nf,) or (nf, m) for F)."""

    F: jnp.ndarray
    dF_dO: jnp.ndarray
    dF_dN: jnp.ndarray

    def __add__(self, other: "FaceFlux") -> "FaceFlux":
        return FaceFlux(
            self.F + other.F,
            self.dF_dO + other.dF_dO,
            self.dF_dN + other.dF_dN,
        )

    @staticmethod
    def zeros(n_faces: int, m: int | None = None, dtype=jnp.float64) -> "FaceFlux":
        shape = (n_faces,) if m is None else (n_faces, m)
        return FaceFlux(
            jnp.zeros(shape, dtype),
            jnp.zeros(n_faces, dtype),
            jnp.zeros(n_faces, dtype),
        )


def assemble(mesh: DeviceMesh, flux: FaceFlux, r_cell=None, diag_cell=None):
    """Build (A, r) from per-face linearized fluxes + optional cell terms.

    r_cell : (nc,) or (nc, m) residual contributions already including
             source * volume and transient terms.
    diag_cell : (nc,) extra diagonal of A from cell terms (= -dS/dx * V etc).

    Ghost-cell rows receive their face-balance contribution here and are
    expected to be *overwritten* by boundary-condition kernels afterwards
    (the reference's GenericBCS writes the boundary equations the same way,
    GenericBCS.h:77-360).
    """
    f = mesh.cf_face  # (K, nc) slot-leading
    own = mesh.cf_is_owner
    mask = mesh.cf_mask

    dO = mesh.take_faces(flux.dF_dO)
    dN = mesh.take_faces(flux.dF_dN)
    # A = -dr/dx; r_c includes -s_cf F_f with s = +1 for the owner side
    # => A_cc += s * dF/dphi_c ; A_c,nbr += s * dF/dphi_nbr
    s = jnp.where(own, 1.0, -1.0)
    diag_contrib = jnp.where(mask, s * jnp.where(own, dO, dN), 0.0)
    off = jnp.where(mask, s * jnp.where(own, dN, dO), 0.0)

    diag = diag_contrib.sum(axis=0)
    if diag_cell is not None:
        diag = diag + diag_cell
    # rows with no valid face slot (padding cells on distributed shards)
    # get an identity equation so the system stays nonsingular
    alive = mask.any(axis=0)
    diag = jnp.where(alive, diag, 1.0)

    Ff = mesh.take_faces(flux.F)  # (K, nc) or (K, nc, m)
    if Ff.ndim == 3:
        s_ = s[:, :, None]
        m_ = mask[:, :, None]
    else:
        s_, m_ = s, mask
    r = -(jnp.where(m_, s_ * Ff, 0.0)).sum(axis=0)
    if r_cell is not None:
        r = r + r_cell
    r = jnp.where(alive if r.ndim == 1 else alive[:, None], r, 0.0)

    A = ELLMatrix(
        diag=diag,
        off=off,
        cols=mesh.cf_nbr,
        mask=mask,
        halo=mesh.halo,
        axis_name=mesh.axis_name,
        n_owned=mesh.n_owned_cells_ if mesh.n_owned_cells_ is not None else None,
        dia=mesh.dia,
    )
    return A, r


def identity_unowned_rows(mesh: DeviceMesh, A: ELLMatrix, r):
    """Overwrite halo/padding rows (cells >= n_owned) with identity
    equations and zero residual.  No-op on single-device meshes."""
    if mesh.n_owned_cells_ is None or mesh.n_owned_cells >= mesh.n_cells:
        return A, r
    sl = slice(mesh.n_owned_cells, mesh.n_cells)
    A = A.replace(diag=A.diag.at[sl].set(1.0), off=A.off.at[:, sl].set(0.0))
    r = r.at[sl].set(0.0)
    return A, r


def face_values(mesh: DeviceMesh, x: jnp.ndarray, weight=0.5):
    """Linear two-point interpolation of a cell field to faces."""
    xo = mesh.take_owner(x)
    xn = mesh.take_nbr(x)
    return weight * xn + (1.0 - weight) * xo


def cells_to_faces_distance_weighted(mesh: DeviceMesh, x: jnp.ndarray):
    """Interpolate using inverse-distance weights from cell centroids."""
    wo = mesh.face_wo.reshape((-1,) + (1,) * (x.ndim - 1))
    return wo * mesh.take_owner(x) + (1.0 - wo) * mesh.take_nbr(x)


def dirichlet_cells(A: ELLMatrix, r, mask, value, phi):
    """Pin a set of cells (immersed-boundary/solid regions) to a value.

    ``mask``: (nc,) bool; rows become scale*(dx = value - phi) with scale
    taken from the existing diagonal magnitude to preserve conditioning.
    The ELL-native equivalent of the reference's GenericIBDiscretization
    (GenericIBDiscretization.h).
    """
    s = jnp.where(jnp.abs(A.diag) > 0, jnp.abs(A.diag), 1.0)
    diag = jnp.where(mask, s, A.diag)
    off = jnp.where(mask[None, :], 0.0, A.off)
    if r.ndim == 1:
        r = jnp.where(mask, s * (value - phi), r)
    elif jnp.ndim(value) == 2:
        # vector unknowns with a vector pin value (e.g. body velocity)
        r = jnp.where(mask[:, None], s[:, None] * (value - phi), r)
    else:
        r = jnp.where(mask[:, None], (s * (value - phi))[:, None], r)
    return A.replace(diag=diag, off=off), r


def ib_stencil_rows_implicit(
    A: ELLMatrix, r, ib_cells, fluid_idx, fw, ww, value, phi,
    cols_ext, mask_ext, dia_ext=None, valid=None,
):
    """IMPLICIT immersed-boundary interpolation rows.

    The IB-band equation  phi_IB = (ww*phi_wall + sum_j fw_j*phi_fj) / W
    goes INTO the matrix: the stencil's fluid-cell couplings occupy
    ``k`` appended ELL slots (``cols_ext``/``mask_ext`` are the widened
    static structure built at set_immersed_boundary time), so the Newton/
    Picard update solves the IB band and the fluid simultaneously — the
    reference's GenericIBDiscretization.h formulation, replacing the
    lagged pinned-row variant (first-order in the outer iteration).

    ``phi``/``value``: (n,) or (n, m).  ``valid``: optional (n_ib,) bool —
    False entries are padding (distributed shards pad their stencil
    tables to a uniform static length with the dead dummy cell) and leave
    their target rows untouched.  Returns the widened (A, r).
    """
    K, n = A.off.shape
    k = fluid_idx.shape[1]
    if valid is None:
        valid = jnp.ones(ib_cells.shape, bool)
    s_full = jnp.where(jnp.abs(A.diag) > 0, jnp.abs(A.diag), 1.0)
    band = jnp.zeros(n, bool).at[ib_cells].max(valid)
    s = s_full[ib_cells]
    W = ww + jnp.sum(fw, axis=1)
    if phi.ndim == 1:
        interp = (ww * value[ib_cells]
                  + jnp.sum(fw * phi[fluid_idx], axis=1)) / W
        resid = s * (interp - phi[ib_cells])
        rs = jnp.zeros_like(r).at[ib_cells].set(
            jnp.where(valid, resid, 0.0))
        r = jnp.where(band, rs, r)
    else:
        interp = (ww[:, None] * value[ib_cells]
                  + jnp.einsum("ik,ikm->im", fw, phi[fluid_idx])) / W[:, None]
        resid = s[:, None] * (interp - phi[ib_cells])
        rs = jnp.zeros_like(r).at[ib_cells].set(
            jnp.where(valid[:, None], resid, 0.0))
        r = jnp.where(band[:, None], rs, r)
    diag = jnp.where(band, s_full, A.diag)
    off0 = jnp.where(band[None, :], 0.0, A.off)
    off_ext = jnp.zeros((k, n), A.off.dtype).at[:, ib_cells].set(
        jnp.where(valid[:, None], -s[:, None] * fw / W[:, None], 0.0).T
    )
    A2 = A.replace(
        diag=diag,
        off=jnp.concatenate([off0, off_ext], axis=0),
        cols=cols_ext,
        mask=mask_ext,
        dia=dia_ext,
        dia_coef=None,
        dia_fb_vals=None,
        dia_pk=None,
    )
    return A2, r
