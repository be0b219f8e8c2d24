"""Least-squares cell gradients.

TPU-native counterpart of the reference's gradient machinery
(reference: GradientMatrix.h:31, GradientModel.h:92-106).  The reference
builds a per-cell least-squares "gradient matrix" over the cellCells stencil;
here that becomes a static SLOT-LEADING (K, n_cells, dim) coefficient tensor
aligned with the ELL cell->neighbor table, so a gradient evaluation is one
gather and one einsum:

    grad_c = sum_k  coeff[k, c, :] * (phi_nbr(c,k) - phi_c)

Ghost (boundary) neighbors participate in the stencil, which is what makes
boundary-adjacent gradients first-order accurate (the reference does the
same by including boundary cells in cellCells).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh


def ls_gradient_coefficients(mesh: DeviceMesh):
    """Precompute least-squares gradient coefficients, (K, nc, dim).

    Single-device meshes route to the HOST numpy implementation: the
    coefficients are static per-mesh geometry, and compiling the 1M-cell
    gather/einsum graph through the TPU tunnel costs ~5 minutes of remote
    compile for data that numpy produces in under a second (measured:
    308 s -> 0.7 s at 1024^2).  The jitted device version remains for the
    vmapped distributed path (stacked per-shard meshes).
    """
    if not isinstance(mesh.cf_mask, jnp.ndarray) or mesh.axis_name is None:
        coeff = _ls_gradient_coefficients_host(mesh)  # (n, K, dim)
        return jnp.asarray(
            np.ascontiguousarray(coeff.transpose(1, 0, 2)),
            mesh.cell_volume.dtype,
        )
    return _ls_gradient_coefficients_jnp(mesh)


def _ls_gradient_coefficients_host(mesh) -> np.ndarray:
    if getattr(mesh, "host", None) is not None:
        # device->host readback is ~9 s per 1M-cell array on the TPU
        # tunnel; the build keeps host copies (mesh.device.HostMeshData)
        cc = mesh.host.cell_centroid
        cf_nbr = mesh.host.cf_nbr
        mask = mesh.host.cf_mask
    else:
        cc = np.asarray(mesh.cell_centroid, dtype=np.float64)
        cf_nbr = np.asarray(mesh.cf_nbr).T  # device tables are (K, n)
        mask = np.asarray(mesh.cf_mask).T
    d = cc[cf_nbr] - cc[:, None, :]
    d = np.where(mask[:, :, None], d, 0.0)
    d2 = np.sum(d * d, axis=2)
    w = np.where(mask, 1.0 / np.maximum(d2, 1e-300), 0.0)
    M = np.einsum("nk,nki,nkj->nij", w, d, d, optimize=True)
    scale = np.trace(M, axis1=1, axis2=2)[:, None, None]
    eye = np.eye(mesh.dim)
    Mreg = M + 1e-10 * np.maximum(scale, 1e-300) * eye
    Minv = np.linalg.inv(Mreg)
    coeff = np.einsum("nij,nkj,nk->nki", Minv, d, w, optimize=True)
    cmag = np.linalg.norm(coeff, axis=2)
    cap = 4.0 / np.sqrt(np.maximum(d2, 1e-300))
    with np.errstate(over="ignore"):
        scale_c = np.minimum(1.0, cap / np.maximum(cmag, 1e-30))
    coeff = coeff * scale_c[:, :, None]
    return np.where(mask[:, :, None], coeff, 0.0)


@functools.partial(jax.jit, static_argnames=())
def _ls_gradient_coefficients_jnp(mesh: DeviceMesh) -> jnp.ndarray:
    """Device/jit variant (used under vmap for distributed meshes).

    Weighted LS with w = 1/|d|^2; for each cell solve
    M g = sum w_k dphi_k d_k with M = sum w_k d_k d_k^T, giving
    coeff_k = w_k M^{-1} d_k.  Padded slots get zero coefficients.
    Degenerate rows (ghost cells with one neighbor) fall back to the
    two-point difference along d (handled by Tikhonov regularization of M).
    """
    d = mesh.take_cells(mesh.cell_centroid) - mesh.cell_centroid[None, :, :]
    mask = mesh.cf_mask[:, :, None]  # (K, nc, 1)
    d = jnp.where(mask, d, 0.0)
    d2 = jnp.sum(d * d, axis=2)
    w = jnp.where(mesh.cf_mask, 1.0 / jnp.maximum(d2, 1e-300), 0.0)
    M = jnp.einsum("kn,kni,knj->nij", w, d, d)
    # regularize directions with no information (rank-deficient stencils):
    # adding eps*I leaves well-posed directions untouched and zeroes the
    # gradient along unseen directions instead of blowing up.
    scale = jnp.trace(M, axis1=1, axis2=2)[:, None, None]
    eye = jnp.eye(mesh.dim, dtype=M.dtype)
    Mreg = M + 1e-10 * jnp.maximum(scale, 1e-300) * eye
    from .bell import small_inv

    Minv = small_inv(Mreg)
    coeff = jnp.einsum("nij,knj,kn->kni", Minv, d, w)
    # rank-deficient stencils (ghost cells: one neighbor) leave near-null
    # directions in M whose regularized inverse amplifies fp noise by
    # ~1/eps; physically no coefficient can exceed O(1/|d|), so clamp
    # (unclamped ghost gradients reached 2e4 on skewed tet meshes and
    # destabilized the deferred non-orthogonal correction)
    cmag = jnp.linalg.norm(coeff, axis=2)
    cap = 4.0 / jnp.sqrt(jnp.maximum(d2, 1e-300))
    scale_c = jnp.minimum(1.0, cap / jnp.maximum(cmag, 1e-300))
    coeff = coeff * scale_c[:, :, None]
    return jnp.where(mask, coeff, 0.0)


def gradient(mesh: DeviceMesh, coeff: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Cell gradients: x is (nc,) -> (nc, dim); (nc, m) -> (nc, m, dim).

    ``coeff`` is slot-leading (K, nc, dim)."""
    xn = mesh.take_cells(x)
    if x.ndim == 1:
        dphi = xn - x[None, :]
        return jnp.einsum("kn,kni->ni", dphi, coeff)
    dphi = xn - x[None, :, :]  # (K, nc, m)
    return jnp.einsum("knm,kni->nmi", dphi, coeff)
