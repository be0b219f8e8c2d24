"""Block-ELL sparse matrices: BxB coupling blocks per cell pair.

Counterpart of the reference's CRMatrix instantiations with tensor
diagonal/off-diagonal types (reference: CRMatrix.h:87 with
Diag=DiagTensor/SquareTensor, used by the coupled momentum and battery PC
systems; MatrixOperation.h:9 SquareMatrix inverses).  Unknowns are (n, B)
vectors; the SpMV contracts BxB blocks on the MXU-friendly einsum path.

Used for implicitly coupled vector physics: structure displacement (shear
cross-coupling), coupled pressure-velocity, battery point-coupled systems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def small_inv(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form inverse for (..., B, B) with B in {1, 2, 3}.

    Avoids XLA LU (no f64 lowering on TPU) and is faster than generic
    factorization at these sizes.
    """
    B = M.shape[-1]
    if B == 1:
        return 1.0 / M
    if B == 2:
        a, b = M[..., 0, 0], M[..., 0, 1]
        c, d = M[..., 1, 0], M[..., 1, 1]
        det = a * d - b * c
        inv = jnp.stack(
            [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
        )
        return inv / det[..., None, None]
    if B == 3:
        # adjugate / determinant
        m = M
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        det = m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
        adj = jnp.stack(
            [
                jnp.stack([c00, c10, c20], -1),
                jnp.stack([c01, c11, c21], -1),
                jnp.stack([c02, c12, c22], -1),
            ],
            -2,
        )
        return adj / det[..., None, None]
    if B == 4:
        # blockwise 2x2 Schur complement: M = [[A,B],[C,D]],
        # S = D - C A^-1 B, M^-1 assembled from A^-1 and S^-1.
        # Covers the coupled (u,v,w,p) blocks; the (1,1) "A" corner is the
        # velocity diagonal block, which is SPD-dominant in the systems
        # assembled here, so the pivot-free split is safe.
        A = M[..., :2, :2]
        Bm = M[..., :2, 2:]
        C = M[..., 2:, :2]
        D = M[..., 2:, 2:]
        Ai = small_inv(A)
        S = D - C @ Ai @ Bm
        Si = small_inv(S)
        AiB = Ai @ Bm
        CAi = C @ Ai
        top = jnp.concatenate([Ai + AiB @ Si @ CAi, -AiB @ Si], axis=-1)
        bot = jnp.concatenate([-Si @ CAi, Si], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
    raise NotImplementedError(f"small_inv: B={B}")


@struct.dataclass
class BlockELLMatrix:
    """y_i = diag_i x_i + sum_k off[k,i] x[cols[k,i]]; x is (n, B).

    Slot-leading layout like ELLMatrix: the block planes are contiguous
    per slot."""

    diag: jnp.ndarray  # (n, B, B)
    off: jnp.ndarray  # (K, n, B, B)
    cols: jnp.ndarray  # (K, n)
    mask: jnp.ndarray  # (K, n)
    halo: object = None
    axis_name: str | None = struct.field(pytree_node=False, default=None)
    n_owned: int | None = struct.field(pytree_node=False, default=None)

    @property
    def n(self) -> int:
        return self.diag.shape[0]

    @property
    def block(self) -> int:
        return self.diag.shape[-1]

    def sync(self, x):
        if self.halo is not None and self.axis_name is not None:
            from .halo import halo_exchange

            return halo_exchange(x, self.halo, self.axis_name)
        return x

    def psum(self, v):
        if self.axis_name is not None:
            return jax.lax.psum(v, self.axis_name)
        return v

    def scale_coeffs(self, s):
        """Multiply every stored coefficient by the scalar ``s`` (used by
        linear.base.pow2_equilibrate — exact for powers of two)."""
        return self.replace(diag=self.diag * s, off=self.off * s)

    def dot(self, a, b):
        from . import compdot

        if compdot.use_for(a):
            return compdot.dot(a, b, psum=self.psum)
        return self.psum(jnp.sum(a * b))

    def norm(self, x):
        from . import compdot

        if compdot.use_for(x):
            return compdot.norm(x, psum=self.psum)
        return jnp.sqrt(self.psum(jnp.sum(x * x)))

    def _mask_owned(self, y):
        if self.n_owned is not None and self.n_owned < self.n:
            owned = jnp.arange(self.n) < self.n_owned
            y = jnp.where(owned if y.ndim == 1 else owned[:, None], y, 0.0)
        return y

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.sync(x)
        xn = x[self.cols]  # (K, n, B)
        off = jnp.where(self.mask[:, :, None, None], self.off, 0.0)
        y = jnp.einsum("nij,nj->ni", self.diag, x) + jnp.einsum(
            "knij,knj->ni", off, xn
        )
        return self._mask_owned(y)

    def diag_solve(self, r: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("nij,nj->ni", small_inv(self.diag), r)

    def jacobi_step(self, x, b, omega=1.0):
        return x + omega * self.diag_solve(b - self.mv(x))


def assemble_block(mesh, F, dF_dO, dF_dN, r_cell=None, diag_cell=None):
    """Block analogue of ops.assembly.assemble.

    F: (nf, B) flux leaving owner; dF_dO/dF_dN: (nf, B, B) Jacobian blocks.
    Same conventions: A = -dr/dx, r_c = sources - sum_f s F_f.
    """
    f = mesh.cf_face  # (K, nc)
    own = mesh.cf_is_owner
    mask = mesh.cf_mask
    s = jnp.where(own, 1.0, -1.0)

    dO = dF_dO[f]  # (K, nc, B, B)
    dN = dF_dN[f]
    s4 = s[:, :, None, None]
    m4 = mask[:, :, None, None]
    diag = (jnp.where(m4, s4 * jnp.where(own[:, :, None, None], dO, dN), 0.0)).sum(
        axis=0
    )
    off = jnp.where(m4, s4 * jnp.where(own[:, :, None, None], dN, dO), 0.0)
    if diag_cell is not None:
        diag = diag + diag_cell
    # dead rows -> identity blocks
    alive = mask.any(axis=0)
    B = F.shape[-1]
    eye = jnp.eye(B, dtype=F.dtype)
    diag = jnp.where(alive[:, None, None], diag, eye)

    Ff = F[f]  # (K, nc, B)
    r = -(jnp.where(mask[:, :, None], s[:, :, None] * Ff, 0.0)).sum(axis=0)
    if r_cell is not None:
        r = r + r_cell
    r = jnp.where(alive[:, None], r, 0.0)

    A = BlockELLMatrix(
        diag=diag,
        off=off,
        cols=mesh.cf_nbr,
        mask=mask,
        halo=mesh.halo,
        axis_name=mesh.axis_name,
        n_owned=mesh.n_owned_cells_ if mesh.n_owned_cells_ is not None else None,
    )
    return A, r


def dirichlet_rows_block(mesh, A, r, gc, value, x, valid=None, scale=None):
    """Ghost block rows: scale*I dx_g = scale*(value - x_g)."""
    B = r.shape[-1]
    eye = jnp.eye(B, dtype=r.dtype)
    s = 1.0 if scale is None else jnp.where(jnp.asarray(scale) > 0, scale, 1.0)
    sM = (s[:, None, None] if hasattr(s, "ndim") and getattr(s, "ndim", 0) else s) * eye
    diag = A.diag.at[gc].set(sM)
    off = A.off.at[:, gc].set(0.0)
    resid = (value - x[gc]) * (s[:, None] if hasattr(s, "ndim") and getattr(s, "ndim", 0) else s)
    if valid is not None:
        resid = jnp.where(valid[:, None], resid, 0.0)
    r = r.at[gc].set(resid)
    return A.replace(diag=diag, off=off), r


def transform_rows_block(mesh, A, r, gc, T, x, valid=None, scale=None, extra=None):
    """Ghost block rows enforcing x_g = T x_owner + extra (mirror/projection
    for symmetry, identity for extrapolation; ``extra`` carries e.g. a
    gradient-extrapolation term): s(dx_g - T dx_o) = s(T x_o + extra - x_g).

    The surrogate matrix rows only encode the compact T-coupling; an exact
    Newton operator (jvp of the residual) picks up d(extra)/dx too.
    """
    from ..core.bcs import ghost_owner_cells

    B = r.shape[-1]
    eye = jnp.eye(B, dtype=r.dtype)
    s = 1.0 if scale is None else jnp.where(jnp.asarray(scale) > 0, scale, 1.0)
    sv = s[:, None, None] if hasattr(s, "ndim") and getattr(s, "ndim", 0) else s
    diag = A.diag.at[gc].set(sv * eye)
    off = A.off.at[:, gc].set(0.0)
    off = off.at[0, gc].set(-sv * T)
    owners = ghost_owner_cells(mesh)
    own = owners[gc.start - mesh.n_interior_cells : gc.stop - mesh.n_interior_cells]
    target = jnp.einsum("fij,fj->fi", T, x[own])
    if extra is not None:
        target = target + extra
    resid = (target - x[gc]) * (
        s[:, None] if hasattr(s, "ndim") and getattr(s, "ndim", 0) else s
    )
    if valid is not None:
        resid = jnp.where(valid[:, None], resid, 0.0)
    r = r.at[gc].set(resid)
    return A.replace(diag=diag, off=off), r
