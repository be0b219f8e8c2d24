"""Device-resident mesh: struct-of-arrays pytree with static topology metadata.

This is the TPU-native replacement for the reference's Mesh/GeomFields pair
(reference: Mesh.h:49, GeomFields.h:16-54).  The key layout decision is the
padded **ELL cell->face table**: every cell row lists its faces in fixed-width
slots, so matrix/residual assembly from per-face coefficients becomes pure
gathers over static shapes (no scatters, no dynamic shapes — the XLA/TPU fast
path), replacing the reference's CRMatrix PairWiseAssembler scatter loop
(reference: CRMatrix.h:117).

Cells are ordered: interior cells [0, n_interior), then one ghost cell per
boundary face.  Faces: interior first, then contiguous boundary groups.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..config import config
from .mesh import Mesh, FaceGroup
from .metrics import MeshGeometry, compute_geometry


@struct.dataclass
class DeviceMesh:
    # --- static metadata (hashable, part of jit cache key) ---------------
    dim: int = struct.field(pytree_node=False)
    n_cells: int = struct.field(pytree_node=False)  # interior + ghost
    n_interior_cells: int = struct.field(pytree_node=False)
    n_faces: int = struct.field(pytree_node=False)
    n_interior_faces: int = struct.field(pytree_node=False)
    max_faces_per_cell: int = struct.field(pytree_node=False)
    # face groups as tuple of (ident, name, type, offset, count)
    groups: tuple = struct.field(pytree_node=False)

    # --- topology (int32 device arrays) ----------------------------------
    face_cell0: jnp.ndarray  # (nf,) owner
    face_cell1: jnp.ndarray  # (nf,) neighbor (ghost for boundary faces)
    cf_face: jnp.ndarray  # (nc, K) face id per slot (pad: 0)
    cf_is_owner: jnp.ndarray  # (nc, K) bool: this cell is the face's owner
    cf_mask: jnp.ndarray  # (nc, K) bool: slot valid
    cf_nbr: jnp.ndarray  # (nc, K) neighbor cell across slot face (pad: self)

    # --- geometry ---------------------------------------------------------
    face_area: jnp.ndarray  # (nf, dim) owner -> neighbor
    face_area_mag: jnp.ndarray  # (nf,)
    face_centroid: jnp.ndarray  # (nf, dim)
    cell_centroid: jnp.ndarray  # (nc, dim)
    cell_volume: jnp.ndarray  # (nc,)

    # --- derived geometric helpers (precomputed once) ---------------------
    # vector from owner centroid to neighbor centroid per face, and the
    # standard over-relaxed decomposition used by diffusion schemes:
    #   A = E + T,  E = |A|^2/(A.ds) ds  (E parallel to ds, T the
    #   non-orthogonal remainder)
    face_ds: jnp.ndarray  # (nf, dim) x_N - x_O
    face_dsmag: jnp.ndarray  # (nf,)
    face_e_over_d: jnp.ndarray  # (nf,) |A|^2 / (A . ds)  ("orthogonal" coeff)
    face_t: jnp.ndarray  # (nf, dim) non-orthogonal remainder T

    # ---------------------------------------------------------------------

    @property
    def n_boundary_faces(self) -> int:
        return self.n_faces - self.n_interior_faces

    @property
    def interior_faces(self) -> slice:
        return slice(0, self.n_interior_faces)

    def group_by_name(self, name: str):
        for g in self.groups:
            if g[1] == name:
                return g
        raise KeyError(name)

    def boundary_groups(self):
        return [g for g in self.groups if g[2] != "interior"]

    def group_faces(self, g) -> slice:
        return slice(g[3], g[3] + g[4])

    def ghost_cells_of_group(self, g) -> slice:
        """Ghost-cell slice for a boundary group (cells are face-ordered)."""
        start = self.n_interior_cells + (g[3] - self.n_interior_faces)
        return slice(start, start + g[4])


def build_device_mesh(mesh: Mesh, geom: MeshGeometry | None = None, dtype=None) -> DeviceMesh:
    """Bake a host Mesh (+geometry) into the device layout."""
    if geom is None:
        geom = compute_geometry(mesh)
    if dtype is None:
        dtype = config.dtype
    idt = np.int32

    nc, nf = mesh.n_cells, mesh.n_faces
    n_int_c, n_int_f = mesh.n_interior_cells, mesh.n_interior_faces
    owner = mesh.face_cells[:, 0]
    nbr = mesh.face_cells[:, 1]

    # full cell->face table including ghost rows (each ghost: 1 face)
    cf = mesh.cell_faces  # interior cells only
    counts_int = cf.row_counts()
    K = int(counts_int.max())
    cf_face = np.zeros((nc, K), dtype=np.int64)
    cf_mask = np.zeros((nc, K), dtype=bool)
    ell, counts = cf.to_ell(pad_value=0, width=K)
    cf_face[:n_int_c] = ell
    rows = np.repeat(np.arange(n_int_c), counts)
    slots = np.concatenate([np.arange(c) for c in counts]) if n_int_c else np.array([])
    cf_mask[rows.astype(np.int64), slots.astype(np.int64)] = True
    # ghost rows
    bf = np.arange(n_int_f, nf, dtype=np.int64)
    cf_face[n_int_c:, 0] = bf
    cf_mask[n_int_c:, 0] = True

    cf_is_owner = owner[cf_face] == np.arange(nc)[:, None]
    cf_nbr = np.where(cf_is_owner, nbr[cf_face], owner[cf_face])
    cf_nbr = np.where(cf_mask, cf_nbr, np.arange(nc)[:, None])

    # diffusion geometry decomposition
    ds = geom.cell_centroid[nbr] - geom.cell_centroid[owner]
    dsmag = np.linalg.norm(ds, axis=1)
    a_dot_ds = np.einsum("fd,fd->f", geom.face_area, ds)
    amag2 = geom.face_area_mag**2
    e_over_d = amag2 / np.where(a_dot_ds != 0, a_dot_ds, 1.0)
    t_vec = geom.face_area - e_over_d[:, None] * ds

    groups = tuple(
        (g.ident, g.name, g.group_type, g.offset, g.count) for g in mesh.face_groups
    )

    f = lambda x: jnp.asarray(x, dtype=dtype)
    i = lambda x: jnp.asarray(x, dtype=idt)
    b = lambda x: jnp.asarray(x, dtype=bool)

    return DeviceMesh(
        dim=mesh.dim,
        n_cells=nc,
        n_interior_cells=n_int_c,
        n_faces=nf,
        n_interior_faces=n_int_f,
        max_faces_per_cell=K,
        groups=groups,
        face_cell0=i(owner),
        face_cell1=i(nbr),
        cf_face=i(cf_face),
        cf_is_owner=b(cf_is_owner),
        cf_mask=b(cf_mask),
        cf_nbr=i(cf_nbr),
        face_area=f(geom.face_area),
        face_area_mag=f(geom.face_area_mag),
        face_centroid=f(geom.face_centroid),
        cell_centroid=f(geom.cell_centroid),
        cell_volume=f(geom.cell_volume),
        face_ds=f(ds),
        face_dsmag=f(dsmag),
        face_e_over_d=f(e_over_d),
        face_t=f(t_vec),
    )
