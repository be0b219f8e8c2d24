"""Immersed-boundary manager: cell marking + interpolation stencils.

TPU-native counterpart of the reference's IBManager
(reference: IBManager.h:57 — update() :68 runs markIntersections ->
markIBTypePlus -> createIBFaces -> createIBInterpolationStencil;
ibType lives in GeomFields.ibType; GenericIBDiscretization.h consumes the
stencils).

Pipeline here (host side, import/update time):
  1. classify cell centroids against the immersed closed surface
     (AABB parity test, reference markIntersections+flood fill);
  2. IB cells = fluid cells adjacent to solid cells;
  3. the result is a per-cell type array (FLUID/IB/SOLID) plus, for each
     IB cell, the nearest surface point and a Dirichlet mask usable by any
     model (models apply solid/IB values through identity rows — the
     ELL-native equivalent of GenericIBDiscretization).
"""

from __future__ import annotations

import numpy as np

from .search import AABB, KSearchTree


class IBType:
    FLUID = 0
    IB = 1
    SOLID = 2


def cell_mark_particles(mesh, points, radius, geom=None):
    """Mark cells against a particle cloud (reference: CellMark module,
    CellMark_impl.h — marks MPM particle-covered cells; used by the
    MPM/fluid coupling).  A cell is SOLID when its centroid lies within
    ``radius`` of any particle; fluid cells adjacent to solid become the
    IB band.  Returns a per-cell ibType array (interior + ghosts).
    """
    from ..mesh.metrics import compute_geometry

    geom = geom or compute_geometry(mesh)
    n_int = mesh.n_interior_cells
    cc = geom.cell_centroid[:n_int]
    pts = np.asarray(points, dtype=float)
    if pts.ndim != 2 or len(pts) == 0:
        raise ValueError("cell_mark_particles: points must be (n, dim)")
    tree = KSearchTree(pts)
    d, _ = tree.query_batch(cc, 1)
    d = np.asarray(d).reshape(-1)
    t = np.where(d <= radius, IBType.SOLID, IBType.FLUID).astype(np.int32)

    owner = mesh.face_cells[: mesh.n_interior_faces, 0]
    nbr = mesh.face_cells[: mesh.n_interior_faces, 1]
    solid = t == IBType.SOLID
    adj = np.zeros(n_int, dtype=bool)
    m = (~solid[owner]) & solid[nbr]
    adj[owner[m]] = True
    m2 = (~solid[nbr]) & solid[owner]
    adj[nbr[m2]] = True
    t[adj & ~solid] = IBType.IB

    full = np.full(mesh.n_cells, IBType.FLUID, dtype=np.int32)
    full[:n_int] = t
    bfaces = np.arange(mesh.n_interior_faces, mesh.n_faces)
    full[n_int:] = full[mesh.face_cells[bfaces, 0]]
    return full


class IBManager:
    def __init__(self, mesh, geom=None):
        """mesh: host Mesh; geom: MeshGeometry (computed if omitted)."""
        from ..mesh.metrics import compute_geometry

        self.mesh = mesh
        self.geom = geom or compute_geometry(mesh)
        self.ib_type = np.full(mesh.n_cells, IBType.FLUID, dtype=np.int32)
        self.surface = None

    def update(self, vertices: np.ndarray, elements: np.ndarray) -> np.ndarray:
        """(Re)mark cells against an immersed closed surface.

        Returns the per-cell ibType array (interior cells; ghosts copy
        their owner).  (reference: IBManager::update, IBManager.h:68)
        """
        mesh, geom = self.mesh, self.geom
        self.surface = AABB(vertices, elements)
        n_int = mesh.n_interior_cells
        cc = geom.cell_centroid[:n_int]
        inside = self.surface.is_inside(cc)
        t = np.where(inside, IBType.SOLID, IBType.FLUID).astype(np.int32)

        # IB band: fluid cells adjacent to a solid cell
        owner = mesh.face_cells[: mesh.n_interior_faces, 0]
        nbr = mesh.face_cells[: mesh.n_interior_faces, 1]
        solid = t == IBType.SOLID
        adj_solid = np.zeros(n_int, dtype=bool)
        m = (~solid[owner]) & solid[nbr]
        adj_solid[owner[m]] = True
        m2 = (~solid[nbr]) & solid[owner]
        adj_solid[nbr[m2]] = True
        t[adj_solid & ~solid] = IBType.IB

        full = np.full(mesh.n_cells, IBType.FLUID, dtype=np.int32)
        full[:n_int] = t
        # ghosts inherit owner type
        bfaces = np.arange(mesh.n_interior_faces, mesh.n_faces)
        full[n_int:] = full[mesh.face_cells[bfaces, 0]]
        self.ib_type = full

        # nearest surface element centroid for each IB cell (stencil seed)
        surf_c = self.surface.v[self.surface.e].mean(axis=1)
        tree = KSearchTree(surf_c)
        ib_cells = np.nonzero(t == IBType.IB)[0]
        if len(ib_cells):
            _, nearest = tree.query_batch(cc[ib_cells], 1)
            self.ib_cells = ib_cells
            self.ib_nearest_element = np.atleast_1d(nearest)
        else:
            self.ib_cells = ib_cells
            self.ib_nearest_element = np.array([], dtype=np.int64)
        return self.ib_type

    def interpolation_stencil(self, k_fluid: int = 4):
        """Full interpolation stencils for the IB band
        (reference: IBManager.h:83 createIBInterpolationStencil +
        GenericIBDiscretization.h).  For each IB cell: the nearest surface
        point (wall sample) plus up to k_fluid surrounding FLUID cells,
        with inverse-distance weights.  Returns
        (ib_cells, fluid_idx (n_ib, k), fluid_w (n_ib, k), wall_w (n_ib,))
        — models combine them as
            x_IB = (wall_w * x_wall + sum fluid_w * x[fluid_idx]) /
                   (wall_w + sum fluid_w)
        The reference solves a small least-squares per stencil; inverse
        distance is the standard light-weight variant and is exact for
        the constant mode, which is what the pinning row needs.
        """
        mesh, geom = self.mesh, self.geom
        if self.surface is None:
            raise ValueError("IBManager: call update() first")
        n_int = mesh.n_interior_cells
        cc = geom.cell_centroid[:n_int]
        t = self.ib_type[:n_int]
        ib = self.ib_cells
        n_ib = len(ib)
        k = int(k_fluid)
        fluid_idx = np.zeros((n_ib, k), dtype=np.int64)
        fluid_w = np.zeros((n_ib, k))
        # wall sample = nearest surface element centroid
        surf_c = self.surface.v[self.surface.e].mean(axis=1)
        wall_pt = surf_c[self.ib_nearest_element]
        wall_w = 1.0 / np.maximum(
            np.linalg.norm(cc[ib] - wall_pt, axis=1), 1e-12
        )
        fluid_cells = np.nonzero(t == IBType.FLUID)[0]
        if len(fluid_cells) and n_ib:
            # one batched kd-tree query for the whole IB band (the
            # reference loops per IB cell, IBManager.h:83; a python loop
            # here is hostile at large IB counts)
            tree = KSearchTree(cc[fluid_cells])
            kk = min(k, len(fluid_cells))
            d, j = tree.query_batch(cc[ib], kk)
            d = np.asarray(d).reshape(n_ib, kk)
            j = np.asarray(j).reshape(n_ib, kk)
            fluid_idx[:, :kk] = fluid_cells[j]
            fluid_w[:, :kk] = 1.0 / np.maximum(d, 1e-12)
        self.wall_point = wall_pt
        return ib, fluid_idx, fluid_w, wall_w

    def ib_faces(self) -> np.ndarray:
        """Faces separating the (fluid | IB) region from SOLID cells
        (reference: IBManager.h:82 createIBFaces) — the integration
        surface for IB force/flux integrals."""
        mesh = self.mesh
        t = self.ib_type
        owner = mesh.face_cells[: mesh.n_interior_faces, 0]
        nbr = mesh.face_cells[: mesh.n_interior_faces, 1]
        so = t[owner] == IBType.SOLID
        sn = t[nbr] == IBType.SOLID
        return np.nonzero(so ^ sn)[0]

    def dirichlet_mask(self, include_ib: bool = True) -> np.ndarray:
        """Boolean per-cell mask of cells to pin to the body value
        (solid always; IB band optionally)."""
        m = self.ib_type == IBType.SOLID
        if include_ib:
            m = m | (self.ib_type == IBType.IB)
        return m
