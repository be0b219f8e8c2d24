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

    def dirichlet_mask(self, include_ib: bool = True) -> np.ndarray:
        """Boolean per-cell mask of cells to pin to the body value
        (solid always; IB band optionally)."""
        m = self.ib_type == IBType.SOLID
        if include_ib:
            m = m | (self.ib_type == IBType.IB)
        return m
