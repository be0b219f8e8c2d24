"""Mesh motion and solid-deformation mapping.

TPU-native counterparts of:
* MovingMeshModel (reference: MovingMeshModel.h:22 — smooths node
  displacements from boundary motion, recomputes metrics, tracks swept
  volumes via ``volChange`` :165);
* StructureDeformationModel / PlateDeformationModel (reference:
  StructureDeformationModel.h:21 — maps cell displacements to node
  coordinates and updates boundary meshes for FSI).

Mesh topology is static under jit; motion is a host-level operation that
produces a NEW DeviceMesh (models can be re-inited or re-used with the new
mesh).  Node smoothing is a jitted Jacobi iteration over the node adjacency
graph with prescribed boundary-node displacements.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.mesh import Mesh
from ..mesh.metrics import compute_geometry
from ..mesh.device import build_device_mesh
from ..exceptions import ConfigError


def _node_edges(mesh: Mesh) -> np.ndarray:
    """Unique node-node edges from the face->node connectivity."""
    fn = mesh.face_nodes
    counts = fn.row_counts()
    nxt = np.arange(fn.nnz, dtype=np.int64) + 1
    last = fn.row_ptr[1:] - 1
    nxt[last] = fn.row_ptr[:-1]
    a, b = fn.col, fn.col[nxt]
    if mesh.dim == 2:
        edges = np.stack([a, b], axis=1)
    else:
        edges = np.stack([a, b], axis=1)
    edges = np.sort(edges, axis=1)
    return np.unique(edges, axis=0)


class MovingMeshModel:
    """Smooth interior node motion from prescribed boundary displacements.

    usage::
        mm = MovingMeshModel(mesh)
        mm.set_boundary_displacement('top', [0.0, 0.05])
        new_mesh, new_dmesh = mm.advance(50)
        vol_change = mm.volChange
    """

    name = "MovingMeshModel"

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.edges = _node_edges(mesh)
        # node -> boundary groups
        self._bnd_disp: dict[str, np.ndarray] = {}
        self._geom0 = compute_geometry(mesh)
        self._geomN1 = self._geom0
        self._sweptVolDot = None
        self._sweptVolDotN1 = None
        self.volChange = 0.0

    def set_boundary_displacement(self, group_name: str, disp) -> None:
        self._bnd_disp[group_name] = np.asarray(disp, dtype=np.float64)

    def _boundary_nodes(self):
        """(node_ids, displacements) for all constrained boundary nodes.

        Boundary groups without a prescribed displacement are held fixed.
        """
        mesh = self.mesh
        ids, disps = [], []
        for g in mesh.boundary_groups:
            d = self._bnd_disp.get(g.name, np.zeros(mesh.dim))
            nodes = np.unique(
                np.concatenate(
                    [mesh.face_nodes.row(f) for f in range(g.offset, g.offset + g.count)]
                )
            )
            ids.append(nodes)
            disps.append(np.tile(d, (len(nodes), 1)))
        return np.concatenate(ids), np.concatenate(disps)

    def advance(self, niter: int = 50, dt=None):
        """Jacobi-smooth node displacements; returns (new Mesh, DeviceMesh).

        (reference: MovingMeshModel::advance — weighted node smoothing;
        pass dt to accumulate swept-volume rates for ALE grid fluxes)
        """
        mesh = self.mesh
        bid, bdisp = self._boundary_nodes()
        n = mesh.n_nodes
        fixed = np.zeros(n, dtype=bool)
        disp0 = np.zeros((n, mesh.dim))
        fixed[bid] = True
        disp0[bid] = bdisp

        e = jnp.asarray(self.edges)
        fixed_j = jnp.asarray(fixed)
        target = jnp.asarray(disp0)

        def body(i, d):
            # average of neighbor displacements
            s = jnp.zeros_like(d).at[e[:, 0]].add(d[e[:, 1]])
            s = s.at[e[:, 1]].add(d[e[:, 0]])
            cnt = (
                jnp.zeros(n)
                .at[e[:, 0]]
                .add(1.0)
                .at[e[:, 1]]
                .add(1.0)
            )
            avg = s / jnp.maximum(cnt, 1.0)[:, None]
            return jnp.where(fixed_j[:, None], target, avg)

        disp = jax.lax.fori_loop(0, niter, body, target)
        new_coords = mesh.coords + np.asarray(disp)
        new_mesh = self._rebuild(new_coords)
        geom = compute_geometry(new_mesh)
        self.volChange = float(
            geom.cell_volume[: mesh.n_interior_cells].sum()
            - self._geom0.cell_volume[: mesh.n_interior_cells].sum()
        )
        # swept-volume rate per face (reference MovingMeshModel.h:195-245):
        # sweptVolDot_f = (A_new + A_old)/2 . v_f, with v_f the node-mean
        # grid velocity.  For translational/stretching motion the midpoint
        # area makes the per-cell sum match (V_new - V_old)/dt exactly
        # (discrete geometric conservation law); grid_flux() turns it into
        # the ALE mass flux to subtract from convective mdot.
        dt = float(dt) if dt is not None else 1.0
        node_vel = np.asarray(disp) / dt
        fn = mesh.face_nodes
        nf = mesh.n_faces
        fv = np.zeros((nf, mesh.dim))
        counts = fn.row_counts().astype(float)
        np.add.at(
            fv, np.repeat(np.arange(nf), fn.row_counts()), node_vel[fn.col]
        )
        fv /= counts[:, None]
        amid = 0.5 * (geom.face_area + self._geomN1.face_area)
        svd_prev = self._sweptVolDot
        self._sweptVolDot = np.einsum("fd,fd->f", amid, fv)
        self._sweptVolDotN1 = svd_prev
        self.mesh = new_mesh
        self._geomN1 = geom
        self._geom0 = geom
        self._bnd_disp = {}
        return new_mesh, build_device_mesh(new_mesh, geom)

    @property
    def sweptVolDot(self) -> np.ndarray:
        """Per-face swept volume rate from the last advance()."""
        if self._sweptVolDot is None:
            raise ConfigError("MovingMeshModel: no motion advanced yet")
        return self._sweptVolDot

    def grid_flux(self, rho=1.0) -> np.ndarray:
        """ALE grid mass flux per face: subtract from the convective mdot
        (reference gridFlux with the 1.5/-0.5 BDF2 extrapolation when a
        previous step exists)."""
        svd = self.sweptVolDot
        if self._sweptVolDotN1 is not None:
            svd = 1.5 * svd - 0.5 * self._sweptVolDotN1
        return rho * svd

    def _rebuild(self, new_coords) -> Mesh:
        """New Mesh object sharing topology with updated coordinates."""
        import copy

        m = copy.copy(self.mesh)
        m.coords = np.asarray(new_coords)
        # clear cached connectivities that don't depend on coords (they
        # stay valid) — geometry is recomputed by callers
        return m


class StructureDeformationModel:
    """Map cell-centred structure displacements to node coordinates.

    (reference: StructureDeformationModel.h:21 ``calculateNodeDisplacement``
    + ``deformStructure``)
    """

    name = "StructureDeformationModel"

    def __init__(self, mesh: Mesh, structure_model):
        self.mesh = mesh
        self.structure = structure_model
        # precompute node->cell inverse-distance weights
        from ..mesh.metrics import compute_geometry

        geom = compute_geometry(mesh)
        cn = mesh.cell_nodes
        n2c = cn.transpose(mesh.n_nodes)
        rows = []
        weights = []
        for nd in range(mesh.n_nodes):
            cells = n2c.row(nd)
            cells = cells[cells < mesh.n_interior_cells]
            if len(cells) == 0:
                rows.append(np.array([0]))
                weights.append(np.array([0.0]))
                continue
            d = np.linalg.norm(
                geom.cell_centroid[cells] - mesh.coords[nd], axis=1
            )
            w = 1.0 / np.maximum(d, 1e-300)
            rows.append(cells)
            weights.append(w / w.sum())
        self._rows = rows
        self._weights = weights

    def getNodeDisplacement(self) -> np.ndarray:
        w_cell = self.structure.getDeformation()
        disp = np.zeros((self.mesh.n_nodes, self.mesh.dim))
        for nd in range(self.mesh.n_nodes):
            disp[nd] = (
                self._weights[nd][:, None] * w_cell[self._rows[nd]]
            ).sum(axis=0)
        return disp

    def deformStructure(self):
        """Returns (new Mesh, new DeviceMesh) with displaced nodes."""
        disp = self.getNodeDisplacement()
        import copy

        m = copy.copy(self.mesh)
        m.coords = self.mesh.coords + disp
        m._cell_nodes = self.mesh._cell_nodes
        m._cell_faces = self.mesh._cell_faces
        m._cell_cells = self.mesh._cell_cells
        return m, build_device_mesh(m)
