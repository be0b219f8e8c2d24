"""Legacy-VTK (ASCII) unstructured-grid writer.

TPU-native counterpart of the reference's VTKWriter
(reference: src/fvm/src/modules/exporters/VTKWriter.h:36).  Writes the mesh
as an UNSTRUCTURED_GRID with CELL_DATA fields so results open in
ParaView/VisIt.
"""

from __future__ import annotations

import numpy as np

from ..mesh.mesh import Mesh

_VTK_TYPES_2D = {3: 5, 4: 9}  # tri, quad
_VTK_TYPES_3D = {4: 10, 5: 14, 6: 13, 8: 12}  # tet, pyramid, wedge, hex


def write_vtk(path: str, mesh: Mesh, cell_fields: dict | None = None, title="fvm_tpu"):
    """Write mesh + per-interior-cell fields (scalars or vectors)."""
    cn = mesh.cell_nodes
    n_cells = mesh.n_interior_cells
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write(f"{title}\n")
        f.write("ASCII\nDATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {mesh.n_nodes} double\n")
        for p in mesh.coords:
            row = list(p) + [0.0] * (3 - mesh.dim)
            f.write("%.10g %.10g %.10g\n" % tuple(row))

        counts = cn.row_counts()[:n_cells]
        total = int(counts.sum()) + n_cells
        f.write(f"\nCELLS {n_cells} {total}\n")
        for c in range(n_cells):
            nodes = _ordered_cell_nodes(mesh, c)
            f.write(str(len(nodes)) + " " + " ".join(map(str, nodes)) + "\n")
        f.write(f"\nCELL_TYPES {n_cells}\n")
        types = _VTK_TYPES_2D if mesh.dim == 2 else _VTK_TYPES_3D
        for c in range(n_cells):
            nn = len(_ordered_cell_nodes(mesh, c))
            f.write(f"{types.get(nn, 7 if mesh.dim == 2 else 42)}\n")

        if cell_fields:
            f.write(f"\nCELL_DATA {n_cells}\n")
            for name, arr in cell_fields.items():
                arr = np.asarray(arr)[:n_cells]
                if arr.ndim == 1:
                    f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                    for v in arr:
                        f.write("%.10g\n" % v)
                else:
                    f.write(f"VECTORS {name} double\n")
                    for v in arr:
                        row = list(v) + [0.0] * (3 - arr.shape[1])
                        f.write("%.10g %.10g %.10g\n" % tuple(row))


_cell_node_cache: dict = {}


def _ordered_cell_nodes(mesh: Mesh, c: int):
    """Cell vertices; 2D polygons are ordered counter-clockwise."""
    key = id(mesh)
    if key not in _cell_node_cache or _cell_node_cache[key][0] is not mesh:
        _cell_node_cache.clear()
        _cell_node_cache[key] = (mesh, {})
    cache = _cell_node_cache[key][1]
    if c in cache:
        return cache[c]
    nodes = list(dict.fromkeys(mesh.cell_nodes.row(c).tolist()))
    if mesh.dim == 2:
        pts = mesh.coords[nodes]
        ctr = pts.mean(axis=0)
        ang = np.arctan2(pts[:, 1] - ctr[1], pts[:, 0] - ctr[0])
        nodes = [nodes[i] for i in np.argsort(ang)]
    else:
        # order hex nodes into VTK convention when possible; otherwise keep
        nodes = _order_3d(mesh, c, nodes)
    cache[c] = nodes
    return nodes


def _order_3d(mesh: Mesh, c: int, nodes):
    if len(nodes) != 8:
        return nodes
    pts = mesh.coords[nodes]
    ctr = pts.mean(axis=0)
    rel = pts - ctr
    # split by z, order each quad CCW
    zkey = rel[:, 2] > 0
    bottom = [n for n, z in zip(nodes, zkey) if not z]
    top = [n for n, z in zip(nodes, zkey) if z]
    if len(bottom) != 4 or len(top) != 4:
        return nodes

    def ccw(ns):
        p = mesh.coords[ns]
        cc = p.mean(axis=0)
        ang = np.arctan2(p[:, 1] - cc[1], p[:, 0] - cc[0])
        return [ns[i] for i in np.argsort(ang)]

    b = ccw(bottom)
    t = ccw(top)
    # align top to bottom ordering by nearest xy
    pb = mesh.coords[b][:, :2]
    pt = mesh.coords[t][:, :2]
    perm = [int(np.argmin(((pt - pb[i]) ** 2).sum(axis=1))) for i in range(4)]
    t = [t[i] for i in perm]
    return b + t
