"""Structured mesh generators (quad / tri / hex), used by tests and benches.

The reference ships checked-in Fluent cases (cav32.cas etc.); we additionally
generate equivalent meshes programmatically so tests do not depend on binary
assets and benches can scale to arbitrary cell counts (e.g. the 1M-cell
cavity of BASELINE.md).
"""

from __future__ import annotations

import numpy as np

from .connectivity import CRConnectivity
from .mesh import Mesh


def quad_2d(
    nx: int,
    ny: int,
    lx: float = 1.0,
    ly: float = 1.0,
    x0: float = 0.0,
    y0: float = 0.0,
    boundary_names=("left", "right", "bottom", "top"),
) -> Mesh:
    """Uniform quad mesh on [x0, x0+lx] x [y0, y0+ly], nx*ny cells.

    Boundary groups: left (ident 1), right (2), bottom (3), top (4) —
    mirrors the 4 wall zones of the reference's cavity cases (cav32.cas).
    """
    xs = x0 + lx * np.arange(nx + 1) / nx
    ys = y0 + ly * np.arange(ny + 1) / ny
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)

    # fully vectorized construction (1M+ cell benches build in O(100ms))
    def nid(i, j):  # node index arrays
        return i * (ny + 1) + j

    def cid(i, j):
        return i * ny + j

    # vertical faces (normal +-x): i in [0, nx], j in [0, ny)
    iv, jv = np.meshgrid(np.arange(nx + 1), np.arange(ny), indexing="ij")
    iv, jv = iv.ravel(), jv.ravel()
    vn = np.stack([nid(iv, jv), nid(iv, jv + 1)], axis=1)
    vc0 = cid(np.maximum(iv - 1, 0), jv)
    vc1 = np.where(iv == nx, -1, cid(np.minimum(iv, nx - 1), jv))
    vc1 = np.where(iv == 0, -1, vc1)
    vfc = np.stack([np.where(iv == 0, cid(0, jv), vc0), vc1], axis=1)
    # interior vertical: owner cid(i-1,j), nbr cid(i,j)
    vfc[(iv > 0) & (iv < nx), 1] = cid(iv, jv)[(iv > 0) & (iv < nx)]

    # horizontal faces: i in [0, nx), j in [0, ny]
    ih, jh = np.meshgrid(np.arange(nx), np.arange(ny + 1), indexing="ij")
    ih, jh = ih.ravel(), jh.ravel()
    hn = np.stack([nid(ih, jh), nid(ih + 1, jh)], axis=1)
    hc0 = np.where(jh == 0, cid(ih, 0), cid(ih, np.maximum(jh - 1, 0)))
    hc1 = np.where((jh == 0) | (jh == ny), -1, cid(ih, np.minimum(jh, ny - 1)))
    hfc = np.stack([hc0, hc1], axis=1)

    nvert = len(iv)
    fn_all = np.concatenate([vn, hn], axis=0)
    fc = np.concatenate([vfc, hfc], axis=0)
    face_nodes = CRConnectivity(
        np.arange(len(fn_all) + 1, dtype=np.int64) * 2,
        fn_all.ravel(),
        (nx + 1) * (ny + 1),
    )
    groups_idx = {
        boundary_names[0]: np.nonzero(iv == 0)[0],
        boundary_names[1]: np.nonzero(iv == nx)[0],
        boundary_names[2]: nvert + np.nonzero(jh == 0)[0],
        boundary_names[3]: nvert + np.nonzero(jh == ny)[0],
    }
    groups = [
        (k + 1, name, "wall", np.asarray(groups_idx[name], dtype=np.int64))
        for k, name in enumerate(boundary_names)
    ]
    return Mesh(2, coords, face_nodes, fc, groups)


def tri_2d(nx: int, ny: int, lx: float = 1.0, ly: float = 1.0) -> Mesh:
    """Triangulated uniform mesh: each quad split along its diagonal."""
    quad = None  # build directly
    xs = lx * np.arange(nx + 1) / nx
    ys = ly * np.arange(ny + 1) / ny
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)

    def nid(i, j):
        return i * (ny + 1) + j

    # cells: quad (i,j) -> tri A (lower: n00,n10,n11) id 2*(i*ny+j),
    #                      tri B (upper: n00,n11,n01) id 2*(i*ny+j)+1
    def ta(i, j):
        return 2 * (i * ny + j)

    def tb(i, j):
        return 2 * (i * ny + j) + 1

    fn_rows, fc = [], []
    gidx = {"left": [], "right": [], "bottom": [], "top": []}
    f = 0
    for i in range(nx + 1):  # vertical faces belong to tri A(i,.) right / B(i-1,.) ...
        for j in range(ny):
            fn_rows.append([nid(i, j), nid(i, j + 1)])
            if i == 0:
                fc.append([tb(0, j), -1])
                gidx["left"].append(f)
            elif i == nx:
                fc.append([ta(nx - 1, j), -1])
                gidx["right"].append(f)
            else:
                fc.append([ta(i - 1, j), tb(i, j)])
            f += 1
    for i in range(nx):  # horizontal faces
        for j in range(ny + 1):
            fn_rows.append([nid(i, j), nid(i + 1, j)])
            if j == 0:
                fc.append([ta(i, 0), -1])
                gidx["bottom"].append(f)
            elif j == ny:
                fc.append([tb(i, ny - 1), -1])
                gidx["top"].append(f)
            else:
                fc.append([tb(i, j - 1), ta(i, j)])
            f += 1
    for i in range(nx):  # diagonals n00 -> n11
        for j in range(ny):
            fn_rows.append([nid(i, j), nid(i + 1, j + 1)])
            fc.append([ta(i, j), tb(i, j)])
            f += 1

    face_nodes = CRConnectivity.from_rows(fn_rows, (nx + 1) * (ny + 1))
    groups = [
        (k + 1, name, "wall", np.asarray(gidx[name], dtype=np.int64))
        for k, name in enumerate(["left", "right", "bottom", "top"])
    ]
    return Mesh(2, coords, face_nodes, np.asarray(fc), groups)


def hex_3d(
    nx: int,
    ny: int,
    nz: int,
    lx: float = 1.0,
    ly: float = 1.0,
    lz: float = 1.0,
) -> Mesh:
    """Uniform hex mesh; boundary groups xmin/xmax/ymin/ymax/zmin/zmax."""
    xs = lx * np.arange(nx + 1) / nx
    ys = ly * np.arange(ny + 1) / ny
    zs = lz * np.arange(nz + 1) / nz
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def nid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    def cid(i, j, k):
        return (i * ny + j) * nz + k

    names = ["xmin", "xmax", "ymin", "ymax", "zmin", "zmax"]
    fn_rows, fc = [], []
    gidx = {n: [] for n in names}
    f = 0
    # x-normal faces
    for i in range(nx + 1):
        for j in range(ny):
            for k in range(nz):
                fn_rows.append(
                    [nid(i, j, k), nid(i, j + 1, k), nid(i, j + 1, k + 1), nid(i, j, k + 1)]
                )
                if i == 0:
                    fc.append([cid(0, j, k), -1]); gidx["xmin"].append(f)
                elif i == nx:
                    fc.append([cid(nx - 1, j, k), -1]); gidx["xmax"].append(f)
                else:
                    fc.append([cid(i - 1, j, k), cid(i, j, k)])
                f += 1
    # y-normal faces
    for j in range(ny + 1):
        for i in range(nx):
            for k in range(nz):
                fn_rows.append(
                    [nid(i, j, k), nid(i, j, k + 1), nid(i + 1, j, k + 1), nid(i + 1, j, k)]
                )
                if j == 0:
                    fc.append([cid(i, 0, k), -1]); gidx["ymin"].append(f)
                elif j == ny:
                    fc.append([cid(i, ny - 1, k), -1]); gidx["ymax"].append(f)
                else:
                    fc.append([cid(i, j - 1, k), cid(i, j, k)])
                f += 1
    # z-normal faces
    for k in range(nz + 1):
        for i in range(nx):
            for j in range(ny):
                fn_rows.append(
                    [nid(i, j, k), nid(i + 1, j, k), nid(i + 1, j + 1, k), nid(i, j + 1, k)]
                )
                if k == 0:
                    fc.append([cid(i, j, 0), -1]); gidx["zmin"].append(f)
                elif k == nz:
                    fc.append([cid(i, j, nz - 1), -1]); gidx["zmax"].append(f)
                else:
                    fc.append([cid(i, j, k - 1), cid(i, j, k)])
                f += 1

    face_nodes = CRConnectivity.from_rows(
        fn_rows, (nx + 1) * (ny + 1) * (nz + 1)
    )
    groups = [
        (k + 1, n, "wall", np.asarray(gidx[n], dtype=np.int64))
        for k, n in enumerate(names)
    ]
    return Mesh(3, coords, face_nodes, np.asarray(fc), groups)


def extrude(mesh2d, nz: int, lz: float = 1.0, z0: float = 0.0):
    """Extrude a 2D mesh into 3D along z (reference: Mesh::extrude,
    Mesh.h:314).  2D cells become nz prisms/hexes; the 2D boundary groups
    become lateral groups, plus new 'zmin'/'zmax' caps."""
    m = mesh2d
    if m.dim != 2:
        raise ValueError("extrude requires a 2D mesh")
    nn2, nc2 = m.n_nodes, m.n_interior_cells
    zs = z0 + lz * np.arange(nz + 1) / nz
    coords = np.concatenate(
        [
            np.concatenate(
                [m.coords, np.full((nn2, 1), z)], axis=1
            )
            for z in zs
        ],
        axis=0,
    )

    def nid(n2, k):
        return k * nn2 + n2

    def cid(c2, k):
        return k * nc2 + c2

    fn_rows, fc = [], []
    gidx = {g.name: [] for g in m.boundary_groups}
    gidx["zmin"] = []
    gidx["zmax"] = []
    f = 0
    # lateral faces: each 2D face extruded into nz quads
    fc2 = m.face_cells
    for f2 in range(m.n_faces):
        nodes2 = m.face_nodes.row(f2)
        c0, c1 = fc2[f2]
        bgroup = None
        if f2 >= m.n_interior_faces:
            for g in m.boundary_groups:
                if g.offset <= f2 < g.offset + g.count:
                    bgroup = g.name
                    break
        for k in range(nz):
            fn_rows.append(
                [nid(nodes2[0], k), nid(nodes2[1], k),
                 nid(nodes2[1], k + 1), nid(nodes2[0], k + 1)]
            )
            if c1 >= m.n_interior_cells or c1 < 0 or f2 >= m.n_interior_faces:
                fc.append([cid(c0, k), -1])
                gidx[bgroup].append(f)
            else:
                fc.append([cid(c0, k), cid(c1, k)])
            f += 1
    # z-normal faces: each 2D cell at each z level
    for k in range(nz + 1):
        for c2 in range(nc2):
            nodes2 = _cell_poly_nodes(m, c2)
            fn_rows.append([nid(n2, k) for n2 in nodes2])
            if k == 0:
                fc.append([cid(c2, 0), -1])
                gidx["zmin"].append(f)
            elif k == nz:
                fc.append([cid(c2, nz - 1), -1])
                gidx["zmax"].append(f)
            else:
                fc.append([cid(c2, k - 1), cid(c2, k)])
            f += 1

    face_nodes = CRConnectivity.from_rows(fn_rows, coords.shape[0])
    groups = []
    ident = 1
    for name, idx in gidx.items():
        groups.append((ident, name, "wall", np.asarray(idx, dtype=np.int64)))
        ident += 1
    return Mesh(3, coords, face_nodes, np.asarray(fc), groups)


def _cell_poly_nodes(mesh2d, c):
    """CCW-ordered vertices of a 2D cell."""
    nodes = list(dict.fromkeys(mesh2d.cell_nodes.row(c).tolist()))
    pts = mesh2d.coords[nodes]
    ctr = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - ctr[1], pts[:, 0] - ctr[0])
    return [nodes[i] for i in np.argsort(ang)]
