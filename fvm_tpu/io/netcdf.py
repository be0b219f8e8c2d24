"""NetCDF mesh + field IO.

Counterpart of the reference's NcDataReader / NcDataWriter
(reference: src/fvm/src/modules/fvmbase/NcDataWriter.h:23 writes meshes +
fields to netCDF for restart/exchange; NcDataReader.h reads them back).
Uses scipy's NetCDF3 backend (no external netCDF library in the image).

Layout (one file per call):
  dimensions: n_nodes, dim, n_faces, face_nodes_nnz, n_cell_entries...
  variables:  coords(n_nodes, dim), face_nodes_ptr/col, face_cells,
              group_* arrays, plus one variable per saved cell field.
"""

from __future__ import annotations

import numpy as np
from scipy.io import netcdf_file

from ..mesh.connectivity import CRConnectivity
from ..mesh.mesh import Mesh


def write_netcdf(path: str, mesh: Mesh, fields: dict | None = None) -> None:
    """Write a host Mesh and optional per-interior-cell fields.

    (reference: NcDataWriter::recordData)
    """
    f = netcdf_file(path, "w")
    try:
        f.createDimension("dim", mesh.dim)
        f.createDimension("n_nodes", mesh.coords.shape[0])
        f.createDimension("n_faces", mesh.n_faces)
        f.createDimension("two", 2)
        fn = mesh.face_nodes
        f.createDimension("fn_ptr", len(fn.row_ptr))
        f.createDimension("fn_nnz", fn.nnz)
        ng = len(mesh.face_groups)
        f.createDimension("n_groups", ng)

        v = f.createVariable("coords", "d", ("n_nodes", "dim"))
        v[:] = np.asarray(mesh.coords, dtype=np.float64)
        v = f.createVariable("face_nodes_ptr", "i", ("fn_ptr",))
        v[:] = np.asarray(fn.row_ptr, dtype=np.int32)
        v = f.createVariable("face_nodes_col", "i", ("fn_nnz",))
        v[:] = np.asarray(fn.col, dtype=np.int32)
        # raw owner/neighbor with -1 on boundary faces (pre-ghost form)
        fc = np.asarray(mesh.face_cells[:, :2], dtype=np.int32).copy()
        bdry = fc[:, 1] >= mesh.n_interior_cells
        fc[bdry, 1] = -1
        v = f.createVariable("face_cells", "i", ("n_faces", "two"))
        v[:] = fc
        for arr, name in (
            (np.asarray([g.ident for g in mesh.face_groups]), "group_id"),
            (np.asarray([g.offset for g in mesh.face_groups]), "group_offset"),
            (np.asarray([g.count for g in mesh.face_groups]), "group_count"),
        ):
            v = f.createVariable(name, "i", ("n_groups",))
            v[:] = arr.astype(np.int32)
        names = [g.name for g in mesh.face_groups]
        types = [g.group_type for g in mesh.face_groups]
        f.group_names = "\n".join(names)
        f.group_types = "\n".join(types)

        if fields:
            f.createDimension("n_interior_cells", mesh.n_interior_cells)
            f.field_names = "\n".join(fields.keys())
            for k, arr in fields.items():
                a = np.asarray(arr, dtype=np.float64)
                a = a[: mesh.n_interior_cells]
                if a.ndim == 1:
                    v = f.createVariable(f"field_{k}", "d", ("n_interior_cells",))
                else:
                    dname = f"field_{k}_w"
                    f.createDimension(dname, a.shape[1])
                    v = f.createVariable(
                        f"field_{k}", "d", ("n_interior_cells", dname)
                    )
                v[:] = a
        else:
            f.field_names = ""
    finally:
        f.close()


def read_netcdf(path: str):
    """Read back (Mesh, fields dict).  (reference: NcDataReader)"""
    f = netcdf_file(path, "r", mmap=False)
    try:
        coords = np.array(f.variables["coords"][:], dtype=float)
        dim = coords.shape[1]
        ptr = np.array(f.variables["face_nodes_ptr"][:], dtype=np.int64)
        col = np.array(f.variables["face_nodes_col"][:], dtype=np.int64)
        fc = np.array(f.variables["face_cells"][:], dtype=np.int64)
        names = f.group_names.decode().split("\n")
        types = f.group_types.decode().split("\n")
        gid = np.array(f.variables["group_id"][:])
        goff = np.array(f.variables["group_offset"][:])
        gcnt = np.array(f.variables["group_count"][:])
        # Mesh.__init__ takes (ident, name, type, face_ids) tuples
        groups = [
            (
                int(gid[i]),
                names[i],
                types[i],
                np.arange(int(goff[i]), int(goff[i]) + int(gcnt[i])),
            )
            for i in range(len(gid))
        ]
        fn = CRConnectivity(ptr, col, int(coords.shape[0]))
        mesh = Mesh(dim, coords, fn, fc, groups)
        fields = {}
        fnames = f.field_names.decode()
        if fnames:
            for k in fnames.split("\n"):
                fields[k] = np.array(f.variables[f"field_{k}"][:], dtype=float)
        return mesh, fields
    finally:
        f.close()
