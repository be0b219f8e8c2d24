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


# ---------------------------------------------------------------------------
# Partitioned (per-shard) dump / restore
# ---------------------------------------------------------------------------


def _shard_l2g(partition):
    """(S, n_local) local -> global cell ids (-1 for dummy/padding)."""
    S = partition.n_shards
    n_local = int(partition.sharded_mesh.n_cells)
    l2g = np.full((S, n_local), -1, np.int64)
    for d in range(S):
        gc = np.nonzero(partition.g2l[d] >= 0)[0]
        l2g[d, partition.g2l[d][gc]] = gc
    return l2g


def write_netcdf_partitioned(path, partition, fields: dict) -> None:
    """Dump stacked per-shard cell fields of a distributed run
    (reference: NcDataReader.h:25 restores per-rank partitioned meshes
    for restart; NcDataWriter one file per rank).  One netCDF file holds
    every shard: the per-shard local arrays exactly as they live on
    device (S, n_local[, k]) plus the local->global cell map, so a
    restart can reload them directly at the same shard count or
    reassemble + rescatter at a different one (read_netcdf_partitioned /
    restore_partitioned)."""
    l2g = _shard_l2g(partition)
    S, n_local = l2g.shape
    f = netcdf_file(path, "w")
    try:
        f.createDimension("n_shards", S)
        f.createDimension("n_local", n_local)
        f.n_owned = int(partition.sharded_mesh.n_owned_cells)
        f.n_global_cells = int(partition.mesh.n_cells)
        f.n_global_interior = int(partition.mesh.n_interior_cells)
        v = f.createVariable("l2g", "i", ("n_shards", "n_local"))
        v[:] = l2g.astype(np.int32)
        f.field_names = "\n".join(fields.keys())
        for k, arr in fields.items():
            a = np.asarray(arr, dtype=np.float64)
            assert a.shape[:2] == (S, n_local), (k, a.shape)
            if a.ndim == 2:
                v = f.createVariable(f"field_{k}", "d",
                                     ("n_shards", "n_local"))
            else:
                dname = f"field_{k}_w"
                f.createDimension(dname, a.shape[2])
                v = f.createVariable(
                    f"field_{k}", "d", ("n_shards", "n_local", dname)
                )
            v[:] = a
    finally:
        f.close()


def read_netcdf_partitioned(path) -> dict:
    """Read back {"l2g", "n_owned", "n_global_cells", "fields": {...}}."""
    f = netcdf_file(path, "r", mmap=False)
    try:
        out = {
            "l2g": np.array(f.variables["l2g"][:], dtype=np.int64),
            "n_owned": int(f.n_owned),
            "n_global_cells": int(f.n_global_cells),
            "n_global_interior": int(f.n_global_interior),
            "fields": {},
        }
        names = f.field_names.decode()
        if names:
            for k in names.split("\n"):
                out["fields"][k] = np.array(
                    f.variables[f"field_{k}"][:], dtype=float
                )
        return out
    finally:
        f.close()


def restore_partitioned(data: dict, partition) -> dict:
    """Map a partitioned dump onto ``partition``'s shard layout.

    Same shard count and layout: the arrays pass through untouched
    (bit-exact restart).  Different shard count: each field is
    reassembled to the GLOBAL cell ordering from the dump's owned rows
    (every global cell's value is taken from the shard that owns it)
    and re-scattered through the new partition's global->local map —
    the role of the reference's mesh assembler/dismantler restart path."""
    l2g_new = _shard_l2g(partition)
    if (
        data["l2g"].shape == l2g_new.shape
        and (data["l2g"] == l2g_new).all()
    ):
        return dict(data["fields"])
    l2g_old = data["l2g"]
    n_owned_old = data["n_owned"]
    ng = data["n_global_cells"]
    S_new, n_local_new = l2g_new.shape
    out = {}
    for k, a in data["fields"].items():
        trail = a.shape[2:]
        g = np.zeros((ng,) + trail, a.dtype)
        for d in range(l2g_old.shape[0]):
            rows = np.arange(n_owned_old)
            glob = l2g_old[d, :n_owned_old]
            ok = glob >= 0
            g[glob[ok]] = a[d, rows[ok]]
        new = np.zeros((S_new, n_local_new) + trail, a.dtype)
        for d in range(S_new):
            ok = l2g_new[d] >= 0
            new[d, ok] = g[l2g_new[d, ok]]
        out[k] = new
    return out


def save_dist_state(path, model) -> None:
    """Dump a distributed model's cell-valued state (all time levels)
    for restart.  Face-valued entries (e.g. massFlux) are skipped — they
    are re-derived by the first step after restore."""
    part = model.partition
    n_local = int(part.sharded_mesh.n_cells)
    fields = {}
    for k, v in model.state.items():
        a = np.asarray(v)
        if a.ndim >= 2 and a.shape[1] == n_local:
            fields[k] = a
    write_netcdf_partitioned(path, part, fields)


def load_dist_state(path, model) -> None:
    """Restore state saved by save_dist_state into ``model`` (same or
    different shard count)."""
    import jax.numpy as jnp

    import warnings

    data = read_netcdf_partitioned(path)
    ng = int(data["n_global_cells"])
    nc = int(model.partition.mesh.n_cells)
    if ng != nc:
        raise ValueError(
            f"load_dist_state: dump has {ng} global cells but the model's "
            f"partition mesh has {nc} — mesh mismatch"
        )
    fields = restore_partitioned(data, model.partition)
    for k, v in fields.items():
        if k not in model.state:
            warnings.warn(
                f"load_dist_state: skipping field {k!r} not present in "
                f"the target model's state (e.g. transient history levels "
                f"restored into a steady model)"
            )
            continue
        cur = model.state[k]
        model.state[k] = model.partition.device_put(
            {k: jnp.asarray(v, cur.dtype)}
        )[k]
