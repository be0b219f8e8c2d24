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


class HostMeshData:
    """Host numpy copies of the topology/geometry arrays that init-time
    HOST computations need (LS gradient coefficients, AMG aggregation).

    Reading these back from the device costs ~9 s per 1M-cell array
    through the TPU tunnel (device->host is far slower than upload), so
    the build keeps the originals.  Held as a static pytree field and
    compared by identity, like DIAInfo."""

    __slots__ = ("cell_centroid", "cf_nbr", "cf_mask")

    def __init__(self, cell_centroid, cf_nbr, cf_mask):
        self.cell_centroid = cell_centroid
        self.cf_nbr = cf_nbr
        self.cf_mask = cf_mask


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
    # cell->face tables are SLOT-LEADING (K, nc): each slot plane is one
    # contiguous (nc,)-lane vector, so assembly masks/selects/reductions
    # run on full VPU lanes instead of period-K interleaves
    cf_face: jnp.ndarray  # (K, nc) face id per slot (pad: 0)
    cf_is_owner: jnp.ndarray  # (K, nc) bool: this cell is the face's owner
    cf_mask: jnp.ndarray  # (K, nc) bool: slot valid
    cf_nbr: jnp.ndarray  # (K, nc) neighbor cell across slot face (pad: self)

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
    # inverse-distance interpolation weight of the OWNER value at the face
    # (precomputed once; used by every face interpolation)
    face_wo: jnp.ndarray  # (nf,)

    # --- distribution (None/defaults on a single device) ------------------
    # When partitioned, cells [0, n_owned_cells) are owned (interior +
    # boundary ghosts); [n_owned_cells, n_cells) are halo copies of
    # remote cells plus padding.  ``halo`` holds the exchange index tables
    # (ops.halo.HaloSpec); ``axis_name`` is the shard_map mesh axis.
    halo: object = None  # HaloSpec | None (pytree leaves when present)
    axis_name: str | None = struct.field(pytree_node=False, default=None)
    n_owned_cells_: int | None = struct.field(pytree_node=False, default=None)
    n_shards: int | None = struct.field(pytree_node=False, default=None)
    # DIA SpMV fast-path metadata (ops.dia.DIAInfo), single-device only
    dia: object = struct.field(pytree_node=False, default=None)
    # ShiftGather bundle for hot index maps (ops.dia.MeshGathers)
    gathers: object = struct.field(pytree_node=False, default=None)
    # host numpy copies for init-time host math (HostMeshData | None)
    host: object = struct.field(pytree_node=False, default=None)
    # True when every interior face's non-orthogonal remainder T vanishes
    # (structured grids): models skip deferred gradient corrections
    orthogonal: bool = struct.field(pytree_node=False, default=False)
    # periodic boundary pairing (mesh.Mesh.make_periodic): ghost cells of
    # paired faces sit at the wrapped partner-owner location; these index
    # arrays map each such ghost to the partner owner cell whose value it
    # mirrors (core.bcs.extend_to_ghosts applies the copy)
    periodic_ghost: jnp.ndarray | None = None  # (np_,) ghost cell ids
    periodic_src: jnp.ndarray | None = None  # (np_,) partner owner ids
    # double-shell interfaces (mesh.Mesh.make_interface): tuple of
    # (name, left_group_name, right_group_name).  The i-th face of the L
    # group pairs with the i-th face of the R group; their ghost cells are
    # the per-face shell unknowns, and their matrix rows carry EXTRA ELL
    # slots (filled by assemble_device_mesh): slot 1 -> partner ghost,
    # slot 2 -> partner owner (slot 0 is the own-face owner as usual).
    # Kernels in core.interfaces rely on this slot layout.
    interfaces: tuple = struct.field(pytree_node=False, default=())

    # --- fast indexed gathers (fall back to plain indexing) ---------------

    def take_owner(self, x):
        """x[self.face_cell0] via shift-gather when available."""
        if self.gathers is not None and self.gathers.owner is not None:
            return self.gathers.owner(x)
        return x[self.face_cell0]

    def take_nbr(self, x):
        if self.gathers is not None and self.gathers.nbr is not None:
            return self.gathers.nbr(x)
        return x[self.face_cell1]

    def take_faces(self, F):
        """F[self.cf_face] -> (K, nc, ...)."""
        if self.gathers is not None:
            return self.gathers.take_faces(F, self.cf_face)
        return F[self.cf_face]

    def take_cells(self, x):
        """x[self.cf_nbr] -> (K, nc, ...); padded slots return x[row]."""
        if self.dia is not None:
            from ..ops.dia import dia_gather_slots

            return dia_gather_slots(self.dia, self.cf_nbr, self.cf_mask, x)
        return x[self.cf_nbr]

    # ---------------------------------------------------------------------

    @property
    def n_owned_cells(self) -> int:
        return self.n_cells if self.n_owned_cells_ is None else self.n_owned_cells_

    @property
    def distributed(self) -> bool:
        return self.axis_name is not None

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

    def host_cf(self):
        """(cf_nbr, cf_mask) as HOST numpy (n, K) arrays without device
        readback (AMG setup, coloring, LS coefficients run on the host).
        Note host tables stay ROW-LEADING (n, K); only the device copies
        are slot-leading."""
        if self.host is not None:
            return self.host.cf_nbr, self.host.cf_mask
        nbr = np.asarray(self.cf_nbr)
        mask = np.asarray(self.cf_mask)
        return nbr.swapaxes(-1, -2), mask.swapaxes(-1, -2)

    def interface(self, name: str):
        """(left_group, right_group) tuples of a double-shell interface."""
        for nm, ln, rn in self.interfaces:
            if nm == name:
                return self.group_by_name(ln), self.group_by_name(rn)
        raise KeyError(name)


def assemble_device_mesh(
    dim: int,
    face_cells: np.ndarray,  # (nf, 2) local ids; boundary nbr = ghost id
    groups: tuple,  # ((ident, name, type, offset, count), ...)
    n_interior_cells: int,
    n_interior_faces: int,
    n_cells: int,
    face_area: np.ndarray,
    face_area_mag: np.ndarray,
    face_centroid: np.ndarray,
    cell_centroid: np.ndarray,
    cell_volume: np.ndarray,
    dtype=None,
    K: int | None = None,
    halo=None,
    axis_name=None,
    n_owned_cells=None,
    n_shards=None,
    as_numpy: bool = False,
    face_valid: np.ndarray | None = None,
    extra_adj: tuple | None = None,
    interfaces: tuple = (),
) -> DeviceMesh:
    """Low-level device-mesh assembler from flat arrays.

    Used both for single-device meshes (via build_device_mesh) and for the
    per-shard local meshes built by the partitioner (parallel.partition),
    where face_cells may reference halo/padding cells beyond the
    owned-ghost band and dead rows (no faces) are allowed.
    """
    if dtype is None:
        dtype = config.dtype
    nf = face_cells.shape[0]
    owner = face_cells[:, 0]
    nbr = face_cells[:, 1]

    # cell->face ELL table over ALL cells: each face appears in its owner's
    # row and (if the neighbor is a local cell) its neighbor's row
    valid_o = face_valid if face_valid is not None else np.ones(nf, bool)
    counts = np.bincount(owner[valid_o], minlength=n_cells) + np.bincount(
        nbr[valid_o & (nbr != owner)], minlength=n_cells
    )
    extra_need = np.zeros(n_cells, dtype=np.int64)
    if extra_adj is not None:
        extra_need = np.bincount(extra_adj[0], minlength=n_cells)
    Kmax = int((counts + extra_need).max()) if len(counts) else 1
    if K is None:
        K = Kmax
    elif Kmax > K:
        raise ValueError(f"K={K} < max faces per cell {Kmax}")

    from .. import native

    built = native.cf_build(owner, nbr, face_valid, n_cells, K)
    if built is not None:
        cf_face, cf_mask, cf_is_owner, cf_nbr = built
    else:
        # numpy fallback: stable sort of the [owner-block | nbr-block]
        # entries (same slot order as the native two-pass fill)
        rows = np.concatenate([owner, nbr])
        cols = np.tile(np.arange(nf, dtype=np.int64), 2)
        keep = np.ones(len(rows), dtype=bool)
        keep[nf:] = nbr != owner
        if face_valid is not None:
            keep &= np.tile(face_valid, 2)
        rows, cols = rows[keep], cols[keep]
        order = np.argsort(rows, kind="stable")
        rows, cols = rows[order], cols[order]
        cf_face = np.zeros((n_cells, K), dtype=np.int64)
        cf_mask = np.zeros((n_cells, K), dtype=bool)
        ptr = np.zeros(n_cells + 1, dtype=np.int64)
        np.cumsum(counts, out=ptr[1:])
        slot = np.arange(len(rows)) - ptr[rows]
        cf_face[rows, slot] = cols
        cf_mask[rows, slot] = True
        cf_is_owner = owner[cf_face] == np.arange(n_cells)[:, None]
        cf_nbr = np.where(cf_is_owner, nbr[cf_face], owner[cf_face])
        cf_nbr = np.where(cf_mask, cf_nbr, np.arange(n_cells)[:, None])

    if extra_adj is not None:
        # splice non-face couplings (double-shell interface rows) into the
        # free tail slots; relative order within a row is preserved, so
        # the interface kernels can rely on [partner ghost, partner owner]
        # landing at slots 1 and 2 of each shell-ghost row.
        erows = np.asarray(extra_adj[0], dtype=np.int64)
        ecols = np.asarray(extra_adj[1], dtype=np.int64)
        order2 = np.argsort(erows, kind="stable")
        er, ec = erows[order2], ecols[order2]
        ptr2 = np.zeros(n_cells + 1, dtype=np.int64)
        np.cumsum(extra_need, out=ptr2[1:])
        slot2 = np.arange(len(er)) - ptr2[er] + counts[er]
        cf_mask[er, slot2] = True
        cf_nbr[er, slot2] = ec
        # geometry gathers for these slots read the row's own face; the
        # assembled values are overwritten by the interface kernels
        cf_face[er, slot2] = cf_face[er, 0]
        cf_is_owner[er, slot2] = cf_is_owner[er, 0]

    dia = None
    gathers = None
    host_data = None
    if axis_name is None and not as_numpy:
        host_data = HostMeshData(
            np.asarray(cell_centroid, dtype=np.float64),
            np.asarray(cf_nbr, dtype=np.int32),
            np.asarray(cf_mask, dtype=bool),
        )
    if axis_name is None and not as_numpy:
        from ..ops.dia import DIAInfo, MeshGathers, PlaneMajorGathers

        dia = DIAInfo.build(cf_nbr, cf_mask)
        if face_valid is not None and n_interior_faces == n_interior_cells * K:
            gathers = PlaneMajorGathers(
                owner, nbr, cf_face, cf_mask, face_valid,
                n_cells, n_interior_cells, nf, n_interior_faces, K,
            )
        else:
            gathers = MeshGathers(owner, nbr, cf_face, n_cells, nf)

    ds = cell_centroid[nbr] - cell_centroid[owner]
    dsmag = np.linalg.norm(ds, axis=1)
    a_dot_ds = np.einsum("fd,fd->f", face_area, ds)
    amag2 = face_area_mag**2
    e_over_d = amag2 / np.where(a_dot_ds != 0, a_dot_ds, 1.0)
    t_vec = face_area - e_over_d[:, None] * ds
    # limited non-orthogonal correction: the deferred-correction outer
    # iteration is stable only while the explicit part stays below the
    # implicit two-point part, whose scale is e_over_d * |ds|; cap |T|
    # there (lambda = 0.8).  Unlimited corrections diverge on severely
    # skewed cells (|T| up to ~2|A| on the reference's beam meshes).
    tmag_ = np.linalg.norm(t_vec, axis=1)
    implicit_scale = np.abs(e_over_d) * dsmag
    cap = np.minimum(1.0, 0.8 * implicit_scale / np.maximum(tmag_, 1e-300))
    t_vec = t_vec * cap[:, None]
    # no deferred correction on boundary faces: the ghost sits AT the face
    # (two-point term is the proper one-sided gradient) and ghost-cell
    # gradients are rank-deficient
    bmask = np.zeros(nf, dtype=bool)
    bmask[n_interior_faces:] = True
    t_vec = np.where(bmask[:, None], 0.0, t_vec)
    do_ = np.linalg.norm(face_centroid - cell_centroid[owner], axis=1)
    dn_ = np.linalg.norm(face_centroid - cell_centroid[nbr], axis=1)
    face_wo = dn_ / np.maximum(do_ + dn_, 1e-300)
    tmag = np.abs(np.asarray(t_vec)[:n_interior_faces]).max() if n_interior_faces else 0.0
    scale = np.abs(np.asarray(face_area_mag)).max() if nf else 1.0
    orthogonal = bool(tmag <= 1e-12 * max(scale, 1e-300))

    # device cf tables are stored SLOT-LEADING (K, n); the host (n, K)
    # originals feed DIAInfo/HostMeshData/gather builders above
    cf_face_d = np.ascontiguousarray(cf_face.T)
    cf_is_owner_d = np.ascontiguousarray(cf_is_owner.T)
    cf_mask_d = np.ascontiguousarray(cf_mask.T)
    cf_nbr_d = np.ascontiguousarray(cf_nbr.T)
    if as_numpy:
        f = lambda x: np.asarray(x, dtype=dtype)
        i = lambda x: np.asarray(x, dtype=np.int32)
        b = lambda x: np.asarray(x, dtype=bool)
    else:
        # convert dtype in NUMPY first: jnp.asarray with a dtype change
        # compiles a convert op on the device, and each distinct shape is
        # a multi-second remote compile through the TPU tunnel (the raw
        # transfer itself runs at ~1 GB/s)
        f = lambda x: jnp.asarray(np.asarray(x, dtype=dtype))
        i = lambda x: jnp.asarray(np.ascontiguousarray(x, dtype=np.int32))
        b = lambda x: jnp.asarray(np.ascontiguousarray(x, dtype=bool))

    return DeviceMesh(
        dim=dim,
        n_cells=n_cells,
        n_interior_cells=n_interior_cells,
        n_faces=nf,
        n_interior_faces=n_interior_faces,
        max_faces_per_cell=K,
        groups=tuple(groups),
        face_cell0=i(owner),
        face_cell1=i(nbr),
        cf_face=i(cf_face_d),
        cf_is_owner=b(cf_is_owner_d),
        cf_mask=b(cf_mask_d),
        cf_nbr=i(cf_nbr_d),
        face_area=f(face_area),
        face_area_mag=f(face_area_mag),
        face_centroid=f(face_centroid),
        cell_centroid=f(cell_centroid),
        cell_volume=f(cell_volume),
        face_ds=f(ds),
        face_dsmag=f(dsmag),
        face_e_over_d=f(e_over_d),
        face_t=f(t_vec),
        face_wo=f(face_wo),
        halo=halo,
        axis_name=axis_name,
        n_owned_cells_=n_owned_cells,
        n_shards=n_shards,
        dia=dia,
        gathers=gathers,
        host=host_data,
        orthogonal=orthogonal,
        interfaces=tuple(interfaces),
    )


def build_device_mesh(
    mesh: Mesh,
    geom: MeshGeometry | None = None,
    dtype=None,
    plane_major: bool = True,
) -> DeviceMesh:
    """Bake a host Mesh (+geometry) into the device layout.

    plane_major=True renumbers interior faces into PLANE-MAJOR order:
    the face owned by cell c at its j-th owned rank lives at id
    j*n_int_cells + c (padding holes are zero-area dummy faces attached
    to one extra dummy cell).  A flat face array is then a (K, nci)
    stack of contiguous cell-length planes, so the whole assembly fabric
    (take_owner/take_nbr/take_faces) compiles to broadcasts + contiguous
    slices — no gathers (TPU has no hardware gather, ~6 cycles/element)
    AND no period-K interleaves (the previous owner-slot-major layout
    c*K + j needed a repeat/stride-K shuffle per map, which was ~35 ms
    of every 1M-cell step; plane-major measured 30x faster on the
    assembly fabric).
    """
    if geom is None:
        geom = compute_geometry(mesh)
    groups = [
        (g.ident, g.name, g.group_type, g.offset, g.count)
        for g in mesh.face_groups
    ]
    fc = mesh.face_cells
    fa = geom.face_area
    fam = geom.face_area_mag
    fcn = geom.face_centroid
    ccn = geom.cell_centroid
    cv = geom.cell_volume
    n_int_c = mesh.n_interior_cells
    n_int_f = mesh.n_interior_faces
    nc = mesh.n_cells
    nf = mesh.n_faces
    face_valid = None

    periodic_ghost = periodic_src = None
    pairs = getattr(mesh, "periodic_pairs", None)
    if pairs:
        # reposition each periodic ghost at the wrapped partner-owner
        # location: everything downstream (face_ds, e_over_d, LS gradient
        # stencils, interpolation weights) then wraps correctly
        ccn = ccn.copy()
        pg, ps = [], []
        for fa_, fb_ in pairs:
            ga_, gb_ = fc[fa_, 1], fc[fb_, 1]
            oa_, ob_ = fc[fa_, 0], fc[fb_, 0]
            ccn[ga_] = ccn[ob_] + (fcn[fa_] - fcn[fb_])
            ccn[gb_] = ccn[oa_] + (fcn[fb_] - fcn[fa_])
            pg.extend([ga_, gb_])
            ps.extend([ob_, oa_])
        periodic_ghost = jnp.asarray(np.asarray(pg, dtype=np.int32))
        periodic_src = jnp.asarray(np.asarray(ps, dtype=np.int32))

    if plane_major and n_int_c > 0:
        # global slot stride = max faces per interior cell
        counts_all = np.bincount(
            np.concatenate([fc[:, 0], fc[fc[:, 1] < n_int_c, 1]]),
            minlength=n_int_c,
        )
        K = int(counts_all[:n_int_c].max())
        own_int = fc[:n_int_f, 0]
        # rank of each interior face within its owner (stable)
        order = np.argsort(own_int, kind="stable")
        ranks = np.empty(n_int_f, dtype=np.int64)
        seq = np.arange(n_int_f)
        starts = np.searchsorted(own_int[order], np.arange(n_int_c))
        ranks[order] = seq - starts[own_int[order]]
        new_pos_int = ranks * n_int_c + own_int  # plane-major
        n_int_f_new = n_int_c * K
        nf_new = n_int_f_new + (nf - n_int_f)
        dummy_cell = nc  # one extra trash cell
        # scatter old faces into the padded layout
        def scat(a, fill=0.0):
            out = np.full((nf_new,) + a.shape[1:], fill, dtype=a.dtype)
            out[new_pos_int] = a[:n_int_f]
            out[n_int_f_new:] = a[n_int_f:]
            return out

        fc2 = np.full((nf_new, 2), dummy_cell, dtype=fc.dtype)
        fc2[new_pos_int] = fc[:n_int_f]
        fc2[n_int_f_new:] = fc[n_int_f:]
        face_valid = np.zeros(nf_new, dtype=bool)
        face_valid[new_pos_int] = True
        face_valid[n_int_f_new:] = True
        fa = scat(fa)
        fam = scat(fam)
        fcn = scat(fcn)
        fc = fc2
        ccn = np.concatenate([ccn, np.zeros((1, mesh.dim))], axis=0)
        cv = np.concatenate([cv, np.zeros(1)])
        shift = n_int_f_new - n_int_f
        groups = [
            (g[0], g[1], g[2], g[3] + (shift if g[2] != "interior" else 0),
             g[4] if g[2] != "interior" else n_int_f_new)
            for g in groups
        ]
        n_int_f = n_int_f_new
        nc = nc + 1
        nf = nf_new

    iface_meta = tuple(getattr(mesh, "interfaces", ()))
    extra_rows: list = []
    extra_cols: list = []
    if periodic_ghost is not None:
        # implicit periodic rows: each periodic ghost gets an extra ELL
        # slot (slot 1) coupling it to the wrapped partner owner, so the
        # ghost equation dx_g = dx_partner is solved implicitly
        # (core.bcs.periodic_rows); cell ids are slot-major invariant
        extra_rows.append(np.asarray(periodic_ghost))
        extra_cols.append(np.asarray(periodic_src))
    extra_adj = None
    if iface_meta:
        # extra ELL couplings for the shell-ghost rows, in final face
        # numbering (boundary faces keep their relative order under the
        # slot-major shift). Per-row order [partner ghost, partner owner].
        by_name = {g[1]: g for g in groups}
        rows_, cols_ = [], []
        for nm, ln, rn in iface_meta:
            gL, gR = by_name[ln], by_name[rn]
            fL = np.arange(gL[3], gL[3] + gL[4])
            fR = np.arange(gR[3], gR[3] + gR[4])
            ghL = n_int_c + (fL - n_int_f)
            ghR = n_int_c + (fR - n_int_f)
            ownL = fc[fL, 0]
            ownR = fc[fR, 0]
            rows_ += [ghL, ghR, ghL, ghR]
            cols_ += [ghR, ghL, ownR, ownL]
        extra_rows += rows_
        extra_cols += cols_
    if extra_rows:
        extra_adj = (np.concatenate(extra_rows), np.concatenate(extra_cols))

    dm = assemble_device_mesh(
        mesh.dim,
        fc,
        tuple(groups),
        n_int_c,
        n_int_f,
        nc,
        fa,
        fam,
        fcn,
        ccn,
        cv,
        dtype=dtype,
        face_valid=face_valid,
        extra_adj=extra_adj,
        interfaces=iface_meta,
    )
    if periodic_ghost is not None:
        dm = dm.replace(periodic_ghost=periodic_ghost, periodic_src=periodic_src)
    return dm
