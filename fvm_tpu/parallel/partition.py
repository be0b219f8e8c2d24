"""Mesh partitioning for SPMD execution over a TPU device mesh.

TPU-native replacement for the reference's MeshPartitioner
(reference: src/fvm/src/modules/parallel/MeshPartitioner.h:22,
MeshPartitioner.cpp — ParMETIS_V3_PartMeshKway at :577, ghost/interface
construction in mesh()/mappers()).

Key redesign for the XLA/shard_map model: partitioning is a *static,
import-time* transformation.  Instead of per-rank meshes with dynamic
interface lists, every shard gets a **uniformly padded local mesh** — same
cell/face/group counts on every device — so one traced program serves all
shards:

  local cell layout:  [owned interior | boundary ghosts (face-aligned,
                       grouped & padded) | halo copies of remote cells |
                       1 dummy cell]
  local face layout:  [interior faces (padded with dummy faces) |
                       boundary groups (each padded)]

Padding faces have zero area and connect the dummy cell to itself, so they
contribute nothing; padded rows get identity equations via the assembler's
alive-row guard.  Halo exchange tables (ops.halo.HaloSpec) are dense
per-peer index tables realized with one all_to_all per sync — the
counterpart of Field::syncLocal's Isend/Irecv (Field.cpp:361-383).

The default partitioner is recursive coordinate bisection over cell
centroids (deterministic, well-shaped for FVM meshes); a graph partitioner
can be slotted in later without changing any of this layout machinery.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from ..exceptions import MeshError
from ..mesh.mesh import Mesh
from ..mesh.metrics import MeshGeometry, compute_geometry
from ..mesh.device import DeviceMesh, assemble_device_mesh
from ..ops.halo import HaloSpec


def rcb_partition(centroids: np.ndarray, n_parts: int) -> np.ndarray:
    """Recursive coordinate bisection; returns part id per point.

    n_parts must be a power of two (device meshes are).  Splits are exact
    medians so part sizes differ by at most 1.
    """
    n = centroids.shape[0]
    if n_parts & (n_parts - 1):
        raise MeshError("rcb_partition: n_parts must be a power of two")
    parts = np.zeros(n, dtype=np.int64)

    def split(idx, lo, hi):
        if hi - lo == 1:
            parts[idx] = lo
            return
        pts = centroids[idx]
        axis = int(np.argmax(pts.max(axis=0) - pts.min(axis=0)))
        order = np.argsort(pts[:, axis], kind="stable")
        half = len(idx) // 2
        mid = (lo + hi) // 2
        split(idx[order[:half]], lo, mid)
        split(idx[order[half:]], mid, hi)

    split(np.arange(n, dtype=np.int64), 0, n_parts)
    return parts


def greedy_partition(mesh: Mesh, n_parts: int) -> np.ndarray:
    """Greedy graph-growing partition (the reference's ParMETIS role,
    MeshPartitioner.cpp:577, without the external library): each part is
    BFS-grown to its target size over the cell-adjacency graph, always
    absorbing the frontier cell with the most neighbors already inside
    the part (locally minimizes the cut); the next part seeds from the
    frontier of the grown region, so part ids advance roughly
    monotonically through the mesh (adjacent parts get adjacent ids —
    what the cross-shard SPIKE pairing wants).  Balanced to +-1 cell.

    Measured (PARITY.md round-4 bake-off, 8 shards): RCB's median
    planes still produce 1.1-1.5x SMALLER cuts/halos on the reference's
    own cav_tetra and 3d-beam tet meshes, so RCB stays the default;
    this option exists for meshes whose geometry misleads coordinate
    bisection (e.g. folded/serpentine domains)."""
    import heapq
    import itertools

    n = mesh.n_interior_cells
    fc = mesh.face_cells[: mesh.n_interior_faces]
    a = np.concatenate([fc[:, 0], fc[:, 1]])
    b = np.concatenate([fc[:, 1], fc[:, 0]])
    order = np.argsort(a, kind="stable")
    a, b = a[order], b[order]
    ptr = np.searchsorted(a, np.arange(n + 1))
    parts = np.full(n, -1, np.int64)
    sizes = np.full(n_parts, n // n_parts, np.int64)
    sizes[: n % n_parts] += 1
    degree = ptr[1:] - ptr[:-1]
    gain = np.zeros(n, np.int64)  # neighbors in the CURRENT part
    afront = np.zeros(n, np.int64)  # neighbors in ANY finished part
    for p in range(n_parts):
        free = np.nonzero(parts < 0)[0]
        if not len(free):
            break
        if p == 0:
            seed = int(free[np.argmin(degree[free])])  # peripheral corner
        else:
            # continue from the frontier of the already-grown region
            fr = afront[free]
            seed = int(free[np.argmax(fr)]) if fr.max() > 0 else int(
                free[np.argmin(degree[free])]
            )
        # FIFO tie-break: equal-gain frontier cells absorb in insertion
        # order, keeping the growth front geometrically compact (a
        # cell-id tie-break teleports growth across the mesh and was
        # measured 2.6x worse on cav_tetra)
        cnt = itertools.count()
        heap = [(0, next(cnt), seed)]
        grown = 0
        while grown < sizes[p] and heap:
            g, _, c = heapq.heappop(heap)
            if parts[c] >= 0 or -g != gain[c]:
                continue  # stale heap entry
            parts[c] = p
            grown += 1
            for u in b[ptr[c]: ptr[c + 1]]:
                if parts[u] < 0:
                    gain[u] += 1
                    heapq.heappush(heap, (-int(gain[u]), next(cnt), int(u)))
        if grown < sizes[p]:
            # disconnected remainder: restart growth from fresh seeds
            free = np.nonzero(parts < 0)[0]
            for c in free[: sizes[p] - grown]:
                parts[c] = p
                grown += 1
        # reset per-part gains; fold into the finished-region frontier
        afront[:] = afront + gain
        gain[:] = 0
    parts[parts < 0] = n_parts - 1
    return parts


class Partition:
    """Partition a host mesh into n_shards uniformly padded local meshes."""

    def __init__(
        self,
        mesh: Mesh,
        n_shards: int,
        geom: MeshGeometry | None = None,
        axis_name: str = "fvm_x",
        dtype=None,
        parts: np.ndarray | None = None,
        halo_depth: int = 1,
        ordinate_shards: int = 1,
        ordinate_axis: str = "fvm_v",
        method: str = "rcb",
    ):
        """``halo_depth=2`` adds the second ghost ring (remote neighbors
        of ring-1 halo cells) to the exchange tables — the reference's
        Level-1 maps (StorageSite.h:68-77, MeshPartitioner.h:117-118)
        backing cellCells2 stencils; one all_to_all still syncs both
        rings."""
        if geom is None:
            geom = compute_geometry(mesh)
        self.mesh = mesh
        self.geom = geom
        self.n_shards = int(n_shards)
        self.axis_name = axis_name
        self.halo_depth = int(halo_depth)
        dtype = dtype or config.dtype

        n_int = mesh.n_interior_cells
        n_int_f = mesh.n_interior_faces
        nf = mesh.n_faces
        owner = mesh.face_cells[:, 0]
        nbr = mesh.face_cells[:, 1]

        if parts is None:
            if method == "greedy":
                parts = greedy_partition(mesh, self.n_shards)
            else:
                parts = rcb_partition(
                    geom.cell_centroid[:n_int], self.n_shards
                )

        # --- double-shell interfaces: co-locate the two bulk owners -------
        # Each interface face pair (L,R) couples ghost_L/ghost_R/owner_L/
        # owner_R in one 4-cell stencil (core.interfaces slot layout).
        # Forcing both bulk owners into the same shard keeps every
        # interface stencil shard-local AND keeps the padded L/R group
        # subsets positionally aligned (the kernels pair fL[i] with fR[i]).
        # The TPU analogue of the reference keeping a shell mesh's two
        # parent meshes on one rank (MeshAssembler-based COMET setup).
        self._ifaces = tuple(getattr(mesh, "interfaces", ()))
        if self._ifaces:
            parts = parts.copy()
            owner_of = mesh.face_cells[:, 0]
            parent = np.arange(n_int, dtype=np.int64)

            def find(a):
                while parent[a] != a:
                    parent[a] = parent[parent[a]]
                    a = parent[a]
                return a

            by_name = {g.name: g for g in mesh.face_groups}
            for nm, ln, rn in self._ifaces:
                gL, gR = by_name[ln], by_name[rn]
                for i in range(gL.count):
                    a = find(int(owner_of[gL.offset + i]))
                    b = find(int(owner_of[gR.offset + i]))
                    if a != b:
                        parent[b] = a
            roots = np.array([find(c) for c in range(n_int)], dtype=np.int64)
            parts = parts[roots]
        self.parts = parts

        # --- periodic pairs: wrapped ghost geometry + partner lut ---------
        # (same repositioning as build_device_mesh; the partner owner of a
        # ghost may live on another shard, so it is added to the halo and
        # the implicit slot-1 coupling references its halo copy)
        ccn_use = geom.cell_centroid
        self._periodic_lut: dict | None = None
        pairs = getattr(mesh, "periodic_pairs", None)
        if pairs:
            fc_ = mesh.face_cells
            fcn_ = geom.face_centroid
            ccn_use = ccn_use.copy()
            lut = {}
            for fa_, fb_ in pairs:
                ga_, gb_ = fc_[fa_, 1], fc_[fb_, 1]
                oa_, ob_ = fc_[fa_, 0], fc_[fb_, 0]
                ccn_use[ga_] = ccn_use[ob_] + (fcn_[fa_] - fcn_[fb_])
                ccn_use[gb_] = ccn_use[oa_] + (fcn_[fb_] - fcn_[fa_])
                lut[int(ga_)] = int(ob_)
                lut[int(gb_)] = int(oa_)
            self._periodic_lut = lut
        self._ccn_wrapped = ccn_use

        bgroups = [g for g in mesh.face_groups if g.group_type != "interior"]

        # --- per-shard selections ---------------------------------------
        face_part = parts[owner]  # owner of every face is interior
        is_int_face = np.arange(nf) < n_int_f
        nbr_is_int = nbr < n_int

        sel_faces = []  # per shard: global face ids, local order
        own_int = []  # per shard: global interior cell ids
        grp_faces = []  # per shard: {gname: global face ids}
        for d in range(self.n_shards):
            oi = np.nonzero(parts == d)[0]
            own_int.append(oi)
            fsel = (face_part == d) | (
                is_int_face & nbr_is_int & (parts[np.minimum(nbr, n_int - 1)] == d)
            )
            # interior faces first
            fint = np.nonzero(fsel & is_int_face)[0]
            gdict = {}
            for g in bgroups:
                gf = np.arange(g.offset, g.offset + g.count)
                gdict[g.name] = gf[face_part[gf] == d]
            sel_faces.append((fint, gdict))
            grp_faces.append(gdict)

        L_int_c = max(len(x) for x in own_int)
        L_int_f = max(len(x[0]) for x in sel_faces)
        L_grp = {
            g.name: max(len(grp_faces[d][g.name]) for d in range(self.n_shards))
            for g in bgroups
        }
        n_bf_local = sum(L_grp.values())

        # local layout constants
        self._L_int_c = L_int_c
        self._L_grp = L_grp
        self._bgroups = bgroups
        n_owned = L_int_c + n_bf_local

        # --- build each shard's local mesh -------------------------------
        local_meshes = []
        g2l = np.full((self.n_shards, mesh.n_cells), -1, dtype=np.int64)
        halo_global: list[np.ndarray] = []  # per shard: global ids of halo cells
        self._grp_global_pos = {}  # (d, gname) -> positions within global group

        # first pass: establish local numbering & halo sets
        for d in range(self.n_shards):
            oi = own_int[d]
            g2l[d, oi] = np.arange(len(oi))
            # ghost cells aligned with padded groups
            off = L_int_c
            for g in bgroups:
                gf = grp_faces[d][g.name]  # global boundary faces
                ghosts = n_int + (gf - n_int_f)  # global ghost ids
                g2l[d, ghosts] = off + np.arange(len(gf))
                off += L_grp[g.name]
            # halo: remote interior cells referenced by local faces
            fint, gdict = sel_faces[d]
            ref = np.unique(
                np.concatenate([owner[fint], nbr[fint]])
            ) if len(fint) else np.array([], dtype=np.int64)
            halo = ref[(ref < n_int) & (parts[ref] != d)]
            if self._periodic_lut:
                # partner owners of this shard's periodic ghosts
                psrc = np.array(
                    [
                        src
                        for gh, src in self._periodic_lut.items()
                        if g2l[d, gh] >= 0 and parts[src] != d
                    ],
                    dtype=np.int64,
                )
                halo = np.unique(np.concatenate([halo, psrc]))
            if halo_depth > 1:
                cc = mesh.cell_cells
                ring = halo
                for _ in range(halo_depth - 1):
                    if len(ring) == 0:
                        break
                    cnt = cc.row_ptr[ring + 1] - cc.row_ptr[ring]
                    idx = np.repeat(
                        cc.row_ptr[ring], cnt
                    ) + (np.arange(cnt.sum()) - np.repeat(
                        np.cumsum(cnt) - cnt, cnt
                    ))
                    nb = cc.col[idx]
                    nb = np.unique(nb[nb < n_int])
                    nb = nb[parts[nb] != d]
                    ring = np.setdiff1d(nb, halo)
                    halo = np.union1d(halo, ring)
            halo_global.append(halo)

        L_halo = max((len(h) for h in halo_global), default=0)
        L_halo = max(L_halo, 1)
        n_cells_local = n_owned + L_halo + 1  # +1 dummy
        dummy = n_cells_local - 1

        for d in range(self.n_shards):
            h = halo_global[d]
            g2l[d, h] = n_owned + np.arange(len(h))

        # second pass: assemble local arrays
        for d in range(self.n_shards):
            fint, gdict = sel_faces[d]
            # local faces: padded interior + padded groups
            face_list = np.full(L_int_f, -1, dtype=np.int64)
            face_list[: len(fint)] = fint
            groups_meta = [(0, "interior", "interior", 0, L_int_f)]
            offs = L_int_f
            parts_list = [face_list]
            for g in bgroups:
                gf = gdict[g.name]
                pad = np.full(L_grp[g.name], -1, dtype=np.int64)
                pad[: len(gf)] = gf
                parts_list.append(pad)
                groups_meta.append((g.ident, g.name, g.group_type, offs, L_grp[g.name]))
                self._grp_global_pos[(d, g.name)] = gf - g.offset
                offs += L_grp[g.name]
            flist = np.concatenate(parts_list)
            real = flist >= 0
            fg = np.where(real, flist, 0)

            fc_local = np.full((len(flist), 2), dummy, dtype=np.int64)
            fc_local[real, 0] = g2l[d, owner[fg[real]]]
            fc_local[real, 1] = g2l[d, nbr[fg[real]]]
            if (fc_local[real] < 0).any():
                raise MeshError("partition: unmapped cell in local face table")

            # geometry
            fa = np.where(real[:, None], self.geom.face_area[fg], 0.0)
            fam = np.where(real, self.geom.face_area_mag[fg], 0.0)
            fcent = np.where(real[:, None], self.geom.face_centroid[fg], 0.0)

            ccent = np.zeros((n_cells_local, mesh.dim))
            cvol = np.zeros(n_cells_local)
            gcells = np.nonzero(g2l[d] >= 0)[0]
            ccent[g2l[d, gcells]] = self._ccn_wrapped[gcells]
            cvol[g2l[d, gcells]] = self.geom.cell_volume[gcells]

            extra_rows_, extra_cols_ = [], []
            if self._periodic_lut:
                gh_glob = np.sort(
                    np.array(
                        [gh for gh in self._periodic_lut if g2l[d, gh] >= 0],
                        dtype=np.int64,
                    )
                )
                src_glob = np.array(
                    [self._periodic_lut[int(gh)] for gh in gh_glob],
                    dtype=np.int64,
                )
                rows_p = g2l[d, gh_glob] if len(gh_glob) else gh_glob
                cols_p = g2l[d, src_glob] if len(gh_glob) else src_glob
                if len(rows_p) and (cols_p < 0).any():
                    raise MeshError("partition: periodic partner not in halo")
                if len(rows_p):
                    extra_rows_.append(rows_p)
                    extra_cols_.append(cols_p)
            if self._ifaces:
                # shell-ghost couplings, same per-row order as
                # mesh.device.build_device_mesh: [partner ghost, partner
                # owner] land at slots 1 and 2 (stable within-row order)
                by_name_g = {g.name: g for g in bgroups}
                for nm, ln, rn in self._ifaces:
                    gLg, gRg = by_name_g[ln], by_name_g[rn]
                    posL = self._grp_global_pos[(d, ln)]
                    posR = self._grp_global_pos[(d, rn)]
                    if not np.array_equal(posL, posR):
                        raise MeshError(
                            f"partition: interface {nm!r} L/R subsets "
                            "misaligned (owner co-location failed)"
                        )
                    if len(posL) == 0:
                        continue
                    fLg = gLg.offset + posL
                    fRg = gRg.offset + posR
                    ghL = g2l[d, n_int + (fLg - n_int_f)]
                    ghR = g2l[d, n_int + (fRg - n_int_f)]
                    ownL = g2l[d, owner[fLg]]
                    ownR = g2l[d, owner[fRg]]
                    if min(ghL.min(), ghR.min(), ownL.min(), ownR.min()) < 0:
                        raise MeshError(
                            f"partition: interface {nm!r} stencil not local"
                        )
                    extra_rows_ += [ghL, ghR, ghL, ghR]
                    extra_cols_ += [ghR, ghL, ownR, ownL]
            extra = (
                (np.concatenate(extra_rows_), np.concatenate(extra_cols_))
                if extra_rows_
                else None
            )

            lm = assemble_device_mesh(
                mesh.dim,
                fc_local,
                tuple(groups_meta),
                n_interior_cells=L_int_c,
                n_interior_faces=L_int_f,
                n_cells=n_cells_local,
                face_area=fa,
                face_area_mag=fam,
                face_centroid=fcent,
                cell_centroid=ccent,
                cell_volume=cvol,
                dtype=dtype,
                n_owned_cells=n_owned,
                as_numpy=True,
                extra_adj=extra,
                interfaces=self._ifaces,
            )
            local_meshes.append(lm)

        # uniform K across shards
        Kmax = max(lm.max_faces_per_cell for lm in local_meshes)
        if any(lm.max_faces_per_cell != Kmax for lm in local_meshes):
            # rebuild with uniform K
            rebuilt = []
            for d, lm in enumerate(local_meshes):
                if lm.max_faces_per_cell == Kmax:
                    rebuilt.append(lm)
                else:
                    # cf tables are slot-leading (K, ncl): pad slot axis 0
                    pad = lambda a, fill: np.concatenate(
                        [a, np.full((Kmax - a.shape[0],) + a.shape[1:], fill, a.dtype)],
                        axis=0,
                    )
                    rebuilt.append(
                        lm.replace(
                            cf_face=pad(np.asarray(lm.cf_face), 0),
                            cf_is_owner=pad(np.asarray(lm.cf_is_owner), False),
                            cf_mask=pad(np.asarray(lm.cf_mask), False),
                            cf_nbr=np.concatenate(
                                [
                                    np.asarray(lm.cf_nbr),
                                    np.tile(
                                        np.arange(lm.n_cells, dtype=np.int32)[None, :],
                                        (Kmax - lm.cf_nbr.shape[0], 1),
                                    ),
                                ],
                                axis=0,
                            ),
                            max_faces_per_cell=Kmax,
                        )
                    )
            local_meshes = rebuilt

        # --- halo exchange tables ---------------------------------------
        # cells that peer p needs from shard d, in sorted-global order
        M = 1
        need = {}
        for d in range(self.n_shards):
            h = halo_global[d]
            owners_of_h = parts[h]
            for p in range(self.n_shards):
                cells = h[owners_of_h == p]
                need[(d, p)] = cells  # d needs these from p
                M = max(M, len(cells))
        send_idx = np.zeros((self.n_shards, self.n_shards, M), dtype=np.int64)
        recv_idx = np.full(
            (self.n_shards, self.n_shards, M), n_cells_local, dtype=np.int64
        )
        for d in range(self.n_shards):
            for p in range(self.n_shards):
                cells = need[(p, d)]  # p needs these from d -> d sends
                send_idx[d, p, : len(cells)] = g2l[d, cells]
                cells2 = need[(d, p)]  # d receives these from p
                recv_idx[d, p, : len(cells2)] = g2l[d, cells2]

        halo = HaloSpec(
            send_idx=jnp.asarray(send_idx, jnp.int32),
            recv_idx=jnp.asarray(recv_idx, jnp.int32),
        )

        # --- stack local meshes into one sharded pytree ------------------
        stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *local_meshes)
        self.sharded_mesh: DeviceMesh = stacked.replace(
            halo=halo,
            axis_name=axis_name,
            n_owned_cells_=n_owned,
            n_shards=self.n_shards,
        )
        if self._periodic_lut:
            # stacked (S, P) local periodic tables, padded with the dummy
            # cell (dummy -> dummy copies are no-ops in extend_to_ghosts)
            pg_all, ps_all = [], []
            for d in range(self.n_shards):
                gh_glob = np.sort(
                    np.array(
                        [gh for gh in self._periodic_lut if g2l[d, gh] >= 0],
                        dtype=np.int64,
                    )
                )
                pg_all.append(
                    g2l[d, gh_glob] if len(gh_glob) else np.zeros(0, np.int64)
                )
                ps_all.append(
                    g2l[
                        d,
                        np.array(
                            [self._periodic_lut[int(g_)] for g_ in gh_glob],
                            dtype=np.int64,
                        ),
                    ]
                    if len(gh_glob)
                    else np.zeros(0, np.int64)
                )
            P = max(1, max(len(x) for x in pg_all))
            pg = np.full((self.n_shards, P), dummy, dtype=np.int64)
            ps = np.full((self.n_shards, P), dummy, dtype=np.int64)
            for d in range(self.n_shards):
                pg[d, : len(pg_all[d])] = pg_all[d]
                ps[d, : len(ps_all[d])] = ps_all[d]
            self.sharded_mesh = self.sharded_mesh.replace(
                periodic_ghost=jnp.asarray(pg, jnp.int32),
                periodic_src=jnp.asarray(ps, jnp.int32),
            )
        self.g2l = g2l
        self.n_cells_local = n_cells_local
        self.n_owned_local = n_owned
        self._own_int = own_int

        devs = jax.devices()
        self.ordinate_shards = int(ordinate_shards)
        self.ordinate_axis = ordinate_axis
        need = self.n_shards * self.ordinate_shards
        if len(devs) < need:
            raise MeshError(
                f"partition: {need} devices needed "
                f"({self.n_shards} spatial x {self.ordinate_shards} "
                f"ordinate shards) but only {len(devs)} available"
            )
        if self.ordinate_shards > 1:
            # 2D device mesh (space x ordinates): the step is shard_map'd
            # MANUALLY over the spatial axis while the ordinate axis stays
            # AUTO — XLA's GSPMD partitions the trailing ordinate dims and
            # inserts the moment psums / mirror permutes (SURVEY S5: the
            # reference decomposes space under MPI AND batches directions,
            # Field.cpp:734-827 syncLocalVectorFields)
            self.jax_mesh = jax.sharding.Mesh(
                np.array(devs[:need]).reshape(
                    self.n_shards, self.ordinate_shards
                ),
                (axis_name, ordinate_axis),
            )
        else:
            self.jax_mesh = jax.sharding.Mesh(
                np.array(devs[: self.n_shards]), (axis_name,)
            )

    # ------------------------------------------------------------------

    def shard_spec(self):
        return jax.sharding.NamedSharding(
            self.jax_mesh, jax.sharding.PartitionSpec(self.axis_name)
        )

    def device_put(self, stacked):
        """Place a stacked (n_shards, ...) pytree with shard-axis sharding."""
        spec = self.shard_spec()
        return jax.tree.map(lambda a: jax.device_put(a, spec), stacked)

    def scatter_bc(self, group_name: str, values) -> jnp.ndarray:
        """Global per-group BC value array -> stacked (n_shards, L_grp)."""
        g = [g for g in self._bgroups if g.name == group_name][0]
        L = self._L_grp[group_name]
        values = np.asarray(values)
        if values.ndim == 0:
            values = np.full(g.count, values)
        out = np.zeros((self.n_shards, L), dtype=values.dtype)
        for d in range(self.n_shards):
            pos = self._grp_global_pos[(d, group_name)]
            out[d, : len(pos)] = values[pos]
        if out.dtype.kind == "f":
            return jnp.asarray(out, config.dtype)
        return jnp.asarray(out)

    def gather_bc(self, group_name: str, stacked) -> np.ndarray:
        """Stacked per-shard per-group face arrays (S, L_grp, ...) ->
        global per-face array for the group (inverse of scatter_bc;
        padded local slots are dropped).  Used to assemble global BC
        gradients from per-shard adjoint cotangents."""
        g = [g for g in self._bgroups if g.name == group_name][0]
        stacked = np.asarray(stacked)
        out = np.zeros((g.count,) + stacked.shape[2:], stacked.dtype)
        for d in range(self.n_shards):
            pos = self._grp_global_pos[(d, group_name)]
            out[pos] = stacked[d, : len(pos)]
        return out

    def periodic_group_src(self, group_name: str) -> np.ndarray:
        """(S, L_grp) stacked LOCAL partner-owner cell per ghost of a
        Periodic boundary group, padded with the dummy cell.  Row order
        matches the group's local ghost slice (face-slot order)."""
        if not self._periodic_lut:
            raise MeshError("periodic_group_src: mesh has no periodic pairs")
        g = [g for g in self._bgroups if g.name == group_name][0]
        L = self._L_grp[group_name]
        mesh = self.mesh
        dummy = self.n_cells_local - 1
        out = np.full((self.n_shards, L), dummy, dtype=np.int64)
        for d in range(self.n_shards):
            pos = self._grp_global_pos[(d, group_name)]
            if len(pos) == 0:
                continue
            gf = g.offset + pos  # global face ids
            ghosts = mesh.n_interior_cells + (gf - mesh.n_interior_faces)
            try:
                src = np.array(
                    [self._periodic_lut[int(gh)] for gh in ghosts],
                    dtype=np.int64,
                )
            except KeyError as e:
                raise MeshError(
                    f"group {group_name!r}: not all faces are periodic-paired"
                ) from e
            loc = self.g2l[d, src]
            if (loc < 0).any():
                raise MeshError("periodic_group_src: partner not local/halo")
            out[d, : len(pos)] = loc
        return out

    def group_valid_mask(self, group_name: str) -> jnp.ndarray:
        L = self._L_grp[group_name]
        out = np.zeros((self.n_shards, L), dtype=bool)
        for d in range(self.n_shards):
            n = len(self._grp_global_pos[(d, group_name)])
            out[d, :n] = True
        return jnp.asarray(out)

    def global_group_count(self, group_name: str) -> int:
        return [g for g in self._bgroups if g.name == group_name][0].count

    def scatter_cells(self, values: np.ndarray) -> jnp.ndarray:
        """Global cell array (interior + ghosts) -> stacked local arrays."""
        values = np.asarray(values)
        out = np.zeros(
            (self.n_shards, self.n_cells_local) + values.shape[1:], values.dtype
        )
        for d in range(self.n_shards):
            gc = np.nonzero(self.g2l[d] >= 0)[0]
            out[d, self.g2l[d, gc]] = values[gc]
        return jnp.asarray(out)

    def gather_cells(self, stacked) -> np.ndarray:
        """Stacked local arrays -> global interior cell array."""
        stacked = np.asarray(stacked)
        out = np.zeros(
            (self.mesh.n_interior_cells,) + stacked.shape[2:], stacked.dtype
        )
        for d in range(self.n_shards):
            oi = self._own_int[d]
            out[oi] = stacked[d, self.g2l[d, oi]]
        return out
