"""Model base class.

Counterpart of the reference's ``Model`` (reference: Model.h:13-26) plus the
driver conventions shared by all models: per-boundary BC maps, a VC dict,
a ModelOptions dict, ``init()`` / ``advance(n)`` / ``updateTime()``, and
persistence hooks (getPersistenceData/restart).

TPU-native structure: all mutable state lives in ``self.state`` — a flat
dict of jnp arrays (a pytree).  ``advance`` runs a jit-compiled
linearize+solve step; the python loop around it only checks convergence.
Forward-mode sensitivities (the reference's Tangent atype) come for free:
``jax.jvp(lambda s: model.step_fn(s), ...)`` over the same step.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..core.options import BoundaryCondition, ModelOptions
from ..exceptions import ConfigError


def zero_float_tangent(tree):
    """Zero tangent pytree: float leaves get zeros, everything else the
    symbolic float0 tangent jax.jvp expects for non-differentiable leaves."""
    import jax.dtypes

    def z(x):
        x = jnp.asarray(x) if not hasattr(x, "dtype") else x
        if jnp.issubdtype(x.dtype, jnp.floating) or jnp.issubdtype(
            x.dtype, jnp.complexfloating
        ):
            return jnp.zeros_like(x)
        return np.zeros(np.shape(x), jax.dtypes.float0)

    return jax.tree.map(z, tree)


class Model:
    name = "Model"

    def __init__(self, mesh: DeviceMesh, partition=None):
        """``mesh`` is a single-device DeviceMesh or a Partition's
        sharded_mesh (stacked local meshes); for the latter pass the
        Partition as ``partition``."""
        self.mesh = mesh
        self.partition = partition
        self._dist = mesh.n_shards is not None
        if self._dist and partition is None:
            raise ConfigError(f"{self.name}: sharded mesh requires partition=")
        self.state: dict = {}
        self.params: dict = {}
        self.options = self._make_options()
        # bc map keyed by both group name and ident (reference drivers use
        # ids, bc[zone.ident]; our generators use names)
        self.bc: dict = {}
        for g in mesh.boundary_groups():
            bc = self._make_bc()
            self.bc[g[1]] = bc
            self.bc[g[0]] = bc
        # double-shell interface closures (mesh.make_interface): per
        # interface name, an options dict, e.g. {"type": "jump",
        # "A_coeff": a, "B_coeff": b, "weight_R": w}.  Default (absent
        # entry) is a continuous interface (A=1, B=0).
        self.interface: dict = {}
        ifaces = getattr(mesh, "interfaces", ())
        if ifaces:
            if not getattr(self, "_supports_interfaces", False):
                raise ConfigError(
                    f"{self.name}: mesh has double-shell interfaces "
                    f"({[i[0] for i in ifaces]}) but this model does not "
                    "support them"
                )
        self._initialized = False

    # --- distribution helpers ---------------------------------------------

    def _cell_field(self, vcdict, key, extend_ghosts=False):
        """Resolve a VC entry to a cell array ((nc,) or stacked (S, nc))."""
        import jax.numpy as jnp
        from ..core import bcs as bck

        mesh = self.mesh
        dtype = mesh.cell_volume.dtype
        v = vcdict[key]
        if self._dist:
            return self._scatter_host_cells(v, dtype, extend_ghosts)
        arr = vcdict.resolve(key, mesh.n_cells, dtype)
        if extend_ghosts:
            arr = bck.extend_to_ghosts(mesh, arr)
        return arr

    def _scatter_host_cells(self, v, dtype, extend_ghosts=False):
        """Global (interior-or-full) cell value/array -> stacked per-shard
        local arrays, optionally owner-copying into uncovered ghosts (the
        dist counterpart of bcs.extend_to_ghosts)."""
        arr = np.asarray(v)
        hm = self.partition.mesh
        if arr.ndim == 0:
            host = np.full(hm.n_cells, float(arr))
        else:
            host = np.zeros(hm.n_cells)
            host[: len(arr)] = arr
            if extend_ghosts and len(arr) < hm.n_cells:
                gh = np.arange(max(len(arr), hm.n_interior_cells), hm.n_cells)
                own = hm.face_cells[
                    hm.n_interior_faces + (gh - hm.n_interior_cells), 0
                ]
                host[gh] = host[own]
        return jnp.asarray(self.partition.scatter_cells(host), dtype)

    def _full_cells(self, value, trailing=()):
        import jax.numpy as jnp

        mesh = self.mesh
        dtype = mesh.cell_volume.dtype
        shape = ((mesh.n_shards,) if self._dist else ()) + (mesh.n_cells,) + trailing
        return jnp.full(shape, value, dtype)

    def _full_faces(self, value, trailing=()):
        import jax.numpy as jnp

        mesh = self.mesh
        dtype = mesh.cell_volume.dtype
        shape = ((mesh.n_shards,) if self._dist else ()) + (mesh.n_faces,) + trailing
        return jnp.full(shape, value, dtype)

    def _resolve_bcvals(self):
        """BC value dict: per-group arrays; stacked & padded when dist."""
        import jax.numpy as jnp

        vals = {}
        for g, bc in self._group_bcs():
            if self._dist:
                gname = g[1]
                n_global = self.partition.global_group_count(gname)
                for key in bc:
                    vals[f"{gname}:{key}"] = self.partition.scatter_bc(
                        gname, np.asarray(bc.resolve(key, n_global))
                    )
                vals[f"{gname}:__valid"] = self.partition.group_valid_mask(gname)
            else:
                for key in bc:
                    vals[f"{g[1]}:{key}"] = bc.resolve(key, g[4])
                vals[f"{g[1]}:__valid"] = jnp.ones(g[4], bool)
        return vals

    def _shard_ordinates(self, state_keys, param_keys, n_shards,
                         axis="fvm_v"):
        """Shard the trailing ORDINATE axis of kinetic state/params over a
        device-mesh axis (the velocity/k-space analogue of tensor
        parallelism, SURVEY §5: the reference batches the N123 ordinate
        axis through syncLocalVectorFields, Field.h:53).

        TPU-native design: plain NamedSharding annotations + jit — XLA's
        SPMD partitioner inserts the all-reduces for moment sums and the
        collective permutes for mirror reflections automatically, so the
        model code is unchanged (the scaling-book recipe: pick a mesh,
        annotate shardings, let XLA insert collectives)."""
        P_ = int(n_shards)
        devs = jax.devices()
        if len(devs) < P_:
            raise ConfigError(
                f"ordinate_shards={P_} but only {len(devs)} devices"
            )
        vmesh = jax.sharding.Mesh(np.array(devs[:P_]), (axis,))
        self._ordinate_mesh = vmesh

        def put(a):
            if a.shape[-1] % P_:
                raise ConfigError(
                    f"ordinate count {a.shape[-1]} not divisible by "
                    f"ordinate_shards={P_}"
                )
            spec = jax.sharding.PartitionSpec(
                *((None,) * (a.ndim - 1) + (axis,))
            )
            return jax.device_put(
                a, jax.sharding.NamedSharding(vmesh, spec)
            )

        for k in state_keys:
            if k in self.state:
                self.state[k] = put(self.state[k])
        for k in param_keys:
            if k in self.params:
                self.params[k] = put(self.params[k])

    def _combined_ordinate_put(self, state_keys, param_keys):
        """Combined spatial x ordinate sharding: re-place stacked
        (S, ..., N) kinetic arrays so the leading shard axis maps to the
        MANUAL spatial mesh axis and the trailing ordinate axis to the
        AUTO ordinate axis (GSPMD partitions it inside the shard_map'd
        step; reference: Field.cpp:734-827 syncLocalVectorFields)."""
        part = self.partition
        jmesh = part.jax_mesh
        P_ = part.ordinate_shards
        ax, vax = part.axis_name, part.ordinate_axis

        def put(a):
            if a.shape[-1] % P_:
                raise ConfigError(
                    f"ordinate count {a.shape[-1]} not divisible by "
                    f"ordinate_shards={P_}"
                )
            spec = jax.sharding.PartitionSpec(
                ax, *((None,) * (a.ndim - 2)), vax
            )
            return jax.device_put(a, jax.sharding.NamedSharding(jmesh, spec))

        for k in state_keys:
            if k in self.state:
                self.state[k] = put(self.state[k])
        for k in param_keys:
            if k in self.params:
                self.params[k] = put(self.params[k])

    def _map_mesh(self, fn, *args):
        """Apply ``fn(local_mesh, *args)`` — vmapped over the shard axis
        when distributed (post-processing paths; the stacked state already
        carries synced halos from the last step)."""
        if self._dist:
            return jax.vmap(fn)(self.mesh, *args)
        return fn(self.mesh, *args)

    def _sum_group(self, g, F):
        """Sum a per-face quantity over a boundary group's REAL faces.

        ``F``: (nf, ...) single-device or (S, nf, ...) stacked.  When
        distributed, padded group slots are masked out and the sum runs
        over every shard (counterpart of the reference's per-rank integral
        + allreduce in get<Var>FluxIntegral accessors)."""
        sl = self.mesh.group_faces(g)
        if self._dist:
            Fg = F[:, sl]
            mask = self.partition.group_valid_mask(g[1])
            mask = mask.reshape(mask.shape + (1,) * (Fg.ndim - 2))
            return jnp.sum(jnp.where(mask, Fg, 0), axis=(0, 1))
        return jnp.sum(F[sl], axis=0)

    def _group_bc_values(self, g, bc, key):
        """Per-face BC values for a group: (L,) or stacked (S, L)."""
        if self._dist:
            n_global = self.partition.global_group_count(g[1])
            return self.partition.scatter_bc(
                g[1], np.asarray(bc.resolve(key, n_global))
            )
        return bc.resolve(key, g[4])

    def _smap_cells(self, fn):
        """shard_map a ``fn(local_mesh, *local_args) -> local cell array``
        over the partition axis (args and result stacked per shard).
        Used by distributed post-solve paths (sensitivities, UQ)."""
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map as smap
        except ImportError:
            from jax.experimental.shard_map import shard_map as smap

        axis = self.mesh.axis_name
        jmesh = self.partition.jax_mesh

        def local(mesh, *args):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)
            out = fn(sq(mesh), *[sq(a) for a in args])
            return jax.tree.map(lambda a: a[None], out)

        def wrapped(mesh, *args):
            m = smap(
                local,
                mesh=jmesh,
                in_specs=(P(axis),) * (1 + len(args)),
                out_specs=P(axis),
                check_vma=False,
            )
            return m(mesh, *args)

        return jax.jit(wrapped)

    # --- immersed-boundary plumbing (reference: IBManager consumers +
    # GenericIBDiscretization.h) ----------------------------------------

    def _set_immersed_boundary(
        self, mask, value, stencil=None, implicit=True
    ) -> None:
        """Shared IBM parameter setup.

        ``mask``: per-cell bool (global interior ordering when dist);
        ``value``: scalar or per-cell body value ((n,) or (n, m));
        ``stencil``: IBManager.interpolation_stencil() output — with
        ``implicit=True`` (default) the interpolation rows go into the
        matrix through appended ELL slots (ib_stencil_rows_implicit,
        matching GenericIBDiscretization.h); implicit=False keeps the
        lagged pinned-row variant.  Call AFTER init()."""
        if not self._initialized:
            # init() rebuilds self.params and would silently wipe the masks
            raise ConfigError("call init() before set_immersed_boundary()")
        mesh = self.mesh
        dtype = mesh.cell_volume.dtype
        self._ib_ext = getattr(self, "_ib_ext", None)
        if self._dist:
            hm = self.partition.mesh
            m = np.zeros(hm.n_cells, bool)
            marr = np.asarray(mask, dtype=bool)
            m[: len(marr)] = marr
            self.params["ib_mask"] = jnp.asarray(
                self.partition.scatter_cells(m)
            )
            v = np.asarray(value, dtype=np.float64)
            if v.ndim == 0:
                v = np.full(hm.n_cells, float(v))
            else:
                vv = np.zeros((hm.n_cells,) + v.shape[1:])
                vv[: len(v)] = v
                v = vv
            self.params["ib_value"] = jnp.asarray(
                self.partition.scatter_cells(v), dtype
            )
            if stencil is not None:
                if not implicit:
                    raise ConfigError(
                        "distributed IBM stencils: implicit only")
                self._set_ib_stencil_dist(stencil, dtype)
            return
        nc = mesh.n_cells
        m = np.zeros(nc, dtype=bool)
        marr = np.asarray(mask, dtype=bool)
        m[: len(marr)] = marr  # device mesh may append a padding cell
        self.params["ib_mask"] = jnp.asarray(m)
        v = jnp.asarray(value, dtype)
        if v.ndim == 0:
            v = jnp.full(nc, v, dtype)
        elif v.shape[0] != nc:
            vv = np.zeros((nc,) + tuple(v.shape[1:]))
            vv[: v.shape[0]] = np.asarray(v)
            v = jnp.asarray(vv, dtype)
        self.params["ib_value"] = v
        if stencil is None:
            return
        ib_cells, fluid_idx, fluid_w, wall_w = stencil
        ib_np = np.asarray(ib_cells, dtype=np.int32)
        fi_np = np.asarray(fluid_idx, dtype=np.int32)
        fw_np = np.asarray(fluid_w, dtype=np.float64)
        self.params["ibs_cells"] = jnp.asarray(ib_np)
        self.params["ibs_fluid"] = jnp.asarray(fi_np)
        self.params["ibs_fw"] = jnp.asarray(fw_np, dtype)
        self.params["ibs_ww"] = jnp.asarray(wall_w, dtype)
        if not implicit:
            self._ib_ext = None
            return
        # widened static structure: k appended ELL slots carrying the
        # stencil's fluid-cell couplings on IB rows
        from ..ops.dia import DIAInfo

        cols_np, mask_np = mesh.host_cf()
        K = cols_np.shape[1]
        k = fi_np.shape[1]
        cols_ext = np.concatenate(
            [cols_np, np.tile(np.arange(nc, dtype=cols_np.dtype)[:, None],
                              (1, k))], axis=1
        )
        mask_ext = np.concatenate(
            [np.asarray(mask_np), np.zeros((nc, k), dtype=bool)], axis=1
        )
        cols_ext[ib_np, K:] = fi_np
        mask_ext[ib_np, K:] = fw_np > 0
        dia_ext = DIAInfo.build(cols_ext, mask_ext)
        # device tables are slot-leading (K+k, n)
        self._ib_ext = (
            jnp.asarray(np.ascontiguousarray(cols_ext.T)),
            jnp.asarray(np.ascontiguousarray(mask_ext.T)),
            dia_ext,
        )
        # AMG hierarchies for the widened pattern (added ALONGSIDE any
        # existing entries: a flow model's pressure matrix keeps the
        # original pattern, and AMG._get_levels matches by pattern shape)
        from ..linear import AMG

        for key in ("linearSolver", "pressureLinearSolver",
                    "momentumLinearSolver"):
            s = self.options.get(key)
            for ss in (s, getattr(s, "preconditioner", None)):
                if isinstance(ss, AMG):
                    ss.setup_structure(cols_ext, mask_ext)

    def _set_ib_stencil_dist(self, stencil, dtype) -> None:
        """Per-shard IMPLICIT stencil tables (the reference's
        IBM_PARALLEL role: GenericIBDiscretization rows at any np).

        Each shard installs interpolation rows for the IB cells it OWNS;
        the stencil's fluid cells must be shard-resident (owned or halo)
        — with RCB partitions the k nearest fluid neighbors of an IB
        cell sit within the halo rings for the usual k ~ 2*dim.  Tables
        are padded to one static length with the dead dummy cell plus a
        validity mask (ib_stencil_rows_implicit masks those rows), so
        every shard traces the same shapes."""
        part = self.partition
        ib_g, fl_g, fw_g, ww_g = stencil
        ib_g = np.asarray(ib_g, np.int64)
        fl_g = np.asarray(fl_g, np.int64)
        fw_g = np.asarray(fw_g, np.float64)
        ww_g = np.asarray(ww_g, np.float64)
        S, ncl = part.n_shards, part.n_cells_local
        dummy = ncl - 1
        k = fl_g.shape[1]
        rows = []
        for d in range(S):
            own = np.zeros(part.mesh.n_cells, bool)
            own[part._own_int[d]] = True
            mine = own[ib_g]
            lb = part.g2l[d, ib_g[mine]]
            lf = part.g2l[d][fl_g[mine]]
            if (lf < 0).any():
                bad = int(mine.sum() - (lf >= 0).all(axis=1).sum())
                raise ConfigError(
                    f"distributed IBM stencil: shard {d} owns {bad} IB "
                    "cells whose fluid stencil cells are outside its halo"
                    " — use Partition(halo_depth=2) or fewer k_fluid")
            rows.append((lb, lf, fw_g[mine], ww_g[mine]))
        n_max = max(1, max(len(rw[0]) for rw in rows))
        cells = np.full((S, n_max), dummy, np.int64)
        fluid = np.full((S, n_max, k), dummy, np.int64)
        fw = np.zeros((S, n_max, k))
        ww = np.zeros((S, n_max))
        valid = np.zeros((S, n_max), bool)
        for d, (c, f, w, w0) in enumerate(rows):
            m = len(c)
            cells[d, :m] = c
            fluid[d, :m] = f
            fw[d, :m] = w
            ww[d, :m] = w0
            valid[d, :m] = True
        # widened static ELL structure per shard (stacked — shard_map
        # closures are not sharded, so the structure flows through params)
        cols_np = np.asarray(self.mesh.cf_nbr)  # (S, K, ncl) slot-leading
        mask_np = np.asarray(self.mesh.cf_mask)
        K = cols_np.shape[1]
        self_ix = np.tile(
            np.arange(ncl, dtype=cols_np.dtype)[None, None, :], (S, k, 1)
        )
        cols_ext = np.concatenate([cols_np, self_ix], axis=1)
        mask_ext = np.concatenate(
            [mask_np, np.zeros((S, k, ncl), bool)], axis=1
        )
        for d in range(S):
            vd = valid[d]
            cols_ext[d, K:, cells[d, vd]] = fluid[d, vd]
            mask_ext[d, K:, cells[d, vd]] = fw[d, vd] > 0
        self.params["ibs_cells"] = jnp.asarray(cells, jnp.int32)
        self.params["ibs_fluid"] = jnp.asarray(fluid, jnp.int32)
        self.params["ibs_fw"] = jnp.asarray(fw, dtype)
        self.params["ibs_ww"] = jnp.asarray(ww, dtype)
        self.params["ibs_valid"] = jnp.asarray(valid)
        self.params["ibs_cols_ext"] = jnp.asarray(cols_ext, jnp.int32)
        self.params["ibs_mask_ext"] = jnp.asarray(mask_ext)
        self._ib_ext = "params"

    def _apply_ib(self, mesh, params, A, r, phi):
        """Apply immersed-boundary rows (stencil band + solid pinning)."""
        from ..ops import assembly

        if "ibs_cells" in params:
            ib = params["ibs_cells"]
            w_f = params["ibs_fw"]
            w_w = params["ibs_ww"]
            val = params["ib_value"]
            if getattr(self, "_ib_ext", None) == "params":
                A, r = assembly.ib_stencil_rows_implicit(
                    A, r, ib, params["ibs_fluid"], w_f, w_w, val, phi,
                    params["ibs_cols_ext"], params["ibs_mask_ext"], None,
                    valid=params["ibs_valid"],
                )
            elif getattr(self, "_ib_ext", None) is not None:
                A, r = assembly.ib_stencil_rows_implicit(
                    A, r, ib, params["ibs_fluid"], w_f, w_w, val, phi,
                    *self._ib_ext,
                )
            else:
                # lagged pinned rows (explicit in the outer iteration)
                if phi.ndim == 1:
                    num = w_w * val[ib] + jnp.sum(
                        w_f * phi[params["ibs_fluid"]], axis=1
                    )
                    vals = num / (w_w + jnp.sum(w_f, axis=1))
                    full_vals = jnp.zeros(mesh.n_cells, phi.dtype).at[ib].set(
                        vals
                    )
                else:
                    num = w_w[:, None] * val[ib] + jnp.einsum(
                        "ik,ikm->im", w_f, phi[params["ibs_fluid"]]
                    )
                    vals = num / (w_w + jnp.sum(w_f, axis=1))[:, None]
                    full_vals = jnp.zeros(phi.shape, phi.dtype).at[ib].set(
                        vals
                    )
                band = jnp.zeros(mesh.n_cells, bool).at[ib].set(True)
                A, r = assembly.dirichlet_cells(A, r, band, full_vals, phi)
        if "ib_mask" in params:
            A, r = assembly.dirichlet_cells(
                A, r, params["ib_mask"], params["ib_value"], phi
            )
        return A, r

    # --- sensitivity plumbing (reference: atypes/tangent_double — every
    # model is instantiated with the Tangent atype, models.cpp:10-74;
    # here the tangent inputs are pytrees fed to jax.jvp) ---------------

    def _pad_cell_tangent(self, ref, v):
        """Resolve a user tangent (scalar, (n_interior,), or full-shape
        array) to ``ref``'s shape, ghost-extending interior arrays."""
        from ..core import bcs as bck

        if self._dist:
            v_ = np.asarray(v)
            if v_.shape == tuple(ref.shape):
                return jnp.asarray(v_, ref.dtype)
            if v_.ndim == 0:
                return jnp.full(ref.shape, float(v_), ref.dtype)
            return self._scatter_host_cells(v_, ref.dtype, extend_ghosts=True)
        v = jnp.asarray(v, ref.dtype)
        if v.shape == ref.shape:
            return v
        if v.ndim == 0:
            return jnp.full(ref.shape, v, ref.dtype)
        out = jnp.zeros(ref.shape, ref.dtype).at[: v.shape[0]].set(v)
        return bck.extend_to_ghosts(self.mesh, out)

    def _map_param_tangents(self, t: dict) -> dict:
        """Hook: translate derived/VC-level tangent keys (e.g. Young's
        modulus) into tangents of ``self.params`` entries.  Default:
        identity."""
        return t

    def _tangent_inputs(self, param_tangents, bc_tangents, bcvals):
        """Build ((p_base, b_base), (p_tan, b_tan)) sub-dicts holding ONLY
        the perturbed entries; jvp runs over these with the rest of
        params/bcvals closed over (avoids float0 tangents for the int/bool
        leaves)."""
        t = self._map_param_tangents(dict(param_tangents or {}))
        p_base, p_tan = {}, {}
        for k, v in t.items():
            if k not in self.params:
                raise ConfigError(
                    f"{self.name}.solve_tangent: unknown parameter {k!r} "
                    f"(have {sorted(self.params)})"
                )
            p_base[k] = self.params[k]
            p_tan[k] = self._pad_cell_tangent(self.params[k], v)
        b_base, b_tan = {}, {}
        for k, v in (bc_tangents or {}).items():
            if k not in bcvals:
                raise ConfigError(
                    f"{self.name}.solve_tangent: unknown BC entry {k!r}"
                )
            ref = bcvals[k]
            b_base[k] = ref
            b_tan[k] = jnp.broadcast_to(jnp.asarray(v, ref.dtype), ref.shape)
        return (p_base, b_base), (p_tan, b_tan)

    def _wrap_step(self, step):
        """jit (and shard_map when distributed) a
        step(mesh, params, state, bcvals) -> (state, aux) function."""
        if not self._dist:
            return jax.jit(step)
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map as _shard_map

            def smap(f, **kw):
                return _shard_map(f, **kw)
        except ImportError:
            from jax.experimental.shard_map import shard_map as _shard_map

            def smap(f, **kw):
                return _shard_map(f, **kw)

        axis = self.mesh.axis_name
        jmesh = self.partition.jax_mesh

        def local(mesh, params, state, bcvals):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)
            new_state, aux = step(sq(mesh), sq(params), sq(state), sq(bcvals))
            return jax.tree.map(lambda a: a[None], new_state), aux

        kw = {}
        if len(jmesh.axis_names) > 1:
            # hybrid manual/auto: manual over the spatial partition axis,
            # the remaining (ordinate) axes stay auto for GSPMD
            kw["axis_names"] = frozenset({axis})
        mapped = smap(
            local,
            mesh=jmesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P()),
            check_vma=False,
            **kw,
        )
        return jax.jit(mapped)

    # --- chunked outer loop ----------------------------------------------
    #
    # Runs up to ``chunk`` outer (linearize/solve/update) iterations per
    # device dispatch inside a lax.while_loop, with the convergence check
    # device-resident; the host reads back one residual-history block per
    # chunk instead of one scalar per outer iteration.  On the axon TPU
    # tunnel each dispatch + blocking readback costs ~1-3 ms, which
    # dominates small problems (the reference's advance loops, e.g.
    # ThermalModel_impl.h:424-454, pay no per-iteration host sync).

    def _build_chunk_step(self, step, chunk: int):
        def chunk_step(mesh, params, state, bcvals, scal):
            nmax, atol, rtol = scal["nmax"], scal["atol"], scal["rtol"]
            # peel iteration 0: establishes the residual dtype, the
            # initial norm (when not yet set), and the carried aux pytree
            st, aux0 = step(mesh, params, state, bcvals)
            rn0 = aux0["rnorm"]
            n0 = jnp.where(
                scal["norm0"] > 0, scal["norm0"].astype(rn0.dtype), rn0
            )
            tiny = jnp.asarray(jnp.finfo(rn0.dtype).tiny, rn0.dtype)
            hist = jnp.full((chunk,), jnp.nan, rn0.dtype).at[0].set(rn0)

            def converged(rn):
                return (rn < atol) | (rn / jnp.maximum(n0, tiny) < rtol)

            def cond(c):
                i, st, aux, hist, done = c
                return (i < nmax) & jnp.logical_not(done)

            def body(c):
                i, st, aux, hist, done = c
                st, aux = step(mesh, params, st, bcvals)
                rn = aux["rnorm"]
                hist = hist.at[i].set(rn)
                return (i + 1, st, aux, hist, converged(rn))

            i, st, aux, hist, done = jax.lax.while_loop(
                cond,
                body,
                (jnp.int32(1), st, aux0, hist, converged(rn0)),
            )
            return st, {
                "last_aux": aux,
                "hist": hist,
                "count": i,
                "norm0": n0,
                "done": done,
            }

        return chunk_step

    def _wrap_chunk_step(self, cstep):
        """jit (and shard_map when distributed) a chunked step — like
        _wrap_step but with a fifth, replicated scalar-dict argument."""
        if not self._dist:
            return jax.jit(cstep)
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map as _shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map as _shard_map

        axis = self.mesh.axis_name
        jmesh = self.partition.jax_mesh

        def local(mesh, params, state, bcvals, scal):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)
            new_state, aux = cstep(
                sq(mesh), sq(params), sq(state), sq(bcvals), scal
            )
            return jax.tree.map(lambda a: a[None], new_state), aux

        kw = {}
        if len(jmesh.axis_names) > 1:
            kw["axis_names"] = frozenset({axis})
        mapped = _shard_map(
            local,
            mesh=jmesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=(P(axis), P()),
            check_vma=False,
            **kw,
        )
        return jax.jit(mapped)

    def _advance_chunked(self, niter: int, chunk: int, bcvals,
                         on_aux=None) -> "ResidualHistory":
        """Chunked advance driver: dispatches ceil(niter/chunk) device
        programs, reconstructing the SAME residual history / early-exit
        semantics as the per-iteration python loop.  ``on_aux`` receives
        the final iteration's full aux dict (e.g. electric's field E)."""
        import numpy as np

        opts = self.options
        runners = getattr(self, "_chunk_runners", None)
        if runners is None:
            runners = {}
            self._chunk_runners = runners
        runner = runners.get(chunk)
        if runner is None:
            runner = self._wrap_chunk_step(
                self._build_chunk_step(self._step_raw, chunk)
            )
            runners[chunk] = runner
        hist = ResidualHistory()
        it0 = 0
        while it0 < niter:
            scal = {
                "nmax": np.int32(min(chunk, niter - it0)),
                "atol": np.float64(opts["absoluteTolerance"]),
                "rtol": np.float64(opts["relativeTolerance"]),
                "norm0": np.float64(self._initial_norm or 0.0),
            }
            with self._phase("step"):
                self.state, aux = runner(
                    self.mesh, self.params, self.state, bcvals, scal
                )
            cnt = int(aux["count"])
            rns = np.asarray(aux["hist"][:cnt])
            if self._initial_norm is None or self._initial_norm == 0.0:
                self._initial_norm = float(aux["norm0"])
            if on_aux is not None:
                on_aux(aux["last_aux"])
            for j, rn in enumerate(rns):
                self._guard_residual(float(rn), it0 + j)
                hist.append((it0 + j, float(rn)))
                self._log_iteration(f"{self.name}: {it0 + j}: {rn:.6e}")
            it0 += cnt
            if bool(aux["done"]):
                break
        return hist

    def _chunk_size(self, niter: int) -> int:
        """The active outer-chunk size for an advance(niter) call
        (0 = use the classic per-iteration loop)."""
        chunk = int(self.options.get("outerChunk") or 0)
        if chunk > 1 and niter > 1 and getattr(self, "_step_raw", None):
            return chunk  # fixed size: one compile per option value
        return 0

    # --- subclass hooks ---------------------------------------------------

    def _make_options(self) -> ModelOptions:
        return ModelOptions()

    def _make_bc(self) -> BoundaryCondition:
        return BoundaryCondition()

    def init(self) -> None:
        raise NotImplementedError

    def advance(self, niter: int = 1):
        raise NotImplementedError

    # --- common helpers ---------------------------------------------------

    def _periodic_group_src(self, g):
        """Partner-owner cell per ghost of a Periodic group (host-built)."""
        import numpy as np
        import jax.numpy as jnp
        from ..exceptions import ConfigError

        mesh = self.mesh
        if mesh.periodic_ghost is None:
            raise ConfigError(
                f"group {g[1]!r}: bc_type 'Periodic' needs "
                "mesh.make_periodic() before build_device_mesh()"
            )
        if self._dist:
            return jnp.asarray(
                self.partition.periodic_group_src(g[1]), dtype=jnp.int32
            )
        lut = dict(
            zip(
                np.asarray(mesh.periodic_ghost).tolist(),
                np.asarray(mesh.periodic_src).tolist(),
            )
        )
        gc = mesh.ghost_cells_of_group(g)
        try:
            src = [lut[c] for c in range(gc.start, gc.stop)]
        except KeyError as e:
            raise ConfigError(
                f"group {g[1]!r}: not all faces are periodic-paired"
            ) from e
        return jnp.asarray(src, dtype=jnp.int32)

    def _guard_residual(self, rnorm, it) -> None:
        """trapNonfinite option: raise SolverError when an outer residual
        goes NaN/Inf (opt-in FPE trap; reference: the SWIG-layer SIGFPE
        handler raising CException, baseExt.i:25-30)."""
        if self.options.get("trapNonfinite") and not np.isfinite(rnorm):
            from ..exceptions import SolverError

            raise SolverError(
                f"{self.name}: non-finite residual {rnorm!r} at outer "
                f"iteration {it} (trapNonfinite)"
            )

    def _log_iteration(self, msg: str) -> None:
        """Per-iteration residual line: printed when verbose, else routed
        to the 'model' rlog channel (reference: rlog info channel +
        printNormalizedResiduals)."""
        from ..core import rlog

        if self.options.get("verbose"):
            print(msg)
        else:
            rlog.model(msg)

    def _phase(self, name: str, result=None):
        """Phase tracing context for advance loops; active when the model
        options set profile=True (reference: per-solver timing dumps)."""
        from ..core import rlog

        if self.options.get("profile"):
            return rlog.tracer.phase(f"{self.name}/{name}", result)
        import contextlib

        return contextlib.nullcontext()

    def _group_bcs(self):
        """Yield (group_tuple, bc) for each boundary group.

        Double-shell interface groups are skipped: their ghost rows carry
        the flux-balance / jump equations (core.interfaces), not BCs."""
        for g in self.mesh.boundary_groups():
            if g[2] == "interface":
                continue
            bc = self.bc[g[1]]
            if bc.bc_type is None:
                raise ConfigError(
                    f"{self.name}: boundary group {g[1]!r} has no bc_type set"
                )
            yield g, bc

    def updateTime(self):
        """Shift time levels (reference: <Model>_impl updateTime)."""
        raise NotImplementedError(f"{self.name} is not transient")

    # alias
    def update_time(self):
        self.updateTime()

    # --- persistence (reference: Model.h:23-26) ---------------------------

    def getPersistenceData(self) -> dict:
        return {k: np.asarray(v) for k, v in self.state.items()}

    def restart(self, data: dict) -> None:
        for k, v in data.items():
            if k in self.state:
                self.state[k] = jnp.asarray(v, self.state[k].dtype)


class ResidualHistory(list):
    """Convergence history; printable like the reference's per-iteration
    '<n>: <residual>' lines (ThermalModel_impl.h:443)."""

    def converged(self, tol: float) -> bool:
        return len(self) > 0 and self[-1][1] <= tol
