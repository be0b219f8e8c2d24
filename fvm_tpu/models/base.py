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

        mapped = smap(
            local,
            mesh=jmesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P()),
            check_vma=False,
        )
        return jax.jit(mapped)

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
