"""ThermalModel: heat conduction/convection on unstructured meshes.

TPU-native counterpart of the reference's ThermalModel
(reference: ThermalModel.h:19, ThermalModel_impl.h:84 ``init``, :236
``linearize``, :424 ``advance``, :400 ``getHeatFluxIntegral``; BC/VC dicts in
ThermalBC.h).  The equation set, BC types and outer-iteration structure match
the reference; the implementation is a single jit-compiled
linearize-assemble-solve step over the ELL/gather data layout, which runs
unchanged under shard_map on a partitioned mesh (halo exchange inserted via
the mesh's HaloSpec — the reference's Field::syncLocal equivalent).

BC types: 'SpecifiedTemperature', 'SpecifiedHeatFlux' (per-area, positive
into the domain), 'Symmetry', 'Convective' (heatTransferCoefficient +
farFieldTemperature), 'Radiative' (surfaceEmissivity + farFieldTemperature),
'Mixed' (convective + radiative).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..core.options import BoundaryCondition, ModelOptions
from ..core import bcs as bck
from ..core import interfaces as ifc
from ..ops import assembly, discretizations as disc
from ..ops.halo import maybe_sync
from ..ops.gradients import ls_gradient_coefficients, gradient
from ..linear import AMG, BiCGStab, CG, JacobiSolver
from ..exceptions import ConfigError
from .base import Model, ResidualHistory
from .sensitivity import TangentMixin

STEFAN_BOLTZMANN = 5.670374419e-8


class ThermalBC(BoundaryCondition):
    _allowed_types = (
        "SpecifiedTemperature",
        "SpecifiedHeatFlux",
        "Symmetry",
        # convective outflow: ghost extrapolated (zero diffusive flux)
        # but the convective face flux STAYS — unlike Symmetry, which
        # zeroes the whole face flux and hence traps energy at a
        # flow-through boundary (reference: GenericBCS
        # applyZeroGradientBC role)
        "ZeroGradient",
        "Convective",
        "Radiative",
        "Mixed",
        "Periodic",
    )
    _defaults = {
        "specifiedTemperature": 300.0,
        "specifiedHeatFlux": 0.0,
        "heatTransferCoefficient": 0.0,
        "farFieldTemperature": 300.0,
        "surfaceEmissivity": 1.0,
    }


class ThermalVC(BoundaryCondition):
    """Volume conditions (reference: ThermalVC in ThermalBC.h)."""

    _defaults = {
        "thermalConductivity": 1.0,
        "density": 1.0,
        "specificHeat": 1.0,
        "initialTemperature": 300.0,
        "heatSource": 0.0,
    }


class ThermalModelOptions(ModelOptions):
    _defaults = {
        "transient": False,
        "timeStep": 0.1,
        "timeDiscretizationOrder": 1,
        "convective": False,  # enable convection using state['massFlux']
        "convectionScheme": "upwind",
        "nonOrthogonalCorrection": True,
        "relativeTolerance": 1e-8,
        "absoluteTolerance": 1e-16,
        "urf": 1.0,
        "verbose": True,
        # use implicit-differentiation solves so jax.jvp/vjp through a step
        # gives exact sensitivities (Tangent-atype replacement)
        "differentiable": False,
    }


class ThermalModel(TangentMixin, Model):
    # double-shell interfaces (contact resistance / thermal jump layers,
    # reference: BatteryLinearizeThermalInterface.h): default closure is
    # the continuous interface (A=1, B=0); model.interface[name] sets
    # jump coefficients or a flux closure (core.interfaces)
    _supports_interfaces = True
    name = "ThermalModel"
    # sensitivity/UQ unknown binding (TangentMixin): solve_tangent /
    # solve_mc / solve_pc differentiate T w.r.t. entries of self.params
    # ("k_cell", "rho_cp", "src") — the reference builds ThermalModel
    # with the Tangent atype (models.cpp:10-74)
    var = "T"

    def __init__(self, mesh: DeviceMesh, partition=None):
        super().__init__(mesh, partition)
        self.vc = ThermalVC()

    def _make_options(self):
        return ThermalModelOptions()

    def _make_bc(self):
        return ThermalBC()

    # ------------------------------------------------------------------

    def init(self) -> None:
        mesh = self.mesh
        self.state = {
            "T": self._cell_field(self.vc, "initialTemperature"),
            "massFlux": self._full_faces(0.0),
        }
        if self.options["transient"]:
            self.state["T_N1"] = self.state["T"]
            if self.options["timeDiscretizationOrder"] > 1:
                self.state["T_N2"] = self.state["T"]

        self.params = {
            "k_cell": self._cell_field(self.vc, "thermalConductivity", extend_ghosts=True),
            "rho_cp": self._cell_field(self.vc, "density")
            * self._cell_field(self.vc, "specificHeat"),
            "src": self._cell_field(self.vc, "heatSource"),
        }
        for g, bc in self._group_bcs():
            if bc.bc_type == "Periodic":
                self.params[f"periodic_src:{g[1]}"] = self._periodic_group_src(g)
        needs_grad = self.options["nonOrthogonalCorrection"] and not (
            mesh.orthogonal and self.options["convectionScheme"] != "sou"
        )
        if needs_grad:
            if self._dist:
                self.params["grad_coeff"] = jax.vmap(ls_gradient_coefficients)(mesh)
            else:
                self.params["grad_coeff"] = ls_gradient_coefficients(mesh)

        solver = self.options.get("linearSolver")
        if solver is None:
            if self._dist:
                # ghost BC rows (flux/extrapolation) are nonsymmetric and
                # dist matrices are not boundary-condensed: CG can
                # silently diverge on them, BiCGStab is robust
                solver = BiCGStab(
                    preconditioner=JacobiSolver(sweeps=3),
                    relative_tolerance=1e-10,
                    max_iterations=500,
                )
            else:
                solver = BiCGStab(
                    preconditioner=AMG(), relative_tolerance=1e-10, max_iterations=50
                )
            self.options["linearSolver"] = solver
        pre = getattr(solver, "preconditioner", None)
        for s in (solver, pre):
            if isinstance(s, AMG):
                if self._dist:
                    ok = s.setup_structure_dist(
                        np.asarray(mesh.cf_nbr).transpose(0, 2, 1),
                        np.asarray(mesh.cf_mask).transpose(0, 2, 1),
                        mesh.n_owned_cells,
                    )
                    if not ok:
                        raise ConfigError(
                            "ThermalModel: distributed AMG needs all "
                            "shards to share the condensed grid structure"
                            " (regular partitions of structured meshes); "
                            "use CG/BiCGStab with a Jacobi preconditioner"
                            " on this partition"
                        )
                else:
                    s.setup_structure(*mesh.host_cf())

        if self._dist:
            self.state = self.partition.device_put(self.state)
            self.params = self.partition.device_put(self.params)

        self._step_raw = self._build_step()
        self._step = self._wrap_step(self._step_raw)
        self._initial_norm = None
        self._initialized = True

    # ------------------------------------------------------------------

    def _linearize(self, mesh, params, state, bcvals):
        """Build (A, r) for the current state.  jit-traced; SPMD-safe."""
        opts = self.options
        T = maybe_sync(mesh, state["T"])

        gamma_f = disc.harmonic_face_gamma(mesh, params["k_cell"])
        gradT = None
        if "grad_coeff" in params:
            gradT = maybe_sync(mesh, gradient(mesh, params["grad_coeff"], T))
        flux = disc.diffusion_flux(mesh, T, gamma_f, gradT)
        if opts["convective"]:
            flux = flux + disc.convection_flux(
                mesh, T, state["massFlux"], opts["convectionScheme"], gradT
            )

        # phase 1: flux patches on boundary groups
        for g, bc in self._group_bcs():
            sl = mesh.group_faces(g)
            t = bc.bc_type
            if t == "SpecifiedHeatFlux":
                q = bcvals[f"{g[1]}:specifiedHeatFlux"]
                flux = bck.set_flux_fixed(flux, sl, -q * mesh.face_area_mag[sl])
            elif t == "Symmetry":
                flux = bck.set_flux_fixed(flux, sl, 0.0)
            # SpecifiedTemperature / Convective / Radiative / Mixed keep the
            # diffusive face flux (it references the ghost value)

        # cell terms
        diag_cell, r_cell = disc.source_term(mesh, params["src"])
        if opts["transient"]:
            d2, r2 = disc.transient_term(
                mesh,
                T,
                state["T_N1"],
                opts["timeStep"],
                params["rho_cp"],
                state.get("T_N2"),
            )
            diag_cell = diag_cell + d2
            r_cell = r_cell + r2

        A, r = assembly.assemble(mesh, flux, r_cell=r_cell, diag_cell=diag_cell)

        # phase 2: ghost-row patches
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            valid = bcvals[f"{g[1]}:__valid"]
            t = bc.bc_type
            scale = gamma_f[sl] * mesh.face_e_over_d[sl]
            if t == "SpecifiedTemperature":
                A, r = bck.dirichlet_rows(
                    mesh, A, r, gc, bcvals[f"{g[1]}:specifiedTemperature"], T,
                    valid, scale,
                )
            elif t in ("SpecifiedHeatFlux", "Symmetry", "ZeroGradient"):
                A, r = bck.extrapolation_rows(mesh, A, r, gc, T, valid, scale)
            elif t == "Periodic":
                # implicit wrap (geometry already wraps via the
                # repositioned ghost; the partner coupling is in slot 1)
                psrc = params[f"periodic_src:{g[1]}"]
                A, r = bck.periodic_rows(
                    mesh, A, r, gc, T, psrc, valid, scale
                )
            elif t in ("Convective", "Radiative", "Mixed"):
                amag = mesh.face_area_mag[sl]
                coeff = jnp.zeros_like(amag)
                sink = jnp.zeros_like(amag)
                Tg = T[gc]
                if t in ("Convective", "Mixed"):
                    h = bcvals[f"{g[1]}:heatTransferCoefficient"]
                    Tinf = bcvals[f"{g[1]}:farFieldTemperature"]
                    coeff = coeff + h * amag
                    sink = sink + h * amag * (Tinf - Tg)
                if t in ("Radiative", "Mixed"):
                    eps = bcvals[f"{g[1]}:surfaceEmissivity"]
                    Tinf = bcvals[f"{g[1]}:farFieldTemperature"]
                    coeff = coeff + 4.0 * STEFAN_BOLTZMANN * eps * amag * Tg**3
                    sink = sink + STEFAN_BOLTZMANN * eps * amag * (Tinf**4 - Tg**4)
                A, r = bck.robin_sink_rows(mesh, A, r, gc, coeff, sink)
            else:
                raise ConfigError(f"ThermalModel: unhandled bc_type {t!r}")

        # immersed-boundary rows (implicit stencil band + solid pinning)
        A, r = self._apply_ib(mesh, params, A, r, T)

        # halo rows are owned remotely: identity here
        A, r = ifc.apply_model_interfaces(
            mesh, self.interface, A, r, T, flux, gamma_f
        )
        A, r = assembly.identity_unowned_rows(mesh, A, r)
        return A, r

    def _build_step(self):
        solver = self.options["linearSolver"]
        urf = float(self.options["urf"])

        differentiable = bool(self.options.get("differentiable", False))

        def step(mesh, params, state, bcvals):
            A, r = self._linearize(mesh, params, state, bcvals)
            rnorm = A.norm(r)
            if differentiable:
                dx, stats = solver.solve_fn_implicit(A, r, jnp.zeros_like(r))
            else:
                dx, stats = solver.solve_fn(A, r, jnp.zeros_like(r))
            state = dict(state)
            state["T"] = state["T"] + urf * dx
            return state, {"rnorm": rnorm}

        return step

    # ------------------------------------------------------------------

    def advance(self, niter: int = 1) -> ResidualHistory:
        """Outer (nonlinear) iterations; returns [(iter, rnorm), ...].

        Mirrors ThermalModel_impl.h:424-454: linearize, solve, update,
        check rNorm against absolute/relative tolerances.
        """
        if not self._initialized:
            raise ConfigError("call init() before advance()")
        opts = self.options
        hist = ResidualHistory()
        bcvals = self._resolve_bcvals()
        # residualSync=False: residuals stay device scalars (no per-step
        # host round trip); convergence checks are skipped
        sync = bool(opts.get("residualSync", True)) or bool(opts["verbose"])
        chunk = self._chunk_size(niter)
        if chunk:
            return self._advance_chunked(niter, chunk, bcvals)
        for it in range(niter):
            with self._phase("step"):
                self.state, aux = self._step(
                    self.mesh, self.params, self.state, bcvals
                )
            if not sync:
                hist.append((it, aux["rnorm"]))
                continue
            rnorm = float(aux["rnorm"])
            self._guard_residual(rnorm, it)
            if self._initial_norm is None or self._initial_norm == 0.0:
                self._initial_norm = rnorm
            hist.append((it, rnorm))
            self._log_iteration(f"{self.name}: {it}: {rnorm:.6e}")
            if rnorm < opts["absoluteTolerance"]:
                break
            if rnorm / max(self._initial_norm, 1e-300) < opts["relativeTolerance"]:
                break
        return hist

    def updateTime(self):
        if not self.options["transient"]:
            raise ConfigError("ThermalModel: transient option is off")
        if "T_N2" in self.state:
            self.state["T_N2"] = self.state["T_N1"]
        self.state["T_N1"] = self.state["T"]

    # ------------------------------------------------------------------

    def set_immersed_boundary(self, mask, value, stencil=None,
                              implicit=True) -> None:
        """Pin masked cells (IBManager.dirichlet_mask()) to a temperature.

        With ``stencil`` (IBManager.interpolation_stencil()), pass
        mask=dirichlet_mask(include_ib=False): solid cells pin to the body
        value while IB-band cells carry the interpolation of wall value
        and surrounding fluid cells — IMPLICITLY in the matrix through
        appended ELL slots by default (reference:
        GenericIBDiscretization.h stencil rows), or lagged per outer
        iteration with implicit=False.  Distributed models support the
        mask/value (pinned) path."""
        self._set_immersed_boundary(mask, value, stencil, implicit)

    def getHeatFluxIntegral(self, group_name) -> float:
        """Net heat flow INTO the domain through a boundary group.

        (reference: ThermalModel_impl.h:400 getHeatFluxIntegral)
        """
        mesh = self.mesh
        g = mesh.group_by_name(group_name) if isinstance(group_name, str) else group_name
        sl = mesh.group_faces(g)
        bc = self.bc[g[1]]
        T = self.state["T"]
        if bc.bc_type == "SpecifiedHeatFlux":
            q = self._group_bc_values(g, bc, "specifiedHeatFlux")
            amag = mesh.face_area_mag[..., sl]
            if self._dist:
                mask = self.partition.group_valid_mask(g[1])
                return float(jnp.sum(jnp.where(mask, q * amag, 0)))
            return float(jnp.sum(q * amag))
        if bc.bc_type == "Symmetry":
            return 0.0

        def face_flux(m, T, k, grad_coeff=None):
            gamma_f = disc.harmonic_face_gamma(m, k)
            gradT = (
                gradient(m, grad_coeff, T) if grad_coeff is not None else None
            )
            return disc.diffusion_flux(m, T, gamma_f, gradT).F

        args = (T, self.params["k_cell"])
        if "grad_coeff" in self.params:
            args = args + (self.params["grad_coeff"],)
        F = self._map_mesh(face_flux, *args)
        return float(-self._sum_group(g, F))

    def getTemperature(self) -> np.ndarray:
        """Interior-cell temperatures in GLOBAL numbering (gathers shards)."""
        if self._dist:
            return self.partition.gather_cells(self.state["T"])
        return np.asarray(self.state["T"][: self.mesh.n_interior_cells])
