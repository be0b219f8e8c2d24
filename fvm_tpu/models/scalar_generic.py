"""Generic scalar transport model base.

Factors the diffusion/convection/source/transient + BC pattern shared by
several of the reference's scalar models (VacancyModel_impl.h,
FractureModel_impl.h, and the thermal/species structure) into one
parameterized implementation.  Subclasses set the field/BC vocabulary and
may override source hooks.
"""

from __future__ import annotations

import functools

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
from .sensitivity import PCExpansion, TangentMixin


class GenericScalarModel(TangentMixin, Model):
    """Scalar transport: d(rho phi)/dt + div(mdot phi) = div(D grad phi) + S.

    Subclass knobs:
      var            state key for the unknown
      diffusivity_vc VC key for D
      initial_vc     VC key for the initial value
      bc_dirichlet   BC key holding the Dirichlet value
      bc_flux        BC key holding the specified boundary flux (per area)
    """

    var = "phi"
    _supports_interfaces = True
    diffusivity_vc = "diffusivity"
    initial_vc = "initialValue"
    bc_dirichlet = "specifiedValue"
    bc_flux = "specifiedFlux"

    def init(self) -> None:
        mesh = self.mesh
        x0 = self._cell_field(self.vc, self.initial_vc, extend_ghosts=True)
        self.state = {self.var: x0, "massFlux": self._full_faces(0.0)}
        if self.options["transient"]:
            self.state[f"{self.var}_N1"] = x0
            if self.options.get("timeDiscretizationOrder", 1) > 1:
                self.state[f"{self.var}_N2"] = x0
        self.params = {
            "D": self._cell_field(self.vc, self.diffusivity_vc, extend_ghosts=True),
        }
        self._extra_params()
        for g, bc in self._group_bcs():
            if bc.bc_type == "Periodic":
                self.params[f"periodic_src:{g[1]}"] = self._periodic_group_src(g)
        if self.options.get("nonOrthogonalCorrection", True):
            self.params["grad_coeff"] = (
                jax.vmap(ls_gradient_coefficients)(mesh)
                if self._dist
                else ls_gradient_coefficients(mesh)
            )
        solver = self.options.get("linearSolver")
        if solver is None:
            if self._dist:
                # ghost BC rows (flux/extrapolation) and interface
                # closures are nonsymmetric, and dist matrices are not
                # boundary-condensed: CG silently diverges on them,
                # BiCGStab is robust
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
            if isinstance(s, AMG) and not self._dist:
                s.setup_structure(*mesh.host_cf())
        if self._dist:
            self.state = self.partition.device_put(self.state)
            self.params = self.partition.device_put(self.params)
        self._step_raw = self._build_step()
        self._step = self._wrap_step(self._step_raw)
        self._initial_norm = None
        self._initialized = True

    # hooks ---------------------------------------------------------------

    def _extra_params(self):
        pass

    def _source_terms(self, mesh, params, state, phi):
        """Return (diag_cell, r_cell) source contributions."""
        z = jnp.zeros(mesh.n_cells, phi.dtype)
        return z, z

    # ---------------------------------------------------------------------

    def _linearize(self, mesh, params, state, bcvals):
        opts = self.options
        phi = maybe_sync(mesh, state[self.var])
        D_f = disc.harmonic_face_gamma(mesh, params["D"])
        gradp = None
        if "grad_coeff" in params:
            gradp = maybe_sync(mesh, gradient(mesh, params["grad_coeff"], phi))
        flux = disc.diffusion_flux(mesh, phi, D_f, gradp)
        if opts.get("convective", False):
            flux = flux + disc.convection_flux(
                mesh, phi, state["massFlux"], opts.get("convectionScheme", "upwind"),
                gradp,
            )
        for g, bc in self._group_bcs():
            sl = mesh.group_faces(g)
            if bc.bc_type == "Symmetry":
                flux = bck.set_flux_fixed(flux, sl, 0.0)
            elif bc.bc_type == "SpecifiedFlux":
                q = bcvals[f"{g[1]}:{self.bc_flux}"]
                flux = bck.set_flux_fixed(flux, sl, -q * mesh.face_area_mag[sl])
        diag_cell, r_cell = self._source_terms(mesh, params, state, phi)
        if opts["transient"]:
            d2, r2 = disc.transient_term(
                mesh,
                phi,
                state[f"{self.var}_N1"],
                opts["timeStep"],
                1.0,
                state.get(f"{self.var}_N2"),
            )
            diag_cell = diag_cell + d2
            r_cell = r_cell + r2
        A, r = assembly.assemble(mesh, flux, r_cell=r_cell, diag_cell=diag_cell)
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            valid = bcvals[f"{g[1]}:__valid"]
            scale = D_f[sl] * mesh.face_e_over_d[sl]
            if bc.bc_type == "Dirichlet":
                A, r = bck.dirichlet_rows(
                    mesh, A, r, gc, bcvals[f"{g[1]}:{self.bc_dirichlet}"], phi,
                    valid, scale,
                )
            elif bc.bc_type == "Periodic":
                psrc = params[f"periodic_src:{g[1]}"]
                A, r = bck.periodic_rows(
                    mesh, A, r, gc, phi, psrc, valid, scale
                )
            else:
                A, r = bck.extrapolation_rows(mesh, A, r, gc, phi, valid, scale)
        A, r = ifc.apply_model_interfaces(
            mesh, self.interface, A, r, phi, flux, D_f
        )
        A, r = assembly.identity_unowned_rows(mesh, A, r)
        return A, r

    def _build_step(self):
        solver = self.options["linearSolver"]
        urf = float(self.options.get("urf", 1.0))

        def step(mesh, params, state, bcvals):
            A, r = self._linearize(mesh, params, state, bcvals)
            rnorm = A.norm(r)
            dx, _ = solver.solve_fn(A, r, jnp.zeros_like(r))
            state = dict(state)
            state[self.var] = state[self.var] + urf * dx
            return state, {"rnorm": rnorm}

        return step

    def advance(self, niter: int = 1) -> ResidualHistory:
        if not self._initialized:
            raise ConfigError("call init() before advance()")
        opts = self.options
        hist = ResidualHistory()
        bcvals = self._resolve_bcvals()
        chunk = self._chunk_size(niter)
        if chunk:
            return self._advance_chunked(niter, chunk, bcvals)
        for it in range(niter):
            with self._phase("step"):
                self.state, aux = self._step(
                    self.mesh, self.params, self.state, bcvals
                )
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
            raise ConfigError(f"{self.name}: transient option is off")
        if f"{self.var}_N2" in self.state:
            self.state[f"{self.var}_N2"] = self.state[f"{self.var}_N1"]
        self.state[f"{self.var}_N1"] = self.state[self.var]

    def get_field(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state[self.var])
        return np.asarray(self.state[self.var][: self.mesh.n_interior_cells])

    # --- sensitivities / UQ: solve_tangent / solve_mc / solve_pc are
    # inherited from TangentMixin (models/sensitivity.py)

    def getFluxIntegral(self, group_name) -> float:
        """Diffusive flux leaving the domain through a boundary group
        (reference: the per-model get<Var>FluxIntegral accessors)."""
        mesh = self.mesh
        g = (
            mesh.group_by_name(group_name)
            if isinstance(group_name, str)
            else group_name
        )

        def face_flux(m, phi, D, grad_coeff=None):
            D_f = disc.harmonic_face_gamma(m, D)
            gradp = (
                gradient(m, grad_coeff, phi) if grad_coeff is not None else None
            )
            return disc.diffusion_flux(m, phi, D_f, gradp).F

        args = (self.state[self.var], self.params["D"])
        if "grad_coeff" in self.params:
            args = args + (self.params["grad_coeff"],)
        F = self._map_mesh(face_flux, *args)
        return float(self._sum_group(g, F))
