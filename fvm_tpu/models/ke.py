"""KeModel: standard k-epsilon turbulence.

TPU-native counterpart of the reference's KeModel
(reference: KeModel.h:19, KeModel_impl.h with
SourceDiscretizationene.h / SourceDiscretizationdissi.h for the k / eps
source terms; wall functions in WallDiscretization.h are not yet ported).

Equations (standard high-Re k-eps, constants Cmu=0.09, C1=1.44, C2=1.92,
sigma_k=1.0, sigma_e=1.3):
    d(rho k)/dt + div(mdot k) = div((mu + mu_t/sigma_k) grad k) + P - rho eps
    d(rho e)/dt + div(mdot e) = div((mu + mu_t/sigma_e) grad e)
                                + (C1 P - C2 rho eps) eps/k
    mu_t = rho Cmu k^2/eps;  P = mu_t S^2,  S^2 = 2 Sij Sij

Destruction terms are linearized implicitly (diag += rho eps/k * V etc.)
for positivity, like the reference's source discretizations.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..core.options import BoundaryCondition, ModelOptions
from ..core import bcs as bck
from ..ops import assembly, discretizations as disc
from ..ops.halo import maybe_sync
from ..ops.gradients import ls_gradient_coefficients, gradient
from ..linear import AMG, BiCGStab, JacobiSolver
from ..exceptions import ConfigError
from .base import Model, ResidualHistory

CMU = 0.09
C1 = 1.44
C2 = 1.92
SIGMA_K = 1.0
SIGMA_E = 1.3


class KeBC(BoundaryCondition):
    _allowed_types = ("SpecifiedKE", "Wall", "Symmetry")
    _defaults = {
        "specifiedK": 1.0,
        "specifiedE": 1.0,
    }


class KeVC(BoundaryCondition):
    _defaults = {
        "density": 1.0,
        "viscosity": 1e-5,
        "initialK": 1.0,
        "initialE": 1.0,
    }


class KeModelOptions(ModelOptions):
    _defaults = {
        "transient": False,
        "timeStep": 0.1,
        "convectionScheme": "upwind",
        "nonOrthogonalCorrection": True,
        "relativeTolerance": 1e-7,
        "absoluteTolerance": 1e-16,
        "urf": 0.7,
        "verbose": True,
    }


class KeModel(Model):
    name = "KeModel"

    def __init__(self, mesh: DeviceMesh, flow_model=None, partition=None):
        super().__init__(mesh, partition)
        self.vc = KeVC()
        self.flow = flow_model

    def _make_options(self):
        return KeModelOptions()

    def _make_bc(self):
        return KeBC()

    def init(self) -> None:
        mesh = self.mesh
        self.state = {
            "k": self._cell_field(self.vc, "initialK"),
            "eps": self._cell_field(self.vc, "initialE"),
            "massFlux": self._full_faces(0.0),
            "velocity": self._full_cells(0.0, trailing=(mesh.dim,)),
        }
        if self.options["transient"]:
            self.state["k_N1"] = self.state["k"]
            self.state["eps_N1"] = self.state["eps"]
        self.params = {
            "rho": self._cell_field(self.vc, "density", extend_ghosts=True),
            "mu": self._cell_field(self.vc, "viscosity", extend_ghosts=True),
            "grad_coeff": (
                jax.vmap(ls_gradient_coefficients)(mesh)
                if self._dist
                else ls_gradient_coefficients(mesh)
            ),
        }
        solver = self.options.get("linearSolver")
        if solver is None:
            solver = BiCGStab(
                preconditioner=JacobiSolver(sweeps=3),
                relative_tolerance=1e-8,
                max_iterations=100,
            )
            self.options["linearSolver"] = solver
        if self._dist:
            self.state = self.partition.device_put(self.state)
            self.params = self.partition.device_put(self.params)
        self._step = self._wrap_step(self._build_step())
        self._initial_norm = None
        self._initialized = True

    def set_flow_state(self, velocity=None, mass_flux=None):
        """Pull velocity / massFlux from the flow model for production and
        convection terms."""
        if velocity is not None:
            self.state["velocity"] = jnp.asarray(velocity)
        if mass_flux is not None:
            self.state["massFlux"] = jnp.asarray(mass_flux)

    def getTurbulentViscosity(self) -> np.ndarray:
        k = self.state["k"]
        e = self.state["eps"]
        mu_t = self.params["rho"] * CMU * k * k / jnp.maximum(e, 1e-30)
        if self._dist:
            return self.partition.gather_cells(mu_t)
        return np.asarray(mu_t[: self.mesh.n_interior_cells])

    # ------------------------------------------------------------------

    def _production(self, mesh, params, state):
        """P = mu_t * 2 Sij Sij from the stored velocity field."""
        V = maybe_sync(mesh, state["velocity"])
        G = maybe_sync(mesh, gradient(mesh, params["grad_coeff"], V))
        S = 0.5 * (G + jnp.swapaxes(G, 1, 2))
        S2 = 2.0 * jnp.einsum("nij,nij->n", S, S)
        k = state["k"]
        e = jnp.maximum(state["eps"], 1e-30)
        mu_t = params["rho"] * CMU * k * k / e
        return mu_t * S2, mu_t

    def _linearize_scalar(self, mesh, params, state, bcvals, which, mu_t, P):
        opts = self.options
        phi = maybe_sync(mesh, state[which])
        rho = params["rho"]
        k = jnp.maximum(state["k"], 1e-30)
        e = jnp.maximum(state["eps"], 1e-30)
        sigma = SIGMA_K if which == "k" else SIGMA_E
        gamma = params["mu"] + bck.extend_to_ghosts(mesh, mu_t) / sigma
        gamma_f = disc.harmonic_face_gamma(mesh, gamma)
        gradp = maybe_sync(mesh, gradient(mesh, params["grad_coeff"], phi))
        flux = disc.diffusion_flux(mesh, phi, gamma_f, gradp)
        flux = flux + disc.convection_flux(
            mesh, phi, state["massFlux"], opts["convectionScheme"], gradp
        )
        V = mesh.cell_volume
        if which == "k":
            # r += (P - rho eps) V ; implicit destruction: diag += rho eps/k V
            r_cell = (P - rho * e) * V
            diag_cell = rho * e / k * V
        else:
            # r += (C1 P - C2 rho e) e/k V ; implicit: diag += C2 rho e/k V
            r_cell = (C1 * P - C2 * rho * e) * (e / k) * V
            diag_cell = 2.0 * C2 * rho * e / k * V - C1 * P * (1.0 / k) * V
            diag_cell = jnp.maximum(diag_cell, 0.0)
        if opts["transient"]:
            d2, r2 = disc.transient_term(
                mesh, phi, state[f"{which}_N1"], opts["timeStep"], rho
            )
            diag_cell = diag_cell + d2
            r_cell = r_cell + r2
        A, r = assembly.assemble(mesh, flux, r_cell=r_cell, diag_cell=diag_cell)
        key = "specifiedK" if which == "k" else "specifiedE"
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            valid = bcvals[f"{g[1]}:__valid"]
            scale = gamma_f[sl] * mesh.face_e_over_d[sl]
            if bc.bc_type == "SpecifiedKE":
                A, r = bck.dirichlet_rows(
                    mesh, A, r, gc, bcvals[f"{g[1]}:{key}"], phi, valid, scale
                )
            else:  # Wall / Symmetry: zero-gradient (wall functions pending)
                A, r = bck.extrapolation_rows(mesh, A, r, gc, phi, valid, scale)
        A, r = assembly.identity_unowned_rows(mesh, A, r)
        return A, r

    def _build_step(self):
        solver = self.options["linearSolver"]
        urf = float(self.options["urf"])

        def step(mesh, params, state, bcvals):
            P, mu_t = self._production(mesh, params, state)
            Ak, rk = self._linearize_scalar(mesh, params, state, bcvals, "k", mu_t, P)
            dk, _ = solver.solve_fn(Ak, rk, jnp.zeros_like(rk))
            knew = jnp.maximum(state["k"] + urf * dk, 1e-20)
            state = dict(state, k=knew)
            Ae, re = self._linearize_scalar(
                mesh, params, state, bcvals, "eps", mu_t, P
            )
            de, _ = solver.solve_fn(Ae, re, jnp.zeros_like(re))
            enew = jnp.maximum(state["eps"] + urf * de, 1e-20)
            state = dict(state, eps=enew)
            rnorm = jnp.sqrt(Ak.norm(rk) ** 2 + Ae.norm(re) ** 2)
            return state, {"rnorm": rnorm}

        return step

    def advance(self, niter: int = 1) -> ResidualHistory:
        if not self._initialized:
            raise ConfigError("call init() before advance()")
        opts = self.options
        hist = ResidualHistory()
        bcvals = self._resolve_bcvals()
        for it in range(niter):
            self.state, aux = self._step(self.mesh, self.params, self.state, bcvals)
            rnorm = float(aux["rnorm"])
            if self._initial_norm is None or self._initial_norm == 0.0:
                self._initial_norm = rnorm
            hist.append((it, rnorm))
            if opts["verbose"]:
                print(f"{self.name}: {it}: {rnorm:.6e}")
            if rnorm < opts["absoluteTolerance"]:
                break
            if rnorm / max(self._initial_norm, 1e-300) < opts["relativeTolerance"]:
                break
        return hist

    def updateTime(self):
        if not self.options["transient"]:
            raise ConfigError("KeModel: transient option is off")
        self.state["k_N1"] = self.state["k"]
        self.state["eps_N1"] = self.state["eps"]

    def getK(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["k"])
        return np.asarray(self.state["k"][: self.mesh.n_interior_cells])

    def getEpsilon(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["eps"])
        return np.asarray(self.state["eps"][: self.mesh.n_interior_cells])
