"""KeModel: standard k-epsilon turbulence.

TPU-native counterpart of the reference's KeModel
(reference: KeModel.h:19, KeModel_impl.h with
SourceDiscretizationene.h / SourceDiscretizationdissi.h for the k / eps
source terms; wall functions follow WallDiscretization.h: zero-gradient
k, eps fixed at Cmu^0.75 k^1.5/(kappa y) in wall cells, log-law production,
and getWallViscosity() for the momentum wall shear).

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
KAPPA = 0.4187  # von Karman
E_WALL = 9.793  # log-law constant


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
        # wall-function data: wall-adjacent cells + distance to the wall
        # (reference: WallDiscretization.h)
        import numpy as np_

        wall_mask = np_.zeros(mesh.n_cells, dtype=bool)
        wall_dist = np_.full(mesh.n_cells, 1.0)
        for g, bc in self._group_bcs():
            if bc.bc_type == "Wall":
                sl = mesh.group_faces(g)
                own = np_.asarray(mesh.face_cell0)[sl]
                cc = np_.asarray(mesh.cell_centroid)[own]
                fc = np_.asarray(mesh.face_centroid)[sl]
                d = np_.linalg.norm(cc - fc, axis=1)
                wall_mask[own] = True
                wall_dist[own] = np_.minimum(wall_dist[own], np_.maximum(d, 1e-12))
        self.params["wall_mask"] = jnp.asarray(wall_mask)
        self.params["wall_dist"] = jnp.asarray(wall_dist)

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
        self._step_raw = self._build_step()
        self._step = self._wrap_step(self._step_raw)
        self._initial_norm = None
        self._initialized = True

    def set_flow_state(self, velocity=None, mass_flux=None):
        """Pull velocity / massFlux from the flow model for production and
        convection terms."""
        if velocity is not None:
            self.state["velocity"] = jnp.asarray(velocity)
        if mass_flux is not None:
            self.state["massFlux"] = jnp.asarray(mass_flux)

    def getWallViscosity(self, group_name) -> np.ndarray:
        """Effective wall viscosity per wall face for the momentum wall
        shear: mu_w = rho u_tau kappa y / ln(E y+)
        (reference WallDiscretization.h)."""
        mesh = self.mesh
        g = mesh.group_by_name(group_name) if isinstance(group_name, str) else group_name
        sl = mesh.group_faces(g)
        own = np.asarray(mesh.face_cell0)[sl]
        k = np.asarray(self.state["k"])[own]
        rho = np.asarray(self.params["rho"])[own]
        mu = np.asarray(self.params["mu"])[own]
        y = np.asarray(self.params["wall_dist"])[own]
        u_tau = CMU**0.25 * np.sqrt(np.maximum(k, 1e-30))
        yplus = np.maximum(rho * u_tau * y / mu, 11.0)
        return rho * u_tau * KAPPA * y / np.log(E_WALL * yplus)

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
        wall = params.get("wall_mask")
        yw = params.get("wall_dist")
        if which == "k":
            # r += (P - rho eps) V ; implicit destruction: diag += rho eps/k V
            # wall cells: production from the log-law shear
            # P_w = u_tau^3 / (kappa y), u_tau = Cmu^(1/4) sqrt(k)
            if wall is not None:
                u_tau = CMU**0.25 * jnp.sqrt(k)
                P_wall = rho * u_tau**3 / (KAPPA * yw)
                P = jnp.where(wall, P_wall, P)
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
        if which == "eps" and wall is not None:
            # wall cells: eps pinned to the equilibrium value
            # eps_w = Cmu^(3/4) k^(3/2) / (kappa y)
            eps_wall = CMU**0.75 * k**1.5 / (KAPPA * yw)
            A, r = assembly.dirichlet_cells(A, r, wall, eps_wall, phi)
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
            else:  # Wall / Symmetry: zero-gradient ghost (standard for k at walls)
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
            wall = params.get("wall_mask")
            if wall is not None:
                # wall cells: eps hard-fixed at the log-law equilibrium
                # value (under-relaxation must not dilute the pin)
                eps_wall = CMU**0.75 * knew**1.5 / (KAPPA * params["wall_dist"])
                enew = jnp.where(wall, eps_wall, enew)
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
        chunk = self._chunk_size(niter)
        if chunk:
            return self._advance_chunked(niter, chunk, bcvals)
        for it in range(niter):
            self.state, aux = self._step(self.mesh, self.params, self.state, bcvals)
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
