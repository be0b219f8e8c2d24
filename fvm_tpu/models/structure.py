"""StructureModel: linear-elastic solid mechanics (small strain).

TPU-native counterpart of the reference's StructureModel
(reference: StructureModel.h:19, StructureModel_impl.h — displacement-based
FVM elasticity with StructureSourceDiscretization.h providing the stress
divergence; creep/plasticity follows StructurePlasticDiscretization.h:102-160
+ StructureModel_impl.h:713 creepInit: explicit Norton power-law plastic
strain update from the deviatoric/von-Mises stress, with the plastic
traction 2 mu eps_p . A subtracted from the elastic face flux).

Formulation (segregated displacement, standard FVM solid mechanics):
    div sigma = b,   sigma = mu (grad w + grad w^T) + lambda tr(grad w) I
Face traction flux is split into an implicit two-point part with
coefficient (2 mu + lambda) e_over_d per displacement component and an
explicit deferred correction from the full face-interpolated stress tensor,
iterated to convergence in the outer loop (the reference structures its
linearization the same way: implicit diffusion + explicit
StructureSourceDiscretization cross terms).

BC types: 'SpecifiedDeformation' (Dirichlet vector),
'SpecifiedTraction' (traction vector per unit area), 'SpecifiedForce'
(total force over the group), 'Symmetry', 'ZeroTraction' (free surface).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..core.options import BoundaryCondition, ModelOptions
from ..core import bcs as bck
from ..ops import assembly, discretizations as disc
from ..ops.assembly import FaceFlux
from ..ops.bell import (
    assemble_block,
    dirichlet_rows_block,
    transform_rows_block,
)
from ..ops.halo import maybe_sync
from ..ops.gradients import ls_gradient_coefficients, gradient
from ..linear import AMG, BiCGStab, CG, JacobiSolver
from ..linear.base import MatrixFreeOperator, newton_operator
from ..exceptions import ConfigError
from .base import Model, ResidualHistory


class StructureBC(BoundaryCondition):
    _allowed_types = (
        "SpecifiedDeformation",
        "SpecifiedTraction",
        "SpecifiedForce",
        "Symmetry",
        "ZeroTraction",
    )
    _defaults = {
        "specifiedXDeformation": 0.0,
        "specifiedYDeformation": 0.0,
        "specifiedZDeformation": 0.0,
        "specifiedXTraction": 0.0,
        "specifiedYTraction": 0.0,
        "specifiedZTraction": 0.0,
        "specifiedXForce": 0.0,
        "specifiedYForce": 0.0,
        "specifiedZForce": 0.0,
    }


class StructureVC(BoundaryCondition):
    _defaults = {
        "youngsModulus": 1e9,
        "poissonsRatio": 0.3,
        "density": 1000.0,
        "bodyForceX": 0.0,
        "bodyForceY": 0.0,
        "bodyForceZ": 0.0,
    }


class StructureModelOptions(ModelOptions):
    _defaults = {
        "transient": False,
        "timeStep": 1e-3,
        # Norton power-law creep (reference StructurePlasticDiscretization.h:
        # creepModel 1): deps_p/dt = A (VM/Sy0)^m * devStress / VM.
        # Plastic flow is deviatoric (trace-free), so no lambda term appears
        # in the plastic traction.
        "creep": False,
        "creepConstant": 1e-3,  # A
        "creepExponent": 1.0,  # m
        "yieldStress": 1.0,  # Sy0
        "nonOrthogonalCorrection": True,
        "relativeTolerance": 1e-8,
        "absoluteTolerance": 1e-30,
        "urf": 1.0,
        "verbose": True,
    }


class StructureModel(Model):
    name = "StructureModel"

    def __init__(self, mesh: DeviceMesh, partition=None):
        super().__init__(mesh, partition)
        self.vc = StructureVC()

    def _make_options(self):
        return StructureModelOptions()

    def _make_bc(self):
        return StructureBC()

    # ------------------------------------------------------------------

    def init(self) -> None:
        mesh = self.mesh
        dim = mesh.dim
        self.state = {
            "deformation": self._full_cells(0.0, trailing=(dim,)),
        }
        if self.options["transient"]:
            self.state["deformation_N1"] = self.state["deformation"]
            self.state["deformation_N2"] = self.state["deformation"]
        if self.options["creep"]:
            # in 2D only the in-plane block is stored; eps_p_zz is implied
            # by incompressible plastic flow: eps_p_zz = -tr(eps_p_2d)
            self.state["plastic_strain"] = self._full_cells(
                0.0, trailing=(dim, dim)
            )

        E = self._cell_field(self.vc, "youngsModulus", extend_ghosts=True)
        nu = self._cell_field(self.vc, "poissonsRatio", extend_ghosts=True)
        self._E, self._nu = E, nu  # kept for solve_tangent chain rule
        mu = E / (2.0 * (1.0 + nu))
        lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
        self._mu0, self._lam0 = mu, lam  # undegraded base (fracture coupling)
        body_keys = ("bodyForceX", "bodyForceY", "bodyForceZ")[:dim]
        self.params = {
            "mu": mu,
            "lam": lam,
            "rho": self._cell_field(self.vc, "density"),
            "body": jnp.stack(
                [self._cell_field(self.vc, k) for k in body_keys], axis=-1
            ),
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
                relative_tolerance=1e-6,
                max_iterations=200,
            )
            self.options["linearSolver"] = solver

        if self._dist:
            self.state = self.partition.device_put(self.state)
            self.params = self.partition.device_put(self.params)
        self._step_raw = self._build_step()
        self._step = self._wrap_step(self._step_raw)
        self._initial_norm = None
        self._initialized = True

    # ------------------------------------------------------------------

    def _bc_vector(self, mesh, bcvals, g, stem):
        dim = mesh.dim
        comps = [f"specified{ax}{stem}" for ax in ("X", "Y", "Z")[:dim]]
        return jnp.stack([bcvals[f"{g[1]}:{c}"] for c in comps], axis=1)

    def _refresh_ghosts(self, mesh, state, bcvals):
        w = bck.extend_to_ghosts(mesh, state["deformation"])
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            t = bc.bc_type
            if t == "SpecifiedDeformation":
                w = w.at[gc].set(self._bc_vector(mesh, bcvals, g, "Deformation"))
            elif t == "Symmetry":
                owners = mesh.face_cell0[sl]
                amag = jnp.maximum(mesh.face_area_mag[sl], 1e-300)
                nhat = mesh.face_area[sl] / amag[:, None]
                wo = w[owners]
                # ghost is AT the face: project out the normal component
                w = w.at[gc].set(
                    wo - jnp.sum(wo * nhat, axis=1, keepdims=True) * nhat
                )
            # traction/force/free groups keep the zero-gradient copy
        return dict(state, deformation=w)

    def _stress_flux(self, mesh, params, state, w):
        """Block-linearized traction flux.

        Explicit flux: full face-interpolated stress  F = -sigma_f . A.
        Implicit Jacobian: the two-point gradient surrogate
        G ~ (w_N - w_O) (x) ds/|ds|^2 gives per-face BxB blocks
          B_im = [mu((d.A) delta_im + d_i A_m) + lam A_i d_m] / |d|^2
        which couples the displacement components implicitly (the scalar
        deferred-correction split converges an order of magnitude slower).
        """
        dim = mesh.dim
        mu, lam = params["mu"], params["lam"]
        mu_f = disc.harmonic_face_gamma(mesh, mu)
        lam_f = disc.harmonic_face_gamma(mesh, lam)
        gradw = gradient(mesh, params["grad_coeff"], w)  # (nc, comp, dir)
        # ghost-cell LS stencils are rank-deficient; use owner gradients there
        gradw = bck.extend_to_ghosts(mesh, gradw)
        gradw = maybe_sync(mesh, gradw)
        Gf = assembly.cells_to_faces_distance_weighted(mesh, gradw)
        # corrected face gradient: replace the ds-direction component with
        # the two-point difference (standard compact correction; couples the
        # ghost/wall values so BCs constrain the stress implicitly)
        d = mesh.face_ds
        d2m = jnp.maximum(jnp.sum(d * d, axis=1), 1e-300)
        dw_f = mesh.take_nbr(w) - mesh.take_owner(w)  # (nf, B)
        defect = dw_f - jnp.einsum("fij,fj->fi", Gf, d)
        Gf = Gf + defect[:, :, None] * (d / d2m[:, None])[:, None, :]
        tr = jnp.trace(Gf, axis1=1, axis2=2)
        eye = jnp.eye(dim, dtype=w.dtype)
        sigma = (
            mu_f[:, None, None] * (Gf + jnp.swapaxes(Gf, 1, 2))
            + lam_f[:, None, None] * tr[:, None, None] * eye
        )
        t_A = jnp.einsum("fij,fj->fi", sigma, mesh.face_area)
        F = -t_A
        ep = state.get("plastic_strain")
        if ep is not None:
            # plastic traction: sigma_total = sigma_el - 2 mu eps_p
            # (deviatoric flow => no lambda tr(eps_p) term)
            epf = assembly.cells_to_faces_distance_weighted(
                mesh, maybe_sync(mesh, bck.extend_to_ghosts(mesh, ep))
            )
            F = F + 2.0 * mu_f[:, None] * jnp.einsum(
                "fij,fj->fi", epf, mesh.face_area
            )

        d = mesh.face_ds
        Av = mesh.face_area
        d2 = jnp.maximum(jnp.sum(d * d, axis=1), 1e-300)
        dA = jnp.sum(d * Av, axis=1)
        Bblk = (
            mu_f[:, None, None] * (dA[:, None, None] * eye)
            + mu_f[:, None, None] * d[:, :, None] * Av[:, None, :]
            + lam_f[:, None, None] * Av[:, :, None] * d[:, None, :]
        ) / d2[:, None, None]
        gamma_f = disc.harmonic_face_gamma(mesh, 2.0 * mu + lam)
        return F, Bblk, -Bblk, gamma_f, gradw

    def _system(self, mesh, params, state, bcvals, w):
        """Pure residual/surrogate assembly as a function of ALL unknowns
        (interior + ghost cells).  Differentiable: the Newton operator is
        its exact jvp."""
        opts = self.options
        dim = mesh.dim
        F, dO, dN, gamma_f, gradw = self._stress_flux(mesh, params, state, w)

        for g, bc in self._group_bcs():
            sl = mesh.group_faces(g)
            t = bc.bc_type
            if t in ("SpecifiedTraction", "ZeroTraction", "SpecifiedForce"):
                if t == "SpecifiedTraction":
                    tv = self._bc_vector(mesh, bcvals, g, "Traction")
                    Fb = -tv * mesh.face_area_mag[sl][:, None]
                elif t == "SpecifiedForce":
                    fv = self._bc_vector(mesh, bcvals, g, "Force")
                    total = jnp.maximum(jnp.sum(mesh.face_area_mag[sl]), 1e-300)
                    Fb = -fv * (mesh.face_area_mag[sl] / total)[:, None]
                else:
                    Fb = jnp.zeros((g[4], dim), w.dtype)
                F = F.at[sl].set(Fb)
                dO = dO.at[sl].set(0.0)
                dN = dN.at[sl].set(0.0)

        r_cell = params["body"] * mesh.cell_volume[:, None]
        diag_cell = jnp.zeros((mesh.n_cells, dim, dim), w.dtype)
        if opts["transient"]:
            dt = opts["timeStep"]
            coeff = params["rho"] * mesh.cell_volume / (dt * dt)
            accel = w - 2.0 * state["deformation_N1"] + state["deformation_N2"]
            eye = jnp.eye(dim, dtype=w.dtype)
            diag_cell = diag_cell + coeff[:, None, None] * eye
            r_cell = r_cell - coeff[:, None] * accel

        A, r = assemble_block(mesh, F, dO, dN, r_cell=r_cell, diag_cell=diag_cell)

        eyeF = jnp.eye(dim, dtype=w.dtype)
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            valid = bcvals[f"{g[1]}:__valid"]
            scale = gamma_f[sl] * mesh.face_e_over_d[sl]
            t = bc.bc_type
            if t == "SpecifiedDeformation":
                val = self._bc_vector(mesh, bcvals, g, "Deformation")
                A, r = dirichlet_rows_block(mesh, A, r, gc, val, w, valid, scale)
            elif t == "Symmetry":
                # ghost sits AT the face: zero normal component, tangential
                # extrapolation -> w_g = (I - n n^T) w_O
                amag = jnp.maximum(mesh.face_area_mag[sl], 1e-300)
                nhat = mesh.face_area[sl] / amag[:, None]
                T = eyeF - nhat[:, :, None] * nhat[:, None, :]
                A, r = transform_rows_block(mesh, A, r, gc, T, w, valid, scale)
            else:
                # traction-type: gradient extrapolation w_g = w_O + G_O . d
                T = jnp.broadcast_to(eyeF, (g[4], dim, dim))
                own = mesh.face_cell0[sl]
                extra = jnp.einsum(
                    "fij,fj->fi", gradw[own], mesh.face_ds[sl]
                )
                A, r = transform_rows_block(
                    mesh, A, r, gc, T, w, valid, scale, extra
                )

        if mesh.n_owned_cells_ is not None and mesh.n_owned_cells < mesh.n_cells:
            hs = slice(mesh.n_owned_cells, mesh.n_cells)
            A = A.replace(diag=A.diag.at[hs].set(eyeF), off=A.off.at[:, hs].set(0.0))
            r = r.at[hs].set(0.0)
        return A, r

    def _build_step(self):
        opts = self.options
        solver = opts["linearSolver"]
        urf = float(opts["urf"])

        def step(mesh, params, state, bcvals):
            state = dict(
                state, deformation=maybe_sync(mesh, state["deformation"])
            )
            w = state["deformation"]
            A, r = self._system(mesh, params, state, bcvals, w)
            rnorm = A.norm(r)

            # Jacobian-free Newton-Krylov: exact Jacobian action by AD,
            # block surrogate as preconditioner.  The halo sync at entry
            # makes the jvp tangents (the Krylov vectors) exchange their
            # halos too — all_to_all is linear.
            Rfn = lambda ww: self._system(
                mesh, params, state, bcvals, maybe_sync(mesh, ww)
            )[1]
            op = MatrixFreeOperator(newton_operator(Rfn, w), A)
            dw, _ = solver.solve_fn(op, r, jnp.zeros_like(r))
            state = dict(state, deformation=w + urf * dw)
            return state, {"rnorm": rnorm}

        return step

    # --- sensitivities (reference: models.cpp:10-74 builds StructureModel
    # with the Tangent atype; Simulator_Cantilever_UQ.py drives it) -------

    def _map_param_tangents(self, t):
        if not ({"youngsModulus", "poissonsRatio"} & set(t)):
            return t
        E, nu = self._E, self._nu
        dE = self._pad_cell_tangent(E, t.pop("youngsModulus", 0.0))
        dnu = self._pad_cell_tangent(nu, t.pop("poissonsRatio", 0.0))

        def props(E, nu):
            return {
                "mu": E / (2.0 * (1.0 + nu)),
                "lam": E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu)),
            }

        _, d = jax.jvp(props, (E, nu), (dE, dnu))
        for k, v in d.items():
            if k in t:
                v = v + self._pad_cell_tangent(self.params[k], t[k])
            t[k] = v
        return t

    def solve_tangent(self, param_tangents=None, bc_tangents=None) -> np.ndarray:
        """Forward sensitivity d(deformation) . (dparams, dBCs) at the
        converged state (reference: every model instantiated with the
        Tangent atype, models.cpp:10-74, atypes/tangent_double/atype.h:10).

        At convergence R(w*, p) = 0, so J dw = dR/dp . dp with
        J = -dR/dw — solved with the SAME exact-jvp matrix-free operator
        and preconditioner as the primal JFNK step (the derivative is
        exact, not one Picard sweep).  ``param_tangents`` accepts params
        keys ('mu', 'lam', 'body') or VC-level 'youngsModulus' /
        'poissonsRatio' (chain rule); ``bc_tangents`` is keyed
        'group:entry' (e.g. 'right:specifiedYTraction').  Returns
        d(deformation) on interior cells, (n_interior, dim)."""
        if not self._initialized:
            raise ConfigError("call init() + advance() before solve_tangent")
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        solver = self.options["linearSolver"]
        base, tans = self._tangent_inputs(param_tangents, bc_tangents, bcvals)

        def tangent_fn(lmesh, params_all, lstate, lbcvals, base, tans):
            w = maybe_sync(lmesh, lstate["deformation"])
            lstate = dict(lstate, deformation=w)

            def r_of(p_sub, b_sub):
                return self._system(
                    lmesh, dict(params_all, **p_sub), lstate,
                    dict(lbcvals, **b_sub), w,
                )[1]

            _, dr = jax.jvp(r_of, base, tans)
            A, _ = self._system(lmesh, params_all, lstate, lbcvals, w)
            Rfn = lambda ww: self._system(
                lmesh, params_all, lstate, lbcvals, maybe_sync(lmesh, ww)
            )[1]
            op = MatrixFreeOperator(newton_operator(Rfn, w), A)
            dw, _ = solver.solve_fn(op, dr, jnp.zeros_like(dr))
            return dw

        if self._dist:
            mapped = self._smap_cells(tangent_fn)
            dw = mapped(mesh, self.params, self.state, bcvals, base, tans)
            return self.partition.gather_cells(dw)
        dw = tangent_fn(mesh, self.params, self.state, bcvals, base, tans)
        return np.asarray(dw[: mesh.n_interior_cells])

    def solve_adjoint(self, functional, param_keys=(), bc_keys=()) -> dict:
        """Reverse-mode (adjoint) sensitivity: the gradient of a scalar
        functional of the converged deformation w.r.t. whole parameter
        FIELDS and/or BC values, from ONE transposed JFNK solve.

        The transpose Jacobian action A^T u = -vjp(R)(u) is as exact as
        the primal's jvp; the reference's Tangent atype is forward-only
        (one direction per run, models.cpp:10-74) and has no counterpart.

        ``functional``: jax-traceable ``fn(w_interior) -> scalar`` with
        ``w_interior`` (n_interior, dim).  ``param_keys``: any of 'mu',
        'lam', 'body', 'youngsModulus', 'poissonsRatio' (the latter two
        chain-ruled through the Lame map).  ``bc_keys``: 'group:entry'
        strings as in solve_tangent; their gradients are per-face arrays
        (sum them for a scalar BC knob).  Returns {key: gradient}; cell
        parameters come back on interior cells.  Distributed too: the
        reverse pass runs under shard_map (reversed halo exchanges,
        psum'd transposed Krylov); the functional then sees the
        shard-local owned-interior rows and must be sum-decomposable
        (sums/integrals yes, means no).
        """
        from .sensitivity import jfnk_adjoint

        def props(ins):
            E, nu = ins["youngsModulus"], ins["poissonsRatio"]
            return {
                "mu": E / (2.0 * (1.0 + nu)),
                "lam": E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu)),
            }

        chain = ({"youngsModulus": self._E, "poissonsRatio": self._nu}, props)
        return jfnk_adjoint(
            self, "deformation", self._system, functional, param_keys,
            bc_keys, chain,
        )

    # ------------------------------------------------------------------

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
            raise ConfigError("StructureModel: transient option is off")
        self.state["deformation_N2"] = self.state["deformation_N1"]
        self.state["deformation_N1"] = self.state["deformation"]

    def getDeformation(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["deformation"])
        return np.asarray(self.state["deformation"][: self.mesh.n_interior_cells])

    def getStress(self) -> np.ndarray:
        """Cell stress tensors (n_interior, dim, dim), plastic part removed."""
        mesh = self.mesh
        w = self.state["deformation"]
        G = gradient(mesh, self.params["grad_coeff"], w)
        mu, lam = self.params["mu"], self.params["lam"]
        tr = jnp.trace(G, axis1=1, axis2=2)
        eye = jnp.eye(mesh.dim, dtype=w.dtype)
        sigma = (
            mu[:, None, None] * (G + jnp.swapaxes(G, 1, 2))
            + lam[:, None, None] * tr[:, None, None] * eye
        )
        ep = self.state.get("plastic_strain")
        if ep is not None:
            sigma = sigma - 2.0 * mu[:, None, None] * ep
        return np.asarray(sigma[: mesh.n_interior_cells])

    def getBoundaryForceIntegral(self, group_name) -> np.ndarray:
        """Reaction force vector on a boundary group: sum over its faces
        of sigma_owner . A (reference role: the ComputeForce helper the
        homoCase driver imports; single-device)."""
        mesh = self.mesh
        g = (
            mesh.group_by_name(group_name)
            if isinstance(group_name, str)
            else group_name
        )
        sl = mesh.group_faces(g)
        w = self.state["deformation"]
        G = gradient(mesh, self.params["grad_coeff"], w)
        mu, lam = self.params["mu"], self.params["lam"]
        tr = jnp.trace(G, axis1=1, axis2=2)
        eye = jnp.eye(mesh.dim, dtype=w.dtype)
        sigma = (
            mu[:, None, None] * (G + jnp.swapaxes(G, 1, 2))
            + lam[:, None, None] * tr[:, None, None] * eye
        )
        ep = self.state.get("plastic_strain")
        if ep is not None:
            sigma = sigma - 2.0 * mu[:, None, None] * ep
        own = mesh.face_cell0[sl]
        F = jnp.einsum("fij,fj->fi", sigma[own], mesh.face_area[sl])
        return np.asarray(jnp.sum(F, axis=0))

    def getStrain(self) -> np.ndarray:
        """Cell small-strain tensors eps = sym(grad w), (n_interior, dim,
        dim) (reference: StructureModel::getStrain, used by the homoCase
        fracture driver, demos/homoCase/homoCase.py:566)."""
        mesh = self.mesh
        w = self.state["deformation"]
        G = gradient(mesh, self.params["grad_coeff"], w)
        eps = 0.5 * (G + jnp.swapaxes(G, 1, 2))
        return np.asarray(eps[: mesh.n_interior_cells])

    def getElasticEnergyDensity(self) -> np.ndarray:
        """UNDEGRADED elastic energy density psi0 = lam/2 tr(eps)^2 +
        mu eps:eps per interior cell — the phase-field fracture driving
        force (reference: the ElasticEnergyField assembled at
        demos/homoCase/homoCase.py:688-707; degraded energy = g(d) *
        psi0).  Uses the BASE moduli so the driving force does not
        vanish as damage grows."""
        mesh = self.mesh
        w = self.state["deformation"]
        G = gradient(mesh, self.params["grad_coeff"], w)
        eps = 0.5 * (G + jnp.swapaxes(G, 1, 2))
        tr = jnp.trace(eps, axis1=1, axis2=2)
        ee = jnp.einsum("nij,nij->n", eps, eps)
        psi0 = 0.5 * self._lam0 * tr * tr + self._mu0 * ee
        return np.asarray(psi0[: mesh.n_interior_cells])

    def set_stiffness_degradation(self, g) -> None:
        """Scale the elastic moduli by a per-cell degradation factor g
        (typically d^2 + eta from a phase-field fracture model;
        reference: demos/homoCase/homoCase.py:906-911 sets
        eta = G*(PF^2 + StiffnessResidual), eta1 = Lamda*(...)).

        ``g`` covers the interior cells (ghosts take their owner's
        value, like every VC field).  Resets from the UNDEGRADED base
        each call (g=1 restores the virgin stiffness)."""
        from ..core import bcs as bck

        mesh = self.mesh
        g = jnp.asarray(g, self.params["mu"].dtype)
        full = jnp.ones(mesh.n_cells, g.dtype)
        full = full.at[: g.shape[0]].set(g)
        full = bck.extend_to_ghosts(mesh, full)
        self.params = dict(
            self.params, mu=self._mu0 * full, lam=self._lam0 * full
        )

    # -------------------------------------------------- creep / plasticity

    def _stress_3d(self):
        """Full 3x3 cell stress (plane strain embedding in 2D: the
        out-of-plane components sigma_zz = lam tr(G) + 2 mu tr(eps_p_2d)
        follow from eps_zz = 0 and trace-free plastic flow)."""
        mesh = self.mesh
        dim = mesh.dim
        w = self.state["deformation"]
        G = gradient(mesh, self.params["grad_coeff"], w)
        mu, lam = self.params["mu"], self.params["lam"]
        ep = self.state.get("plastic_strain")
        if ep is None:
            ep = jnp.zeros((mesh.n_cells, dim, dim), w.dtype)
        nc = mesh.n_cells
        G3 = jnp.zeros((nc, 3, 3), w.dtype).at[:, :dim, :dim].set(G)
        ep3 = jnp.zeros((nc, 3, 3), w.dtype).at[:, :dim, :dim].set(ep)
        if dim == 2:
            ep3 = ep3.at[:, 2, 2].set(-jnp.trace(ep, axis1=1, axis2=2))
        tr = jnp.trace(G3, axis1=1, axis2=2)
        eye3 = jnp.eye(3, dtype=w.dtype)
        sigma = (
            mu[:, None, None] * (G3 + jnp.swapaxes(G3, 1, 2))
            - 2.0 * mu[:, None, None] * ep3
            + lam[:, None, None] * tr[:, None, None] * eye3
        )
        return sigma

    def getVMStress(self) -> np.ndarray:
        """Von Mises stress per interior cell
        (reference StructureModel_impl.h creepInit VMStress)."""
        sigma = self._stress_3d()
        tr = jnp.trace(sigma, axis1=1, axis2=2)
        dev = sigma - (tr / 3.0)[:, None, None] * jnp.eye(3, dtype=sigma.dtype)
        vm = jnp.sqrt(1.5 * jnp.einsum("nij,nij->n", dev, dev))
        return np.asarray(vm[: self.mesh.n_interior_cells])

    def advanceCreep(self, dt=None) -> None:
        """Explicit Norton power-law plastic-strain update
        (reference StructurePlasticDiscretization.h:119-136, creepModel 1):
            eps_p += A (VM/Sy0)^m * dev(sigma)/VM * dt
        Call once per (pseudo-)time step, then re-advance() to relax the
        displacement field against the new plastic strain."""
        opts = self.options
        if not opts["creep"]:
            raise ConfigError("StructureModel: creep option is off")
        if dt is None:
            dt = opts["timeStep"]
        dim = self.mesh.dim
        sigma = self._stress_3d()
        tr = jnp.trace(sigma, axis1=1, axis2=2)
        dev = sigma - (tr / 3.0)[:, None, None] * jnp.eye(3, dtype=sigma.dtype)
        vm = jnp.sqrt(1.5 * jnp.einsum("nij,nij->n", dev, dev))
        A = float(opts["creepConstant"])
        m = float(opts["creepExponent"])
        Sy = float(opts["yieldStress"])
        mult = A * (vm / Sy) ** m / jnp.maximum(vm, 1e-300)
        dep3 = mult[:, None, None] * dev * dt
        self.state["plastic_strain"] = (
            self.state["plastic_strain"] + dep3[:, :dim, :dim]
        )

    def getPlasticStrain(self) -> np.ndarray:
        ep = self.state.get("plastic_strain")
        if ep is None:
            raise ConfigError("StructureModel: creep option is off")
        return np.asarray(ep[: self.mesh.n_interior_cells])
