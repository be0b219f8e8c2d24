"""PlateModel: Mindlin-Reissner plate bending (MEMS beams/membranes).

TPU-native counterpart of the reference's PlateModel
(reference: PlateModel.h:19, PlateModel_impl.h with
PlateSourceDiscretization.h and TimeDerivativePlateDiscretization.h; used
by the MEMS switch driver scripts/Simulator.py).

Unknowns per cell: u = (beta_x, beta_y, w) — rotations + transverse
deflection on a 2D mid-surface mesh.  Equations (D = E h^3/12(1-nu^2),
shear stiffness S = kappa G h):

  moment balance:   div M - Q = 0        (2 eqs)
  transverse:       div Q + q = 0        (1 eq)
  M = D [ (1-nu)/2 (grad b + grad b^T) + nu tr(grad b) I ]
  Q = S (grad w + b)

Discretized with the block-ELL machinery: compact 2-point Jacobian
surrogate + exact Newton via jvp (same JFNK pattern as StructureModel).
BC types: 'Clamped' (w=0, beta=0 or specified), 'Free', 'Symmetry',
'SpecifiedDeformation'.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..core.options import BoundaryCondition, ModelOptions
from ..core import bcs as bck
from ..ops import assembly, discretizations as disc
from ..ops.bell import assemble_block, dirichlet_rows_block, transform_rows_block
from ..ops.halo import maybe_sync
from ..ops.gradients import ls_gradient_coefficients, gradient
from ..linear import BiCGStab, JacobiSolver
from ..linear.base import MatrixFreeOperator, newton_operator
from ..exceptions import ConfigError
from .base import Model, ResidualHistory


class PlateBC(BoundaryCondition):
    _allowed_types = ("Clamped", "Free", "Symmetry", "SpecifiedDeformation")
    _defaults = {
        "specifiedXRotation": 0.0,
        "specifiedYRotation": 0.0,
        "specifiedZDeformation": 0.0,
    }


class PlateVC(BoundaryCondition):
    _defaults = {
        "ym": 1e9,  # Young's modulus (reference name)
        "nu": 0.3,
        "density": 1000.0,
        "thickness": 0.01,
        "pressure": 0.0,  # transverse load q (per area)
    }


class PlateModelOptions(ModelOptions):
    _defaults = {
        "transient": False,
        "timeStep": 1e-4,
        "shearCorrection": 5.0 / 6.0,
        "relativeTolerance": 1e-8,
        "absoluteTolerance": 1e-30,
        "verbose": True,
    }


class PlateModel(Model):
    name = "PlateModel"

    def __init__(self, mesh: DeviceMesh, partition=None):
        if mesh.dim != 2:
            raise ConfigError("PlateModel requires a 2D mid-surface mesh")
        super().__init__(mesh, partition)
        self.vc = PlateVC()

    def _make_options(self):
        return PlateModelOptions()

    def _make_bc(self):
        return PlateBC()

    # ------------------------------------------------------------------

    def init(self) -> None:
        mesh = self.mesh
        self.state = {"u": self._full_cells(0.0, trailing=(3,))}
        if self.options["transient"]:
            self.state["u_N1"] = self.state["u"]
            self.state["u_N2"] = self.state["u"]
        E = self._cell_field(self.vc, "ym", extend_ghosts=True)
        nu = self._cell_field(self.vc, "nu", extend_ghosts=True)
        h = self._cell_field(self.vc, "thickness", extend_ghosts=True)
        self._E, self._h = E, h  # kept for solve_tangent chain rule
        kappa = float(self.options["shearCorrection"])
        D = E * h**3 / (12.0 * (1.0 - nu * nu))
        G = E / (2.0 * (1.0 + nu))
        S = kappa * G * h
        self.params = {
            "D": D,
            "S": S,
            "nu": nu,
            "rho_h": self._cell_field(self.vc, "density")
            * self._cell_field(self.vc, "thickness"),
            "q": self._cell_field(self.vc, "pressure"),
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
                max_iterations=400,
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

    def _system(self, mesh, params, state, bcvals, u):
        """Residual + block surrogate; u = (nc, 3) = (bx, by, w)."""
        nu = params["nu"]
        D = params["D"]
        S = params["S"]
        beta = u[:, :2]
        w = u[:, 2]

        # gradients (with ghost extension + two-point correction like
        # the structure model)
        gradu = gradient(mesh, params["grad_coeff"], u)  # (nc, 3, 2)
        gradu = bck.extend_to_ghosts(mesh, gradu)
        # halo-cell LS stencils are incomplete on a shard: sync the OWNER
        # gradients so seam faces read exact neighbor gradients (the
        # cell-valued-crosses-faces invariant; without this the dist
        # Jacobian differs ~1e-5 at seams and tangent/adjoint solves
        # inherit the error even though the primal root still matches)
        gradu = maybe_sync(mesh, gradu)
        Gf = assembly.cells_to_faces_distance_weighted(mesh, gradu)
        d = mesh.face_ds
        d2m = jnp.maximum(jnp.sum(d * d, axis=1), 1e-300)
        du_f = mesh.take_nbr(u) - mesh.take_owner(u)
        defect = du_f - jnp.einsum("fij,fj->fi", Gf, d)
        Gf = Gf + defect[:, :, None] * (d / d2m[:, None])[:, None, :]

        Gb = Gf[:, :2, :]  # face grad beta (2x2)
        gw = Gf[:, 2, :]  # face grad w (2,)
        D_f = disc.harmonic_face_gamma(mesh, D)
        S_f = disc.harmonic_face_gamma(mesh, S)
        # shear-locking relief (stabilized Mindlin, Tessler/MIN3-style):
        # cap the face shear stiffness at the bending scale D/h_mesh^2 so the
        # thin limit converges to Kirchhoff instead of locking
        h2 = jnp.maximum(mesh.face_dsmag**2, 1e-300)
        alpha = float(self.options.get("shearStabilization", 2.0))
        S_f = S_f / (1.0 + S_f * h2 / (alpha * jnp.maximum(D_f, 1e-300)))
        nu_f = assembly.cells_to_faces_distance_weighted(mesh, nu)
        beta_f = assembly.cells_to_faces_distance_weighted(mesh, beta)

        eye2 = jnp.eye(2, dtype=u.dtype)
        trb = jnp.trace(Gb, axis1=1, axis2=2)
        M = D_f[:, None, None] * (
            0.5 * (1.0 - nu_f)[:, None, None] * (Gb + jnp.swapaxes(Gb, 1, 2))
            + nu_f[:, None, None] * trb[:, None, None] * eye2
        )
        A_vec = mesh.face_area  # (nf, 2)
        F_moment = -jnp.einsum("fij,fj->fi", M, A_vec)  # (nf, 2)
        Qf = S_f[:, None] * (gw + beta_f)  # (nf, 2)
        F_w = -jnp.einsum("fi,fi->f", Qf, A_vec)
        F = jnp.concatenate([F_moment, F_w[:, None]], axis=1)  # (nf, 3)

        # 2-point block surrogate (diag blocks only, like gamma e_over_d)
        gam_m = D_f * mesh.face_e_over_d
        gam_w = S_f * mesh.face_e_over_d
        zero = jnp.zeros_like(gam_m)
        B = jnp.zeros((mesh.n_faces, 3, 3), u.dtype)
        B = B.at[:, 0, 0].set(gam_m)
        B = B.at[:, 1, 1].set(gam_m)
        B = B.at[:, 2, 2].set(gam_w)
        dO, dN = B, -B

        # boundary flux patches
        for g, bc in self._group_bcs():
            sl = mesh.group_faces(g)
            if bc.bc_type == "Free":
                F = F.at[sl].set(0.0)
                dO = dO.at[sl].set(0.0)
                dN = dN.at[sl].set(0.0)

        # cell sources: moment eqs get -Q V; w eq gets q V.
        # Assumed-shear (MITC-style): reconstruct the cell shear vector from
        # the face-NORMAL shear components only (those honor the two-point
        # w difference along ds); tangential face components or cell
        # gradients of w re-introduce locking in the thin limit:
        #   Q_c = (sum n n^T)^-1 sum n (Q_f . n)
        V = mesh.cell_volume
        # stabilized cell shear stiffness, used only for the surrogate diag
        S_c = S / (1.0 + S * V / (alpha * jnp.maximum(D, 1e-300)))
        from ..ops.bell import small_inv

        Qf_cell = mesh.take_faces(Qf)  # (K, nc, 2)
        Af = mesh.take_faces(mesh.face_area)  # (K, nc, 2)
        Amag = jnp.sqrt(jnp.maximum(jnp.sum(Af * Af, axis=2), 1e-300))
        sK = jnp.where(mesh.cf_is_owner, 1.0, -1.0)
        n_out = sK[:, :, None] * Af / Amag[:, :, None]
        n_out = jnp.where(mesh.cf_mask[:, :, None], n_out, 0.0)
        qn = jnp.einsum("kni,kni->kn", Qf_cell, n_out)
        M2 = jnp.einsum("kni,knj->nij", n_out, n_out)
        eye2m = jnp.eye(2, dtype=u.dtype)
        M2 = M2 + 1e-10 * eye2m
        Qc = jnp.einsum(
            "nij,nj->ni", small_inv(M2), jnp.einsum("kni,kn->ni", n_out, qn)
        )
        r_cell = jnp.concatenate(
            [-Qc * V[:, None], (params["q"] * V)[:, None]], axis=1
        )
        # implicit part of -Q wrt beta: diag block += S V on rotations
        diag_cell = jnp.zeros((mesh.n_cells, 3, 3), u.dtype)
        diag_cell = diag_cell.at[:, 0, 0].set(S_c * V)
        diag_cell = diag_cell.at[:, 1, 1].set(S_c * V)
        if self.options["transient"]:
            dt = self.options["timeStep"]
            coeff = params["rho_h"] * V / (dt * dt)
            accel = u - 2.0 * state["u_N1"] + state["u_N2"]
            eye3 = jnp.eye(3, dtype=u.dtype)
            diag_cell = diag_cell + coeff[:, None, None] * eye3
            r_cell = r_cell - coeff[:, None] * accel

        A, r = assemble_block(mesh, F, dO, dN, r_cell=r_cell, diag_cell=diag_cell)

        eye3 = jnp.eye(3, dtype=u.dtype)
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            valid = bcvals[f"{g[1]}:__valid"]
            scale = gam_m[sl] + gam_w[sl]
            t = bc.bc_type
            if t in ("Clamped", "SpecifiedDeformation"):
                val = jnp.stack(
                    [
                        bcvals[f"{g[1]}:specifiedXRotation"],
                        bcvals[f"{g[1]}:specifiedYRotation"],
                        bcvals[f"{g[1]}:specifiedZDeformation"],
                    ],
                    axis=1,
                )
                A, r = dirichlet_rows_block(mesh, A, r, gc, val, u, valid, scale)
            elif t == "Symmetry":
                amag = jnp.maximum(mesh.face_area_mag[sl], 1e-300)
                nhat = mesh.face_area[sl] / amag[:, None]
                # rotations: normal rotation zero; w: zero-gradient
                T = jnp.zeros((g[4], 3, 3), u.dtype)
                T = T.at[:, :2, :2].set(
                    eye2 - nhat[:, :, None] * nhat[:, None, :]
                )
                T = T.at[:, 2, 2].set(1.0)
                A, r = transform_rows_block(mesh, A, r, gc, T, u, valid, scale)
            else:  # Free: zero-gradient all
                T = jnp.broadcast_to(eye3, (g[4], 3, 3))
                own = mesh.face_cell0[sl]
                extra = jnp.einsum("fij,fj->fi", gradu[own], mesh.face_ds[sl])
                A, r = transform_rows_block(
                    mesh, A, r, gc, T, u, valid, scale, extra
                )
        if mesh.n_owned_cells_ is not None and mesh.n_owned_cells < mesh.n_cells:
            hs = slice(mesh.n_owned_cells, mesh.n_cells)
            eyeh = jnp.eye(3, dtype=u.dtype)
            A = A.replace(diag=A.diag.at[hs].set(eyeh), off=A.off.at[:, hs].set(0.0))
            r = r.at[hs].set(0.0)
        return A, r

    def _build_step(self):
        solver = self.options["linearSolver"]

        def step(mesh, params, state, bcvals):
            u = maybe_sync(mesh, state["u"])
            state = dict(state, u=u)
            A, r = self._system(mesh, params, state, bcvals, u)
            rnorm = A.norm(r)
            Rfn = lambda uu: self._system(
                mesh, params, state, bcvals, maybe_sync(mesh, uu)
            )[1]
            op = MatrixFreeOperator(newton_operator(Rfn, u), A)
            du, _ = solver.solve_fn(op, r, jnp.zeros_like(r))
            return dict(state, u=u + du), {"rnorm": rnorm}

        return step

    # --- sensitivities (reference: models.cpp builds PlateModel with the
    # Tangent atype; the MEMS UQ drivers sweep ym/thickness) --------------

    def _map_param_tangents(self, t):
        if not ({"ym", "thickness"} & set(t)) and "nu_vc" not in t:
            return t
        E, h, nu = self._E, self._h, self.params["nu"]
        kappa = float(self.options["shearCorrection"])
        dE = self._pad_cell_tangent(E, t.pop("ym", 0.0))
        dh = self._pad_cell_tangent(h, t.pop("thickness", 0.0))
        dnu = self._pad_cell_tangent(nu, t.pop("nu_vc", 0.0))

        def props(E, nu, h):
            D = E * h**3 / (12.0 * (1.0 - nu * nu))
            S = kappa * E / (2.0 * (1.0 + nu)) * h
            return {"D": D, "S": S, "nu": nu}

        _, d = jax.jvp(props, (E, nu, h), (dE, dnu, dh))
        for k, v in d.items():
            if k in t:
                v = v + self._pad_cell_tangent(self.params[k], t[k])
            t[k] = v
        return t

    def solve_tangent(self, param_tangents=None, bc_tangents=None) -> np.ndarray:
        """Forward sensitivity d(u) . (dparams, dBCs) at the converged
        state via one exact-Jacobian tangent solve (same JFNK operator as
        the primal step; reference: Tangent atype, models.cpp:10-74).

        ``param_tangents`` accepts params keys ('D', 'S', 'q', ...) or
        VC-level 'ym' / 'thickness' / 'nu_vc' (chain rule through
        D = E h^3/12(1-nu^2), S = kappa G h).  Returns d(u) on interior
        cells, (n_interior, 3) = (dbeta_x, dbeta_y, dw)."""
        if not self._initialized:
            raise ConfigError("call init() + advance() before solve_tangent")
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        solver = self.options["linearSolver"]
        base, tans = self._tangent_inputs(param_tangents, bc_tangents, bcvals)

        def tangent_fn(lmesh, params_all, lstate, lbcvals, base, tans):
            u = maybe_sync(lmesh, lstate["u"])
            lstate = dict(lstate, u=u)

            def r_of(p_sub, b_sub):
                return self._system(
                    lmesh, dict(params_all, **p_sub), lstate,
                    dict(lbcvals, **b_sub), u,
                )[1]

            _, dr = jax.jvp(r_of, base, tans)
            A, _ = self._system(lmesh, params_all, lstate, lbcvals, u)
            Rfn = lambda uu: self._system(
                lmesh, params_all, lstate, lbcvals, maybe_sync(lmesh, uu)
            )[1]
            op = MatrixFreeOperator(newton_operator(Rfn, u), A)
            du, _ = solver.solve_fn(op, dr, jnp.zeros_like(dr))
            return du

        if self._dist:
            mapped = self._smap_cells(tangent_fn)
            du = mapped(mesh, self.params, self.state, bcvals, base, tans)
            return self.partition.gather_cells(du)
        du = tangent_fn(mesh, self.params, self.state, bcvals, base, tans)
        return np.asarray(du[: mesh.n_interior_cells])

    def solve_adjoint(self, functional, param_keys=(), bc_keys=()) -> dict:
        """Reverse-mode gradient of a scalar functional of the converged
        plate unknowns w.r.t. parameter FIELDS / BC values, from ONE
        transposed JFNK solve (the reference's Tangent atype is
        forward-only).  ``functional(u_interior) -> scalar`` with
        ``u_interior`` (n_interior, 3) = (beta_x, beta_y, w).
        ``param_keys``: 'D', 'S', 'q', ... or VC-level 'ym' /
        'thickness' / 'nu_vc' (chain-ruled through D = Eh^3/12(1-nu^2),
        S = kappa G h).  Distributed too (shard_map reverse pass; the
        functional sees shard-local owned-interior rows and must be
        sum-decomposable)."""
        from .sensitivity import jfnk_adjoint

        kappa = float(self.options["shearCorrection"])

        def props(ins):
            E, nu, h = ins["ym"], ins["nu_vc"], ins["thickness"]
            return {
                "D": E * h**3 / (12.0 * (1.0 - nu * nu)),
                "S": kappa * E / (2.0 * (1.0 + nu)) * h,
                "nu": nu,
            }

        chain = (
            {"ym": self._E, "nu_vc": self.params["nu"],
             "thickness": self._h},
            props,
        )
        return jfnk_adjoint(
            self, "u", self._system, functional, param_keys, bc_keys, chain
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
            raise ConfigError("PlateModel: transient option is off")
        self.state["u_N2"] = self.state["u_N1"]
        self.state["u_N1"] = self.state["u"]

    def getDeflection(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["u"])[:, 2]
        return np.asarray(self.state["u"][: self.mesh.n_interior_cells, 2])

    def getRotations(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["u"])[:, :2]
        return np.asarray(self.state["u"][: self.mesh.n_interior_cells, :2])

    def set_pressure(self, q) -> None:
        """Update the transverse load field (e.g. electrostatic pressure
        from an ElectricModel for the MEMS switch coupling)."""
        self.params["q"] = jnp.asarray(q, self.params["q"].dtype)
