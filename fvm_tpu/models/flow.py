"""FlowModel: incompressible Navier-Stokes, segregated SIMPLE.

TPU-native counterpart of the reference's FlowModel
(reference: FlowModel.h:19, FlowModel_impl.h — solveMomentum :730,
linearizeContinuity :998, Rhie-Chow via _momApField/_previousVelocity
:741-768, postContinuitySolve :1263 with under-relaxation :858-882,
advance :1433).

Algorithm per outer iteration (one jitted step, SPMD-safe under shard_map):
  1. momentum predictor: one scalar ELL matrix shared by all velocity
     components (multi-RHS solve), upwind convection + viscous diffusion +
     explicit pressure force  p_f * A_f  as a face flux; implicit
     under-relaxation of the diagonal; saves aP for Rhie-Chow;
  2. Rhie-Chow face mass flux:
       mdot = rho*Vbar_f.A - rho*Df*[(p_N - p_O)*e_over_d - grad_p_bar . ds]
     which suppresses checkerboard modes on the collocated layout;
  3. pressure correction (SIMPLE): div-free constraint gives a Poisson
     system with face coefficients rho*Df; fixed-pressure boundaries get
     p'=0, all other boundaries zero correction-flux; for enclosed domains
     the level is pinned at global cell 0 (reference: reference-pressure
     cell, FlowModel_impl.h:1005,1056);
  4. corrections: p += urf_p*p', V -= (vol/aP) grad p', mdot += dmdot.

Ghost-cell values for V and p are refreshed explicitly each outer iteration
from the BCs (walls/inlets: Dirichlet; symmetry: mirrored velocity;
pressure boundaries: fixed p, extrapolated V); all ghost rows in the linear
systems are identity (delta = 0), which converges to the same fixed point as
the reference's implicit GenericBCS rows while keeping the momentum matrix
scalar.  Cell-valued intermediates that cross faces (gradients, vol/aP) are
halo-synced on partitioned meshes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..core.options import BoundaryCondition, ModelOptions
from ..core import bcs as bck
from ..ops import assembly
from ..ops import discretizations as disc
from ..ops.assembly import FaceFlux
from ..ops.ell import ELLMatrix
from ..ops.halo import maybe_sync, gsum
from ..ops.gradients import ls_gradient_coefficients, gradient
from ..linear import AMG, BiCGStab, GMRES, JacobiSolver
from ..exceptions import ConfigError
from .base import Model, ResidualHistory


class FlowBC(BoundaryCondition):
    _allowed_types = (
        "NoSlipWall",
        "SlipJump",
        "VelocityBoundary",
        "PressureBoundary",
        "Symmetry",
    )
    _defaults = {
        "specifiedXVelocity": 0.0,
        "specifiedYVelocity": 0.0,
        "specifiedZVelocity": 0.0,
        "specifiedPressure": 0.0,
        "accomodationCoefficient": 1.0,
    }


class FlowVC(BoundaryCondition):
    _defaults = {
        "density": 1.0,
        "viscosity": 1.0,
        "initialXVelocity": 0.0,
        "initialYVelocity": 0.0,
        "initialZVelocity": 0.0,
        "initialPressure": 0.0,
    }


class FlowModelOptions(ModelOptions):
    _defaults = {
        "momentumURF": 0.7,
        "pressureURF": 0.3,
        # "SIMPLE" (reference) or "SIMPLEC": the consistent correction
        # coefficient vol/(aP - sum_nb aNb) lets pressureURF run at ~1.0
        "algorithm": "SIMPLE",
        # >= 2: PISO-style repeated pressure correctors (each rebuilds the
        # Rhie-Chow flux and re-solves continuity); with transient=True,
        # momentumURF=pressureURF=1.0 and 2 correctors, ONE outer step
        # advances a time step (Issa's splitting)
        "nPressureCorrectors": 1,
        # coupled (advanceCoupled) relaxation: near-Newton. Measured on the
        # Re=100 cavity: 1.0 stagnates on the nonlinear transient, 0.95
        # reaches 1e-3 in 13 outers and then converges superlinearly; lower
        # values only slow the asymptotic rate (0.9 -> 21, 0.8 -> 43).
        "coupledMomentumURF": 0.95,
        "transient": False,
        "timeStep": 0.1,
        "timeDiscretizationOrder": 1,
        "convectionScheme": "upwind",
        "nonOrthogonalCorrection": True,
        "momentumTolerance": 1e-4,
        # Maxwell slip-jump wall constants (reference FlowModelSlipJump.h:
        # lambda = mu/p sqrt(pi R T/2), R = 8314.472/molWt)
        "operatingPressure": 101325.0,
        "operatingTemperature": 300.0,
        "molecularWeight": 28.966,
        "continuityTolerance": 1e-4,
        "absoluteTolerance": 1e-50,
        # Anderson acceleration of the SIMPLE outer fixed point
        # (linear/anderson.py): "anderson" extrapolates (V, p, mdot) over
        # the last andersonDepth outer iterates — attacks the ~0.989/outer
        # asymptotic contraction at large meshes.  Starts after
        # andersonDelay plain steps (the early transient is far from the
        # asymptotic regime where the window helps).
        "acceleration": None,
        "andersonDepth": 4,
        "andersonDamping": 1.0,
        "andersonDelay": 5,
        # advanceNewton (JFNK endgame) inner-Krylov controls: each Newton
        # step solves J dq = R matrix-free to this tolerance (the cap is
        # a safety net — the while_loop exits at the tolerance; capping
        # the solve instead stalls the quadratic outer convergence)
        "newtonKrylovTolerance": 1e-5,
        "newtonKrylovIterations": 1500,
        # >0: run the Newton inner Krylov in warm-restarted chunks of
        # this many iterations, one device program each (required at
        # scale on the axon TPU backend, which kills long programs)
        "newtonChunkIterations": 0,
        # mixed-precision inexact Newton ("float32"): the Newton STATE,
        # residual r0 = R(q) and update stay in the model dtype (f64 for
        # the endgame — an f32 state cannot satisfy the discrete
        # equations below rel ~4e-5), but the inner Krylov (Jacobian
        # jvp matvecs + CoupledSIMPLE/AMG preconditioner) runs on an
        # f32-cast view of (mesh, params, state) with the f64-computed
        # rhs cast down.  The historical all-f32 failure (inner rel
        # stuck at 1.0 from 256^2 up) came from the RHS being pure f32
        # representation noise at the f32 floor, not from the operator:
        # with a clean f64 rhs the f32 matvec noise only limits the
        # inner tolerance (~1e-3 relative), which inexact-Newton
        # forcing absorbs.  f64 is ~20x slower than f32 on TPU, so
        # this makes each inner iteration ~20x cheaper.  Requires
        # newtonChunkIterations > 0 (single-device chunked path).
        "newtonInnerPrecision": None,
        # None = auto: BiCGStab rho-breakdown shadow restarts on iff the
        # inner runs at reduced precision (f32 loses shadow
        # orthogonality to round-off and bounces at O(10)x|r0| forever;
        # f64 never needs it and forced restarts can slow it down)
        "newtonStallRestart": None,
        # mix every K-th outer step (Anderson over the K-step composite
        # map): the extrapolation coefficients scale like 1/(1 - rho^K),
        # so larger K amplifies the loose inner-solve noise less — use
        # K ~ 5-10 at large mesh sizes where rho -> 1
        "andersonInterval": 1,
        # echo per-chunk inner-Krylov progress to stderr (bench harness)
        "newtonVerboseInner": False,
        # inner Krylov method for the chunked Newton path: "bicgstab"
        # (default) or "gmres" — restarted right-preconditioned
        # GMRES(newtonGmresRestart).  GMRES's least-squares residual is
        # monotone within a cycle, and it beats BiCGStab on SMALL
        # problems (32^2: clean 22-119-it solves where BiCGStab hit its
        # cap); at 1M it STAGNATES (measured round 5: rel 1.000 after
        # 1792 its at restart 32 — the restart discards the growing
        # Krylov space the coupled spectrum needs, while BiCGStab's
        # unrestarted recurrence rides out its 800-1700-it f32-noise
        # transient and then plunges).  Memory bounds the restart
        # (~12 MB/basis vector f32 at 1M), so BiCGStab stays default.
        "newtonInnerSolver": "bicgstab",
        "newtonGmresRestart": 32,
        # refreeze momAp/massFlux at the current state before the first
        # Newton step (finish program with dq=0) — for entry states
        # restored from a lower-precision phase whose frozen aP is stale
        "newtonRefreeze": False,
        # chunked-path inexact-Newton forcing: "ew" = Eisenstat-Walker
        # adaptive inner tolerance in [newtonKrylovTolerance,
        # newtonForcingMax]; "fixed" = newtonKrylovTolerance every step
        "newtonForcing": "ew",
        "newtonForcingMax": 0.1,
        # absolute momentum-residual target: the chunked Newton loop
        # stops BEFORE the next inner solve once the entry residual is
        # below it (avoids overshooting the caller's tolerance by a
        # whole Newton step)
        "newtonTargetResidual": None,
        "verbose": True,
    }


def _cast_floats(tree, dtype):
    """Cast every floating pytree leaf to ``dtype`` (mixed-precision
    Newton views).  Static fields (DeviceMesh DIA/gather index tables,
    group tuples) are not pytree leaves and are shared, so a cast
    DeviceMesh is a cheap f32 VIEW of the same mesh: only the float
    geometry arrays are re-created, once per polish."""
    def c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree.map(c, tree)


class FlowModel(Model):
    name = "FlowModel"

    def __init__(self, mesh: DeviceMesh, partition=None):
        super().__init__(mesh, partition)
        self.vc = FlowVC()

    def _make_options(self):
        return FlowModelOptions()

    def _make_bc(self):
        return FlowBC()

    # ------------------------------------------------------------------

    def init(self) -> None:
        mesh = self.mesh
        dim = mesh.dim
        vel_keys = ("initialXVelocity", "initialYVelocity", "initialZVelocity")[:dim]
        vel0 = jnp.stack(
            [self._cell_field(self.vc, k) for k in vel_keys], axis=-1
        )
        self.state = {
            "velocity": vel0,
            "pressure": self._cell_field(self.vc, "initialPressure"),
            "massFlux": self._full_faces(0.0),
            "momAp": self._full_cells(1.0),
        }
        if self.options["transient"]:
            self.state["velocity_N1"] = vel0
            if self.options["timeDiscretizationOrder"] > 1:
                self.state["velocity_N2"] = vel0

        self.params = {
            "rho": self._cell_field(self.vc, "density", extend_ghosts=True),
            "mu": self._cell_field(self.vc, "viscosity", extend_ghosts=True),
        }
        if self.options["nonOrthogonalCorrection"]:
            self.params["grad_coeff"] = (
                jax.vmap(ls_gradient_coefficients)(mesh)
                if self._dist
                else ls_gradient_coefficients(mesh)
            )
        # pressure-level pin mask: global interior cell 0
        if self._dist:
            pin = np.zeros(self.partition.mesh.n_cells)
            pin[0] = 1.0
            self.params["pin_mask"] = jnp.asarray(self.partition.scatter_cells(pin))
        else:
            self.params["pin_mask"] = (
                jnp.arange(mesh.n_cells) == 0
            ).astype(mesh.cell_volume.dtype)

        self._has_pressure_bc = any(
            bc.bc_type == "PressureBoundary" for _, bc in self._group_bcs()
        )

        mom = self.options.get("momentumLinearSolver")
        if mom is None:
            mom = BiCGStab(relative_tolerance=1e-2, max_iterations=30)
            self.options["momentumLinearSolver"] = mom
        pres = self.options.get("pressureLinearSolver")
        if pres is None:
            if self._dist:
                # shard-local AMG (additive Schwarz) when the partition
                # admits it; Jacobi otherwise
                amg_p = AMG(coarse_size=64)
                if amg_p.setup_structure_dist(
                    np.asarray(mesh.cf_nbr).transpose(0, 2, 1),
                    np.asarray(mesh.cf_mask).transpose(0, 2, 1),
                    mesh.n_owned_cells,
                ):
                    pres = BiCGStab(
                        preconditioner=amg_p,
                        relative_tolerance=1e-3,
                        max_iterations=60,
                    )
                else:
                    pres = BiCGStab(
                        preconditioner=JacobiSolver(sweeps=3),
                        relative_tolerance=1e-3,
                        max_iterations=200,
                    )
            else:
                pres = BiCGStab(
                    preconditioner=AMG(), relative_tolerance=1e-3, max_iterations=30
                )
            self.options["pressureLinearSolver"] = pres
        for s in (mom, pres):
            for ss in (s, getattr(s, "preconditioner", None)):
                if isinstance(ss, AMG):
                    if self._dist:
                        ok = (
                            getattr(ss, "_dist_setup", None) is not None
                            or ss.setup_structure_dist(
                                np.asarray(mesh.cf_nbr).transpose(0, 2, 1),
                                np.asarray(mesh.cf_mask).transpose(0, 2, 1),
                                mesh.n_owned_cells,
                            )
                        )
                        if not ok:
                            raise ConfigError(
                                "FlowModel: distributed AMG setup failed "
                                "(no coarsening possible on this "
                                "partition)"
                            )
                    else:
                        ss.setup_structure(*mesh.host_cf())

        if self._dist:
            self.state = self.partition.device_put(self.state)
            self.params = self.partition.device_put(self.params)

        self._step_raw = self._build_step()
        self._step = self._wrap_step(self._step_raw)
        self._norm0 = None
        self._initialized = True

    # ------------------------------------------------------------------

    def _bc_velocity(self, mesh, bcvals, g):
        dim = mesh.dim
        comps = ("specifiedXVelocity", "specifiedYVelocity", "specifiedZVelocity")[:dim]
        return jnp.stack([bcvals[f"{g[1]}:{c}"] for c in comps], axis=1)

    def _refresh_ghosts(self, mesh, params, state, bcvals):
        """Set ghost V and p from BCs (explicit, before linearization)."""
        V = state["velocity"]
        p = state["pressure"]
        V = bck.extend_to_ghosts(mesh, V)
        p = bck.extend_to_ghosts(mesh, p)
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            t = bc.bc_type
            if t in ("NoSlipWall", "VelocityBoundary"):
                V = V.at[gc].set(self._bc_velocity(mesh, bcvals, g))
            elif t == "SlipJump":
                # Maxwell first-order slip (reference FlowModelSlipJump.h:
                # 47-86): wall velocity = normal part of the specified
                # velocity + sigma*lambda/(dn + sigma*lambda) of the
                # tangential cell velocity, relative to the moving wall.
                owners = mesh.face_cell0[sl]
                amag = jnp.maximum(mesh.face_area_mag[sl], 1e-300)
                nhat = mesh.face_area[sl] / amag[:, None]
                Vo = V[owners]
                Vo_t = Vo - jnp.sum(Vo * nhat, axis=1, keepdims=True) * nhat
                bv = self._bc_velocity(mesh, bcvals, g)
                bvn = jnp.sum(bv * nhat, axis=1, keepdims=True) * nhat
                bv_t = bv - bvn
                opts = self.options
                Rgas = 8314.472 / float(opts["molecularWeight"])
                lam_mfp = (
                    params["mu"][owners]
                    / float(opts["operatingPressure"])
                    * np.sqrt(0.5 * np.pi * Rgas * float(opts["operatingTemperature"]))
                )
                sig = bcvals[f"{g[1]}:accomodationCoefficient"]
                dn = jnp.abs(
                    jnp.einsum("fd,fd->f", mesh.face_ds[sl], nhat)
                )
                coeff = (sig * lam_mfp / (dn + sig * lam_mfp))[:, None]
                V = V.at[gc].set(bvn + bv_t + coeff * (Vo_t - bv_t))
            elif t == "Symmetry":
                owners = mesh.face_cell0[sl]
                amag = jnp.maximum(mesh.face_area_mag[sl], 1e-300)
                nhat = mesh.face_area[sl] / amag[:, None]
                Vo = V[owners]
                # ghost is AT the face: slip wall = tangential projection
                V = V.at[gc].set(
                    Vo - jnp.sum(Vo * nhat, axis=1, keepdims=True) * nhat
                )
            elif t == "PressureBoundary":
                p = p.at[gc].set(bcvals[f"{g[1]}:specifiedPressure"])
        return dict(state, velocity=V, pressure=p)

    def _boundary_mass_flux(self, mesh, params, state, bcvals):
        """mdot on boundary faces from BCs (fixed during continuity)."""
        V = state["velocity"]
        mdot = jnp.zeros(mesh.n_faces, V.dtype)
        for g, bc in self._group_bcs():
            sl = mesh.group_faces(g)
            t = bc.bc_type
            if t in ("NoSlipWall", "SlipJump", "Symmetry"):
                continue  # zero
            rho_f = params["rho"][mesh.face_cell0[sl]]
            if t == "VelocityBoundary":
                Vb = self._bc_velocity(mesh, bcvals, g)
                mdot = mdot.at[sl].set(
                    rho_f * jnp.einsum("fd,fd->f", Vb, mesh.face_area[sl])
                )
            elif t == "PressureBoundary":
                Vo = V[mesh.face_cell0[sl]]
                mdot = mdot.at[sl].set(
                    rho_f * jnp.einsum("fd,fd->f", Vo, mesh.face_area[sl])
                )
        return mdot

    def _grad(self, mesh, params, x):
        if "grad_coeff" in params:
            return gradient(mesh, params["grad_coeff"], x)
        return self._green_gauss_grad(mesh, x)

    @staticmethod
    def _green_gauss_grad(mesh, p):
        p_f = assembly.cells_to_faces_distance_weighted(mesh, p)
        contrib = p_f[:, None] * mesh.face_area  # (nf, dim)
        s = jnp.where(mesh.cf_is_owner, 1.0, -1.0) * mesh.cf_mask
        g = jnp.einsum("kn,knd->nd", s, mesh.take_faces(contrib))
        return g / jnp.maximum(mesh.cell_volume, 1e-300)[:, None]

    # ------------------------------------------------------------------

    def _build_step(self, implicit=False):
        opts = self.options
        urf_v = float(opts["momentumURF"])
        urf_p = float(opts["pressureURF"])
        simplec = str(opts.get("algorithm", "SIMPLE")).upper() == "SIMPLEC"
        n_corr = int(opts.get("nPressureCorrectors", 1))
        mom_solver = opts["momentumLinearSolver"]
        pres_solver = opts["pressureLinearSolver"]
        # implicit=True swaps in lax.custom_linear_solve-wrapped solves so
        # the WHOLE step is jax.jvp-differentiable (solve_tangent's
        # fixed-point tangent iteration); implicit="transposable" also
        # registers transpose solves so jax.vjp works (solve_adjoint's
        # reverse fixed point); the primal path keeps the plain
        # while_loop Krylov solves
        if implicit:
            import functools

            def _imp(s):
                if implicit == "transposable":
                    return functools.partial(
                        s.solve_fn_implicit, transposable=True
                    )
                return s.solve_fn_implicit

            msolve, psolve = _imp(mom_solver), _imp(pres_solver)
        else:
            msolve, psolve = mom_solver.solve_fn, pres_solver.solve_fn

        def step(mesh, params, state, bcvals):
            dim = mesh.dim
            n_int = mesh.n_interior_cells
            interior_cells = jnp.arange(mesh.n_cells) < n_int
            bnd = jnp.arange(mesh.n_faces) >= mesh.n_interior_faces

            state = dict(
                state,
                velocity=maybe_sync(mesh, state["velocity"]),
                pressure=maybe_sync(mesh, state["pressure"]),
            )
            state = self._refresh_ghosts(mesh, params, state, bcvals)
            V = state["velocity"]
            p = state["pressure"]
            mdot = state["massFlux"]
            bmdot = self._boundary_mass_flux(mesh, params, state, bcvals)
            mdot = jnp.where(bnd, bmdot, mdot)

            def identity_ghost_rows(A, r):
                gh = slice(n_int, mesh.n_cells)
                A = A.replace(
                    diag=A.diag.at[gh].set(1.0), off=A.off.at[:, gh].set(0.0)
                )
                r = r.at[gh].set(0.0)
                return A, r

            # ---- momentum predictor --------------------------------------
            mu_f = disc.harmonic_face_gamma(mesh, params["mu"])
            # on orthogonal meshes with upwind convection the velocity
            # gradient is only needed for SOU/non-orthogonal corrections
            needs_gradV = (not mesh.orthogonal) or (
                opts["convectionScheme"] == "sou"
            )
            gradV = (
                maybe_sync(mesh, self._grad(mesh, params, V))
                if needs_gradV
                else None
            )
            flux = disc.diffusion_flux(mesh, V, mu_f, gradV)
            flux = flux + disc.convection_flux(
                mesh, V, mdot, opts["convectionScheme"], gradV
            )
            p_f = assembly.cells_to_faces_distance_weighted(mesh, p)
            flux = FaceFlux(
                F=flux.F + p_f[:, None] * mesh.face_area,
                dF_dO=flux.dF_dO,
                dF_dN=flux.dF_dN,
            )
            diag_cell = jnp.zeros(mesh.n_cells, V.dtype)
            r_cell = jnp.zeros((mesh.n_cells, dim), V.dtype)
            if opts["transient"]:
                d2, r2 = disc.transient_term(
                    mesh,
                    V,
                    state["velocity_N1"],
                    opts["timeStep"],
                    params["rho"],
                    state.get("velocity_N2"),
                )
                diag_cell = diag_cell + d2
                r_cell = r_cell + r2
            A, r = assembly.assemble(mesh, flux, r_cell=r_cell, diag_cell=diag_cell)
            A, r = identity_ghost_rows(A, r)
            if "ib_mask" in params:
                # immersed body: pin solid/IB-band cells to the body
                # velocity (reference IBM flow pipeline, IBMSetup.py)
                A, r = self._apply_ib(mesh, params, A, r, V)
            if str(opts.get("residualNorm", "L2")).upper() == "L1":
                # the reference's convergence.dat records the per-component
                # L1 momentum residual (testFlowParallel.py goldens);
                # expose it for digit-comparable history parity
                mom_norm = A.psum(jnp.sum(jnp.abs(
                    jnp.where(interior_cells[:, None], r, 0.0)[:, 0]
                )))
            else:
                mom_norm = A.norm(r)
            Aur = A.replace(
                diag=jnp.where(interior_cells, A.diag / urf_v, A.diag)
            )
            dV, mom_stats = msolve(Aur, r, jnp.zeros_like(r))
            V = V + dV
            aP = Aur.diag

            # ---- momentum-matrix-derived coefficients --------------------
            rho_f = assembly.cells_to_faces_distance_weighted(mesh, params["rho"])
            vol_over_ap = jnp.where(interior_cells, mesh.cell_volume / aP, 0.0)
            vol_over_ap = maybe_sync(mesh, vol_over_ap)
            voap_f = assembly.cells_to_faces_distance_weighted(
                mesh, bck.extend_to_ghosts(mesh, vol_over_ap)
            )
            Df = rho_f * voap_f * mesh.face_e_over_d
            # correction coefficient: SIMPLE uses vol/aP; SIMPLEC (Van
            # Doormaal & Raithby) the consistent vol/(aP - sum|aNb|),
            # which admits pressureURF ~ 1.  Off-diagonals carry their
            # assembled (negative) sign, so the denominator is
            # aP + sum(off) — positive for urf_v < 1.  Only the
            # CORRECTION uses it; the Rhie-Chow dissipation stays on
            # vol/aP so the converged solution is algorithm-independent.
            if simplec:
                sum_off = jnp.where(A.mask, A.off, 0.0).sum(axis=0)
                den = Aur.diag + sum_off
                corr_den = jnp.where(den > 1e-300, den, aP)
                vol_corr = jnp.where(
                    interior_cells, mesh.cell_volume / corr_den, 0.0
                )
                vol_corr = maybe_sync(mesh, vol_corr)
                vc_f = assembly.cells_to_faces_distance_weighted(
                    mesh, bck.extend_to_ghosts(mesh, vol_corr)
                )
                Df_corr = rho_f * vc_f * mesh.face_e_over_d
            else:
                vol_corr = vol_over_ap
                Df_corr = Df
            pres_face = jnp.zeros(mesh.n_faces, bool)
            for g, bc in self._group_bcs():
                if bc.bc_type == "PressureBoundary":
                    sl = mesh.group_faces(g)
                    pres_face = pres_face.at[sl].set(True)
            Df_cont = jnp.where(bnd & ~pres_face, 0.0, Df_corr)
            # immersed body: the Df coupling into solid cells STAYS — their
            # pc rows are pinned to 0 below, so every enclosed fluid region
            # sees a pressure reference through the body surface (zeroing
            # Df instead leaves sealed regions with a constant-pc nullspace
            # and the correction drifts unboundedly); the spurious
            # correction flux through the wall is O(pc) and vanishes at
            # convergence

            # ---- pressure-correction loop: 1 = SIMPLE/SIMPLEC; >=2 =
            # PISO-style transient splitting (Issa; "Complete PISO and
            # SIMPLE solvers on GPUs", arXiv:1207.1571) — each corrector
            # rebuilds the Rhie-Chow mass flux from the corrected field
            # and re-solves continuity, so one outer step per time step
            # suffices in transient mode
            cont_norm = None
            for _corr in range(n_corr):
                state2 = self._refresh_ghosts(
                    mesh,
                    params,
                    dict(state, velocity=maybe_sync(mesh, V), pressure=p),
                    bcvals,
                )
                V = state2["velocity"]
                Vbar = assembly.cells_to_faces_distance_weighted(mesh, V)
                gradp = maybe_sync(mesh, self._grad(mesh, params, p))
                gpbar = assembly.cells_to_faces_distance_weighted(mesh, gradp)
                dp = mesh.take_nbr(p) - mesh.take_owner(p)
                rc = Df * (dp - jnp.einsum("fd,fd->f", gpbar, mesh.face_ds))
                mdot_int = (
                    rho_f * jnp.einsum("fd,fd->f", Vbar, mesh.face_area) - rc
                )
                bmdot = self._boundary_mass_flux(mesh, params, state2, bcvals)
                mdot = jnp.where(bnd, bmdot, mdot_int)

                if "ib_solid_face" in params:
                    mdot = jnp.where(params["ib_solid_face"], 0.0, mdot)
                cont_flux = FaceFlux(F=mdot, dF_dO=Df_cont, dF_dN=-Df_cont)
                Ap, rp = assembly.assemble(mesh, cont_flux)
                Ap, rp = identity_ghost_rows(Ap, rp)
                if "ib_solid_mask" in params:
                    Ap, rp = assembly.dirichlet_cells(
                        Ap, rp, params["ib_solid_mask"], 0.0,
                        jnp.zeros_like(p),
                    )
                if cont_norm is None:
                    cont_norm = Ap.norm(rp)
                if not self._has_pressure_bc:
                    Ap = Ap.replace(
                        diag=Ap.diag * (1.0 + 1e6 * params["pin_mask"])
                    )
                pc, pres_stats = psolve(Ap, rp, jnp.zeros_like(rp))
                if not self._has_pressure_bc:
                    # subtract a consistent global level
                    num = gsum(
                        mesh, jnp.sum(jnp.where(interior_cells, pc, 0.0))
                    )
                    den = gsum(mesh, jnp.sum(interior_cells.astype(pc.dtype)))
                    pc = pc - num / den
                pc = jnp.where(interior_cells, pc, 0.0)

                # corrections (reference postContinuitySolve :1263)
                p = p + urf_p * pc
                pc_s = maybe_sync(mesh, pc)
                gradpc = maybe_sync(mesh, self._grad(mesh, params, pc_s))
                V = V - vol_corr[:, None] * gradpc
                dmdot = -Df_corr * (
                    mesh.take_nbr(pc_s) - mesh.take_owner(pc_s)
                )
                mdot = jnp.where(bnd & ~pres_face, mdot, mdot + dmdot)
                if "ib_solid_face" in params:
                    mdot = jnp.where(params["ib_solid_face"], 0.0, mdot)

            new_state = dict(state)
            new_state["velocity"] = V
            new_state["pressure"] = p
            new_state["massFlux"] = mdot
            new_state["momAp"] = aP
            return new_state, {"mom_norm": mom_norm, "cont_norm": cont_norm}

        return step

    # ------------------------------------------------------------------

    def _build_coupled_step(self):
        """Fully coupled pressure-velocity step (reference advanceCoupled,
        FlowModel_impl.h:1474: VPMatrix/PVMatrix blocks added to the
        momentum+continuity LinearSystem and solved as one system).

        One (dim+1)x(dim+1) BlockELL system per outer iteration with
        unknowns q = (u, v, [w], p):
          - momentum rows: same diffusion/convection linearization as the
            segregated predictor; the pressure force p_f*A_f is IMPLICIT
            through the V-P column (dF/dp = w_f * A_f);
          - continuity row: Rhie-Chow mass flux with dmdot/dp = +-Df (the
            segregated pressure-correction stencil) and the P-V coupling
            dmdot/dV = rho_f * w_f * A_f from the face-averaged velocity.
        The solution delta updates V and p directly (Newton step; the
        momentum URF supplies the relaxation, as in the reference where
        linearizeMomentum carries the underrelaxer) and the mass flux is
        corrected with the full continuity-row linearization (reference
        correctMassFluxInterior in coupled mode, FlowModel_impl.h:1263).
        """
        from ..ops import bell

        opts = self.options
        # under-relaxing the coupled diagonal breaks the Newton consistency
        # between the momentum and continuity rows (measured: urf 0.9 slows
        # the outer contraction from 0.45 to 0.87 per iteration); default
        # to a full Newton step — the implicit coupling supplies stability
        urf_v = float(opts["coupledMomentumURF"])
        solver = opts["coupledLinearSolver"]

        def step(mesh, params, state, bcvals):
            dim = mesh.dim
            B = dim + 1
            n_int = mesh.n_interior_cells
            interior_cells = jnp.arange(mesh.n_cells) < n_int
            bnd = jnp.arange(mesh.n_faces) >= mesh.n_interior_faces

            state = dict(
                state,
                velocity=maybe_sync(mesh, state["velocity"]),
                pressure=maybe_sync(mesh, state["pressure"]),
            )
            state = self._refresh_ghosts(mesh, params, state, bcvals)
            V = state["velocity"]
            p = state["pressure"]
            mdot = state["massFlux"]
            bmdot = self._boundary_mass_flux(mesh, params, state, bcvals)
            mdot = jnp.where(bnd, bmdot, mdot)

            # ---- momentum linearization (shared scalar stencil) ----------
            mu_f = disc.harmonic_face_gamma(mesh, params["mu"])
            needs_gradV = (not mesh.orthogonal) or (
                opts["convectionScheme"] == "sou"
            )
            gradV = (
                maybe_sync(mesh, self._grad(mesh, params, V))
                if needs_gradV
                else None
            )
            flux = disc.diffusion_flux(mesh, V, mu_f, gradV)
            flux = flux + disc.convection_flux(
                mesh, V, mdot, opts["convectionScheme"], gradV
            )
            wo = mesh.face_wo
            p_f = wo * mesh.take_owner(p) + (1.0 - wo) * mesh.take_nbr(p)
            F_mom = flux.F + p_f[:, None] * mesh.face_area
            diag_cell = jnp.zeros(mesh.n_cells, V.dtype)
            r_cell = jnp.zeros((mesh.n_cells, dim), V.dtype)
            if opts["transient"]:
                d2, r2 = disc.transient_term(
                    mesh,
                    V,
                    state["velocity_N1"],
                    opts["timeStep"],
                    params["rho"],
                    state.get("velocity_N2"),
                )
                diag_cell = diag_cell + d2
                r_cell = r_cell + r2
            # scalar momentum matrix only for aP (Rhie-Chow) and mom_norm
            A_m, r_m = assembly.assemble(
                mesh,
                FaceFlux(F_mom, flux.dF_dO, flux.dF_dN),
                r_cell=r_cell,
                diag_cell=diag_cell,
            )
            gh = slice(n_int, mesh.n_cells)
            r_m = r_m.at[gh].set(0.0)
            mom_norm = A_m.norm(r_m)
            aP = jnp.where(interior_cells, A_m.diag / urf_v, A_m.diag)

            # ---- Rhie-Chow face mass flux (lagged velocity) --------------
            rho_f = assembly.cells_to_faces_distance_weighted(
                mesh, params["rho"]
            )
            Vbar = assembly.cells_to_faces_distance_weighted(mesh, V)
            gradp = maybe_sync(mesh, self._grad(mesh, params, p))
            vol_over_ap = jnp.where(
                interior_cells, mesh.cell_volume / aP, 0.0
            )
            vol_over_ap = maybe_sync(mesh, vol_over_ap)
            voap_f = assembly.cells_to_faces_distance_weighted(
                mesh, bck.extend_to_ghosts(mesh, vol_over_ap)
            )
            Df = rho_f * voap_f * mesh.face_e_over_d
            gpbar = assembly.cells_to_faces_distance_weighted(mesh, gradp)
            dp = mesh.take_nbr(p) - mesh.take_owner(p)
            rc = Df * (dp - jnp.einsum("fd,fd->f", gpbar, mesh.face_ds))
            mdot_int = (
                rho_f * jnp.einsum("fd,fd->f", Vbar, mesh.face_area) - rc
            )
            mdot = jnp.where(bnd, bmdot, mdot_int)

            pres_face = jnp.zeros(mesh.n_faces, bool)
            for g, bc in self._group_bcs():
                if bc.bc_type == "PressureBoundary":
                    sl = mesh.group_faces(g)
                    pres_face = pres_face.at[sl].set(True)
            Df_cont = jnp.where(bnd & ~pres_face, 0.0, Df)

            # ---- block Jacobians -----------------------------------------
            I_d = jnp.eye(dim, dtype=V.dtype)
            # velocity-velocity: scalar stencil times I
            dO_vv = flux.dF_dO[:, None, None] * I_d
            dN_vv = flux.dF_dN[:, None, None] * I_d
            # velocity-pressure: d(p_f A_f)/dp
            dO_vp = wo[:, None] * mesh.face_area
            dN_vp = (1.0 - wo)[:, None] * mesh.face_area
            # pressure-velocity: d(mdot)/dV; boundary mdot is fixed except
            # on pressure boundaries, where mdot = rho V_O . A
            wV_O = jnp.where(bnd, jnp.where(pres_face, 1.0, 0.0), wo)
            wV_N = jnp.where(bnd, 0.0, 1.0 - wo)
            dO_pv = (rho_f * wV_O)[:, None] * mesh.face_area
            dN_pv = (rho_f * wV_N)[:, None] * mesh.face_area
            dO_p = jnp.concatenate([dO_pv, Df_cont[:, None]], axis=1)
            dN_p = jnp.concatenate([dN_pv, -Df_cont[:, None]], axis=1)
            dO = jnp.concatenate(
                [
                    jnp.concatenate([dO_vv, dO_vp[:, :, None]], axis=2),
                    dO_p[:, None, :],
                ],
                axis=1,
            )
            dN = jnp.concatenate(
                [
                    jnp.concatenate([dN_vv, dN_vp[:, :, None]], axis=2),
                    dN_p[:, None, :],
                ],
                axis=1,
            )
            F_blk = jnp.concatenate([F_mom, mdot[:, None]], axis=1)
            diag_blk = jnp.zeros((mesh.n_cells, B, B), V.dtype)
            diag_blk = diag_blk.at[:, jnp.arange(dim), jnp.arange(dim)].set(
                diag_cell[:, None]
            )
            r_blk = jnp.concatenate(
                [r_cell, jnp.zeros((mesh.n_cells, 1), V.dtype)], axis=1
            )
            A_b, r_b = bell.assemble_block(
                mesh, F_blk, dO, dN, r_cell=r_blk, diag_cell=diag_blk
            )
            # ghost rows: identity blocks (delta = 0; ghosts refreshed
            # explicitly from the BCs each outer iteration)
            eyeB = jnp.eye(B, dtype=V.dtype)
            A_b = A_b.replace(
                diag=A_b.diag.at[gh].set(eyeB), off=A_b.off.at[:, gh].set(0.0)
            )
            r_b = r_b.at[gh].set(0.0)
            cont_norm = jnp.sqrt(A_b.psum(jnp.sum(r_b[:, dim] ** 2)))
            # implicit under-relaxation of the velocity diagonal (matches
            # the aP used in Df)
            sub = A_b.diag[:, :dim, :dim]
            A_b = A_b.replace(
                diag=A_b.diag.at[:, :dim, :dim].set(
                    jnp.where(
                        interior_cells[:, None, None], sub / urf_v, sub
                    )
                )
            )
            if not self._has_pressure_bc:
                A_b = A_b.replace(
                    diag=A_b.diag.at[:, dim, dim].mul(
                        1.0 + 1e6 * params["pin_mask"]
                    )
                )

            dq, stats = solver.solve_fn(A_b, r_b, jnp.zeros_like(r_b))
            dV = dq[:, :dim]
            pc = dq[:, dim]
            if not self._has_pressure_bc:
                num = gsum(mesh, jnp.sum(jnp.where(interior_cells, pc, 0.0)))
                den = gsum(mesh, jnp.sum(interior_cells.astype(pc.dtype)))
                pc = pc - jnp.where(interior_cells, num / den, 0.0)
            V = V + jnp.where(interior_cells[:, None], dV, 0.0)
            p = p + jnp.where(interior_cells, pc, 0.0)

            # mass-flux correction from the continuity-row linearization
            dq_s = maybe_sync(mesh, dq)
            dmdot = jnp.einsum(
                "fi,fi->f", dO_p, mesh.take_owner(dq_s)
            ) + jnp.einsum("fi,fi->f", dN_p, mesh.take_nbr(dq_s))
            mdot = jnp.where(bnd & ~pres_face, mdot, mdot + dmdot)

            new_state = dict(state)
            new_state["velocity"] = V
            new_state["pressure"] = p
            new_state["massFlux"] = mdot
            new_state["momAp"] = aP
            return new_state, {"mom_norm": mom_norm, "cont_norm": cont_norm}

        return step

    # --- sensitivities (reference: FlowModel built with the Tangent atype,
    # models.cpp:10-74 — recompile-free here: iterate the jvp of the SIMPLE
    # step map at the converged fixed point) ------------------------------

    def _tangent_state(self, param_tangents, bc_tangents, niter):
        """Tangent of the converged SIMPLE fixed point.

        At convergence s* = G(s*, p).  Differentiating: ds solves
        (I - dG/ds) ds = dG/dp . dp, obtained by iterating the LINEAR
        fixed point ds <- jvp(G)(ds, dp) — which contracts at the same
        rate as SIMPLE itself (the reference's Tangent atype carries
        tangents through the identical iteration history).  Each
        iteration jvps through a step whose Krylov solves are wrapped in
        lax.custom_linear_solve, so the tangent linear systems are solved
        with the same solvers instead of differentiating while_loops.
        Returns the FULL tangent state pytree (stacked per shard when
        distributed)."""
        bcvals = self._resolve_bcvals()
        base, tans = self._tangent_inputs(param_tangents, bc_tangents, bcvals)
        step_t = self._build_step(implicit=True)
        time_keys = [k for k in self.state if k.endswith(("_N1", "_N2"))]

        def tangent_fn(lmesh, params_all, lstate, lbcvals, base, tans):
            def G(s, p_sub, b_sub):
                new_s, _ = step_t(
                    lmesh, dict(params_all, **p_sub), s, dict(lbcvals, **b_sub)
                )
                # time levels are frozen inputs for the current step
                return dict(new_s, **{k: s[k] for k in time_keys})

            ds0 = jax.tree.map(jnp.zeros_like, lstate)

            def body(ds, _):
                _, ds2 = jax.jvp(
                    G, (lstate, base[0], base[1]), (ds, tans[0], tans[1])
                )
                return ds2, None

            ds, _ = jax.lax.scan(body, ds0, None, length=niter)
            return ds

        if self._dist:
            mapped = self._smap_cells(tangent_fn)
            return mapped(self.mesh, self.params, self.state, bcvals, base, tans)
        return jax.jit(tangent_fn)(
            self.mesh, self.params, self.state, bcvals, base, tans
        )

    def solve_tangent(
        self, param_tangents=None, bc_tangents=None, niter: int = 50
    ) -> dict:
        """Forward sensitivity d(V, p)/d(params, BCs) . direction at the
        converged state (reference: Tangent atype on FlowModel).

        ``param_tangents`` accepts 'mu' / 'rho' (scalar, (n_interior,), or
        full-shape); ``bc_tangents`` is keyed 'group:entry' (e.g.
        'lid:specifiedXVelocity').  ``niter`` tangent fixed-point
        iterations (use ~ the SIMPLE iteration count to convergence).
        Returns {'velocity': (n_interior, dim), 'pressure': (n_interior,)}
        host arrays."""
        if not self._initialized:
            raise ConfigError("call init() + advance() before solve_tangent")
        ds = self._tangent_state(param_tangents, bc_tangents, niter)
        if self._dist:
            return {
                "velocity": self.partition.gather_cells(ds["velocity"]),
                "pressure": self.partition.gather_cells(ds["pressure"]),
            }
        n = self.mesh.n_interior_cells
        return {
            "velocity": np.asarray(ds["velocity"][:n]),
            "pressure": np.asarray(ds["pressure"][:n]),
        }

    def solve_tangent_force(
        self, group_name, param_tangents=None, bc_tangents=None,
        niter: int = 50,
    ) -> np.ndarray:
        """d(boundary force)/d(params, BCs) . direction on a boundary
        group: chain rule of getMomentumFluxIntegral through the state
        tangent from solve_tangent (reference pattern:
        getMomentumFluxIntegral on a Tangent-atype model)."""
        mesh = self.mesh
        g = (
            mesh.group_by_name(group_name)
            if isinstance(group_name, str)
            else group_name
        )
        ds = self._tangent_state(param_tangents, bc_tangents, niter)
        bcvals = self._resolve_bcvals()
        base, tans = self._tangent_inputs(param_tangents, bc_tangents, bcvals)
        mu0 = self.params["mu"]
        dmu = tans[0].get("mu", jnp.zeros_like(mu0))

        def face_force(m, V, p, mu, grad_coeff=None):
            mu_f = disc.harmonic_face_gamma(m, mu)
            gradV = (
                gradient(m, grad_coeff, V) if grad_coeff is not None else None
            )
            dflux = disc.diffusion_flux(m, V, mu_f, gradV)
            p_f = assembly.cells_to_faces_distance_weighted(m, p)
            return dflux.F + p_f[:, None] * m.face_area

        def force_of(V, p, mu):
            args = (V, p, mu)
            if "grad_coeff" in self.params:
                args = args + (self.params["grad_coeff"],)
            F = self._map_mesh(face_force, *args)
            return self._sum_group(g, F)

        _, dF = jax.jvp(
            force_of,
            (self.state["velocity"], self.state["pressure"], mu0),
            (ds["velocity"], ds["pressure"], dmu),
        )
        return np.asarray(dF)

    def _adjoint_grads(self, functional, param_keys, bc_keys, niter, aux=None):
        """Reverse-mode engine: at the converged SIMPLE fixed point
        s* = G(s*, p), the adjoint u solves (I - dG/ds^T) u = dJ/ds by
        the transposed fixed-point iteration (same contraction rate as
        SIMPLE/the forward tangent); gradients are then
        dJ/dp = \\partial J/\\partial p + (dG/dp)^T u — every cell of
        every requested parameter from ONE reverse sweep, where the
        forward Tangent atype costs one sweep per input direction.

        ``functional(lmesh, state, params, bcvals, aux) -> scalar`` is
        evaluated on the (shard-)local state; under a Partition the whole
        reverse sweep runs per shard inside shard_map (the vjp of every
        halo refresh is the reversed all_to_all, the transposed Krylov
        solves psum), the per-shard functional contributions are
        implicitly summed by the collective transposes, so the functional
        must be sum-decomposable over cells/faces."""
        if not self._initialized:
            raise ConfigError("call init() + advance() before solve_adjoint")
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        for k in param_keys:
            if k not in self.params:
                raise ConfigError(
                    f"FlowModel.solve_adjoint: unknown parameter {k!r}"
                )
        for k in bc_keys:
            if k not in bcvals:
                raise ConfigError(
                    f"FlowModel.solve_adjoint: unknown BC entry {k!r}"
                )
        step_t = self._build_step(implicit="transposable")
        time_keys = [k for k in self.state if k.endswith(("_N1", "_N2"))]
        if aux is None:
            aux = jnp.zeros(
                ((mesh.n_shards, 1) if self._dist else (1,)), jnp.bool_
            )

        def adjoint_fn(lmesh, params_all, lstate, lbcvals, laux):
            n_cells = lmesh.n_cells
            base_p = {k: params_all[k] for k in param_keys}
            base_b = {k: lbcvals[k] for k in bc_keys}

            # spurious 0*inf NaNs the reverse pass deposits on padded
            # dummy/halo rows must not feed back through the scan: the
            # true cotangent of every non-owned CELL row is 0 (the step
            # refreshes them from owners; the sync vjp already routed
            # their contributions back)
            owned = jnp.arange(n_cells) < lmesh.n_owned_cells

            def mask_state(t):
                def mk(a):
                    if a.ndim >= 1 and a.shape[0] == n_cells:
                        m = owned.reshape((n_cells,) + (1,) * (a.ndim - 1))
                        return jnp.where(m, a, 0.0)
                    return a

                return jax.tree.map(mk, t)

            # dead padded interior cells (uneven partitions) are frozen:
            # their functional cotangent is 0
            alive = lmesh.cf_mask.any(axis=0)

            def G(s, p_sub, b_sub):
                new_s, _ = step_t(
                    lmesh, dict(params_all, **p_sub), s,
                    dict(lbcvals, **b_sub),
                )
                return dict(new_s, **{k: s[k] for k in time_keys})

            def J(s, p_sub, b_sub):
                return functional(
                    lmesh, s, dict(params_all, **p_sub),
                    dict(lbcvals, **b_sub), laux,
                )

            gs, gp0, gb0 = jax.grad(J, argnums=(0, 1, 2))(
                lstate, base_p, base_b
            )
            gs = mask_state(gs)
            gs = dict(
                gs,
                velocity=jnp.where(alive[:, None], gs["velocity"], 0.0),
                pressure=jnp.where(alive, gs["pressure"], 0.0),
            )
            _, vjp_G = jax.vjp(G, lstate, base_p, base_b)

            def body(u, _):
                us, _, _ = vjp_G(u)
                return jax.tree.map(jnp.add, mask_state(us), gs), None

            u, _ = jax.lax.scan(body, gs, None, length=niter)
            _, up, ub = vjp_G(u)
            gp = jax.tree.map(jnp.add, up, gp0)
            gb = jax.tree.map(jnp.add, ub, gb0)

            # fold ghost/halo parameter cotangents onto interior owners
            def fold(ref, g):
                def fwd(v_int):
                    v = jnp.zeros(ref.shape, ref.dtype).at[
                        : lmesh.n_interior_cells
                    ].set(v_int)
                    v = maybe_sync(lmesh, v)
                    return bck.extend_to_ghosts(lmesh, v)

                (gi,) = jax.linear_transpose(
                    fwd,
                    jnp.zeros(
                        (lmesh.n_interior_cells,) + tuple(ref.shape[1:]),
                        ref.dtype,
                    ),
                )(g)
                return gi

            out_p = {k: fold(params_all[k], gp[k]) for k in param_keys}
            return out_p, gb

        if self._dist:
            mapped = self._smap_cells(adjoint_fn)
            gp, gb = mapped(mesh, self.params, self.state, bcvals, aux)
            part = self.partition
            out = {k: part.gather_cells(v) for k, v in gp.items()}
            for k in bc_keys:
                out[k] = part.gather_bc(k.split(":")[0], gb[k])
            return out
        gp, gb = jax.jit(adjoint_fn)(
            mesh, self.params, self.state, bcvals, aux
        )
        out = {k: np.asarray(v) for k, v in gp.items()}
        out.update({k: np.asarray(gb[k]) for k in bc_keys})
        return out

    def solve_adjoint(
        self, functional, param_keys=("mu",), bc_keys=(), niter: int = 50
    ) -> dict:
        """Reverse-mode gradient of ``functional(V_interior, p_interior)``
        w.r.t. parameter FIELDS ('mu'/'rho', gradients on interior cells)
        and BC values ('group:entry', per-face arrays) at the converged
        state.  One adjoint sweep for all inputs (the reference's Tangent
        atype is forward-only, models.cpp:10-74).  Use ``niter`` ~ the
        primal SIMPLE iteration count.  Distributed too: the functional
        then sees the shard-local owned-interior values (dead padded
        cells zero) and must be sum-decomposable."""
        wrapped = lambda lmesh, s, params, b, aux: functional(
            s["velocity"][: lmesh.n_interior_cells],
            s["pressure"][: lmesh.n_interior_cells],
        )
        return self._adjoint_grads(wrapped, param_keys, bc_keys, niter)

    def solve_adjoint_force(
        self, group_name, direction=None, param_keys=("mu",),
        bc_keys=(), niter: int = 50,
    ) -> dict:
        """Reverse-mode d(F . direction)/d(params, BCs) on a boundary
        group — the design-optimization complement of
        ``solve_tangent_force``: drag gradients w.r.t. the whole
        viscosity field and every BC knob from one adjoint solve.
        Distributed too: the force functional is evaluated per shard on
        its owned (valid-masked) group faces."""
        mesh = self.mesh
        g = (
            mesh.group_by_name(group_name)
            if isinstance(group_name, str)
            else group_name
        )
        if direction is None:
            direction = [1.0] + [0.0] * (mesh.dim - 1)
        dvec = jnp.asarray(direction, self.params["mu"].dtype)
        sl = mesh.group_faces(g)
        has_gc = "grad_coeff" in self.params
        aux = (
            self.partition.group_valid_mask(g[1]) if self._dist else None
        )

        def functional(lmesh, s, params, b, valid):
            mu = params["mu"]
            mu_f = disc.harmonic_face_gamma(lmesh, mu)
            gradV = (
                gradient(lmesh, params["grad_coeff"], s["velocity"])
                if has_gc
                else None
            )
            dflux = disc.diffusion_flux(lmesh, s["velocity"], mu_f, gradV)
            p_f = assembly.cells_to_faces_distance_weighted(
                lmesh, s["pressure"]
            )
            F = dflux.F + p_f[:, None] * lmesh.face_area
            Fg = F[sl]
            if self._dist:
                Fg = jnp.where(valid[:, None], Fg, 0.0)
            return jnp.dot(jnp.sum(Fg, axis=0), dvec)

        return self._adjoint_grads(
            functional, param_keys, bc_keys, niter, aux=aux
        )

    def advanceCoupled(self, niter: int = 1) -> ResidualHistory:
        """Fully coupled pressure-velocity advance (reference
        FlowModel_impl.h:1474 advanceCoupled)."""
        if not self._initialized:
            raise ConfigError("call init() before advanceCoupled()")
        if self.options.get("coupledLinearSolver") is None:
            if self._dist:
                self.options["coupledLinearSolver"] = BiCGStab(
                    preconditioner=JacobiSolver(sweeps=4),
                    relative_tolerance=1e-3,
                    max_iterations=200,
                )
            else:
                # SIMPLE-type block preconditioner: AMG on the p-p
                # Rhie-Chow Laplacian + block-Jacobi momentum — without
                # it the Jacobi-only inner Krylov grows with mesh size
                # and the coupled path loses to segregated SIMPLE at 1M
                from ..linear.coupled import CoupledSIMPLE

                pre = CoupledSIMPLE(dia=self.mesh.dia)
                pre.setup_structure(*self.mesh.host_cf())
                self.options["coupledLinearSolver"] = BiCGStab(
                    preconditioner=pre,
                    relative_tolerance=1e-3,
                    max_iterations=40,
                )
        if getattr(self, "_step_coupled", None) is None:
            self._step_coupled = self._wrap_step(self._build_coupled_step())
        segregated, self._step = self._step, self._step_coupled
        try:
            return self.advance(niter)
        finally:
            self._step = segregated

    def advanceNewton(self, niter: int = 3) -> ResidualHistory:
        """Exact-Newton (JFNK) endgame on the coupled steady system.

        SIMPLE's asymptotic contraction degrades toward 1 with mesh size
        (measured 0.9998/outer at 1M cells — ~35k outers per decade);
        the Picard-coupled advanceCoupled is no better (~0.998).  This
        solves the same root QUADRATICALLY: the full nonlinear residual
        R(V, p) — momentum with the convection flux evaluated at the
        CURRENT Rhie-Chow mass flux mdot(V, p), continuity on that same
        flux, boundary-ghost closures as residual rows (the JFNK pattern
        of structure/plate/battery) — with the exact Jacobian action by
        jax.jvp and the assembled Picard block matrix (CoupledSIMPLE AMG
        preconditioner) preconditioning the matrix-free BiCGStab.

        The Rhie-Chow dissipation scale vol/aP is FROZEN at the entry
        state's relaxed momAp: the converged solution depends on it
        (reference behavior, FlowModel_impl.h Rhie-Chow), so freezing
        keeps the Newton root identical to the SIMPLE fixed point while
        making R a pure function of (V, p).  Intended use: run SIMPLE
        into the asymptotic basin (rel ~1e-4), then 1-3 Newton steps
        finish to round-off (each inner iteration costs ~2 residual
        evaluations ~= 1 SIMPLE step).

        Single-device only (the endgame runs on the unsharded state).
        """
        if not self._initialized:
            raise ConfigError("call init() before advanceNewton()")
        if self.options["transient"]:
            raise ConfigError("advanceNewton: steady states only")
        if "momAp" not in self.state:
            raise ConfigError(
                "advanceNewton: run advance() first (needs the relaxed "
                "momAp for the frozen Rhie-Chow scale)"
            )
        if getattr(self, "_newton_pre", None) is None and not self._dist:
            from ..linear.coupled import CoupledSIMPLE

            # momentum="amg": the unrelaxed Newton momentum block is
            # elliptic, so the diagonal predictor degrades like
            # sqrt(kappa) with resolution (measured: inner BiCGStab
            # makes NO progress at 256^2+ with block-Jacobi momentum)
            pre = CoupledSIMPLE(dia=self.mesh.dia, momentum="amg")
            pre.setup_structure(*self.mesh.host_cf())
            self._newton_pre = pre
        chunk_its = int(self.options.get("newtonChunkIterations") or 0)
        if chunk_its > 0 and not self._dist:
            # Chunked inner Krylov: each chunk is its own device program
            # (warm-restarted BiCGStab on the fixed Newton system).  The
            # axon TPU worker kills long-running programs — a 1500-
            # iteration inner while_loop crashes it from 512^2 up
            # (measured; 400 iterations at 512^2 is fine) — so at scale
            # the inner solve MUST return to the host periodically.
            if getattr(self, "_step_newton_chunk", None) is None:
                self._step_newton_chunk = jax.jit(
                    self._build_newton_step(mode="chunk")
                )
                self._step_newton_finish = jax.jit(
                    self._build_newton_step(mode="finish")
                )
                self._step_newton_resid = jax.jit(
                    self._build_newton_step(mode="resid")
                )
            kit = int(self.options["newtonKrylovIterations"])
            bcvals = self._resolve_bcvals()
            hist = ResidualHistory()
            dtype = self.state["velocity"].dtype
            B = self.mesh.dim + 1
            nc = self.mesh.n_cells
            # mixed-precision inner solve (see newtonInnerPrecision in
            # the options table): Jacobian matvecs + preconditioner run
            # on a cast view of (mesh, params, state); the rhs comes
            # from the full-precision "resid" program.  The cast mesh
            # shares every static index table (DIA/gather machinery is
            # dtype-free int32) — only float leaves are re-created, once.
            prec = self.options.get("newtonInnerPrecision")
            inner_dt = jnp.dtype(prec) if prec else jnp.dtype(dtype)
            mixed = inner_dt != jnp.dtype(dtype)
            if mixed:
                # cache keyed on mesh/params IDENTITY, holding the keyed
                # objects alive: a rebuilt mesh or params
                # (set_immersed_boundary, vc change + re-init) must
                # invalidate the cast views or the inner Jacobian silently
                # disagrees with the f64 rhs; raw id() keys could collide
                # after garbage collection reuses an address
                views = getattr(self, "_newton_views", None)
                if (
                    views is None
                    or views[0] != inner_dt
                    or views[1] is not self.mesh
                    or views[2] is not self.params
                ):
                    views = (
                        inner_dt,
                        self.mesh,
                        self.params,
                        _cast_floats(self.mesh, inner_dt),
                        _cast_floats(self.params, inner_dt),
                    )
                    self._newton_views = views
                mesh_i, params_i = views[3], views[4]
            else:
                mesh_i, params_i = self.mesh, self.params
            # inexact-Newton forcing schedule: "ew" (default) adapts the
            # inner tolerance per step (Eisenstat-Walker choice 2,
            # eta_k = 0.9 (|r_k|/|r_{k-1}|)^2 with the standard
            # oversolve safeguard), clipped to [newtonKrylovTolerance,
            # newtonForcingMax].  Early steps are limited by the
            # nonlinearity (measured at 1M: contraction ~ 100 x rel per
            # step), so solving the linear system below that is pure
            # waste — the fixed 1e-3 schedule spent ~14k inner
            # iterations where the adaptive one needs a fraction.
            forcing = str(self.options.get("newtonForcing") or "ew")
            eta_max = float(self.options.get("newtonForcingMax") or 0.1)
            ktol = float(self.options["newtonKrylovTolerance"])
            target_abs = self.options.get("newtonTargetResidual")
            prev_norm = None
            eta_prev = None
            self._newton_trace = []  # per-step diagnostics (bench)
            import time as _time

            if self.options.get("newtonRefreeze"):
                # refreeze the relaxed momAp (and the Rhie-Chow mass
                # flux) at the CURRENT state before the first step: a
                # state restored from a lower-precision phase carries a
                # stale aP, and the first frozen-aP Jacobian then
                # mismatches the rhs (measured at 1M: step 1 contracts
                # 1.5-2.3x vs ~11x for step 2 at the same eta).  Reuses
                # the "finish" program with dq = 0 — no extra compile.
                self.state, _ = self._step_newton_finish(
                    self.mesh, self.params, self.state, bcvals,
                    jnp.zeros((nc, B), dtype),
                )

            for it in range(niter):
                t_step = _time.time()
                # Newton rhs in the MODEL dtype (f64 for the endgame):
                # at the f32 floor the residual is pure representation
                # noise in f32, so it must never be evaluated there
                r0, aux0 = self._step_newton_resid(
                    self.mesh, self.params, self.state, bcvals
                )
                mom0 = float(aux0["mom_norm"])
                cont0 = float(aux0["cont_norm"])
                if target_abs is not None and mom0 < float(target_abs):
                    # post-update residual of the PREVIOUS step already
                    # meets the caller's target: stop before paying for
                    # another inner solve (the old loop always overshot
                    # by one full Newton step)
                    hist.append((it, mom0, cont0))
                    self._log_iteration(
                        f"{self.name}: newton {it}: {mom0:.6e} (target met)"
                    )
                    break
                norm_k = (mom0**2 + cont0**2) ** 0.5
                if forcing == "ew":
                    if prev_norm is None or prev_norm == 0.0:
                        eta = eta_max
                    else:
                        eta = 0.9 * (norm_k / prev_norm) ** 2
                        if eta_prev is not None:
                            eta = max(eta, 0.9 * eta_prev**2)
                        eta = min(max(eta, ktol), eta_max)
                    if target_abs is not None and mom0 > 0.0:
                        # oversolve protection at the finish line: the
                        # step only needs contraction target/|r| — don't
                        # drive the inner solve decades past it
                        # (measured: the final 1M step burned 1733 its
                        # at eta 1e-3 landing 2e-8 when 1e-6 was asked)
                        eta = min(
                            max(eta, 0.5 * float(target_abs) / mom0),
                            eta_max,
                        )
                else:
                    eta = ktol
                prev_norm, eta_prev = norm_k, eta
                if mixed:
                    state_i = _cast_floats(self.state, inner_dt)
                    bcvals_i = _cast_floats(bcvals, inner_dt)
                    r0_i = r0.astype(inner_dt)
                else:
                    state_i, bcvals_i, r0_i = self.state, bcvals, r0
                # zero placeholder with the inner solver's carry
                # structure — overwritten in-graph on the fresh chunk
                inner_name = str(
                    self.options.get("newtonInnerSolver") or "bicgstab"
                ).lower()
                tmpl_solver = (
                    GMRES(restart=int(
                        self.options.get("newtonGmresRestart") or 32
                    ))
                    if inner_name == "gmres"
                    else BiCGStab()
                )
                kcarry = tmpl_solver.carry_template((nc, B), inner_dt)
                if kit <= 0:
                    raise ConfigError(
                        "advanceNewton: newtonKrylovIterations must be > 0"
                    )
                fresh = True
                dq = jnp.zeros((nc, B), inner_dt)
                tot = 0
                rel = float("nan")
                prev_rel = None
                stalled = 0
                eta_i = jnp.asarray(eta, inner_dt)
                while tot < kit:
                    prev_tot = tot
                    (dq, kcarry), aux = self._step_newton_chunk(
                        mesh_i, params_i, state_i, bcvals_i, r0_i,
                        kcarry, jnp.asarray(fresh), eta_i,
                    )
                    fresh = False
                    tot = int(aux["inner_it"])  # global across chunks
                    rel = float(aux["inner_rel"])
                    if self.options.get("newtonVerboseInner"):
                        import sys as _sys

                        print(
                            f"# newton inner: {tot} its rel {rel:.3e}",
                            file=_sys.stderr,
                        )
                    if bool(aux["converged"]) or not (rel == rel):
                        break
                    if tot == prev_tot:
                        # the chunk while_loop exited without advancing
                        # the iteration counter (finite-ratio divergence
                        # guard tripped): repeating the chunk would spin
                        # forever on the same best iterate
                        break
                    # inner noise floor, MIXED precision only (the f32
                    # matvec round-off bounds the achievable inner
                    # residual at ~1e-3-1e-4 relative; an all-f64 inner
                    # solve has no such floor and a BiCGStab non-monotone
                    # plateau must not cut it short of the tolerance):
                    # two consecutive chunks with <10% progress AFTER
                    # real progress has been made (rel < 0.1 — the
                    # transient can sit above 1 for hundreds of
                    # iterations) -> accept the current iterate; the
                    # next Newton step recomputes the rhs in f64 and is
                    # self-correcting
                    if (
                        mixed
                        and rel < 0.1
                        and prev_rel is not None
                        and rel > 0.9 * prev_rel
                    ):
                        stalled += 1
                        if stalled >= 2:
                            break
                    else:
                        stalled = 0
                    prev_rel = rel
                self.state, _ = self._step_newton_finish(
                    self.mesh, self.params, self.state, bcvals,
                    dq.astype(dtype),
                )
                self._last_aux = {
                    "newton_inner": tot,
                    "newton_inner_rel": rel,
                }
                self._newton_trace.append(
                    {
                        "entry_mom": mom0,
                        "eta": eta,
                        "inner_its": tot,
                        "inner_rel": rel,
                        "s": round(_time.time() - t_step, 1),
                    }
                )
                hist.append((it, mom0, cont0))
                self._log_iteration(
                    f"{self.name}: newton {it}: {mom0:.6e}"
                    f" (inner {tot} its to {rel:.1e}, eta {eta:.1e})"
                )
            return hist
        if self.options.get("newtonInnerPrecision"):
            raise ConfigError(
                "newtonInnerPrecision needs the single-device chunked "
                "path (set newtonChunkIterations > 0): the one-program "
                "Newton step computes its rhs in the inner precision, "
                "which is exactly the f32-floor failure the mixed mode "
                "exists to avoid"
            )
        if getattr(self, "_step_newton", None) is None:
            self._step_newton = self._wrap_step(self._build_newton_step())
        segregated, self._step = self._step, self._step_newton
        accel = self.options.get("acceleration")
        self.options["acceleration"] = None  # never Anderson-mix Newton
        try:
            return self.advance(niter)
        finally:
            self._step = segregated
            self.options["acceleration"] = accel

    def _build_newton_step(self, mode="full"):
        """``mode``: "full" = one program (residual + inner solve +
        update); "resid" = evaluate the Newton rhs only, signature
        step(mesh, params, state, bcvals) -> (r0, aux) (run once per
        Newton step, in the model dtype); "chunk" = inner-Krylov chunk
        only, signature step(mesh, params, state, bcvals, r0, kcarry,
        fresh) -> ((dq, kcarry), aux) with a warm-restarted BiCGStab
        capped at newtonChunkIterations (the axon TPU worker kills
        programs that run too long — a 1500-iteration inner while_loop
        at 512^2+ is a worker crash; chunked restarts keep each program
        bounded); under newtonInnerPrecision the chunk program is traced
        on f32-cast views with the f64 rhs cast down; "finish" = apply
        a solved dq, signature step(mesh, params, state, bcvals, dq) ->
        (new_state, aux)."""
        from ..ops import bell
        from ..linear.base import MatrixFreeOperator, newton_operator
        from ..linear.coupled import CoupledSIMPLE  # noqa: F401 (docs)

        opts = self.options
        ktol = float(opts["newtonKrylovTolerance"])
        kit = (
            int(opts.get("newtonChunkIterations") or 0)
            if mode == "chunk"
            else int(opts["newtonKrylovIterations"])
        )
        # single-device: CoupledSIMPLE (AMG pressure block); distributed:
        # block-Jacobi sweeps on the Picard surrogate (the dist coupled
        # default — dist AMG inside a traced block preconditioner is a
        # future extension)
        pre = getattr(self, "_newton_pre", None)

        class _FixedM:
            """Pre-bound preconditioner (the Krylov operator is matrix-
            free; M was built from the assembled Picard surrogate)."""

            def __init__(self, M):
                self._M = M

            def precond_setup(self, A):
                return self._M

        def step(mesh, params, state, bcvals, *extra):
            dim = mesh.dim
            B = dim + 1
            n_int = mesh.n_interior_cells
            int_c = jnp.arange(mesh.n_cells) < n_int
            owned = jnp.arange(mesh.n_cells) < mesh.n_owned_cells
            bnd = jnp.arange(mesh.n_faces) >= mesh.n_interior_faces
            gh = slice(n_int, mesh.n_cells)

            state = dict(
                state,
                velocity=maybe_sync(mesh, state["velocity"]),
                pressure=maybe_sync(mesh, state["pressure"]),
            )
            state = self._refresh_ghosts(mesh, params, state, bcvals)

            # ---- frozen Rhie-Chow scale (see advanceNewton docstring)
            aP = state["momAp"]
            vol_over_ap = jnp.where(int_c, mesh.cell_volume / aP, 0.0)
            vol_over_ap = maybe_sync(mesh, vol_over_ap)
            voap_f = assembly.cells_to_faces_distance_weighted(
                mesh, bck.extend_to_ghosts(mesh, vol_over_ap)
            )
            rho_f = assembly.cells_to_faces_distance_weighted(
                mesh, params["rho"]
            )
            Df = rho_f * voap_f * mesh.face_e_over_d

            pres_face = jnp.zeros(mesh.n_faces, bool)
            for g, bc in self._group_bcs():
                if bc.bc_type == "PressureBoundary":
                    sl = mesh.group_faces(g)
                    pres_face = pres_face.at[sl].set(True)

            mu_f = disc.harmonic_face_gamma(mesh, params["mu"])
            needs_gradV = (not mesh.orthogonal) or (
                opts["convectionScheme"] == "sou"
            )
            wo = mesh.face_wo

            def mdot_of(st):
                V, p = st["velocity"], st["pressure"]
                Vbar = assembly.cells_to_faces_distance_weighted(mesh, V)
                gradp = maybe_sync(mesh, self._grad(mesh, params, p))
                gpbar = assembly.cells_to_faces_distance_weighted(
                    mesh, gradp
                )
                dp = mesh.take_nbr(p) - mesh.take_owner(p)
                rc = Df * (
                    dp - jnp.einsum("fd,fd->f", gpbar, mesh.face_ds)
                )
                mdot_int = (
                    rho_f * jnp.einsum("fd,fd->f", Vbar, mesh.face_area)
                    - rc
                )
                bmdot = self._boundary_mass_flux(mesh, params, st, bcvals)
                return jnp.where(bnd, bmdot, mdot_int)

            def fluxes_of(q):
                q = maybe_sync(mesh, q)
                V = q[:, :dim]
                p = q[:, dim]
                st = dict(state, velocity=V, pressure=p)
                mdot = mdot_of(st)
                gradV = (
                    maybe_sync(mesh, self._grad(mesh, params, V))
                    if needs_gradV
                    else None
                )
                flux = disc.diffusion_flux(mesh, V, mu_f, gradV)
                flux = flux + disc.convection_flux(
                    mesh, V, mdot, opts["convectionScheme"], gradV
                )
                p_f = wo * mesh.take_owner(p) + (1.0 - wo) * mesh.take_nbr(p)
                F_mom = flux.F + p_f[:, None] * mesh.face_area
                return st, mdot, flux, F_mom

            def R(q):
                st, mdot, _, F_mom = fluxes_of(q)
                F_blk = jnp.concatenate([F_mom, mdot[:, None]], axis=1)
                s = jnp.where(mesh.cf_is_owner, 1.0, -1.0)[:, :, None]
                m = mesh.cf_mask[:, :, None]
                r = -jnp.sum(
                    jnp.where(m, s * mesh.take_faces(F_blk), 0.0), axis=0
                )
                # ghost closure rows (JFNK: ghosts are unknowns tied by
                # their BC closures, like structure/plate/battery)
                stg = self._refresh_ghosts(mesh, params, st, bcvals)
                qg = jnp.concatenate(
                    [stg["velocity"], stg["pressure"][:, None]], axis=1
                )
                r = jnp.where(int_c[:, None], r, qg - q)
                return jnp.where(owned[:, None], r, 0.0)

            q0 = jnp.concatenate(
                [state["velocity"], state["pressure"][:, None]], axis=1
            )
            if mode == "chunk":
                # the rhs is supplied by the caller (computed ONCE per
                # Newton step by the "resid" program — in the model
                # dtype, so a mixed-precision inner solve still sees the
                # true residual, not its f32 representation noise) and
                # stays fixed across chunks: saves one residual
                # evaluation per chunk vs recomputing it here.  ``eta``
                # is the inexact-Newton forcing tolerance — a DYNAMIC
                # argument so the Eisenstat-Walker adaptive schedule
                # (advanceNewton) reuses one compiled program
                (r0, kcarry, fresh, eta) = extra
            elif mode == "finish":
                r0 = None
            else:
                r0 = R(q0)
            if r0 is not None:
                mom_norm = jnp.sqrt(gsum(
                    mesh,
                    jnp.sum(
                        jnp.where(int_c[:, None], r0[:, :dim], 0.0) ** 2
                    ),
                ))
                cont_norm = jnp.sqrt(gsum(
                    mesh, jnp.sum(jnp.where(int_c, r0[:, dim], 0.0) ** 2)
                ))
            else:  # finish applies an externally solved dq; norms unused
                mom_norm = cont_norm = jnp.zeros((), q0.dtype)

            if mode == "resid":
                return r0, {"mom_norm": mom_norm, "cont_norm": cont_norm}

            if mode == "finish":
                # apply an externally solved Newton increment (chunked
                # inner Krylov ran in separate programs)
                (dq,) = extra
                dq = jnp.where(owned[:, None], dq, 0.0)
                if not self._has_pressure_bc:
                    pc = dq[:, dim]
                    num = gsum(mesh, jnp.sum(jnp.where(int_c, pc, 0.0)))
                    den = gsum(mesh, jnp.sum(int_c.astype(pc.dtype)))
                    dq = dq.at[:, dim].add(-num / den)
                q1 = maybe_sync(mesh, q0 + dq)
                st1 = dict(
                    state, velocity=q1[:, :dim], pressure=q1[:, dim]
                )
                st1 = self._refresh_ghosts(mesh, params, st1, bcvals)
                new_state = dict(st1)
                new_state["massFlux"] = mdot_of(st1)
                _, mdot1, flux1, F_mom1 = fluxes_of(q1)
                A_m1, _ = assembly.assemble(
                    mesh, FaceFlux(F_mom1, flux1.dF_dO, flux1.dF_dN)
                )
                urf_v = float(opts["momentumURF"])
                new_state["momAp"] = jnp.where(
                    int_c, A_m1.diag / urf_v, A_m1.diag
                )
                return new_state, {
                    "mom_norm": mom_norm, "cont_norm": cont_norm
                }

            # ---- Picard block surrogate for the preconditioner (same
            # construction as _build_coupled_step, urf = 1: Newton solves
            # the unrelaxed equations)
            _, mdot0, flux0, F_mom0 = fluxes_of(q0)
            I_d = jnp.eye(dim, dtype=q0.dtype)
            dO_vv = flux0.dF_dO[:, None, None] * I_d
            dN_vv = flux0.dF_dN[:, None, None] * I_d
            dO_vp = wo[:, None] * mesh.face_area
            dN_vp = (1.0 - wo)[:, None] * mesh.face_area
            Df_cont = jnp.where(bnd & ~pres_face, 0.0, Df)
            wV_O = jnp.where(bnd, jnp.where(pres_face, 1.0, 0.0), wo)
            wV_N = jnp.where(bnd, 0.0, 1.0 - wo)
            dO_pv = (rho_f * wV_O)[:, None] * mesh.face_area
            dN_pv = (rho_f * wV_N)[:, None] * mesh.face_area
            dO_p = jnp.concatenate([dO_pv, Df_cont[:, None]], axis=1)
            dN_p = jnp.concatenate([dN_pv, -Df_cont[:, None]], axis=1)
            dO = jnp.concatenate(
                [
                    jnp.concatenate([dO_vv, dO_vp[:, :, None]], axis=2),
                    dO_p[:, None, :],
                ],
                axis=1,
            )
            dN = jnp.concatenate(
                [
                    jnp.concatenate([dN_vv, dN_vp[:, :, None]], axis=2),
                    dN_p[:, None, :],
                ],
                axis=1,
            )
            F_blk0 = jnp.concatenate([F_mom0, mdot0[:, None]], axis=1)
            A_b, _ = bell.assemble_block(mesh, F_blk0, dO, dN)
            eyeB = jnp.eye(B, dtype=q0.dtype)
            A_b = A_b.replace(
                diag=A_b.diag.at[gh].set(eyeB), off=A_b.off.at[:, gh].set(0.0)
            )
            if not self._has_pressure_bc:
                A_b = A_b.replace(
                    diag=A_b.diag.at[:, dim, dim].mul(
                        1.0 + 1e6 * params["pin_mask"]
                    )
                )

            op = MatrixFreeOperator(newton_operator(R, q0), A_b)
            if pre is not None:
                M = pre.precond_setup(A_b)
            else:
                M = JacobiSolver(sweeps=4).precond_setup(A_b)
            # rho-breakdown shadow restarts (see linear/krylov._stall_tol)
            # are REQUIRED for the reduced-precision inner solve: in f32
            # the shadow-vector orthogonality <rhat, r> drowns in
            # round-off within a few hundred iterations on the 256^2+
            # coupled system and BiCGStab then bounces at O(10) x |r0|
            # indefinitely (measured; the f64 solve exits its transient
            # by ~250 its on the same system and never needs this)
            stall = self.options.get("newtonStallRestart")
            if stall is None:
                stall = bool(self.options.get("newtonInnerPrecision"))
            inner_name = str(
                self.options.get("newtonInnerSolver") or "bicgstab"
            ).lower()
            if inner_name == "gmres":
                solver = GMRES(
                    preconditioner=_FixedM(M),
                    relative_tolerance=ktol,
                    max_iterations=kit,
                    restart=int(
                        self.options.get("newtonGmresRestart") or 32
                    ),
                )
            elif inner_name == "bicgstab":
                solver = BiCGStab(
                    preconditioner=_FixedM(M),
                    relative_tolerance=ktol,
                    max_iterations=kit,
                    stall_restart=bool(stall),
                )
            else:
                raise ConfigError(
                    f"newtonInnerSolver: unknown {inner_name!r} "
                    "(bicgstab | gmres)"
                )
            if mode == "chunk":
                # continue the SAME BiCGStab iteration across device-
                # program boundaries: the full Krylov state (shadow
                # vector, search directions) rides the carry, so the
                # chunked iteration is exactly the single-program one —
                # a plain warm restart loses the transient and never
                # advances across small chunks (measured)
                init = solver.init_carry(op, r0, jnp.zeros_like(r0))
                kcarry = jax.tree.map(
                    lambda a, b: jnp.where(fresh, a, b), init, kcarry
                )
                rn_b = jnp.maximum(kcarry[-1], 1e-300)
                dq, kstats, kcarry = solver.solve_chunk(
                    op, kcarry, eta * rn_b
                )
                dq = jnp.where(owned[:, None], dq, 0.0)
                return (dq, kcarry), {
                    "mom_norm": mom_norm,
                    "cont_norm": cont_norm,
                    "inner_it": kstats.iterations,
                    "inner_rel": kstats.residual / rn_b,
                    "converged": kstats.converged,
                }
            dq, kstats = solver.solve_fn(op, r0, jnp.zeros_like(r0))
            dq = jnp.where(owned[:, None], dq, 0.0)
            if not self._has_pressure_bc:
                # J is exactly singular along constant pressure; project
                # the step onto zero-mean pressure (as the coupled step
                # does for its correction)
                pc = dq[:, dim]
                num = gsum(mesh, jnp.sum(jnp.where(int_c, pc, 0.0)))
                den = gsum(mesh, jnp.sum(int_c.astype(pc.dtype)))
                dq = dq.at[:, dim].add(-num / den)
            q1 = maybe_sync(mesh, q0 + dq)
            st1 = dict(
                state, velocity=q1[:, :dim], pressure=q1[:, dim]
            )
            st1 = self._refresh_ghosts(mesh, params, st1, bcvals)
            new_state = dict(st1)
            new_state["massFlux"] = mdot_of(st1)
            # refreeze the relaxed momAp at the NEW state: the Newton
            # root depends (weakly, through the Rhie-Chow dissipation) on
            # the frozen aP, so successive steps form an outer fixed
            # point on aP that converges to the exact SIMPLE solution
            _, mdot1, flux1, F_mom1 = fluxes_of(q1)
            A_m1, _ = assembly.assemble(
                mesh, FaceFlux(F_mom1, flux1.dF_dO, flux1.dF_dN)
            )
            urf_v = float(opts["momentumURF"])
            new_state["momAp"] = jnp.where(
                int_c, A_m1.diag / urf_v, A_m1.diag
            )
            return new_state, {
                "mom_norm": mom_norm,
                "cont_norm": cont_norm,
                # inner-Krylov diagnostics (device scalars; read via
                # model._last_aux after a step when tuning)
                "newton_inner": kstats.iterations,
                "newton_inner_rel": kstats.residual
                / jnp.maximum(kstats.residual0, 1e-300),
            }

        return step

    # ------------------------------------------------------------------

    def _build_aa_apply(self):
        from ..linear.anderson import Anderson

        aa = Anderson(
            depth=int(self.options.get("andersonDepth", 4)),
            damping=float(self.options.get("andersonDamping", 1.0)),
        )
        keys = ("velocity", "pressure", "massFlux")

        def apply(astate, old_state, new_state):
            x_old = jnp.concatenate([old_state[k].ravel() for k in keys])
            g_new = jnp.concatenate([new_state[k].ravel() for k in keys])
            x_acc, astate = aa.mix(astate, x_old, g_new)
            out = dict(new_state)
            off = 0
            for k in keys:
                sz = new_state[k].size
                out[k] = x_acc[off:off + sz].reshape(new_state[k].shape)
                off += sz
            return out, astate

        n = sum(int(self.state[k].size) for k in keys)
        dtype = self.state["pressure"].dtype
        return jax.jit(apply), aa.init_state(n, dtype)

    def _build_chunk_step_flow(self, step, chunk: int):
        """Flow variant of Model._build_chunk_step: carries the dual
        (momentum, continuity) norms and their tolerance test inside the
        device-resident outer while_loop (see base.py for the rationale;
        the reference's SIMPLE loop, FlowModel_impl.h:1433, likewise
        checks convergence without a per-iteration host sync)."""

        def chunk_step(mesh, params, state, bcvals, scal):
            nmax = scal["nmax"]
            mtol, ctol, atol = scal["mtol"], scal["ctol"], scal["atol"]
            st, aux0 = step(mesh, params, state, bcvals)
            mn0, cn0 = aux0["mom_norm"], aux0["cont_norm"]
            tiny = jnp.asarray(jnp.finfo(mn0.dtype).tiny, mn0.dtype)
            m0 = jnp.where(
                scal["mnorm0"] > 0,
                scal["mnorm0"].astype(mn0.dtype),
                jnp.maximum(mn0, tiny),
            )
            c0 = jnp.where(
                scal["cnorm0"] > 0,
                scal["cnorm0"].astype(cn0.dtype),
                jnp.maximum(cn0, tiny),
            )
            hist = (
                jnp.full((chunk, 2), jnp.nan, mn0.dtype)
                .at[0]
                .set(jnp.stack([mn0, cn0]))
            )

            def converged(mn, cn):
                return ((mn / m0 < mtol) & (cn / c0 < ctol)) | (
                    jnp.maximum(mn, cn) < atol
                )

            def cond(c):
                i, st, aux, hist, done = c
                return (i < nmax) & jnp.logical_not(done)

            def body(c):
                i, st, aux, hist, done = c
                st, aux = step(mesh, params, st, bcvals)
                mn, cn = aux["mom_norm"], aux["cont_norm"]
                hist = hist.at[i].set(jnp.stack([mn, cn]))
                return (i + 1, st, aux, hist, converged(mn, cn))

            i, st, aux, hist, done = jax.lax.while_loop(
                cond,
                body,
                (jnp.int32(1), st, aux0, hist, converged(mn0, cn0)),
            )
            return st, {
                "last_aux": aux,
                "hist": hist,
                "count": i,
                "m0": m0,
                "c0": c0,
                "done": done,
            }

        return chunk_step

    def _advance_chunked_flow(self, niter: int, chunk: int, bcvals):
        opts = self.options
        runners = getattr(self, "_chunk_runners", None)
        if runners is None:
            runners = {}
            self._chunk_runners = runners
        runner = runners.get(chunk)
        if runner is None:
            runner = self._wrap_chunk_step(
                self._build_chunk_step_flow(self._step_raw, chunk)
            )
            runners[chunk] = runner
        hist = ResidualHistory()
        it0 = 0
        while it0 < niter:
            m0, c0 = self._norm0 or (0.0, 0.0)
            scal = {
                "nmax": np.int32(min(chunk, niter - it0)),
                "mtol": np.float64(opts["momentumTolerance"]),
                "ctol": np.float64(opts["continuityTolerance"]),
                "atol": np.float64(opts["absoluteTolerance"]),
                "mnorm0": np.float64(m0),
                "cnorm0": np.float64(c0),
            }
            with self._phase("step"):
                self.state, aux = runner(
                    self.mesh, self.params, self.state, bcvals, scal
                )
            cnt = int(aux["count"])
            rns = np.asarray(aux["hist"][:cnt])
            if self._norm0 is None:
                self._norm0 = (float(aux["m0"]), float(aux["c0"]))
            self._last_aux = aux["last_aux"]
            for j in range(cnt):
                self._guard_residual(float(rns[j, 0]), it0 + j)
                hist.append((it0 + j, float(rns[j, 0]), float(rns[j, 1])))
                self._log_iteration(
                    f"{self.name}: {it0 + j}: mom {rns[j, 0]:.6e} "
                    f"cont {rns[j, 1]:.6e}"
                )
            it0 += cnt
            if bool(aux["done"]):
                break
        return hist

    def advance(self, niter: int = 1) -> ResidualHistory:
        if not self._initialized:
            raise ConfigError("call init() before advance()")
        opts = self.options
        hist = ResidualHistory()
        bcvals = self._resolve_bcvals()
        accel = str(opts.get("acceleration") or "").lower() == "anderson"
        if accel and getattr(self, "_aa_apply", None) is None:
            self._aa_apply, self._aa_state = self._build_aa_apply()
            self._aa_iter = 0
            self._aa_anchor = None
        aa_delay = int(opts.get("andersonDelay", 5)) if accel else 0
        aa_int = max(int(opts.get("andersonInterval", 1)), 1) if accel else 1
        # residualSync=False: keep residual norms as device scalars and skip
        # per-iteration convergence checks — every float() here is a host
        # round trip (~30 ms on the TPU tunnel), which would dominate a
        # ~100 ms step.  Callers own the final sync.
        sync = bool(opts.get("residualSync", True)) or bool(opts["verbose"])
        chunk = int(opts.get("outerChunk") or 0)
        if (
            chunk > 1
            and niter > 1
            and not accel
            and sync
            and getattr(self, "_step_raw", None)
        ):
            return self._advance_chunked_flow(niter, chunk, bcvals)
        for it in range(niter):
            self.state, aux = self._step(self.mesh, self.params, self.state, bcvals)
            self._last_aux = aux
            if accel:
                self._aa_iter += 1
                if self._aa_iter == aa_delay or (
                    self._aa_anchor is None and self._aa_iter >= aa_delay
                ):
                    self._aa_anchor = self.state
                elif self._aa_iter > aa_delay and (
                    (self._aa_iter - aa_delay) % aa_int == 0
                ):
                    # anchor = state at the previous mix: Anderson acts on
                    # the K-step composite fixed-point map
                    self.state, self._aa_state = self._aa_apply(
                        self._aa_state, self._aa_anchor, self.state
                    )
                    self._aa_anchor = self.state
            if not sync:
                hist.append((it, aux["mom_norm"], aux["cont_norm"]))
                continue
            mom_norm = float(aux["mom_norm"])
            cont_norm = float(aux["cont_norm"])
            self._guard_residual(mom_norm, it)
            if self._norm0 is None:
                self._norm0 = (max(mom_norm, 1e-300), max(cont_norm, 1e-300))
            hist.append((it, mom_norm, cont_norm))
            self._log_iteration(
                f"{self.name}: {it}: mom {mom_norm:.6e} cont {cont_norm:.6e}"
            )
            if (
                mom_norm / self._norm0[0] < opts["momentumTolerance"]
                and cont_norm / self._norm0[1] < opts["continuityTolerance"]
            ) or max(mom_norm, cont_norm) < opts["absoluteTolerance"]:
                break
        return hist

    def updateTime(self):
        if not self.options["transient"]:
            raise ConfigError("FlowModel: transient option is off")
        if "velocity_N2" in self.state:
            self.state["velocity_N2"] = self.state["velocity_N1"]
        self.state["velocity_N1"] = self.state["velocity"]

    # ------------------------------------------------------------------

    def getVelocity(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["velocity"])
        return np.asarray(self.state["velocity"][: self.mesh.n_interior_cells])

    def getPressure(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["pressure"])
        return np.asarray(self.state["pressure"][: self.mesh.n_interior_cells])

    def dumpContinuityMatrix(self, prefix: str) -> None:
        """Write the current pressure-correction system as MatrixMarket
        files ``<prefix>.mtx`` / ``<prefix>_rhs.mtx`` (reference:
        FlowModel_impl.h:1560 dumpContinuityMatrix; read back with
        io.read_matrix_market for solver debugging)."""
        from ..io.matrixmarket import write_matrix_market

        if self._dist:
            raise ConfigError("dumpContinuityMatrix: single-device only")
        mesh = self.mesh
        interior_cells = jnp.arange(mesh.n_cells) < mesh.n_interior_cells
        bnd = jnp.arange(mesh.n_faces) >= mesh.n_interior_faces
        aP = self.state["momAp"]
        rho_f = assembly.cells_to_faces_distance_weighted(
            mesh, self.params["rho"]
        )
        vol_over_ap = jnp.where(
            interior_cells, mesh.cell_volume / aP, 0.0
        )
        voap_f = assembly.cells_to_faces_distance_weighted(
            mesh, bck.extend_to_ghosts(mesh, vol_over_ap)
        )
        Df = rho_f * voap_f * mesh.face_e_over_d
        pres_face = jnp.zeros(mesh.n_faces, bool)
        for g, bc in self._group_bcs():
            if bc.bc_type == "PressureBoundary":
                sl = mesh.group_faces(g)
                pres_face = pres_face.at[sl].set(True)
        Df_cont = jnp.where(bnd & ~pres_face, 0.0, Df)
        cont_flux = assembly.FaceFlux(
            F=self.state["massFlux"], dF_dO=Df_cont, dF_dN=-Df_cont
        )
        Ap, rp = assembly.assemble(mesh, cont_flux)
        gh = slice(mesh.n_interior_cells, mesh.n_cells)
        Ap = Ap.replace(
            diag=Ap.diag.at[gh].set(1.0), off=Ap.off.at[:, gh].set(0.0)
        )
        rp = rp.at[gh].set(0.0)
        write_matrix_market(prefix + ".mtx", Ap, rp)

    def set_immersed_boundary(self, mask, velocity, solid_mask=None,
                              stencil=None) -> None:
        """Immersed moving body in the flow (reference: IBM flow pipeline,
        scripts/IBMSetup.py + GenericIBDiscretization.h).

        ``mask``: cells pinned to the body velocity; ``velocity``: (dim,)
        or (n, dim) body velocity; ``solid_mask``: strictly-solid cells —
        their pressure rows decouple and faces touching them carry no
        correction flux (the body surface is the ``ib_faces`` integration
        surface for getIBForceIntegral); ``stencil``:
        IBManager.interpolation_stencil() — the IB band's MOMENTUM rows
        become implicit wall/fluid interpolation rows (the reference's
        GenericIBDiscretization on momentum), which moves the effective
        no-slip surface from the pinned-cell staircase to the true body
        surface.  With a stencil, pass ``mask = solid_mask`` (solid cells
        pinned; the band is constrained by the stencil rows instead)."""
        mesh = self.mesh
        dim = mesh.dim
        n_int = (
            self.partition.mesh.n_interior_cells
            if self._dist
            else mesh.n_interior_cells
        )
        v = np.asarray(velocity, dtype=np.float64)
        v = np.broadcast_to(v, (n_int, dim)).copy()
        self._set_immersed_boundary(mask, v, stencil=stencil)
        if solid_mask is None:
            return
        dtype = mesh.cell_volume.dtype
        if self._dist:
            hm = self.partition.mesh
            sm_g = np.zeros(hm.n_cells, bool)
            smarr = np.asarray(solid_mask, bool)
            sm_g[: len(smarr)] = smarr
            sm = np.asarray(self.partition.scatter_cells(sm_g))
            owner = np.asarray(mesh.face_cell0)
            nbr = np.asarray(mesh.face_cell1)
            so = np.take_along_axis(sm, owner, axis=1)
            sn = np.take_along_axis(sm, nbr, axis=1)
        else:
            sm = np.zeros(mesh.n_cells, bool)
            smarr = np.asarray(solid_mask, bool)
            sm[: len(smarr)] = smarr
            so = sm[np.asarray(mesh.face_cell0)]
            sn = sm[np.asarray(mesh.face_cell1)]
        is_int = np.arange(mesh.n_faces) < mesh.n_interior_faces
        self.params["ib_solid_mask"] = jnp.asarray(sm)
        self.params["ib_solid_face"] = jnp.asarray((so | sn) & is_int)
        # orientation for the force integral: +A (owner->nbr) points INTO
        # the solid when the neighbor is solid
        sign = np.where(sn & ~so, 1.0, np.where(so & ~sn, -1.0, 0.0))
        sign = np.where(is_int, sign, 0.0)
        if self._dist:
            # count each seam-duplicated face exactly once: on the shard
            # that owns the face's owner cell
            owner_owned = np.asarray(mesh.face_cell0) < mesh.n_owned_cells
            sign = np.where(owner_owned, sign, 0.0)
        self.params["ib_face_sign"] = jnp.asarray(sign, dtype)

    def getPressureIntegralonIBFaces(self) -> np.ndarray:
        """Pressure-only force on the immersed body (reference:
        FlowModel::getPressureIntegralonIBFaces, the quantity the
        unsteady IBM drivers record — scripts/IBM-Unsteady-Cantilever.py
        pIntegral history)."""
        return self.getIBForceIntegral(pressure_only=True)

    def getIBForceIntegral(self, pressure_only: bool = False) -> np.ndarray:
        """Force exerted by the fluid on the immersed body: pressure +
        viscous momentum flux through the IB faces (reference:
        IBManager.h:82 createIBFaces; the FSI drivers integrate the same
        surface, scripts/IBMSetup.py)."""
        if "ib_face_sign" not in self.params:
            raise ConfigError("call set_immersed_boundary(solid_mask=...) first")
        sign = self.params["ib_face_sign"]

        def face_force(m, V, p, mu, sgn, grad_coeff=None):
            p_f = assembly.cells_to_faces_distance_weighted(m, p)
            F = p_f[:, None] * m.face_area
            if not pressure_only:
                mu_f = disc.harmonic_face_gamma(m, mu)
                gradV = (
                    gradient(m, grad_coeff, V) if grad_coeff is not None
                    else None
                )
                F = F + disc.diffusion_flux(m, V, mu_f, gradV).F
            # where-mask, not multiply: padded/dead dist cells carry NaN
            # and 0 * NaN would poison the sum
            contrib = jnp.where(sgn[:, None] != 0.0, sgn[:, None] * F, 0.0)
            return jnp.sum(contrib, axis=0)

        args = (
            self.state["velocity"], self.state["pressure"],
            self.params["mu"], sign,
        )
        if "grad_coeff" in self.params:
            args = args + (self.params["grad_coeff"],)
        F = self._map_mesh(face_force, *args)
        if self._dist:
            return np.asarray(jnp.sum(F, axis=0))
        return np.asarray(F)

    def getMassFluxIntegral(self, group_name) -> float:
        mesh = self.mesh
        g = mesh.group_by_name(group_name) if isinstance(group_name, str) else group_name
        return float(self._sum_group(g, self.state["massFlux"]))

    def getMomentumFluxIntegral(self, group_name) -> np.ndarray:
        """Force on a boundary group: pressure + viscous (reference:
        getMomentumFluxIntegral)."""
        mesh = self.mesh
        g = mesh.group_by_name(group_name) if isinstance(group_name, str) else group_name

        def face_force(m, V, p, mu, grad_coeff=None):
            mu_f = disc.harmonic_face_gamma(m, mu)
            gradV = (
                gradient(m, grad_coeff, V) if grad_coeff is not None else None
            )
            dflux = disc.diffusion_flux(m, V, mu_f, gradV)
            p_f = assembly.cells_to_faces_distance_weighted(m, p)
            return dflux.F + p_f[:, None] * m.face_area

        args = (self.state["velocity"], self.state["pressure"], self.params["mu"])
        if "grad_coeff" in self.params:
            args = args + (self.params["grad_coeff"],)
        F = self._map_mesh(face_force, *args)
        return np.asarray(self._sum_group(g, F))
