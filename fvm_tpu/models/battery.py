"""BatteryModel: coupled species/potential transport with Butler-Volmer
interface kinetics (Li-ion cell).

TPU-native counterpart of the reference's BatteryModel
(reference: BatteryModel.h:19, BatteryModel_impl.h — species + potential
(+ thermal) with Butler-Volmer electrode/electrolyte interfaces,
BatteryLinearize{Species,Potential,Thermal}Interface.h and the
point-coupled BatteryPCLinearizeInterface_BV.h).

Redesign: the reference splits electrodes/electrolyte into separate meshes
joined by shell meshes; here a single mesh carries a per-cell material id
(0 = anode, 1 = electrolyte, 2 = cathode), and the interface faces (where
the material changes) get Butler-Volmer flux closures instead of the
diffusive flux:

    eta = phi_electrode - phi_electrolyte - U0(material)
    i   = i0 [ exp(aa F eta / RT) - exp(-ac F eta / RT) ]     (per area)

The potential equation carries i as the normal current; the species
equation carries i/F as the Li flux.  Nonlinearity is handled by exact
Newton (jvp of the residual) with the diffusion surrogate as
preconditioner — the JFNK pattern shared with the structure/plate models.
Double-shell meshes (Mesh.make_interface) are ALSO supported: interface
ghosts become independent per-side shell unknowns (phi_L, phi_R, ce, cs)
with point-coupled BV closure rows solved by the same JFNK Newton
(_shell_rows; reference BatteryPCLinearizeInterface_BV.h,
LinearizeSpeciesInterface.h).
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
from ..linear import BiCGStab, JacobiSolver
from ..linear.base import MatrixFreeOperator, newton_operator
from ..exceptions import ConfigError
from .base import Model, ResidualHistory

FARADAY = 96485.33
RGAS = 8.314


class BatteryBC(BoundaryCondition):
    _allowed_types = ("SpecifiedPotential", "SpecifiedCurrent", "Symmetry")
    _defaults = {
        "specifiedPotential": 0.0,
        "specifiedCurrent": 0.0,  # per area, positive into the domain
    }


class BatteryVC(BoundaryCondition):
    """Per-material parameters as length-3 sequences (anode, elyte, cathode)."""

    _defaults = {
        "conductivity": (100.0, 1.0, 100.0),
        "diffusivity": (1e-10, 1e-9, 1e-10),
        "initialConcentration": (1000.0, 1000.0, 1000.0),
        "openCircuitVoltage": (0.1, 0.0, 3.8),  # U0 per material
        # starting potentials near electrochemical equilibrium (Newton
        # diverges from a cold phi=0 start: eta ~ -U0 saturates the BV exp)
        "initialPotential": (0.0, -0.1, 3.7),
        "exchangeCurrentDensity": 10.0,  # i0
        "alphaAnodic": 0.5,
        "alphaCathodic": 0.5,
        "temperature": 300.0,
        # double-shell (make_interface) BV kinetics, reference:
        # BatteryLinearizeSpeciesInterface.h:197-221
        "csMax": 26390.0,  # electrode saturation concentration
        "rateConstant": 6.33e-10,  # reaction-rate constant k
        "transference": 0.363,  # t_plus; electrolyte balance weight 1-t+
    }


class BatteryModelOptions(ModelOptions):
    _defaults = {
        "transient": False,
        "timeStep": 1.0,
        "relativeTolerance": 1e-8,
        "absoluteTolerance": 1e-20,
        "verbose": True,
    }


class BatteryModel(Model):
    name = "BatteryModel"
    # double-shell meshes (Mesh.make_interface with the electrolyte as the
    # L side): interface ghosts are independent per-side shell unknowns
    # (phi_L, phi_R, ce_i, cs_i) solved point-coupled by the same JFNK
    # Newton as the bulk (reference: BatteryPCLinearizeInterface_BV.h)
    _supports_interfaces = True

    def __init__(self, mesh: DeviceMesh, partition=None):
        super().__init__(mesh, partition)
        self.vc = BatteryVC()
        self._material = None

    def _make_options(self):
        return BatteryModelOptions()

    def _make_bc(self):
        return BatteryBC()

    def set_material_regions(self, material_ids) -> None:
        """Per-interior-cell material id (0 anode, 1 electrolyte, 2 cathode).

        material_ids is GLOBAL (host-mesh interior ordering); distributed
        models scatter it to the per-shard local meshes (halo cells get the
        owning shard's value, ghosts inherit their owner)."""
        mesh = self.mesh
        mat = np.asarray(material_ids, dtype=np.int32)
        if self._dist:
            hm = self.partition.mesh
            ids_g = np.zeros(hm.n_cells, dtype=np.int32)
            ids_g[: len(mat)] = mat
            fc = hm.face_cells
            bdry = fc[:, 1] >= hm.n_interior_cells
            ids_g[fc[bdry, 1]] = ids_g[fc[bdry, 0]]
            self._material = np.asarray(
                self.partition.scatter_cells(ids_g)
            ).astype(np.int32)
            return
        ids = np.zeros(mesh.n_cells, dtype=np.int32)
        ids[: len(mat)] = mat
        # ghosts inherit their owner's material
        owner = np.asarray(mesh.face_cell0)[mesh.n_interior_faces :]
        ids[mesh.n_interior_cells : mesh.n_interior_cells + mesh.n_boundary_faces] = ids[owner]
        self._material = ids

    # ------------------------------------------------------------------

    def init(self) -> None:
        mesh = self.mesh
        if self._material is None:
            raise ConfigError("BatteryModel: call set_material_regions first")
        dtype = mesh.cell_volume.dtype
        mat = self._material

        def per_material(key):
            vals = np.asarray(self.vc[key], dtype=np.float64)
            return jnp.asarray(vals[mat], dtype)

        c0 = per_material("initialConcentration")
        self.state = {"c": c0, "phi": per_material("initialPotential")}
        if self.options["transient"]:
            self.state["c_N1"] = c0
        def scal(key):
            # scalar kinetic constants live in params so solve_tangent can
            # jvp wrt them (reference: Tangent atype recompiles models.cpp
            # with tangent scalars); dist shards a (S,) broadcast copy
            x = jnp.asarray(float(self.vc[key]), dtype)
            if self._dist:
                x = jnp.broadcast_to(x, (mesh.n_shards,))
            return x

        self.params = {
            "sigma": per_material("conductivity"),
            "D": per_material("diffusivity"),
            "U0": per_material("openCircuitVoltage"),
            "mat": jnp.asarray(mat),
            "i0": scal("exchangeCurrentDensity"),
            "alphaA": scal("alphaAnodic"),
            "alphaC": scal("alphaCathodic"),
            "T": scal("temperature"),
            "kReact": scal("rateConstant"),
            "csMax": scal("csMax"),
        }

        # interface faces: interior faces whose two cells differ in material
        # and one side is electrolyte
        owner = np.asarray(mesh.face_cell0)
        nbr = np.asarray(mesh.face_cell1)
        if mat.ndim == 2:  # distributed: (n_shards, nc_local)
            m0 = np.take_along_axis(mat, owner, axis=1)
            m1 = np.take_along_axis(mat, nbr, axis=1)
        else:
            m0, m1 = mat[owner], mat[nbr]
        is_int = np.arange(mesh.n_faces) < mesh.n_interior_faces
        iface = is_int & (m0 != m1) & ((m0 == 1) | (m1 == 1))
        self.params["iface"] = jnp.asarray(iface)
        # +1 if the OWNER is the electrode side, -1 if neighbor is electrode
        self.params["elec_side"] = jnp.asarray(
            np.where(iface & (m1 == 1), 1.0, np.where(iface, -1.0, 0.0)),
            dtype,
        )

        solver = self.options.get("linearSolver")
        if solver is None:
            solver = BiCGStab(
                preconditioner=JacobiSolver(sweeps=3),
                relative_tolerance=1e-8,
                max_iterations=300,
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

    def _bv_current(self, mesh, params, phi, c):
        """Butler-Volmer current per area at interface faces (nf,).

        Positive = current from electrode into electrolyte through the face
        in owner->neighbor direction.
        """
        T = params["T"]
        i0 = params["i0"]
        aa = params["alphaA"]
        ac = params["alphaC"]
        fRT = FARADAY / (RGAS * T)
        po = mesh.take_owner(phi)
        pn = mesh.take_nbr(phi)
        U0o = mesh.take_owner(params["U0"])
        U0n = mesh.take_nbr(params["U0"])
        side = params["elec_side"]  # +1 owner electrode, -1 nbr electrode
        phi_el = jnp.where(side > 0, po, pn)
        phi_ly = jnp.where(side > 0, pn, po)
        U0 = jnp.where(side > 0, U0o, U0n)
        eta_raw = phi_el - phi_ly - U0

        # half-cell ohmic resistance in series with the charge transfer:
        # the interface face replaces the conduction flux, so the
        # centroid-to-face ohmic drops on both sides must be folded into
        # the closure (the reference's shell cells carry these terms,
        # BatteryPCLinearizeInterface_BV.h)
        sig_o = mesh.take_owner(params["sigma"])
        sig_n = mesh.take_nbr(params["sigma"])
        do = jnp.linalg.norm(
            mesh.face_centroid - mesh.take_owner(mesh.cell_centroid), axis=1
        )
        dn = jnp.linalg.norm(
            mesh.face_centroid - mesh.take_nbr(mesh.cell_centroid), axis=1
        )
        R_half = do / jnp.maximum(sig_o, 1e-300) + dn / jnp.maximum(sig_n, 1e-300)

        def bv(eta):
            x1 = jnp.clip(aa * fRT * eta, -60.0, 60.0)
            x2 = jnp.clip(-ac * fRT * eta, -60.0, 60.0)
            return i0 * (jnp.exp(x1) - jnp.exp(x2))

        def bv_prime(eta):
            x1 = jnp.clip(aa * fRT * eta, -60.0, 60.0)
            x2 = jnp.clip(-ac * fRT * eta, -60.0, 60.0)
            return i0 * fRT * (aa * jnp.exp(x1) + ac * jnp.exp(x2))

        # per-face Newton on  g(i) = i - bv(eta_raw - i R_half) = 0
        # (monotone scalar equation; differentiable unrolled iterations)
        i = bv(eta_raw) / (1.0 + bv_prime(eta_raw) * R_half)
        for _ in range(6):
            eta = eta_raw - i * R_half
            gp = 1.0 + bv_prime(eta) * R_half
            i = i - (i - bv(eta)) / gp
        return i

    def _bv_shell(self, params, ce, cs, eta):
        """Concentration-dependent Butler-Volmer current density at a
        double-shell interface (per area, positive = current leaving the
        electrode bulk into the interface).

        Reference: BatteryLinearizeSpeciesInterface.h:197-221 —
        i = F k ce^ac (csMax - cs)^aa cs^ac [exp(Ca eta) - exp(-Cc eta)],
        eta = phi_s - phi_e - U0.  Derivatives come from jax.jvp through
        this function (the reference hand-codes dIdCS/dIdCE/dIdPhi).
        """
        T = params["T"]
        aa = params["alphaA"]
        ac = params["alphaC"]
        k = params["kReact"]
        csMax = params["csMax"]
        Ca = aa * FARADAY / (RGAS * T)
        Cc = ac * FARADAY / (RGAS * T)
        eps = 1e-12 * csMax
        ce_c = jnp.clip(ce, eps, None)
        cs_c = jnp.clip(cs, eps, csMax - eps)
        j0 = FARADAY * k * ce_c**ac * (csMax - cs_c) ** aa * cs_c**ac
        x1 = jnp.clip(Ca * eta, -60.0, 60.0)
        x2 = jnp.clip(-Cc * eta, -60.0, 60.0)
        return j0 * (jnp.exp(x1) - jnp.exp(x2))

    def _shell_rows(self, mesh, params, phi, c, fphi, fc_flux, rp, rc, coupled):
        """Overwrite the shell-ghost residual rows of a double-shell mesh.

        Per interface face (L = electrolyte, R = electrode; ghosts are the
        one-sided shell unknowns):
          phi_L row:  F_phi(fL) + F_phi(fR) = 0        (current balance)
          phi_R row:  F_phi(fR) - i(ce,cs,eta) A = 0   (BV closure)
          c_L row:    F_c(fL) + (1 - t+) F_c(fR) = 0   (Li balance)
          c_R row:    F_c(fR) - (i/F) A = 0            (Faradaic Li flux)
        All rows are pure functions of u, so jax.jvp supplies the exact
        point-coupled Newton linearization.
        """
        tf = 1.0 - float(self.vc["transference"])
        for nm, ln, rn in mesh.interfaces:
            gLg = mesh.group_by_name(ln)
            gRg = mesh.group_by_name(rn)
            fL = mesh.group_faces(gLg)
            fR = mesh.group_faces(gRg)
            gl = mesh.ghost_cells_of_group(gLg)
            gr = mesh.ghost_cells_of_group(gRg)
            vmask = mesh.face_area_mag[fL] > 0
            amag = mesh.face_area_mag[fL]
            eta = phi[gr] - phi[gl] - params["U0"][gr]
            i_bv = self._bv_shell(params, c[gl], c[gr], eta)
            rp = rp.at[gl].set(jnp.where(vmask, fphi.F[fL] + fphi.F[fR], 0.0))
            rp = rp.at[gr].set(jnp.where(vmask, fphi.F[fR] - i_bv * amag, 0.0))
            if coupled:
                rc = rc.at[gl].set(
                    jnp.where(vmask, fc_flux.F[fL] + tf * fc_flux.F[fR], 0.0)
                )
                rc = rc.at[gr].set(
                    jnp.where(
                        vmask, fc_flux.F[fR] - (i_bv / FARADAY) * amag, 0.0
                    )
                )
        return rp, rc

    def _system(self, mesh, params, state, bcvals, u):
        """Residual: steady mode solves phi only (a steady species field
        does not exist under sustained current with zero-flux walls — the
        species subsystem is singular); transient mode couples (c, phi)."""
        coupled = self.options["transient"]
        if coupled:
            c = u[:, 0]
            phi = u[:, 1]
        else:
            c = state["c"]
            phi = u
        iface = params["iface"]
        side = params["elec_side"]
        amag = mesh.face_area_mag

        i_bv = self._bv_current(mesh, params, phi, c)
        # current flows owner->neighbor positively when owner is electrode
        F_if = jnp.where(iface, side * i_bv * amag, 0.0)

        # potential: conduction + interface current
        sig_f = disc.harmonic_face_gamma(mesh, params["sigma"])
        fphi = disc.diffusion_flux(mesh, phi, sig_f)
        F_phi = jnp.where(iface, F_if, fphi.F)
        dphiO = jnp.where(iface, 0.0, fphi.dF_dO)
        dphiN = jnp.where(iface, 0.0, fphi.dF_dN)

        # species: diffusion + interface Li flux = i/F
        D_f = disc.harmonic_face_gamma(mesh, params["D"])
        fc = disc.diffusion_flux(mesh, c, D_f)
        F_c = jnp.where(iface, F_if / FARADAY, fc.F)
        dcO = jnp.where(iface, 0.0, fc.dF_dO)
        dcN = jnp.where(iface, 0.0, fc.dF_dN)

        # boundary current injection (SpecifiedCurrent): fixed conduction
        # flux through the group faces, positive INTO the domain
        for g, bc in self._group_bcs():
            if bc.bc_type == "SpecifiedCurrent":
                sl = mesh.group_faces(g)
                amag_g = mesh.face_area_mag[sl]
                I = bcvals[f"{g[1]}:specifiedCurrent"]
                F_phi = F_phi.at[sl].set(-I * amag_g)
                dphiO = dphiO.at[sl].set(0.0)
                dphiN = dphiN.at[sl].set(0.0)

        diag_c = jnp.zeros(mesh.n_cells, u.dtype)
        r_c_extra = jnp.zeros(mesh.n_cells, u.dtype)
        if self.options["transient"]:
            diag_c, r_c_extra = disc.transient_term(
                mesh, c, state["c_N1"], self.options["timeStep"]
            )

        from ..ops.assembly import FaceFlux

        Ac, rc = assembly.assemble(
            mesh,
            FaceFlux(F=F_c, dF_dO=dcO, dF_dN=dcN),
            r_cell=r_c_extra,
            diag_cell=diag_c,
        )
        Ap, rp = assembly.assemble(
            mesh, FaceFlux(F=F_phi, dF_dO=dphiO, dF_dN=dphiN)
        )

        # BCs: potential Dirichlet / current flux; species zero-flux
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            valid = bcvals[f"{g[1]}:__valid"]
            t = bc.bc_type
            scale_p = sig_f[sl] * mesh.face_e_over_d[sl]
            scale_c = D_f[sl] * mesh.face_e_over_d[sl]
            if t == "SpecifiedPotential":
                Ap, rp = bck.dirichlet_rows(
                    mesh, Ap, rp, gc, bcvals[f"{g[1]}:specifiedPotential"],
                    phi, valid, scale_p,
                )
            else:
                Ap, rp = bck.extrapolation_rows(mesh, Ap, rp, gc, phi, valid, scale_p)
            Ac, rc = bck.extrapolation_rows(mesh, Ac, rc, gc, c, valid, scale_c)

        if mesh.interfaces:
            # double-shell interfaces: point-coupled BV closure rows on
            # the shell-ghost unknowns (phi_L, phi_R, ce_i, cs_i)
            rp, rc = self._shell_rows(
                mesh, params, phi, c, fphi, fc, rp, rc, coupled
            )

        Ac, rc = assembly.identity_unowned_rows(mesh, Ac, rc)
        Ap, rp = assembly.identity_unowned_rows(mesh, Ap, rp)
        if coupled:
            r = jnp.stack([rc, rp], axis=1)
            return (Ac, Ap), r
        return (Ac, Ap), rp

    def _newton_op(self, mesh, params, state, bcvals, u, Ac, Ap,
                   transpose=False):
        """Exact-Newton operator at u with the block-diag (Ac, Ap)
        surrogate (shared by the primal step and solve_tangent).
        ``transpose=True`` gives the exact transpose action via jax.vjp
        (solve_adjoint); the block-diag surrogate is symmetric so the
        preconditioner is shared."""
        coupled = self.options["transient"]
        # sync at residual entry: jvp tangents (Krylov vectors)
        # exchange halos through the linear all_to_all
        Rfn = lambda uu: self._system(
            mesh, params, state, bcvals, maybe_sync(mesh, uu)
        )[1]
        n_own = mesh.n_owned_cells
        owned = jnp.arange(mesh.n_cells) < n_own
        if transpose:
            _, _vjp_R = jax.vjp(Rfn, u)
            act = lambda v: -_vjp_R(v)[0]
        else:
            act = lambda v: -jax.jvp(Rfn, (u,), (v,))[1]

        class PairOp:
            """Exact Newton operator; block-diag (Ac, Ap) surrogate."""

            def mv(self, v):
                y = act(v)
                if n_own < mesh.n_cells:
                    m = owned if y.ndim == 1 else owned[:, None]
                    y = jnp.where(m, y, 0.0)
                return y

            def dot(self, a, b):
                return Ap.psum(jnp.sum(a * b))

            def norm(self, x):
                return jnp.sqrt(Ap.psum(jnp.sum(x * x)))

            def psum(self, v):
                return Ap.psum(v)

            def diag_solve(self, rr):
                if coupled:
                    return jnp.stack(
                        [rr[:, 0] / Ac.diag, rr[:, 1] / Ap.diag], axis=1
                    )
                return rr / Ap.diag

            def jacobi_step(self, x, b, omega=1.0):
                return x + omega * self.diag_solve(b - self.mv(x))

        return PairOp()

    def _build_step(self):
        solver = self.options["linearSolver"]

        coupled = self.options["transient"]

        def step(mesh, params, state, bcvals):
            if coupled:
                u = jnp.stack([state["c"], state["phi"]], axis=1)
            else:
                u = state["phi"]
            # sync the primal too: the Jacobian (Rfn) is evaluated at the
            # synced point, so the residual must be as well or the Newton
            # direction is inconsistent and the outer loop diverges
            u = maybe_sync(mesh, u)
            (Ac, Ap), r = self._system(mesh, params, state, bcvals, u)
            rnorm = Ap.norm(r)
            op = self._newton_op(mesh, params, state, bcvals, u, Ac, Ap)
            du, _ = solver.solve_fn(op, r, jnp.zeros_like(r))
            u2 = u + du
            if coupled:
                return (
                    dict(state, c=u2[:, 0], phi=u2[:, 1]),
                    {"rnorm": rnorm},
                )
            return dict(state, phi=u2), {"rnorm": rnorm}

        return step

    # --- sensitivities (reference: Tangent atype on BatteryModel) ---------

    def solve_tangent(self, param_tangents=None, bc_tangents=None):
        """Forward sensitivity of the converged unknowns via one
        exact-Jacobian tangent solve (J du = dR/dp . dp, J = -dR/du from
        the same jvp Newton operator as the primal step).

        ``param_tangents`` accepts any float params key: per-cell fields
        'sigma' / 'D' / 'U0' (scalar, (n_interior,), or full-shape) and
        the kinetic scalars 'i0' / 'alphaA' / 'alphaC' / 'T' / 'kReact' /
        'csMax'; ``bc_tangents`` is keyed 'group:entry' (e.g.
        'right:specifiedCurrent').  Steady mode returns d(phi) at fixed c
        (the steady species subsystem is singular); transient mode returns
        (n_interior, 2) = (dc, dphi) for the current time step."""
        if not self._initialized:
            raise ConfigError("call init() + advance() before solve_tangent")
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        solver = self.options["linearSolver"]
        coupled = self.options["transient"]
        base, tans = self._tangent_inputs(param_tangents, bc_tangents, bcvals)

        def tangent_fn(lmesh, params_all, lstate, lbcvals, base, tans):
            if coupled:
                u = jnp.stack([lstate["c"], lstate["phi"]], axis=1)
            else:
                u = lstate["phi"]
            u = maybe_sync(lmesh, u)

            def r_of(p_sub, b_sub):
                return self._system(
                    lmesh, dict(params_all, **p_sub), lstate,
                    dict(lbcvals, **b_sub), u,
                )[1]

            _, dr = jax.jvp(r_of, base, tans)
            (Ac, Ap), _ = self._system(lmesh, params_all, lstate, lbcvals, u)
            op = self._newton_op(lmesh, params_all, lstate, lbcvals, u, Ac, Ap)
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
        unknowns w.r.t. parameter fields/scalars and BC values, from ONE
        transposed Newton solve (exact A^T via jax.vjp of the same
        residual the primal jvps; the reference's Tangent atype is
        forward-only).  ``functional(u_interior) -> scalar`` where
        u_interior is (n_interior,) phi in steady mode or
        (n_interior, 2) = (c, phi) in transient mode.  ``param_keys``:
        any float params key ('sigma', 'D', 'U0' fields; 'i0', 'alphaA',
        'alphaC', 'T', 'kReact', 'csMax' scalars — scalar gradients come
        back as floats).  Distributed too: the reverse pass runs under
        shard_map (reversed halo exchanges, psum'd transposed Krylov);
        the functional then sees the shard-local owned-interior rows and
        must be sum-decomposable."""
        if not self._initialized:
            raise ConfigError("call init() + advance() before solve_adjoint")
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        solver = self.options["linearSolver"]
        coupled = self.options["transient"]
        state = self.state
        for k in param_keys:
            if k not in self.params:
                raise ConfigError(
                    f"{self.name}.solve_adjoint: unknown parameter {k!r}"
                )
        for k in bc_keys:
            if k not in bcvals:
                raise ConfigError(
                    f"{self.name}.solve_adjoint: unknown BC entry {k!r}"
                )

        def adjoint_local(lmesh, params_all, lstate, lbcvals):
            n_int = lmesh.n_interior_cells
            if coupled:
                u = jnp.stack([lstate["c"], lstate["phi"]], axis=1)
            else:
                u = lstate["phi"]
            u = maybe_sync(lmesh, u)
            (Ac, Ap), _ = self._system(lmesh, params_all, lstate, lbcvals, u)
            opT = self._newton_op(
                lmesh, params_all, lstate, lbcvals, u, Ac, Ap, transpose=True
            )
            gJ = jax.grad(lambda uu: functional(uu[:n_int]))(u)
            # dead padded cells are frozen -> zero functional cotangent
            alive = lmesh.cf_mask.any(axis=0)
            gJ = jnp.where(alive[:, None] if gJ.ndim == 2 else alive, gJ, 0.0)
            lam, _ = solver.solve_fn(opT, gJ, jnp.zeros_like(gJ))

            base_p = {k: params_all[k] for k in param_keys}
            base_b = {k: lbcvals[k] for k in bc_keys}

            def r_of(p_sub, b_sub):
                return self._system(
                    lmesh, dict(params_all, **p_sub), lstate,
                    dict(lbcvals, **b_sub), u,
                )[1]

            _, vjp_pb = jax.vjp(r_of, base_p, base_b)
            gp, gb = vjp_pb(lam)

            # fold ghost/halo cotangents of CELL params onto owners;
            # scalar params keep their per-shard contribution (summed on
            # the host after gathering)
            def fold(ref, g):
                if jnp.asarray(ref).ndim == 0:
                    return g

                def fwd(v_int):
                    v = jnp.zeros(ref.shape, ref.dtype).at[:n_int].set(v_int)
                    v = maybe_sync(lmesh, v)
                    return bck.extend_to_ghosts(lmesh, v)

                (gi,) = jax.linear_transpose(
                    fwd,
                    jnp.zeros(
                        (n_int,) + tuple(ref.shape[1:]), ref.dtype
                    ),
                )(g)
                return gi

            return {k: fold(params_all[k], gp[k]) for k in param_keys}, gb

        if self._dist:
            mapped = self._smap_cells(adjoint_local)
            gp, gb = mapped(mesh, self.params, state, bcvals)
            part = self.partition
            out = {}
            for k in param_keys:
                g = np.asarray(gp[k])
                if np.asarray(self.params[k]).ndim <= 1 and g.ndim == 1:
                    out[k] = float(g.sum())  # scalar: sum shard parts
                else:
                    out[k] = part.gather_cells(g)
            for k in bc_keys:
                out[k] = part.gather_bc(k.split(":")[0], gb[k])
            return out
        gp, gb = jax.jit(
            lambda: adjoint_local(mesh, self.params, state, bcvals)
        )()
        out = {}
        for k in param_keys:
            g = gp[k]
            out[k] = (
                float(g)
                if jnp.asarray(self.params[k]).ndim == 0
                else np.asarray(g)
            )
        for k in bc_keys:
            out[k] = np.asarray(gb[k])
        return out

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
            raise ConfigError("BatteryModel: transient option is off")
        self.state["c_N1"] = self.state["c"]

    def getPotential(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["phi"])
        return np.asarray(self.state["phi"][: self.mesh.n_interior_cells])

    def getConcentration(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["c"])
        return np.asarray(self.state["c"][: self.mesh.n_interior_cells])

    def get_heat_source(self) -> np.ndarray:
        """Volumetric heat generation (nc,): face-based Joule dissipation
        i_f * dphi_f on conduction faces plus |i * eta| at the
        Butler-Volmer interfaces (irreversible reaction + half-cell ohmic
        heat).  Feed to a ThermalModel via vc['heatSource'] (the
        reference's BatteryLinearizeThermalInterface coupling).
        """
        import fvm_tpu.ops.discretizations as disc

        def local(mesh, params, phi, c):
            iface = params["iface"]
            amag = mesh.face_area_mag
            sig_f = disc.harmonic_face_gamma(mesh, params["sigma"])
            dphi = mesh.take_owner(phi) - mesh.take_nbr(phi)
            # conduction faces: q = sigma_f e_over_d (dphi)^2  (>= 0)
            q_cond = sig_f * mesh.face_e_over_d * dphi * dphi
            # interface faces: |i| * |eta_raw| per area
            i_bv = self._bv_current(mesh, params, phi, c)
            po = mesh.take_owner(phi)
            pn = mesh.take_nbr(phi)
            U0o = mesh.take_owner(params["U0"])
            U0n = mesh.take_nbr(params["U0"])
            side = params["elec_side"]
            eta_raw = (
                jnp.where(side > 0, po, pn)
                - jnp.where(side > 0, pn, po)
                - jnp.where(side > 0, U0o, U0n)
            )
            q_if = jnp.abs(i_bv * eta_raw) * amag
            q_face = jnp.where(iface, q_if, q_cond)
            # interior faces split the dissipation between the two cells;
            # boundary/shell faces attribute it all to the bulk owner (the
            # ghost is not a physical volume)
            bnd_f = jnp.arange(mesh.n_faces) >= mesh.n_interior_faces
            w_own = jnp.where(bnd_f, 1.0, 0.5)
            qc = jnp.zeros(mesh.n_cells, phi.dtype)
            qc = qc.at[mesh.face_cell0].add(w_own * q_face)
            qc = qc.at[mesh.face_cell1].add((1.0 - w_own) * q_face)
            # double-shell interfaces: the conduction faces already carry
            # the half-cell ohmic drops into the shell unknowns; add the
            # irreversible reaction heat |i * eta| of the BV closure,
            # split between the two bulk owners
            for nm, ln, rn in mesh.interfaces:
                gLg = mesh.group_by_name(ln)
                gRg = mesh.group_by_name(rn)
                fL = mesh.group_faces(gLg)
                fR = mesh.group_faces(gRg)
                gl = mesh.ghost_cells_of_group(gLg)
                gr = mesh.ghost_cells_of_group(gRg)
                amag_i = mesh.face_area_mag[fL]
                eta_i = phi[gr] - phi[gl] - params["U0"][gr]
                i_sh = self._bv_shell(params, c[gl], c[gr], eta_i)
                q_rxn = jnp.abs(i_sh * eta_i) * amag_i
                qc = qc.at[mesh.face_cell0[fL]].add(0.5 * q_rxn)
                qc = qc.at[mesh.face_cell0[fR]].add(0.5 * q_rxn)
            return qc / jnp.maximum(mesh.cell_volume, 1e-300)

        if self._dist:
            # per-shard (halo phi is one converged-increment stale, i.e.
            # accurate to the solve tolerance), then gather
            qs = jax.vmap(local)(
                self.mesh, self.params, self.state["phi"], self.state["c"]
            )
            return self.partition.gather_cells(qs)
        q = local(self.mesh, self.params, self.state["phi"], self.state["c"])
        return np.asarray(q[: self.mesh.n_interior_cells])

    def getCurrentIntegral(self, group_name) -> float:
        """Net current INTO the domain through a boundary group."""
        mesh = self.mesh
        g = mesh.group_by_name(group_name) if isinstance(group_name, str) else group_name
        sl = mesh.group_faces(g)
        bc = self.bc.get(g[1])
        if bc is not None and bc.bc_type == "SpecifiedCurrent":
            # the conduction flux is replaced by the injected current
            I = self._group_bc_values(g, bc, "specifiedCurrent")
            amag = mesh.face_area_mag[..., sl]
            if self._dist:
                mask = self.partition.group_valid_mask(g[1])
                return float(jnp.sum(jnp.where(mask, I * amag, 0.0)))
            return float(jnp.sum(I * amag))

        def local(mesh, sigma, phi):
            sig_f = disc.harmonic_face_gamma(mesh, sigma)
            f = disc.diffusion_flux(mesh, phi, sig_f)
            # padded group slots carry zero area -> zero flux
            return -jnp.sum(f.F[..., sl])

        if self._dist:
            vals = jax.vmap(local)(
                mesh, self.params["sigma"], self.state["phi"]
            )
            return float(jnp.sum(vals))
        return float(local(mesh, self.params["sigma"], self.state["phi"]))


def species_interface_flux(eta, csMax=26390.0, rr_constant=6.33e-10,
                           T=300.0, alpha_a=0.5, alpha_c=0.5):
    """Butler-Volmer species closure for a double-shell interface.

    Returns the elementwise flux_fn(ce, cs) -> Li molar flux leaving the
    electrode side (R) into the interface, for use as
    ``model.interface[name] = {"type": "flux", "flux_fn": ...,
    "weight_R": 1 - t_plus}`` on a SpeciesModel over a
    ``Mesh.make_interface`` mesh with the electrolyte as the L side.

    Reference semantics: BatteryLinearizeSpeciesInterface.h:197-221 —
      i = C0 * k * F * ce^ac * (csMax - cs)^aa * cs^ac,
      C0 = exp(Ca*eta) - exp(-Cc*eta),  Ca/Cc = alpha*F/(R*T)
    with the per-face derivatives supplied by jax.grad instead of the
    reference's hand-coded dIdCS/dIdCE.  ``eta`` is the interface
    overpotential (phi_s - phi_e - U); pass the fixed-eta form here (the
    reference's commented A_coeff/B_coeff variant at :199) or rebuild the
    closure per outer iteration for potential-coupled runs.  The returned
    molar flux is i/F.
    """
    Ca = alpha_a * FARADAY / (RGAS * T)
    Cc = alpha_c * FARADAY / (RGAS * T)
    C0 = np.exp(Ca * eta) - np.exp(-Cc * eta)

    def flux_fn(ce, cs):
        eps = 1e-12 * csMax
        ce_c = jnp.clip(ce, eps, None)
        cs_c = jnp.clip(cs, eps, csMax - eps)
        return (
            C0 * rr_constant * ce_c**alpha_c
            * (csMax - cs_c) ** alpha_a * cs_c**alpha_c
        )

    return flux_fn
