"""ElectricModel: electrostatics + charge transport.

TPU-native counterpart of the reference's ElectricModel
(reference: ElectricModel.h:19, ElectricModel_impl.h:49 — electrostatics
:136-154 solves div(eps grad phi) = -rho with dielectric permittivity;
charge transport :218+ adds drift/diffusion of trapped/free charge for MEMS
dielectric charging, with tunneling/injection kernels,
DriftDiscretization.h / ElecDiffusionDiscretization.h).

This implementation covers:
* electrostatics: potential solve with per-cell dielectric constant and
  space-charge source; electric field E = -grad phi via least-squares
  gradients;
* charge transport (optional): drift (upwind on mobility * E . A face
  flux) + diffusion of a free-charge density, one-way coupled to the
  electrostatic field each outer iteration (the reference couples the same
  way per timestep).

Also covered: Fowler-Nordheim boundary injection, trap capture/emission
kinetics, trap-band tunneling (vectorized-WKB static walks), dielectric
double-shell interfaces (thin-layer closure).
BC types: 'SpecifiedPotential', 'SpecifiedCharge' (surface charge density
-> flux), 'Symmetry'.
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
from ..linear import AMG, BiCGStab, CG, JacobiSolver
from ..exceptions import ConfigError
from .base import Model, ResidualHistory
from .sensitivity import TangentMixin

EPS0 = 8.8542e-12


class ElectricBC(BoundaryCondition):
    _allowed_types = ("SpecifiedPotential", "SpecifiedCharge", "Symmetry")
    _defaults = {
        "specifiedPotential": 0.0,
        "specifiedCharge": 0.0,
        "specifiedChargeFlux": 0.0,
    }


class ElectricVC(BoundaryCondition):
    _defaults = {
        "dielectric_constant": 7.9,  # reference default (silicon nitride)
        "initialCharge": 0.0,
        "initialPotential": 0.0,
        "mobility": 1e-10,
        "diffusivity": 1e-12,
        # charge injection at contacts (Fowler-Nordheim-shaped,
        # reference InjectionDiscretization.h / TunnelingDiscretization.h)
        "injectionA": 0.0,  # prefactor [A/V^2-ish units]
        "injectionB": 1.0,  # exponential field scale
        # trap kinetics (reference CaptureDiscretization.h /
        # EmissionDiscretization.h)
        "trapDensity": 0.0,  # N_t
        "captureCoefficient": 0.0,  # k_cap
        "emissionCoefficient": 0.0,  # k_em (constant-rate emission)
        # Poole-Frenkel field-enhanced emission (reference
        # EmissionDiscretization.h:92-108): rate = emissionFrequency *
        # exp(-(trapDepth - pfBeta sqrt|E|)/thermalVoltage), capped at the
        # attempt frequency.  pfBeta = sqrt(q/(pi eps0 eps_opt)) in the
        # user's unit system; active when poole_frenkel_enable is set.
        "emissionFrequency": 0.0,
        "pfBeta": 0.0,
        "thermalVoltage": 0.0259,  # kT/q at 300 K [V]
        "initialTrappedCharge": 0.0,
        # trap-band tunneling (reference TrapBandTunnelingDiscretization.h)
        "bandOffset": 0.0,  # conduction band Ec = bandOffset - potential
        "trapDepth": 1.0,  # trap level below Ec [same units as potential]
        "wkbFactor": 1.0,  # -2/hbar sqrt(2 m* me qe) in the user's units
        "tunnelingRateScale": 0.0,  # alpha = scale * V * |E|^2
    }


class ElectricModelOptions(ModelOptions):
    _defaults = {
        "electrostatics_enable": True,
        "chargetransport_enable": False,
        "injection_enable": False,
        "trapping_enable": False,
        "poole_frenkel_enable": False,
        "trapbandtunneling_enable": False,
        "tunnelingDirection": 0,  # normal axis the WKB walk descends
        "tunnelingMaxSteps": 200,  # reference nMax=200
        "transient": False,
        "timeStep": 1.0,
        "nonOrthogonalCorrection": True,
        "relativeTolerance": 1e-8,
        "absoluteTolerance": 1e-16,
        "verbose": True,
    }


class ElectricModel(TangentMixin, Model):
    _supports_interfaces = True
    name = "ElectricModel"

    def __init__(self, mesh: DeviceMesh, partition=None):
        super().__init__(mesh, partition)
        self.vc = ElectricVC()

    def _make_options(self):
        return ElectricModelOptions()

    def _make_bc(self):
        return ElectricBC()

    # ------------------------------------------------------------------

    def init(self) -> None:
        mesh = self.mesh
        self.state = {
            "potential": self._cell_field(self.vc, "initialPotential"),
            "charge": self._cell_field(self.vc, "initialCharge"),
            "trapped": self._cell_field(self.vc, "initialTrappedCharge"),
        }
        if self.options["transient"]:
            self.state["charge_N1"] = self.state["charge"]
            self.state["trapped_N1"] = self.state["trapped"]

        self.params = {
            "eps": self._cell_field(self.vc, "dielectric_constant", extend_ghosts=True)
            * EPS0,
            "mobility": self._cell_field(self.vc, "mobility", extend_ghosts=True),
            "diffusivity": self._cell_field(self.vc, "diffusivity", extend_ghosts=True),
            "trapDensity": self._cell_field(self.vc, "trapDensity"),
            "k_cap": self._cell_field(self.vc, "captureCoefficient"),
            "k_em": self._cell_field(self.vc, "emissionCoefficient"),
        }
        if self.options["poole_frenkel_enable"]:
            self.params["em_nu"] = self._cell_field(self.vc, "emissionFrequency")
            self.params["pf_beta"] = self._cell_field(self.vc, "pfBeta")
            self.params["pf_vT"] = self._cell_field(self.vc, "thermalVoltage")
            self.params["pf_depth"] = self._cell_field(self.vc, "trapDepth")
        if self.options["nonOrthogonalCorrection"]:
            self.params["grad_coeff"] = (
                jax.vmap(ls_gradient_coefficients)(mesh)
                if self._dist
                else ls_gradient_coefficients(mesh)
            )
        if self.options["trapbandtunneling_enable"]:
            self._setup_tunneling_paths()

        solver = self.options.get("electrostaticsLinearSolver")
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
            self.options["electrostaticsLinearSolver"] = solver
        csolver = self.options.get("chargeLinearSolver")
        if csolver is None:
            csolver = BiCGStab(
                preconditioner=JacobiSolver(sweeps=3),
                relative_tolerance=1e-8,
                max_iterations=100,
            )
            self.options["chargeLinearSolver"] = csolver
        for s in (solver, csolver):
            pre = getattr(s, "preconditioner", None)
            for ss in (s, pre):
                if isinstance(ss, AMG) and not self._dist:
                    ss.setup_structure(*mesh.host_cf())

        if self._dist:
            self.state = self.partition.device_put(self.state)
            self.params = self.partition.device_put(self.params)
        self._step_raw = self._build_step()
        self._step = self._wrap_step(self._step_raw)
        self._initial_norm = None
        self._initialized = True

    # ------------------------------------------------------------------

    def _linearize_potential(self, mesh, params, state, bcvals):
        phi = maybe_sync(mesh, state["potential"])
        rho = state["charge"] + state["trapped"]
        eps_f = disc.harmonic_face_gamma(mesh, params["eps"])
        gradp = None
        if "grad_coeff" in params:
            gradp = maybe_sync(mesh, gradient(mesh, params["grad_coeff"], phi))
        flux = disc.diffusion_flux(mesh, phi, eps_f, gradp)

        for g, bc in self._group_bcs():
            sl = mesh.group_faces(g)
            if bc.bc_type == "Symmetry":
                flux = bck.set_flux_fixed(flux, sl, 0.0)
            elif bc.bc_type == "SpecifiedCharge":
                # surface charge density sigma -> D.n = sigma
                sigma = bcvals[f"{g[1]}:specifiedCharge"]
                flux = bck.set_flux_fixed(flux, sl, -sigma * mesh.face_area_mag[sl])

        # space charge source: div(eps grad phi) = -rho  =>  r += rho*V
        _, r_cell = disc.source_term(mesh, rho)
        A, r = assembly.assemble(mesh, flux, r_cell=r_cell)

        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            valid = bcvals[f"{g[1]}:__valid"]
            scale = eps_f[sl] * mesh.face_e_over_d[sl]
            if bc.bc_type == "SpecifiedPotential":
                A, r = bck.dirichlet_rows(
                    mesh, A, r, gc, bcvals[f"{g[1]}:specifiedPotential"], phi,
                    valid, scale,
                )
            else:
                A, r = bck.extrapolation_rows(mesh, A, r, gc, phi, valid, scale)
        if mesh.interfaces:
            # dielectric shell (reference LinearizeDielectric.h:102): a
            # thin layer of thickness t and constant eps_d between the two
            # shell potentials, with an optional layer surface charge:
            #   F_R = eps_d/t * (phi_R - phi_L) - 0.5 * q_layer * t
            # expressed through the generic flux-closure rows.  Plain
            # jump/flux configs pass through unchanged.
            from ..core import interfaces as ifc

            cfg = {}
            for nm, _, _ in mesh.interfaces:
                c = dict(self.interface.get(nm, {}))
                if c.get("type") == "dielectric":
                    epsd = float(c["constant"])
                    t_d = float(c["thickness"])
                    q_l = float(c.get("charge", 0.0))

                    def _mk(epsd=epsd, t_d=t_d, q_l=q_l):
                        def fn(pl, pr):
                            return epsd / t_d * (pr - pl) - 0.5 * q_l * t_d

                        return fn

                    c = {"type": "flux", "flux_fn": _mk()}
                cfg[nm] = c
            A, r = ifc.apply_model_interfaces(mesh, cfg, A, r, phi, flux, eps_f)
        A, r = self._apply_ib(mesh, params, A, r, phi)
        A, r = assembly.identity_unowned_rows(mesh, A, r)
        return A, r

    def set_immersed_boundary(self, mask, value, stencil=None,
                              implicit=True) -> None:
        """Pin masked cells to an electrode potential (the reference's
        IBM electrostatics pipeline, src/fvm/test/IBM_PARALLEL).  With
        ``stencil`` the IB band carries the interpolation rows implicitly
        (GenericIBDiscretization.h); distributed models support the
        mask/value (pinned) path."""
        self._set_immersed_boundary(mask, value, stencil, implicit)

    # --- sensitivities / UQ (TangentMixin bound to the potential solve;
    # the reference builds ElectricModel with the Tangent atype,
    # models.cpp:10-74) ---------------------------------------------------

    def solve_tangent(self, param_tangents: dict) -> np.ndarray:
        """d(potential)/d(params).direction at the current state (charge
        held fixed — the electrostatics solve is linear in potential).
        param_tangents keys index ``self.params`` (e.g. "eps")."""
        return self._tangent_impl(
            "potential", self._linearize_potential,
            self.options["electrostaticsLinearSolver"], param_tangents,
        )

    def solve_adjoint(self, functional, param_keys) -> dict:
        """Reverse-mode gradient of a scalar functional of the potential
        w.r.t. parameter fields (one adjoint solve for all cells)."""
        return self._adjoint_impl(
            "potential", self._linearize_potential,
            self.options["electrostaticsLinearSolver"], functional,
            param_keys,
        )

    def solve_mc(self, param_key: str, samples, niter: int = 20) -> np.ndarray:
        """Vmapped potential re-solves over a batch of parameter fields
        (e.g. dielectric-constant uncertainty)."""
        return self._mc_impl(
            "potential", self._linearize_potential,
            self.options["electrostaticsLinearSolver"], param_key, samples,
            niter,
        )

    def _emission_rate(self, params, E_field):
        """Per-cell trap emission rate: constant k_em plus, when
        poole_frenkel_enable is set, the field-lowered-barrier rate
        nu * exp(-(phi_t - beta sqrt|E|)/vT) capped at the attempt
        frequency nu (reference EmissionDiscretization.h:100-108)."""
        k_em = params["k_em"]
        if self.options["poole_frenkel_enable"]:
            Emag = jnp.sqrt(jnp.sum(E_field * E_field, axis=-1))[
                : k_em.shape[0]
            ]
            expt = (
                params["pf_depth"] - params["pf_beta"] * jnp.sqrt(Emag)
            ) / jnp.maximum(params["pf_vT"], 1e-300)
            k_em = k_em + params["em_nu"] * jnp.exp(-jnp.maximum(expt, 0.0))
        return k_em

    def _linearize_charge(self, mesh, params, state, bcvals, E_field):
        c = maybe_sync(mesh, state["charge"])
        # E_field used by injection fluxes below
        D_f = disc.harmonic_face_gamma(mesh, params["diffusivity"])
        gradc = None
        if "grad_coeff" in params:
            gradc = maybe_sync(mesh, gradient(mesh, params["grad_coeff"], c))
        flux = disc.diffusion_flux(mesh, c, D_f, gradc)
        # drift: "mass flux" = mobility * E . A at faces
        mob_f = disc.harmonic_face_gamma(mesh, params["mobility"])
        E_f = assembly.cells_to_faces_distance_weighted(mesh, E_field)
        drift = mob_f * jnp.einsum("fd,fd->f", E_f, mesh.face_area)
        flux = flux + disc.convection_flux(mesh, c, drift, "upwind", gradc)

        # charge flux at boundaries: zero unless explicitly specified or
        # injected at contacts (Fowler-Nordheim-shaped, reference
        # InjectionDiscretization.h: J = A E_n^2 exp(-B/E_n) for fields
        # driving charge into the dielectric)
        inj_on = self.options["injection_enable"]
        A_inj = float(self.vc["injectionA"])
        B_inj = float(self.vc["injectionB"])
        for g, bc in self._group_bcs():
            sl = mesh.group_faces(g)
            if bc.bc_type == "SpecifiedCharge":
                qf = bcvals[f"{g[1]}:specifiedChargeFlux"]
                flux = bck.set_flux_fixed(flux, sl, -qf * mesh.face_area_mag[sl])
            elif inj_on and bc.bc_type == "SpecifiedPotential":
                amag = jnp.maximum(mesh.face_area_mag[sl], 1e-300)
                nhat = mesh.face_area[sl] / amag[:, None]
                E_f = E_field[mesh.face_cell0[sl]]
                En = -jnp.einsum("fd,fd->f", E_f, nhat[:, : mesh.dim])
                En = jnp.maximum(En, 0.0)  # field pushing charge inward
                J = A_inj * En * En * jnp.exp(-B_inj / jnp.maximum(En, 1e-30))
                flux = bck.set_flux_fixed(flux, sl, -J * mesh.face_area_mag[sl])
            else:
                flux = bck.set_flux_fixed(flux, sl, 0.0)

        diag_cell = jnp.zeros(mesh.n_cells, c.dtype)
        r_cell = jnp.zeros(mesh.n_cells, c.dtype)
        if self.options["trapping_enable"]:
            # capture - emission exchange with the trap population
            # (reference Capture/EmissionDiscretization)
            ct = state["trapped"]
            cap = params["k_cap"] * c * jnp.maximum(params["trapDensity"] - ct, 0.0)
            em = self._emission_rate(params, E_field) * ct
            V = mesh.cell_volume
            r_cell = r_cell + (em - cap) * V
            diag_cell = diag_cell + params["k_cap"] * jnp.maximum(
                params["trapDensity"] - ct, 0.0
            ) * V
        if self.options["transient"]:
            d2, r2 = disc.transient_term(
                mesh, c, state["charge_N1"], self.options["timeStep"]
            )
            diag_cell = diag_cell + d2
            r_cell = r_cell + r2
        A, r = assembly.assemble(mesh, flux, r_cell=r_cell, diag_cell=diag_cell)
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            valid = bcvals[f"{g[1]}:__valid"]
            scale = D_f[sl] * mesh.face_e_over_d[sl]
            A, r = bck.extrapolation_rows(mesh, A, r, gc, c, valid, scale)
        A, r = assembly.identity_unowned_rows(mesh, A, r)
        return A, r

    # ------------------------------------------------- trap-band tunneling

    def _setup_tunneling_paths(self) -> None:
        """Static per-cell descent paths along the tunneling axis.

        TPU-native replacement for the reference's per-cell while-loop walk
        (TrapBandTunnelingDiscretization.h:96-160): the walk only depends
        on mesh topology, so the chains are precomputed on the host once;
        the per-step WKB transmission then vectorizes over all cells.
        """
        if self._dist:
            raise ConfigError("trap-band tunneling: dist support pending")
        mesh = self.mesh
        axis = int(self.options["tunnelingDirection"])
        L = int(self.options["tunnelingMaxSteps"])
        nc_i = mesh.n_interior_cells
        if mesh.host is not None:
            cc = mesh.host.cell_centroid
            nbr, msk = mesh.host.cf_nbr, mesh.host.cf_mask
        else:
            cc = np.asarray(mesh.cell_centroid)
            nbr = np.asarray(mesh.cf_nbr).T  # device tables are (K, n)
            msk = np.asarray(mesh.cf_mask).T
        # most-positive-ds interior neighbor per cell: the reference's
        # "neighborUp" walk ascends the tunneling axis (:125-131)
        ds = cc[nbr, axis] - cc[:, axis][:, None]
        ds = np.where(msk & (nbr < nc_i), ds, -np.inf)
        down = nbr[np.arange(len(nbr)), np.argmax(ds, axis=1)]
        has_up = np.isfinite(ds.max(axis=1)) & (ds.max(axis=1) > 0)
        down = np.where(has_up, down, np.arange(len(nbr)))  # self-loop stop
        path = np.empty((nc_i, L), dtype=np.int32)
        path[:, 0] = np.arange(nc_i)
        for k in range(1, L):
            path[:, k] = down[path[:, k - 1]]
        self.params["tun_path"] = jnp.asarray(path)
        self.params["tun_s"] = jnp.asarray(
            cc[:, axis], mesh.cell_volume.dtype
        )

    def _tunneling_rates(self, mesh, params, state, E):
        """(rate, exit_cell, found) per interior cell: WKB transmission to
        the first path cell whose conduction band falls below the trap
        level (reference :141-235, vectorized over cells)."""
        opts = self.options
        phi = state["potential"]
        Ec = float(self.vc["bandOffset"]) - phi
        depth = float(self.vc["trapDepth"])
        wkb = float(self.vc["wkbFactor"])
        scale = float(self.vc["tunnelingRateScale"])
        path = params["tun_path"]  # (nc_i, L)
        nc_i = mesh.n_interior_cells
        en = Ec[:nc_i] - depth  # (nc_i,)
        pEc = Ec[path]  # (nc_i, L)
        ps = params["tun_s"][path]
        barrier = jnp.maximum(pEc - en[:, None], 0.0)
        dX = jnp.abs(ps[:, 1:] - ps[:, :-1])
        inc = (
            wkb
            * jnp.sqrt(0.5 * (barrier[:, 1:] + barrier[:, :-1]))
            * dX
        )  # wkb < 0 in physical units
        logT = jnp.concatenate(
            [jnp.zeros((nc_i, 1), inc.dtype), jnp.cumsum(inc, axis=1)], axis=1
        )
        exit_mask = (pEc < en[:, None]) & (
            jnp.arange(path.shape[1])[None, :] > 0
        )
        found = jnp.any(exit_mask, axis=1)
        idx = jnp.argmax(exit_mask, axis=1)  # first True
        T = jnp.exp(jnp.take_along_axis(logT, idx[:, None], axis=1)[:, 0])
        exit_cell = jnp.take_along_axis(path, idx[:, None], axis=1)[:, 0]
        e2 = jnp.sum(E[:nc_i] * E[:nc_i], axis=1)
        alpha = scale * mesh.cell_volume[:nc_i] * e2
        rate = jnp.where(found, alpha * T, 0.0)
        return rate, exit_cell, found

    def _build_step(self):
        opts = self.options
        psolver = opts["electrostaticsLinearSolver"]
        csolver = opts["chargeLinearSolver"]

        def step(mesh, params, state, bcvals):
            aux = {}
            if opts["electrostatics_enable"]:
                A, r = self._linearize_potential(mesh, params, state, bcvals)
                aux["rnorm"] = A.norm(r)
                dx, _ = psolver.solve_fn(A, r, jnp.zeros_like(r))
                state = dict(state, potential=state["potential"] + dx)
            else:
                aux["rnorm"] = jnp.asarray(0.0, state["potential"].dtype)
            phi = maybe_sync(mesh, state["potential"])
            if "grad_coeff" in params:
                E = -gradient(mesh, params["grad_coeff"], phi)
            else:
                E = jnp.zeros((mesh.n_cells, mesh.dim), phi.dtype)
            aux["E"] = E
            if opts["chargetransport_enable"]:
                Ac, rc = self._linearize_charge(
                    mesh, params, state, bcvals, maybe_sync(mesh, E)
                )
                aux["charge_rnorm"] = Ac.norm(rc)
                dc, _ = csolver.solve_fn(Ac, rc, jnp.zeros_like(rc))
                state = dict(state, charge=state["charge"] + dc)
                if opts["trapping_enable"] and opts["transient"]:
                    # explicit trap update over the step
                    dt = opts["timeStep"]
                    c_new = state["charge"]
                    ct = state["trapped"]
                    cap = params["k_cap"] * c_new * jnp.maximum(
                        params["trapDensity"] - ct, 0.0
                    )
                    em = self._emission_rate(params, maybe_sync(mesh, E)) * ct
                    trapped = jnp.maximum(
                        state["trapped_N1"] + dt * (cap - em), 0.0
                    )
                    if opts["trapbandtunneling_enable"]:
                        # de-trap through the band barrier: trapped charge
                        # leaves at rate*ct, reappearing as free charge at
                        # the WKB exit cell (charge-conserving scatter)
                        nc_i = mesh.n_interior_cells
                        rate, exit_cell, found = self._tunneling_rates(
                            mesh, params, state, E
                        )
                        dq = jnp.minimum(rate * dt, 1.0) * trapped[:nc_i]
                        trapped = trapped.at[:nc_i].add(-dq)
                        moved = dq * mesh.cell_volume[:nc_i]
                        gain = jnp.zeros(mesh.n_cells, dq.dtype).at[
                            exit_cell
                        ].add(moved)
                        gain = gain / jnp.maximum(mesh.cell_volume, 1e-300)
                        state = dict(state, charge=state["charge"] + gain)
                    state = dict(state, trapped=trapped)
            return state, aux

        return step

    # ------------------------------------------------------------------

    def advance(self, niter: int = 1) -> ResidualHistory:
        if not self._initialized:
            raise ConfigError("call init() before advance()")
        opts = self.options
        hist = ResidualHistory()
        bcvals = self._resolve_bcvals()
        chunk = self._chunk_size(niter)
        if chunk:
            def keep_E(last_aux):
                self._E = last_aux["E"]
            return self._advance_chunked(niter, chunk, bcvals, on_aux=keep_E)
        for it in range(niter):
            self.state, aux = self._step(self.mesh, self.params, self.state, bcvals)
            self._E = aux["E"]
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
            raise ConfigError("ElectricModel: transient option is off")
        self.state["charge_N1"] = self.state["charge"]
        self.state["trapped_N1"] = self.state["trapped"]

    def getTrappedCharge(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["trapped"])
        return np.asarray(self.state["trapped"][: self.mesh.n_interior_cells])

    def getPotential(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["potential"])
        return np.asarray(self.state["potential"][: self.mesh.n_interior_cells])

    def getElectricField(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self._E)
        return np.asarray(self._E[: self.mesh.n_interior_cells])

    def getCharge(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state["charge"])
        return np.asarray(self.state["charge"][: self.mesh.n_interior_cells])
