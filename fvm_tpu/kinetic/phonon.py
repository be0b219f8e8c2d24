"""Phonon Boltzmann transport (gray or non-gray, relaxation-time approx).

TPU-native counterpart of the reference's phononbase module
(reference: phononbase/PhononModel.h:32 — ``advance`` :530 sweeps the BTE
per direction/mode, ``updateTL`` :302 recovers the lattice temperature;
k-space machinery in Kspace.h:28/pmode.h:18, dispersion bands in
DensityOfStates.h).  Non-gray transport: pass ``bands`` — per-band
(C_b, vg_b, tau_b) — and the directional energies become one
(n_cells, D*B) array; all bands relax toward a COMMON lattice
temperature fixed by total energy conservation (the reference's
updateTL).  The COMET point-coupled solve is the JFNK mode (solver
'COMET': exact rank-1 lattice-T-coupled Jacobian via jax.jvp), playing
the role of phononbase/COMETModel.h's per-cell coupled solves.

Equation per direction d (group velocity vg, relaxation time tau):
    d e''/dt + vg s_d . grad e'' = (e0 - e'') / tau
with the isotropic equilibrium e0 = sum_d w_d e''_d / (4 pi) fixing the
lattice temperature via  e0 = C (T - T_ref) / (4 pi).

The directional energy density is one (n_cells, D) array over an S_N
discrete-ordinate set; the implicit advection+relaxation solve is the same
batched matrix-free operator as the ES-BGK solver.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..core.options import BoundaryCondition, ModelOptions
from ..core import bcs as bck
from ..exceptions import ConfigError
from ..models.base import Model, ResidualHistory
from .esbgk import _KineticOperator


def sn_directions(n_polar: int = 4, n_azimuthal: int = 8):
    """Discrete-ordinate direction set: Gauss-Legendre in cos(theta) x
    uniform azimuth.  Returns (s (D,3), w (D,)) with sum w = 4 pi."""
    mu, wmu = np.polynomial.legendre.leggauss(n_polar)
    phi = (np.arange(n_azimuthal) + 0.5) * 2 * np.pi / n_azimuthal
    wphi = 2 * np.pi / n_azimuthal
    M, P = np.meshgrid(mu, phi, indexing="ij")
    WM, _ = np.meshgrid(wmu, phi, indexing="ij")
    st = np.sqrt(1 - M**2)
    s = np.stack([st * np.cos(P), st * np.sin(P), M], axis=-1).reshape(-1, 3)
    w = (WM * wphi).reshape(-1)
    return s, w


def rta_scattering_matrix(tau, D: int, B: int = 1) -> np.ndarray:
    """The RTA limit of the full scattering operator: diag(1/tau_db)
    over the direction-band axis (d-major, matching the e layout)."""
    tau = np.atleast_1d(np.asarray(tau, float))
    if tau.size == 1:
        tau = np.full(B, float(tau.reshape(())))
    return np.diag(np.tile(1.0 / tau, D))


def detailed_balance_correct(M: np.ndarray, w, B: int = 1) -> np.ndarray:
    """Project a linearized collision matrix onto exact energy
    conservation (reference: phononbase/ScatteringKernel.h:1721
    correctDetailedBalance): the collision term V*M(e0 - e) conserves
    total energy iff every COLUMN of M has zero quadrature-weighted sum
    (w^T M = 0, w the D-major direction-band weights).  Measured
    three-phonon matrices violate this at the data tolerance; the
    rank-1 projection M - w (w^T M)/(w^T w) removes the defect without
    touching the conserving part."""
    M = np.asarray(M, float)
    wdb = np.repeat(np.asarray(w, float), B)
    col = wdb @ M  # (DB,)
    return M - np.outer(wdb, col) / float(wdb @ wdb)


class PhononBC(BoundaryCondition):
    """Boundary kinds (reference: phononbase/PhononModel.h:246-260
    callBoundaryConditions — "temperature" -> Isothermal,
    "reflecting" -> Reflecting; Symmetry/Adiabatic are the pure
    specular / pure diffuse limits kept as named types).

    Reflecting blends specular and diffuse reflection by the
    ``specifiedReflection`` weight (reference:
    PhononBoundary.h:69-155 applyReflectingWall): for each incoming
    direction the ghost carries refl x the specularly mirrored outgoing
    energy plus (1-refl) x the flux-weighted diffuse redistribution of
    ALL outgoing energy.  The redistribution here is PER BAND (each
    band's wall interaction is energy-conserving on its own) — an
    intentional deviation from the reference, whose applyReflectingWall
    computes one GLOBAL diff_refl = tot_in/tot_dk3 summed over all
    k-volumes/modes and so mixes energy across frequency bins."""

    _allowed_types = ("Isothermal", "Symmetry", "Adiabatic", "Reflecting")
    _defaults = {
        "specifiedTemperature": 300.0,
        "specifiedReflection": 1.0,
    }


class PhononVC(BoundaryCondition):
    _defaults = {
        "initialTemperature": 300.0,
        "referenceTemperature": 300.0,
        "specificHeat": 1.0,  # C, volumetric
        "groupVelocity": 1.0,  # vg
        "relaxationTime": 0.1,  # tau
    }


class PhononModelOptions(ModelOptions):
    _defaults = {
        "transient": False,
        "timeStep": 0.05,
        "relativeTolerance": 1e-7,
        "absoluteTolerance": 1e-14,
        "innerIterations": 80,
        "innerTolerance": 1e-8,
        # "COMET": point-coupled solve — JFNK outer (exact Jacobian incl.
        # lattice-temperature feedback and boundary closures, which for the
        # linear BTE converges in 1-2 outer iterations) with the rank-1
        # Sherman-Morrison collision preconditioner (reference:
        # phononbase/COMETModel.h:22; coarse acceleration at :1080).
        # "sweep": segregated Picard iteration (PhononModel.h:530).
        "solver": "COMET",
        # diffusion synthetic acceleration: compose the point (Woodbury)
        # preconditioner with an AMG-cycled scalar diffusion correction on
        # the equilibrium subspace (k_eff = sum C vg^2 tau / 3) — the TPU
        # counterpart of the reference's geometric coarse-model hierarchy
        # (COMETModel.h:1080 MakeCoarseModel, :2800-2985 cycle), which is
        # what keeps iteration counts bounded in the acoustically thick
        # regime.  Single-device COMET only (dist falls back to plain
        # Woodbury).
        "coarseAcceleration": True,
        "verbose": True,
    }


class PhononModel(Model):
    name = "PhononModel"
    # double-shell interfaces (mesh.make_interface) carry the two-material
    # transmission closure; options per interface name in self.interface:
    # {"t_LR": per-band L->R transmissivity, "t_RL": ...} — absent entries
    # default to the diffuse-mismatch (DMM) split from the two sides'
    # C*vg and detailed balance (t_RL = t_LR * C_L vg_L / C_R vg_R)
    _supports_interfaces = True

    def __init__(self, mesh: DeviceMesh, n_polar=4, n_azimuthal=8,
                 bands=None, partition=None, ordinate_shards=None,
                 scattering_matrix=None):
        """bands: optional list of (C_b, vg_b, tau_b) tuples for non-gray
        transport; defaults to one band from the VC entries.
        ``ordinate_shards``: shard the direction*band axis of e over that
        many devices (mesh axis 'fvm_v'); XLA GSPMD inserts the psums for
        the lattice-temperature sums and the collective permutes for
        specular mirrors.  Mutually exclusive with spatial partitioning.
        ``scattering_matrix``: (D*B, D*B) linearized FULL collision
        operator M (the reference's three-phonon ScatteringKernel,
        phononbase/ScatteringKernel.h:14, whose type-I/II collision
        connectivities linearize to exactly such a mode-mode matrix):
        the collision term becomes V * M (e0 - e) instead of the RTA
        V (e0 - e)/tau — the RTA is M = diag(1/tau)
        (``rta_scattering_matrix``).  Run measured matrices through
        ``detailed_balance_correct`` first so energy is conserved to
        round-off.  COMET solver, single-device; the (DB, DB) x
        (n_cells, DB) contraction rides the MXU."""
        super().__init__(mesh, partition)
        self.vc = PhononVC()
        s, w = sn_directions(n_polar, n_azimuthal)
        self.s = s  # (D, 3)
        self.w = w  # (D,)
        self.D = len(w)
        self.bands = bands  # resolved in init()
        self.scattering_matrix = scattering_matrix
        self.ordinate_shards = ordinate_shards
        if ordinate_shards and self._dist:
            raise ConfigError(
                "PhononModel: pass ordinate_shards to the Partition for "
                "combined spatial x ordinate sharding (2D device mesh), "
                "not to the model"
            )

    def _make_options(self):
        return PhononModelOptions()

    def _make_bc(self):
        return PhononBC()

    # ------------------------------------------------------------------

    def _extend_cells(self, v):
        """(n_interior,) or shorter cell array -> (n_cells,) with each
        boundary/interface ghost carrying its OWNER's value (the ghost
        belongs to the owner's material) and padding cells set to the
        first value (inert)."""
        mesh = self.mesh
        v = np.asarray(v, float)
        out = np.full(mesh.n_cells, float(v.flat[0]))
        n = min(v.shape[0], mesh.n_cells)
        out[:n] = v[:n]
        if v.shape[0] < mesh.n_cells:
            nif = mesh.n_interior_faces
            fc0 = np.asarray(mesh.face_cell0)[nif:]
            gh = mesh.n_interior_cells + np.arange(mesh.n_faces - nif)
            out[gh] = out[fc0]
        return out

    def _band_arrays(self):
        """Per-band (C, vg, tau) — each (B,) for spatially uniform
        materials, or (n_cells, B) when any band entry is a per-cell
        array (multi-material meshes, e.g. across a phonon interface;
        the reference couples dissimilar materials as separate meshes
        with their own Kspace, COMETInterface.h:44 — here they are cell
        zones of one mesh with cell-valued dispersion)."""
        cached = getattr(self, "_bands_cache", None)
        if cached is not None:
            return cached
        if self.bands is None:
            self.bands = [(
                float(self.vc["specificHeat"]),
                float(self.vc["groupVelocity"]),
                float(self.vc["relaxationTime"]),
            )]

        def col(i):
            vals = [b[i] for b in self.bands]
            if any(np.ndim(v) > 0 for v in vals):
                return np.stack(
                    [
                        self._extend_cells(
                            np.broadcast_to(
                                np.asarray(v, float),
                                (self.mesh.n_interior_cells,),
                            )
                            if np.ndim(v) == 0
                            else v
                        )
                        for v in vals
                    ],
                    axis=-1,
                )
            return np.array([float(v) for v in vals])

        self._bands_cache = (col(0), col(1), col(2))
        return self._bands_cache

    def _e0_of_T(self, T, C=None):
        """Per-band equilibrium (..., B) from lattice temperature.
        ``C`` overrides the specific-heat array (cell-sliced for ghost
        rows on per-cell-material meshes)."""
        if C is None:
            C, _, _ = self._band_arrays()
        Tref = float(self.vc["referenceTemperature"])
        T = jnp.asarray(T)
        C = jnp.asarray(C)
        if C.ndim > 1 and C.shape[0] != T.shape[-1]:
            C = C[: T.shape[-1]]
        return (T[..., None] - Tref) * C / (4.0 * np.pi)

    def temperature(self, e=None):
        """Lattice temperature from total energy (reference updateTL).

        With no argument, distributed states are gathered to the global
        interior ordering first."""
        if e is None:
            e = self.state["e"]
            if self._dist:
                e = jnp.asarray(self.partition.gather_cells(e))
        C, _, _ = self._band_arrays()
        Tref = float(self.vc["referenceTemperature"])
        w = jnp.asarray(self.w, e.dtype)
        B = C.shape[-1]
        eb = e.reshape(e.shape[0], self.D, B)
        etot = jnp.einsum("cdb,d->c", eb, w)
        if C.ndim > 1:  # per-cell material
            Csum = jnp.asarray(C.sum(axis=-1), e.dtype)[: e.shape[0]]
        else:
            Csum = float(C.sum())
        return Tref + etot / Csum

    def getTemperature(self) -> np.ndarray:
        T = self.temperature()
        if self._dist:
            return np.asarray(T)  # already gathered to global interior
        return np.asarray(T[: self.mesh.n_interior_cells])

    def heat_flux(self) -> np.ndarray:
        """q = sum_b vg_b sum_d w_d s_d e''_bd, (n_interior, 3)."""
        e = self.state["e"]
        if self._dist:
            e = jnp.asarray(self.partition.gather_cells(e))
        C, vg, tau = self._band_arrays()
        w = jnp.asarray(self.w, e.dtype)
        s = jnp.asarray(self.s, e.dtype)
        B = C.shape[-1]
        eb = e.reshape(e.shape[0], self.D, B)
        if np.ndim(vg) > 1:  # per-cell material
            q = jnp.einsum(
                "cdb,cb,d,di->ci", eb,
                jnp.asarray(vg[: e.shape[0]], e.dtype), w, s,
            )
        else:
            q = jnp.einsum("cdb,b,d,di->ci", eb, jnp.asarray(vg), w, s)
        if self._dist:
            return np.asarray(q)  # gathered input -> global interior rows
        return np.asarray(q[: self.mesh.n_interior_cells])

    def getHeatFluxIntegral(self, group_name: str) -> float:
        """Net energy flux OUT through a boundary/interface group,
        sum_f sum_db w_db (vg s . A)_f e_upwind (reference:
        PhononModel.h:623 HeatFluxIntegral).  Single-device."""
        if self._dist:
            raise ConfigError(
                "getHeatFluxIntegral: single-device states only"
            )
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        e = self._refresh_ghosts(mesh, self.params, self.state["e"], bcvals)
        g = mesh.group_by_name(group_name)
        sl = mesh.group_faces(g)
        gc = mesh.ghost_cells_of_group(g)
        eo = e[mesh.face_cell0[sl]]
        eg = e[gc]
        wB = jnp.repeat(jnp.asarray(self.w, e.dtype), self.B)
        return float(
            jnp.sum(
                wB
                * (
                    self.params["dO"][sl] * eo
                    + self.params["dN"][sl] * eg
                )
            )
        )

    # ------------------------------------------------------------------

    def init(self) -> None:
        mesh = self.mesh
        dtype = mesh.cell_volume.dtype
        C, vg, tau = self._band_arrays()
        B = C.shape[-1]
        self.B = B
        self._per_cell = C.ndim > 1 or np.ndim(vg) > 1 or np.ndim(tau) > 1
        if self._per_cell and (self._dist or self.ordinate_shards):
            raise ConfigError(
                "PhononModel: per-cell material properties are "
                "single-device only"
            )
        self._scat = None
        if self.scattering_matrix is not None:
            M = np.asarray(self.scattering_matrix, float)
            DB = self.D * B
            if M.shape != (DB, DB):
                raise ConfigError(
                    f"PhononModel: scattering_matrix must be ({DB}, {DB})"
                )
            if self._dist or self.ordinate_shards or self._per_cell:
                raise ConfigError(
                    "PhononModel: scattering_matrix is single-device, "
                    "uniform-material only"
                )
            if str(self.options["solver"]).upper() != "COMET":
                raise ConfigError(
                    "PhononModel: scattering_matrix requires the COMET "
                    "solver (the sweep path Picard-lags only the RTA "
                    "term)"
                )
            if np.diag(M).min() <= 0.0:
                raise ConfigError(
                    "PhononModel: scattering_matrix needs a positive "
                    "diagonal (relaxation rates)"
                )
            self._scat = jnp.asarray(M, dtype)
        T0 = self._cell_field(self.vc, "initialTemperature")
        e0 = self._e0_of_T(T0)  # (..., nc, B)
        self.state = {
            "e": jnp.tile(
                e0[..., None, :], (1,) * (e0.ndim - 1) + (self.D, 1)
            ).reshape(*e0.shape[:-1], self.D * B)
        }
        if self.options["transient"]:
            self.state["e_N1"] = self.state["e"]
        # tau_db is a shard-independent (D*B,) constant: closed over by the
        # step (implicitly replicated), NOT in params (P(axis) would split
        # it).  Per-cell materials carry (n_cells, D*B) instead.
        if np.ndim(tau) > 1:
            self._tau_db = jnp.asarray(
                np.tile(tau[:, None, :], (1, self.D, 1)).reshape(
                    mesh.n_cells, -1
                ),
                dtype,
            )
        else:
            self._tau_db = jnp.tile(
                jnp.asarray(tau, dtype)[None, :], (self.D, 1)
            ).reshape(-1)
        s = jnp.asarray(self.s, dtype)
        sA = jnp.einsum("...fd,nd->...fn", mesh.face_area, s[:, : mesh.dim])
        if np.ndim(vg) > 1:
            # face group velocity = the OWNER cell's (faces strictly
            # inside a zone see that zone's vg; interface faces are split
            # into per-side groups whose owners are their own side)
            vgO = jnp.asarray(vg, dtype)[mesh.face_cell0]  # (nf, B)
            mdot = (sA[..., :, None] * vgO[..., None, :]).reshape(
                *sA.shape[:-1], self.D * B
            )
        else:
            mdot = (
                sA[..., :, None] * jnp.asarray(vg, dtype)[None, None, :]
            ).reshape(*sA.shape[:-1], self.D * B)
        # face-sized, per-shard: flows through params so shard_map shards it
        self.params = {
            "dO": jnp.maximum(mdot, 0.0),
            "dN": jnp.minimum(mdot, 0.0),
        }
        # specular reflection tables for arbitrary wall orientations
        # (reference: KineticBoundaryConditions.h; see esbgk) — the
        # reflected direction is redistributed onto the spherical
        # ordinate set, exact nearest-match on axis-aligned walls
        from .quadrature import reflection_tables

        fa = np.asarray(mesh.face_area)
        for g, bc in self._group_bcs():
            if bc.bc_type not in ("Symmetry", "Reflecting"):
                continue
            sl = mesh.group_faces(g)
            fa_g = fa[..., sl, :]

            def tables(fa2d):
                n3 = np.zeros((fa2d.shape[0], 3))
                n3[:, : mesh.dim] = fa2d
                return reflection_tables(self.s, n3, weights=self.w)

            if fa_g.ndim == 3:
                pairs = [tables(fa_g[d_]) for d_ in range(fa_g.shape[0])]
                idx = np.stack([p[0] for p in pairs])
                wgt = np.stack([p[1] for p in pairs])
            else:
                idx, wgt = tables(fa_g)
            self.params[f"refl_idx:{g[1]}"] = jnp.asarray(idx)
            self.params[f"refl_w:{g[1]}"] = jnp.asarray(wgt, dtype)
        self._init_interfaces(C, vg, dtype)
        if self._dist:
            self.state = self.partition.device_put(self.state)
            self.params = self.partition.device_put(self.params)
            if getattr(self.partition, "ordinate_shards", 1) > 1:
                self._combined_ordinate_put(("e", "e_N1"), ("dO", "dN"))
        if self.ordinate_shards:
            self._shard_ordinates(
                ("e", "e_N1"), ("dO", "dN"), self.ordinate_shards
            )
        self._step_raw = self._build_step()
        self._step = self._wrap_step(self._step_raw)
        self._initial_norm = None
        self._initialized = True

    def _init_interfaces(self, C, vg, dtype):
        """Resolve per-interface transmissivity tables (see
        _interface_ghosts).  Spatially uniform materials keep (1, B)
        closure constants (shard-replicated under shard_map); per-cell
        materials resolve per-face (count, B) tables from each side's
        OWNER material."""
        mesh = self.mesh
        self._ifc = {}
        for nm, _, _ in getattr(mesh, "interfaces", ()):
            gL, gR = mesh.interface(nm)
            opts = self.interface.get(nm) or {}
            Cv = np.asarray(C, float) * np.asarray(vg, float)
            if self._per_cell:
                fc0 = np.asarray(mesh.face_cell0)
                oL = fc0[mesh.group_faces(gL)]
                oR = fc0[mesh.group_faces(gR)]
                CvL, CvR = Cv[oL], Cv[oR]  # (count, B)
                vgb = np.broadcast_to(
                    np.asarray(vg, float), Cv.shape
                )
                vgL, vgR = vgb[oL], vgb[oR]
            else:
                CvL = CvR = Cv[None, :]  # (1, B)
                vgL = vgR = np.asarray(vg, float)[None, :]
            t12 = opts.get("t_LR")
            t21 = opts.get("t_RL")
            if t12 is None and t21 is None:
                # DMM: t_{L->R} = C_R vg_R / (C_L vg_L + C_R vg_R)
                t12 = CvR / (CvL + CvR)
                t21 = CvL / (CvL + CvR)
            elif t21 is None:
                t12 = np.broadcast_to(np.asarray(t12, float), CvL.shape)
                t21 = np.clip(t12 * CvL / CvR, 0.0, 1.0)
            elif t12 is None:
                t21 = np.broadcast_to(np.asarray(t21, float), CvR.shape)
                t12 = np.clip(t21 * CvR / CvL, 0.0, 1.0)
            else:
                t12 = np.broadcast_to(np.asarray(t12, float), CvL.shape)
                t21 = np.broadcast_to(np.asarray(t21, float), CvR.shape)
            self._ifc[nm] = (
                jnp.asarray(t12, dtype), jnp.asarray(t21, dtype),
                jnp.asarray(vgL, dtype), jnp.asarray(vgR, dtype),
            )
            if self._dist:
                self.params[f"ifc_valid:{nm}"] = (
                    self.partition.group_valid_mask(gL[1])
                )

    def _refresh_ghosts(self, mesh, params, e, bcvals):
        s3 = jnp.asarray(self.s, e.dtype)
        e = bck.extend_to_ghosts(mesh, e)
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            amag = jnp.maximum(mesh.face_area_mag[sl], 1e-300)
            nhat = jnp.concatenate(
                [
                    mesh.face_area[sl] / amag[:, None],
                    jnp.zeros((g[4], 3 - mesh.dim), e.dtype),
                ],
                axis=1,
            )
            B = self.B
            sn_d = jnp.einsum("nd,fd->fn", s3, nhat)  # (count, D)
            sn = jnp.repeat(sn_d, B, axis=1)  # (count, D*B)
            incoming = sn < 0
            eo = e[mesh.face_cell0[sl]]
            t = bc.bc_type
            if t == "Isothermal":
                Tw = bcvals[f"{g[1]}:specifiedTemperature"]
                Cb, _, _ = self._band_arrays()
                ewb = self._e0_of_T(
                    Tw, C=Cb[gc] if Cb.ndim > 1 else None
                )  # (count, B)
                ew = jnp.tile(ewb[:, None, :], (1, self.D, 1)).reshape(
                    g[4], self.D * B
                )
                e = e.at[gc].set(jnp.where(incoming, ew, eo))
            elif t == "Adiabatic":
                # diffuse reflection with zero net energy flux (per band)
                w = jnp.asarray(self.w, e.dtype)
                wB = jnp.repeat(w, B)
                out_flux = jnp.sum(jnp.where(~incoming, eo * wB * sn, 0.0), axis=1)
                in_unit = jnp.sum(jnp.where(incoming, wB * sn, 0.0), axis=1)
                e_refl = out_flux / jnp.maximum(-in_unit, 1e-300)
                e = e.at[gc].set(jnp.where(incoming, e_refl[:, None], eo))
            elif t == "Reflecting":
                # reflectivity-blended specular/diffuse wall (reference:
                # PhononBoundary.h:69-155 applyReflectingWall; blend
                # weight = specifiedReflection): incoming ghost slots get
                # refl x the specular mirror plus (1-refl) x the
                # PER-BAND flux-conserving diffuse redistribution;
                # outgoing slots are upwinded (e_ghost = e_owner)
                refl = jnp.broadcast_to(
                    jnp.asarray(
                        bcvals[f"{g[1]}:specifiedReflection"], e.dtype
                    ),
                    (g[4],),
                )[:, None]
                idx = params[f"refl_idx:{g[1]}"]  # (L, D, k)
                wgt = params[f"refl_w:{g[1]}"]
                L = idx.shape[0]
                eoB = eo.reshape(L, self.D, B)
                eg_spec = jnp.einsum(
                    "fnk,fnkb->fnb",
                    wgt,
                    eoB[jnp.arange(L)[:, None, None], idx],
                ).reshape(L, self.D * B)
                w = jnp.asarray(self.w, e.dtype)
                wpos = w[None, :] * jnp.maximum(sn_d, 0.0)  # (count, D)
                out_b = jnp.einsum("fd,fdb->fb", wpos, eoB)  # (count, B)
                in_unit = jnp.einsum(
                    "d,fd->f", w, jnp.maximum(-sn_d, 0.0)
                )
                e_diff = out_b / jnp.maximum(in_unit, 1e-300)[:, None]
                e_diff_full = jnp.tile(
                    e_diff[:, None, :], (1, self.D, 1)
                ).reshape(L, self.D * B)
                blend = refl * eg_spec + (1.0 - refl) * e_diff_full
                e = e.at[gc].set(jnp.where(incoming, blend, eo))
            else:  # Symmetry: specular (general orientation)
                idx = params[f"refl_idx:{g[1]}"]  # (L, D, k)
                wgt = params[f"refl_w:{g[1]}"]
                L = idx.shape[0]
                eoB = eo.reshape(L, self.D, B)
                eg = jnp.einsum(
                    "fnk,fnkb->fnb",
                    wgt,
                    eoB[jnp.arange(L)[:, None, None], idx],
                )
                e = e.at[gc].set(eg.reshape(L, self.D * B))
        for nm, _, _ in getattr(mesh, "interfaces", ()):
            e = self._interface_ghosts(mesh, params, e, nm)
        return e

    def _interface_ghosts(self, mesh, params, e, nm):
        """Two-material interface closure: diffuse transmission/reflection
        with per-band transmissivities (reference:
        phononbase/COMETInterface.h:44 makeDMMcoeffs, default
        transmissivities user-set per frequency bin via
        Kspace::setTransmission, Kspace.h:1000 — here per band, with the
        DMM detailed-balance split as the default).

        For each side, incoming ghost slots carry the side's own
        reflected incident flux plus the partner side's transmitted
        incident flux, redistributed DIFFUSELY per band and normalized so
        the emitted energy flux is exactly r*Phi_self + t_partner*
        Phi_partner (energy conservation to round-off for r+t=1).
        Outgoing slots are upwinded.  The i-th face of ``nm:L`` pairs
        with the i-th face of ``nm:R`` (Mesh.make_interface)."""
        t12, t21, vgL, vgR = self._ifc[nm]
        gL, gR = mesh.interface(nm)
        B = self.B
        s3 = jnp.asarray(self.s, e.dtype)
        w = jnp.asarray(self.w, e.dtype)
        valid = params.get(f"ifc_valid:{nm}")

        def side_tables(g):
            sl = mesh.group_faces(g)
            amag = jnp.maximum(mesh.face_area_mag[sl], 1e-300)
            nhat = jnp.concatenate(
                [
                    mesh.face_area[sl] / amag[:, None],
                    jnp.zeros((g[4], 3 - mesh.dim), e.dtype),
                ],
                axis=1,
            )
            sn_d = jnp.einsum("nd,fd->fn", s3, nhat)  # (count, D)
            eo = e[mesh.face_cell0[sl]]  # (count, D*B)
            eoB = eo.reshape(g[4], self.D, B)
            # incident flux per unit area & band (without vg)
            phi_u = jnp.einsum(
                "fd,fdb->fb", w[None, :] * jnp.maximum(sn_d, 0.0), eoB
            )
            inorm = jnp.einsum("d,fd->f", w, jnp.maximum(-sn_d, 0.0))
            return sn_d, eo, phi_u, inorm

        snL, eoL, phiL, inormL = side_tables(gL)
        snR, eoR, phiR, inormR = side_tables(gR)
        for g, sn_d, eo, e_in in (
            (
                gL, snL, eoL,
                ((1.0 - t12) * vgL * phiL + t21 * vgR * phiR)
                / (vgL * jnp.maximum(inormL, 1e-300)[:, None]),
            ),
            (
                gR, snR, eoR,
                ((1.0 - t21) * vgR * phiR + t12 * vgL * phiL)
                / (vgR * jnp.maximum(inormR, 1e-300)[:, None]),
            ),
        ):
            gc = mesh.ghost_cells_of_group(g)
            incoming = jnp.repeat(sn_d, B, axis=1) < 0  # (count, D*B)
            e_in_full = jnp.tile(e_in[:, None, :], (1, self.D, 1)).reshape(
                g[4], self.D * B
            )
            val = jnp.where(incoming, e_in_full, eo)
            if valid is not None:
                val = jnp.where(valid[:, None], val, eo)
            e = e.at[gc].set(val)
        return e

    def _build_dsa(self):
        """DSA coarse-correction tuple (M_T cycles, restriction weights,
        prolongation coefficients, alive mask) — shared by the primal
        step and solve_tangent (the tangent system is the SAME Jacobian,
        so it needs the same temperature-mode acceleration; the Woodbury
        point preconditioner alone stagnates on smooth-T-mode rhs)."""
        from .dsa import build_scalar_diffusion_cycles

        mesh0 = self.mesh
        dtype = mesh0.cell_volume.dtype
        B = self.B
        Cb, vgb, taub = self._band_arrays()
        k_eff = float((Cb * vgb**2 * taub).sum() / 3.0)
        M_T = build_scalar_diffusion_cycles(self, k_eff, ("Isothermal",))
        wE = jnp.repeat(jnp.asarray(self.w, dtype), B)
        pcoef = jnp.tile(
            jnp.asarray(Cb, dtype)[None, :], (self.D, 1)
        ).reshape(-1) / (4.0 * np.pi)
        alive_T = jnp.arange(mesh0.n_cells) < mesh0.n_interior_cells
        return (M_T, wE, pcoef, alive_T)

    def _build_step(self):
        opts = self.options
        inner_it = int(opts["innerIterations"])
        inner_tol = float(opts["innerTolerance"])
        w = jnp.asarray(self.w)

        B = self.B
        Carr, _, _ = self._band_arrays()
        tau_db = self._tau_db

        comet = str(opts["solver"]).upper() == "COMET"

        # ---- DSA coarse machinery (constant; built once, closed over) ----
        # (per-cell-material meshes skip it: the synthetic-diffusion
        # prolongation coefficient C/4pi is spatially uniform in the
        # current cycle machinery; the Woodbury point preconditioner
        # alone remains exact for the local collision coupling)
        scat = getattr(self, "_scat", None)
        dsa = None
        if comet and bool(opts.get("coarseAcceleration", True)) and \
                not self._dist and not self._per_cell and scat is None:
            dsa = self._build_dsa()

        def step(mesh, params, state, bcvals):
            from ..ops.halo import maybe_sync

            e = maybe_sync(mesh, state["e"])
            e = self._refresh_ghosts(mesh, params, e, bcvals)
            # equilibrium: all bands relax toward the COMMON lattice
            # temperature (energy-conserving across bands)
            T = self.temperature(e)
            e0b = self._e0_of_T(T)  # (nc, B)
            e0 = jnp.tile(e0b[:, None, :], (1, self.D, 1)).reshape(
                mesh.n_cells, self.D * B
            )
            V = mesh.cell_volume[:, None]
            if scat is not None:
                # full scattering operator: diag(M) plays 1/tau in the
                # implicit diagonal & Woodbury preconditioner; the
                # off-diagonal coupling lives in the exact JFNK residual
                rate = jnp.diag(scat)[None, :]
            else:
                tau = tau_db if tau_db.ndim == 2 else tau_db[None, :]
                rate = 1.0 / tau
            diag_extra = V * rate
            b = V * rate * e0
            if opts["transient"]:
                dt = opts["timeStep"]
                diag_extra = diag_extra + V / dt
                b = b + V / dt * state["e_N1"]
            op_plain = _KineticOperator(
                mesh, params["dO"], params["dN"], diag_extra
            )
            b = jnp.where(op_plain.interior, b, e)
            b = jnp.where(op_plain.owned, b, 0.0)
            r0 = b - op_plain.mv(e)
            rnorm = op_plain.norm(
                jnp.where(op_plain.interior & op_plain.owned, r0, 0.0)
            )

            from ..linear.krylov import BiCGStab, JacobiSolver

            if comet:
                from .esbgk import _JVPOperator, _WoodburyPrecond

                # e0 feedback is rank-1 per band stack:
                #   d e0_{db} / d e_{d'b'} = C_b w_d' / (4 pi sum C)
                dtype = e.dtype
                Vt = jnp.repeat(jnp.asarray(w, dtype), B)[:, None]  # (DB,1)
                alive = op_plain.interior[:, 0] & op_plain.owned[:, 0]
                if Carr.ndim > 1:  # per-cell material
                    Cc = jnp.asarray(Carr, dtype)
                    u_cdb = jnp.tile(
                        Cc[:, None, :], (1, self.D, 1)
                    ).reshape(mesh.n_cells, self.D * B) / (
                        4.0 * np.pi * Cc.sum(axis=-1)[:, None]
                    )
                    U = u_cdb[:, :, None]
                else:
                    Csum = float(Carr.sum())
                    u_db = jnp.tile(
                        jnp.asarray(Carr, dtype)[None, :], (self.D, 1)
                    ).reshape(-1) / (4.0 * np.pi * Csum)
                    U = jnp.broadcast_to(
                        u_db[None, :, None], (mesh.n_cells, self.D * B, 1)
                    )
                U = jnp.where(alive[:, None, None], U, 0.0)
                kappa = jnp.where(alive[:, None], V * rate, 0.0)

                def R(ev):
                    eg = self._refresh_ghosts(mesh, params, ev, bcvals)
                    Tv = self.temperature(ev)
                    e0v = jnp.tile(
                        self._e0_of_T(Tv)[:, None, :], (1, self.D, 1)
                    ).reshape(mesh.n_cells, self.D * B)
                    if scat is not None:
                        # V * M (e0 - e); op_plain.mv already applies the
                        # V*diag(M)*e part, so add it back here
                        bv = V * ((e0v - ev) @ scat.T) + V * rate * ev
                    else:
                        bv = V * rate * e0v
                    if opts["transient"]:
                        bv = bv + (V / opts["timeStep"]) * state["e_N1"]
                    res = bv - op_plain.mv(ev)
                    res = jnp.where(op_plain.interior, res, eg - ev)
                    return jnp.where(op_plain.owned, res, 0.0)

                op = _JVPOperator(op_plain, R, e)
                op_lr = _KineticOperator(
                    mesh, params["dO"], params["dN"], diag_extra,
                    lowrank=(kappa, U, Vt),
                )
                precond = _WoodburyPrecond(op_lr)
                if dsa is not None:
                    from .dsa import DSAPrecond

                    precond = DSAPrecond(precond, *dsa)
                r0 = R(e)
                if scat is not None:
                    # the pre-branch rnorm used the diagonal-only b;
                    # report the true full-scattering residual instead
                    rnorm = op_plain.norm(
                        jnp.where(
                            op_plain.interior & op_plain.owned, r0, 0.0
                        )
                    )
            else:
                op = op_plain
                precond = JacobiSolver(sweeps=2)

            solver = BiCGStab(
                preconditioner=precond,
                relative_tolerance=inner_tol,
                max_iterations=inner_it,
                stall_restart=True,  # see esbgk COMET inner solve
            )
            de, _ = solver.solve_fn(op, r0, jnp.zeros_like(e))
            return dict(state, e=e + de), {"rnorm": rnorm}

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
            raise ConfigError("PhononModel: transient option is off")
        self.state["e_N1"] = self.state["e"]

    # ------------------------------------------------------------------

    def solve_tangent(
        self, param_tangents=None, bc_tangents=None,
        max_iterations: int = 2000, relative_tolerance: float = 1e-10,
    ):
        """Forward sensitivity d(e)/d(tau, BCs) . direction at the
        converged steady COMET state (reference: phononbase built with
        the Tangent atype, models.cpp:10-74).

        J de = dR/dp . dp with J = -dR/de, solved matrix-free with the
        primal's exact-jvp operator (Jacobi-preconditioned BiCGStab).
        ``param_tangents`` accepts "tau" (scalar, (B,) per-band, or
        (D*B,) per direction-band); ``bc_tangents`` is keyed
        "group:entry" (e.g. "left:specifiedTemperature").  Returns d(e)
        on interior cells, (n_interior, D*B), global ordering
        (distributed states run the tangent Krylov per shard under
        shard_map and gather the result)."""
        if not self._initialized:
            raise ConfigError("call init() + advance() before solve_tangent")
        opts = self.options
        if str(opts["solver"]).upper() != "COMET":
            raise ConfigError("solve_tangent requires the COMET solver")
        if opts["transient"]:
            raise ConfigError("solve_tangent: steady states only")
        if self.ordinate_shards:
            raise ConfigError(
                "solve_tangent: ordinate-sharded phonon states not supported"
            )
        if getattr(self, "_scat", None) is not None:
            raise ConfigError(
                "solve_tangent: full scattering-matrix states not supported"
            )
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        e_st = self.state["e"]
        B = self.B

        tau0 = self._tau_db
        dtau = jnp.zeros_like(tau0)
        for k, v in (param_tangents or {}).items():
            if k != "tau":
                raise ConfigError(f"phonon solve_tangent: unknown param {k!r}")
            if getattr(self, "_per_cell", False):
                raise ConfigError(
                    "phonon solve_tangent: tau tangents not supported "
                    "with per-cell material properties"
                )
            v = np.atleast_1d(np.asarray(v, float))
            if v.size == 1:
                v = np.full(self.D * B, float(v.reshape(())))
            elif v.size == B:
                v = np.tile(v[None, :], (self.D, 1)).reshape(-1)
            dtau = jnp.asarray(v, tau0.dtype)

        b_keys = list(bc_tangents or {})
        tan_b = {
            k: jnp.broadcast_to(
                jnp.asarray(v, bcvals[k].dtype), bcvals[k].shape
            )
            for k, v in (bc_tangents or {}).items()
        }

        from .esbgk import _JVPOperator
        from .esbgk import _KineticOperator as _KOp
        from ..linear.krylov import BiCGStab, JacobiSolver

        def tangent_local(lmesh, params_all, e_loc, lbc, tau0_l, dtau_l,
                          ltan_b):
            V = lmesh.cell_volume[:, None]
            R_of = self._comet_R_of(lmesh, params_all, lbc)
            base_b = {k: lbc[k] for k in b_keys}
            _, dr = jax.jvp(
                lambda t, b: R_of(t, b, e_loc), (tau0_l, base_b),
                (dtau_l, ltan_b),
            )
            op_plain = _KOp(
                lmesh, params_all["dO"], params_all["dN"],
                V / (tau0_l if tau0_l.ndim == 2 else tau0_l[None, :]),
            )
            op = _JVPOperator(
                op_plain, lambda ev: R_of(tau0_l, {}, ev), e_loc
            )
            # Jacobi point preconditioner — deliberately NOT the primal's
            # Woodbury/DSA composition: both stagnate BiCGStab on the
            # boundary-concentrated rhs a BC tangent produces (measured:
            # stuck at ~0.1 rel after 4000 iters vs 297 iters to 1e-12
            # with plain Jacobi).  The primal tolerates the stagnation
            # only because outer Newton repeats the solve; the one-shot
            # tangent solve cannot.
            solver = BiCGStab(
                preconditioner=JacobiSolver(sweeps=2),
                relative_tolerance=relative_tolerance,
                max_iterations=max_iterations,
            )
            de, _ = solver.solve_fn(op, dr, jnp.zeros_like(e_loc))
            return de

        if self._dist:
            # tau is shard-independent: replicate per shard so shard_map
            # sees a stacked arg (constants must not ride P(axis) params)
            S = self.partition.n_shards
            stk = lambda a: jnp.broadcast_to(a[None], (S,) + a.shape)
            mapped = self._smap_cells(tangent_local)
            de = mapped(
                mesh, self.params, e_st, bcvals, stk(tau0), stk(dtau), tan_b
            )
            return self.partition.gather_cells(de)
        de = jax.jit(
            lambda: tangent_local(
                mesh, self.params, e_st, bcvals, tau0, dtau, tan_b
            )
        )()
        return np.asarray(de[: mesh.n_interior_cells])

    def solve_tangent_temperature(self, param_tangents=None, bc_tangents=None):
        """d(lattice T)/d(tau, BCs) . direction — chain rule of
        ``temperature()`` through ``solve_tangent``.  Distributed states
        return global-interior-ordered arrays."""
        de_i = jnp.asarray(self.solve_tangent(param_tangents, bc_tangents))
        e_st = self.state["e"]
        if self._dist:
            e_i = jnp.asarray(self.partition.gather_cells(e_st))
        else:
            e_i = e_st[: self.mesh.n_interior_cells]
        _, dT = jax.jvp(lambda e: self.temperature(e), (e_i,), (de_i,))
        return np.asarray(dT)

    def _comet_R_of(self, mesh, params_all, bcvals):
        """Steady phonon COMET residual as a pure function of
        (direction-band tau, BC overrides, full energy density incl.
        ghosts) — jvp gives the tangent linearization, vjp the adjoint.
        (Shard-)local tables come in as arguments so the closure is
        shard_map-able."""
        from .esbgk import _KineticOperator as _KOp
        from ..ops.halo import maybe_sync

        V = mesh.cell_volume[:, None]
        B = self.B

        def R_of(tau_db, b_sub, ev):
            bcv = dict(bcvals, **b_sub)
            tau = tau_db if tau_db.ndim == 2 else tau_db[None, :]
            op = _KOp(mesh, params_all["dO"], params_all["dN"], V / tau)
            # halo slots current before the ghost refresh (periodic
            # partners ride the halo); op.mv re-syncs idempotently
            ev = maybe_sync(mesh, ev)
            eg = self._refresh_ghosts(mesh, params_all, ev, bcv)
            Tv = self.temperature(ev)
            e0v = jnp.tile(
                self._e0_of_T(Tv)[:, None, :], (1, self.D, 1)
            ).reshape(mesh.n_cells, self.D * B)
            res = V / tau * e0v - op.mv(ev)
            res = jnp.where(op.interior, res, eg - ev)
            return jnp.where(op.owned, res, 0.0)

        return R_of

    def solve_adjoint(
        self, functional, param_keys=("tau",), bc_keys=(),
        max_iterations: int = 2000, relative_tolerance: float = 1e-10,
    ):
        """Reverse-mode gradients of a scalar functional of the converged
        steady COMET energy density w.r.t. the per-direction-band
        relaxation times and BC values — every input from ONE transposed
        solve (the reference's Tangent atype, models.cpp:10-74, is
        forward-only).

        ``functional(e_interior) -> scalar`` ((n_interior, D*B) slice;
        it may call ``self.temperature`` — rowwise jnp only).  Returns
        {"tau": (D*B,) gradient} plus per-face arrays for each
        "group:entry" BC key.  Like ``solve_tangent``, the transposed
        Krylov runs Jacobi-preconditioned BiCGStab — the primal's
        Woodbury/DSA composition stagnates on the boundary-concentrated
        profiles adjoint right-hand sides share with BC tangents.
        Distributed: the reverse pass runs per shard under shard_map
        (reversed halo exchange in the transposed operator, psum'd
        Krylov); the functional then sees shard-local owned-interior
        rows and must be sum-decomposable; per-shard tau contributions
        are summed."""
        if not self._initialized:
            raise ConfigError("call init() + advance() before solve_adjoint")
        opts = self.options
        if str(opts["solver"]).upper() != "COMET":
            raise ConfigError("solve_adjoint requires the COMET solver")
        if opts["transient"]:
            raise ConfigError("solve_adjoint: steady states only")
        if self.ordinate_shards:
            raise ConfigError(
                "solve_adjoint: ordinate-sharded phonon states not supported"
            )
        if getattr(self, "_scat", None) is not None:
            raise ConfigError(
                "solve_adjoint: full scattering-matrix states not supported"
            )
        for k in param_keys:
            if k != "tau":
                raise ConfigError(
                    f"phonon solve_adjoint: unknown param {k!r}"
                )
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        e_st = self.state["e"]
        tau0 = self._tau_db
        b_keys = list(bc_keys)
        for k in b_keys:
            if k not in bcvals:
                raise ConfigError(
                    f"phonon solve_adjoint: unknown BC entry {k!r}"
                )

        from .esbgk import _JVPOperator
        from .esbgk import _KineticOperator as _KOp
        from ..linear.base import TransposedOperator
        from ..linear.krylov import BiCGStab, JacobiSolver

        def adjoint_local(lmesh, params_all, e_loc, lbc, tau0_l):
            V = lmesh.cell_volume[:, None]
            n_int = lmesh.n_interior_cells
            R_of = self._comet_R_of(lmesh, params_all, lbc)
            op_plain = _KOp(
                lmesh, params_all["dO"], params_all["dN"],
                V / (tau0_l if tau0_l.ndim == 2 else tau0_l[None, :]),
            )
            gJ = jax.grad(lambda ee: functional(ee[:n_int]))(e_loc)
            # dead padded cells are frozen: zero functional cotangent
            alive = lmesh.cf_mask.any(axis=0)
            gJ = jnp.where(alive[:, None], gJ, 0.0)
            op = _JVPOperator(
                op_plain, lambda ev: R_of(tau0_l, {}, ev), e_loc
            )
            solver = BiCGStab(
                preconditioner=JacobiSolver(sweeps=2),
                relative_tolerance=relative_tolerance,
                max_iterations=max_iterations,
            )
            lam, _ = solver.solve_fn(
                TransposedOperator(op), gJ, jnp.zeros_like(e_loc)
            )
            base_b = {k: lbc[k] for k in b_keys}
            _, vjp_tb = jax.vjp(
                lambda t, b: R_of(t, b, e_loc), tau0_l, base_b
            )
            return vjp_tb(lam)

        if self._dist:
            S = self.partition.n_shards
            mapped = self._smap_cells(adjoint_local)
            gt, gb = mapped(
                mesh, self.params, e_st, bcvals,
                jnp.broadcast_to(tau0[None], (S,) + tau0.shape),
            )
            out = {}
            if "tau" in param_keys:
                out["tau"] = np.asarray(gt).sum(axis=0)
            for k in b_keys:
                out[k] = self.partition.gather_bc(k.split(":")[0], gb[k])
            return out
        gt, gb = jax.jit(
            lambda: adjoint_local(mesh, self.params, e_st, bcvals, tau0)
        )()
        out = {}
        if "tau" in param_keys:
            out["tau"] = np.asarray(gt)
        for k in b_keys:
            out[k] = np.asarray(gb[k])
        return out
