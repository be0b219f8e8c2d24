"""Phonon reflecting walls + two-material interface transmission.

Reference parity targets:
  - "reflecting" BC with specifiedReflection blending specular/diffuse
    (reference: phononbase/PhononModel.h:228-260 wall setup,
    PhononBoundary.h:69-155 applyReflectingWall).
  - two-material interface with per-band transmissivities / DMM
    detailed-balance defaults (reference: phononbase/COMETInterface.h:44
    makeDMMcoeffs; transmissivities user-set per frequency bin via
    Kspace::setTransmission, Kspace.h:1000).

Exact solutions: in the ballistic limit (tau -> inf) each directional
energy is constant along characteristics, so a 1D two-slab problem
between isothermal walls has a closed-form, quadrature-independent
lattice temperature in each slab:

    theta_L = theta_hot (2 - t_LR) / 2
    theta_R = theta_hot  t_RL / 2      (cold wall at the reference T)

using detailed balance t_RL = t_LR * C_L vg_L / (C_R vg_R).  The
interface closure conserves the energy flux to round-off by
construction.
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.kinetic.phonon import PhononModel
from fvm_tpu.mesh.generate import quad_2d


def _slab_model(wall="Symmetry", refl=1.0, tau=0.05, n=10, bands=None):
    mesh = quad_2d(n, n)
    dm = fvm.mesh.build_device_mesh(mesh)
    p = PhononModel(dm, n_polar=4, n_azimuthal=8, bands=bands)
    p.options["verbose"] = False
    p.options["relativeTolerance"] = 1e-11
    p.vc["relaxationTime"] = tau
    p.bc["left"].bc_type = "Isothermal"
    p.bc["left"]["specifiedTemperature"] = 310.0
    p.bc["right"].bc_type = "Isothermal"
    p.bc["right"]["specifiedTemperature"] = 300.0
    for g in ("top", "bottom"):
        p.bc[g].bc_type = wall
        if wall == "Reflecting":
            p.bc[g]["specifiedReflection"] = refl
    p.init()
    p.advance(6)
    return p


def test_reflecting_wall_limits():
    """refl=1 reproduces the pure-specular (Symmetry) solution; refl=0
    reproduces the pure-diffuse (Adiabatic) solution (gray, where the
    per-band and total-flux redistributions coincide)."""
    T_sym = _slab_model("Symmetry").getTemperature()
    T_r1 = _slab_model("Reflecting", refl=1.0).getTemperature()
    np.testing.assert_allclose(T_r1, T_sym, rtol=0, atol=1e-8)

    T_adi = _slab_model("Adiabatic").getTemperature()
    T_r0 = _slab_model("Reflecting", refl=0.0).getTemperature()
    np.testing.assert_allclose(T_r0, T_adi, rtol=0, atol=1e-8)

    # intermediate blends stay bracketed and physical
    T_h = _slab_model("Reflecting", refl=0.5).getTemperature()
    assert 300.0 - 1e-6 <= T_h.min() and T_h.max() <= 310.0 + 1e-6


def test_reflecting_wall_energy_conservation():
    """Reflecting side walls carry zero net energy (per band, any refl):
    the flux in from the hot wall leaves through the cold wall."""
    p = _slab_model("Reflecting", refl=0.37, bands=[(0.6, 3.0, 0.02),
                                                    (0.4, 1.0, 0.2)])
    q_left = p.getHeatFluxIntegral("left")
    q_right = p.getHeatFluxIntegral("right")
    q_top = p.getHeatFluxIntegral("top")
    q_bot = p.getHeatFluxIntegral("bottom")
    scale = abs(q_left)
    assert scale > 1e-6
    assert abs(q_top) < 1e-8 * scale
    assert abs(q_bot) < 1e-8 * scale
    assert abs(q_left + q_right) < 1e-7 * scale


def _two_slab(t_LR=None, mats=((1.0, 1.0), (1.0, 1.0)), tau=1e8,
              nx=12, ny=4, partition_shards=None, dsa=False,
              inner_its=200):
    """Two slabs on [0,2]x[0,1] split at x=1; ballistic by default."""
    m = quad_2d(nx, ny, lx=2.0, ly=1.0)
    import fvm_tpu.mesh.metrics as metrics

    geom = metrics.compute_geometry(m)
    xc = geom.cell_centroid[: m.n_interior_cells, 0]
    left = xc < 1.0
    faces = m.interface_faces_between(left, ~left)
    m2 = m.make_interface("mid", faces, left_cells=left)

    (CL, vL), (CR, vR) = mats
    per_cell = not (CL == CR and vL == vR)
    if per_cell:
        C = np.where(left, CL, CR)
        vg = np.where(left, vL, vR)
        bands = [(C, vg, tau)]
    else:
        bands = [(CL, vL, tau)]

    if partition_shards:
        from fvm_tpu.parallel import Partition

        part = Partition(m2, partition_shards)
        p = PhononModel(part.sharded_mesh, 4, 8, bands=bands,
                        partition=part)
    else:
        part = None
        p = PhononModel(fvm.mesh.build_device_mesh(m2), 4, 8, bands=bands)
    p.options["verbose"] = False
    p.options["relativeTolerance"] = 1e-11
    # DSA targets the acoustically thick regime; in the ballistic limit
    # the synthetic-diffusion correction only slows the inner Krylov
    p.options["coarseAcceleration"] = dsa
    p.options["innerIterations"] = inner_its
    if t_LR is not None:
        p.interface["mid"] = {"t_LR": t_LR}
    p.bc["left"].bc_type = "Isothermal"
    p.bc["left"]["specifiedTemperature"] = 310.0
    p.bc["right"].bc_type = "Isothermal"
    p.bc["right"]["specifiedTemperature"] = 300.0
    p.bc["top"].bc_type = "Symmetry"
    p.bc["bottom"].bc_type = "Symmetry"
    p.init()
    p.advance(8)
    return p, left


def test_interface_ballistic_jump_equal_materials():
    """Ballistic two-slab with specified t: T_L = 310 - 5t, T_R = 300 +
    5t exactly (tau=1e8 leaves O(1e-8) relaxation contamination)."""
    t = 0.6
    p, left = _two_slab(t_LR=t)
    T = p.getTemperature()
    np.testing.assert_allclose(T[left], 310.0 - 5.0 * t, rtol=1e-6)
    np.testing.assert_allclose(T[~left], 300.0 + 5.0 * t, rtol=1e-6)
    qL = p.getHeatFluxIntegral("mid:L")
    qR = p.getHeatFluxIntegral("mid:R")
    assert abs(qL + qR) < 1e-10 * abs(qL)  # exact transmission balance
    # continuity with the domain walls
    q_in = p.getHeatFluxIntegral("left")
    assert abs(q_in + qL) < 1e-6 * abs(qL)


def test_interface_tbr_diffusive_limit():
    """Acoustically thick two-slab: the interface temperature jump
    matches the analytic radiative-slip thermal boundary resistance
    R = 4(1-t)/(t C vg) (two-flux / Marshak analysis of the diffuse
    transmission closure; gray, equal materials)."""
    t, tau = 0.5, 0.1
    p, left = _two_slab(t_LR=t, tau=tau, nx=200, ny=2, dsa=True,
                        inner_its=600)
    T = p.getTemperature()
    ni = p.mesh.n_interior_cells
    cc = np.asarray(p.mesh.cell_centroid[:ni])
    q_flux = p.getHeatFluxIntegral("mid:L")  # area = ly = 1

    def fit_at_interface(mask, lo, hi):
        sel = mask & (cc[:, 0] > lo) & (cc[:, 0] < hi)
        coef = np.polyfit(cc[sel, 0], T[sel], 1)
        return np.polyval(coef, 1.0), coef[0]

    T_Li, slope_L = fit_at_interface(left, 0.4, 0.9)
    T_Ri, slope_R = fit_at_interface(~left, 1.1, 1.6)
    # bulk slope = -q/k up to the first-order upwind numerical
    # diffusivity (~ vg dx/4 = 7% of k at this resolution)
    k = tau / 3.0  # C vg^2 tau / 3
    np.testing.assert_allclose(slope_L, -q_flux / k, rtol=0.10)
    np.testing.assert_allclose(slope_R, -q_flux / k, rtol=0.10)
    jump = T_Li - T_Ri
    R_analytic = 4.0 * (1.0 - t) / t  # C = vg = 1
    np.testing.assert_allclose(jump, q_flux * R_analytic, rtol=0.05)


def test_interface_dmm_dissimilar_materials():
    """Dissimilar materials with the default DMM split: t_LR = CvR/(CvL+
    CvR) = 3/4, t_RL = 1/4; ballistic T_L = 310 - 5*t_LR, T_R = 300 +
    5*t_RL (detailed balance), flux conserved."""
    p, left = _two_slab(mats=((1.0, 1.0), (3.0, 1.0)))
    T = p.getTemperature()
    np.testing.assert_allclose(T[left], 310.0 - 5.0 * 0.75, rtol=1e-6)
    np.testing.assert_allclose(T[~left], 300.0 + 5.0 * 0.25, rtol=1e-6)
    qL = p.getHeatFluxIntegral("mid:L")
    qR = p.getHeatFluxIntegral("mid:R")
    assert abs(qL + qR) < 1e-10 * abs(qL)

    # detailed balance: equal temperatures -> zero net interface flux
    p0, _ = _two_slab(mats=((1.0, 1.0), (3.0, 1.0)))
    p0.bc["left"]["specifiedTemperature"] = 300.0
    p0.advance(8)
    scale = abs(qL)
    assert abs(p0.getHeatFluxIntegral("mid:L")) < 1e-8 * scale


def test_interface_dist_matches_single():
    """Distributed (2-shard) equal-material interface solve matches the
    single-device temperatures."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    p1, _ = _two_slab(t_LR=0.6, tau=0.1)
    T1 = p1.getTemperature()
    pN, _ = _two_slab(t_LR=0.6, tau=0.1, partition_shards=2)
    TN = pN.getTemperature()
    np.testing.assert_allclose(TN, T1, rtol=0, atol=1e-7)


def test_scattering_matrix_rta_equivalence():
    """scattering_matrix = diag(1/tau) reproduces the RTA solve exactly
    (reference: phononbase/ScatteringKernel.h:14 — the full three-phonon
    operator whose RTA limit is the diagonal)."""
    from fvm_tpu.kinetic.phonon import rta_scattering_matrix

    def run(M=None):
        mesh = quad_2d(10, 6)
        dm = fvm.mesh.build_device_mesh(mesh)
        bands = [(0.6, 2.0, 0.05), (0.4, 1.0, 0.2)]
        p = PhononModel(dm, 4, 8, bands=bands, scattering_matrix=M)
        p.options["verbose"] = False
        p.options["relativeTolerance"] = 1e-11
        p.options["coarseAcceleration"] = False
        p.options["innerIterations"] = 300
        p.bc["left"].bc_type = "Isothermal"
        p.bc["left"]["specifiedTemperature"] = 310.0
        p.bc["right"].bc_type = "Isothermal"
        p.bc["right"]["specifiedTemperature"] = 300.0
        p.bc["top"].bc_type = "Symmetry"
        p.bc["bottom"].bc_type = "Symmetry"
        p.init()
        p.advance(6)
        return p.getTemperature()

    T_rta = run()
    M = rta_scattering_matrix([0.05, 0.2], D=32, B=2)
    T_mat = run(M)
    np.testing.assert_allclose(T_mat, T_rta, rtol=0, atol=1e-8)


def test_scattering_matrix_full_conserves_energy():
    """A dense (off-diagonal) detailed-balance-corrected collision
    matrix: COMET converges, the interface-free two-wall slab conserves
    the energy flux exactly, and T stays bracketed by the wall
    temperatures (the conserving projection is what guarantees it,
    reference ScatteringKernel.h:1721 correctDetailedBalance)."""
    from fvm_tpu.kinetic.phonon import (
        detailed_balance_correct, rta_scattering_matrix, sn_directions,
    )

    D = 32
    rng = np.random.default_rng(5)
    _, w = sn_directions(4, 8)
    # RTA base + 30% random mode-coupling, projected to conservation
    M = rta_scattering_matrix(0.1, D=D) + 0.3 * rng.random((D, D)) / D
    M = detailed_balance_correct(M, w)
    assert np.abs(w @ M).max() < 1e-14  # exact conservation

    mesh = quad_2d(10, 6)
    dm = fvm.mesh.build_device_mesh(mesh)
    p = PhononModel(dm, 4, 8, scattering_matrix=M)
    p.options["verbose"] = False
    p.options["relativeTolerance"] = 1e-10
    p.options["coarseAcceleration"] = False
    p.options["innerIterations"] = 400
    p.bc["left"].bc_type = "Isothermal"
    p.bc["left"]["specifiedTemperature"] = 310.0
    p.bc["right"].bc_type = "Isothermal"
    p.bc["right"]["specifiedTemperature"] = 300.0
    p.bc["top"].bc_type = "Symmetry"
    p.bc["bottom"].bc_type = "Symmetry"
    p.init()
    h = p.advance(8)
    assert h[-1][1] / h[0][1] < 1e-8  # COMET converged
    T = p.getTemperature()
    assert 300.0 - 1e-6 <= T.min() and T.max() <= 310.0 + 1e-6
    qL = p.getHeatFluxIntegral("left")
    qR = p.getHeatFluxIntegral("right")
    assert abs(qL + qR) < 1e-9 * abs(qL)  # steady flux balance


def test_reflecting_wall_dist_matches_single():
    """Distributed (2-shard) Reflecting-wall solve matches single-device
    temperatures (the blended specular/diffuse tables ride params like
    the Symmetry tables; bcvals carry per-shard reflection values)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from fvm_tpu.parallel import Partition

    def run(shards=None):
        mesh = quad_2d(10, 10)
        if shards:
            part = Partition(mesh, shards)
            p = PhononModel(part.sharded_mesh, 4, 8, partition=part)
        else:
            p = PhononModel(fvm.mesh.build_device_mesh(mesh), 4, 8)
        p.options["verbose"] = False
        p.options["relativeTolerance"] = 1e-11
        p.vc["relaxationTime"] = 0.05
        p.bc["left"].bc_type = "Isothermal"
        p.bc["left"]["specifiedTemperature"] = 310.0
        p.bc["right"].bc_type = "Isothermal"
        p.bc["right"]["specifiedTemperature"] = 300.0
        for g in ("top", "bottom"):
            p.bc[g].bc_type = "Reflecting"
            p.bc[g]["specifiedReflection"] = 0.4
        p.init()
        p.advance(6)
        return p.getTemperature()

    T1 = run()
    TN = run(shards=2)
    np.testing.assert_allclose(TN, T1, rtol=0, atol=1e-7)
