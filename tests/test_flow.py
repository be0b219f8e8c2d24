"""FlowModel (SIMPLE) end-to-end tests.

Mirrors the reference's PARALLEL_CAVITY_* regression intent
(reference: src/fvm/test/PARALLEL_CAVITY_AMG) with analytic/benchmark
checks instead of golden files: exact plane-Poiseuille, lid-driven cavity
vs Ghia et al. (1982) centerline values.
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.flow import FlowModel


def make_flow(mesh, **opts):
    dm = fvm.mesh.build_device_mesh(mesh)
    m = FlowModel(dm)
    m.options["verbose"] = False
    for k, v in opts.items():
        m.options[k] = v
    return m


@pytest.mark.slow
def test_poiseuille_exact():
    """Plane Poiseuille driven by pressure boundaries.

    u(y) = dp/(2 mu L) * y * (H - y); exact for the FVM scheme on a
    uniform orthogonal mesh, so tolerances are tight.
    """
    L, H, dp, mu = 4.0, 1.0, 1.0, 0.1
    m = make_flow(quad_2d(24, 24, lx=L, ly=H), momentumURF=0.8, pressureURF=0.4)
    m.vc["viscosity"] = mu
    m.bc["left"].bc_type = "PressureBoundary"
    m.bc["left"]["specifiedPressure"] = dp
    m.bc["right"].bc_type = "PressureBoundary"
    m.bc["right"]["specifiedPressure"] = 0.0
    m.bc["bottom"].bc_type = "NoSlipWall"
    m.bc["top"].bc_type = "NoSlipWall"
    m.init()
    hist = m.advance(300)
    assert hist[-1][1] / hist[0][1] < 1e-4, "momentum did not converge"
    V = m.getVelocity()
    y = np.asarray(m.mesh.cell_centroid)[: m.mesh.n_interior_cells, 1]
    u_exact = dp / (2 * mu * L) * y * (H - y)
    # ghost-cell wall BC carries O(dy^2) truncation error; ny=24 -> ~1%
    np.testing.assert_allclose(V[:, 0], u_exact, rtol=2.5e-2, atol=1e-4)
    np.testing.assert_allclose(V[:, 1], 0.0, atol=1e-4)
    # mass conservation: inflow + outflow = 0
    min_ = m.getMassFluxIntegral("left")
    mout = m.getMassFluxIntegral("right")
    assert min_ + mout == pytest.approx(0.0, abs=1e-6 * abs(min_))


@pytest.mark.slow
def test_lid_driven_cavity_re100():
    """Re=100 cavity on 32x32 vs Ghia et al. u on the vertical centerline."""
    n = 32
    m = make_flow(quad_2d(n, n), momentumURF=0.7, pressureURF=0.3)
    m.vc["viscosity"] = 0.01  # Re = 1*1/0.01 = 100
    for side in ("left", "right", "bottom"):
        m.bc[side].bc_type = "NoSlipWall"
    m.bc["top"].bc_type = "NoSlipWall"
    m.bc["top"]["specifiedXVelocity"] = 1.0
    m.init()
    hist = m.advance(400)
    mom_rel = hist[-1][1] / hist[0][1]
    cont_rel = hist[-1][2] / max(hist[0][2], 1e-300)
    assert mom_rel < 1e-3, f"momentum residual ratio {mom_rel}"
    V = m.getVelocity().reshape(n, n, 2)
    u_center = V[n // 2, :, 0]  # x = 0.5 column
    # Ghia et al. Re=100: u_min ~ -0.21 near y~0.46 (coarse upwind: looser)
    assert u_center.min() < -0.12
    assert u_center.max() > 0.5  # near the lid
    # global mass balance on every interior cell
    md = np.asarray(m.state["massFlux"])
    div = np.zeros(m.mesh.n_cells)
    np.add.at(div, np.asarray(m.mesh.face_cell0), md)
    np.subtract.at(div, np.asarray(m.mesh.face_cell1), md)
    assert np.abs(div[: m.mesh.n_interior_cells]).max() < 1e-5


def test_inlet_outlet_channel():
    """Uniform inlet -> pressure outlet: mass conservation and sane outflow."""
    m = make_flow(quad_2d(16, 8, lx=2.0), momentumURF=0.8, pressureURF=0.4)
    m.vc["viscosity"] = 0.1
    m.bc["left"].bc_type = "VelocityBoundary"
    m.bc["left"]["specifiedXVelocity"] = 1.0
    m.bc["right"].bc_type = "PressureBoundary"
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(100)
    min_ = m.getMassFluxIntegral("left")
    mout = m.getMassFluxIntegral("right")
    assert min_ == pytest.approx(-1.0, rel=1e-10)  # inflow: negative (into owner)
    assert min_ + mout == pytest.approx(0.0, abs=1e-5)
    # slip walls + uniform inlet => plug flow u=1 everywhere
    V = m.getVelocity()
    np.testing.assert_allclose(V[:, 0], 1.0, rtol=5e-3)


def test_slip_jump_couette():
    """Couette flow with Maxwell slip walls: u(y) = U (y+Ls)/(H+2Ls) with
    slip length Ls = sigma*lambda (reference FlowModelSlipJump.h).
    Equal-pressure ends admit the through-flow; sides must NOT be Symmetry
    (that would force u.n = 0 and kill the Couette profile)."""

    def run(acc):
        m = FlowModel(dm)
        m.options["verbose"] = False
        m.vc["viscosity"] = 1.0
        # pick constants so lambda = mu/p * sqrt(0.5 pi R T) = 0.1:
        # R = 8314.472/molWt = 1, T = 2/pi -> sqrt term = 1, p = 10
        m.options["molecularWeight"] = 8314.472
        m.options["operatingTemperature"] = 2.0 / np.pi
        m.options["operatingPressure"] = 10.0
        m.bc["bottom"].bc_type = "SlipJump"
        m.bc["bottom"]["accomodationCoefficient"] = acc
        m.bc["top"].bc_type = "SlipJump"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.bc["top"]["accomodationCoefficient"] = acc
        m.bc["left"].bc_type = "PressureBoundary"
        m.bc["right"].bc_type = "PressureBoundary"
        m.init()
        m.advance(400)
        return m.getVelocity()

    dm = fvm.mesh.build_device_mesh(quad_2d(4, 16))
    y = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 1]
    Ls = 0.1
    V = run(1.0)
    u_exact = (y + Ls) / (1.0 + 2.0 * Ls)
    np.testing.assert_allclose(V[:, 0], u_exact, atol=3e-3)
    # slip velocity at the bottom wall row is U*Ls/(H+2Ls) > 0
    u_bot = V[:, 0][y < y.min() + 1e-9].mean()
    assert u_bot > 0.5 * Ls / (1 + 2 * Ls)
    # accomodation -> 0 recovers no-slip Couette u = y
    V2 = run(1e-12)
    np.testing.assert_allclose(V2[:, 0], y, atol=3e-3)


def test_coupled_poiseuille_exact():
    """advanceCoupled on plane Poiseuille: same exact solution as SIMPLE,
    reached in far fewer outer iterations (reference FlowModel_impl.h:1474)."""
    L, H, dp, mu = 4.0, 1.0, 1.0, 0.1
    m = make_flow(quad_2d(16, 16, lx=L, ly=H))
    m.vc["viscosity"] = mu
    m.bc["left"].bc_type = "PressureBoundary"
    m.bc["left"]["specifiedPressure"] = dp
    m.bc["right"].bc_type = "PressureBoundary"
    m.bc["right"]["specifiedPressure"] = 0.0
    m.bc["bottom"].bc_type = "NoSlipWall"
    m.bc["top"].bc_type = "NoSlipWall"
    m.init()
    hist = m.advanceCoupled(40)
    assert hist[-1][1] / hist[0][1] < 1e-4, "momentum did not converge"
    V = m.getVelocity()
    y = np.asarray(m.mesh.cell_centroid)[: m.mesh.n_interior_cells, 1]
    u_exact = dp / (2 * mu * L) * y * (H - y)
    np.testing.assert_allclose(V[:, 0], u_exact, rtol=4e-2, atol=1e-4)
    np.testing.assert_allclose(V[:, 1], 0.0, atol=1e-4)
    min_ = m.getMassFluxIntegral("left")
    mout = m.getMassFluxIntegral("right")
    assert min_ + mout == pytest.approx(0.0, abs=1e-6 * abs(min_))


def test_coupled_cavity_fewer_outer_iterations():
    """Coupled PV beats SIMPLE on outer-iteration count for the lid cavity
    (the point of advanceCoupled): same flow field, >=2x fewer iterations
    to a 1e-3 momentum ratio."""
    n = 24

    def setup(m):
        m.vc["viscosity"] = 0.01
        for side in ("left", "right", "bottom"):
            m.bc[side].bc_type = "NoSlipWall"
        m.bc["top"].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.init()

    def iters_to(hist, ratio):
        m0 = hist[0][1]
        for it, mom, cont in hist:
            if mom / m0 < ratio:
                return it
        return len(hist) + 1000

    ms = make_flow(quad_2d(n, n), momentumURF=0.7, pressureURF=0.3)
    setup(ms)
    hist_s = ms.advance(300)

    mc = make_flow(quad_2d(n, n))
    setup(mc)
    hist_c = mc.advanceCoupled(120)

    it_s = iters_to(hist_s, 1e-3)
    it_c = iters_to(hist_c, 1e-3)
    assert it_c <= 300, "coupled did not converge"
    assert it_c * 2 <= it_s, f"coupled {it_c} vs SIMPLE {it_s} outer iters"
    Vs = ms.getVelocity()
    Vc = mc.getVelocity()
    np.testing.assert_allclose(Vc, Vs, atol=2e-2)


def test_simplec_matches_simple():
    """SIMPLEC (consistent correction denominator, pressureURF=1.0)
    converges to the same cavity solution as the reference-classic SIMPLE
    0.7/0.3 configuration."""
    def solve(algo, uv, up):
        dm = fvm.mesh.build_device_mesh(quad_2d(16, 16))
        m = FlowModel(dm)
        m.options["verbose"] = False
        m.options["algorithm"] = algo
        m.options["momentumURF"] = uv
        m.options["pressureURF"] = up
        m.options["momentumTolerance"] = 1e-9
        m.vc["viscosity"] = 0.05
        for side in ("left", "right", "bottom", "top"):
            m.bc[side].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.init()
        hist = m.advance(500)
        assert hist[-1][1] / hist[0][1] < 1e-7
        return m.getVelocity()

    # same momentumURF on both sides: the Rhie-Chow dissipation is built
    # from the relaxed aP (as in the reference, FlowModel_impl.h momAp),
    # so the converged discrete solution depends on urf_v but NOT on the
    # correction algorithm
    V_s = solve("SIMPLE", 0.7, 0.3)
    V_c = solve("SIMPLEC", 0.7, 1.0)
    np.testing.assert_allclose(V_c, V_s, atol=2e-5)


def test_poiseuille_tri_mesh():
    """Unstructured triangle mesh (no DIA fast path, nonzero non-orthogonal
    correction): plane Poiseuille still reproduces the parabolic profile."""
    from fvm_tpu.mesh.generate import tri_2d

    mu, dp = 0.1, 1.0
    dm = fvm.mesh.build_device_mesh(tri_2d(24, 12, lx=2.0, ly=1.0))
    m = FlowModel(dm)
    m.options["verbose"] = False
    m.vc["viscosity"] = mu
    m.bc["left"].bc_type = "PressureBoundary"
    m.bc["left"]["specifiedPressure"] = dp
    m.bc["right"].bc_type = "PressureBoundary"
    m.bc["right"]["specifiedPressure"] = 0.0
    m.bc["bottom"].bc_type = "NoSlipWall"
    m.bc["top"].bc_type = "NoSlipWall"
    m.init()
    hist = m.advance(600)
    assert hist[-1][1] / hist[0][1] < 1e-3
    V = m.getVelocity()
    y = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 1]
    u_exact = dp / 2.0 / (mu * 2.0) * y * (1.0 - y)
    # triangle meshes carry O(h) skewness error; profile within a few %,
    # with larger spurious cross-velocity near the pressure boundaries
    assert np.abs(V[:, 0] - u_exact).max() < 0.05 * u_exact.max()
    assert np.abs(V[:, 1]).max() < 0.1 * u_exact.max()


def test_cavity_hex_3d():
    """3D lid-driven cavity on a hex mesh: symmetric mid-plane profile,
    monotone shear, conservation (the 3D momentum/continuity path)."""
    from fvm_tpu.mesh.generate import hex_3d

    n = 10
    dm = fvm.mesh.build_device_mesh(hex_3d(n, n, n))
    m = FlowModel(dm)
    m.options["verbose"] = False
    m.vc["viscosity"] = 0.1
    for g in ("xmin", "xmax", "ymin", "ymax", "zmin", "zmax"):
        m.bc[g].bc_type = "NoSlipWall"
    m.bc["zmax"]["specifiedXVelocity"] = 1.0  # lid moves in +x
    m.init()
    hist = m.advance(120)
    assert hist[-1][1] / hist[0][1] < 1e-3
    V = m.getVelocity()
    assert np.isfinite(V).all()
    # net mass flux through every wall is ~0 (all walls closed)
    for g in ("xmin", "xmax", "ymin", "ymax", "zmin", "zmax"):
        assert abs(m.getMassFluxIntegral(g)) < 1e-10


def test_piso_transient_correctors():
    """PISO-style repeated pressure correctors (nPressureCorrectors=2,
    one outer per time step, no under-relaxation): the corrected mass
    flux is much closer to divergence-free than a single corrector's,
    and the transient solution tracks the per-step-converged SIMPLE
    reference at least as well."""
    def run(n_corr, outers, uv, up, dt=0.02, steps=5, n=16):
        dm = fvm.mesh.build_device_mesh(quad_2d(n, n))
        m = FlowModel(dm)
        m.options["verbose"] = False
        m.options["transient"] = True
        m.options["timeStep"] = dt
        m.options["nPressureCorrectors"] = n_corr
        m.options["momentumURF"] = uv
        m.options["pressureURF"] = up
        m.options["momentumTolerance"] = 1e-12
        m.vc["viscosity"] = 0.02
        for side in ("left", "right", "bottom", "top"):
            m.bc[side].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.init()
        for _ in range(steps):
            m.advance(outers)
            m.updateTime()
        # cell-wise divergence of the corrected mass flux
        mesh = m.mesh
        mdot = np.asarray(m.state["massFlux"])
        s = np.where(np.asarray(mesh.cf_is_owner), 1.0, -1.0) * np.asarray(
            mesh.cf_mask
        )
        div = np.abs(
            (s * mdot[np.asarray(mesh.cf_face)]).sum(axis=0)
        )[: mesh.n_interior_cells]
        return m.getVelocity(), div.max()

    V_ref, _ = run(1, 60, 0.7, 0.3)  # tightly converged SIMPLE per step
    V_piso, div_piso = run(2, 1, 1.0, 1.0)
    V_1c, div_1c = run(1, 1, 1.0, 1.0)
    # the second corrector tightens continuity substantially
    assert div_piso < 0.2 * div_1c
    # and the one-outer-per-step transient stays close to the
    # per-step-converged reference (splitting error O(dt))
    assert np.abs(V_piso - V_ref).max() < 0.05


def test_anderson_accelerated_simple():
    """Anderson mixing of the SIMPLE outer fixed point (no reference
    counterpart — a TPU-side solver upgrade for BASELINE target #2):
    reaches 1e-6 momentum residual in far fewer outer iterations than
    plain SIMPLE and converges to the same solution."""
    from fvm_tpu.linear import AMG

    def run(accel, maxit=1500):
        m = make_flow(quad_2d(48, 48), momentumURF=0.7, pressureURF=0.3)
        m.options["momentumTolerance"] = 1e-6
        m.options["continuityTolerance"] = 1e10
        m.vc["viscosity"] = 0.01
        for s in ("left", "right", "bottom", "top"):
            m.bc[s].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        if accel:
            m.options["acceleration"] = "anderson"
        m.init()
        hist = m.advance(maxit)
        return len(hist), hist[-1][1] / hist[0][1], m.getVelocity()

    n_plain, rel_plain, V_plain = run(False)
    n_aa, rel_aa, V_aa = run(True)
    assert rel_aa < 1e-6
    assert n_aa < n_plain / 3, (n_aa, n_plain)
    np.testing.assert_allclose(V_aa, V_plain, atol=5e-5)


def test_fmg_mesh_sequencing_warm_start():
    """Mesh-sequencing (FMG) warm start (models/fmg.py; no reference
    counterpart — a TPU-side convergence feature for BASELINE target #2):
    prolonging a converged coarse cavity onto a finer mesh leaves the fine
    solve an order of magnitude closer to steady than a cold start after
    the same number of outer iterations."""
    from fvm_tpu.models.fmg import prolong_flow_state

    def build(n):
        m = make_flow(quad_2d(n, n))
        m.vc["viscosity"] = 0.01
        for s in ("left", "right", "bottom", "top"):
            m.bc[s].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.init()
        return m

    coarse = build(32)
    coarse.advance(400)
    warm = build(64)
    prolong_flow_state(coarse, warm)
    cold = build(64)
    h_warm = warm.advance(80)
    h_cold = cold.advance(80)
    # same mesh, same outers: compare absolute momentum residuals
    assert h_warm[-1][1] < 0.2 * h_cold[-1][1], (
        h_warm[-1][1],
        h_cold[-1][1],
    )


def test_advance_newton_quadratic_endgame():
    """advanceNewton (JFNK on the coupled steady system): from a partly
    converged SIMPLE state, a few Newton steps reach round-off, and the
    result is the exact SIMPLE fixed point (the frozen Rhie-Chow aP is
    refrozen each step, so the outer aP fixed point converges too)."""
    dm = fvm.mesh.build_device_mesh(quad_2d(32, 32))
    f = FlowModel(dm)
    f.options["verbose"] = False
    f.vc["viscosity"] = 0.01
    for side in ("left", "right", "bottom", "top"):
        f.bc[side].bc_type = "NoSlipWall"
    f.bc["top"]["specifiedXVelocity"] = 1.0
    f.init()
    h = f.advance(60)
    n0 = float(h[0][1])
    rel_entry = float(h[-1][1]) / n0
    assert rel_entry > 1e-4  # far from converged

    hn = f.advanceNewton(4)
    # history rows report step-ENTRY residuals; the last row still shows
    # multiple decades of contraction over 3 steps
    assert float(hn[-1][1]) / n0 < 1e-2 * rel_entry

    # the Newton solution IS the SIMPLE fixed point: one segregated step
    # reports a residual at round-off
    h2 = f.advance(1)
    assert float(h2[0][1]) / n0 < 1e-9


def test_advance_newton_gmres_inner():
    """The chunked Newton path with the GMRES(m) inner solver
    (newtonInnerSolver='gmres', round 5: replaces BiCGStab's f32-noise
    transient) reaches the same SIMPLE fixed point."""
    dm = fvm.mesh.build_device_mesh(quad_2d(32, 32))
    f = FlowModel(dm)
    f.options["verbose"] = False
    f.vc["viscosity"] = 0.01
    for side in ("left", "right", "bottom", "top"):
        f.bc[side].bc_type = "NoSlipWall"
    f.bc["top"]["specifiedXVelocity"] = 1.0
    f.init()
    h = f.advance(60)
    n0 = float(h[0][1])
    f.options["newtonChunkIterations"] = 150
    f.options["newtonInnerSolver"] = "gmres"
    f.options["newtonGmresRestart"] = 30
    f.advanceNewton(4)
    # every traced step must have run a bounded inner solve
    assert all(tr["inner_its"] <= 600 for tr in f._newton_trace)
    h2 = f.advance(1)
    assert float(h2[0][1]) / n0 < 1e-9


def test_advance_newton_tri_mesh():
    """Newton endgame on a tri mesh: the non-orthogonal correction and
    LS-gradient paths inside the residual stay exact under jax.jvp."""
    from fvm_tpu.mesh.generate import tri_2d

    dm = fvm.mesh.build_device_mesh(tri_2d(16, 16))
    f = FlowModel(dm)
    f.options["verbose"] = False
    f.vc["viscosity"] = 0.02
    for side in ("left", "right", "bottom", "top"):
        f.bc[side].bc_type = "NoSlipWall"
    f.bc["top"]["specifiedXVelocity"] = 1.0
    f.init()
    h = f.advance(80)
    n0 = float(h[0][1])
    f.advanceNewton(4)
    h2 = f.advance(1)
    assert float(h2[0][1]) / n0 < 1e-10


def test_ideal_gas_compressible_channel():
    """Isothermal compressible channel flow with the IdealGas density loop
    (reference: src/fvm/test/testIG/testIG_{Noslip,Slip}.py — FlowModel +
    IdealGasDensityModelA advanced every 10 outers, no-slip and Maxwell
    slip-jump variants).  Exact isothermal lubrication solution: p(x)^2 is
    linear and the mass flow per unit width is
        mdot = H^3 (p_in^2 - p_out^2) / (24 mu R T L) * (1 + 6 Ls/H)
    with slip length Ls = sigma * lambda."""
    from fvm_tpu.models.property_models import IdealGasDensityModel

    L, H, nx, ny = 10.0, 1.0, 40, 12
    mu, RT = 1.0, 1.0  # Rgas*T = 1 => rho = p (absolute)

    def run(slip):
        dm = fvm.mesh.build_device_mesh(quad_2d(nx, ny, lx=L, ly=H))
        m = FlowModel(dm)
        m.options["verbose"] = False
        m.vc["viscosity"] = mu
        m.vc["density"] = 1.5
        if slip:
            # operating constants give lambda = mu/p sqrt(0.5 pi R T) = 0.1
            m.options["molecularWeight"] = 8314.472
            m.options["operatingTemperature"] = 2.0 / np.pi
            m.options["operatingPressure"] = 10.0
            m.bc["bottom"].bc_type = "SlipJump"
            m.bc["top"].bc_type = "SlipJump"
        else:
            m.bc["bottom"].bc_type = "NoSlipWall"
            m.bc["top"].bc_type = "NoSlipWall"
        m.bc["left"].bc_type = "PressureBoundary"
        m.bc["left"]["specifiedPressure"] = 2.0
        m.bc["right"].bc_type = "PressureBoundary"
        m.bc["right"]["specifiedPressure"] = 1.0
        m.init()
        eos = IdealGasDensityModel(dm, flow_model=m)
        eos.vc["molecularWeight"] = 8314.0  # Rgas = 1
        eos.vc["temperature"] = 1.0
        eos.vc["operatingPressure"] = 0.0
        eos.init()
        for _ in range(60):  # reference: dmodel.advance(1) every 10 outers
            m.advance(10)
            eos.advance(1)
        return m, dm

    m, dm = run(slip=False)
    mdot_exact = H**3 * (4.0 - 1.0) / (24 * mu * RT * L)
    mdot = -m.getMassFluxIntegral("left")
    assert abs(mdot / mdot_exact - 1) < 0.03
    # p^2 linear in x (isothermal gas: rho u is conserved, d(p^2)/dx const)
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
    p2 = np.asarray(m.state["pressure"])[: dm.n_interior_cells] ** 2
    lin = 4.0 - 3.0 * cc[:, 0] / L
    assert np.abs(p2 - lin).max() < 0.01  # on p^2 in [1, 4]
    # mass conservation inlet vs outlet
    assert abs(m.getMassFluxIntegral("left") + m.getMassFluxIntegral("right")) < 1e-5

    m, _ = run(slip=True)
    mdot = -m.getMassFluxIntegral("left")
    assert abs(mdot / (mdot_exact * 1.6) - 1) < 0.03  # (1 + 6*0.1/H) = 1.6


def test_advance_newton_chunked_matches_single_program():
    """newtonChunkIterations > 0 runs the inner Krylov as warm-restarted
    chunks, one device program each (the axon TPU worker kills long
    programs; restarts keep each bounded).  The chunked endgame must
    reach the same SIMPLE fixed point as the single-program solve."""
    dm = fvm.mesh.build_device_mesh(quad_2d(32, 32))
    f = FlowModel(dm)
    f.options["verbose"] = False
    f.vc["viscosity"] = 0.01
    for side in ("left", "right", "bottom", "top"):
        f.bc[side].bc_type = "NoSlipWall"
    f.bc["top"]["specifiedXVelocity"] = 1.0
    f.options["newtonChunkIterations"] = 25  # force several restarts
    f.init()
    h = f.advance(60)
    n0 = float(h[0][1])

    hn = f.advanceNewton(4)
    assert float(hn[-1][1]) / n0 < 1e-6  # entry of the last step

    # the chunked Newton solution IS the SIMPLE fixed point
    h2 = f.advance(1)
    assert float(h2[0][1]) / n0 < 1e-9


def test_advance_newton_mixed_precision_inner():
    """newtonInnerPrecision="float32": the Newton state/rhs/update stay
    f64 but the inner Krylov (jvp matvecs + CoupledSIMPLE/AMG
    preconditioner) runs on f32-cast views — the TPU endgame mode (f64
    is ~20x slower on TPU, and an all-f32 inner solve stalls at rel 1.0
    from 256^2 up because its rhs is representation noise at the f32
    floor).  The mixed endgame must still reach the f64 SIMPLE fixed
    point: the f32 matvec noise only bounds the INNER tolerance, and
    inexact-Newton forcing absorbs that with extra outer steps."""
    import jax.numpy as jnp

    if jnp.dtype(fvm.config.dtype) != jnp.dtype("float64"):
        pytest.skip("mixed-precision endgame is an f64-state mode")
    dm = fvm.mesh.build_device_mesh(quad_2d(32, 32))
    f = FlowModel(dm)
    f.options["verbose"] = False
    f.vc["viscosity"] = 0.01
    for side in ("left", "right", "bottom", "top"):
        f.bc[side].bc_type = "NoSlipWall"
    f.bc["top"]["specifiedXVelocity"] = 1.0
    f.options["newtonChunkIterations"] = 40
    f.options["newtonInnerPrecision"] = "float32"
    f.options["newtonKrylovTolerance"] = 1e-3  # inexact-Newton forcing
    f.init()
    h = f.advance(60)
    n0 = float(h[0][1])

    f.advanceNewton(6)
    # state stayed f64 and reached the f64 fixed point (well below the
    # f32 representation floor)
    assert f.state["velocity"].dtype == jnp.dtype("float64")
    h2 = f.advance(1)
    assert float(h2[0][1]) / n0 < 1e-8
