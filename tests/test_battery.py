"""BatteryModel: 1D sandwich cell with Butler-Volmer interfaces.

Mirrors the reference's battery suites (SpeciesTest.cas /
FullBatterySimple.cas drivers) with an analytic series-resistance check in
the linear (small-overpotential) regime.
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.battery import BatteryModel, FARADAY, RGAS


def build_cell(nx=30, V_applied=3.75):
    dm = fvm.mesh.build_device_mesh(quad_2d(nx, 2))
    m = BatteryModel(dm)
    m.options["verbose"] = False
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    mat = np.where(x < 1 / 3, 0, np.where(x < 2 / 3, 1, 2)).astype(np.int32)
    m.set_material_regions(mat)
    m.vc["openCircuitVoltage"] = (0.1, 0.0, 3.8)
    m.vc["conductivity"] = (100.0, 1.0, 100.0)
    m.vc["exchangeCurrentDensity"] = 10.0
    m.bc["left"].bc_type = "SpecifiedPotential"
    m.bc["left"]["specifiedPotential"] = 0.0
    m.bc["right"].bc_type = "SpecifiedPotential"
    m.bc["right"]["specifiedPotential"] = V_applied
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    return m


def test_battery_discharge_current():
    """Small net overpotential: terminal current matches the linear
    series-resistance model
    R_total = R_anode + R_elyte + R_cathode + 2 R_ct,
    R_ct = RT/(F i0) per unit area."""
    # OCV difference = 3.8 - 0.1 = 3.7; apply 3.75 -> total eta budget 0.05
    m = build_cell(V_applied=3.75)
    hist = m.advance(25)
    assert hist[-1][1] / hist[0][1] < 1e-6
    i_in = m.getCurrentIntegral("right")
    i_out = m.getCurrentIntegral("left")
    # current conservation through the cell
    assert i_in + i_out == pytest.approx(0.0, abs=1e-6 * abs(i_in))
    T = 300.0
    R_ct = RGAS * T / (FARADAY * 10.0)
    R_ohm = (1 / 3) / 100.0 + (1 / 3) / 1.0 + (1 / 3) / 100.0
    i_lin = 0.05 / (R_ohm + 2 * R_ct)
    assert abs(i_in) == pytest.approx(i_lin, rel=0.05)


def test_battery_potential_profile():
    """Potential is near-flat in the high-conductivity electrodes and drops
    across the electrolyte + interfaces."""
    m = build_cell(V_applied=3.75)
    m.advance(25)
    phi = m.getPotential().reshape(30, 2).mean(axis=1)
    x = np.linspace(1 / 60, 1 - 1 / 60, 30)
    anode = phi[x < 0.3]
    cathode = phi[x > 0.7]
    assert np.ptp(anode) < 0.002
    assert np.ptp(cathode) < 0.002
    # jumps at the interfaces: electrolyte potential well below cathode
    assert phi[15] < phi[-1] - 3.0  # most of the 3.7 V OCV drop


def test_battery_transient_species_transport():
    """Transient discharge moves Li: concentration rises on the side
    receiving current and total Li in each electrode changes with the
    Faradaic flux i/F."""
    m = build_cell(V_applied=3.75)
    m.options["transient"] = True
    m.options["timeStep"] = 5.0
    # rebuild with transient state
    m2 = build_cell.__wrapped__ if hasattr(build_cell, "__wrapped__") else None
    m = build_cell(V_applied=3.75)
    m.options["transient"] = True
    m.options["timeStep"] = 5.0
    m.init()
    c0 = m.getConcentration().copy()
    for _ in range(3):
        m.advance(6)
        m.updateTime()
    c1 = m.getConcentration()
    # concentration changed where the interfaces inject/remove Li
    assert np.abs(c1 - c0).max() > 1e-6
    # far-field cells in electrode interiors barely changed yet
    assert abs(c1[0] - c0[0]) < np.abs(c1 - c0).max()


def test_battery_heat_generation():
    """Total heat = I * (V_applied - OCV): ohmic + reaction heats account
    for the full overpotential budget."""
    m = build_cell(V_applied=3.75)
    m.advance(15)
    q = m.get_heat_source()
    V = np.asarray(m.mesh.cell_volume)[: m.mesh.n_interior_cells]
    Q_total = float((q * V).sum())
    i = abs(m.getCurrentIntegral("right"))
    # OCV = 3.7, applied 3.75 -> dissipation = i * 0.05
    assert Q_total == pytest.approx(i * 0.05, rel=0.05)
    assert (q >= -1e-12).all()


def test_battery_thermal_coupling_roundtrip():
    """Feed battery heat into a ThermalModel and check it warms up."""
    from fvm_tpu.models import ThermalModel

    m = build_cell(V_applied=3.75)
    m.advance(15)
    q = m.get_heat_source()

    t = ThermalModel(m.mesh)
    t.options["verbose"] = False
    t.vc["heatSource"] = q * 1e3  # scaled for a visible dT
    t.vc["initialTemperature"] = 300.0
    for s in ("left", "right"):
        t.bc[s].bc_type = "SpecifiedTemperature"
        t.bc[s]["specifiedTemperature"] = 300.0
    t.bc["bottom"].bc_type = "Symmetry"
    t.bc["top"].bc_type = "Symmetry"
    t.init()
    t.advance(5)
    T = t.getTemperature()
    assert T.max() > 300.0 + 1e-3
    assert T.min() >= 300.0 - 1e-9


def _build_double_shell(n_shards=None, transient=False, I=5.0,
                        sig_e=1.0, sig_s=10.0, dt=20.0):
    """Two-region cell on a double-shell mesh: electrolyte (L, mat 1) |
    cathode (R, mat 2), reference potential at the electrolyte terminal,
    specified current at the electrode contact (reference:
    BatteryPCLinearizeInterface_BV.h point-coupled shell interface)."""
    import fvm_tpu.mesh.metrics as metrics
    from fvm_tpu.parallel import Partition

    m = quad_2d(16, 4, lx=2.0, ly=1.0)
    geom = metrics.compute_geometry(m)
    xc = geom.cell_centroid[: m.n_interior_cells, 0]
    left = xc < 1.0
    m2 = m.make_interface(
        "sep", m.interface_faces_between(left, ~left), left_cells=left
    )
    if n_shards:
        part = Partition(m2, n_shards)
        b = BatteryModel(part.sharded_mesh, partition=part)
    else:
        b = BatteryModel(fvm.mesh.build_device_mesh(m2))
    b.options["verbose"] = False
    if transient:
        b.options["transient"] = True
        b.options["timeStep"] = dt
    geom2 = metrics.compute_geometry(m2)
    xc2 = geom2.cell_centroid[: m2.n_interior_cells, 0]
    mat = np.where(xc2 < 1.0, 1, 2).astype(np.int32)
    b.set_material_regions(mat)
    b.vc["conductivity"] = (100.0, sig_e, sig_s)
    b.vc["diffusivity"] = (1e-2, 1e-2, 1e-2)
    b.bc["left"].bc_type = "SpecifiedPotential"
    b.bc["left"]["specifiedPotential"] = 0.0
    b.bc["right"].bc_type = "SpecifiedCurrent"
    b.bc["right"]["specifiedCurrent"] = I
    b.bc["top"].bc_type = "Symmetry"
    b.bc["bottom"].bc_type = "Symmetry"
    b.init()
    return b, xc2


def test_battery_double_shell_steady_exact():
    """Steady potential on a double-shell cell: piecewise-linear ohmic
    profile with the BV overpotential jump eta* = (2/fRT) asinh(I/(2 j0))
    at the shell interface, exact to machine precision; quadratic Newton."""
    sig_e, sig_s, I = 1.0, 10.0, 5.0
    b, xc2 = _build_double_shell(I=I, sig_e=sig_e, sig_s=sig_s)
    hist = b.advance(30)
    assert hist[-1][1] / hist[0][1] < 1e-10
    assert len(hist) <= 6  # quadratic convergence, not outer-lagged

    ce0 = cs0 = 1000.0
    csMax, k = 26390.0, 6.33e-10
    j0 = FARADAY * k * np.sqrt(ce0) * np.sqrt(csMax - cs0) * np.sqrt(cs0)
    fRT = FARADAY / (RGAS * 300.0)
    eta = 2.0 / fRT * np.arcsinh(I / (2 * j0))
    phiR_i = I / sig_e * 1.0 + 3.8 + eta
    exact = np.where(
        xc2 < 1.0, I / sig_e * xc2, phiR_i + I / sig_s * (xc2 - 1.0)
    )
    np.testing.assert_allclose(b.getPotential(), exact, atol=1e-12)
    # conservation: current in at the contact leaves at the reference
    assert b.getCurrentIntegral("right") == pytest.approx(I)
    assert b.getCurrentIntegral("left") == pytest.approx(-I, rel=1e-10)


def test_battery_double_shell_coupled_mass():
    """Transient coupled (c, phi) JFNK on the shell mesh: with the
    potential equation elliptic, the interface BV current equals the
    applied current instantaneously, so one BDF1 step moves EXACTLY
    dt*I/F moles of Li out of the electrode and dt*(1-t+)*I/F into the
    electrolyte (transference split)."""
    I, dt = 5.0, 20.0
    b, xc2 = _build_double_shell(transient=True, I=I, dt=dt)
    vol = 2.0 / 64.0
    c0 = b.getConcentration()
    hist = b.advance(25)
    assert hist[-1][1] / hist[0][1] < 1e-10
    c1 = b.getConcentration()
    left = xc2 < 1.0
    tf = 1.0 - 0.363
    dcs = (c1[~left] - c0[~left]).sum() * vol
    dce = (c1[left] - c0[left]).sum() * vol
    assert dcs == pytest.approx(-dt * I / FARADAY, rel=1e-8)
    assert dce == pytest.approx(dt * tf * I / FARADAY, rel=1e-8)


def test_battery_double_shell_dist_matches_single():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    b1, _ = _build_double_shell()
    b1.advance(30)
    bN, _ = _build_double_shell(n_shards=4)
    bN.advance(30)
    np.testing.assert_allclose(
        bN.getPotential(), b1.getPotential(), atol=1e-12
    )


def test_battery_double_shell_heat_energy_balance():
    """Heat generation on a double-shell cell: total Joule + reaction
    heat equals the electrical power delivered, I * (V_terminal - OCV)
    ... at steady state with reference potential 0 at the electrolyte
    terminal, the dissipated power is I*V_terminal - I*U0 (the reversible
    OCV work is not heat)."""
    I = 5.0
    b, xc2 = _build_double_shell(I=I)
    b.advance(30)
    q = b.get_heat_source()
    vol = 2.0 / 64.0
    Q_total = float((q * vol).sum())
    # the DISCRETE balance closes at the last cell center (the terminal
    # of the specified-current row): Q == I*phi_term - I*U0 to round-off
    V_term = float(b.getPotential().max())
    P_irrev = I * V_term - I * 3.8
    assert Q_total == pytest.approx(P_irrev, rel=1e-9)
