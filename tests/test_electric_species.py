"""ElectricModel and SpeciesModel end-to-end tests (analytic checks).

Mirrors the intent of the reference's IBM_PARALLEL electrostatics and
SPECIES_MODEL golden suites with closed-form solutions.
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.electric import ElectricModel, EPS0
from fvm_tpu.models.species import SpeciesModel


def test_capacitor_potential():
    """Parallel-plate capacitor: linear potential, uniform field E=-dV/L."""
    dm = fvm.mesh.build_device_mesh(quad_2d(20, 4))
    m = ElectricModel(dm)
    m.options["verbose"] = False
    m.bc["left"].bc_type = "SpecifiedPotential"
    m.bc["left"]["specifiedPotential"] = 100.0
    m.bc["right"].bc_type = "SpecifiedPotential"
    m.bc["right"]["specifiedPotential"] = 0.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(5)
    assert hist[-1][1] / hist[0][1] < 1e-8
    phi = m.getPotential()
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    np.testing.assert_allclose(phi, 100.0 * (1.0 - x), rtol=1e-8)
    E = m.getElectricField()
    np.testing.assert_allclose(E[:, 0], 100.0, rtol=1e-6)
    np.testing.assert_allclose(E[:, 1], 0.0, atol=1e-6)


def test_space_charge_poisson():
    """Uniform space charge rho: phi'' = -rho/eps; phi = rho x(L-x)/(2 eps).

    Uses eps_r = 1/EPS0 so eps = 1 exactly.
    """
    dm = fvm.mesh.build_device_mesh(quad_2d(32, 2))
    m = ElectricModel(dm)
    m.options["verbose"] = False
    m.vc["dielectric_constant"] = 1.0 / EPS0
    m.vc["initialCharge"] = 1.0
    for s in ("left", "right"):
        m.bc[s].bc_type = "SpecifiedPotential"
        m.bc[s]["specifiedPotential"] = 0.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(5)
    phi = m.getPotential()
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    np.testing.assert_allclose(phi, x * (1 - x) / 2, atol=3e-4)


def test_charge_transport_drift():
    """Charge drifts along E and reaches steady exponential-ish profile;
    check global charge conservation in a closed domain."""
    dm = fvm.mesh.build_device_mesh(quad_2d(16, 4))
    m = ElectricModel(dm)
    m.options["verbose"] = False
    m.options["chargetransport_enable"] = True
    m.options["transient"] = True
    m.options["timeStep"] = 1e-2
    # keep space charge negligible vs the 10V applied bias so E ~ 10 V/m
    m.vc["initialCharge"] = 1e-12
    m.vc["mobility"] = 1.0
    m.vc["diffusivity"] = 1e-3
    m.bc["left"].bc_type = "SpecifiedPotential"
    m.bc["left"]["specifiedPotential"] = 10.0
    m.bc["right"].bc_type = "SpecifiedPotential"
    m.bc["right"]["specifiedPotential"] = 0.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    V = np.asarray(dm.cell_volume)[: dm.n_interior_cells]
    q0 = float((m.getCharge() * V).sum())
    for _ in range(3):
        m.advance(3)
        m.updateTime()
    q1 = float((m.getCharge() * V).sum())
    # all boundaries are zero-charge-flux: total charge conserved up to
    # inner-solver tolerance
    assert q1 == pytest.approx(q0, rel=5e-3)
    # charge piles up downstream (+x drift from high to low potential)
    c = m.getCharge().reshape(16, 4)
    assert c[-1].mean() > c[0].mean()


def test_species_two_fields():
    """Two species with different BCs solve independently to linear
    profiles."""
    dm = fvm.mesh.build_device_mesh(quad_2d(16, 4))
    m = SpeciesModel(dm, n_species=2)
    m.options["verbose"] = False
    for i, (lo, hi) in enumerate(((1.0, 0.0), (0.2, 0.8))):
        bcm = m.bc_for(i)
        bcm["left"].bc_type = "SpecifiedMassFraction"
        bcm["left"]["specifiedMassFraction"] = lo
        bcm["right"].bc_type = "SpecifiedMassFraction"
        bcm["right"]["specifiedMassFraction"] = hi
        bcm["bottom"].bc_type = "Symmetry"
        bcm["top"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(5)
    assert hist[-1][1] / hist[0][1] < 1e-8
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    np.testing.assert_allclose(m.getMassFraction(0), 1.0 - x, rtol=1e-7)
    np.testing.assert_allclose(
        m.getMassFraction(1), 0.2 + 0.6 * x, rtol=1e-7
    )


def test_species_flux_integral():
    dm = fvm.mesh.build_device_mesh(quad_2d(10, 10))
    m = SpeciesModel(dm)
    m.vc["massDiffusivity"] = 2.0
    m.options["verbose"] = False
    m.bc["left"].bc_type = "SpecifiedMassFraction"
    m.bc["left"]["specifiedMassFraction"] = 1.0
    m.bc["right"].bc_type = "SpecifiedMassFraction"
    m.bc["right"]["specifiedMassFraction"] = 0.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(5)
    # J = D dc/dx * area = 2*1*1 = 2 into the domain at left
    assert m.getMassFluxIntegral("left") == pytest.approx(2.0, rel=1e-7)


def test_charge_injection_and_trapping():
    """MEMS dielectric charging: field-driven injection at the biased
    contact grows the free-charge population; traps capture part of it."""
    dm = fvm.mesh.build_device_mesh(quad_2d(12, 4))
    m = ElectricModel(dm)
    m.options["verbose"] = False
    m.options["chargetransport_enable"] = True
    m.options["injection_enable"] = True
    m.options["trapping_enable"] = True
    m.options["transient"] = True
    m.options["timeStep"] = 0.1
    # reduced units: eps = 1 so the space-charge feedback stays mild
    m.vc["dielectric_constant"] = 1.0 / EPS0
    m.vc["initialCharge"] = 1e-15
    m.vc["mobility"] = 1e-3
    m.vc["diffusivity"] = 1e-4
    m.vc["injectionA"] = 1e-5
    m.vc["injectionB"] = 5.0
    m.vc["trapDensity"] = 1.0
    m.vc["captureCoefficient"] = 0.5
    m.vc["emissionCoefficient"] = 0.01
    m.bc["left"].bc_type = "SpecifiedPotential"
    m.bc["left"]["specifiedPotential"] = 50.0
    m.bc["right"].bc_type = "SpecifiedPotential"
    m.bc["right"]["specifiedPotential"] = 0.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    for _ in range(5):
        m.advance(3)
        m.updateTime()
    c = m.getCharge()
    ct = m.getTrappedCharge()
    # injection happened: charge grew far beyond the initial seed
    assert c.max() > 1e-6
    # traps captured some of it
    assert ct.max() > 0.0
    assert ct.max() <= 1.0 + 1e-9  # bounded by trap density


def test_trap_band_tunneling():
    """Trapped charge escapes through the WKB barrier to the first cell
    whose conduction band (Ec = -phi) falls below the trap level, moving
    charge conservatively (reference TrapBandTunnelingDiscretization.h,
    vectorized over static precomputed walks)."""
    import jax.numpy as jnp

    nx = 40
    dm = fvm.mesh.build_device_mesh(quad_2d(nx, 2, lx=1.0, ly=0.05))
    m = ElectricModel(dm)
    m.options["verbose"] = False
    m.options["chargetransport_enable"] = True
    m.options["trapping_enable"] = True
    m.options["trapbandtunneling_enable"] = True
    m.options["transient"] = True
    m.options["timeStep"] = 0.01
    m.vc["dielectric_constant"] = 1.0 / EPS0  # eps = 1 (reduced units)
    m.vc["mobility"] = 0.0
    m.vc["diffusivity"] = 1e-6
    m.vc["trapDensity"] = 1.0
    m.vc["initialTrappedCharge"] = 0.0
    m.vc["trapDepth"] = 2.0
    m.vc["wkbFactor"] = -3.0
    m.vc["tunnelingRateScale"] = 1.0
    V = 10.0  # phi = V x -> Ec = -V x, slope a = V
    m.bc["left"].bc_type = "SpecifiedPotential"
    m.bc["left"]["specifiedPotential"] = 0.0
    m.bc["right"].bc_type = "SpecifiedPotential"
    m.bc["right"]["specifiedPotential"] = V
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    # seed trapped charge in the left third
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    ct0 = np.where(x < 0.3, 0.5, 0.0)
    m.state["trapped"] = jnp.zeros(dm.n_cells).at[: dm.n_interior_cells].set(ct0)
    m.state["trapped_N1"] = m.state["trapped"]
    Vc = np.asarray(dm.cell_volume)[: dm.n_interior_cells]
    total0 = float((ct0 * Vc).sum()) + float(
        (np.asarray(m.state["charge"])[: dm.n_interior_cells] * Vc).sum()
    )
    for _ in range(5):
        m.advance(2)
        m.updateTime()
    ct = m.getTrappedCharge()
    q = m.getCharge()
    total = float((ct * Vc).sum()) + float((q * Vc).sum())
    # charge moved out of traps into the band, conservatively
    assert ct[x < 0.3].sum() < ct0[x < 0.3].sum()
    assert q.max() > 0
    assert total == pytest.approx(total0, rel=1e-10)
    # exit cells sit where Ec < Ec(source) - depth: x_exit > x_src + d/V
    rate, exit_cell, found = m._tunneling_rates(
        m.mesh, m.params, m.state, np.zeros((dm.n_cells, 2))
    )
    src = np.where((x < 0.3) & np.asarray(found)[: len(x)])[0]
    xe = x[np.asarray(exit_cell)[src]]
    assert (xe > x[src] + 2.0 / V - 1e-9).all()
    # and it is the FIRST such cell along the walk (within one cell width)
    assert (xe < x[src] + 2.0 / V + 1.5 / nx).all()


def test_poole_frenkel_emission():
    """Field-enhanced trap emission (reference EmissionDiscretization.h:
    rate = nu exp(-(phi_t - beta sqrt|E|)/vT), capped at nu).  With
    capture off, preloaded traps decay at exactly that rate: measured
    log-decay matches the analytic PF rate at two bias levels (partial
    barrier lowering at 50 V, full lowering/capped at 100 V).  Mirrors
    the DIALECTRIC_CHARGING physics (test/DIALECTRIC_CHARGING/
    testDielectricCharging.py: poole_frenkel_emission_frequency)."""
    nu, depth, beta, vT, dt = 1.0, 1.5, 0.15, 0.5, 0.02

    def decay_rate(volts, pf):
        dm = fvm.mesh.build_device_mesh(quad_2d(12, 4))
        m = ElectricModel(dm)
        m.options["verbose"] = False
        m.options["chargetransport_enable"] = True
        m.options["trapping_enable"] = True
        m.options["poole_frenkel_enable"] = pf
        m.options["transient"] = True
        m.options["timeStep"] = dt
        m.vc["dielectric_constant"] = 1.0 / EPS0
        m.vc["initialCharge"] = 0.0
        m.vc["initialTrappedCharge"] = 1.0
        m.vc["mobility"] = 1e-6
        m.vc["diffusivity"] = 1e-6
        m.vc["trapDensity"] = 1.0
        m.vc["captureCoefficient"] = 0.0
        m.vc["emissionCoefficient"] = 0.01
        m.vc["emissionFrequency"] = nu
        m.vc["trapDepth"] = depth
        m.vc["pfBeta"] = beta
        m.vc["thermalVoltage"] = vT
        m.bc["left"].bc_type = "SpecifiedPotential"
        m.bc["left"]["specifiedPotential"] = volts
        m.bc["right"].bc_type = "SpecifiedPotential"
        m.bc["right"]["specifiedPotential"] = 0.0
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        t0 = float(m.getTrappedCharge().sum())
        nstep = 10
        for _ in range(nstep):
            m.advance(3)
            m.updateTime()
        t1 = float(m.getTrappedCharge().sum())
        return -np.log(t1 / t0) / (nstep * dt)

    def k_pf(E):
        return 0.01 + nu * np.exp(-max((depth - beta * np.sqrt(E)) / vT, 0.0))

    # PF off: constant emissionCoefficient only
    k = decay_rate(50.0, pf=False)
    assert k == pytest.approx(0.01, rel=0.05)
    # 50 V across the unit square -> |E| = 50, partially lowered barrier
    k50 = decay_rate(50.0, pf=True)
    assert k50 == pytest.approx(k_pf(50.0), rel=0.05)
    # 100 V -> barrier fully lowered, rate capped at nu
    k100 = decay_rate(100.0, pf=True)
    assert k100 == pytest.approx(k_pf(100.0), rel=0.05)
    assert k100 > k50 > k
