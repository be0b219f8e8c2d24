"""Periodic boundary pairs (reference: Mesh.h:337 PeriodicFacePairs +
MeshMetricsCalculator_impl.h ghost-coordinate shift).

The wrap is validated two ways: an x-independent solution must be exactly
recovered on a periodic-in-x strip, and with an x-varying source the
solution must be translation-invariant modulo the wrap (roll test).
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models import ThermalModel
from fvm_tpu.exceptions import ConfigError


def test_periodic_thermal_1d_exact():
    mesh = quad_2d(8, 12)
    mesh.make_periodic("left", "right")
    dm = fvm.mesh.build_device_mesh(mesh)
    m = ThermalModel(dm)
    m.options["verbose"] = False
    m.options["relativeTolerance"] = 1e-14
    m.bc["left"].bc_type = "Periodic"
    m.bc["right"].bc_type = "Periodic"
    m.bc["bottom"].bc_type = "SpecifiedTemperature"
    m.bc["bottom"]["specifiedTemperature"] = 400.0
    m.bc["top"].bc_type = "SpecifiedTemperature"
    m.bc["top"]["specifiedTemperature"] = 300.0
    m.init()
    m.advance(200)
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
    T = m.getTemperature()
    np.testing.assert_allclose(T, 400.0 - 100.0 * cc[:, 1], atol=1e-8)


def test_periodic_thermal_roll_invariance():
    """Shifting an x-periodic source by k cells must shift the solution by
    exactly k cells (the wrap carries fluxes like any interior face)."""
    nx, ny = 16, 4

    def solve(shift):
        mesh = quad_2d(nx, ny)
        mesh.make_periodic("left", "right")
        dm = fvm.mesh.build_device_mesh(mesh)
        x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
        m = ThermalModel(dm)
        m.options["verbose"] = False
        m.options["relativeTolerance"] = 1e-13
        m.vc["heatSource"] = np.cos(2 * np.pi * (x - shift)) * 10.0
        m.bc["left"].bc_type = "Periodic"
        m.bc["right"].bc_type = "Periodic"
        m.bc["bottom"].bc_type = "SpecifiedTemperature"
        m.bc["bottom"]["specifiedTemperature"] = 300.0
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        m.advance(400)
        y = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 1]
        idx = np.lexsort((x, y))
        return m.getTemperature()[idx].reshape(ny, nx)

    G0 = solve(0.0)
    Gs = solve(4.0 / nx)
    np.testing.assert_allclose(np.roll(G0, 4, axis=1), Gs, atol=1e-7)


def test_periodic_requires_pairing():
    dm = fvm.mesh.build_device_mesh(quad_2d(4, 4))
    m = ThermalModel(dm)
    m.options["verbose"] = False
    m.bc["left"].bc_type = "Periodic"
    m.bc["right"].bc_type = "Periodic"
    m.bc["bottom"].bc_type = "SpecifiedTemperature"
    m.bc["top"].bc_type = "SpecifiedTemperature"
    with pytest.raises(ConfigError):
        m.init()


def test_periodic_generic_scalar():
    """VacancyModel (GenericScalarModel family) diffuses a periodic profile
    to the uniform mean on a ring."""
    from fvm_tpu.models import VacancyModel

    mesh = quad_2d(12, 3)
    mesh.make_periodic("left", "right")
    dm = fvm.mesh.build_device_mesh(mesh)
    m = VacancyModel(dm)
    m.options["verbose"] = False
    m.options["transient"] = True
    m.options["timeStep"] = 0.05
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    m.vc["initialVacancyConcentration"] = 1.0 + np.cos(2 * np.pi * x)
    m.bc["left"].bc_type = "Periodic"
    m.bc["right"].bc_type = "Periodic"
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    c0_total = m.getConcentration().mean()
    for _ in range(40):
        # the lagged periodic ghosts balance wrap fluxes only at per-step
        # convergence (~0.7x/outer-iteration on a ring), so conservation
        # holds to the per-step outer tolerance, not machine precision
        m.advance(30)
        m.updateTime()
    c = m.getConcentration()
    assert c.mean() == pytest.approx(c0_total, rel=2e-3)
    assert c.std() < 0.05 * np.asarray(
        1.0 + np.cos(2 * np.pi * x)
    ).std()


def test_periodic_implicit_one_shot():
    """Implicit periodic rows (extra ELL slot to the wrapped partner owner)
    make a LINEAR ring-dominated problem converge in ONE outer iteration —
    the lagged-pinning scheme this replaces contracted ~0.7x/iter
    (reference treats periodic pairs as ordinary interior coupling)."""
    nx, ny = 16, 4
    mesh = quad_2d(nx, ny)
    mesh.make_periodic("left", "right")
    dm = fvm.mesh.build_device_mesh(mesh)
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    m = ThermalModel(dm)
    m.options["verbose"] = False
    m.options["linearSolver"] = fvm.linear.BiCGStab(
        relative_tolerance=1e-12, max_iterations=400,
        preconditioner=fvm.linear.JacobiSolver(sweeps=3),
    )
    m.vc["heatSource"] = np.cos(2 * np.pi * x) * 10.0
    m.bc["left"].bc_type = "Periodic"
    m.bc["right"].bc_type = "Periodic"
    m.bc["bottom"].bc_type = "SpecifiedTemperature"
    m.bc["bottom"]["specifiedTemperature"] = 300.0
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(2)
    assert hist[1][1] / hist[0][1] < 1e-9, (
        f"not implicit: second-iteration residual ratio {hist[1][1]/hist[0][1]}"
    )


def test_periodic_dist_matches_single():
    """Periodic pairs under partitioning: the partner owner of a wrap
    ghost may live on another shard (it rides the halo exchange); the
    implicit slot-1 coupling must reproduce the single-device solve
    exactly (reference: periodic pairs as ordinary interior coupling
    across ranks, Mesh.h:259-265 syncCounts/syncIndices)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fvm_tpu.mesh.metrics import compute_geometry
    from fvm_tpu.parallel import Partition

    nx, ny = 16, 8

    def setup(m, x):
        m.options["verbose"] = False
        m.options["relativeTolerance"] = 1e-13
        m.vc["heatSource"] = np.cos(2 * np.pi * x) * 10.0
        m.bc["left"].bc_type = "Periodic"
        m.bc["right"].bc_type = "Periodic"
        m.bc["bottom"].bc_type = "SpecifiedTemperature"
        m.bc["bottom"]["specifiedTemperature"] = 300.0
        m.bc["top"].bc_type = "Symmetry"
        m.init()

    mesh = quad_2d(nx, ny)
    mesh.make_periodic("left", "right")
    dm = fvm.mesh.build_device_mesh(mesh)
    x1 = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    m1 = ThermalModel(dm)
    setup(m1, x1)
    m1.advance(60)
    T1 = m1.getTemperature()

    mesh2 = quad_2d(nx, ny)
    mesh2.make_periodic("left", "right")
    part = Partition(mesh2, 8)
    xg = compute_geometry(mesh2).cell_centroid[: mesh2.n_interior_cells, 0]
    mN = ThermalModel(part.sharded_mesh, partition=part)
    setup(mN, xg)
    hist = mN.advance(60)
    TN = mN.getTemperature()

    np.testing.assert_allclose(TN, T1, rtol=1e-7, atol=1e-7)
    assert hist[-1][1] / hist[0][1] < 1e-9
