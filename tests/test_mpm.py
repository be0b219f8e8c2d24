"""Material-point solver + coupling tests (reference: MPM_Particles.h:15,
MPMCoupling.h:18; the reference delegates the material-point solve to an
external MPI program — fvm_tpu solves it in-process, geom/mpm.py).

Analytic checks: free fall under gravity, momentum conservation in an
elastic two-block collision, static elastic compression, and the
mark-and-pin FVM coupling loop.
"""

import os

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.geom.mpm import MPM, MPMSolver, MPMCoupling


def test_free_fall_exact():
    """Zero-stress free flight: v = g t, x = x0 + g t^2/2 exactly (the
    grid transfers are exact for affine velocity fields)."""
    g = -9.81
    s = MPMSolver(origin=(0, 0), h=0.1, dims=(20, 40), youngs=0.0,
                  gravity=(0.0, g))
    s.seed_box((0.6, 2.4), (1.0, 2.8))
    x0 = np.asarray(s.state["x"]).copy()
    T, n = 0.2, 20
    for _ in range(n):
        s.advance(T / n, substeps=1)
    v = np.asarray(s.state["v"])
    x = np.asarray(s.state["x"])
    np.testing.assert_allclose(v[:, 1], g * T, rtol=1e-6)
    np.testing.assert_allclose(v[:, 0], 0.0, atol=1e-12)
    # symplectic Euler: x advances with the post-update velocity
    dt = T / n
    t_steps = dt * np.arange(1, n + 1)
    expected_dy = np.sum(g * t_steps * dt)
    np.testing.assert_allclose(x[:, 1] - x0[:, 1], expected_dy, rtol=1e-6)


def test_two_block_collision_momentum():
    """Two elastic blocks collide: total momentum is conserved through the
    grid transfers and the contact."""
    s = MPMSolver(origin=(0, 0), h=0.05, dims=(40, 20), youngs=5e3,
                  density=1000.0)
    s.seed_box((0.3, 0.4), (0.6, 0.6), velocity=(0.5, 0.0))
    s.seed_box((1.4, 0.4), (1.7, 0.6), velocity=(-0.5, 0.0))
    p0 = s.momentum()
    e0 = s.kinetic_energy()
    # gap 0.8 closes at 1.0 m/s -> contact ~t=0.8; run to t=2.0 so the
    # bounce completes and the blocks separate again
    for _ in range(40):
        s.advance(0.05)
    p1 = s.momentum()
    e1 = s.kinetic_energy()
    scale = float(np.sum(np.asarray(s.state["m"]))) * 0.5
    np.testing.assert_allclose(p1, p0, atol=1e-8 * scale)
    assert e1 <= e0 * 1.01  # no spurious energy creation
    assert e1 > 0.1 * e0  # blocks bounced, not frozen
    # blocks separated again, moving apart
    x = np.asarray(s.state["x"])
    v = np.asarray(s.state["v"])
    leftmean = v[x[:, 0] < 1.0][:, 0].mean()
    rightmean = v[x[:, 0] >= 1.0][:, 0].mean()
    assert leftmean < 0 and rightmean > 0


def test_column_compression_under_gravity():
    """Elastic column on a sticky floor: undamped MPM rings around the
    static state, so the TIME-AVERAGED top displacement equals the static
    compression delta = rho*g*L^2/(2E) (self-weight column), and the
    column never penetrates the floor."""
    rho, E, g = 1000.0, 1e5, 9.81
    s = MPMSolver(origin=(0, 0), h=0.05, dims=(10, 30), youngs=E,
                  poisson=0.0, density=rho, gravity=(0.0, -g))
    s.seed_box((0.1, 0.05), (0.4, 0.8))
    x = np.asarray(s.state["x"])
    extent0 = x[:, 1].max() - x[:, 1].min()
    L = 0.75
    delta = rho * g * L**2 / (2 * E)
    exts, mins = [], []
    # fundamental period 4L/c = 0.3 s; average over t in [1, 4].  The
    # column EXTENT isolates the elastic compression from the ~h/2
    # rigid-body settle onto the sticky node layer.
    for i in range(400):
        s.advance(0.01)
        if i >= 100:
            xp = np.asarray(s.state["x"])
            exts.append(xp[:, 1].max() - xp[:, 1].min())
            mins.append(xp[:, 1].min())
    disp = extent0 - np.mean(exts)
    assert disp == pytest.approx(delta, rel=0.4), (disp, delta)
    assert min(mins) > -s.h  # supported by the floor


def test_particle_file_roundtrip(tmp_path):
    """Reference container IO: setandwriteParticles <-> Impl."""
    rng = np.random.default_rng(0)
    n = 17
    mpm = MPM()
    mpm.Init(rng.random((n, 3)), rng.random((n, 3)),
             (rng.random(n) > 0.5).astype(int), rng.random(n))
    f = str(tmp_path / "mpm.dat")
    mpm.setandwriteParticles(f)
    mpm2 = MPM(f)
    assert mpm2.getParticles() == n
    np.testing.assert_allclose(mpm2.getCoordinates(), mpm.getCoordinates(),
                               atol=1e-6)
    np.testing.assert_allclose(mpm2.getVelocities(), mpm.getVelocities(),
                               atol=1e-6)
    np.testing.assert_array_equal(mpm2.getTypes(), mpm.getTypes())
    np.testing.assert_allclose(mpm2.getTemperatures(),
                               mpm.getTemperatures(), atol=1e-6)


def test_reference_particle_file():
    """Read the reference's bundled MPM particle cloud if available."""
    path = "/root/reference/src/fvm/test/MPMs.dat"
    if not os.path.exists(path):
        pytest.skip("reference MPMs.dat not available")
    mpm = MPM(path)
    assert mpm.getParticles() == 25000
    assert mpm.getCoordinates().shape == (25000, 3)


def test_coupling_mark_and_sample():
    """updateMPM/acceptMPM loop against a ThermalModel: particle-covered
    cells become SOLID/IB, get pinned, and the particles sample the
    resulting field."""
    from fvm_tpu.geom.ibm import IBType
    from fvm_tpu.models import ThermalModel

    mesh = fvm.mesh.generate.quad_2d(24, 24)
    dm = fvm.mesh.build_device_mesh(mesh)

    s = MPMSolver(origin=(0, 0), h=1.0 / 24, dims=(24, 24), youngs=1e3)
    s.seed_box((0.4, 0.4), (0.6, 0.6))
    mpm = MPM()
    s.export_particles(mpm)
    cpl = MPMCoupling(mpm, s)

    cpl.updateMPM(1e-3)
    mark = cpl.acceptMPM(mesh)
    n_solid = int((mark[: mesh.n_interior_cells] == IBType.SOLID).sum())
    assert n_solid >= 16  # the 0.2x0.2 block covers ~23 cells

    t = ThermalModel(dm)
    t.options["verbose"] = False
    t.bc["left"].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = 300.0
    t.bc["right"].bc_type = "SpecifiedTemperature"
    t.bc["right"]["specifiedTemperature"] = 300.0
    t.bc["top"].bc_type = "Symmetry"
    t.bc["bottom"].bc_type = "Symmetry"
    t.init()
    solid = np.zeros(dm.n_cells, dtype=bool)
    im = mark[: mesh.n_interior_cells] != IBType.FLUID
    solid[: mesh.n_interior_cells] = im
    t.set_immersed_boundary(solid, 400.0)
    t.advance(30)
    T = t.getTemperature()
    assert T[im].max() == pytest.approx(400.0, abs=1e-6)
    # particles sample the hot body temperature
    Tp = cpl.sample_particle_field(mesh, T)
    assert Tp.min() > 399.0
