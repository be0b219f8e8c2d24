"""Geometry search + immersed boundary tests.

Mirrors the reference's IBM_PARALLEL / Octree / CellMark suites
(reference: src/fvm/test/IBM_PARALLEL, Octree, CellMark).
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.geom import KSearchTree, Octree, AABB, IBManager, IBType
from fvm_tpu.models import ThermalModel


def circle(n=64, r=0.2, cx=0.5, cy=0.5):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    v = np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], axis=1)
    e = np.stack([np.arange(n), (np.arange(n) + 1) % n], axis=1)
    return v, e


def test_kdtree_and_octree():
    pts = np.random.default_rng(0).random((100, 2))
    t = Octree(pts)
    i = t.getNode([0.5, 0.5])
    d = np.linalg.norm(pts - [0.5, 0.5], axis=1)
    assert i == int(np.argmin(d))
    ball = t.getNodes([0.5, 0.5], 0.2)
    assert set(ball) == set(np.nonzero(d <= 0.2)[0])


def test_aabb_inside_circle():
    v, e = circle()
    s = AABB(v, e)
    pts = np.array([[0.5, 0.5], [0.65, 0.5], [0.8, 0.5], [0.1, 0.1]])
    np.testing.assert_array_equal(s.is_inside(pts), [True, True, False, False])
    # segment crossing
    n_cross = s.segment_intersections(
        np.array([[0.5, 0.5]]), np.array([[1.0, 0.5]])
    )
    assert n_cross[0] == 1


def test_ibmanager_marking():
    mesh = quad_2d(40, 40)
    ib = IBManager(mesh)
    v, e = circle(n=128, r=0.2)
    t = ib.update(v, e)
    n_solid = (t[: mesh.n_interior_cells] == IBType.SOLID).sum()
    area = n_solid / (40 * 40)
    assert area == pytest.approx(np.pi * 0.04, rel=0.1)
    n_ib = (t[: mesh.n_interior_cells] == IBType.IB).sum()
    # IB band ~ circumference / dx
    assert 0.5 * 2 * np.pi * 0.2 * 40 < n_ib < 2.5 * 2 * np.pi * 0.2 * 40


def test_ib_thermal_hot_cylinder():
    """Hot immersed cylinder in a cold box: solid cells pinned, field
    decays monotonically outward."""
    mesh = quad_2d(32, 32)
    dm = fvm.mesh.build_device_mesh(mesh)
    ib = IBManager(mesh)
    v, e = circle(n=128, r=0.2)
    ib.update(v, e)

    t = ThermalModel(dm)
    t.options["verbose"] = False
    for s in ("left", "right", "bottom", "top"):
        t.bc[s].bc_type = "SpecifiedTemperature"
        t.bc[s]["specifiedTemperature"] = 300.0
    t.init()
    t.set_immersed_boundary(ib.dirichlet_mask(), 400.0)
    hist = t.advance(5)
    assert hist[-1][1] / hist[0][1] < 1e-8
    T = t.getTemperature()
    mask = ib.dirichlet_mask()[: dm.n_interior_cells]
    np.testing.assert_allclose(T[mask], 400.0, rtol=1e-9)
    assert T.min() > 299.999 and T.max() < 400.001
    # temperature decays with radius outside the body
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
    rr = np.linalg.norm(cc - 0.5, axis=1)
    near = T[(rr > 0.22) & (rr < 0.3)].mean()
    far = T[rr > 0.45].mean()
    assert near > far + 5.0


def test_extrude_2d_to_3d():
    from fvm_tpu.mesh.generate import extrude
    from fvm_tpu.mesh.metrics import compute_geometry

    m2 = quad_2d(4, 3, lx=2.0, ly=1.5)
    m3 = extrude(m2, nz=5, lz=0.5)
    assert m3.dim == 3
    assert m3.n_interior_cells == 4 * 3 * 5
    g = compute_geometry(m3)
    assert g.cell_volume[: m3.n_interior_cells].sum() == pytest.approx(
        2.0 * 1.5 * 0.5, rel=1e-10
    )
    names = {fg.name for fg in m3.boundary_groups}
    assert {"left", "right", "bottom", "top", "zmin", "zmax"} <= names


def test_grid_interpolator():
    from fvm_tpu.geom import Grid

    xs = np.linspace(0, 1, 11)
    ys = np.linspace(0, 1, 11)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    vals = np.stack([X + Y, X - Y], axis=-1)
    g = Grid((xs, ys), vals)
    out = g.computeInterpolatedVelocity([[0.25, 0.5], [0.7, 0.1]])
    np.testing.assert_allclose(out, [[0.75, -0.25], [0.8, 0.6]], atol=1e-12)


def test_particle_tracking_rotation():
    from fvm_tpu.geom import ParticleTracker

    mesh = quad_2d(32, 32, lx=2.0, ly=2.0)
    dm = fvm.mesh.build_device_mesh(mesh)
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells] - 1.0
    vel = np.stack([-cc[:, 1], cc[:, 0]], axis=1)  # solid-body rotation
    pt = ParticleTracker(dm)
    p0 = np.array([[1.5, 1.0]])
    traj = pt.track(p0, vel, dt=0.05, n_steps=50)
    r = np.linalg.norm(traj - 1.0, axis=2)
    # the gradient-corrected interpolation is EXACT for this linear
    # field, so only the tiny RK2 truncation drift remains (the old
    # nearest-centroid sampling drifted ~10% here)
    assert abs(r[-1, 0] - 0.5) < 2e-3
    # velocity interpolation at off-centroid points is exact for linear u
    pts = np.array([[1.37, 0.81], [0.42, 1.63]])
    v = pt.velocity_at(pts, vel, pt._velocity_gradient(vel))
    exact = np.stack([-(pts[:, 1] - 1.0), pts[:, 0] - 1.0], axis=1)
    np.testing.assert_allclose(v, exact, atol=1e-10)


def test_ib_interpolation_stencil():
    """Immersed hot circle: IB-band cells pinned to the inverse-distance
    interpolation of the wall value and surrounding fluid cells
    (reference createIBInterpolationStencil/GenericIBDiscretization).
    At convergence the stencil constraint holds exactly and the band
    transitions monotonically between body and ambient temperatures."""
    from fvm_tpu.geom.ibm import IBManager, IBType

    n = 24
    mesh = quad_2d(n, n)
    ibm = IBManager(mesh)
    th = np.linspace(0, 2 * np.pi, 33)[:-1]
    verts = np.stack([0.5 + 0.15 * np.cos(th), 0.5 + 0.15 * np.sin(th)], 1)
    elems = np.stack([np.arange(32), (np.arange(32) + 1) % 32], 1)
    ibm.update(verts, elems)
    assert (ibm.ib_type == IBType.IB).sum() > 0
    dm = fvm.mesh.build_device_mesh(mesh)

    m = ThermalModel(dm)
    m.options["verbose"] = False
    for s_ in ("left", "right", "bottom", "top"):
        m.bc[s_].bc_type = "SpecifiedTemperature"
        m.bc[s_]["specifiedTemperature"] = 300.0
    m.init()  # set_immersed_boundary must come AFTER init (params rebuilt)
    st = ibm.interpolation_stencil()
    Tbody = 350.0
    m.set_immersed_boundary(
        ibm.dirichlet_mask(include_ib=False), Tbody, stencil=st
    )
    m.advance(80)
    T = np.zeros(dm.n_cells)
    T[: dm.n_interior_cells] = m.getTemperature()
    ib, fluid_idx, fluid_w, wall_w = st
    # the pinned constraint holds at convergence
    expect = (wall_w * Tbody + (fluid_w * T[fluid_idx]).sum(1)) / (
        wall_w + fluid_w.sum(1)
    )
    np.testing.assert_allclose(T[ib], expect, atol=1e-6)
    # solid cells at the body value; band between ambient and body
    solid = ibm.ib_type[: dm.n_interior_cells] == IBType.SOLID
    np.testing.assert_allclose(
        m.getTemperature()[solid], Tbody, atol=1e-8
    )
    assert (T[ib] > 300.0).all() and (T[ib] < 350.0 + 1e-9).all()
    # the band is WARMER than the surrounding fluid ring it interpolates
    assert T[ib].mean() > T[fluid_idx].mean()


def test_cell_mark_particles():
    """Particle-cloud marking (reference CellMark module): cells under the
    cloud are SOLID, the surrounding ring is IB, and a thermal solve pins
    them like any immersed body."""
    from fvm_tpu.geom.ibm import cell_mark_particles, IBType

    mesh = quad_2d(20, 20)
    th = np.random.default_rng(0).uniform(0, 2 * np.pi, 200)
    r = np.sqrt(np.random.default_rng(1).uniform(0, 1, 200)) * 0.12
    pts = np.stack([0.5 + r * np.cos(th), 0.5 + r * np.sin(th)], 1)
    t = cell_mark_particles(mesh, pts, radius=0.05)
    n_solid = (t[: mesh.n_interior_cells] == IBType.SOLID).sum()
    n_ib = (t[: mesh.n_interior_cells] == IBType.IB).sum()
    assert n_solid > 0 and n_ib > 0
    # the marked blob sits in the domain centre
    cc = np.asarray(fvm.mesh.build_device_mesh(mesh).cell_centroid)
    solid_cc = cc[: mesh.n_interior_cells][t[: mesh.n_interior_cells] == IBType.SOLID]
    assert np.abs(solid_cc - 0.5).max() < 0.25
    # drives the standard immersed-boundary pinning
    dm = fvm.mesh.build_device_mesh(mesh)
    m = ThermalModel(dm)
    m.options["verbose"] = False
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "SpecifiedTemperature"
        m.bc[s]["specifiedTemperature"] = 300.0
    m.init()
    mask = (t == IBType.SOLID) | (t == IBType.IB)
    m.set_immersed_boundary(mask, 380.0)
    m.advance(10)
    T = m.getTemperature()
    np.testing.assert_allclose(T[mask[: dm.n_interior_cells]], 380.0, rtol=1e-8)
    assert T.min() > 299.9


def _circle_ibm(n=24, r=0.15):
    from fvm_tpu.geom.ibm import IBManager

    mesh = quad_2d(n, n)
    ibm = IBManager(mesh)
    th = np.linspace(0, 2 * np.pi, 33)[:-1]
    verts = np.stack([0.5 + r * np.cos(th), 0.5 + r * np.sin(th)], 1)
    elems = np.stack([np.arange(32), (np.arange(32) + 1) % 32], 1)
    ibm.update(verts, elems)
    return mesh, ibm


def test_ib_implicit_one_outer_iteration():
    """IMPLICIT stencil rows (appended ELL slots, reference
    GenericIBDiscretization.h): the linear thermal IB problem converges
    in ONE outer iteration, where the lagged pinned-row variant needs
    many — and both reach the same fixed point."""
    mesh, ibm = _circle_ibm()
    st = ibm.interpolation_stencil()
    Tbody = 350.0

    def solve(implicit, niter):
        dm = fvm.mesh.build_device_mesh(quad_2d(24, 24))
        m = ThermalModel(dm)
        m.options["verbose"] = False
        for s_ in ("left", "right", "bottom", "top"):
            m.bc[s_].bc_type = "SpecifiedTemperature"
            m.bc[s_]["specifiedTemperature"] = 300.0
        m.init()
        m.set_immersed_boundary(
            ibm.dirichlet_mask(include_ib=False), Tbody, stencil=st,
            implicit=implicit,
        )
        hist = m.advance(niter)
        return m.getTemperature(), hist

    T_imp, h_imp = solve(True, 2)
    # implicit: iteration 2's residual is already at round-off
    assert h_imp[-1][1] < 1e-8 * h_imp[0][1]
    T_lag, h_lag = solve(False, 2)
    assert h_lag[-1][1] > 1e-6 * h_lag[0][1]  # lagged is NOT done in 2
    T_lag80, _ = solve(False, 80)
    np.testing.assert_allclose(T_imp, T_lag80, atol=1e-5)


def test_ib_electric_implicit_stencil():
    """Electrostatics IB with implicit stencil rows: the interpolation
    constraint holds at convergence and the potential is monotone
    between the electrode and the grounded walls."""
    from fvm_tpu.models.electric import ElectricModel

    mesh, ibm = _circle_ibm()
    st = ibm.interpolation_stencil()
    dm = fvm.mesh.build_device_mesh(quad_2d(24, 24))
    m = ElectricModel(dm)
    m.options["verbose"] = False
    for s_ in ("left", "right", "bottom", "top"):
        m.bc[s_].bc_type = "SpecifiedPotential"
        m.bc[s_]["specifiedPotential"] = 0.0
    m.init()
    m.set_immersed_boundary(
        ibm.dirichlet_mask(include_ib=False), 10.0, stencil=st
    )
    hist = m.advance(3)
    assert hist[-1][1] < 1e-8 * hist[0][1]
    phi = np.zeros(dm.n_cells)
    phi[: dm.n_interior_cells] = m.getPotential()
    ib, fluid_idx, fluid_w, wall_w = st
    expect = (wall_w * 10.0 + (fluid_w * phi[fluid_idx]).sum(1)) / (
        wall_w + fluid_w.sum(1)
    )
    np.testing.assert_allclose(phi[ib], expect, atol=1e-8)
    from fvm_tpu.geom.ibm import IBType

    solid = ibm.ib_type[: dm.n_interior_cells] == IBType.SOLID
    np.testing.assert_allclose(m.getPotential()[solid], 10.0, atol=1e-8)


def test_ib_electric_dist_matches_single():
    """Partitioned IBM electrostatics (reference: IBM_PARALLEL/TESTS:1-10
    runs the IBM case at np up to 100): pinned electrode disk at 8
    shards reproduces the single-device solution."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fvm_tpu.models.electric import ElectricModel
    from fvm_tpu.parallel import Partition

    mesh, ibm = _circle_ibm()
    mask = ibm.dirichlet_mask(include_ib=True)[: mesh.n_interior_cells]

    def solve(dist):
        m0 = quad_2d(24, 24)
        if dist:
            part = Partition(m0, 8)
            m = ElectricModel(part.sharded_mesh, partition=part)
        else:
            m = ElectricModel(fvm.mesh.build_device_mesh(m0))
        m.options["verbose"] = False
        for s_ in ("left", "right", "bottom", "top"):
            m.bc[s_].bc_type = "SpecifiedPotential"
            m.bc[s_]["specifiedPotential"] = 0.0
        m.init()
        m.set_immersed_boundary(mask, 10.0)
        m.advance(3)
        return (
            m.partition.gather_cells(m.state["potential"])
            if dist
            else m.getPotential()
        )

    phi1 = solve(False)
    phi8 = solve(True)
    np.testing.assert_allclose(phi8, phi1, atol=1e-6)


def test_ib_flow_block_force_balance():
    """Immersed block in a lid-driven cavity: at steady state the sum of
    (pressure + viscous) momentum flux over the domain boundary and over
    the IB faces vanishes (all convective fluxes are zero on walls and
    pinned IB faces), so the IB-face force integral (reference:
    IBManager.h:82 createIBFaces + the FSI force integration) must equal
    minus the boundary force sum — an exact discrete identity."""
    from fvm_tpu.models.flow import FlowModel

    n, mu = 20, 0.1
    m0 = quad_2d(n, n)
    dm = fvm.mesh.build_device_mesh(m0)
    m = FlowModel(dm)
    m.options["verbose"] = False
    m.vc["viscosity"] = mu
    for s_ in ("left", "right", "bottom", "top"):
        m.bc[s_].bc_type = "NoSlipWall"
    m.bc["top"]["specifiedXVelocity"] = 1.0
    m.init()
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
    solid = (
        (cc[:, 0] > 0.3) & (cc[:, 0] < 0.7)
        & (cc[:, 1] > 0.4) & (cc[:, 1] < 0.6)
    )
    m.set_immersed_boundary(solid, [0.0, 0.0], solid_mask=solid)
    hist = m.advance(400)
    assert hist[-1][1] < 1e-5 * max(hist[0][1], 1e-30)
    F_ib = m.getIBForceIntegral()
    F_bdry = sum(
        m.getMomentumFluxIntegral(g) for g in ("left", "right", "bottom", "top")
    )
    scale = np.abs(F_bdry).max()
    np.testing.assert_allclose(F_ib, -F_bdry, atol=2e-2 * scale)


def test_ib_flow_dist_force_matches_single():
    """Partitioned flow IBM: pinned block + IB force integral at 8
    shards reproduce the single-device run (faces deduplicated across
    seams by owner-cell ownership)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fvm_tpu.models.flow import FlowModel
    from fvm_tpu.parallel import Partition

    n, mu = 16, 0.1
    m0 = quad_2d(n, n)
    from fvm_tpu.mesh.metrics import compute_geometry

    cc = compute_geometry(m0).cell_centroid[: m0.n_interior_cells]
    solid = (
        (cc[:, 0] > 0.3) & (cc[:, 0] < 0.7)
        & (cc[:, 1] > 0.375) & (cc[:, 1] < 0.625)
    )

    def solve(dist):
        if dist:
            part = Partition(quad_2d(n, n), 8)
            m = FlowModel(part.sharded_mesh, partition=part)
        else:
            m = FlowModel(fvm.mesh.build_device_mesh(quad_2d(n, n)))
        m.options["verbose"] = False
        m.vc["viscosity"] = mu
        for s_ in ("left", "right", "bottom", "top"):
            m.bc[s_].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.init()
        m.set_immersed_boundary(solid, [0.0, 0.0], solid_mask=solid)
        m.advance(120)
        return m.getVelocity() if not dist else None, m.getIBForceIntegral()

    V1, F1 = solve(False)
    _, F8 = solve(True)
    np.testing.assert_allclose(F8, F1, atol=5e-4 * max(np.abs(F1).max(), 1e-12))


def test_ib_electric_stencil_dist_matches_single():
    """Partitioned IMPLICIT-stencil IBM (reference: IBM_PARALLEL runs the
    GenericIBDiscretization case at np up to 100): the interpolation rows
    are installed per shard on the cells it owns, with the stencil's
    fluid cells read from the halo — the 8-shard solve must reproduce the
    single-device implicit-stencil solution."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fvm_tpu.models.electric import ElectricModel
    from fvm_tpu.parallel import Partition

    mesh, ibm = _circle_ibm()
    st = ibm.interpolation_stencil()
    mask = ibm.dirichlet_mask(include_ib=False)[: mesh.n_interior_cells]

    def solve(dist):
        m0 = quad_2d(24, 24)
        if dist:
            part = Partition(m0, 8, halo_depth=2)
            m = ElectricModel(part.sharded_mesh, partition=part)
        else:
            m = ElectricModel(fvm.mesh.build_device_mesh(m0))
        m.options["verbose"] = False
        for s_ in ("left", "right", "bottom", "top"):
            m.bc[s_].bc_type = "SpecifiedPotential"
            m.bc[s_]["specifiedPotential"] = 0.0
        m.init()
        m.set_immersed_boundary(mask, 10.0, stencil=st)
        m.advance(4)
        return (
            m.partition.gather_cells(m.state["potential"])
            if dist
            else m.getPotential()
        )

    phi1 = solve(False)
    phi8 = solve(True)
    np.testing.assert_allclose(phi8, phi1, atol=1e-6)
    # the stencil constraint itself holds on the gathered dist field
    ib, fluid_idx, fluid_w, wall_w = st
    phi = np.zeros(mesh.n_interior_cells + mesh.n_boundary_faces)
    phi[: len(phi8)] = phi8
    expect = (wall_w * 10.0 + (fluid_w * phi[fluid_idx]).sum(1)) / (
        wall_w + fluid_w.sum(1)
    )
    np.testing.assert_allclose(phi[ib], expect, atol=1e-6)
