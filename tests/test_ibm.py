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
