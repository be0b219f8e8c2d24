"""PlateModel tests vs thin-plate theory.

Mirrors the reference's PLATE_MATRIX / CANT-* suites with analytic checks.
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.plate import PlateModel


def test_clamped_square_plate_uniform_load():
    """Center deflection of a clamped square plate:
    w_max = 0.00126 q a^4 / D (thin-plate; Mindlin adds a little shear)."""
    E, nu, h, q, a = 2e11, 0.3, 0.01, 1e4, 1.0
    D = E * h**3 / (12 * (1 - nu**2))
    n = 24
    dm = fvm.mesh.build_device_mesh(quad_2d(n, n, lx=a, ly=a))
    m = PlateModel(dm)
    m.options["verbose"] = False
    m.vc["ym"] = E
    m.vc["nu"] = nu
    m.vc["thickness"] = h
    m.vc["pressure"] = q
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "Clamped"
    m.init()
    hist = m.advance(8)
    assert hist[-1][1] / hist[0][1] < 1e-6
    w = m.getDeflection().reshape(n, n)
    w_center = w[n // 2 - 1 : n // 2 + 1, n // 2 - 1 : n // 2 + 1].mean()
    w_exact = 0.00126 * q * a**4 / D
    assert w_center == pytest.approx(w_exact, rel=0.08)
    # symmetric
    np.testing.assert_allclose(w, w[::-1, :], atol=1e-12)
    np.testing.assert_allclose(w, w[:, ::-1], atol=1e-12)
    assert w.min() >= -1e-3 * w.max()  # at most tiny corner undershoot


def test_cantilever_plate_strip():
    """Clamped-free strip under uniform load ~ cantilever beam:
    w_tip = q L^4 / (8 D) per unit width (thin limit)."""
    E, nu, h, q, L = 1e9, 0.0, 0.02, 100.0, 1.0
    D = E * h**3 / 12.0
    dm = fvm.mesh.build_device_mesh(quad_2d(30, 4, lx=L, ly=0.2))
    m = PlateModel(dm)
    m.options["verbose"] = False
    m.vc["ym"] = E
    m.vc["nu"] = nu
    m.vc["thickness"] = h
    m.vc["pressure"] = q
    m.bc["left"].bc_type = "Clamped"
    m.bc["right"].bc_type = "Free"
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(8)
    assert hist[-1][1] / hist[0][1] < 1e-6
    w = m.getDeflection().reshape(30, 4).mean(axis=1)
    w_exact = q * L**4 / (8 * D)
    assert w[-1] == pytest.approx(w_exact, rel=0.15)


def test_cantilever_plate_order_of_accuracy():
    """Mesh-convergence of the cantilever strip tip deflection toward the
    thin-plate solution (reference: CANT-TORDER order-of-accuracy suite):
    monotone error decrease at a consistent refinement ratio."""
    E, nu, h, q, L = 1e9, 0.0, 0.02, 100.0, 1.0
    D = E * h**3 / 12.0
    exact = q * L**4 / (8 * D)

    def tip(nx, ny):
        dm = fvm.mesh.build_device_mesh(quad_2d(nx, ny, lx=L, ly=0.2))
        m = PlateModel(dm)
        m.options["verbose"] = False
        m.vc["ym"] = E
        m.vc["nu"] = nu
        m.vc["thickness"] = h
        m.vc["pressure"] = q
        m.bc["left"].bc_type = "Clamped"
        m.bc["right"].bc_type = "Free"
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        hist = m.advance(8)
        assert hist[-1][1] / hist[0][1] < 1e-6
        return m.getDeflection().reshape(nx, ny).mean(axis=1)[-1]

    errs = [abs(tip(nx, ny) - exact) for nx, ny in
            [(15, 2), (30, 4), (60, 8)]]
    assert errs[0] > errs[1] > errs[2]
    assert errs[0] / errs[1] > 1.5 and errs[1] / errs[2] > 1.5
    assert errs[2] < 0.015 * exact
