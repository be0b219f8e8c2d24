"""StructureModel tests: patch tests with exact uniform-stress solutions.

Mirrors the reference's STRUCTURAL / CANT-{S,T}ORDER suites
(reference: src/fvm/test/STRUCTURAL) with closed-form checks.
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.structure import StructureModel


def test_uniaxial_patch_nu0():
    """nu = 0: pull right edge with traction sigma; u_x = sigma x / E exact."""
    E, sigma = 100.0, 5.0
    dm = fvm.mesh.build_device_mesh(quad_2d(10, 4))
    m = StructureModel(dm)
    m.options["verbose"] = False
    m.vc["youngsModulus"] = E
    m.vc["poissonsRatio"] = 0.0
    m.bc["left"].bc_type = "Symmetry"  # u_x = 0 plane
    m.bc["right"].bc_type = "SpecifiedTraction"
    m.bc["right"]["specifiedXTraction"] = sigma
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "ZeroTraction"
    m.init()
    hist = m.advance(10)
    assert hist[-1][1] / hist[0][1] < 1e-8
    w = m.getDeformation()
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    np.testing.assert_allclose(w[:, 0], sigma / E * x, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(w[:, 1], 0.0, atol=1e-7)
    s = m.getStress()
    np.testing.assert_allclose(s[:, 0, 0], sigma, rtol=1e-4)


def test_uniaxial_patch_plane_strain():
    """nu = 0.3 plane strain: eps_xx = (1-nu^2)/E sigma, eps_yy = -nu(1+nu)/E sigma."""
    E, nu, sigma = 200.0, 0.3, 4.0
    dm = fvm.mesh.build_device_mesh(quad_2d(8, 8))
    m = StructureModel(dm)
    m.options["verbose"] = False
    m.vc["youngsModulus"] = E
    m.vc["poissonsRatio"] = nu
    m.bc["left"].bc_type = "Symmetry"
    m.bc["right"].bc_type = "SpecifiedTraction"
    m.bc["right"]["specifiedXTraction"] = sigma
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "ZeroTraction"
    m.init()
    hist = m.advance(10)
    assert hist[-1][1] / hist[0][1] < 1e-8
    w = m.getDeformation()
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    y = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 1]
    eps_xx = (1 - nu**2) / E * sigma
    eps_yy = -nu * (1 + nu) / E * sigma
    np.testing.assert_allclose(w[:, 0], eps_xx * x, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(w[:, 1], eps_yy * y, rtol=1e-6, atol=1e-9)


def test_body_force_gravity():
    """Column under gravity, fixed bottom: sigma_yy(y) = rho g (H - y)."""
    E, rho, gmag, H = 1000.0, 10.0, 1.0, 1.0
    dm = fvm.mesh.build_device_mesh(quad_2d(4, 16))
    m = StructureModel(dm)
    m.options["verbose"] = False
    m.vc["youngsModulus"] = E
    m.vc["poissonsRatio"] = 0.0
    m.vc["bodyForceY"] = -rho * gmag
    m.bc["bottom"].bc_type = "Symmetry"  # u_y = 0
    m.bc["top"].bc_type = "ZeroTraction"
    m.bc["left"].bc_type = "Symmetry"
    m.bc["right"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(10)
    assert hist[-1][1] / hist[0][1] < 1e-8  # Newton: machine zero in ~3
    y = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 1]
    # displacement: u_y = -(rho g/E)(H y - y^2/2); quadratic -> O(h^2)
    w = m.getDeformation()
    uy = -(rho * gmag / E) * (H * y - y * y / 2)
    np.testing.assert_allclose(w[:, 1], uy, rtol=2e-3, atol=6e-6)
    # stress linear in y; LS-gradient postprocessing is O(h) at the free
    # surface, so check away from the top row
    s = m.getStress()
    dy = H / 16
    sel = y < H - 1.5 * dy
    np.testing.assert_allclose(
        s[sel, 1, 1], -rho * gmag * (H - y[sel]), rtol=5e-3, atol=5e-3
    )


def test_creep_shear_relaxation():
    """Pure shear held at fixed boundary displacement: Norton creep (m=1)
    relaxes sigma_xy by the exact explicit recurrence
    sigma_{n+1} = sigma_n (1 - 2 A mu dt / Sy)."""
    import jax.numpy as jnp

    dm = fvm.mesh.build_device_mesh(quad_2d(6, 6))
    m = StructureModel(dm)
    m.options["verbose"] = False
    m.options["creep"] = True
    A, Sy, dt = 0.05, 1.0, 0.1
    m.options["creepConstant"] = A
    m.options["creepExponent"] = 1.0
    m.options["yieldStress"] = Sy
    m.vc["youngsModulus"] = 1.0
    m.vc["poissonsRatio"] = 0.25
    mu = 1.0 / (2 * 1.25)
    gam = 0.1
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "SpecifiedDeformation"
    m.init()
    # impose w = (gam*y, 0) on each boundary group's faces
    for s in ("left", "right", "bottom", "top"):
        g = dm.group_by_name(s)
        fy = np.asarray(dm.face_centroid)[dm.group_faces(g), 1]
        m.bc[s]["specifiedXDeformation"] = gam * fy
        m.bc[s]["specifiedYDeformation"] = 0.0
    m.advance(5)
    s0 = m.getStress()[:, 0, 1]
    np.testing.assert_allclose(s0, mu * gam, rtol=1e-8)
    decay = 1.0 - 2.0 * A * mu * dt / Sy
    sig = mu * gam
    for _ in range(5):
        m.advanceCreep(dt)
        m.advance(3)  # stays converged: uniform eps_p has zero divergence
        sig *= decay
        np.testing.assert_allclose(m.getStress()[:, 0, 1], sig, rtol=1e-6)
    # von Mises consistency: pure shear -> VM = sqrt(3) |sigma_xy|
    np.testing.assert_allclose(
        m.getVMStress(), np.sqrt(3.0) * abs(sig), rtol=1e-6
    )
    assert abs(m.getPlasticStrain()[:, 0, 1].mean() - (mu * gam - sig) / (2 * mu)) < 1e-8


def test_cantilever_order_of_accuracy():
    """Mesh-convergence study of the shear-loaded cantilever against the
    Timoshenko tip deflection (reference: the CANT-SORDER order-of-
    accuracy suite, src/fvm/test/CANT-SORDER): the error must decrease
    monotonically under 2x refinement with an improving (superlinear)
    convergence ratio."""
    E, nu, L, H, P = 1000.0, 0.0, 10.0, 1.0, 0.1

    def tip_deflection(nx, ny):
        dm = fvm.mesh.build_device_mesh(quad_2d(nx, ny, lx=L, ly=H))
        m = StructureModel(dm)
        m.options["verbose"] = False
        m.vc["youngsModulus"] = E
        m.vc["poissonsRatio"] = nu
        m.bc["left"].bc_type = "SpecifiedDeformation"
        m.bc["right"].bc_type = "SpecifiedTraction"
        m.bc["right"]["specifiedYTraction"] = P
        m.bc["bottom"].bc_type = "ZeroTraction"
        m.bc["top"].bc_type = "ZeroTraction"
        m.init()
        hist = m.advance(10)
        assert hist[-1][1] / hist[0][1] < 1e-8
        w = m.getDeformation()
        x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
        return w[x[:, 0] > L - L / nx, 1].mean()

    I = H**3 / 12.0
    G = E / 2.0
    F = P * H
    exact = F * L**3 / (3 * E * I) + F * L / (5.0 / 6.0 * G * H)
    errs = [abs(tip_deflection(nx, ny) - exact) for nx, ny in
            [(20, 2), (40, 4), (80, 8)]]
    assert errs[0] > errs[1] > errs[2]
    r1 = errs[0] / errs[1]
    r2 = errs[1] / errs[2]
    assert r2 > r1 > 1.5  # improving, superlinear convergence
    assert errs[2] < 0.1 * exact  # finest grid within 10%
