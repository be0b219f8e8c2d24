"""Mesh motion, structure-deformation mapping, and contact force tests."""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.mesh.metrics import compute_geometry
from fvm_tpu.models.motion import MovingMeshModel, StructureDeformationModel
from fvm_tpu.models.contact import ContactModel
from fvm_tpu.models.structure import StructureModel


def test_moving_mesh_top_wall():
    mesh = quad_2d(8, 8)
    mm = MovingMeshModel(mesh)
    mm.set_boundary_displacement("top", [0.0, 0.1])
    new_mesh, dm = mm.advance(200)
    g = compute_geometry(new_mesh)
    total = g.cell_volume[: new_mesh.n_interior_cells].sum()
    assert total == pytest.approx(1.1, rel=1e-6)
    assert mm.volChange == pytest.approx(0.1, rel=1e-5)
    # interior nodes moved smoothly: top row by 0.1, bottom by 0
    y = new_mesh.coords[:, 1]
    assert y.max() == pytest.approx(1.1, abs=1e-9)
    assert y.min() == pytest.approx(0.0, abs=1e-9)


def test_structure_deformation_mapping():
    mesh = quad_2d(10, 4)
    dm = fvm.mesh.build_device_mesh(mesh)
    s = StructureModel(dm)
    s.options["verbose"] = False
    s.vc["youngsModulus"] = 100.0
    s.vc["poissonsRatio"] = 0.0
    s.bc["left"].bc_type = "Symmetry"
    s.bc["right"].bc_type = "SpecifiedTraction"
    s.bc["right"]["specifiedXTraction"] = 5.0
    s.bc["bottom"].bc_type = "Symmetry"
    s.bc["top"].bc_type = "ZeroTraction"
    s.init()
    s.advance(5)
    sd = StructureDeformationModel(mesh, s)
    disp = sd.getNodeDisplacement()
    # node displacement should approximate u_x = 0.05 x
    x = mesh.coords[:, 0]
    interior = (x > 0.15) & (x < 0.85)
    np.testing.assert_allclose(
        disp[interior, 0], 0.05 * x[interior], rtol=0.05, atol=1e-4
    )
    new_mesh, new_dm = sd.deformStructure()
    g = compute_geometry(new_mesh)
    # stretched bar: volume grows by ~ mean strain
    assert g.cell_volume[: mesh.n_interior_cells].sum() > 1.0


def test_contact_force_gap_law():
    mesh = quad_2d(8, 2, ly=0.25)
    dm = fvm.mesh.build_device_mesh(mesh)
    # rigid counter-surface just below the bottom wall
    xs = np.linspace(0, 1, 50)
    surface = np.stack([xs, np.full(50, -0.05)], axis=1)
    cm = ContactModel(dm, surface)
    cm.vc["contactStiffness"] = 1000.0
    cm.vc["contactGap"] = 0.1
    F = cm.computeSolidSurfaceForce("bottom")
    # gap = 0.05 < g_c: repulsion pushes +y (away from the counter-surface)
    assert (F[:, 1] > 0).all()
    # far wall (top, gap 1.3): no force
    F_top = cm.computeSolidSurfaceForce("top")
    np.testing.assert_allclose(F_top, 0.0, atol=1e-12)


def test_swept_volume_gcl():
    """Discrete geometric conservation law: the per-cell sum of swept
    volume rates equals (V_new - V_old)/dt exactly for a stretching mesh
    (reference MovingMeshModel.h volChange/sweptVolDot)."""
    from fvm_tpu.models.motion import MovingMeshModel
    from fvm_tpu.mesh.metrics import compute_geometry

    mesh = quad_2d(8, 6)
    mm = MovingMeshModel(mesh)
    V0 = compute_geometry(mesh).cell_volume[: mesh.n_interior_cells].copy()
    dt = 0.25
    mm.set_boundary_displacement("right", [0.3, 0.0])
    new_mesh, dm = mm.advance(200, dt=dt)
    V1 = compute_geometry(new_mesh).cell_volume[: mesh.n_interior_cells]
    svd = mm.sweptVolDot
    fc = mesh.face_cells
    dVdt = np.zeros(mesh.n_cells)
    np.add.at(dVdt, fc[:, 0], svd)
    np.add.at(dVdt, fc[:, 1], -svd)
    np.testing.assert_allclose(
        dVdt[: mesh.n_interior_cells], (V1 - V0) / dt, atol=1e-11
    )
    # grid flux: first step = sweptVolDot; after a second motion the BDF2
    # extrapolation kicks in
    gf1 = mm.grid_flux()
    np.testing.assert_allclose(gf1, svd)
    mm.set_boundary_displacement("right", [0.1, 0.0])
    mm.advance(200, dt=dt)
    gf2 = mm.grid_flux()
    np.testing.assert_allclose(gf2, 1.5 * mm.sweptVolDot - 0.5 * svd)
