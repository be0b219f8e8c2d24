"""I/O tests: Fluent reader (against reference-shipped cases), VTK writer,
MatrixMarket reader, persistence."""

import os

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.io.fluent import read_fluent_mesh
from fvm_tpu.io.vtk import write_vtk
from fvm_tpu.io.matrixmarket import read_matrix_market
from fvm_tpu.io.persistence import Persistence
from fvm_tpu.mesh.metrics import compute_geometry
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models import ThermalModel

REF = "/root/reference/src/fvm/test"
have_ref = os.path.isdir(REF)


@pytest.mark.skipif(not have_ref, reason="reference meshes unavailable")
def test_fluent_ascii_2d_cavity():
    m = read_fluent_mesh(f"{REF}/cav32.cas")
    assert m.dim == 2 and m.n_interior_cells == 1024
    g = compute_geometry(m)
    assert g.cell_volume.sum() == pytest.approx(1.0, rel=1e-10)
    assert (g.cell_volume[: m.n_interior_cells] > 0).all()
    assert {fg.name for fg in m.boundary_groups} == {"w1", "w2", "w3", "w4"}


@pytest.mark.skipif(not have_ref, reason="reference meshes unavailable")
def test_fluent_binary_3d():
    m = read_fluent_mesh(f"{REF}/3d-cube.cas")
    assert m.dim == 3 and m.n_interior_cells == 8000
    g = compute_geometry(m)
    assert g.cell_volume.sum() == pytest.approx(8.0, rel=1e-10)


@pytest.mark.skipif(not have_ref, reason="reference meshes unavailable")
def test_fluent_thermal_solve_on_reference_cavity():
    """Solve conduction on the reference's own cav32 mesh."""
    m = read_fluent_mesh(f"{REF}/cav32.cas")
    dm = fvm.mesh.build_device_mesh(m)
    t = ThermalModel(dm)
    t.options["verbose"] = False
    # w1..w4 are the 4 walls; pick two opposite ones by centroid
    g = compute_geometry(m)
    for fg in m.boundary_groups:
        xc = g.face_centroid[fg.faces].mean(axis=0)
        bc = t.bc[fg.name]
        if xc[0] < 0.25:
            bc.bc_type = "SpecifiedTemperature"
            bc["specifiedTemperature"] = 400.0
        elif xc[0] > 0.75:
            bc.bc_type = "SpecifiedTemperature"
            bc["specifiedTemperature"] = 300.0
        else:
            bc.bc_type = "Symmetry"
    t.init()
    hist = t.advance(5)
    assert hist[-1][1] / hist[0][1] < 1e-8
    T = t.getTemperature()
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    np.testing.assert_allclose(T, 400.0 - 100.0 * x, rtol=1e-6)


def test_vtk_writer(tmp_path):
    m = quad_2d(4, 3)
    path = tmp_path / "out.vtk"
    write_vtk(str(path), m, {"T": np.arange(12.0), "vel": np.ones((12, 2))})
    text = path.read_text()
    assert "UNSTRUCTURED_GRID" in text
    assert "CELL_DATA 12" in text
    assert "SCALARS T" in text and "VECTORS vel" in text
    # every cell line starts with 4 (quads)
    cells = text.split("CELLS 12")[1].splitlines()[1:13]
    assert all(line.startswith("4 ") for line in cells)


def test_matrix_market_roundtrip(tmp_path):
    mmpath = tmp_path / "a.mtx"
    mmpath.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 7\n"
        "1 1 4.0\n2 2 4.0\n3 3 4.0\n"
        "1 2 -1.0\n2 1 -1.0\n2 3 -1.0\n3 2 -1.0\n"
    )
    A, _ = read_matrix_market(str(mmpath))
    import jax.numpy as jnp

    x = jnp.asarray([1.0, 2.0, 3.0])
    y = np.asarray(A.mv(x))
    np.testing.assert_allclose(y, [4 - 2, -1 + 8 - 3, -2 + 12], rtol=1e-12)


def test_persistence_file_roundtrip(tmp_path):
    m = quad_2d(6, 6)
    dm = fvm.mesh.build_device_mesh(m)
    t = ThermalModel(dm)
    t.options["verbose"] = False
    t.bc["left"].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = 350.0
    t.bc["right"].bc_type = "SpecifiedTemperature"
    t.bc["bottom"].bc_type = "Symmetry"
    t.bc["top"].bc_type = "Symmetry"
    t.init()
    t.advance(3)

    path = str(tmp_path / "ckpt.npz")
    p = Persistence(path, "w")
    p.save_model("thermal", t)
    p.save_mesh(m)
    p.close()

    t2 = ThermalModel(dm)
    t2.options["verbose"] = False
    for side, ty in (("left", "SpecifiedTemperature"), ("right", "SpecifiedTemperature"),
                     ("bottom", "Symmetry"), ("top", "Symmetry")):
        t2.bc[side].bc_type = ty
    t2.bc["left"]["specifiedTemperature"] = 350.0
    t2.init()
    Persistence(path, "r").restore_model("thermal", t2)
    np.testing.assert_array_equal(t.getTemperature(), t2.getTemperature())


@pytest.mark.slow
@pytest.mark.skipif(not have_ref, reason="reference meshes unavailable")
def test_thermal_on_reference_3d_beam():
    """Heat conduction on the reference's 45k-cell unstructured 3D beam
    case (binary Fluent sections, mixed face counts)."""
    m = read_fluent_mesh(f"{REF}/3d-beam-45k.cas")
    assert m.dim == 3 and m.n_interior_cells == 44630
    dm = fvm.mesh.build_device_mesh(m)
    t = ThermalModel(dm)
    t.options["verbose"] = False
    t.bc["beam-bot"].bc_type = "SpecifiedTemperature"
    t.bc["beam-bot"]["specifiedTemperature"] = 400.0
    t.bc["beam-top"].bc_type = "SpecifiedTemperature"
    t.bc["beam-top"]["specifiedTemperature"] = 400.0
    t.bc["outwalls"].bc_type = "Convective"
    t.bc["outwalls"]["heatTransferCoefficient"] = 1e-3
    t.bc["outwalls"]["farFieldTemperature"] = 300.0
    for g in ("beam-side-1", "beam-side-2", "beam-tip"):
        t.bc[g].bc_type = "Symmetry"
    t.init()
    hist = t.advance(20)
    assert hist[-1][1] / hist[0][1] < 1e-6
    T = t.getTemperature()
    assert 300.0 - 1e-6 <= T.min() and T.max() <= 400.0 + 1e-6
    # energy balance: beam heat in = convective loss out
    qin = t.getHeatFluxIntegral("beam-bot") + t.getHeatFluxIntegral("beam-top")
    qout = t.getHeatFluxIntegral("outwalls")
    assert qin + qout == pytest.approx(0.0, abs=2e-5 * abs(qin))


def test_netcdf_roundtrip(tmp_path):
    """NetCDF mesh+fields round trip (reference NcDataWriter/NcDataReader
    via scipy's NetCDF3 backend): topology, groups, and fields survive,
    and the reread mesh solves identically."""
    from fvm_tpu.io import write_netcdf, read_netcdf

    mesh = quad_2d(6, 5)
    dm = fvm.mesh.build_device_mesh(mesh)
    T = np.linspace(300.0, 400.0, mesh.n_interior_cells)
    V = np.random.default_rng(3).normal(size=(mesh.n_interior_cells, 2))
    p = str(tmp_path / "case.nc")
    write_netcdf(p, mesh, {"T": T, "velocity": V})
    mesh2, fields = read_netcdf(p)

    assert mesh2.dim == mesh.dim
    assert mesh2.n_interior_cells == mesh.n_interior_cells
    assert mesh2.n_faces == mesh.n_faces
    np.testing.assert_allclose(mesh2.coords, mesh.coords)
    np.testing.assert_array_equal(mesh2.face_cells, mesh.face_cells)
    assert [g.name for g in mesh2.face_groups] == [g.name for g in mesh.face_groups]
    np.testing.assert_allclose(fields["T"], T)
    np.testing.assert_allclose(fields["velocity"], V)

    # the reread mesh is solvable and gives the same answer
    from fvm_tpu.models import ThermalModel

    def solve(msh):
        d = fvm.mesh.build_device_mesh(msh)
        m = ThermalModel(d)
        m.options["verbose"] = False
        m.bc["left"].bc_type = "SpecifiedTemperature"
        m.bc["left"]["specifiedTemperature"] = 400.0
        m.bc["right"].bc_type = "SpecifiedTemperature"
        m.bc["right"]["specifiedTemperature"] = 300.0
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        m.advance(10)
        return m.getTemperature()

    np.testing.assert_allclose(solve(mesh2), solve(quad_2d(6, 5)), atol=1e-10)


def test_matrix_market_round_trip(tmp_path):
    """write_matrix_market -> read_matrix_market reproduces the operator
    (reference: FlowModel dumpContinuityMatrix + MMReader loop)."""
    import jax.numpy as jnp
    from fvm_tpu.models.flow import FlowModel
    from fvm_tpu.io.matrixmarket import read_matrix_market

    dm = fvm.mesh.build_device_mesh(quad_2d(12, 12))
    m = FlowModel(dm)
    m.options["verbose"] = False
    m.vc["viscosity"] = 0.05
    for side in ("left", "right", "bottom", "top"):
        m.bc[side].bc_type = "NoSlipWall"
    m.bc["top"]["specifiedXVelocity"] = 1.0
    m.init()
    m.advance(5)
    prefix = str(tmp_path / "cont")
    m.dumpContinuityMatrix(prefix)
    A2, b2 = read_matrix_market(prefix + ".mtx", prefix + "_rhs.mtx")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(A2.diag.shape[0]))

    # rebuild the original system the same way to compare the action
    from fvm_tpu.ops import assembly
    from fvm_tpu.core import bcs as bck

    mesh = m.mesh
    interior = jnp.arange(mesh.n_cells) < mesh.n_interior_cells
    bnd = jnp.arange(mesh.n_faces) >= mesh.n_interior_faces
    aP = m.state["momAp"]
    rho_f = assembly.cells_to_faces_distance_weighted(mesh, m.params["rho"])
    voap = jnp.where(interior, mesh.cell_volume / aP, 0.0)
    voap_f = assembly.cells_to_faces_distance_weighted(
        mesh, bck.extend_to_ghosts(mesh, voap)
    )
    Df = rho_f * voap_f * mesh.face_e_over_d
    Df_cont = jnp.where(bnd, 0.0, Df)
    Ap, rp = assembly.assemble(
        mesh,
        assembly.FaceFlux(
            F=m.state["massFlux"], dF_dO=Df_cont, dF_dN=-Df_cont
        ),
    )
    gh = slice(mesh.n_interior_cells, mesh.n_cells)
    Ap = Ap.replace(diag=Ap.diag.at[gh].set(1.0), off=Ap.off.at[:, gh].set(0.0))
    rp = rp.at[gh].set(0.0)
    np.testing.assert_allclose(
        np.asarray(A2.mv(x)), np.asarray(Ap.mv(x)), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(b2), np.asarray(rp), atol=1e-15)


@pytest.mark.skipif(not have_ref, reason="reference meshes unavailable")
def test_fluent_cell_zones_two_material():
    """Cell-zone capture + per-zone mesh split on the reference's own
    TwoMaterialTest.cas (reference: FluentReader.cpp:182 FluentCellZone,
    FluentReader.h:89 getMeshList — one Mesh per material zone)."""
    from fvm_tpu.io.fluent import read_fluent_meshes

    m = read_fluent_mesh(f"{REF}/TwoMaterialTest.cas")
    names = {z[1]: z for z in m.cell_zones}
    assert set(names) == {"leftzone", "rightzone"}
    assert sum(len(z[3]) for z in m.cell_zones) == m.n_interior_cells
    # masks partition the interior cells
    ml = m.cell_zone_mask("leftzone")
    mr = m.cell_zone_mask("rightzone")
    assert (ml ^ mr).all()

    meshes = read_fluent_meshes(f"{REF}/TwoMaterialTest.cas")
    assert {mm.zone_name for mm in meshes} == {"leftzone", "rightzone"}
    for mm in meshes:
        assert mm.n_interior_cells == 100
        cut = [g for g in mm.boundary_groups if g.name.startswith("interface:")]
        assert len(cut) == 1 and cut[0].count == 10


@pytest.mark.skipif(not have_ref, reason="reference meshes unavailable")
def test_two_material_species_steady():
    """Steady limit of the reference's testSpeciesModel_UnsteadyTwoMaterial
    (scripts/testSpeciesModel_UnsteadyTwoMaterial.py): two-layer diffusion
    with D_left=10e-6, D_right=2e-6, c=0|1 on the outer walls — exact
    piecewise-linear profile with flux continuity at x=0."""
    from fvm_tpu.models import SpeciesModel
    from fvm_tpu.mesh.metrics import compute_geometry

    m = read_fluent_mesh(f"{REF}/TwoMaterialTest.cas")
    left = m.cell_zone_mask("leftzone")
    DL, DR = 10.0e-6, 2.0e-6
    dm = fvm.mesh.build_device_mesh(m)
    model = SpeciesModel(dm)
    model.options["verbose"] = False
    model.vc["massDiffusivity"] = np.where(left, DL, DR)
    for name in ("top", "top:008", "bottom", "bottom:001"):
        model.bc[name].bc_type = "SpecifiedMassFlux"
        model.bc[name]["specifiedMassFlux"] = 0.0
    model.bc["left"].bc_type = "SpecifiedMassFraction"
    model.bc["left"]["specifiedMassFraction"] = 0.0
    model.bc["right"].bc_type = "SpecifiedMassFraction"
    model.bc["right"]["specifiedMassFraction"] = 1.0
    model.init()
    hist = model.advance(3)
    assert hist[-1][1] / max(hist[0][1], 1e-300) < 1e-10

    g = compute_geometry(m)
    xc = g.cell_centroid[: m.n_interior_cells, 0]
    c = np.asarray(model.getMassFraction(0))[: m.n_interior_cells]
    # series resistance: q = 1 / (L/DL + L/DR), interface value q*L/DL
    L = 10.0
    q = 1.0 / (L / DL + L / DR)
    ci = q * L / DL
    exact = np.where(left, (xc + 10.0) / L * ci, ci + xc / L * (1.0 - ci))
    np.testing.assert_allclose(c, exact, atol=1e-9)


def test_partitioned_netcdf_restart(tmp_path):
    """Partitioned netCDF dump/restore (reference: NcDataReader.h:25
    per-rank restart): a distributed transient run dumped mid-flight and
    restored — at the SAME shard count (bit-exact) and at a DIFFERENT
    shard count (reassembled + re-scattered) — continues identically to
    the uninterrupted run."""
    import jax
    import fvm_tpu as fvm
    from fvm_tpu.mesh.generate import quad_2d
    from fvm_tpu.models import ThermalModel
    from fvm_tpu.parallel import Partition
    from fvm_tpu.linear import BiCGStab, JacobiSolver
    from fvm_tpu.io.netcdf import save_dist_state, load_dist_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    def build(n_shards):
        part = Partition(quad_2d(16, 8), n_shards)
        t = ThermalModel(part.sharded_mesh, partition=part)
        t.options["verbose"] = False
        t.options["transient"] = True
        t.options["timeStep"] = 0.01
        t.options["linearSolver"] = BiCGStab(
            preconditioner=JacobiSolver(sweeps=2),
            relative_tolerance=1e-13, max_iterations=500,
        )
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedTemperature"
        t.bc["right"]["specifiedTemperature"] = 300.0
        t.bc["bottom"].bc_type = "Symmetry"
        t.bc["top"].bc_type = "Symmetry"
        t.init()
        return t

    def steps(t, k):
        for _ in range(k):
            t.advance(3)
            t.updateTime()

    # uninterrupted reference: 6 transient steps
    ref = build(4)
    steps(ref, 6)
    T_ref = ref.partition.gather_cells(ref.state["T"])

    # dump after 3, restore, continue 3
    t1 = build(4)
    steps(t1, 3)
    path = str(tmp_path / "dist_state.nc")
    save_dist_state(path, t1)

    t2 = build(4)  # same shard count: bit-exact restore
    load_dist_state(path, t2)
    np.testing.assert_array_equal(
        np.asarray(t2.state["T"]), np.asarray(t1.state["T"])
    )
    steps(t2, 3)
    T_same = t2.partition.gather_cells(t2.state["T"])
    np.testing.assert_allclose(T_same, T_ref, rtol=0, atol=1e-12)

    t3 = build(8)  # different shard count: reassemble + re-scatter
    load_dist_state(path, t3)
    steps(t3, 3)
    T_diff = t3.partition.gather_cells(t3.state["T"])
    np.testing.assert_allclose(T_diff, T_ref, rtol=0, atol=1e-9)
