"""Mesh core tests: connectivity algebra, generators, geometry metrics.

Mirrors the reference's MESH_CLASS / MESH_PARTITIONER golden suites
(reference: src/fvm/test/MESH_CLASS) but asserts on exact geometric
invariants instead of golden files.
"""

import numpy as np
import pytest

from fvm_tpu.mesh import CRConnectivity, compute_geometry, build_device_mesh
from fvm_tpu.mesh.generate import quad_2d, tri_2d, hex_3d


def test_cr_transpose_roundtrip():
    cr = CRConnectivity.from_rows([[0, 1], [1, 2], [2]], 3)
    t = cr.transpose()
    assert t.count_from == 3 and t.count_to == 3
    tt = t.transpose()
    for i in range(cr.count_from):
        assert sorted(tt.row(i)) == sorted(cr.row(i))


def test_cr_multiply_dedup_dropself():
    # cellFaces * faceCells style composition
    cf = CRConnectivity.from_rows([[0, 1], [1, 2]], 3)
    fc = CRConnectivity.from_rows([[0], [0, 1], [1]], 2)
    cc = cf.multiply(fc, drop_self=True)
    assert list(cc.row(0)) == [1]
    assert list(cc.row(1)) == [0]


def test_cr_ell_export():
    cr = CRConnectivity.from_rows([[5, 7], [1], [2, 3, 4]], 8)
    ell, counts = cr.to_ell(pad_value=-1)
    assert ell.shape == (3, 3)
    assert list(counts) == [2, 1, 3]
    assert ell[1, 1] == -1 and ell[2, 2] == 4


@pytest.mark.parametrize("gen,n_exp", [(quad_2d, 12), (tri_2d, 24)])
def test_generators_counts(gen, n_exp):
    m = gen(4, 3)
    assert m.n_interior_cells == n_exp
    # Euler-ish sanity: every interior face has two distinct cells
    fc = m.face_cells[: m.n_interior_faces]
    assert (fc[:, 0] != fc[:, 1]).all()
    assert (fc < m.n_interior_cells).all()


def test_quad_geometry_exact():
    m = quad_2d(4, 5, lx=2.0, ly=1.0)
    g = compute_geometry(m)
    # every cell volume = (2/4)*(1/5)
    np.testing.assert_allclose(g.cell_volume[: m.n_interior_cells], 0.1, rtol=1e-13)
    # total boundary area closes: sum of all oriented face areas over each
    # cell = 0  =>  divergence of constant field is 0
    div = np.zeros((m.n_cells, 2))
    for c in range(2):
        np.subtract.at(div[:, c], m.face_cells[:, 0], -g.face_area[:, c])
        np.subtract.at(div[:, c], m.face_cells[:, 1], g.face_area[:, c])
    np.testing.assert_allclose(div[: m.n_interior_cells], 0.0, atol=1e-12)
    # centroids on the regular lattice
    cc = g.cell_centroid[: m.n_interior_cells].reshape(4, 5, 2)
    np.testing.assert_allclose(cc[0, 0], [0.25, 0.1], atol=1e-13)
    np.testing.assert_allclose(cc[3, 4], [1.75, 0.9], atol=1e-13)


def test_tri_geometry_volume_sums():
    m = tri_2d(3, 3, lx=1.0, ly=1.0)
    g = compute_geometry(m)
    assert g.cell_volume[: m.n_interior_cells].sum() == pytest.approx(1.0, rel=1e-13)
    assert (g.cell_volume[: m.n_interior_cells] > 0).all()


def test_hex_geometry_exact():
    m = hex_3d(3, 2, 2, lx=3.0, ly=2.0, lz=2.0)
    g = compute_geometry(m)
    np.testing.assert_allclose(g.cell_volume[: m.n_interior_cells], 1.0, rtol=1e-13)
    assert g.cell_volume.sum() == pytest.approx(12.0, rel=1e-13)
    # boundary areas outward: per closed surface, sum of boundary face areas = 0
    b = slice(m.n_interior_faces, m.n_faces)
    np.testing.assert_allclose(g.face_area[b].sum(axis=0), 0.0, atol=1e-12)
    # area magnitudes on xmin faces = dy*dz = 1
    grp = [fg for fg in m.face_groups if fg.name == "xmin"][0]
    np.testing.assert_allclose(g.face_area_mag[grp.faces], 1.0, rtol=1e-13)


def test_ghost_cells_at_face_centroids():
    m = quad_2d(2, 2)
    g = compute_geometry(m)
    b = slice(m.n_interior_faces, m.n_faces)
    np.testing.assert_allclose(
        g.cell_centroid[m.n_interior_cells :], g.face_centroid[b], atol=1e-14
    )
    np.testing.assert_allclose(g.cell_volume[m.n_interior_cells :], 0.0)


def test_device_mesh_tables():
    m = quad_2d(3, 3)
    dm = build_device_mesh(m)
    import numpy as np

    # device tables are slot-leading (K, nc); view row-leading for checks
    cf = np.asarray(dm.cf_face).T
    mask = np.asarray(dm.cf_mask).T
    owner = np.asarray(dm.face_cell0)
    nbr = np.asarray(dm.face_cell1)
    # every interior cell has 4 faces
    assert mask[: m.n_interior_cells].sum() == 4 * m.n_interior_cells
    # ghost rows have exactly one face (the slot-major dummy cell, if
    # present at the end, has none)
    n_gh = m.n_faces - m.n_interior_faces
    gh = slice(m.n_interior_cells, m.n_interior_cells + n_gh)
    assert (mask[gh].sum(axis=1) == 1).all()
    # cf_nbr consistent with face_cells
    cn = np.asarray(dm.cf_nbr).T
    for c in range(dm.n_cells):
        for k in range(dm.max_faces_per_cell):
            if mask[c, k]:
                f = cf[c, k]
                assert c in (owner[f], nbr[f])
                other = nbr[f] if owner[f] == c else owner[f]
                assert cn[c, k] == other
    # orthogonal mesh: non-orthogonal remainder T = 0 on interior faces
    T = np.asarray(dm.face_t)[: dm.n_interior_faces]
    np.testing.assert_allclose(T, 0.0, atol=1e-12)


def test_merge_meshes_thermal_equivalence():
    """MeshAssembler role (reference MeshAssembler.h:15): two abutting
    strips merged into one mesh must solve identically to the directly
    generated mesh (coincident boundary faces fuse into interior faces)."""
    import fvm_tpu as fvm
    from fvm_tpu.mesh.generate import quad_2d
    from fvm_tpu.mesh.assemble import merge_meshes
    from fvm_tpu.models import ThermalModel

    left = quad_2d(8, 8, lx=0.5, ly=1.0)
    right = quad_2d(8, 8, lx=0.5, ly=1.0)
    right.coords = right.coords + np.array([0.5, 0.0])
    merged = merge_meshes([left, right])
    assert merged.n_interior_cells == 128
    # the 8 coincident faces became interior: 2*8*8 cells, interior faces
    # of a 16x8 grid = 15*8 + 16*7
    assert merged.n_interior_faces == 2 * (7 * 8 + 8 * 7) + 8

    def solve(mesh):
        dm = fvm.mesh.build_device_mesh(mesh)
        m = ThermalModel(dm)
        m.options["verbose"] = False
        for nm, v in (("left", 400.0), ("right", 300.0)):
            m.bc[nm].bc_type = "SpecifiedTemperature"
            m.bc[nm]["specifiedTemperature"] = v
        m.bc["top"].bc_type = "Symmetry"
        m.bc["bottom"].bc_type = "Symmetry"
        m.init()
        m.advance(3)
        cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
        return cc, m.getTemperature()

    cc1, T1 = solve(merged)
    cc2, T2 = solve(quad_2d(16, 8, lx=1.0, ly=1.0))
    i1 = np.lexsort((cc1[:, 0], cc1[:, 1]))
    i2 = np.lexsort((cc2[:, 0], cc2[:, 1]))
    np.testing.assert_allclose(cc1[i1], cc2[i2], atol=1e-12)
    np.testing.assert_allclose(T1[i1], T2[i2], atol=1e-8)


def test_extract_region_roundtrip():
    """MeshDismantler role (reference MeshDismantler.h:16): cutting the
    left half back out of a merged mesh gives a standalone solvable mesh
    with the cut as a new boundary group."""
    import fvm_tpu as fvm
    from fvm_tpu.mesh.generate import quad_2d
    from fvm_tpu.mesh.assemble import extract_region
    from fvm_tpu.mesh.metrics import compute_geometry
    from fvm_tpu.models import ThermalModel

    full = quad_2d(16, 8, lx=1.0, ly=1.0)
    geom = compute_geometry(full)
    xc = geom.cell_centroid[: full.n_interior_cells, 0]
    sub = extract_region(full, xc < 0.5, cut_name="mid")
    assert sub.n_interior_cells == 64
    assert any(g.name == "mid" for g in sub.face_groups)

    dm = fvm.mesh.build_device_mesh(sub)
    m = ThermalModel(dm)
    m.options["verbose"] = False
    m.bc["left"].bc_type = "SpecifiedTemperature"
    m.bc["left"]["specifiedTemperature"] = 400.0
    m.bc["mid"].bc_type = "SpecifiedTemperature"
    m.bc["mid"]["specifiedTemperature"] = 300.0
    m.bc["top"].bc_type = "Symmetry"
    m.bc["bottom"].bc_type = "Symmetry"
    assert not any(g.name == "right" for g in sub.face_groups)  # dropped
    m.init()
    m.advance(3)
    T = m.getTemperature()
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
    exact = 400.0 - 200.0 * cc[:, 0]
    np.testing.assert_allclose(T, exact, atol=1e-8)
