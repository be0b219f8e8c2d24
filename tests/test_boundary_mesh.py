"""Mesh.extract_boundary_mesh (reference: Mesh::extractBoundaryMesh,
Mesh.h:313) and the opt-in FPE/NaN traps (reference: the SWIG-layer
SIGFPE -> CException handler, baseExt.i:25-30)."""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d, hex_3d
from fvm_tpu.mesh import metrics
from fvm_tpu.exceptions import MeshError, SolverError


def test_extract_boundary_mesh_quad():
    m = quad_2d(8, 6)
    bm = m.extract_boundary_mesh()
    # 2D rectangle: 2*(8+6) boundary edges
    assert bm.n_faces == 2 * (8 + 6) == m.n_boundary_faces
    # node compaction: only perimeter nodes survive
    assert bm.n_nodes == 2 * (8 + 6)
    assert bm.coords.shape == (bm.n_nodes, 2)
    # groups preserved with a slice per parent group
    names = {g[0] for g in bm.groups}
    assert names == {g.name for g in m.boundary_groups}
    sl = bm.group_slice("left")
    assert sl.stop - sl.start == 6
    # parent mappings round-trip: parent faces are boundary faces, owner
    # cells are interior
    assert (bm.parent_faces >= m.n_interior_faces).all()
    assert (bm.parent_cells < m.n_interior_cells).all()
    # geometry matches the parent's face metrics on those faces
    geom = metrics.compute_geometry(m)
    xc, an = bm.face_geometry()
    assert np.allclose(xc, geom.face_centroid[bm.parent_faces])
    assert np.allclose(
        np.abs(an), np.abs(geom.face_area[bm.parent_faces])
    )
    # area magnitude = edge length = 1/8 or 1/6
    mags = np.linalg.norm(an, axis=1)
    assert np.allclose(np.sort(np.unique(np.round(mags, 12))),
                       [1.0 / 8.0, 1.0 / 6.0])


def test_extract_boundary_mesh_group_subset_3d():
    m = hex_3d(4, 3, 2)
    bm = m.extract_boundary_mesh(groups=["zmax"])
    assert [g[0] for g in bm.groups] == ["zmax"]
    assert bm.n_faces == 4 * 3
    xc, an = bm.face_geometry()
    geom = metrics.compute_geometry(m)
    assert np.allclose(xc, geom.face_centroid[bm.parent_faces])
    assert np.allclose(
        np.abs(an), np.abs(geom.face_area[bm.parent_faces]), atol=1e-12
    )
    with pytest.raises(MeshError):
        m.extract_boundary_mesh(groups=["nope"])


def test_trap_nonfinite_raises():
    """trapNonfinite=True turns a NaN outer residual into SolverError."""
    m = quad_2d(8, 8)
    dm = fvm.mesh.build_device_mesh(m)
    t = fvm.models.ThermalModel(dm)
    for g in ("left", "right", "bottom", "top"):
        t.bc[g].bc_type = "SpecifiedTemperature"
    t.options["verbose"] = False
    t.options["trapNonfinite"] = True
    t.init()
    # poison the state so the residual goes NaN
    import jax.numpy as jnp

    t.state["T"] = t.state["T"].at[0].set(jnp.nan)
    with pytest.raises(SolverError, match="non-finite"):
        t.advance(2)
    # also through the chunked path
    t2 = fvm.models.ThermalModel(dm)
    for g in ("left", "right", "bottom", "top"):
        t2.bc[g].bc_type = "SpecifiedTemperature"
    t2.options["verbose"] = False
    t2.options["trapNonfinite"] = True
    t2.options["outerChunk"] = 4
    t2.init()
    t2.state["T"] = t2.state["T"].at[0].set(jnp.nan)
    with pytest.raises(SolverError, match="non-finite"):
        t2.advance(4)


def test_enable_fpe_checks_roundtrip():
    """enable_fpe_checks wires jax_debug_nans/infs (the per-primitive
    trap); verify the config flips and a NaN-producing jitted op raises."""
    import jax
    import jax.numpy as jnp

    fvm.enable_fpe_checks(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    finally:
        fvm.enable_fpe_checks(False)
    # off again: no raise
    out = jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0))
    assert np.isnan(float(out))
