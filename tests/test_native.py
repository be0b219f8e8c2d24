"""Native host library: bit-identity with the python fallbacks."""

import os

import numpy as np

from fvm_tpu.linear import amg as amod
from fvm_tpu.ops import ell as emod
import fvm_tpu.native as native


def _quad_graph(n_side):
    n = n_side * n_side
    i = np.arange(n)
    x, y = i % n_side, i // n_side
    cols = np.stack([i - 1, i + 1, i - n_side, i + n_side], axis=1)
    mask = np.stack([x > 0, x < n_side - 1, y > 0, y < n_side - 1], axis=1)
    cols = np.where(mask, cols, i[:, None])
    return cols.astype(np.int64), mask


def _with_python_fallback(fn, *args):
    os.environ["FVM_TPU_NO_NATIVE"] = "1"
    native._tried, saved = False, native._lib
    native._lib = None
    try:
        return fn(*args)
    finally:
        del os.environ["FVM_TPU_NO_NATIVE"]
        native._tried, native._lib = True, saved


def test_aggregate_native_matches_python():
    cols, mask = _quad_graph(37)
    if native.lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    a_nat = amod.aggregate(cols, mask)
    a_py = _with_python_fallback(amod.aggregate, cols, mask)
    assert np.array_equal(a_nat, a_py)


def test_coloring_native_matches_python():
    cols, mask = _quad_graph(23)
    if native.lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    m_nat = emod.greedy_coloring(cols, mask)
    m_py = _with_python_fallback(emod.greedy_coloring, cols, mask)
    assert np.array_equal(m_nat, m_py)


def test_cf_build_matches_numpy():
    """Native ELL cf-table construction (hostlib.cpp fvm_cf_build) is
    bit-identical to the numpy stable-sort path on quad/tri/hex meshes
    and on a double-shell interface mesh (extra_adj slot layout)."""
    import os
    import fvm_tpu.native as native
    import fvm_tpu as fvm
    from fvm_tpu.mesh.generate import quad_2d, tri_2d, hex_3d
    from fvm_tpu.mesh.metrics import compute_geometry

    if native.lib() is None:
        pytest.skip("no native toolchain")

    def tables(no_native):
        old = os.environ.pop("FVM_TPU_NO_NATIVE", None)
        if no_native:
            os.environ["FVM_TPU_NO_NATIVE"] = "1"
        native._lib = None
        native._tried = False
        try:
            out = []
            for mk in (
                lambda: quad_2d(16, 12),
                lambda: tri_2d(7, 5),
                lambda: hex_3d(4, 3, 2),
            ):
                dm = fvm.mesh.build_device_mesh(mk())
                out.append(
                    {
                        k: np.asarray(getattr(dm, k))
                        for k in ("cf_face", "cf_mask", "cf_is_owner", "cf_nbr")
                    }
                )
            m = quad_2d(16, 4, lx=2.0, ly=1.0)
            xc = compute_geometry(m).cell_centroid[: m.n_interior_cells, 0]
            left = xc < 1.0
            m2 = m.make_interface(
                "mid", m.interface_faces_between(left, ~left), left_cells=left
            )
            dm2 = fvm.mesh.build_device_mesh(m2)
            out.append(
                {
                    k: np.asarray(getattr(dm2, k))
                    for k in ("cf_face", "cf_mask", "cf_is_owner", "cf_nbr")
                }
            )
            return out
        finally:
            os.environ.pop("FVM_TPU_NO_NATIVE", None)
            if old is not None:
                os.environ["FVM_TPU_NO_NATIVE"] = old
            native._lib = None
            native._tried = False

    a = tables(False)
    b = tables(True)
    for ma, mb in zip(a, b):
        for k in ma:
            np.testing.assert_array_equal(ma[k], mb[k])
