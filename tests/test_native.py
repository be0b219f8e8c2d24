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
