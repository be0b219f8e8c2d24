"""Tecplot / Fluent-data exporter smoke tests."""

import numpy as np

from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.io import write_tecplot, write_fluent_data


def test_tecplot(tmp_path):
    m = quad_2d(4, 3)
    p = tmp_path / "out.dat"
    write_tecplot(str(p), m, {"T": np.arange(12.0), "vel": np.ones((12, 2))})
    txt = p.read_text()
    assert "FEQUADRILATERAL" in txt and "CELLCENTERED" in txt
    assert '"T"' in txt and '"velX"' in txt and '"velY"' in txt


def test_fluent_data(tmp_path):
    m = quad_2d(4, 3)
    p = tmp_path / "out.fdat"
    write_fluent_data(str(p), m, {"T": np.arange(12.0)})
    txt = p.read_text()
    assert txt.startswith('(0 "fvm_tpu data export")')
    assert "(300 (" in txt
