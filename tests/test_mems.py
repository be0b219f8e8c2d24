"""MEMS switch composition: plate + IBM electrostatics + squeeze film +
contact (reference: src/fvm/scripts/Simulator.py).

The demo-scale sweep lives in demos/simulator_mems.py; this test runs a
coarse version end-to-end and checks the pull-in voltage against the
parallel-plate estimate V_PI = sqrt(8 k g0^3 / (27 eps0 A)) with k the
beam's own measured lumped stiffness."""

import runpy
import os

import numpy as np
import pytest

DEMO = os.path.join(os.path.dirname(__file__), "..", "demos",
                    "simulator_mems.py")


@pytest.fixture(scope="module")
def switch():
    mod = runpy.run_path(DEMO)
    return mod


def test_mems_pullin_bracket(switch):
    MemsSwitch = switch["MemsSwitch"]
    EPS0 = switch["EPS0"]
    sw = MemsSwitch(nx=24, ny_gap=12)
    k = sw.lumped_stiffness()
    A = sw.L * sw.W
    V_pi = np.sqrt(8.0 * k * sw.g0**3 / (27.0 * EPS0 * A))

    # below pull-in: stable equilibrium with small deflection
    w_lo = sw.static_deflection(0.6 * V_pi)
    assert w_lo is not None
    assert 0.0 < w_lo.max() < 0.2 * sw.g0
    # electrostatic load scales ~V^2 in the small-deflection regime
    w_half = sw.static_deflection(0.3 * V_pi)
    ratio = w_lo.max() / max(w_half.max(), 1e-30)
    assert ratio == pytest.approx(4.0, rel=0.35)

    # above pull-in: no stable equilibrium (snap-down)
    w_hi = sw.static_deflection(1.4 * V_pi, w0=w_lo)
    assert w_hi is None

    # contact closure caps the gap: force law engages below contactGap
    f = sw.contact.gap_force(np.array([0.5 * sw.g0, 0.05 * sw.g0]))
    assert f[0] == 0.0 and f[1] > 0.0
