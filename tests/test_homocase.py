"""Two-way structure<->fracture load-step coupling (reference:
demos/homoCase/homoCase.py load-step loop — elastic energy drives the
phase field, damage degrades the stiffness g(d) = d^2 + eta, with
irreversibility via history clamping)."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.mesh import metrics


def _notched_setup(n=24):
    mesh = quad_2d(n, n)
    geom = metrics.compute_geometry(mesh)
    xc = geom.cell_centroid[: mesh.n_interior_cells]
    # horizontal notch from the left edge to the center at mid height
    notch = np.nonzero(
        (np.abs(xc[:, 1] - 0.5) < 0.5 / n) & (xc[:, 0] < 0.4)
    )[0]
    assert notch.size > 3
    dm = fvm.mesh.build_device_mesh(mesh)
    return dm, notch


def test_two_way_homocase_notched_tension():
    from homoCase import two_way_load_loop

    dm, notch = _notched_setup(24)
    curve, d, diag = two_way_load_loop(
        dm, top_group="top", bot_group="bottom",
        free_groups=["left", "right"],
        E=1e3, nu=0.3, G_c=1.0, n_load_steps=7, ddisp=3e-3,
        n_picard=25, verbose=False, notch=notch,
        loading="displacement",
    )
    # every load step's picard (structure<->fracture) loop converged
    assert all(st["converged"] for st in diag), diag
    # damage grows beyond the initial notch and stays localized
    assert diag[-1]["damaged_cells"] > 2 * notch.size
    assert diag[-1]["damaged_cells"] < 0.5 * dm.n_interior_cells
    # damage is irreversible across steps
    counts = [st["damaged_cells"] for st in diag]
    assert counts == sorted(counts)
    # load-displacement curve (displacement control): reaction force
    # rises monotonically here, but the secant compliance u/F grows as
    # the crack spreads — SOFTENING
    disps = np.array([p[0] for p in curve[1:]])
    forces = np.array([p[1] for p in curve[1:]])
    assert (forces > 0).all() and (np.diff(disps) > 0).all()
    compliance = disps / forces
    assert compliance[-1] > compliance[0] * 1.05


def test_degradation_softens_structure():
    """set_stiffness_degradation: uniform g scales the response 1/g
    (linear elasticity), and g=1 restores the virgin stiffness."""
    from fvm_tpu.models import StructureModel

    dm = fvm.mesh.build_device_mesh(quad_2d(12, 12))
    s = StructureModel(dm)
    s.options["verbose"] = False
    s.vc["youngsModulus"] = 1e3
    s.vc["poissonsRatio"] = 0.3
    s.bc["bottom"].bc_type = "SpecifiedDeformation"
    s.bc["top"].bc_type = "SpecifiedTraction"
    s.bc["top"]["specifiedYTraction"] = 1.0
    s.bc["left"].bc_type = "ZeroTraction"
    s.bc["right"].bc_type = "ZeroTraction"
    s.init()
    s.advance(8)
    w0 = s.getDeformation()[:, 1].max()

    s.set_stiffness_degradation(np.full(dm.n_interior_cells, 0.5))
    s.advance(8)
    w_half = s.getDeformation()[:, 1].max()
    assert w_half == pytest.approx(2.0 * w0, rel=1e-5)

    s.set_stiffness_degradation(np.ones(dm.n_interior_cells))
    s.advance(8)
    assert s.getDeformation()[:, 1].max() == pytest.approx(w0, rel=1e-6)


def test_elastic_energy_density_uniaxial():
    """psi0 on a uniform uniaxial plane-strain state matches the closed
    form lam/2 tr(eps)^2 + mu eps:eps."""
    from fvm_tpu.models import StructureModel

    dm = fvm.mesh.build_device_mesh(quad_2d(10, 10))
    E, nu = 1e3, 0.25
    s = StructureModel(dm)
    s.options["verbose"] = False
    s.vc["youngsModulus"] = E
    s.vc["poissonsRatio"] = nu
    s.bc["bottom"].bc_type = "SpecifiedDeformation"
    s.bc["top"].bc_type = "SpecifiedTraction"
    s.bc["top"]["specifiedYTraction"] = 2.0
    s.bc["left"].bc_type = "ZeroTraction"
    s.bc["right"].bc_type = "ZeroTraction"
    s.init()
    s.advance(8)
    eps = s.getStrain()
    psi = s.getElasticEnergyDensity()
    mu = E / (2 * (1 + nu))
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    tr = np.trace(eps, axis1=1, axis2=2)
    ref = 0.5 * lam * tr**2 + mu * np.einsum("nij,nij->n", eps, eps)
    assert np.allclose(psi, ref, rtol=1e-12)
    assert psi.min() > 0
