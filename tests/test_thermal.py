"""ThermalModel end-to-end tests vs analytic solutions.

Plays the role of the reference's AMG_MERGING_THERMAL / THERMAL_MATRIX
golden suites (reference: src/fvm/test/AMG_MERGING_THERMAL) with analytic
instead of golden-file checks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d, tri_2d, hex_3d
from fvm_tpu.models import ThermalModel


def make_model(mesh, **opts):
    dm = fvm.mesh.build_device_mesh(mesh)
    m = ThermalModel(dm)
    m.options["verbose"] = False
    for k, v in opts.items():
        m.options[k] = v
    return m


def test_1d_dirichlet_profile():
    """Two Dirichlet walls, two adiabatic: linear profile, exact for FVM."""
    m = make_model(quad_2d(16, 8))
    m.bc["left"].bc_type = "SpecifiedTemperature"
    m.bc["left"]["specifiedTemperature"] = 400.0
    m.bc["right"].bc_type = "SpecifiedTemperature"
    m.bc["right"]["specifiedTemperature"] = 300.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "SpecifiedHeatFlux"  # default 0 = adiabatic
    m.init()
    hist = m.advance(5)
    assert hist[-1][1] / hist[0][1] < 1e-8
    T = m.getTemperature()
    x = np.asarray(m.mesh.cell_centroid)[: m.mesh.n_interior_cells, 0]
    np.testing.assert_allclose(T, 400.0 - 100.0 * x, rtol=1e-8)


def test_heat_flux_integral_balance():
    m = make_model(quad_2d(12, 12))
    m.bc["left"].bc_type = "SpecifiedTemperature"
    m.bc["left"]["specifiedTemperature"] = 500.0
    m.bc["right"].bc_type = "SpecifiedTemperature"
    m.bc["right"]["specifiedTemperature"] = 250.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(3)
    qin = m.getHeatFluxIntegral("left")
    qout = m.getHeatFluxIntegral("right")
    # conduction through unit square with k=1, dT=250: |q| = 250
    assert qin == pytest.approx(250.0, rel=1e-6)
    assert qin + qout == pytest.approx(0.0, abs=1e-6 * abs(qin))


def test_specified_flux_neumann():
    """q in at left, T fixed at right: linear profile with slope -q/k."""
    m = make_model(quad_2d(10, 4))
    m.vc["thermalConductivity"] = 2.0
    m.bc["left"].bc_type = "SpecifiedHeatFlux"
    m.bc["left"]["specifiedHeatFlux"] = 10.0
    m.bc["right"].bc_type = "SpecifiedTemperature"
    m.bc["right"]["specifiedTemperature"] = 300.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(5)
    T = m.getTemperature()
    x = np.asarray(m.mesh.cell_centroid)[: m.mesh.n_interior_cells, 0]
    # dT/dx = -q/k = -5; T(1) = 300 -> T = 300 + 5(1-x)
    np.testing.assert_allclose(T, 300.0 + 5.0 * (1.0 - x), rtol=1e-8)


def test_convective_robin_bc():
    """Left Dirichlet 400, right convective h=5, Tinf=300, k=1 on unit strip.

    Exact 1D: q = (400-300)/(1/k + 1/h) = 100/(1+0.2) = 83.333;
    wall surface T_right = 300 + q/h = 316.667.
    """
    m = make_model(quad_2d(20, 3))
    m.bc["left"].bc_type = "SpecifiedTemperature"
    m.bc["left"]["specifiedTemperature"] = 400.0
    m.bc["right"].bc_type = "Convective"
    m.bc["right"]["heatTransferCoefficient"] = 5.0
    m.bc["right"]["farFieldTemperature"] = 300.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(10)
    q = m.getHeatFluxIntegral("left")
    assert q == pytest.approx(100.0 / 1.2, rel=1e-6)
    # ghost (surface) temperature on the right wall
    g = m.mesh.group_by_name("right")
    gc = m.mesh.ghost_cells_of_group(g)
    Tw = np.asarray(m.state["T"])[gc]
    np.testing.assert_allclose(Tw, 300.0 + (100.0 / 1.2) / 5.0, rtol=1e-6)


def test_source_term_manufactured():
    """-k T'' = S with T(0)=T(1)=0, S=1, k=1: T = x(1-x)/2 (exact for FVM
    on uniform mesh)."""
    m = make_model(quad_2d(32, 2))
    m.vc["initialTemperature"] = 0.0
    m.vc["heatSource"] = 1.0
    for side in ("left", "right"):
        m.bc[side].bc_type = "SpecifiedTemperature"
        m.bc[side]["specifiedTemperature"] = 0.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(5)
    T = m.getTemperature()
    x = np.asarray(m.mesh.cell_centroid)[: m.mesh.n_interior_cells, 0]
    np.testing.assert_allclose(T, x * (1 - x) / 2, atol=2e-4)


def test_transient_decay():
    """Lumped cooling of a slab via convective BCs: compare decay rate
    against the series solution's conservation property: energy balance
    dE/dt = -q_out each step (BDF1)."""
    m = make_model(quad_2d(8, 8), transient=True, timeStep=0.01)
    m.vc["initialTemperature"] = 400.0
    for side in ("left", "right", "bottom", "top"):
        m.bc[side].bc_type = "Convective"
        m.bc[side]["heatTransferCoefficient"] = 1.0
        m.bc[side]["farFieldTemperature"] = 300.0
    m.init()
    V = np.asarray(m.mesh.cell_volume)[: m.mesh.n_interior_cells]
    for step in range(3):
        E0 = float((m.getTemperature() * V).sum())
        m.advance(20)
        E1 = float((m.getTemperature() * V).sum())
        qnet = sum(m.getHeatFluxIntegral(s) for s in ("left", "right", "bottom", "top"))
        # BDF1: (E1 - E0)/dt == q_net_in (rho*cp=1)
        assert (E1 - E0) / 0.01 == pytest.approx(qnet, rel=1e-5)
        m.updateTime()
    assert E1 < E0  # cooling


def test_tri_mesh_nonorthogonal():
    """Tri mesh exercises the non-orthogonal correction path."""
    m = make_model(tri_2d(16, 16))
    m.bc["left"].bc_type = "SpecifiedTemperature"
    m.bc["left"]["specifiedTemperature"] = 1.0
    m.bc["right"].bc_type = "SpecifiedTemperature"
    m.bc["right"]["specifiedTemperature"] = 0.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(30)
    T = m.getTemperature()
    x = np.asarray(m.mesh.cell_centroid)[: m.mesh.n_interior_cells, 0]
    np.testing.assert_allclose(T, 1.0 - x, atol=5e-3)


def test_hex_3d():
    m = make_model(hex_3d(6, 6, 6))
    m.bc["xmin"].bc_type = "SpecifiedTemperature"
    m.bc["xmin"]["specifiedTemperature"] = 350.0
    m.bc["xmax"].bc_type = "SpecifiedTemperature"
    m.bc["xmax"]["specifiedTemperature"] = 250.0
    for s in ("ymin", "ymax", "zmin", "zmax"):
        m.bc[s].bc_type = "Symmetry"
    m.init()
    m.advance(5)
    T = m.getTemperature()
    x = np.asarray(m.mesh.cell_centroid)[: m.mesh.n_interior_cells, 0]
    np.testing.assert_allclose(T, 350.0 - 100.0 * x, rtol=1e-7)


def test_per_face_bc_value_array():
    """BC values can be per-face arrays (reference FloatVal-as-Field)."""
    mesh = quad_2d(8, 8)
    m = make_model(mesh)
    g = [fg for fg in mesh.face_groups if fg.name == "left"][0]
    m.bc["left"].bc_type = "SpecifiedTemperature"
    m.bc["left"]["specifiedTemperature"] = np.linspace(300.0, 400.0, g.count)
    m.bc["right"].bc_type = "SpecifiedTemperature"
    m.bc["right"]["specifiedTemperature"] = 300.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(10)
    assert hist[-1][1] / hist[0][1] < 1e-8


def test_persistence_roundtrip():
    m = make_model(quad_2d(8, 8))
    m.bc["left"].bc_type = "SpecifiedTemperature"
    m.bc["left"]["specifiedTemperature"] = 400.0
    m.bc["right"].bc_type = "SpecifiedTemperature"
    m.bc["right"]["specifiedTemperature"] = 300.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(3)
    data = m.getPersistenceData()
    m2 = make_model(quad_2d(8, 8))
    for side, t in (("left", "SpecifiedTemperature"), ("right", "SpecifiedTemperature"),
                    ("bottom", "Symmetry"), ("top", "Symmetry")):
        m2.bc[side].bc_type = t
    m2.bc["left"]["specifiedTemperature"] = 400.0
    m2.bc["right"]["specifiedTemperature"] = 300.0
    m2.init()
    m2.restart(data)
    np.testing.assert_array_equal(m.getTemperature(), m2.getTemperature())


@pytest.mark.parametrize("scheme", ["upwind", "sou", "vanLeer", "minmod", "superbee"])
def test_convection_schemes_step_profile(scheme):
    """Convected step: higher-order schemes are sharper than upwind and
    limited ones stay bounded (no over/undershoot)."""
    m = make_model(quad_2d(40, 2), convective=True, convectionScheme=scheme,
                   transient=True, timeStep=0.01)
    m.vc["thermalConductivity"] = 1e-8
    m.vc["initialTemperature"] = 300.0
    m.bc["left"].bc_type = "SpecifiedTemperature"
    m.bc["left"]["specifiedTemperature"] = 400.0
    m.bc["right"].bc_type = "SpecifiedTemperature"
    m.bc["right"]["specifiedTemperature"] = 300.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    import jax.numpy as jnp
    # uniform +x mass flux
    md = jnp.einsum("fd,d->f", m.mesh.face_area, jnp.asarray([1.0, 0.0]))
    m.state["massFlux"] = md
    for _ in range(20):
        m.advance(2)
        m.updateTime()
    T = m.getTemperature().reshape(40, 2).mean(axis=1)
    # t = 0.2: the front is mid-domain; bounded for monotone schemes
    if scheme in ("vanLeer", "minmod", "superbee", "upwind"):
        assert T.max() < 400.0 + 1e-6 and T.min() > 300.0 - 1e-6
    assert T[0] > 390.0 and T[-1] < 310.0


def test_zero_gradient_outflow_convective():
    """ZeroGradient (convective outflow) BC: uniform axial flow with a
    volumetric source heats the stream linearly; the exact DISCRETE
    upwind solution is T_i = T_in + S dx (i+1) / (u rho_cp) per column.
    A Symmetry outlet (which zeroes the whole face flux) traps the
    energy instead — the regression this test pins down."""
    import jax.numpy as jnp

    nx, ny, lx = 24, 4, 3.0
    dx = lx / nx
    u, S, Tin = 2.0, 8.0, 300.0
    mesh = fvm.mesh.generate.quad_2d(nx, ny, lx=lx, ly=1.0)
    dm = fvm.mesh.build_device_mesh(mesh)
    t = ThermalModel(dm)
    t.options["verbose"] = False
    t.options["convective"] = True
    t.vc["thermalConductivity"] = 1e-12  # convection-dominated
    t.vc["heatSource"] = S
    t.bc["left"].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = Tin
    t.bc["right"].bc_type = "ZeroGradient"
    t.bc["top"].bc_type = "Symmetry"
    t.bc["bottom"].bc_type = "Symmetry"
    t.init()
    # uniform +x mass flux on every face (rho = 1)
    fa = np.asarray(dm.face_area)
    t.state["massFlux"] = jnp.asarray(u * fa[:, 0])
    t.advance(4)
    T = np.asarray(t.state["T"][: dm.n_interior_cells])
    xc = np.asarray(dm.cell_centroid[: dm.n_interior_cells, 0])
    i = np.round(xc / dx - 0.5)
    exact = Tin + S * dx * (i + 1) / u
    np.testing.assert_allclose(T, exact, rtol=1e-7)
