"""Tests for the smaller models: vacancy, fracture, EOS/property models,
shock tube, 1-D conduction (+ UQ sweep and jvp sensitivities)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models import (
    VacancyModel,
    FractureModel,
    IdealGasDensityModel,
    RosselandModel,
    ShockTube,
    OneDConduction,
    ThermalModel,
)


def test_vacancy_linear_profile():
    dm = fvm.mesh.build_device_mesh(quad_2d(12, 3))
    m = VacancyModel(dm)
    m.options["verbose"] = False
    m.bc["left"].bc_type = "Dirichlet"
    m.bc["left"]["specifiedConcentration"] = 1.0
    m.bc["right"].bc_type = "Dirichlet"
    m.bc["right"]["specifiedConcentration"] = 0.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(5)
    assert hist[-1][1] / hist[0][1] < 1e-8
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    np.testing.assert_allclose(m.getConcentration(), 1.0 - x, rtol=1e-7)


def test_fracture_source_steady():
    """Steady: -k lap(d) + coef*d = 1 + source; uniform fields, symmetric
    BCs -> d = (1+source)/coef uniformly."""
    dm = fvm.mesh.build_device_mesh(quad_2d(8, 8))
    m = FractureModel(dm)
    m.options["verbose"] = False
    m.options["transient"] = False
    m.vc["fractureSource"] = 1.0  # r += V*(1+1) = 2V
    m.vc["fractureSourceCoef"] = 4.0
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "Symmetry"
    m.init()
    m.advance(10)
    np.testing.assert_allclose(m.getPhaseFieldValue(), 0.5, rtol=1e-8)


def test_ideal_gas_density():
    dm = fvm.mesh.build_device_mesh(quad_2d(4, 4))
    eos = IdealGasDensityModel(dm)
    eos.vc["molecularWeight"] = 28.966
    eos.vc["temperature"] = 300.0
    eos.vc["pressure"] = 0.0
    eos.init()
    eos.advance(1)
    rho = eos.getDensity()
    np.testing.assert_allclose(rho, 101325.0 / (8314.0 / 28.966 * 300.0), rtol=1e-12)


def test_rosseland_conductivity():
    dm = fvm.mesh.build_device_mesh(quad_2d(4, 4))
    t = ThermalModel(dm)
    t.options["verbose"] = False
    for s in ("left", "right", "bottom", "top"):
        t.bc[s].bc_type = "Symmetry"
    t.vc["initialTemperature"] = 500.0
    t.init()
    ross = RosselandModel(dm, t)
    ross.init()
    ross.advance(1)
    k = ross.getConductivity()
    sigma = 5.670374419e-8
    np.testing.assert_allclose(k, 16 * sigma * (1 / 3) * 500.0**3, rtol=1e-10)


def test_sod_shock_tube():
    st = ShockTube(nx=200)
    st.run(0.2)
    rho, u, p = st.primitives()
    x = st.x
    # Sod analytic landmarks at t=0.2: post-shock plateau ~0.266 density in
    # contact region [0.6, 0.68]; left state intact near x<0.25
    assert rho[x < 0.2].min() > 0.99
    mid = rho[(x > 0.55) & (x < 0.62)]
    assert abs(mid.mean() - 0.426) < 0.05  # contact-left plateau density
    assert rho.min() > 0.1 and rho.max() <= 1.0 + 1e-12
    # mass conserved
    assert rho.mean() == pytest.approx((1.0 + 0.125) / 2, rel=1e-10)


def test_one_d_conduction_exact():
    m = OneDConduction(nx=40, kConst=2.0)
    m.setBoundaryTemperatures(400.0, 300.0)
    T = np.asarray(m.solve())
    x = (np.arange(40) + 0.5) / 40
    np.testing.assert_allclose(T, 400.0 - 100.0 * x, rtol=1e-12)


def test_one_d_conduction_mc_uq():
    """Monte-Carlo over conductivity fields (PC-atype replacement)."""
    m = OneDConduction(nx=20)
    m.setBoundaryTemperatures(1.0, 0.0)
    rng = np.random.default_rng(0)
    ks = np.exp(rng.normal(0, 0.3, size=(16, 20)))
    Ts = np.asarray(m.solve_mc(ks))
    assert Ts.shape == (16, 20)
    # all solutions bounded by BCs and monotone decreasing
    assert (Ts <= 1.0 + 1e-12).all() and (Ts >= -1e-12).all()
    assert (np.diff(Ts, axis=1) < 1e-12).all()


def test_jvp_sensitivity_thermal():
    """Forward-mode sensitivity through a model step (Tangent-atype
    replacement, reference atypes/tangent_double): dT/d(bc value)."""
    dm = fvm.mesh.build_device_mesh(quad_2d(8, 4))
    t = ThermalModel(dm)
    t.options["verbose"] = False
    t.options["differentiable"] = True
    t.bc["left"].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = 400.0
    t.bc["right"].bc_type = "SpecifiedTemperature"
    t.bc["right"]["specifiedTemperature"] = 300.0
    t.bc["bottom"].bc_type = "Symmetry"
    t.bc["top"].bc_type = "Symmetry"
    t.init()
    t.advance(3)
    step = t._build_step()
    bcvals = t._resolve_bcvals()

    def final_T(left_val):
        bv = dict(bcvals)
        bv["left:specifiedTemperature"] = jnp.full_like(
            bv["left:specifiedTemperature"], left_val
        )
        state, _ = step(t.mesh, t.params, t.state, bv)
        return state["T"][: dm.n_interior_cells]

    T0, dT = jax.jvp(final_T, (400.0,), (1.0,))
    # linear problem: dT/dTleft = (1 - x)
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    np.testing.assert_allclose(np.asarray(dT), 1.0 - x, atol=1e-6)


def test_squeeze_film_strip():
    """1D squeeze film: rigid strip closing at V0 with vented ends has
    p(x) = (6 mu V0 / h^3) x (L - x) and damping force mu V0 L^3 / h^3
    per unit depth (quadratic -> near-exact in FV)."""
    from fvm_tpu.models import SqueezeFilmModel

    L, h0, mu, V0 = 2.0, 0.05, 0.3, 1.0
    dm = fvm.mesh.build_device_mesh(quad_2d(24, 3, lx=L, ly=1.0))
    m = SqueezeFilmModel(dm)
    m.options["verbose"] = False
    m.vc["viscosity"] = mu
    m.vc["initialGap"] = h0
    m.bc["left"].bc_type = "Dirichlet"
    m.bc["right"].bc_type = "Dirichlet"
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.set_gap(h0, -V0)  # closing
    m.advance(3)
    p = m.getPressure()
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    p_exact = 6.0 * mu * V0 / h0**3 * x * (L - x)
    # interior two-point fluxes are exact for quadratics; the boundary
    # ghost-at-face gradient carries the O(dx^2) quadrature error, which
    # shows up as a uniform offset ~ p'' (dx/2)^2 / 2
    dx = L / 24
    np.testing.assert_allclose(p, p_exact, atol=3.0 * mu * V0 / h0**3 * dx**2)
    F = m.getDampingForce()
    assert F == pytest.approx(mu * V0 * L**3 / h0**3, rel=5e-3)
    # halving the gap -> 8x the damping force
    m.set_gap(h0 / 2, -V0)
    m.advance(3)
    assert m.getDampingForce() == pytest.approx(8 * F, rel=1e-5)
