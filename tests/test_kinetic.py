"""ES-BGK kinetic model tests.

Mirrors the reference's ESBGK-tests/{Couette,heatT2D} intent
(reference: src/fvm/test/ESBGK-tests) with physical invariants: discrete
Maxwellian moments, equilibrium preservation, Couette microflow with slip.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.kinetic import Quadrature, KineticModel


def test_quadrature_moments_of_maxwellian():
    q = Quadrature(12, 12, 12)
    rho, u, T = 1.3, np.array([[0.2, -0.1, 0.05]]), 0.8
    f = q.maxwellian(jnp.asarray([rho]), jnp.asarray(u), jnp.asarray([T]))
    r, m, e = q.moments(f)
    np.testing.assert_allclose(float(r[0]), rho, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(m[0]) / rho, u[0], atol=1e-8)
    # e = rho (u^2/2 + 3T/2)
    e_exact = rho * (0.5 * (u[0] ** 2).sum() + 1.5 * T)
    np.testing.assert_allclose(float(e[0]), e_exact, rtol=1e-7)


def test_equilibrium_preservation():
    """Uniform Maxwellian with matching far-field BCs must be stationary."""
    dm = fvm.mesh.build_device_mesh(quad_2d(6, 6))
    m = KineticModel(dm, Quadrature(6, 6, 6))
    m.options["verbose"] = False
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "FarField"
        m.bc[s]["specifiedDensity"] = 1.0
        m.bc[s]["specifiedTemperature"] = 1.0
    m.init()
    f0 = np.asarray(m.state["f"][: dm.n_interior_cells]).copy()
    hist = m.advance(3)
    f1 = np.asarray(m.state["f"][: dm.n_interior_cells])
    np.testing.assert_allclose(f1, f0, rtol=1e-6, atol=1e-12)
    drho, dmom, de = m.conservation_error()
    assert drho < 1e-10 and de < 1e-8


def test_couette_slip_flow():
    """Diffuse walls moving at +-uw: antisymmetric velocity profile with
    slip (|u_fluid| < |u_wall| at the wall for finite Kn)."""
    dm = fvm.mesh.build_device_mesh(quad_2d(3, 24))
    m = KineticModel(dm, Quadrature(8, 8, 4))
    m.options["verbose"] = False
    m.vc["relaxationTime"] = 0.2  # Kn ~ 0.2-ish
    m.bc["top"].bc_type = "DiffuseWall"
    m.bc["top"]["specifiedXVelocity"] = 0.3
    m.bc["bottom"].bc_type = "DiffuseWall"
    m.bc["bottom"]["specifiedXVelocity"] = -0.3
    m.bc["left"].bc_type = "Symmetry"
    m.bc["right"].bc_type = "Symmetry"
    m.init()
    m.advance(60)
    rho, u, T = m.moments()
    ux = np.asarray(u[: dm.n_interior_cells, 0]).reshape(3, 24).mean(axis=0)
    y = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 1].reshape(3, 24)[0]
    # antisymmetric, monotone increasing
    assert ux[-1] > 0.05 and ux[0] < -0.05
    assert abs(ux[-1] + ux[0]) < 0.02  # antisymmetry
    assert (np.diff(ux) > -1e-6).all()
    # slip: fluid velocity at wall below wall speed
    assert ux[-1] < 0.3
    # mass conserved
    V = np.asarray(dm.cell_volume)[: dm.n_interior_cells]
    assert float((np.asarray(rho[: dm.n_interior_cells]) * V).sum()) == pytest.approx(
        1.0, rel=5e-2
    )


def test_phonon_diffusive_limit():
    """Small Kn: gray BTE recovers Fourier conduction with
    k = C vg^2 tau / 3 -> linear T between isothermal walls."""
    from fvm_tpu.kinetic import PhononModel

    dm = fvm.mesh.build_device_mesh(quad_2d(16, 3))
    m = PhononModel(dm, n_polar=6, n_azimuthal=8)
    m.options["verbose"] = False
    m.vc["relaxationTime"] = 0.02  # Kn = vg*tau/L = 0.02
    m.vc["groupVelocity"] = 1.0
    m.bc["left"].bc_type = "Isothermal"
    m.bc["left"]["specifiedTemperature"] = 310.0
    m.bc["right"].bc_type = "Isothermal"
    m.bc["right"]["specifiedTemperature"] = 290.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(200)
    T = m.getTemperature()
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    # interior profile linear (allow jump layers near walls at finite Kn)
    sel = (x > 0.2) & (x < 0.8)
    fit = np.polyfit(x[sel], T[sel], 1)
    # temperature-jump layers + first-order upwind reduce the interior
    # slope a bit below the continuum -20 at this resolution
    assert fit[0] == pytest.approx(-20.0, rel=0.25)
    # heat flux ~ k dT/dx with k = C vg^2 tau/3
    q = m.heat_flux()[:, 0].mean()
    k_gray = 1.0 * 1.0 * 0.02 / 3.0
    assert q == pytest.approx(k_gray * 20.0, rel=0.25)


def test_phonon_ballistic_limit():
    """Large Kn: temperature plateaus near the mean of the wall values and
    flux is far below the Fourier prediction."""
    from fvm_tpu.kinetic import PhononModel

    dm = fvm.mesh.build_device_mesh(quad_2d(8, 3))
    m = PhononModel(dm, n_polar=6, n_azimuthal=8)
    m.options["verbose"] = False
    m.vc["relaxationTime"] = 50.0  # Kn = 50
    m.bc["left"].bc_type = "Isothermal"
    m.bc["left"]["specifiedTemperature"] = 310.0
    m.bc["right"].bc_type = "Isothermal"
    m.bc["right"]["specifiedTemperature"] = 290.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(100)
    T = m.getTemperature()
    # ballistic: interior T ~ (310+290)/2, little spatial variation
    assert abs(T.mean() - 300.0) < 1.0
    assert T.std() < 2.0
    q = m.heat_flux()[:, 0].mean()
    k_fourier_flux = (1.0 * 1.0 * 50.0 / 3.0) * 20.0  # enormous
    assert 0 < q < 0.1 * k_fourier_flux


def test_spherical_quadrature_moments():
    q = Quadrature.spherical(n_r=16, n_polar=8, n_azimuthal=8)
    rho, u, T = 1.2, np.array([[0.1, -0.05, 0.0]]), 0.9
    f = q.maxwellian(jnp.asarray([rho]), jnp.asarray(u), jnp.asarray([T]))
    r, m, e = q.moments(f)
    np.testing.assert_allclose(float(r[0]), rho, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(m[0]) / rho, u[0], atol=2e-3)
    e_exact = rho * (0.5 * (u[0] ** 2).sum() + 1.5 * T)
    np.testing.assert_allclose(float(e[0]), e_exact, rtol=5e-3)


def test_phonon_nongray_two_bands():
    """Two-band dispersion: effective conductivity = sum of band
    conductivities (k_b = C_b vg_b^2 tau_b / 3) in the diffusive limit."""
    from fvm_tpu.kinetic import PhononModel

    dm = fvm.mesh.build_device_mesh(quad_2d(12, 3))
    bands = [(0.7, 1.0, 0.03), (0.3, 2.0, 0.01)]
    m = PhononModel(dm, n_polar=6, n_azimuthal=8, bands=bands)
    m.options["verbose"] = False
    m.bc["left"].bc_type = "Isothermal"
    m.bc["left"]["specifiedTemperature"] = 305.0
    m.bc["right"].bc_type = "Isothermal"
    m.bc["right"]["specifiedTemperature"] = 295.0
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(150)
    q = m.heat_flux()[:, 0].mean()
    k_eff = sum(C * vg * vg * tau / 3.0 for C, vg, tau in bands)
    assert q == pytest.approx(k_eff * 10.0, rel=0.3)
    T = m.getTemperature()
    assert 295.0 < T.mean() < 305.0


def test_fourier_heat_transfer_knudsen_jumps():
    """Gas heat conduction between diffuse walls (reference:
    src/fvm/test/ESBGK-tests/heatT2D): monotone temperature profile,
    near-uniform pressure, and wall temperature JUMPS that grow with the
    Knudsen number — the kinetic effect a continuum solver cannot give."""
    from fvm_tpu.kinetic.esbgk import KineticModel
    from fvm_tpu.kinetic.quadrature import Quadrature

    def run(tau):
        dm = fvm.mesh.build_device_mesh(quad_2d(16, 3))
        m = KineticModel(dm, quadrature=Quadrature(8, 8, 8))
        m.options["verbose"] = False
        m.vc["relaxationTime"] = tau
        m.bc["left"].bc_type = "DiffuseWall"
        m.bc["left"]["specifiedTemperature"] = 1.2
        m.bc["right"].bc_type = "DiffuseWall"
        m.bc["right"]["specifiedTemperature"] = 0.8
        m.bc["top"].bc_type = "SpecularWall"
        m.bc["bottom"].bc_type = "SpecularWall"
        m.init()
        m.advance(30)
        rho, u, T = m.moments()
        n = dm.n_interior_cells
        T = np.asarray(T)[:n].reshape(16, 3).mean(axis=1)
        rho = np.asarray(rho)[:n].reshape(16, 3).mean(axis=1)
        return T, rho

    T_lo, rho_lo = run(0.05)  # Kn ~ 0.05
    T_hi, rho_hi = run(0.5)  # Kn ~ 0.5
    for T in (T_lo, T_hi):
        assert np.all(np.diff(T) < 0)  # monotone hot -> cold
        assert 0.8 < T[-1] < T[0] < 1.2  # jumps at BOTH walls
    # jumps grow with Kn
    assert (1.2 - T_hi[0]) > 2.0 * (1.2 - T_lo[0])
    assert (T_hi[-1] - 0.8) > 2.0 * (T_lo[-1] - 0.8)
    # pressure p = rho T near-uniform (no flow)
    p = rho_lo * T_lo
    assert np.ptp(p) / p.mean() < 0.01
