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


def test_reflection_tables_arbitrary_normal():
    """quadrature.reflection_tables (reference:
    KineticBoundaryConditions.h at any wall angle): applying the
    redistribution to a drifting discrete Maxwellian approximates the
    analytically reflected Maxwellian f(c; u - 2(u.n)n) for a SKEWED
    normal, and is the exact mirror permutation for an axis normal."""
    from fvm_tpu.kinetic.quadrature import reflection_tables

    q = Quadrature(10, 10, 8)
    rho, T = 1.0, 1.0
    u = np.array([0.15, 0.1, 0.0])

    def moments_of(fv):
        r, m, e = q.moments(jnp.asarray(fv[None, :]))
        return float(r[0]), np.asarray(m[0]) / float(r[0])

    f = np.asarray(q.maxwellian(jnp.asarray([rho]), jnp.asarray(u[None]),
                                jnp.asarray([T])))[0]

    # axis-aligned: exact permutation
    idx, w = reflection_tables(q.c, np.array([[0.0, 1.0, 0.0]]))
    assert (np.sort(w[0], axis=1)[:, -1] == 1.0).all()  # single unit weight
    f_r = (w[0] * f[idx[0]]).sum(axis=1)
    _, u_r = moments_of(f_r)
    np.testing.assert_allclose(u_r[:2], [0.15, -0.1], atol=1e-12)

    # skewed 30-degree normal: interpolated redistribution
    th = np.pi / 6
    n = np.array([[np.sin(th), np.cos(th), 0.0]])
    idx, w = reflection_tables(q.c, n)
    f_r = (w[0] * f[idx[0]]).sum(axis=1)
    r_r, u_r = moments_of(f_r)
    u_exact = u - 2.0 * (u @ n[0]) * n[0]
    assert abs(r_r - rho) < 0.02
    np.testing.assert_allclose(u_r, u_exact, atol=0.02)

    # conservative (flux-balanced) tables: ZERO net wall mass flux for an
    # arbitrary positive distribution, and row sums near 1 (no
    # amplification of the ghost-update fixed point)
    idx, w = reflection_tables(q.c, n, weights=q.w)
    cn = q.c @ n[0]
    incoming = cn < 0
    rng = np.random.default_rng(0)
    fr = rng.uniform(0.5, 2.0, size=q.N)
    fg = (w[0] * fr[idx[0]]).sum(axis=1)
    flux = (q.w * cn * np.where(incoming, fg, fr)).sum()
    out_flux = (q.w * cn * np.where(~incoming, fr, 0.0)).sum()
    assert abs(flux) < 1e-9 * abs(out_flux)
    rs = w[0][incoming].sum(axis=1)
    assert rs.max() < 1.3 and rs.min() > 0.7


def test_esbgk_specular_tilted_channel():
    """Specular walls on a ROTATED channel (normals at 30 degrees to the
    axes), far-field-anchored ends: a Maxwellian drifting TANGENTIALLY
    to the walls keeps its wall-normal velocity at interpolation-error
    level (< 0.025 vs drift 0.12) — the old axis-aligned mirror
    corrupted skewed walls at O(drift).  The flux-balanced tables also
    keep the density near the far-field value."""
    th = np.pi / 6
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    mesh = quad_2d(16, 8, lx=2.0, ly=1.0)
    mesh.coords[:] = mesh.coords @ R.T
    dm = fvm.mesh.build_device_mesh(mesh)
    m = KineticModel(dm, Quadrature(8, 8, 4))
    m.options["verbose"] = False
    m.vc["relaxationTime"] = 0.5
    u_t = R @ np.array([0.12, 0.0])  # bulk velocity along the channel
    for s in ("top", "bottom"):
        m.bc[s].bc_type = "SpecularWall"
    for s in ("left", "right"):
        m.bc[s].bc_type = "FarField"
        m.bc[s]["specifiedDensity"] = 1.0
        m.bc[s]["specifiedTemperature"] = 1.0
        m.bc[s]["specifiedXVelocity"] = float(u_t[0])
        m.bc[s]["specifiedYVelocity"] = float(u_t[1])
    m.init()
    q = m.quadrature
    u3 = np.array([u_t[0], u_t[1], 0.0])
    nc = dm.n_cells
    f0 = q.maxwellian(
        jnp.ones(nc), jnp.broadcast_to(jnp.asarray(u3), (nc, 3)),
        jnp.ones(nc),
    )
    m.state["f"] = jnp.asarray(f0, m.state["f"].dtype)
    m.advance(25)
    rho, u, T = m.moments()
    n_int = dm.n_interior_cells
    u_num = np.asarray(u[:n_int, :2])
    un = u_num @ (R @ np.array([0.0, 1.0]))
    ut = u_num @ (R @ np.array([1.0, 0.0]))
    assert np.abs(un).max() < 0.025
    # momentum stays along the +tangent direction; density near far field
    assert ut.mean() > 0.05
    x_t = (np.asarray(dm.cell_centroid)[:n_int, :2] @ R)[:, 0]
    mid = (x_t > 0.6) & (x_t < 1.4)
    r = np.asarray(rho[:n_int])[mid]
    assert r.min() > 0.85 and r.max() < 1.05


def test_esbgk_couette_reference_configuration():
    """The reference's ESBGK-tests/Couette case (Par_Couette.py:113-196:
    ES-BGK fgamma=2, diffuse top wall at uwall=0.0297, stationary bottom,
    T=1): in this near-continuum linear regime the velocity profile is
    linear with equal wall slips, and the shear stress is uniform."""
    uw = 0.0297
    mesh = quad_2d(3, 24)
    mesh.make_periodic("left", "right")
    dm = fvm.mesh.build_device_mesh(mesh)
    m = KineticModel(dm, Quadrature(8, 8, 4))
    m.options["verbose"] = False
    m.options["collisionModel"] = "ESBGK"
    m.vc["relaxationTime"] = 0.2
    m.bc["top"].bc_type = "DiffuseWall"
    m.bc["top"]["specifiedXVelocity"] = uw
    m.bc["top"]["specifiedTemperature"] = 1.0
    m.bc["bottom"].bc_type = "DiffuseWall"
    m.bc["bottom"]["specifiedTemperature"] = 1.0
    m.bc["left"].bc_type = "Periodic"
    m.bc["right"].bc_type = "Periodic"
    m.init()
    m.advance(60)
    rho, u, T = m.moments()
    n_int = dm.n_interior_cells
    ux = np.asarray(u[:n_int, 0]).reshape(3, 24).mean(axis=0)
    y = np.asarray(dm.cell_centroid)[:n_int, 1].reshape(3, 24)[0]
    # linear profile through uw/2 at midheight, antisymmetric slip
    mid = np.interp(0.5, y, ux)
    assert mid == pytest.approx(uw / 2, rel=0.05)
    fit = np.polyfit(y, ux, 1)
    resid = ux - np.polyval(fit, y)
    assert np.abs(resid).max() < 0.02 * uw  # linear to 2%
    slip_bot = ux[0] - 0.0
    slip_top = uw - ux[-1]
    assert slip_top == pytest.approx(slip_bot, rel=1e-6)  # exact symmetry
    assert 0.0 < slip_bot < 0.45 * uw


def _box(nq=6, ny=10, nx=3):
    dm = fvm.mesh.build_device_mesh(quad_2d(nx, ny))
    m = KineticModel(dm, Quadrature(nq, nq, 4))
    m.options["verbose"] = False
    m.vc["relaxationTime"] = 0.2
    return dm, m


def test_realwall_limits_match_diffuse_and_specular():
    """RealWall (KineticBoundaryConditions.h:158 applyRealWallBC): the
    accommodation blend reduces EXACTLY to DiffuseWall at alpha=1 and to
    SpecularWall at alpha=0, and intermediate alpha gives intermediate
    wall shear in a Couette configuration."""

    def couette(bc_type, alpha=None):
        dm, m = _box(nq=8, ny=16)
        for s, uw in (("top", 0.3), ("bottom", -0.3)):
            m.bc[s].bc_type = bc_type
            m.bc[s]["specifiedXVelocity"] = uw
            if alpha is not None:
                m.bc[s]["accommodationCoefficient"] = alpha
        m.bc["left"].bc_type = "Symmetry"
        m.bc["right"].bc_type = "Symmetry"
        m.init()
        m.advance(40)
        rho, u, T = m.moments()
        return np.asarray(u[:, 0])

    u_d = couette("DiffuseWall")
    u_a1 = couette("RealWall", alpha=1.0)
    np.testing.assert_allclose(u_a1, u_d, atol=1e-12)

    u_a0 = couette("RealWall", alpha=0.0)
    # specular walls transmit no shear: the gas stays at rest
    assert np.abs(u_a0).max() < 1e-10

    u_half = couette("RealWall", alpha=0.5)
    # intermediate accommodation drags less than full accommodation
    assert 0.05 * np.abs(u_d).max() < np.abs(u_half).max() < 0.95 * np.abs(
        u_d
    ).max()


def test_realwall_conserves_mass():
    """A closed box of RealWall boundaries passes zero net mass flux at
    any accommodation coefficient (the diffuse part is flux-scaled and
    the specular tables are flux-exact).  Run TRANSIENT: the steady
    closed heated box is singular along the total-mass mode (any mass
    gives a steady state), which steady Newton cannot anchor."""
    dm, m = _box(nq=6, ny=8, nx=8)
    m.options["transient"] = True
    m.options["timeStep"] = 0.05
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "RealWall"
        m.bc[s]["specifiedTemperature"] = 1.3  # heated walls drive flow
        m.bc[s]["accommodationCoefficient"] = 0.6
    m.init()
    vol = np.asarray(dm.cell_volume[: dm.n_interior_cells])
    rho0 = float(np.sum(
        np.asarray(m.moments()[0])[: dm.n_interior_cells] * vol))
    m.advance(30)
    rho1 = float(np.sum(
        np.asarray(m.moments()[0])[: dm.n_interior_cells] * vol))
    np.testing.assert_allclose(rho1, rho0, rtol=1e-8)


def test_zero_gradient_preserves_uniform_stream():
    """ZeroGradient (:385): a uniform drifting Maxwellian through a
    channel with upstream FarField and downstream ZeroGradient stays
    exactly uniform."""
    dm, m = _box(nq=6, ny=4, nx=12)
    m.bc["left"].bc_type = "FarField"
    m.bc["left"]["specifiedXVelocity"] = 0.4
    m.bc["right"].bc_type = "ZeroGradient"
    m.bc["top"].bc_type = "Symmetry"
    m.bc["bottom"].bc_type = "Symmetry"
    m.vc["initialXVelocity"] = 0.4
    m.init()
    m.advance(10)
    rho, u, T = m.moments()
    ni = dm.n_interior_cells
    np.testing.assert_allclose(np.asarray(u[:ni, 0]), 0.4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rho[:ni]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T[:ni]), 1.0, atol=1e-5)


def test_pressure_inlet_outlet_channel_flow():
    """PressureInlet (:408) + PressureOutlet
    (COMETBoundaryConditions.h:258): a favorable pressure ratio drives a
    positive mass flux down the channel; equal pressures at equilibrium
    stay at rest."""

    def channel(p_in, p_out):
        dm, m = _box(nq=8, ny=3, nx=16)
        m.bc["left"].bc_type = "PressureInlet"
        m.bc["left"]["specifiedPressure"] = p_in
        m.bc["right"].bc_type = "PressureOutlet"
        m.bc["right"]["specifiedPressure"] = p_out
        m.bc["top"].bc_type = "Symmetry"
        m.bc["bottom"].bc_type = "Symmetry"
        m.init()
        m.advance(60)
        rho, u, T = m.moments()
        return np.asarray(u[: dm.n_interior_cells, 0])

    u_eq = channel(1.0, 1.0)
    assert np.abs(u_eq).max() < 1e-6

    u_drive = channel(1.2, 0.9)
    assert u_drive.min() > 1e-3  # everywhere downstream


def test_inlet_specified_mass_flow():
    """Inlet (:522): the ghost distribution's net mass flux into the
    domain equals specifiedMassFlowRate (inlet Maxwellian scaled to the
    target; the reflected part is flux-neutral)."""
    dm, m = _box(nq=8, ny=3, nx=12)
    mdot = 0.15
    m.bc["left"].bc_type = "Inlet"
    m.bc["left"]["specifiedXVelocity"] = 0.2
    m.bc["left"]["specifiedMassFlowRate"] = mdot
    m.bc["right"].bc_type = "ZeroGradient"
    m.bc["top"].bc_type = "Symmetry"
    m.bc["bottom"].bc_type = "Symmetry"
    m.init()
    m.advance(20)

    # measure the kinetic mass flux through the inlet ghost band (after
    # an explicit ghost refresh: the state's ghost entries are JFNK
    # unknowns that only match the closure at full convergence)
    q = m.quadrature
    f = m._refresh_ghosts(dm, m.params, m.state["f"], m._resolve_bcvals())
    g = [g for g, bc in m._group_bcs() if g[1] == "left"][0]
    sl = dm.group_faces(g)
    gc = dm.ghost_cells_of_group(g)
    amag = np.asarray(dm.face_area_mag[sl])
    n3 = np.zeros((g[4], 3))
    n3[:, : dm.dim] = np.asarray(dm.face_area[sl]) / amag[:, None]
    cn = np.einsum("nd,fd->fn", np.asarray(q.c), n3)
    fg = np.asarray(f[gc])
    flux_in = -np.einsum("fn,n,fn,f->", fg, np.asarray(q.w), cn, amag)
    area = amag.sum()
    np.testing.assert_allclose(flux_in / area, mdot, rtol=1e-6)


def test_comet_solve_tangent_vs_fd():
    """KineticModel.solve_tangent (reference: the esbgk model built with
    the Tangent atype, models.cpp:10-74): d(u_x)/d(tau) on a diffuse-wall
    Couette matches central finite differences.  Also regression-covers
    the Newton overshoot guard (this configuration collapses to the
    absorbing f=0 state without the damped-retry fallback)."""

    def build(tau):
        dm = fvm.mesh.build_device_mesh(quad_2d(3, 10))
        m = KineticModel(dm, Quadrature(8, 8, 4))
        m.options["verbose"] = False
        m.vc["relaxationTime"] = tau
        for s, uw in (("top", 0.3), ("bottom", -0.3)):
            m.bc[s].bc_type = "DiffuseWall"
            m.bc[s]["specifiedXVelocity"] = uw
        m.bc["left"].bc_type = "Symmetry"
        m.bc["right"].bc_type = "Symmetry"
        m.init()
        m.advance(80)
        return m

    m = build(0.2)
    ni = m.mesh.n_interior_cells
    # the overshoot guard keeps the sheared state alive at tau=0.2
    assert np.abs(np.asarray(m.moments()[1])[:ni, 0]).max() > 0.05

    drho, du, dT = m.solve_tangent_moments(
        param_tangents={"tau": np.ones(ni)}
    )
    # eps large enough that the FD noise floor (primal stalls ~1.7e-9,
    # so noise ~ 1.7e-9/eps) sits well below the 1e-4*|fd| tolerance;
    # central-difference truncation at 1e-3 is still ~1e-7
    eps = 1e-3
    mp, mm = build(0.2 + eps), build(0.2 - eps)
    fd = (
        np.asarray(mp.moments()[1]) - np.asarray(mm.moments()[1])
    )[:ni] / (2 * eps)
    assert np.abs(fd).max() > 1e-3  # the sensitivity is genuinely nonzero
    np.testing.assert_allclose(
        du, fd, rtol=1e-4, atol=1e-4 * np.abs(fd).max()
    )


def test_heatT2D_on_reference_mesh():
    """Kinetic Fourier flow on the reference's OWN heatT2D Fluent case
    (reference: src/fvm/test/ESBGK-tests/heatT2D/testKineticFlowModel.cas,
    driven by testheat.py with WallBC left/right): hot/cold diffuse walls
    produce a monotone temperature profile with Knudsen jumps and
    near-uniform pressure on the 10x10 unit-square mesh."""
    import os
    from fvm_tpu.io.fluent import read_fluent_mesh

    cas = "/root/reference/src/fvm/test/ESBGK-tests/heatT2D/testKineticFlowModel.cas"
    if not os.path.exists(cas):
        pytest.skip("reference heatT2D case unavailable")
    mesh = read_fluent_mesh(cas)
    assert mesh.n_interior_cells == 100
    dm = fvm.mesh.build_device_mesh(mesh)
    m = KineticModel(dm, quadrature=Quadrature(8, 8, 8))
    m.options["verbose"] = False
    m.vc["relaxationTime"] = 0.2  # Kn ~ 0.2 on the unit square
    m.bc["left"].bc_type = "DiffuseWall"
    m.bc["left"]["specifiedTemperature"] = 1.2
    m.bc["right"].bc_type = "DiffuseWall"
    m.bc["right"]["specifiedTemperature"] = 0.8
    m.bc["top"].bc_type = "SpecularWall"
    m.bc["bottom"].bc_type = "SpecularWall"
    m.init()
    m.advance(60)
    rho, u, T = m.moments()
    n = dm.n_interior_cells
    from fvm_tpu.mesh.metrics import compute_geometry

    g = compute_geometry(mesh)
    xc = g.cell_centroid[:n, 0]
    order = np.argsort(xc)
    cols = np.asarray(T)[:n][order].reshape(10, 10).mean(axis=1)
    assert np.all(np.diff(cols) < 0)  # monotone hot -> cold
    assert 0.8 < cols[-1] < cols[0] < 1.2  # Knudsen jumps at both walls
    p = np.asarray(rho)[:n] * np.asarray(T)[:n]
    assert np.ptp(p) / p.mean() < 0.02
    # discrete continuity: rho*u_x constant (the small uniform value is
    # first-order numerical slip, O(dx df/dx); wall faces pass zero flux
    # by the flux-exact diffuse-wall construction)
    ru = np.asarray(rho)[:n] * np.asarray(u)[:n, 0]
    assert np.abs(ru).max() < 1e-2
    drho, dmom, de = m.conservation_error()
    assert drho < 1e-7 and dmom < 1e-7


def test_stress_and_momentum_flux_integral():
    """Equilibrium gas: stress diag = rho T, off-diag ~ 0, heat flux ~ 0,
    and the wall momentum-flux integral reduces to p A nhat (force the gas
    exerts on each wall).  (reference: MacroFields.h:37 Stress;
    scripts/DampingESBGK.py wall-force output.)"""
    dm = fvm.mesh.build_device_mesh(quad_2d(6, 6))
    m = KineticModel(dm, Quadrature(8, 8, 8))
    m.options["verbose"] = False
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "FarField"
        m.bc[s]["specifiedDensity"] = 1.0
        m.bc[s]["specifiedTemperature"] = 0.8
    m.init()
    m.advance(2)
    P = np.asarray(m.stress())
    p = 1.0 * 0.8  # rho T (quadrature-discrete)
    np.testing.assert_allclose(P[:, :3], p, rtol=1e-3)
    assert np.abs(P[:, 3:]).max() < 1e-5
    assert np.abs(np.asarray(m.heat_flux())).max() < 1e-3
    F = m.getMomentumFluxIntegral("left")
    np.testing.assert_allclose(F, [-p, 0.0, 0.0], atol=2e-3)
    F = m.getMomentumFluxIntegral("top")
    np.testing.assert_allclose(F, [0.0, p, 0.0], atol=2e-3)


def test_damping_force_resists_wall_motion():
    """A wall moving INTO the gas sees an increased back-force (kinetic
    squeeze damping, reference scripts/DampingESBGK.py): dF . u_wall < 0."""
    def beam_force(vy):
        dm = fvm.mesh.build_device_mesh(quad_2d(12, 4, lx=3.0, ly=1.0))
        m = KineticModel(dm, Quadrature(8, 8, 8))
        m.options["verbose"] = False
        m.options["collisionModel"] = "ESBGK"
        m.options["transient"] = True
        m.options["timeStep"] = 0.01
        m.vc["relaxationTime"] = 0.2
        m.bc["top"].bc_type = "DiffuseWall"
        m.bc["top"]["specifiedYVelocity"] = vy
        m.bc["bottom"].bc_type = "DiffuseWall"
        m.bc["left"].bc_type = "Symmetry"
        m.bc["right"].bc_type = "PressureInlet"
        m.bc["right"]["specifiedPressure"] = 1.0
        m.init()
        for _ in range(10):
            m.advance(4)
            m.updateTime()
        return m.getMomentumFluxIntegral("top")

    F_still = beam_force(0.0)
    F_move = beam_force(-0.02)  # wall moving down into the gas
    dF = F_move - F_still
    assert dF[1] > 1e-4  # gas pushes back up


def test_kinetic_ibm_equilibrium_exact():
    """Immersed diffuse body at the gas temperature in a uniform resting
    Maxwellian: the zero-net-flux closure (reference: the esbgk IBM
    pipeline, scripts/IB-ESBGKSteady.py — computeSolidFaceDsf +
    ConservationofMFSolid) balances the half-space fluxes exactly, so the
    global Maxwellian is preserved to round-off."""
    dm = fvm.mesh.build_device_mesh(quad_2d(16, 16))
    m = KineticModel(dm, Quadrature(8, 8, 4))
    m.options["verbose"] = False
    m.vc["relaxationTime"] = 0.2
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "DiffuseWall"
    m.init()
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
    solid = (np.abs(cc[:, 0] - 0.5) < 0.15) & (np.abs(cc[:, 1] - 0.5) < 0.15)
    m.set_immersed_boundary(solid, wall_temperature=1.0)
    f0 = np.asarray(m.state["f"]).copy()
    h = m.advance(5)
    assert h[-1][1] < 1e-12
    assert np.abs(np.asarray(m.state["f"]) - f0).max() < 1e-12


def test_kinetic_ibm_hot_body():
    """Hot immersed square (T_w = 1.4) between cold diffuse walls, COMET:
    converges, heats the adjacent gas, conserves fluid mass exactly, and
    the net IB force vanishes by symmetry."""
    dm = fvm.mesh.build_device_mesh(quad_2d(16, 16))
    m = KineticModel(dm, Quadrature(8, 8, 4))
    m.options["verbose"] = False
    m.options["solver"] = "COMET"
    m.vc["relaxationTime"] = 0.2
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "DiffuseWall"
    m.init()
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
    solid = (np.abs(cc[:, 0] - 0.5) < 0.15) & (np.abs(cc[:, 1] - 0.5) < 0.15)
    m.set_immersed_boundary(solid, wall_temperature=1.4)
    h = m.advance(30)
    assert h[-1][1] / h[0][1] < 1e-4
    rho, u, T = m.moments()
    T = np.asarray(T)[: dm.n_interior_cells]
    r = np.hypot(cc[:, 0] - 0.5, cc[:, 1] - 0.5)
    near = (~solid) & (r < 0.3)
    assert T[near].mean() > T[r > 0.55].mean() + 0.05
    # exact fluid-mass conservation (zero net IB mass flux by closure)
    V = np.asarray(dm.cell_volume)[: dm.n_interior_cells]
    mass = (V[~solid] * np.asarray(rho)[: dm.n_interior_cells][~solid]).sum()
    assert mass == pytest.approx(V[~solid].sum(), rel=1e-12)
    F = m.getIBForceIntegral()
    assert np.abs(F).max() < 1e-9


def test_kinetic_ibm_moving_body_drag():
    """Immersed plate sliding at +x in a closed box of resting gas: the
    diffuse surface drags the adjacent gas along and the gas exerts a
    retarding (-x) force on the body."""
    dm = fvm.mesh.build_device_mesh(quad_2d(16, 16))
    m = KineticModel(dm, Quadrature(8, 8, 4))
    m.options["verbose"] = False
    m.options["solver"] = "COMET"
    m.vc["relaxationTime"] = 0.2
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "DiffuseWall"
    m.init()
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
    solid = (np.abs(cc[:, 0] - 0.5) < 0.25) & (np.abs(cc[:, 1] - 0.5) < 0.1)
    m.set_immersed_boundary(solid, wall_velocity=(0.2, 0.0, 0.0))
    m.advance(40)
    rho, u, T = m.moments()
    ux = np.asarray(u)[: dm.n_interior_cells, 0]
    r_band = (~solid) & (np.abs(cc[:, 1] - 0.5) < 0.25) & (
        np.abs(cc[:, 0] - 0.5) < 0.25
    )
    assert ux[r_band].mean() > 0.02  # entrained gas
    Fx = m.getIBForceIntegral()[0]
    assert Fx < -1e-4  # drag opposes the body motion


def test_kinetic_ibm_moving_body_transient_damping():
    """Immersed plate oscillating tangentially (reference: the unsteady
    IBM-ESBGK pipeline, scripts/IB-ESBGKSteady.py:48-67 re-runs the IB
    update every time step): re-calling set_immersed_boundary each step
    with a fixed ``pad_faces`` keeps all table shapes static so the
    compiled step is reused, and the gas extracts net work from the body
    over a cycle (viscous shear damping: F opposes v)."""
    dm = fvm.mesh.build_device_mesh(quad_2d(24, 16, lx=1.5))
    m = KineticModel(dm, Quadrature(8, 8, 4))
    m.options["verbose"] = False
    m.options["solver"] = "COMET"
    m.options["transient"] = True
    m.options["timeStep"] = 0.1
    m.vc["relaxationTime"] = 0.1
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "DiffuseWall"
    m.init()
    cc = np.asarray(dm.cell_centroid)[: dm.n_interior_cells]
    solid = (np.abs(cc[:, 0] - 0.75) < 0.25) & (np.abs(cc[:, 1] - 0.5) < 0.1)
    A, om, dt = 0.3, 2 * np.pi / 2.0, 0.1
    W, n_w = 0.0, 0
    for k in range(24):
        vx = A * np.cos(om * k * dt)
        m.set_immersed_boundary(solid, wall_velocity=(vx, 0, 0), pad_faces=60)
        m.advance(2)
        m.updateTime()
        if k >= 4:  # skip the startup transient; 20 steps = one period
            W += m.getIBForceIntegral()[0] * vx * dt
            n_w += 1
    assert n_w == 20
    assert W < -0.01  # net damping work extracted from the body


def test_comet_solve_adjoint_duality():
    """KineticModel.solve_adjoint: exact duality <grad, direction> ==
    dJ(solve_tangent(direction)) on a diffuse-wall Couette for a
    nonlinear momentum functional — tau field AND wall-velocity BC knob.
    Exercises the transposed exact-jvp operator, the transposed
    Woodbury(+DSA) preconditioner, and the mass-projection transpose."""
    import jax

    dm = fvm.mesh.build_device_mesh(quad_2d(3, 10))
    m = KineticModel(dm, Quadrature(8, 8, 4))
    m.options["verbose"] = False
    m.vc["relaxationTime"] = 0.2
    for s, uw in (("top", 0.3), ("bottom", -0.3)):
        m.bc[s].bc_type = "DiffuseWall"
        m.bc[s]["specifiedXVelocity"] = uw
    m.bc["left"].bc_type = "Symmetry"
    m.bc["right"].bc_type = "Symmetry"
    m.init()
    m.advance(80)

    ni = m.mesh.n_interior_cells
    q = m.quadrature
    wcx = jnp.asarray(np.asarray(q.w) * np.asarray(q.c)[:, 0])
    J = lambda ff: jnp.sum((ff @ wcx) ** 2)  # sum of cell momentum^2

    grads = m.solve_adjoint(
        J, param_keys=("tau",), bc_keys=("top:specifiedXVelocity",)
    )
    assert grads["tau"].shape == (ni,)

    f0i = jnp.asarray(m.state["f"][:ni])
    rng = np.random.default_rng(3)
    dtau = rng.standard_normal(ni)
    df = jnp.asarray(m.solve_tangent(param_tangents={"tau": dtau}))
    dJ = float(jax.jvp(J, (f0i,), (df,))[1])
    assert abs(dJ) > 1e-12  # genuinely nonzero sensitivity
    np.testing.assert_allclose(
        float(np.dot(grads["tau"], dtau)), dJ, rtol=1e-5
    )

    dfb = jnp.asarray(
        m.solve_tangent(bc_tangents={"top:specifiedXVelocity": 1.0})
    )
    dJb = float(jax.jvp(J, (f0i,), (dfb,))[1])
    np.testing.assert_allclose(
        float(np.sum(grads["top:specifiedXVelocity"])), dJb, rtol=1e-5
    )


def test_comet_sensitivities_dist_match_single():
    """Distributed ES-BGK COMET tangent AND adjoint: the per-shard
    solves (halo-synced jvp operator, psum'd Krylov and mass
    projections, reversed exchanges in the transposed operator) must
    reproduce the single-device sensitivities, plus dist duality."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from fvm_tpu.parallel import Partition

    def mk():
        return quad_2d(3, 12)

    def setup(m):
        m.options["verbose"] = False
        m.vc["relaxationTime"] = 0.2
        m.bc["top"].bc_type = "DiffuseWall"
        m.bc["top"]["specifiedXVelocity"] = 0.3
        m.bc["bottom"].bc_type = "DiffuseWall"
        m.bc["bottom"]["specifiedXVelocity"] = -0.3
        m.bc["left"].bc_type = "Symmetry"
        m.bc["right"].bc_type = "Symmetry"
        m.init()
        m.advance(60)

    ni = mk().n_interior_cells
    q = Quadrature(6, 6, 4)
    wcx = jnp.asarray(np.asarray(q.w) * np.asarray(q.c)[:, 0])
    J = lambda ff: jnp.sum((ff @ wcx) ** 2)
    rng = np.random.default_rng(5)
    dtau = rng.standard_normal(ni)

    single = KineticModel(fvm.mesh.build_device_mesh(mk()), q)
    setup(single)
    df1 = single.solve_tangent(param_tangents={"tau": dtau})
    g1 = single.solve_adjoint(
        J, param_keys=("tau",), bc_keys=("top:specifiedXVelocity",)
    )

    part = Partition(mk(), 2)
    dist = KineticModel(part.sharded_mesh, Quadrature(6, 6, 4),
                        partition=part)
    setup(dist)
    dfN = dist.solve_tangent(param_tangents={"tau": dtau})
    gN = dist.solve_adjoint(
        J, param_keys=("tau",), bc_keys=("top:specifiedXVelocity",)
    )

    scale = np.abs(df1).max()
    np.testing.assert_allclose(dfN, df1, atol=1e-6 * scale)
    gs = np.abs(g1["tau"]).max()
    np.testing.assert_allclose(gN["tau"], g1["tau"], atol=1e-6 * gs)
    np.testing.assert_allclose(
        np.sum(gN["top:specifiedXVelocity"]),
        np.sum(g1["top:specifiedXVelocity"]),
        rtol=1e-5,
    )

    # duality of the DIST pair: <grad_tau, dtau> == dJ(d f(dtau))
    f0i = jnp.asarray(dist.partition.gather_cells(dist.state["f"]))
    dJ = float(jax.jvp(J, (f0i,), (jnp.asarray(dfN),))[1])
    assert abs(dJ) > 1e-12
    np.testing.assert_allclose(float(np.dot(gN["tau"], dtau)), dJ,
                               rtol=1e-5)
