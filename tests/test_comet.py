"""COMET point-coupled kinetic solver: convergence + physics.

The COMET solve (reference: esbgkbase/COMETModel.h:51) must converge in
far fewer outer iterations than the segregated sweep solver at moderate
Knudsen number — the whole point of coupling the ordinates through the
collision invariants.
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.kinetic.esbgk import KineticModel
from fvm_tpu.kinetic.quadrature import Quadrature


def _couette(solver, tau=0.1, n=16, niter=12, uw=0.3):
    mesh = fvm.mesh.generate.quad_2d(4, n)
    dm = fvm.mesh.build_device_mesh(mesh)
    k = KineticModel(dm, Quadrature(6, 6, 6))
    k.options["verbose"] = False
    k.options["solver"] = solver
    k.options["relativeTolerance"] = 1e-12
    k.vc["relaxationTime"] = tau
    k.bc["left"].bc_type = "Symmetry"
    k.bc["right"].bc_type = "Symmetry"
    k.bc["bottom"].bc_type = "DiffuseWall"
    k.bc["bottom"]["specifiedXVelocity"] = -uw
    k.bc["top"].bc_type = "DiffuseWall"
    k.bc["top"]["specifiedXVelocity"] = uw
    k.init()
    hist = k.advance(niter)
    return [h[1] for h in hist], k


def test_comet_newton_convergence():
    """COMET (JFNK + Woodbury collision preconditioner) reaches 1e-6
    relative residual in <=5 outer iterations; the sweep solver needs
    many times more (>= 5x, per the round-2 acceptance criterion)."""
    rs_comet, _ = _couette("COMET", niter=8)
    rel = [r / rs_comet[0] for r in rs_comet]
    it_comet = next((i for i, r in enumerate(rel) if r < 1e-6), None)
    assert it_comet is not None and it_comet <= 5

    rs_sweep, _ = _couette("sweep", niter=8)
    rel_s = [r / rs_sweep[0] for r in rs_sweep]
    assert all(r > 1e-6 for r in rel_s[: 8])


def test_comet_couette_velocity_profile():
    """Converged Couette velocity profile: antisymmetric, monotone in y,
    with slip at the walls (|u_wall| < u_w for finite Kn)."""
    rs, k = _couette("COMET", tau=0.05, n=24, niter=8)
    rho, u, T = k.moments()
    nin = k.mesh.n_interior_cells
    y = np.asarray(k.mesh.cell_centroid[:nin, 1])
    ux = np.asarray(u[:nin, 0])
    # average over x columns
    ys = np.unique(np.round(y, 9))
    prof = np.array([ux[np.isclose(y, yy)].mean() for yy in ys])
    assert abs(prof[0] + prof[-1]) < 1e-3  # antisymmetry
    assert np.all(np.diff(prof) > 0)  # monotone shear
    assert prof[-1] < 0.3  # velocity slip
    assert prof[-1] > 0.05


def test_comet_conservation():
    rs, k = _couette("COMET", niter=6)
    drho, dmom, de = k.conservation_error()
    assert drho < 1e-8


def test_phonon_comet_nongray():
    """Non-gray (two-band) phonon COMET: 1e-6 relative residual within 3
    outer iterations (linear BTE + exact Jacobian => Newton converges
    immediately); the sweep solver is nowhere close in the same budget
    (acceptance: <= 1/4 the iterations of the sweep solver)."""
    from fvm_tpu.kinetic.phonon import PhononModel

    def run(solver, niter):
        mesh = fvm.mesh.generate.quad_2d(16, 16)
        dm = fvm.mesh.build_device_mesh(mesh)
        p = PhononModel(dm, n_polar=4, n_azimuthal=8,
                        bands=[(0.6, 3.0, 0.02), (0.4, 1.0, 0.2)])
        p.options["verbose"] = False
        p.options["solver"] = solver
        p.options["relativeTolerance"] = 1e-10
        p.bc["left"].bc_type = "Isothermal"
        p.bc["left"]["specifiedTemperature"] = 310.0
        p.bc["right"].bc_type = "Isothermal"
        p.bc["right"]["specifiedTemperature"] = 300.0
        p.bc["bottom"].bc_type = "Symmetry"
        p.bc["top"].bc_type = "Symmetry"
        p.init()
        hist = p.advance(niter)
        return [h[1] for h in hist], p

    rs, p = run("COMET", 4)
    rel = [r / rs[0] for r in rs]
    assert min(rel) < 1e-8
    it6 = next(i for i, r in enumerate(rel) if r < 1e-6)
    assert it6 <= 3
    T = p.getTemperature()
    assert 300.0 < T.min() < 302.5 and 307.5 < T.max() < 310.0

    rs_s, _ = run("sweep", 12)
    assert all(r / rs_s[0] > 1e-6 for r in rs_s)


def test_phonon_dsa_bounded_iterations_thick():
    """Acoustically thick regime (optical thickness L/(vg tau) = 100):
    with the diffusion-synthetic coarse correction (the role of the
    reference's COMET multigrid, phononbase/COMETModel.h:1080
    MakeCoarseModel + :2800-2985 cycle) a FIXED inner budget of 20
    Krylov iterations converges the solve at every mesh size, where the
    plain point-preconditioned solver needs an inner budget that grows
    with resolution (stalls at nx=64).  The converged temperature is the
    diffusion profile up to Knudsen-layer jumps."""
    import fvm_tpu as fvm
    from fvm_tpu.mesh.generate import quad_2d
    from fvm_tpu.kinetic.phonon import PhononModel

    def run(nx, dsa, inner=20):
        dm = fvm.mesh.build_device_mesh(quad_2d(nx, 4))
        m = PhononModel(dm, n_polar=4, n_azimuthal=8)
        m.options["verbose"] = False
        m.options["innerIterations"] = inner
        m.options["innerTolerance"] = 1e-9
        m.options["coarseAcceleration"] = dsa
        m.vc["relaxationTime"] = 0.01  # thickness 100 at vg = L = 1
        m.bc["left"].bc_type = "Isothermal"
        m.bc["left"]["specifiedTemperature"] = 310.0
        m.bc["right"].bc_type = "Isothermal"
        m.bc["right"]["specifiedTemperature"] = 300.0
        m.bc["top"].bc_type = "Symmetry"
        m.bc["bottom"].bc_type = "Symmetry"
        m.init()
        hist = m.advance(6)
        T = m.getTemperature()
        x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
        err = np.abs(T - (310.0 - 10.0 * x)).max()
        return hist[-1][1] / hist[0][1], err

    for nx in (32, 64):
        ratio, err = run(nx, True)
        # 5e-7: ~7 decades in 6 outers; the exact ratio shifts ~30% with
        # reduction order (e.g. the plane-major layout flip moved nx=64
        # from 9e-8 to 1.3e-7) while the DSA-vs-plain contrast stays 1e5
        assert ratio < 5e-7, f"DSA nx={nx}: {ratio}"
        # diffusion profile up to the Kn=0.01 temperature jumps
        assert err < 0.3, f"DSA nx={nx}: T err {err}"
    # the unaccelerated solver cannot converge at nx=64 within the same
    # fixed budget — the coarse correction is what bounds the iterations
    ratio_plain, _ = run(64, False)
    assert ratio_plain > 1e-5


def test_esbgk_dsa_thick_heat_transfer():
    """ES-BGK temperature-mode DSA (kinetic/dsa.py; the esbgk side of
    the reference's COMET coarse model): at optical thickness 100 the
    thick heat-transfer solve stalls without the coarse correction and
    converges ~25x deeper with it at the same inner budget."""
    import fvm_tpu as fvm
    from fvm_tpu.mesh.generate import quad_2d
    from fvm_tpu.kinetic import Quadrature, KineticModel

    def run(dsa):
        mesh = quad_2d(48, 3)
        mesh.make_periodic("bottom", "top")
        dm = fvm.mesh.build_device_mesh(mesh)
        m = KineticModel(dm, Quadrature(8, 8, 4))
        m.options["verbose"] = False
        m.options["innerIterations"] = 60
        m.options["innerTolerance"] = 1e-9
        m.options["coarseAcceleration"] = dsa
        m.vc["relaxationTime"] = 0.01
        m.bc["left"].bc_type = "DiffuseWall"
        m.bc["left"]["specifiedTemperature"] = 1.1
        m.bc["right"].bc_type = "DiffuseWall"
        m.bc["right"]["specifiedTemperature"] = 0.9
        m.bc["bottom"].bc_type = "Periodic"
        m.bc["top"].bc_type = "Periodic"
        m.init()
        h = m.advance(8)
        return h[-1][1] / h[0][1]

    rel_dsa = run(True)
    rel_plain = run(False)
    assert rel_dsa < 1e-3
    assert rel_dsa < rel_plain / 5


def test_phonon_solve_tangent_vs_fd():
    """PhononModel.solve_tangent (reference: phononbase built with the
    Tangent atype, models.cpp:10-74): d(T)/d(tau) and d(T)/d(T_wall) on a
    gray Isothermal slab match central finite differences."""
    from fvm_tpu.kinetic.phonon import PhononModel

    tau0 = 0.15

    def build(Tl, tau=tau0):
        dm = fvm.mesh.build_device_mesh(fvm.mesh.generate.quad_2d(12, 3))
        m = PhononModel(dm, n_polar=4, n_azimuthal=8)
        m.options["verbose"] = False
        m.options["relativeTolerance"] = 1e-12
        m.vc["relaxationTime"] = tau
        m.bc["left"].bc_type = "Isothermal"
        m.bc["left"]["specifiedTemperature"] = Tl
        m.bc["right"].bc_type = "Isothermal"
        m.bc["right"]["specifiedTemperature"] = 290.0
        m.bc["top"].bc_type = "Symmetry"
        m.bc["bottom"].bc_type = "Symmetry"
        m.init()
        m.advance(60)
        return m

    m = build(310.0)
    ni = m.mesh.n_interior_cells

    dT = m.solve_tangent_temperature(param_tangents={"tau": 1.0})
    fdt = (
        np.asarray(build(310.0, tau0 + 1e-5).temperature())
        - np.asarray(build(310.0, tau0 - 1e-5).temperature())
    )[:ni] / (2e-5)
    np.testing.assert_allclose(dT, fdt, rtol=1e-6, atol=1e-6 * np.abs(fdt).max())

    # BC tangent: boundary-concentrated rhs (regression for the
    # Jacobi-vs-Woodbury preconditioner choice in solve_tangent — the
    # primal's Woodbury/DSA composition stagnates BiCGStab here)
    dTb = m.solve_tangent_temperature(
        bc_tangents={"left:specifiedTemperature": 1.0}
    )
    fdb = (
        np.asarray(build(310.0 + 1e-3).temperature())
        - np.asarray(build(310.0 - 1e-3).temperature())
    )[:ni] / (2e-3)
    np.testing.assert_allclose(dTb, fdb, rtol=1e-5, atol=1e-6)
    # sanity: the left-wall influence is strongest at the left wall
    x = np.asarray(m.mesh.cell_centroid)[:ni, 0]
    assert dTb[np.argmin(x)] > dTb[np.argmax(x)]


def test_phonon_solve_adjoint_duality():
    """PhononModel.solve_adjoint: exact duality <grad, direction> ==
    dJ(solve_tangent(direction)) for a total-lattice-temperature
    functional on a gray Isothermal slab — per-direction-band tau
    gradient AND wall-temperature BC gradient from one transposed
    solve."""
    import jax
    import jax.numpy as jnp
    from fvm_tpu.kinetic.phonon import PhononModel

    dm = fvm.mesh.build_device_mesh(fvm.mesh.generate.quad_2d(12, 3))
    m = PhononModel(dm, n_polar=4, n_azimuthal=8)
    m.options["verbose"] = False
    m.options["relativeTolerance"] = 1e-12
    m.vc["relaxationTime"] = 0.15
    m.bc["left"].bc_type = "Isothermal"
    m.bc["left"]["specifiedTemperature"] = 310.0
    m.bc["right"].bc_type = "Isothermal"
    m.bc["right"]["specifiedTemperature"] = 290.0
    m.bc["top"].bc_type = "Symmetry"
    m.bc["bottom"].bc_type = "Symmetry"
    m.init()
    m.advance(60)

    ni = m.mesh.n_interior_cells
    # x-weighted temperature: a plain sum(T) is tau-INVARIANT on this
    # symmetric slab (the Isothermal wall jumps are antisymmetric about
    # the 300 K mean), which would reduce the tau duality check to
    # noise-vs-noise; the x-weight makes dJ/dtau genuinely nonzero
    xw = jnp.asarray(np.asarray(m.mesh.cell_centroid[:ni, 0]))
    J = lambda ee: jnp.sum(m.temperature(ee) * xw)

    grads = m.solve_adjoint(
        J, param_keys=("tau",), bc_keys=("left:specifiedTemperature",)
    )
    assert grads["tau"].shape == (m.D * m.B,)

    e0i = jnp.asarray(m.state["e"][:ni])
    # all-ones tau direction == what solve_tangent({"tau": 1.0}) expands to
    de = jnp.asarray(m.solve_tangent(param_tangents={"tau": 1.0}))
    dJ = float(jax.jvp(J, (e0i,), (de,))[1])
    assert abs(dJ) > 1e-12
    np.testing.assert_allclose(float(np.sum(grads["tau"])), dJ, rtol=1e-6)

    deb = jnp.asarray(
        m.solve_tangent(bc_tangents={"left:specifiedTemperature": 1.0})
    )
    dJb = float(jax.jvp(J, (e0i,), (deb,))[1])
    np.testing.assert_allclose(
        float(np.sum(grads["left:specifiedTemperature"])), dJb, rtol=1e-6
    )


def test_phonon_sensitivities_dist_match_single():
    """Distributed phonon COMET tangent + adjoint match single-device
    (per-band tau gradient summed over shards; BC gradient gathered)."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from fvm_tpu.parallel import Partition
    from fvm_tpu.kinetic.phonon import PhononModel

    def mk():
        return fvm.mesh.generate.quad_2d(12, 3)

    def setup(m):
        m.options["verbose"] = False
        m.options["relativeTolerance"] = 1e-12
        m.vc["relaxationTime"] = 0.15
        m.bc["left"].bc_type = "Isothermal"
        m.bc["left"]["specifiedTemperature"] = 310.0
        m.bc["right"].bc_type = "Isothermal"
        m.bc["right"]["specifiedTemperature"] = 290.0
        m.bc["top"].bc_type = "Symmetry"
        m.bc["bottom"].bc_type = "Symmetry"
        m.init()
        m.advance(60)

    single = PhononModel(fvm.mesh.build_device_mesh(mk()), 4, 8)
    setup(single)
    de1 = single.solve_tangent(param_tangents={"tau": 1.0})
    # sum(T^2) is sum-decomposable (the dist contract) and NOT
    # tau-invariant on this symmetric slab (unlike plain sum(T))
    J1 = lambda ee: jnp.sum(single.temperature(ee) ** 2)
    g1 = single.solve_adjoint(
        J1, param_keys=("tau",), bc_keys=("left:specifiedTemperature",)
    )

    part = Partition(mk(), 2)
    dist = PhononModel(part.sharded_mesh, 4, 8, partition=part)
    setup(dist)
    deN = dist.solve_tangent(param_tangents={"tau": 1.0})
    JN = lambda ee: jnp.sum(dist.temperature(ee) ** 2)
    gN = dist.solve_adjoint(
        JN, param_keys=("tau",), bc_keys=("left:specifiedTemperature",)
    )

    scale = np.abs(de1).max()
    np.testing.assert_allclose(deN, de1, atol=1e-8 * scale)
    np.testing.assert_allclose(gN["tau"], g1["tau"], rtol=1e-6)
    np.testing.assert_allclose(
        np.sum(gN["left:specifiedTemperature"]),
        np.sum(g1["left:specifiedTemperature"]),
        rtol=1e-6,
    )
