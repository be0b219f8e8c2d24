"""Double-shell interface tests (reference: Mesh.h:316-317 createShell/
createDoubleShell, LinearizeInterfaceJump.h:24).

Exact-solution checks: 1D two-region diffusion with a concentration jump
phi_R = A*phi_L + B at the interface has a piecewise-linear solution with
constant flux q = (A*phi0 + B - phi1) / (L_R/D_R + A*L_L/D_L).
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.vacancy import VacancyModel


def make_split_model(nx=16, ny=4, lx=2.0, x_split=1.0, D_left=1.0,
                     D_right=1.0, phi0=1.0, phi1=0.0):
    m = quad_2d(nx, ny, lx=lx, ly=1.0)
    # cell centroids on the host mesh (before device build): use the cell
    # order of quad_2d (x fastest); approximate via face_cells geometry
    import fvm_tpu.mesh.metrics as metrics

    geom = metrics.compute_geometry(m)
    xc = geom.cell_centroid[: m.n_interior_cells, 0]
    left = xc < x_split
    faces = m.interface_faces_between(left, ~left)
    assert len(faces) == ny
    m2 = m.make_interface("mid", faces, left_cells=left)
    dm = fvm.mesh.build_device_mesh(m2)

    model = VacancyModel(dm)
    model.options["verbose"] = False
    D = np.where(left, D_left, D_right)
    # ghost cells inherit the owner diffusivity via extend_to_ghosts
    model.vc["vacancyDiffusivity"] = np.concatenate(
        [D, np.zeros(dm.n_cells - len(D))]
    )[: m2.n_interior_cells]
    model.bc["left"].bc_type = "Dirichlet"
    model.bc["left"]["specifiedConcentration"] = phi0
    model.bc["right"].bc_type = "Dirichlet"
    model.bc["right"]["specifiedConcentration"] = phi1
    model.bc["top"].bc_type = "Symmetry"
    model.bc["bottom"].bc_type = "Symmetry"
    return model, xc, left


def exact_profile(xc, left, A, B, D_left, D_right, phi0=1.0, phi1=0.0,
                  x_split=1.0, lx=2.0):
    LL, LR = x_split, lx - x_split
    q = (A * phi0 + B - phi1) / (LR / D_right + A * LL / D_left)
    phiL_i = phi0 - q * x_split / D_left  # left value AT the interface
    phiR_i = A * phiL_i + B
    out = np.where(
        left,
        phi0 - q / D_left * xc,
        phiR_i - q / D_right * (xc - x_split),
    )
    return out, q, phiL_i, phiR_i


def test_continuous_interface_matches_unsplit():
    """A=1, B=0, equal D: the split mesh must reproduce the plain linear
    profile exactly (the interface is then invisible)."""
    model, xc, left = make_split_model()
    model.init()
    model.advance(3)
    phi = model.getConcentration()
    exact = 1.0 - xc / 2.0
    np.testing.assert_allclose(phi, exact, atol=1e-10)


def test_jump_interface_exact():
    """Concentration jump phi_R = A phi_L + B with dissimilar D."""
    A, B, DL, DR = 2.0, 0.1, 1.0, 0.25
    model, xc, left = make_split_model(D_left=DL, D_right=DR)
    model.interface["mid"] = {"A_coeff": A, "B_coeff": B}
    model.init()
    model.advance(3)
    phi = model.getConcentration()
    exact, q, phiL_i, phiR_i = exact_profile(xc, left, A, B, DL, DR)
    np.testing.assert_allclose(phi, exact, atol=1e-9)
    # shell unknowns hold the two one-sided interface values
    dm = model.mesh
    gl, gr = dm.interface("mid")
    sL = dm.ghost_cells_of_group(gl)
    sR = dm.ghost_cells_of_group(gr)
    state = np.asarray(model.state[model.var])
    np.testing.assert_allclose(state[sL], phiL_i, atol=1e-9)
    np.testing.assert_allclose(state[sR], phiR_i, atol=1e-9)


def test_interface_flux_conservation():
    """Steady state: boundary flux in == flux out across the jump."""
    A, B, DL, DR = 1.5, -0.2, 2.0, 0.5
    model, xc, left = make_split_model(D_left=DL, D_right=DR)
    model.interface["mid"] = {"A_coeff": A, "B_coeff": B}
    model.init()
    model.advance(3)
    exact, q, *_ = exact_profile(xc, left, A, B, DL, DR)
    fin = model.getFluxIntegral("left")
    fout = model.getFluxIntegral("right")
    assert fin + fout == pytest.approx(0.0, abs=1e-10 * max(abs(fin), 1))
    assert abs(fin) == pytest.approx(abs(q), rel=1e-8)


def test_interface_orientation_flip():
    """left_cells mask orients the L side regardless of face ownership:
    flipping the mask swaps which side the jump applies to."""
    A, B, DL, DR = 2.0, 0.0, 1.0, 1.0
    # same physical setup but declare the RIGHT region as 'L': the jump
    # becomes phi_left_side = A*phi_right_side at the interface, i.e. the
    # mirrored analytic solution of a domain traversed right-to-left
    m = quad_2d(16, 4, lx=2.0, ly=1.0)
    import fvm_tpu.mesh.metrics as metrics

    geom = metrics.compute_geometry(m)
    xc = geom.cell_centroid[: m.n_interior_cells, 0]
    right = xc > 1.0
    faces = m.interface_faces_between(right, ~right)
    m2 = m.make_interface("mid", faces, left_cells=right)
    dm = fvm.mesh.build_device_mesh(m2)
    model = VacancyModel(dm)
    model.options["verbose"] = False
    model.interface["mid"] = {"A_coeff": A, "B_coeff": B}
    model.bc["left"].bc_type = "Dirichlet"
    model.bc["left"]["specifiedConcentration"] = 0.0
    model.bc["right"].bc_type = "Dirichlet"
    model.bc["right"]["specifiedConcentration"] = 1.0
    model.bc["top"].bc_type = "Symmetry"
    model.bc["bottom"].bc_type = "Symmetry"
    model.init()
    model.advance(3)
    phi = model.getConcentration()
    # mirrored problem: phi0=1 at x'=0 (x=2), jump L(right region)->R
    exact, *_ = exact_profile(2.0 - xc, right, A, B, 1.0, 1.0)
    np.testing.assert_allclose(phi, exact, atol=1e-9)


def test_flux_closure_contact_resistance():
    """Linear closure F_R = k*(phi_R - phi_L): a contact resistance 1/k in
    series -> q = (phi0 - phi1)/(L_L/D_L + L_R/D_R + 1/k)."""
    DL, DR, k = 1.0, 0.5, 2.0
    model, xc, left = make_split_model(D_left=DL, D_right=DR)
    import jax.numpy as jnp

    model.interface["mid"] = {
        "type": "flux",
        "flux_fn": lambda pl, pr: k * (pr - pl),
    }
    model.init()
    model.advance(5)
    phi = model.getConcentration()
    q = (1.0 - 0.0) / (1.0 / DL + 1.0 / DR + 1.0 / k)
    phiL_i = 1.0 - q / DL
    phiR_i = phiL_i - q / k
    exact = np.where(left, 1.0 - q / DL * xc, phiR_i - q / DR * (xc - 1.0))
    np.testing.assert_allclose(phi, exact, atol=1e-9)
    fin = model.getFluxIntegral("left")
    assert abs(fin) == pytest.approx(q, rel=1e-8)


def test_flux_closure_nonlinear_bv():
    """Butler-Volmer-like closure F_R = k*sinh(c*(phi_R - phi_L)): the
    outer Newton linearization (auto-diff'd) must converge to the root of
    phi0 - phi1 - q*(L_L/D_L + L_R/D_R) = asinh(-q/k)/c."""
    import jax.numpy as jnp

    DL, DR, k, c = 1.0, 0.5, 0.8, 3.0
    model, xc, left = make_split_model(D_left=DL, D_right=DR)
    model.interface["mid"] = {
        "type": "flux",
        "flux_fn": lambda pl, pr: k * jnp.sinh(c * (pr - pl)),
    }
    model.init()
    hist = model.advance(25)
    assert hist[-1][1] / hist[0][1] < 1e-10

    # scalar root: g(q) = (phi0-phi1) - q*(LL/DL+LR/DR) + asinh(q/k)/c = 0
    # (delta = phiR - phiL = asinh(-q/k)/c; profile drop = q*sum(L/D) - delta)
    def g(q):
        return 1.0 - q * (1.0 / DL + 1.0 / DR) + np.arcsinh(-q / k) / c

    lo, hi = 0.0, 1.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if g(lo) * g(mid) <= 0:
            hi = mid
        else:
            lo = mid
    q = 0.5 * (lo + hi)
    phiL_i = 1.0 - q / DL
    phiR_i = phiL_i + np.arcsinh(-q / k) / c
    exact = np.where(left, 1.0 - q / DL * xc, phiR_i - q / DR * (xc - 1.0))
    phi = model.getConcentration()
    np.testing.assert_allclose(phi, exact, atol=1e-8)


def test_battery_double_shell_species():
    """Reference battery species interface on a double-shell mesh
    (BatteryLinearizeSpeciesInterface.h): electrolyte (L) | electrode (R)
    with BV molar flux i/F and transference-factor-weighted balance.

    Verified against the physics, not a precomputed root: at steady state
    with a specified Li flux q into the electrode back contact,
      - electrode region carries q (slope q/D_s),
      - electrolyte region carries tf*q (slope tf*q/D_e),
      - the shell unknowns satisfy flux_fn(ce_i, cs_i) == q.
    """
    from fvm_tpu.models.battery import species_interface_flux
    from fvm_tpu.models.species import SpeciesModel
    import fvm_tpu.mesh.metrics as metrics

    tf, q, D = 0.637, 1e-3, 1e-2
    ce0, cs_init = 1000.0, 2000.0
    m = quad_2d(16, 4, lx=2.0, ly=1.0)
    geom = metrics.compute_geometry(m)
    xc = geom.cell_centroid[: m.n_interior_cells, 0]
    left = xc < 1.0
    m2 = m.make_interface(
        "elyte_anode", m.interface_faces_between(left, ~left), left_cells=left
    )
    dm = fvm.mesh.build_device_mesh(m2)
    model = SpeciesModel(dm)
    model.options["verbose"] = False
    model.vc["massDiffusivity"] = D
    model.vc["initialMassFraction"] = np.where(left, ce0, cs_init)
    flux_fn = species_interface_flux(eta=0.1)
    model.interface["elyte_anode"] = {
        "type": "flux", "flux_fn": flux_fn, "weight_R": tf,
    }
    model.bc["left"].bc_type = "SpecifiedMassFraction"
    model.bc["left"]["specifiedMassFraction"] = ce0
    # Li injected at the electrode back contact at molar flux q (so the
    # interface passes +q toward the electrolyte: BV flux positive)
    model.bc["right"].bc_type = "SpecifiedMassFlux"
    model.bc["right"]["specifiedMassFlux"] = q
    model.bc["top"].bc_type = "Symmetry"
    model.bc["bottom"].bc_type = "Symmetry"
    model.init()
    hist = model.advance(40)
    assert hist[-1][1] / hist[0][1] < 1e-8

    c = model.getMassFraction(0)
    # electrolyte: ce(x) = ce0 + tf*q/D * x  (flux tf*q toward -x)
    ce_exact = ce0 + tf * q / D * xc[left]
    np.testing.assert_allclose(c[left], ce_exact, rtol=1e-8)
    ce_i = ce0 + tf * q / D * 1.0
    # electrode slope: flux q toward -x -> dc/dx = q/D
    cs = c[~left]
    xs = xc[~left]
    slope = np.polyfit(xs, cs, 1)[0]
    assert slope == pytest.approx(q / D, rel=1e-6)
    # shell unknowns satisfy the BV closure exactly
    dm2 = model.mesh
    gl, gr = dm2.interface("elyte_anode")
    sL = dm2.ghost_cells_of_group(gl)
    sR = dm2.ghost_cells_of_group(gr)
    state = np.asarray(model.state["mf0"])
    np.testing.assert_allclose(state[sL], ce_i, rtol=1e-8)
    i_closure = np.asarray(flux_fn(state[sL], state[sR]))
    np.testing.assert_allclose(i_closure, q, rtol=1e-7)
    # balance: boundary influx at the left = tf * q (leaving)
    fin = model.getMassFluxIntegral("left")
    assert abs(fin) == pytest.approx(tf * q * 1.0, rel=1e-6)


def test_dielectric_shell_capacitor():
    """Thin dielectric layer between two regions (reference
    LinearizeDielectric.h): series capacitor, displacement field
    D = (V0-V1)/(L1/e1 + t/ed + L2/e2), potential drop D*t/ed across the
    layer."""
    from fvm_tpu.models.electric import ElectricModel, EPS0
    import fvm_tpu.mesh.metrics as metrics

    e1, e2, ed, t_d = 2.0, 4.0, 0.5, 0.1
    V0, V1 = 5.0, 0.0
    m = quad_2d(16, 4, lx=2.0, ly=1.0)
    geom = metrics.compute_geometry(m)
    xc = geom.cell_centroid[: m.n_interior_cells, 0]
    left = xc < 1.0
    m2 = m.make_interface(
        "diel", m.interface_faces_between(left, ~left), left_cells=left
    )
    dm = fvm.mesh.build_device_mesh(m2)
    model = ElectricModel(dm)
    model.options["verbose"] = False
    model.vc["dielectric_constant"] = np.where(left, e1, e2)
    model.interface["diel"] = {
        "type": "dielectric", "constant": ed * EPS0, "thickness": t_d,
    }
    model.bc["left"].bc_type = "SpecifiedPotential"
    model.bc["left"]["specifiedPotential"] = V0
    model.bc["right"].bc_type = "SpecifiedPotential"
    model.bc["right"]["specifiedPotential"] = V1
    model.bc["top"].bc_type = "Symmetry"
    model.bc["bottom"].bc_type = "Symmetry"
    model.init()
    model.advance(5)
    phi = model.getPotential()
    D = (V0 - V1) / (1.0 / e1 + t_d / ed + 1.0 / e2) * EPS0
    phiL_i = V0 - D / (e1 * EPS0) * 1.0
    phiR_i = phiL_i - D * t_d / (ed * EPS0)
    exact = np.where(
        left, V0 - D / (e1 * EPS0) * xc, phiR_i - D / (e2 * EPS0) * (xc - 1.0)
    )
    np.testing.assert_allclose(phi, exact, rtol=1e-8, atol=1e-10)


def _dist_split_model(n_shards, A, B, DL, DR):
    from fvm_tpu.parallel import Partition
    import fvm_tpu.mesh.metrics as metrics

    m = quad_2d(16, 4, lx=2.0, ly=1.0)
    geom = metrics.compute_geometry(m)
    xc = geom.cell_centroid[: m.n_interior_cells, 0]
    left = xc < 1.0
    m2 = m.make_interface(
        "mid", m.interface_faces_between(left, ~left), left_cells=left
    )
    part = Partition(m2, n_shards)
    model = VacancyModel(part.sharded_mesh, partition=part)
    model.options["verbose"] = False
    D = np.where(left, DL, DR)
    model.vc["vacancyDiffusivity"] = D
    model.bc["left"].bc_type = "Dirichlet"
    model.bc["left"]["specifiedConcentration"] = 1.0
    model.bc["right"].bc_type = "Dirichlet"
    model.bc["right"]["specifiedConcentration"] = 0.0
    model.bc["top"].bc_type = "Symmetry"
    model.bc["bottom"].bc_type = "Symmetry"
    model.interface["mid"] = {"A_coeff": A, "B_coeff": B}
    return model, xc, left


@pytest.mark.parametrize("n_shards", [2, 8])
def test_jump_interface_dist_exact(n_shards):
    """Double-shell jump interface on a partitioned mesh: the partitioner
    co-locates the two bulk owners of every interface face, so the whole
    4-cell shell stencil stays shard-local and the analytic piecewise
    profile is reproduced to machine precision."""
    import jax

    if len(jax.devices()) < n_shards:
        pytest.skip("not enough virtual devices")
    A, B, DL, DR = 2.0, 0.1, 1.0, 0.25
    model, xc, left = _dist_split_model(n_shards, A, B, DL, DR)
    model.init()
    model.advance(3)
    phi = model.getConcentration()
    exact, q, phiL_i, phiR_i = exact_profile(xc, left, A, B, DL, DR)
    np.testing.assert_allclose(phi, exact, atol=1e-9)


def test_battery_double_shell_species_dist():
    """BV flux-closure interface (battery species) on 4 shards matches the
    single-device solve (reference: BatteryLinearizeSpeciesInterface.h
    under MPI partitioning)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from fvm_tpu.models.battery import species_interface_flux
    from fvm_tpu.models.species import SpeciesModel
    from fvm_tpu.parallel import Partition
    import fvm_tpu.mesh.metrics as metrics

    tf, q, D = 0.637, 1e-3, 1e-2
    ce0, cs_init = 1000.0, 2000.0

    def build(n_shards=None):
        m = quad_2d(16, 4, lx=2.0, ly=1.0)
        geom = metrics.compute_geometry(m)
        xc = geom.cell_centroid[: m.n_interior_cells, 0]
        left = xc < 1.0
        m2 = m.make_interface(
            "elyte_anode", m.interface_faces_between(left, ~left),
            left_cells=left,
        )
        if n_shards:
            part = Partition(m2, n_shards)
            model = SpeciesModel(part.sharded_mesh, partition=part)
        else:
            model = SpeciesModel(fvm.mesh.build_device_mesh(m2))
        model.options["verbose"] = False
        model.vc["massDiffusivity"] = D
        model.vc["initialMassFraction"] = np.where(left, ce0, cs_init)
        model.interface["elyte_anode"] = {
            "type": "flux",
            "flux_fn": species_interface_flux(eta=0.1),
            "weight_R": tf,
        }
        model.bc["left"].bc_type = "SpecifiedMassFraction"
        model.bc["left"]["specifiedMassFraction"] = ce0
        model.bc["right"].bc_type = "SpecifiedMassFlux"
        model.bc["right"]["specifiedMassFlux"] = q
        model.bc["top"].bc_type = "Symmetry"
        model.bc["bottom"].bc_type = "Symmetry"
        model.init()
        model.advance(40)
        return model

    single = build()
    dist = build(4)
    np.testing.assert_allclose(
        dist.getMassFraction(0), single.getMassFraction(0), rtol=1e-9
    )
    assert dist.getMassFluxIntegral("left") == pytest.approx(
        single.getMassFluxIntegral("left"), rel=1e-6
    )


def test_dielectric_shell_capacitor_dist():
    """Dielectric double-shell on 4 shards reproduces the series-capacitor
    exact solution (LinearizeDielectric.h under partitioning)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from fvm_tpu.models.electric import ElectricModel, EPS0
    from fvm_tpu.parallel import Partition
    import fvm_tpu.mesh.metrics as metrics

    e1, e2, ed, t_d = 2.0, 4.0, 0.5, 0.1
    V0, V1 = 5.0, 0.0
    m = quad_2d(16, 4, lx=2.0, ly=1.0)
    geom = metrics.compute_geometry(m)
    xc = geom.cell_centroid[: m.n_interior_cells, 0]
    left = xc < 1.0
    m2 = m.make_interface(
        "diel", m.interface_faces_between(left, ~left), left_cells=left
    )
    part = Partition(m2, 4)
    model = ElectricModel(part.sharded_mesh, partition=part)
    model.options["verbose"] = False
    model.vc["dielectric_constant"] = np.where(left, e1, e2)
    model.interface["diel"] = {
        "type": "dielectric", "constant": ed * EPS0, "thickness": t_d,
    }
    model.bc["left"].bc_type = "SpecifiedPotential"
    model.bc["left"]["specifiedPotential"] = V0
    model.bc["right"].bc_type = "SpecifiedPotential"
    model.bc["right"]["specifiedPotential"] = V1
    model.bc["top"].bc_type = "Symmetry"
    model.bc["bottom"].bc_type = "Symmetry"
    model.init()
    model.advance(5)
    phi = model.getPotential()
    D = (V0 - V1) / (1.0 / e1 + t_d / ed + 1.0 / e2) * EPS0
    phiL_i = V0 - D / (e1 * EPS0) * 1.0
    phiR_i = phiL_i - D * t_d / (ed * EPS0)
    exact = np.where(
        left, V0 - D / (e1 * EPS0) * xc, phiR_i - D / (e2 * EPS0) * (xc - 1.0)
    )
    np.testing.assert_allclose(phi, exact, rtol=1e-8, atol=1e-10)


def test_thermal_shell_contact_resistance():
    """ThermalModel on a double-shell mesh (reference:
    BatteryLinearizeThermalInterface.h): continuous default closure
    reproduces the unsplit linear profile; a thermal contact resistance
    (flux closure F = (T_L - T_R)/R_c * area) produces the series-circuit
    temperature jump q = dT_total / (L1/k1 + R_c + L2/k2)."""
    import jax.numpy as jnp
    from fvm_tpu.models import ThermalModel
    import fvm_tpu.mesh.metrics as metrics

    k1, k2, Rc = 2.0, 0.5, 0.4
    T0, T1 = 400.0, 300.0

    def build(interface_cfg):
        m = quad_2d(16, 4, lx=2.0, ly=1.0)
        geom = metrics.compute_geometry(m)
        xc = geom.cell_centroid[: m.n_interior_cells, 0]
        left = xc < 1.0
        m2 = m.make_interface(
            "tc", m.interface_faces_between(left, ~left), left_cells=left
        )
        dm = fvm.mesh.build_device_mesh(m2)
        mod = ThermalModel(dm)
        mod.options["verbose"] = False
        mod.vc["thermalConductivity"] = np.where(left, k1, k2)
        if interface_cfg is not None:
            mod.interface["tc"] = interface_cfg
        mod.bc["left"].bc_type = "SpecifiedTemperature"
        mod.bc["left"]["specifiedTemperature"] = T0
        mod.bc["right"].bc_type = "SpecifiedTemperature"
        mod.bc["right"]["specifiedTemperature"] = T1
        mod.bc["top"].bc_type = "Symmetry"
        mod.bc["bottom"].bc_type = "Symmetry"
        mod.init()
        mod.advance(5)
        return mod, xc, left

    # continuous closure: classic two-layer series profile
    mod, xc, left = build(None)
    q = (T0 - T1) / (1.0 / k1 + 1.0 / k2)
    Ti = T0 - q / k1
    exact = np.where(left, T0 - q / k1 * xc, Ti - q / k2 * (xc - 1.0))
    np.testing.assert_allclose(mod.getTemperature(), exact, atol=1e-8)

    # contact resistance closure (flux LEAVING the R bulk, so the heat
    # entering R from hot L is negative): F_R = (T_R - T_L)/R_c per area
    mod, xc, left = build(
        {"type": "flux", "flux_fn": lambda tl, tr: (tr - tl) / Rc}
    )
    q = (T0 - T1) / (1.0 / k1 + Rc + 1.0 / k2)
    TLi = T0 - q / k1
    TRi = TLi - q * Rc
    exact = np.where(left, T0 - q / k1 * xc, TRi - q / k2 * (xc - 1.0))
    np.testing.assert_allclose(mod.getTemperature(), exact, atol=1e-8)
