"""User-facing sensitivity/UQ API (reference: atypes/tangent_double
recompile, fvmbase/PC.h polynomial chaos — replaced by jvp + vmap).

Flux-driven diffusion has phi(x) = phi0 + q*(L-x)/D ... with a left
Dirichlet value and a right specified flux the solution depends on D, so
d(phi)/dD is analytic: for uniform D, phi = phi0 + q*x/D (flux q INTO the
right boundary traveling -x), hence dphi/dD = -q*x/D^2.
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.vacancy import VacancyModel


def make_flux_driven(D=2.0, q=3.0, nx=12, ny=4):
    dm = fvm.mesh.build_device_mesh(quad_2d(nx, ny, lx=1.0, ly=1.0))
    m = VacancyModel(dm)
    m.options["verbose"] = False
    m.vc["vacancyDiffusivity"] = D
    m.bc["left"].bc_type = "Dirichlet"
    m.bc["left"]["specifiedConcentration"] = 1.0
    m.bc["right"].bc_type = "SpecifiedFlux"
    m.bc["right"]["specifiedVacaFlux"] = q
    m.bc["top"].bc_type = "Symmetry"
    m.bc["bottom"].bc_type = "Symmetry"
    m.init()
    m.advance(5)
    return m, dm


def test_solve_tangent_vs_analytic():
    D, q = 2.0, 3.0
    m, dm = make_flux_driven(D, q)
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    phi = m.get_field()
    np.testing.assert_allclose(phi, 1.0 + q * x / D, atol=1e-9)
    dphi = m.solve_tangent({"D": np.ones(dm.n_interior_cells)})
    np.testing.assert_allclose(dphi, -q * x / D**2, atol=1e-8)


def test_solve_tangent_vs_finite_difference():
    """Spatially varying tangent direction checked against central FD."""
    D, q = 2.0, 3.0
    m, dm = make_flux_driven(D, q)
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    direction = 0.5 + x  # arbitrary non-uniform direction
    dphi = m.solve_tangent({"D": direction})

    eps = 1e-5

    def solve_with(Dfield):
        dm2 = fvm.mesh.build_device_mesh(quad_2d(12, 4, lx=1.0, ly=1.0))
        mm = VacancyModel(dm2)
        mm.options["verbose"] = False
        mm.vc["vacancyDiffusivity"] = Dfield
        mm.bc["left"].bc_type = "Dirichlet"
        mm.bc["left"]["specifiedConcentration"] = 1.0
        mm.bc["right"].bc_type = "SpecifiedFlux"
        mm.bc["right"]["specifiedVacaFlux"] = q
        mm.bc["top"].bc_type = "Symmetry"
        mm.bc["bottom"].bc_type = "Symmetry"
        mm.init()
        mm.advance(20)
        return mm.get_field()

    fp = solve_with(D + eps * direction)
    fmn = solve_with(D - eps * direction)
    fd = (fp - fmn) / (2 * eps)
    np.testing.assert_allclose(dphi, fd, rtol=5e-4, atol=1e-7)


def test_solve_mc_moments():
    """vmapped UQ sweep: for phi = 1 + q x / D the sample mean equals
    1 + q x E[1/D]."""
    q = 3.0
    m, dm = make_flux_driven(2.0, q)
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    rng = np.random.default_rng(0)
    Ds = rng.uniform(1.0, 4.0, size=32)
    sols = m.solve_mc("D", Ds, niter=6)
    assert sols.shape == (32, dm.n_interior_cells)
    for s, Dv in zip(sols[:5], Ds[:5]):
        np.testing.assert_allclose(s, 1.0 + q * x / Dv, atol=1e-6)
    mean = sols.mean(axis=0)
    np.testing.assert_allclose(
        mean, 1.0 + q * x * np.mean(1.0 / Ds), atol=1e-6
    )


def test_solve_tangent_dist_matches_analytic():
    """Distributed sensitivity: per-shard jvp through the implicitly
    differentiated solve under shard_map (the reference rebuilds with the
    Tangent atype under MPI; here the tangent Krylov psums across shards).
    Also regression-covers SpecifiedFlux BCs on partitioned meshes (the
    dist default solver must handle the nonsymmetric ghost rows)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from fvm_tpu.mesh.metrics import compute_geometry
    from fvm_tpu.parallel import Partition

    D, q = 2.0, 3.0
    m0 = quad_2d(12, 4)
    part = Partition(m0, 4)
    m = VacancyModel(part.sharded_mesh, partition=part)
    m.options["verbose"] = False
    m.vc["vacancyDiffusivity"] = D
    m.bc["left"].bc_type = "Dirichlet"
    m.bc["left"]["specifiedConcentration"] = 1.0
    m.bc["right"].bc_type = "SpecifiedFlux"
    m.bc["right"]["specifiedVacaFlux"] = q
    m.bc["top"].bc_type = "Symmetry"
    m.bc["bottom"].bc_type = "Symmetry"
    m.init()
    hist = m.advance(5)
    assert hist[-1][1] < 1e-8

    x = compute_geometry(m0).cell_centroid[: m0.n_interior_cells, 0]
    np.testing.assert_allclose(m.get_field(), 1.0 + q * x / D, atol=1e-9)
    dphi = m.solve_tangent({"D": np.ones(m0.n_interior_cells)})
    np.testing.assert_allclose(dphi, -q * x / D**2, atol=1e-7)

    # UQ sweep: vmapped over samples outside the shard_map'd solve
    sols = m.solve_mc("D", np.array([1.0, 2.0, 4.0]), niter=8)
    for Dv, sol in zip([1.0, 2.0, 4.0], sols):
        np.testing.assert_allclose(sol, 1.0 + q * x / Dv, atol=1e-7)


def test_solve_pc_hermite_projection():
    """Non-intrusive polynomial chaos (the role of fvmbase/PC.h:61):
    for D = 2 + 0.3 xi the PCE mean is exact at the quadrature level and
    the coefficient variance converges to the quadrature variance."""
    q = 3.0
    m, dm = make_flux_driven(2.0, q)
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    pc = m.solve_pc("D", 2.0, [0.3], order=4, quad_points=8, niter=8)
    nodes, weights = np.polynomial.hermite_e.hermegauss(8)
    weights = weights / weights.sum()
    exact = 1.0 + q * x[None, :] / (2.0 + 0.3 * nodes[:, None])
    emean = weights @ exact
    evar = weights @ (exact - emean) ** 2
    np.testing.assert_allclose(pc.mean(), emean, atol=1e-12)
    np.testing.assert_allclose(pc.variance(), evar, rtol=2e-4, atol=1e-12)
    # the order-4 surrogate reproduces the solution at a fresh xi
    s = pc.eval([0.5])
    np.testing.assert_allclose(s, 1.0 + q * x / 2.15, rtol=2e-3)


def test_solve_pc_two_dims():
    """2-D PCE (independent xi_1, xi_2 on disjoint regions): total-degree
    basis mean matches tensor-quadrature of the analytic solution."""
    q = 3.0
    m, dm = make_flux_driven(2.0, q)
    n = dm.n_interior_cells
    x = np.asarray(dm.cell_centroid)[:n, 0]
    left = (x < 0.5).astype(float)
    right = 1.0 - left
    pc = m.solve_pc(
        "D", 2.0, [0.2 * left, 0.2 * right], order=2, quad_points=4, niter=8
    )
    assert pc.mean().shape == (n,)
    assert (pc.variance() > 0).all()
    # each cell sees exactly one random dim: var(phi) on the right half
    # cells depends only on xi_2 -> the (0,k) coefficients carry it
    z = pc.coefficients[(1, 0)]
    z2 = pc.coefficients[(0, 1)]
    # left-half sensitivity lives in xi_1 ... 1/D factors only on the
    # right-half segment of the flux path; both must be finite and the
    # cross term (1,1) small
    cross = pc.coefficients[(1, 1)]
    assert np.abs(cross).max() < 0.05 * max(np.abs(z).max(), np.abs(z2).max())


# --- TangentMixin on the remaining diffusion-family models (the reference
# builds EVERY model with the Tangent atype, models.cpp:10-74) -----------


def test_thermal_solve_tangent_vs_fd():
    """ThermalModel.solve_tangent: d(T)/d(k_cell) against central FD on a
    variable-conductivity slab (Dirichlet-Dirichlet: the field depends on
    k only through its spatial VARIATION)."""
    dm = fvm.mesh.build_device_mesh(quad_2d(24, 8))
    n = dm.n_interior_cells
    from fvm_tpu.models import ThermalModel

    def build(kf):
        t = ThermalModel(dm)
        t.options["verbose"] = False
        t.vc["thermalConductivity"] = kf
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedTemperature"
        t.bc["right"]["specifiedTemperature"] = 300.0
        t.bc["top"].bc_type = "Symmetry"
        t.bc["bottom"].bc_type = "Symmetry"
        t.init()
        t.advance(30)
        return t

    k0 = 1.0 + 0.5 * np.linspace(0, 1, n)
    dk = np.random.default_rng(0).standard_normal(n)
    t = build(k0)
    dT = t.solve_tangent({"k_cell": dk})
    eps = 1e-6
    fd = (
        build(k0 + eps * dk).getTemperature()
        - build(k0 - eps * dk).getTemperature()
    ) / (2 * eps)
    np.testing.assert_allclose(dT, fd, rtol=5e-5, atol=5e-5 * np.abs(fd).max())


def test_thermal_solve_tangent_dist():
    """Thermal tangent under a 4-shard Partition matches single-device."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from fvm_tpu.parallel import Partition
    from fvm_tpu.models import ThermalModel

    m0 = quad_2d(16, 8)
    n = m0.n_interior_cells
    k0 = 1.0 + 0.5 * np.linspace(0, 1, n)
    dk = np.random.default_rng(1).standard_normal(n)

    def build(dmesh, part=None):
        t = ThermalModel(dmesh, partition=part)
        t.options["verbose"] = False
        t.vc["thermalConductivity"] = k0
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedTemperature"
        t.bc["right"]["specifiedTemperature"] = 300.0
        t.bc["top"].bc_type = "Symmetry"
        t.bc["bottom"].bc_type = "Symmetry"
        t.init()
        t.advance(30)
        return t

    single = build(fvm.mesh.build_device_mesh(m0))
    d_single = single.solve_tangent({"k_cell": dk})
    part = Partition(m0, 4)
    dist = build(part.sharded_mesh, part)
    d_dist = dist.solve_tangent({"k_cell": dk})
    np.testing.assert_allclose(d_dist, d_single, rtol=1e-6, atol=1e-9)


def test_electric_solve_tangent_vs_fd():
    """ElectricModel.solve_tangent: d(potential)/d(eps) with space charge
    (uniform charge + graded permittivity) against central FD."""
    from fvm_tpu.models import ElectricModel
    from fvm_tpu.models.electric import EPS0

    dm = fvm.mesh.build_device_mesh(quad_2d(16, 8))
    n = dm.n_interior_cells
    rng = np.random.default_rng(1)

    def build(er):
        m = ElectricModel(dm)
        m.options["verbose"] = False
        m.options["chargetransport_enable"] = False
        m.vc["dielectric_constant"] = er
        m.vc["initialCharge"] = 1e-8
        m.bc["left"].bc_type = "SpecifiedPotential"
        m.bc["left"]["specifiedPotential"] = 1.0
        m.bc["right"].bc_type = "SpecifiedPotential"
        m.bc["right"]["specifiedPotential"] = 0.0
        m.bc["top"].bc_type = "Symmetry"
        m.bc["bottom"].bc_type = "Symmetry"
        m.init()
        m.advance(5)
        return m

    er0 = 2.0 + np.linspace(0, 1, n)
    de = rng.standard_normal(n)
    m = build(er0)
    # params["eps"] = dielectric_constant * EPS0, so the tangent direction
    # in parameter space carries the same factor
    dphi = m.solve_tangent({"eps": de * EPS0})
    eps_fd = 1e-5
    fd = (
        build(er0 + eps_fd * de).getPotential()
        - build(er0 - eps_fd * de).getPotential()
    ) / (2 * eps_fd)
    np.testing.assert_allclose(dphi, fd, rtol=5e-4, atol=1e-5 * np.abs(fd).max())


def test_species_solve_tangent_vs_fd():
    """SpeciesModel.solve_tangent (per species): d(mf0)/d(D0) against FD
    on a flux-driven slab."""
    from fvm_tpu.models import SpeciesModel

    dm = fvm.mesh.build_device_mesh(quad_2d(16, 8))
    n = dm.n_interior_cells
    rng = np.random.default_rng(2)

    def build(D):
        s = SpeciesModel(dm)
        s.options["verbose"] = False
        s.vc["massDiffusivity"] = D
        s.bc["left"].bc_type = "SpecifiedMassFraction"
        s.bc["left"]["specifiedMassFraction"] = 1.0
        s.bc["right"].bc_type = "SpecifiedMassFlux"
        s.bc["right"]["specifiedMassFlux"] = -0.3
        s.bc["top"].bc_type = "Symmetry"
        s.bc["bottom"].bc_type = "Symmetry"
        s.init()
        s.advance(20)
        return s

    D0 = 1.0 + 0.5 * np.linspace(0, 1, n)
    dD = rng.standard_normal(n)
    s = build(D0)
    dmf = s.solve_tangent({"D0": dD})
    fd = (
        build(D0 + 1e-6 * dD).getMassFraction(0)
        - build(D0 - 1e-6 * dD).getMassFraction(0)
    ) / (2e-6)
    np.testing.assert_allclose(dmf, fd, rtol=5e-5, atol=5e-5 * np.abs(fd).max())


def test_solve_adjoint_duality_and_fd():
    """Reverse-mode solve_adjoint (a capability the reference's forward-
    only Tangent atype lacks): the gradient of J = sum(w * phi) w.r.t.
    the whole diffusivity FIELD from one adjoint solve must satisfy the
    tangent-adjoint duality <grad, dir> == <w, solve_tangent(dir)> for
    any direction, and match central finite differences."""
    import jax.numpy as jnp

    D, q = 2.0, 3.0
    m, dm = make_flux_driven(D, q)
    n = dm.n_interior_cells
    x = np.asarray(dm.cell_centroid)[:n, 0]
    w = 1.0 + x

    grad = m.solve_adjoint(lambda phi: jnp.sum(jnp.asarray(w) * phi), ["D"])[
        "D"
    ]
    assert grad.shape == (n,)

    # duality against the (independently FD-verified) forward tangent
    direction = 0.5 + x
    dphi = m.solve_tangent({"D": direction})
    np.testing.assert_allclose(
        float(np.dot(grad, direction)), float(np.dot(w, dphi)), rtol=1e-8
    )

    # uniform-direction analytic check: phi = 1 + q x / D ->
    # dJ/dD . 1 = sum w * (-q x / D^2)
    np.testing.assert_allclose(
        float(grad.sum()), float(np.dot(w, -q * x / D**2)), rtol=1e-8
    )

    # direct FD of the functional along a random direction
    rng = np.random.default_rng(3)
    dk = rng.standard_normal(n)
    eps = 1e-6

    def J_of(Dfield):
        dm2 = fvm.mesh.build_device_mesh(quad_2d(12, 4, lx=1.0, ly=1.0))
        mm = VacancyModel(dm2)
        mm.options["verbose"] = False
        mm.vc["vacancyDiffusivity"] = Dfield
        mm.bc["left"].bc_type = "Dirichlet"
        mm.bc["left"]["specifiedConcentration"] = 1.0
        mm.bc["right"].bc_type = "SpecifiedFlux"
        mm.bc["right"]["specifiedVacaFlux"] = q
        mm.bc["top"].bc_type = "Symmetry"
        mm.bc["bottom"].bc_type = "Symmetry"
        mm.init()
        mm.advance(25)
        return float(np.dot(w, mm.get_field()))

    fd = (J_of(D + eps * dk) - J_of(D - eps * dk)) / (2 * eps)
    np.testing.assert_allclose(float(np.dot(grad, dk)), fd, rtol=1e-4)


def test_thermal_solve_adjoint_duality():
    """solve_adjoint on ThermalModel (AMG-preconditioned solver path):
    adjoint gradient of mean temperature w.r.t. the conductivity field
    agrees with the forward tangent for several directions."""
    import jax.numpy as jnp
    from fvm_tpu.models import ThermalModel

    dm = fvm.mesh.build_device_mesh(quad_2d(24, 8))
    n = dm.n_interior_cells
    t = ThermalModel(dm)
    t.options["verbose"] = False
    t.vc["thermalConductivity"] = 1.0 + 0.5 * np.linspace(0, 1, n)
    t.bc["left"].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = 400.0
    t.bc["right"].bc_type = "SpecifiedHeatFlux"
    t.bc["right"]["specifiedHeatFlux"] = 10.0
    t.bc["top"].bc_type = "Symmetry"
    t.bc["bottom"].bc_type = "Symmetry"
    t.init()
    t.advance(30)

    grad = t.solve_adjoint(lambda T: jnp.mean(T), ["k_cell"])["k_cell"]
    assert grad.shape == (n,)
    rng = np.random.default_rng(5)
    for _ in range(3):
        dk = rng.standard_normal(n)
        dT = t.solve_tangent({"k_cell": dk})
        np.testing.assert_allclose(
            float(np.dot(grad, dk)), float(np.mean(dT)), rtol=1e-6
        )


def test_thermal_solve_adjoint_dist_matches_single():
    """Distributed solve_adjoint: the whole reverse pass (vjp through the
    halo refresh = reversed all_to_all, transposed psum'd Krylov) runs
    under shard_map and must reproduce the single-device adjoint gradient
    field.  The functional is sum-decomposable (J = sum T + sum T^2) as
    the dist contract requires."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from fvm_tpu.parallel import Partition
    from fvm_tpu.models import ThermalModel

    m0 = quad_2d(16, 8)
    n = m0.n_interior_cells
    k0 = 1.0 + 0.5 * np.linspace(0, 1, n)

    def build(dmesh, part=None):
        t = ThermalModel(dmesh, partition=part)
        t.options["verbose"] = False
        t.vc["thermalConductivity"] = k0
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedHeatFlux"
        t.bc["right"]["specifiedHeatFlux"] = 10.0
        t.bc["top"].bc_type = "Symmetry"
        t.bc["bottom"].bc_type = "Symmetry"
        t.init()
        t.advance(30)
        return t

    J = lambda T: jnp.sum(T) + 1e-3 * jnp.sum(T * T)

    single = build(fvm.mesh.build_device_mesh(m0))
    g_single = single.solve_adjoint(J, ["k_cell"])["k_cell"]

    part = Partition(m0, 4)
    dist = build(part.sharded_mesh, part)
    g_dist = dist.solve_adjoint(J, ["k_cell"])["k_cell"]

    assert g_dist.shape == (n,)
    np.testing.assert_allclose(g_dist, g_single, rtol=1e-5, atol=1e-10)

    # duality against the dist forward tangent for a random direction
    rng = np.random.default_rng(7)
    dk = rng.standard_normal(n)
    dT = dist.solve_tangent({"k_cell": dk})
    Tn = dist.getTemperature()
    dJ = float(np.sum(dT) + 1e-3 * 2.0 * np.sum(Tn * dT))
    np.testing.assert_allclose(float(np.dot(g_dist, dk)), dJ, rtol=1e-6)


def test_thermal_solve_adjoint_dist_uneven_partition():
    """Dist adjoint with DEAD padded cells (33 cells / 4 shards): dead
    rows carry identity equations and zero values, and their functional
    cotangents must not pollute the gradient."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from fvm_tpu.parallel import Partition
    from fvm_tpu.models import ThermalModel

    m0 = quad_2d(11, 3)
    n = m0.n_interior_cells
    k0 = 1.0 + 0.5 * np.linspace(0, 1, n)

    def build(dmesh, part=None):
        t = ThermalModel(dmesh, partition=part)
        t.options["verbose"] = False
        t.vc["thermalConductivity"] = k0
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedHeatFlux"
        t.bc["right"]["specifiedHeatFlux"] = 10.0
        t.bc["top"].bc_type = "Symmetry"
        t.bc["bottom"].bc_type = "Symmetry"
        t.init()
        t.advance(30)
        return t

    J = lambda T: jnp.sum(T)
    single = build(fvm.mesh.build_device_mesh(m0))
    g1 = single.solve_adjoint(J, ["k_cell"])["k_cell"]
    part = Partition(m0, 4)
    dist = build(part.sharded_mesh, part)
    gN = dist.solve_adjoint(J, ["k_cell"])["k_cell"]
    np.testing.assert_allclose(gN, g1, rtol=1e-5, atol=1e-10)
