"""Model-wide forward sensitivities (solve_tangent) on the flagship
models: Flow, Structure, Plate, Battery.

The reference instantiates EVERY model with the Tangent atype
(reference: src/fvm/src/modules/fvmbase/models.cpp:10-74,
atypes/tangent_double/atype.h:10) and drives UQ from it
(scripts/Simulator_Cantilever_UQ.py).  Here the same derivatives come
from jax.jvp: JFNK models solve one exact tangent system; the SIMPLE
flow model iterates the jvp of its step map at the converged fixed
point.  Every test is verified against central finite differences or a
closed-form derivative.
"""

import numpy as np
import pytest
import jax

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.flow import FlowModel
from fvm_tpu.models.structure import StructureModel
from fvm_tpu.models.plate import PlateModel
from fvm_tpu.models.battery import BatteryModel
from fvm_tpu.parallel import Partition


# ---------------------------------------------------------------- structure

def _make_structure(E=100.0, nu=0.0, sigma=5.0):
    dm = fvm.mesh.build_device_mesh(quad_2d(10, 4))
    m = StructureModel(dm)
    m.options["verbose"] = False
    m.vc["youngsModulus"] = E
    m.vc["poissonsRatio"] = nu
    m.bc["left"].bc_type = "Symmetry"
    m.bc["right"].bc_type = "SpecifiedTraction"
    m.bc["right"]["specifiedXTraction"] = sigma
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "ZeroTraction"
    m.init()
    m.advance(10)
    return m


def test_structure_tangent_youngs_analytic():
    """Uniaxial patch: u_x = sigma x / E exactly, so
    d(u_x)/dE . 1 = -sigma x / E^2 (chain rule through mu, lam)."""
    E, sigma = 100.0, 5.0
    m = _make_structure(E, 0.0, sigma)
    dm = m.mesh
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    dw = m.solve_tangent({"youngsModulus": 1.0})
    np.testing.assert_allclose(dw[:, 0], -sigma * x / E**2, atol=1e-9)
    np.testing.assert_allclose(dw[:, 1], 0.0, atol=1e-9)


def test_structure_tangent_bc_traction():
    """d(u_x)/d(traction) = x / E exactly on the uniaxial patch."""
    E = 100.0
    m = _make_structure(E, 0.0, 5.0)
    dm = m.mesh
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    dw = m.solve_tangent(bc_tangents={"right:specifiedXTraction": 1.0})
    np.testing.assert_allclose(dw[:, 0], x / E, atol=1e-8)


def test_structure_tangent_poisson_fd():
    """d(u)/d(nu) at nu=0.3 plane strain vs central finite differences."""
    E, nu = 200.0, 0.3
    m = _make_structure(E, nu, 4.0)
    dnu = m.solve_tangent({"poissonsRatio": 1.0})
    eps = 1e-6
    fp = _make_structure(E, nu + eps, 4.0).getDeformation()
    fm = _make_structure(E, nu - eps, 4.0).getDeformation()
    fd = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(dnu, fd, rtol=5e-5, atol=1e-10)


def test_structure_tangent_dist_matches_single():
    """Per-shard exact tangent solve under shard_map (psum Krylov)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    E, sigma = 100.0, 5.0
    single = _make_structure(E, 0.3, sigma)
    dw1 = single.solve_tangent({"youngsModulus": 1.0})

    part = Partition(quad_2d(10, 4), 4)
    m = StructureModel(part.sharded_mesh, partition=part)
    m.options["verbose"] = False
    m.vc["youngsModulus"] = E
    m.vc["poissonsRatio"] = 0.3
    m.bc["left"].bc_type = "Symmetry"
    m.bc["right"].bc_type = "SpecifiedTraction"
    m.bc["right"]["specifiedXTraction"] = sigma
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "ZeroTraction"
    m.init()
    m.advance(10)
    dwN = m.solve_tangent({"youngsModulus": 1.0})
    np.testing.assert_allclose(dwN, dw1, atol=1e-9)


# ------------------------------------------------------------------- plate

def _make_plate(E=1e9, h=0.02, q=100.0):
    dm = fvm.mesh.build_device_mesh(quad_2d(30, 4, lx=1.0, ly=0.2))
    m = PlateModel(dm)
    m.options["verbose"] = False
    m.vc["ym"] = E
    m.vc["nu"] = 0.0
    m.vc["thickness"] = h
    m.vc["pressure"] = q
    m.bc["left"].bc_type = "Clamped"
    m.bc["right"].bc_type = "Free"
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(8)
    return m


def test_plate_tangent_ym_and_load_analytic():
    """The plate solve is linear in q and w ~ 1/E (nu fixed):
    dw/dE = -w/E and dw/dq = w/q, both exact identities."""
    E, q = 1e9, 100.0
    m = _make_plate(E=E, q=q)
    w = m.getDeflection()
    du = m.solve_tangent({"ym": 1.0})
    np.testing.assert_allclose(du[:, 2], -w / E, rtol=1e-8, atol=1e-22)
    duq = m.solve_tangent({"q": 1.0})
    np.testing.assert_allclose(duq[:, 2], w / q, rtol=1e-8, atol=1e-12)


def test_plate_tangent_thickness_fd():
    """d(w)/d(h) (chain rule through D = Eh^3/12 and S = kappa G h)
    vs central finite differences."""
    h = 0.02
    m = _make_plate(h=h)
    du = m.solve_tangent({"thickness": 1.0})
    eps = h * 1e-5
    fp = _make_plate(h=h + eps).getDeflection()
    fm = _make_plate(h=h - eps).getDeflection()
    fd = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(du[:, 2], fd, rtol=1e-5, atol=1e-12)


# ----------------------------------------------------------------- battery

def _build_cell(i0=10.0):
    dm = fvm.mesh.build_device_mesh(quad_2d(30, 2))
    m = BatteryModel(dm)
    m.options["verbose"] = False
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    mat = np.where(x < 1 / 3, 0, np.where(x < 2 / 3, 1, 2)).astype(np.int32)
    m.set_material_regions(mat)
    m.vc["exchangeCurrentDensity"] = i0
    m.bc["left"].bc_type = "SpecifiedPotential"
    m.bc["left"]["specifiedPotential"] = 0.0
    m.bc["right"].bc_type = "SpecifiedPotential"
    m.bc["right"]["specifiedPotential"] = 3.75
    m.bc["bottom"].bc_type = "Symmetry"
    m.bc["top"].bc_type = "Symmetry"
    m.init()
    m.advance(25)
    return m


def test_battery_tangent_i0_fd():
    """d(phi)/d(i0) through the Butler-Volmer closure vs central FD
    (the reference hand-codes these derivatives in
    BatteryPCLinearizeInterface_BV.h; here jax.jvp supplies them)."""
    m = _build_cell()
    dphi = m.solve_tangent({"i0": 1.0})
    eps = 1e-3
    fd = (
        _build_cell(10.0 + eps).getPotential()
        - _build_cell(10.0 - eps).getPotential()
    ) / (2 * eps)
    np.testing.assert_allclose(dphi, fd, rtol=1e-4, atol=1e-10)


def test_battery_tangent_sigma_fd():
    """d(phi)/d(conductivity) (uniform direction) vs central FD."""
    m = _build_cell()
    dphi = m.solve_tangent({"sigma": 1.0})

    def solve(ds):
        dm = fvm.mesh.build_device_mesh(quad_2d(30, 2))
        mm = BatteryModel(dm)
        mm.options["verbose"] = False
        x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
        mat = np.where(x < 1 / 3, 0, np.where(x < 2 / 3, 1, 2)).astype(
            np.int32
        )
        mm.set_material_regions(mat)
        mm.bc["left"].bc_type = "SpecifiedPotential"
        mm.bc["left"]["specifiedPotential"] = 0.0
        mm.bc["right"].bc_type = "SpecifiedPotential"
        mm.bc["right"]["specifiedPotential"] = 3.75
        mm.bc["bottom"].bc_type = "Symmetry"
        mm.bc["top"].bc_type = "Symmetry"
        mm.init()
        mm.params["sigma"] = mm.params["sigma"] + ds
        mm.advance(25)
        return mm.getPotential()

    eps = 1e-3
    fd = (solve(eps) - solve(-eps)) / (2 * eps)
    np.testing.assert_allclose(dphi, fd, rtol=1e-4, atol=1e-12)


# -------------------------------------------------------------------- flow

def _make_cavity(visc=0.05, lid=1.0, nit=200, part=None):
    if part is None:
        m = FlowModel(fvm.mesh.build_device_mesh(quad_2d(16, 16)))
    else:
        m = FlowModel(part.sharded_mesh, partition=part)
    m.options["verbose"] = False
    m.vc["viscosity"] = visc
    for side in ("left", "right", "bottom", "top"):
        m.bc[side].bc_type = "NoSlipWall"
    m.bc["top"]["specifiedXVelocity"] = lid
    m.init()
    m.advance(nit)
    return m


def test_flow_tangent_viscosity_fd():
    """d(V)/d(mu) on the Re=20 cavity: tangent fixed-point iteration of
    the jvp'd SIMPLE step vs central finite differences."""
    mu = 0.05
    m = _make_cavity(mu)
    ds = m.solve_tangent({"mu": 1.0}, niter=120)
    eps = 1e-4
    fp = _make_cavity(mu + eps)
    fm = _make_cavity(mu - eps)
    fdV = (fp.getVelocity() - fm.getVelocity()) / (2 * eps)
    scale = np.abs(fdV).max()
    assert np.abs(ds["velocity"] - fdV).max() < 6e-3 * scale
    fdp = (fp.getPressure() - fm.getPressure()) / (2 * eps)
    assert np.abs(ds["pressure"] - fdp).max() < 2e-2 * np.abs(fdp).max()


def test_flow_tangent_lid_velocity_fd():
    """d(V)/d(lid velocity) via bc_tangents vs central FD."""
    m = _make_cavity()
    ds = m.solve_tangent(
        bc_tangents={"top:specifiedXVelocity": 1.0}, niter=120
    )
    eps = 1e-4
    fp = _make_cavity(lid=1.0 + eps)
    fm = _make_cavity(lid=1.0 - eps)
    fdV = (fp.getVelocity() - fm.getVelocity()) / (2 * eps)
    assert np.abs(ds["velocity"] - fdV).max() < 5e-3 * np.abs(fdV).max()


def test_flow_tangent_force_fd():
    """d(lid force)/d(mu): chain rule of getMomentumFluxIntegral through
    the state tangent, vs central FD of the force itself."""
    mu = 0.05
    m = _make_cavity(mu)
    dF = m.solve_tangent_force("top", {"mu": 1.0}, niter=120)
    eps = 1e-4
    fp = _make_cavity(mu + eps)
    fm = _make_cavity(mu - eps)
    fdF = (
        fp.getMomentumFluxIntegral("top") - fm.getMomentumFluxIntegral("top")
    ) / (2 * eps)
    np.testing.assert_allclose(dF, fdF, rtol=5e-3, atol=1e-10)


def test_flow_tangent_dist_matches_single():
    """Distributed tangent (shard_map + psum'd implicit Krylov inside the
    jvp'd step) matches the single-device tangent."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    m1 = _make_cavity(nit=120)
    ds1 = m1.solve_tangent({"mu": 1.0}, niter=80)

    part = Partition(quad_2d(16, 16), 4)
    mN = _make_cavity(nit=120, part=part)
    dsN = mN.solve_tangent({"mu": 1.0}, niter=80)
    scale = np.abs(ds1["velocity"]).max()
    assert np.abs(dsN["velocity"] - ds1["velocity"]).max() < 5e-3 * scale


def test_structure_solve_adjoint_duality_and_analytic():
    """Reverse-mode solve_adjoint on the JFNK structure solve (the
    reference's Tangent atype is forward-only): gradients of the mean
    x-deflection w.r.t. the Young's-modulus FIELD and the traction BC
    satisfy tangent-adjoint duality and the uniaxial closed form."""
    import jax.numpy as jnp

    E, sigma = 100.0, 5.0
    m = _make_structure(E, 0.3, sigma)
    dm = m.mesh
    n = dm.n_interior_cells
    x = np.asarray(dm.cell_centroid)[:n, 0]

    grads = m.solve_adjoint(
        lambda w: jnp.mean(w[:, 0]),
        param_keys=("youngsModulus",),
        bc_keys=("right:specifiedXTraction",),
    )
    gE = grads["youngsModulus"]
    gT = grads["right:specifiedXTraction"]
    assert gE.shape == (n,)

    # duality against the FD-verified forward tangent, several directions
    rng = np.random.default_rng(7)
    for _ in range(2):
        dE = rng.standard_normal(n)
        dw = m.solve_tangent({"youngsModulus": dE})
        np.testing.assert_allclose(
            float(np.dot(gE, dE)), float(np.mean(dw[:, 0])), rtol=1e-4
        )

    # uniform direction: plane strain u_x = sigma x (1-nu^2) / E ->
    # dJ/dE.1 = -(1-nu^2) mean(sigma x)/E^2
    fac = 1.0 - 0.3**2
    np.testing.assert_allclose(
        float(gE.sum()), -fac * sigma * x.mean() / E**2, rtol=1e-4
    )
    # traction: dJ/dT summed over the face group = (1-nu^2) mean(x)/E
    np.testing.assert_allclose(
        float(np.sum(gT)), fac * x.mean() / E, rtol=1e-4
    )


def test_flow_solve_adjoint_force_duality():
    """Reverse-mode drag gradients on the cavity: one adjoint sweep gives
    d(lid x-force)/d(mu field) and d/d(lid velocity); both must satisfy
    duality with the FD-verified forward tangent."""
    mu = 0.05
    m = _make_cavity(mu)
    n = m.mesh.n_interior_cells
    grads = m.solve_adjoint_force(
        "top", param_keys=("mu",),
        bc_keys=("top:specifiedXVelocity",), niter=120,
    )
    gmu = grads["mu"]
    glid = grads["top:specifiedXVelocity"]
    assert gmu.shape == (n,)

    # duality vs forward tangent: uniform + random mu directions
    dF_uniform = m.solve_tangent_force("top", {"mu": 1.0}, niter=120)
    np.testing.assert_allclose(
        float(gmu.sum()), dF_uniform[0], rtol=2e-3
    )
    rng = np.random.default_rng(11)
    dmu = rng.standard_normal(n)
    dF_rand = m.solve_tangent_force("top", {"mu": dmu}, niter=120)
    np.testing.assert_allclose(
        float(np.dot(gmu, dmu)), dF_rand[0], rtol=2e-3
    )

    # lid-velocity gradient vs forward BC tangent
    dF_lid = m.solve_tangent_force(
        "top", bc_tangents={"top:specifiedXVelocity": 1.0}, niter=120
    )
    np.testing.assert_allclose(float(glid.sum()), dF_lid[0], rtol=2e-3)


def test_plate_solve_adjoint_duality():
    """Reverse-mode solve_adjoint on the Mindlin plate: gradients of the
    mean deflection w.r.t. the Young's-modulus and load FIELDS satisfy
    duality with the (analytically verified) forward tangent."""
    import jax.numpy as jnp

    m = _make_plate()
    n = m.mesh.n_interior_cells
    grads = m.solve_adjoint(
        lambda u: jnp.mean(u[:, 2]), param_keys=("ym", "q")
    )
    assert grads["ym"].shape == (n,)
    du_E = m.solve_tangent({"ym": 1.0})
    np.testing.assert_allclose(
        float(grads["ym"].sum()), float(np.mean(du_E[:, 2])), rtol=1e-4
    )
    du_q = m.solve_tangent({"q": 1.0})
    np.testing.assert_allclose(
        float(grads["q"].sum()), float(np.mean(du_q[:, 2])), rtol=1e-4
    )


def test_battery_solve_adjoint_duality():
    """Reverse-mode solve_adjoint on the Butler-Volmer-coupled battery:
    gradients of the mean potential w.r.t. the conductivity field and
    the i0 scalar satisfy duality with the FD-verified forward tangent."""
    import jax.numpy as jnp

    m = _build_cell()
    n = m.mesh.n_interior_cells
    rng = np.random.default_rng(13)
    # random-weighted functional (mean(phi) is degenerate on this
    # symmetric three-region cell: tangents cancel to round-off)
    w = jnp.asarray(rng.standard_normal(n))
    grads = m.solve_adjoint(
        lambda phi: jnp.sum(w * phi), param_keys=("sigma", "i0")
    )
    assert grads["sigma"].shape == (n,)
    assert isinstance(grads["i0"], float)

    for _ in range(2):
        ds = rng.standard_normal(n)
        dphi = m.solve_tangent({"sigma": ds})
        np.testing.assert_allclose(
            float(np.dot(grads["sigma"], ds)),
            float(np.dot(np.asarray(w), dphi)), rtol=1e-4,
        )
    dphi_i0 = m.solve_tangent({"i0": 1.0})
    np.testing.assert_allclose(
        grads["i0"], float(np.dot(np.asarray(w), dphi_i0)), rtol=1e-4
    )


def test_structure_solve_adjoint_dist_matches_single():
    """Distributed JFNK adjoint (reversed halo exchange inside vjp(R),
    psum'd transposed-Jacobian Krylov, owner-folded parameter/BC
    cotangents) matches the single-device adjoint gradients."""
    import jax.numpy as jnp
    from fvm_tpu.models import StructureModel

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    m0 = quad_2d(10, 4)
    n = m0.n_interior_cells
    E, sigma = 100.0, 5.0

    def build(dmesh, part=None):
        m = StructureModel(dmesh, partition=part)
        m.options["verbose"] = False
        m.vc["youngsModulus"] = E
        m.vc["poissonsRatio"] = 0.3
        m.bc["left"].bc_type = "Symmetry"
        m.bc["right"].bc_type = "SpecifiedTraction"
        m.bc["right"]["specifiedXTraction"] = sigma
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "ZeroTraction"
        m.init()
        m.advance(10)
        return m

    J = lambda w: jnp.sum(w[:, 0])

    single = build(fvm.mesh.build_device_mesh(m0))
    g1 = single.solve_adjoint(
        J, param_keys=("youngsModulus",),
        bc_keys=("right:specifiedXTraction",),
    )

    part = Partition(m0, 4)
    dist = build(part.sharded_mesh, part)
    gN = dist.solve_adjoint(
        J, param_keys=("youngsModulus",),
        bc_keys=("right:specifiedXTraction",),
    )

    assert gN["youngsModulus"].shape == (n,)
    np.testing.assert_allclose(
        gN["youngsModulus"], g1["youngsModulus"], rtol=1e-5, atol=1e-12
    )
    np.testing.assert_allclose(
        np.sort(gN["right:specifiedXTraction"]),
        np.sort(g1["right:specifiedXTraction"]),
        rtol=1e-5, atol=1e-12,
    )

    # duality against the dist forward tangent
    rng = np.random.default_rng(11)
    dE = rng.standard_normal(n)
    dw = dist.solve_tangent({"youngsModulus": dE})
    np.testing.assert_allclose(
        float(np.dot(gN["youngsModulus"], dE)),
        float(np.sum(dw[:, 0])), rtol=1e-4,
    )


def test_plate_solve_adjoint_dist_matches_single():
    """Distributed Mindlin-plate adjoint matches single-device for
    field (ym, q) gradients."""
    import jax.numpy as jnp
    from fvm_tpu.models import PlateModel

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    m0 = quad_2d(30, 4, lx=1.0, ly=0.2)
    n = m0.n_interior_cells

    def build(dmesh, part=None):
        m = PlateModel(dmesh, partition=part)
        m.options["verbose"] = False
        m.vc["ym"] = 1e9
        m.vc["nu"] = 0.0
        m.vc["thickness"] = 0.02
        m.vc["pressure"] = 100.0
        m.bc["left"].bc_type = "Clamped"
        m.bc["right"].bc_type = "Free"
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        m.advance(8)
        return m

    J = lambda u: jnp.sum(u[:, 2])

    single = build(fvm.mesh.build_device_mesh(m0))
    g1 = single.solve_adjoint(J, param_keys=("ym", "q"))
    part = Partition(m0, 4)
    dist = build(part.sharded_mesh, part)
    gN = dist.solve_adjoint(J, param_keys=("ym", "q"))

    scale = np.abs(g1["ym"]).max()
    assert np.abs(gN["ym"] - g1["ym"]).max() < 1e-5 * scale
    scale_q = np.abs(g1["q"]).max()
    assert np.abs(gN["q"] - g1["q"]).max() < 1e-5 * scale_q


def test_flow_solve_adjoint_dist_matches_single():
    """Distributed flow adjoint: the reverse SIMPLE fixed point runs per
    shard (vjp of every halo refresh = reversed all_to_all; transposed
    psum'd Krylov inside custom_linear_solve) and must match the
    single-device drag gradients."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    m1 = _make_cavity(nit=150)
    g1 = m1.solve_adjoint_force(
        "top", param_keys=("mu",),
        bc_keys=("top:specifiedXVelocity",), niter=100,
    )
    part = Partition(quad_2d(16, 16), 4)
    mN = _make_cavity(nit=150, part=part)
    gN = mN.solve_adjoint_force(
        "top", param_keys=("mu",),
        bc_keys=("top:specifiedXVelocity",), niter=100,
    )
    scale = np.abs(g1["mu"]).max()
    assert np.abs(gN["mu"] - g1["mu"]).max() < 5e-3 * scale
    np.testing.assert_allclose(
        float(np.sum(gN["top:specifiedXVelocity"])),
        float(np.sum(g1["top:specifiedXVelocity"])),
        rtol=5e-3,
    )


def test_battery_solve_adjoint_dist_matches_single():
    """Distributed battery adjoint (transposed BV-coupled Newton solve
    under shard_map): field (sigma) and scalar (i0) gradients match the
    single-device adjoint; scalar gradients sum per-shard parts."""
    import jax.numpy as jnp
    from fvm_tpu.models.battery import BatteryModel

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")

    m0 = quad_2d(30, 2)
    n = m0.n_interior_cells
    from fvm_tpu.mesh.metrics import compute_geometry

    x = compute_geometry(m0).cell_centroid[:n, 0]
    mat = np.where(x < 1 / 3, 0, np.where(x < 2 / 3, 1, 2)).astype(np.int32)
    rng = np.random.default_rng(17)
    w = rng.standard_normal(n)

    def build(dmesh, part=None):
        m = BatteryModel(dmesh, partition=part)
        m.options["verbose"] = False
        m.set_material_regions(mat)
        m.vc["openCircuitVoltage"] = (0.1, 0.0, 3.8)
        m.vc["conductivity"] = (100.0, 1.0, 100.0)
        m.vc["exchangeCurrentDensity"] = 10.0
        m.bc["left"].bc_type = "SpecifiedPotential"
        m.bc["left"]["specifiedPotential"] = 0.0
        m.bc["right"].bc_type = "SpecifiedPotential"
        m.bc["right"]["specifiedPotential"] = 3.75
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        m.advance(25)
        return m

    # weighted sum with a GLOBAL weight field is not shard-local; use a
    # sum-decomposable functional of the local values instead
    J = lambda phi: jnp.sum(phi * phi)

    single = build(fvm.mesh.build_device_mesh(m0))
    g1 = single.solve_adjoint(J, param_keys=("sigma", "i0"))
    part = Partition(m0, 2)
    dist = build(part.sharded_mesh, part)
    gN = dist.solve_adjoint(J, param_keys=("sigma", "i0"))

    scale = np.abs(g1["sigma"]).max()
    assert np.abs(gN["sigma"] - g1["sigma"]).max() < 1e-6 * scale
    np.testing.assert_allclose(gN["i0"], g1["i0"], rtol=1e-6)

    # duality against the dist forward tangent
    ds = rng.standard_normal(n)
    dphi = dist.solve_tangent({"sigma": ds})
    phiN = dist.getPotential()
    np.testing.assert_allclose(
        float(np.dot(gN["sigma"], ds)),
        float(2.0 * np.dot(phiN, dphi)),
        rtol=1e-5,
    )
