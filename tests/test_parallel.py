"""Multi-device (shard_map) tests on a virtual 8-device CPU mesh.

Plays the role of the reference's mpirun-based ptest suites
(reference: src/fvm/test/AMG_MERGING_THERMAL/ptest.py, PARALLEL_CAVITY_*):
the same problem solved on 1 and N devices must agree to solver tolerance.
"""

import numpy as np
import pytest
import jax

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.mesh.metrics import compute_geometry
from fvm_tpu.parallel import Partition
from fvm_tpu.models import ThermalModel
from fvm_tpu.models.flow import FlowModel

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 virtual devices"
)


def test_partition_roundtrip():
    mesh = quad_2d(16, 16)
    part = Partition(mesh, 4)
    vals = np.arange(mesh.n_cells, dtype=float)
    stacked = part.scatter_cells(vals)
    back = part.gather_cells(stacked)
    np.testing.assert_array_equal(back, vals[: mesh.n_interior_cells])


def test_partition_geometry_consistency():
    mesh = quad_2d(8, 8)
    geom = compute_geometry(mesh)
    part = Partition(mesh, 4, geom=geom)
    sm = part.sharded_mesh
    # total owned interior volume across shards == global volume
    vols = np.asarray(sm.cell_volume)
    total = 0.0
    for d in range(4):
        oi = part._own_int[d]
        total += vols[d][part.g2l[d, oi]].sum()
    assert total == pytest.approx(geom.cell_volume[: mesh.n_interior_cells].sum(), rel=1e-12)


def _setup_thermal(model):
    model.options["verbose"] = False
    model.bc["left"].bc_type = "SpecifiedTemperature"
    model.bc["left"]["specifiedTemperature"] = 400.0
    model.bc["right"].bc_type = "Convective"
    model.bc["right"]["heatTransferCoefficient"] = 5.0
    model.bc["right"]["farFieldTemperature"] = 300.0
    model.bc["bottom"].bc_type = "Symmetry"
    model.bc["top"].bc_type = "SpecifiedHeatFlux"
    model.bc["top"]["specifiedHeatFlux"] = 2.0
    model.init()


@pytest.mark.parametrize("n_shards", [2, 8])
def test_thermal_matches_single_device(n_shards):
    mesh = quad_2d(16, 12)

    single = ThermalModel(fvm.mesh.build_device_mesh(mesh))
    _setup_thermal(single)
    single.advance(10)
    T1 = single.getTemperature()

    part = Partition(quad_2d(16, 12), n_shards)
    dist = ThermalModel(part.sharded_mesh, partition=part)
    _setup_thermal(dist)
    hist = dist.advance(10)
    TN = dist.getTemperature()

    np.testing.assert_allclose(TN, T1, rtol=1e-7, atol=1e-6)
    assert hist[-1][1] / hist[0][1] < 1e-7


def test_flow_cavity_matches_single_device():
    n = 16
    mesh = quad_2d(n, n)

    def setup(m):
        m.options["verbose"] = False
        m.vc["viscosity"] = 0.05
        for side in ("left", "right", "bottom", "top"):
            m.bc[side].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.init()

    single = FlowModel(fvm.mesh.build_device_mesh(mesh))
    setup(single)
    single.advance(60)
    V1 = single.getVelocity()

    part = Partition(quad_2d(n, n), 4)
    dist = FlowModel(part.sharded_mesh, partition=part)
    setup(dist)
    dist.advance(60)
    VN = dist.getVelocity()

    # same algorithm, same iteration count; inner-solver tolerances allow
    # small drift between the two paths
    np.testing.assert_allclose(VN, V1, atol=5e-4)


def test_species_matches_single_device():
    from fvm_tpu.models import SpeciesModel

    mesh = quad_2d(12, 12)

    def setup(m):
        m.options["verbose"] = False
        m.bc["left"].bc_type = "SpecifiedMassFraction"
        m.bc["left"]["specifiedMassFraction"] = 1.0
        m.bc["right"].bc_type = "SpecifiedMassFraction"
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()

    single = SpeciesModel(fvm.mesh.build_device_mesh(mesh))
    setup(single)
    single.advance(8)

    part = Partition(quad_2d(12, 12), 4)
    dist = SpeciesModel(part.sharded_mesh, partition=part)
    setup(dist)
    dist.advance(8)
    np.testing.assert_allclose(
        dist.getMassFraction(0), single.getMassFraction(0), atol=1e-7
    )


def test_electric_matches_single_device():
    from fvm_tpu.models import ElectricModel

    mesh = quad_2d(10, 10)

    def setup(m):
        m.options["verbose"] = False
        m.bc["left"].bc_type = "SpecifiedPotential"
        m.bc["left"]["specifiedPotential"] = 100.0
        m.bc["right"].bc_type = "SpecifiedPotential"
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()

    single = ElectricModel(fvm.mesh.build_device_mesh(mesh))
    setup(single)
    single.advance(6)

    part = Partition(quad_2d(10, 10), 4)
    dist = ElectricModel(part.sharded_mesh, partition=part)
    setup(dist)
    dist.advance(6)
    np.testing.assert_allclose(dist.getPotential(), single.getPotential(), atol=1e-5)


def test_adaptive_timestep_controller():
    from fvm_tpu.core.timestep import TimeStepController
    from fvm_tpu.models import ThermalModel

    dm = fvm.mesh.build_device_mesh(quad_2d(8, 8))
    m = ThermalModel(dm)
    m.options["verbose"] = False
    m.options["transient"] = True
    m.vc["initialTemperature"] = 400.0
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "Convective"
        m.bc[s]["heatTransferCoefficient"] = 1.0
        m.bc[s]["farFieldTemperature"] = 300.0
    m.init()
    tc = TimeStepController(dt0=0.01, target_iterations=6)
    dts = []
    for _ in range(4):
        tc.step_model(m, max_outer=20)
        dts.append(tc.dt)
    # quickly-converging steps should let dt grow
    assert dts[-1] > 0.01


def test_structure_matches_single_device():
    """JFNK elasticity on 2 shards vs single device (block system +
    matrix-free Newton over the halo)."""
    from fvm_tpu.models.structure import StructureModel

    mesh = quad_2d(12, 6, lx=2.0, ly=1.0)

    def setup(m):
        m.options["verbose"] = False
        m.vc["youngsModulus"] = 10.0
        m.vc["poissonsRatio"] = 0.3
        m.bc["left"].bc_type = "SpecifiedDeformation"
        m.bc["right"].bc_type = "SpecifiedTraction"
        m.bc["right"]["specifiedYTraction"] = 0.05
        m.bc["bottom"].bc_type = "ZeroTraction"
        m.bc["top"].bc_type = "ZeroTraction"
        m.init()

    single = StructureModel(fvm.mesh.build_device_mesh(mesh))
    setup(single)
    single.advance(8)
    w1 = single.getDeformation()

    part = Partition(quad_2d(12, 6, lx=2.0, ly=1.0), 2)
    dist = StructureModel(part.sharded_mesh, partition=part)
    setup(dist)
    hist = dist.advance(8)
    wN = dist.getDeformation()

    np.testing.assert_allclose(wN, w1, atol=1e-6 * np.abs(w1).max())
    assert hist[-1][1] / hist[0][1] < 1e-6


def test_plate_matches_single_device():
    """Mindlin plate on 2 shards vs single device."""
    from fvm_tpu.models.plate import PlateModel

    def mk():
        return quad_2d(12, 4, lx=3.0, ly=1.0)

    def setup(m):
        m.options["verbose"] = False
        m.vc["ym"] = 1e6
        m.vc["nu"] = 0.3
        m.vc["thickness"] = 0.1
        m.vc["pressure"] = -1.0
        m.bc["left"].bc_type = "Clamped"
        m.bc["right"].bc_type = "Clamped"
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()

    single = PlateModel(fvm.mesh.build_device_mesh(mk()))
    setup(single)
    single.advance(8)
    w1 = single.getDeflection()

    part = Partition(mk(), 2)
    dist = PlateModel(part.sharded_mesh, partition=part)
    setup(dist)
    hist = dist.advance(8)
    wN = dist.getDeflection()

    np.testing.assert_allclose(wN, w1, atol=1e-6 * np.abs(w1).max())
    assert hist[-1][1] / hist[0][1] < 1e-6


def test_kinetic_matches_single_device():
    """ES-BGK Couette on 2 shards vs single device (batched (nc, N)
    distribution through halo exchange + psum'd Krylov)."""
    from fvm_tpu.kinetic import KineticModel, Quadrature

    def mk():
        return quad_2d(3, 16)

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

    single = KineticModel(fvm.mesh.build_device_mesh(mk()), Quadrature(6, 6, 4))
    setup(single)
    single.advance(15)
    r1, u1, T1 = single.moments()
    r1 = np.asarray(r1[: single.mesh.n_interior_cells])
    u1 = np.asarray(u1[: single.mesh.n_interior_cells])

    part = Partition(mk(), 2)
    dist = KineticModel(part.sharded_mesh, Quadrature(6, 6, 4), partition=part)
    setup(dist)
    hist = dist.advance(15)
    rN, uN, TN = dist.moments()

    # COMET Newton steps amplify f64 rounding differently across
    # partitions; 1e-6 still pins the same converged state
    np.testing.assert_allclose(np.asarray(rN), r1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(uN), u1, atol=1e-6)
    assert hist[-1][1] < hist[0][1]


def test_phonon_matches_single_device():
    """Gray phonon BTE on 2 shards vs single device."""
    from fvm_tpu.kinetic.phonon import PhononModel

    def mk():
        return quad_2d(3, 12)

    def setup(m):
        m.options["verbose"] = False
        m.vc["relaxationTime"] = 0.05
        m.bc["bottom"].bc_type = "Isothermal"
        m.bc["bottom"]["specifiedTemperature"] = 320.0
        m.bc["top"].bc_type = "Isothermal"
        m.bc["top"]["specifiedTemperature"] = 300.0
        m.bc["left"].bc_type = "Symmetry"
        m.bc["right"].bc_type = "Symmetry"
        m.init()

    single = PhononModel(fvm.mesh.build_device_mesh(mk()), 4, 8)
    setup(single)
    single.advance(25)
    T1 = single.getTemperature()

    part = Partition(mk(), 2)
    dist = PhononModel(part.sharded_mesh, 4, 8, partition=part)
    setup(dist)
    hist = dist.advance(25)
    TN = dist.getTemperature()

    np.testing.assert_allclose(TN, T1, atol=1e-7)
    assert hist[-1][1] < hist[0][1]


def test_battery_matches_single_device():
    """Butler-Volmer sandwich cell on 2 shards vs single device (interface
    detection through halo materials, psum'd JFNK)."""
    from fvm_tpu.models.battery import BatteryModel

    def setup(m, dm_or_part, dist):
        m.options["verbose"] = False
        if dist:
            cc = np.asarray(dm_or_part.geom.cell_centroid)
            n_int = dm_or_part.mesh.n_interior_cells
        else:
            cc = np.asarray(dm_or_part.cell_centroid)
            n_int = dm_or_part.n_interior_cells
        x = cc[:n_int, 0]
        mat = np.where(x < 1 / 3, 0, np.where(x < 2 / 3, 1, 2)).astype(np.int32)
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

    dm = fvm.mesh.build_device_mesh(quad_2d(30, 2))
    single = BatteryModel(dm)
    setup(single, dm, dist=False)
    single.advance(25)
    p1 = single.getPotential()
    i1 = single.getCurrentIntegral("right")

    part = Partition(quad_2d(30, 2), 2)
    dist = BatteryModel(part.sharded_mesh, partition=part)
    setup(dist, part, dist=True)
    hist = dist.advance(25)
    pN = dist.getPotential()
    iN = dist.getCurrentIntegral("right")

    np.testing.assert_allclose(pN, p1, atol=1e-6)
    assert iN == pytest.approx(i1, rel=1e-6)
    assert hist[-1][1] / hist[0][1] < 1e-6
    q1 = single.get_heat_source()
    qN = dist.get_heat_source()
    np.testing.assert_allclose(qN, q1, atol=1e-6 * max(abs(q1).max(), 1.0))


def test_dist_amg_thermal_matches_single():
    """Distributed AMG (shard-local additive-Schwarz cycles inside a
    psum-reduced Krylov solve) reproduces the single-device solution."""
    import numpy as np
    import fvm_tpu as fvm
    from fvm_tpu.parallel import Partition
    from fvm_tpu.models import ThermalModel
    from fvm_tpu.linear import AMG, BiCGStab

    def run(dist):
        mesh = fvm.mesh.generate.quad_2d(32, 32)
        if dist:
            part = Partition(mesh, 8)
            t = ThermalModel(part.sharded_mesh, partition=part)
        else:
            t = ThermalModel(fvm.mesh.build_device_mesh(mesh))
        t.options["verbose"] = False
        t.options["linearSolver"] = BiCGStab(
            preconditioner=AMG(coarse_size=16),
            relative_tolerance=1e-11, max_iterations=80,
        )
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedTemperature"
        t.bc["right"]["specifiedTemperature"] = 300.0
        t.bc["bottom"].bc_type = "Symmetry"
        t.bc["top"].bc_type = "Symmetry"
        t.init()
        t.advance(2)
        if dist:
            return np.asarray(t.partition.gather_cells(t.state["T"]))
        return np.asarray(t.state["T"])[: t.mesh.n_interior_cells]

    T1 = run(False)
    T8 = run(True)
    assert np.abs(T8 - T1).max() < 1e-3


def test_dist_solve_forced_compdot_equilibrate(monkeypatch):
    """Forcing the emulated-f64 comp paths (FVM_TPU_COMPDOT=1) on the
    8-shard mesh exercises the DIST pow2_equilibrate branch (pmax scale
    agreement across shards inside shard_map) plus the psum'd
    compensated dots; the solution must match the unforced dist
    solve."""
    import numpy as np
    import fvm_tpu as fvm
    from fvm_tpu.ops import compdot
    from fvm_tpu.parallel import Partition
    from fvm_tpu.models import ThermalModel
    from fvm_tpu.linear import BiCGStab, JacobiSolver

    def run():
        mesh = fvm.mesh.generate.quad_2d(24, 24)
        part = Partition(mesh, 8)
        t = ThermalModel(part.sharded_mesh, partition=part)
        t.options["verbose"] = False
        t.options["linearSolver"] = BiCGStab(
            preconditioner=JacobiSolver(sweeps=2),
            relative_tolerance=1e-11, max_iterations=200,
        )
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedTemperature"
        t.bc["right"]["specifiedTemperature"] = 300.0
        t.bc["bottom"].bc_type = "Symmetry"
        t.bc["top"].bc_type = "Symmetry"
        t.init()
        t.advance(2)
        return np.asarray(t.partition.gather_cells(t.state["T"]))

    def clear():
        compdot.enabled.cache_clear()
        compdot.mv_enabled.cache_clear()
        compdot.vec_enabled.cache_clear()

    T_plain = run()
    monkeypatch.setenv("FVM_TPU_COMPDOT", "1")
    clear()
    try:
        T_comp = run()
    finally:
        monkeypatch.setenv("FVM_TPU_COMPDOT", "0")
        clear()
    assert np.abs(T_comp - T_plain).max() < 1e-8 * np.abs(T_plain).max()


def test_dist_amg_flow_default():
    """The dist FlowModel default pressure solver picks shard-local AMG on
    regular structured partitions and converges."""
    import numpy as np
    import fvm_tpu as fvm
    from fvm_tpu.parallel import Partition
    from fvm_tpu.models.flow import FlowModel
    from fvm_tpu.linear import AMG

    mesh = fvm.mesh.generate.quad_2d(16, 16)
    part = Partition(mesh, 8)
    f = FlowModel(part.sharded_mesh, partition=part)
    f.options["verbose"] = False
    f.vc["viscosity"] = 0.01
    for s in ("left", "right", "bottom", "top"):
        f.bc[s].bc_type = "NoSlipWall"
    f.bc["top"]["specifiedXVelocity"] = 1.0
    f.init()
    pres = f.options["pressureLinearSolver"]
    assert isinstance(pres.preconditioner, AMG)
    assert pres.preconditioner._dist_setup is not None
    hist = f.advance(8)
    assert hist[-1][1] < hist[0][1]  # momentum residual falls
    v = np.asarray(f.partition.gather_cells(f.state["velocity"]))
    assert np.isfinite(v).all() and np.abs(v).max() <= 1.2


def test_sou_convection_seam_order_preservation():
    """Second-order-upwind convection at partition seams must match the
    single-device result exactly: the SOU reconstruction uses halo-synced
    gradients whose halo copies equal the owning shard's full-stencil
    values — the role of the reference's two-deep (cellCells2) halos
    (StorageSite.h:68-77, Mesh.h:176)."""
    from fvm_tpu.models import ThermalModel

    def setup(m):
        m.options["verbose"] = False
        m.options["convective"] = True
        m.options["convectionScheme"] = "sou"
        m.bc["left"].bc_type = "SpecifiedTemperature"
        m.bc["left"]["specifiedTemperature"] = 400.0
        m.bc["right"].bc_type = "SpecifiedTemperature"
        m.bc["right"]["specifiedTemperature"] = 300.0
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        # uniform convecting mass flux in +x: SOU reconstruction active
        mesh = m.mesh
        if m._dist:
            ax = np.asarray(mesh.face_area)[..., 0]
            m.state["massFlux"] = jax.numpy.asarray(2.0 * ax)
        else:
            ax = np.asarray(mesh.face_area)[:, 0]
            m.state["massFlux"] = jax.numpy.asarray(2.0 * ax)

    mesh = quad_2d(24, 8)
    single = ThermalModel(fvm.mesh.build_device_mesh(mesh))
    setup(single)
    single.advance(40)
    T1 = single.getTemperature()

    part = Partition(quad_2d(24, 8), 8)
    dist = ThermalModel(part.sharded_mesh, partition=part)
    setup(dist)
    dist.advance(40)
    TN = dist.getTemperature()

    # seam cells included: the profiles must agree to solver tolerance
    np.testing.assert_allclose(TN, T1, rtol=1e-8, atol=1e-7)


def test_dist_flux_integrals_match_single():
    """Boundary flux/force integrals on a partitioned mesh must match the
    single-device values (reference: per-rank integral + MPI allreduce in
    get<Var>FluxIntegral, ThermalModel_impl.h:400, FlowModel force
    integrals)."""
    mesh = quad_2d(16, 12)

    single = ThermalModel(fvm.mesh.build_device_mesh(mesh))
    _setup_thermal(single)
    single.advance(10)

    part = Partition(quad_2d(16, 12), 8)
    dist = ThermalModel(part.sharded_mesh, partition=part)
    _setup_thermal(dist)
    dist.advance(10)

    for grp in ("left", "right", "top", "bottom"):
        assert dist.getHeatFluxIntegral(grp) == pytest.approx(
            single.getHeatFluxIntegral(grp), rel=1e-6, abs=1e-8
        )
    # global balance: net heat flow into the converged domain ~ 0
    tot = sum(dist.getHeatFluxIntegral(g) for g in ("left", "right", "top", "bottom"))
    assert abs(tot) < 1e-5


def test_dist_flow_force_integrals_match_single():
    n = 16
    mesh = quad_2d(n, n)

    def setup(m):
        m.options["verbose"] = False
        m.vc["viscosity"] = 0.05
        for side in ("left", "right", "bottom", "top"):
            m.bc[side].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.init()

    single = FlowModel(fvm.mesh.build_device_mesh(mesh))
    setup(single)
    single.advance(40)

    part = Partition(quad_2d(n, n), 4)
    dist = FlowModel(part.sharded_mesh, partition=part)
    setup(dist)
    dist.advance(40)

    for grp in ("top", "bottom", "left", "right"):
        np.testing.assert_allclose(
            dist.getMomentumFluxIntegral(grp),
            single.getMomentumFluxIntegral(grp),
            rtol=1e-4,
            atol=1e-6,
        )
        assert dist.getMassFluxIntegral(grp) == pytest.approx(
            single.getMassFluxIntegral(grp), abs=1e-8
        )


def test_dist_scalar_flux_integral_matches_single():
    from fvm_tpu.models import SpeciesModel

    mesh = quad_2d(12, 12)

    def setup(m):
        m.options["verbose"] = False
        m.bc["left"].bc_type = "SpecifiedMassFraction"
        m.bc["left"]["specifiedMassFraction"] = 1.0
        m.bc["right"].bc_type = "SpecifiedMassFraction"
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()

    single = SpeciesModel(fvm.mesh.build_device_mesh(mesh))
    setup(single)
    single.advance(8)

    part = Partition(quad_2d(12, 12), 4)
    dist = SpeciesModel(part.sharded_mesh, partition=part)
    setup(dist)
    dist.advance(8)

    for grp in ("left", "right"):
        assert dist.getMassFluxIntegral(grp) == pytest.approx(
            single.getMassFluxIntegral(grp), rel=1e-6, abs=1e-9
        )


def test_esbgk_ordinate_sharding_matches_unsharded():
    """Velocity-ordinate axis sharded over 8 devices via NamedSharding +
    GSPMD (the reference's N123 direction batching,
    Field::syncLocalVectorFields, as the tensor-parallel axis): moments
    psums and mirror permutes are inserted by XLA, results match the
    unsharded solve to inner-solver tolerance."""
    from fvm_tpu.kinetic.esbgk import KineticModel
    from fvm_tpu.kinetic.quadrature import Quadrature

    def build(ordinate_shards=None):
        dm = fvm.mesh.build_device_mesh(quad_2d(8, 8))
        m = KineticModel(
            dm, quadrature=Quadrature(4, 4, 4),
            ordinate_shards=ordinate_shards,
        )
        m.options["verbose"] = False
        m.vc["relaxationTime"] = 0.2
        m.bc["top"].bc_type = "DiffuseWall"
        m.bc["top"]["specifiedXVelocity"] = 0.5
        m.bc["bottom"].bc_type = "DiffuseWall"
        m.bc["left"].bc_type = "SpecularWall"
        m.bc["right"].bc_type = "SpecularWall"
        m.init()
        m.advance(8)
        return m

    m1 = build()
    mS = build(ordinate_shards=8)
    assert "fvm_v" in str(mS.state["f"].sharding.spec)
    rho1, u1, T1 = m1.moments()
    rhoS, uS, TS = mS.moments()
    np.testing.assert_allclose(np.asarray(rhoS), np.asarray(rho1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(uS), np.asarray(u1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(TS), np.asarray(T1), atol=2e-6)


def test_phonon_ordinate_sharding_matches_unsharded():
    from fvm_tpu.kinetic import PhononModel

    def build(ordinate_shards=None):
        dm = fvm.mesh.build_device_mesh(quad_2d(16, 3))
        m = PhononModel(
            dm, n_polar=6, n_azimuthal=8, ordinate_shards=ordinate_shards
        )
        m.options["verbose"] = False
        m.vc["relaxationTime"] = 0.05
        m.vc["groupVelocity"] = 1.0
        m.bc["left"].bc_type = "Isothermal"
        m.bc["left"]["specifiedTemperature"] = 310.0
        m.bc["right"].bc_type = "Isothermal"
        m.bc["right"]["specifiedTemperature"] = 290.0
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        m.advance(40)
        return m

    T1 = build().getTemperature()
    TS = build(ordinate_shards=8).getTemperature()
    np.testing.assert_allclose(TS, T1, atol=1e-8)


def test_two_ring_halo_cellcells2():
    """halo_depth=2 Level-1 ghost ring (reference: StorageSite.h:68-77,
    MeshPartitioner level1_scatter_gather_cells): every 2-ring neighbor
    (Mesh.cell_cells2, the getCellCells2 analogue) of every owned cell is
    addressable locally, and ONE all_to_all restores both rings."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from fvm_tpu.ops.halo import halo_exchange

    try:
        from jax import shard_map as smap
    except ImportError:
        from jax.experimental.shard_map import shard_map as smap

    mesh = quad_2d(12, 8)
    part = Partition(quad_2d(12, 8), 4, halo_depth=2)

    # coverage: all interior 2-ring neighbors are local (owned or halo)
    cc2 = mesh.cell_cells2
    for d in range(4):
        for c in part._own_int[d]:
            for j in cc2.row(int(c)):
                if j < mesh.n_interior_cells:
                    assert part.g2l[d, j] >= 0, (d, c, j)

    # exchange: zero the halo band, one halo_exchange restores it
    rng = np.random.default_rng(3)
    phi_g = rng.standard_normal(mesh.n_cells)
    stacked = np.asarray(part.scatter_cells(phi_g))
    broken = stacked.copy()
    broken[:, part.n_owned_local :] = 0.0

    sm_mesh = part.sharded_mesh
    axis = sm_mesh.axis_name
    mapped = smap(
        lambda s, x: halo_exchange(x[0], s, axis)[None],
        mesh=part.jax_mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    restored = np.asarray(mapped(sm_mesh.halo, jnp.asarray(broken)))
    for d in range(4):
        gc = np.nonzero(part.g2l[d] >= 0)[0]
        loc = part.g2l[d, gc]
        np.testing.assert_allclose(restored[d, loc], phi_g[gc], atol=0)


def test_esbgk_ordinate_sharding_transient():
    """Transient ES-BGK with the ordinate axis sharded: f_N1 rides the
    same sharding; one BDF1 step matches the unsharded solve."""
    from fvm_tpu.kinetic.esbgk import KineticModel
    from fvm_tpu.kinetic.quadrature import Quadrature

    def build(ordinate_shards=None):
        dm = fvm.mesh.build_device_mesh(quad_2d(6, 6))
        m = KineticModel(
            dm, quadrature=Quadrature(4, 4, 4),
            ordinate_shards=ordinate_shards,
        )
        m.options["verbose"] = False
        m.options["transient"] = True
        m.options["timeStep"] = 0.05
        m.vc["relaxationTime"] = 0.2
        m.bc["top"].bc_type = "DiffuseWall"
        m.bc["top"]["specifiedXVelocity"] = 0.3
        m.bc["bottom"].bc_type = "DiffuseWall"
        m.bc["left"].bc_type = "SpecularWall"
        m.bc["right"].bc_type = "SpecularWall"
        m.init()
        for _ in range(3):
            m.advance(4)
            m.updateTime()
        return m

    m1 = build()
    mS = build(ordinate_shards=8)
    rho1, u1, T1 = m1.moments()
    rhoS, uS, TS = mS.moments()
    np.testing.assert_allclose(np.asarray(rhoS), np.asarray(rho1), atol=5e-6)
    np.testing.assert_allclose(np.asarray(uS), np.asarray(u1), atol=5e-6)


def test_squeeze_film_dist_matches_single():
    """SqueezeFilmModel (Reynolds damping) on 4 shards: set_gap scatters
    global gap/rate fields and getDampingForce integrates across shards."""
    from fvm_tpu.models.squeeze_film import SqueezeFilmModel

    def run(n_shards=None):
        m0 = quad_2d(16, 16)
        if n_shards:
            part = Partition(m0, n_shards)
            m = SqueezeFilmModel(part.sharded_mesh, partition=part)
        else:
            m = SqueezeFilmModel(fvm.mesh.build_device_mesh(m0))
        m.options["verbose"] = False
        for s in ("left", "right", "bottom", "top"):
            m.bc[s].bc_type = "Dirichlet"
            m.bc[s]["specifiedPressure"] = 0.0
        m.vc["initialGap"] = 1e-4
        m.init()
        m.set_gap(1e-4, -1e-3)
        m.advance(5)
        return m.getDampingForce()

    f1 = run()
    fN = run(4)
    assert fN == pytest.approx(f1, rel=1e-9)


def test_dist_amg_general_unstructured():
    """Distributed AMG on a TRI-mesh RCB partition: the general stacked
    graph-aggregation hierarchy engages (no structured grid to detect)
    and reproduces the single-device AMG solve exactly (reference: AMG
    works at any np on any mesh, AMG.h:53-103)."""
    import numpy as np
    import fvm_tpu as fvm
    from fvm_tpu.parallel import Partition
    from fvm_tpu.models import ThermalModel
    from fvm_tpu.linear import AMG, BiCGStab

    def run(dist):
        mesh = fvm.mesh.generate.tri_2d(20, 20)
        if dist:
            part = Partition(mesh, 8)
            t = ThermalModel(part.sharded_mesh, partition=part)
        else:
            t = ThermalModel(fvm.mesh.build_device_mesh(mesh))
        t.options["verbose"] = False
        t.options["linearSolver"] = BiCGStab(
            preconditioner=AMG(coarse_size=16),
            relative_tolerance=1e-11, max_iterations=80,
        )
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedTemperature"
        t.bc["right"]["specifiedTemperature"] = 300.0
        t.bc["bottom"].bc_type = "Symmetry"
        t.bc["top"].bc_type = "Symmetry"
        t.init()
        hist = t.advance(12)
        pre = t.options["linearSolver"].preconditioner
        if dist:
            assert pre._dist_setup is not None
            assert pre._dist_setup.get("kind") == "general"
            return hist, np.asarray(t.partition.gather_cells(t.state["T"]))
        return hist, np.asarray(t.state["T"])[: t.mesh.n_interior_cells]

    h1, T1 = run(False)
    h8, T8 = run(True)
    np.testing.assert_allclose(T8, T1, atol=2e-6)
    # near-identical outer history (different preconditioner topology —
    # full-graph vs shard-local Schwarz — allows small inner-solver drift)
    for (_, r1), (_, r8) in zip(h1, h8):
        assert abs(r8 - r1) <= 1e-4 * max(r1, 1.0)


def test_dist_amg_general_flow_default_tri():
    """The dist FlowModel default pressure solver now engages AMG on
    unstructured partitions too (the Jacobi fallback is the exception,
    not the rule)."""
    import numpy as np
    import fvm_tpu as fvm
    from fvm_tpu.parallel import Partition
    from fvm_tpu.models.flow import FlowModel
    from fvm_tpu.linear import AMG

    mesh = fvm.mesh.generate.tri_2d(14, 14)
    part = Partition(mesh, 8)
    f = FlowModel(part.sharded_mesh, partition=part)
    f.options["verbose"] = False
    f.vc["viscosity"] = 0.05
    for s in ("left", "right", "bottom", "top"):
        f.bc[s].bc_type = "NoSlipWall"
    f.bc["top"]["specifiedXVelocity"] = 1.0
    f.init()
    pres = f.options["pressureLinearSolver"]
    assert isinstance(pres.preconditioner, AMG)
    assert pres.preconditioner._dist_setup is not None
    assert pres.preconditioner._dist_setup.get("kind") == "general"
    hist = f.advance(8)
    assert hist[-1][1] < hist[0][1]
    v = np.asarray(f.partition.gather_cells(f.state["velocity"]))
    assert np.isfinite(v).all() and np.abs(v).max() <= 1.2


def test_combined_spatial_ordinate_sharding_esbgk():
    """Spatial x ordinate COMBINED sharding (2x4 device mesh): the step
    is shard_map'd manually over the spatial axis while GSPMD partitions
    the velocity-ordinate axis (reference: domain decomposition under
    MPI AND direction batching simultaneously, Field.cpp:734-827
    syncLocalVectorFields).  Matches the single-device solve."""
    from fvm_tpu.kinetic import KineticModel, Quadrature

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    def couette(part=None):
        if part is None:
            m = KineticModel(
                fvm.mesh.build_device_mesh(quad_2d(3, 16)),
                Quadrature(6, 6, 4),
            )
        else:
            m = KineticModel(
                part.sharded_mesh, Quadrature(6, 6, 4), partition=part
            )
        m.options["verbose"] = False
        m.vc["relaxationTime"] = 0.2
        m.bc["top"].bc_type = "DiffuseWall"
        m.bc["top"]["specifiedXVelocity"] = 0.3
        m.bc["bottom"].bc_type = "DiffuseWall"
        m.bc["bottom"]["specifiedXVelocity"] = -0.3
        m.bc["left"].bc_type = "Symmetry"
        m.bc["right"].bc_type = "Symmetry"
        m.init()
        m.advance(15)
        rho, u, T = m.moments()
        if part is not None:
            return np.asarray(u)[:, 0]
        return np.asarray(u[: m.mesh.n_interior_cells, 0])

    u1 = couette()
    part = Partition(quad_2d(3, 16), 2, ordinate_shards=4)
    assert part.jax_mesh.axis_names == ("fvm_x", "fvm_v")
    uN = couette(part)
    np.testing.assert_allclose(uN, u1, atol=1e-6)


def test_combined_spatial_ordinate_sharding_phonon():
    """Combined 2x4 sharding for the phonon BTE (directions x bands on
    the auto axis) matches single-device."""
    from fvm_tpu.kinetic.phonon import PhononModel

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    def run(part=None):
        if part is None:
            p = PhononModel(
                fvm.mesh.build_device_mesh(quad_2d(16, 4)),
                n_polar=4, n_azimuthal=8,
            )
        else:
            p = PhononModel(
                part.sharded_mesh, n_polar=4, n_azimuthal=8, partition=part
            )
        p.options["verbose"] = False
        p.options["coarseAcceleration"] = False
        p.vc["relaxationTime"] = 0.1
        p.bc["left"].bc_type = "Isothermal"
        p.bc["left"]["specifiedTemperature"] = 310.0
        p.bc["right"].bc_type = "Isothermal"
        p.bc["right"]["specifiedTemperature"] = 300.0
        p.bc["top"].bc_type = "Symmetry"
        p.bc["bottom"].bc_type = "Symmetry"
        p.init()
        p.advance(4)
        return p.getTemperature()

    T1 = run()
    part = Partition(quad_2d(16, 4), 2, ordinate_shards=4)
    TN = run(part)
    np.testing.assert_allclose(TN, T1, atol=1e-6)


def test_dist_fmg_warm_start_matches_single():
    """Distributed FMG warm start (models/fmg.prolong_flow_state under a
    Partition; no reference counterpart — testFlowParallel.py always
    cold-starts): prolonging a converged single-device coarse cavity onto
    a 4-shard fine model produces the same state as prolonging onto the
    equivalent single-device fine model, and leaves the dist fine solve
    far closer to steady than a cold start."""
    from fvm_tpu.models.fmg import prolong_flow_state

    def setup(m):
        m.options["verbose"] = False
        m.vc["viscosity"] = 0.01
        for side in ("left", "right", "bottom", "top"):
            m.bc[side].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.init()

    coarse = FlowModel(fvm.mesh.build_device_mesh(quad_2d(16, 16)))
    setup(coarse)
    coarse.advance(300)

    fine_s = FlowModel(fvm.mesh.build_device_mesh(quad_2d(32, 32)))
    setup(fine_s)
    prolong_flow_state(coarse, fine_s)

    part = Partition(quad_2d(32, 32), 4)
    fine_d = FlowModel(part.sharded_mesh, partition=part)
    setup(fine_d)
    prolong_flow_state(coarse, fine_d)

    np.testing.assert_allclose(
        fine_d.getVelocity(), fine_s.getVelocity(), atol=1e-12
    )
    np.testing.assert_allclose(
        fine_d.getPressure(), fine_s.getPressure(), atol=1e-12
    )

    cold = FlowModel(part.sharded_mesh, partition=part)
    setup(cold)
    h_warm = fine_d.advance(40)
    h_cold = cold.advance(40)
    assert h_warm[-1][1] < 0.2 * h_cold[-1][1], (h_warm[-1][1], h_cold[-1][1])


def test_dist_fmg_from_dist_coarse():
    """prolong_flow_state also accepts a DISTRIBUTED coarse model (gathered
    host-side, plain IDW): the warm-started fine solve still beats a cold
    start by a wide margin."""
    from fvm_tpu.models.fmg import prolong_flow_state

    def setup(m):
        m.options["verbose"] = False
        m.vc["viscosity"] = 0.01
        for side in ("left", "right", "bottom", "top"):
            m.bc[side].bc_type = "NoSlipWall"
        m.bc["top"]["specifiedXVelocity"] = 1.0
        m.init()

    cpart = Partition(quad_2d(16, 16), 4)
    coarse = FlowModel(cpart.sharded_mesh, partition=cpart)
    setup(coarse)
    coarse.advance(300)

    part = Partition(quad_2d(32, 32), 4)
    warm = FlowModel(part.sharded_mesh, partition=part)
    setup(warm)
    prolong_flow_state(coarse, warm)
    cold = FlowModel(part.sharded_mesh, partition=part)
    setup(cold)
    h_warm = warm.advance(40)
    h_cold = cold.advance(40)
    assert h_warm[-1][1] < 0.2 * h_cold[-1][1], (h_warm[-1][1], h_cold[-1][1])


def test_dist_advance_newton_matches_single():
    """advanceNewton under a 4-shard Partition (block-Jacobi inner
    preconditioner) converges to the same SIMPLE fixed point as the
    single-device Newton endgame."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    m0 = quad_2d(32, 32)

    def build(dmesh, part=None):
        f = FlowModel(dmesh, partition=part)
        f.options["verbose"] = False
        f.vc["viscosity"] = 0.01
        for side in ("left", "right", "bottom", "top"):
            f.bc[side].bc_type = "NoSlipWall"
        f.bc["top"]["specifiedXVelocity"] = 1.0
        f.init()
        return f

    single = build(fvm.mesh.build_device_mesh(m0))
    single.advance(60)
    single.advanceNewton(4)
    us = single.getVelocity()

    part = Partition(m0, 4)
    dist = build(part.sharded_mesh, part)
    dist.advance(60)
    dist.advanceNewton(6)
    ud = dist.getVelocity()
    np.testing.assert_allclose(ud, us, atol=1e-7)


def test_greedy_partition_option():
    """Partition(method='greedy'): graph-grown parts are balanced to
    +-1 cell, every part is assigned, and a distributed solve on the
    greedy layout matches the single-device field (the partition only
    changes the decomposition, never the answer)."""
    import jax
    from fvm_tpu.parallel.partition import greedy_partition

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = quad_2d(16, 12)
    parts = greedy_partition(mesh, 4)
    counts = np.bincount(parts, minlength=4)
    assert counts.min() >= mesh.n_interior_cells // 4
    assert counts.max() <= -(-mesh.n_interior_cells // 4)

    def build(part=None):
        if part is None:
            t = fvm.models.ThermalModel(fvm.mesh.build_device_mesh(quad_2d(16, 12)))
        else:
            t = fvm.models.ThermalModel(part.sharded_mesh, partition=part)
        t.options["verbose"] = False
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedTemperature"
        t.bc["right"]["specifiedTemperature"] = 300.0
        t.bc["bottom"].bc_type = "Symmetry"
        t.bc["top"].bc_type = "Symmetry"
        t.init()
        t.advance(3)
        return t

    part = Partition(quad_2d(16, 12), 4, method="greedy")
    td = build(part)
    t1 = build()
    T1 = np.asarray(t1.state["T"][: t1.mesh.n_interior_cells])
    TN = part.gather_cells(td.state["T"])
    np.testing.assert_allclose(TN, T1, rtol=0, atol=1e-8)
