"""Chunked advance (options['outerChunk'] > 1): N outer iterations per
device dispatch with a device-resident convergence check must reproduce
the classic per-iteration python loop exactly — same residual history,
same early exit, same fields (reference role: the advance loops of
ThermalModel_impl.h:424 etc., which also run without per-iteration host
syncs)."""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.parallel.partition import Partition


def _drive_thermal(chunk, dist=False, niter=7):
    m = quad_2d(24, 24)
    if dist:
        part = Partition(m, 4)
        t = fvm.models.ThermalModel(part.sharded_mesh, partition=part)
    else:
        t = fvm.models.ThermalModel(fvm.mesh.build_device_mesh(m))
    t.bc["left"].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = 400.0
    t.bc["right"].bc_type = "SpecifiedHeatFlux"
    t.bc["right"]["specifiedHeatFlux"] = 10.0
    t.bc["bottom"].bc_type = "Symmetry"
    t.bc["top"].bc_type = "Symmetry"
    t.options["verbose"] = False
    t.options["outerChunk"] = chunk
    t.init()
    h = t.advance(niter)
    return h, np.asarray(t.getTemperature())


def _assert_hist_equal(h0, h1, rtol=1e-12):
    assert len(h0) == len(h1)
    for (i0, r0), (i1, r1) in zip(h0, h1):
        assert i0 == i1
        assert abs(r0 - r1) <= rtol * max(1.0, abs(r0)), (i0, r0, r1)


def test_thermal_chunked_matches_classic():
    h0, T0 = _drive_thermal(0)
    h1, T1 = _drive_thermal(4)
    _assert_hist_equal(h0, h1)
    assert np.abs(T0 - T1).max() == 0.0
    # the linear problem early-exits well before 7 outers in both paths
    assert len(h0) < 7


def test_thermal_chunked_dist_matches_classic():
    h0, T0 = _drive_thermal(0, dist=True)
    h1, T1 = _drive_thermal(4, dist=True)
    _assert_hist_equal(h0, h1, rtol=1e-10)
    assert np.abs(T0 - T1).max() == 0.0


def test_chunk_larger_than_niter():
    # a chunk bigger than niter must clamp via the traced nmax bound
    h0, T0 = _drive_thermal(0, niter=3)
    h1, T1 = _drive_thermal(16, niter=3)
    _assert_hist_equal(h0, h1)
    assert np.abs(T0 - T1).max() == 0.0


def test_electric_chunked_keeps_field():
    def drive(chunk):
        m = quad_2d(16, 16)
        e = fvm.models.ElectricModel(fvm.mesh.build_device_mesh(m))
        e.bc["left"].bc_type = "SpecifiedPotential"
        e.bc["left"]["specifiedPotential"] = 1.0
        e.bc["right"].bc_type = "SpecifiedPotential"
        e.bc["right"]["specifiedPotential"] = 0.0
        e.bc["bottom"].bc_type = "Symmetry"
        e.bc["top"].bc_type = "Symmetry"
        e.options["verbose"] = False
        e.options["outerChunk"] = chunk
        e.init()
        h = e.advance(5)
        return h, np.asarray(e.getElectricField()), np.asarray(
            e.getPotential()
        )

    h0, E0, p0 = drive(0)
    h1, E1, p1 = drive(3)
    _assert_hist_equal(h0, h1)
    assert np.abs(p0 - p1).max() == 0.0
    # the on_aux hook must deliver the final step's E field
    assert np.abs(E0 - E1).max() == 0.0


def test_flow_chunked_matches_classic():
    def drive(chunk):
        m = quad_2d(16, 16)
        f = fvm.models.FlowModel(fvm.mesh.build_device_mesh(m))
        f.bc["top"].bc_type = "NoSlipWall"
        f.bc["top"]["specifiedXVelocity"] = 1.0
        for g in ("left", "right", "bottom"):
            f.bc[g].bc_type = "NoSlipWall"
        f.options["verbose"] = False
        f.options["outerChunk"] = chunk
        f.init()
        h = f.advance(9)
        return h, np.asarray(f.getVelocity())

    h0, v0 = drive(0)
    h1, v1 = drive(4)
    assert len(h0) == len(h1)
    for (i0, m0, c0), (i1, m1, c1) in zip(h0, h1):
        assert i0 == i1
        assert abs(m0 - m1) <= 1e-10 * max(1.0, abs(m0)), (i0, m0, m1)
        assert abs(c0 - c1) <= 1e-10 * max(1.0, abs(c0)), (i0, c0, c1)
    assert np.abs(v0 - v1).max() == 0.0


def test_species_chunked_matches_classic():
    from fvm_tpu.models import SpeciesModel

    def drive(chunk):
        dm = fvm.mesh.build_device_mesh(quad_2d(16, 4))
        m = SpeciesModel(dm, n_species=2)
        m.options["verbose"] = False
        m.options["outerChunk"] = chunk
        for i, (lo, hi) in enumerate(((1.0, 0.0), (0.2, 0.8))):
            bcm = m.bc_for(i)
            bcm["left"].bc_type = "SpecifiedMassFraction"
            bcm["left"]["specifiedMassFraction"] = lo
            bcm["right"].bc_type = "SpecifiedMassFraction"
            bcm["right"]["specifiedMassFraction"] = hi
            bcm["bottom"].bc_type = "Symmetry"
            bcm["top"].bc_type = "Symmetry"
        m.init()
        h = m.advance(5)
        return h, np.asarray(m.getMassFraction(0))

    h0, c0 = drive(0)
    h1, c1 = drive(3)
    _assert_hist_equal(h0, h1)
    assert np.abs(c0 - c1).max() == 0.0


def test_phonon_chunked_matches_classic():
    from fvm_tpu.kinetic import PhononModel

    def drive(chunk):
        dm = fvm.mesh.build_device_mesh(quad_2d(12, 3))
        m = PhononModel(dm, n_polar=2, n_azimuthal=4)
        m.options["verbose"] = False
        m.options["outerChunk"] = chunk
        m.vc["relaxationTime"] = 0.1
        m.bc["left"].bc_type = "Isothermal"
        m.bc["left"]["specifiedTemperature"] = 310.0
        m.bc["right"].bc_type = "Isothermal"
        m.bc["right"]["specifiedTemperature"] = 290.0
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        h = m.advance(6)
        return h, m.getTemperature()

    h0, T0 = drive(0)
    h1, T1 = drive(4)
    _assert_hist_equal(h0, h1, rtol=1e-10)
    assert np.abs(T0 - T1).max() == 0.0


def test_plate_chunked_matches_classic():
    from fvm_tpu.models import PlateModel

    def drive(chunk):
        dm = fvm.mesh.build_device_mesh(quad_2d(10, 4, lx=2.5, ly=1.0))
        m = PlateModel(dm)
        m.options["verbose"] = False
        m.options["outerChunk"] = chunk
        m.vc["ym"] = 1e6
        m.vc["nu"] = 0.3
        m.vc["thickness"] = 0.1
        m.vc["pressure"] = -1.0
        m.bc["left"].bc_type = "Clamped"
        m.bc["right"].bc_type = "Clamped"
        m.bc["bottom"].bc_type = "Symmetry"
        m.bc["top"].bc_type = "Symmetry"
        m.init()
        h = m.advance(4)
        return h, np.asarray(m.getDeflection())

    h0, w0 = drive(0)
    h1, w1 = drive(3)
    _assert_hist_equal(h0, h1, rtol=1e-10)
    assert np.abs(w0 - w1).max() == 0.0


def test_structure_chunked_matches_classic():
    def drive(chunk):
        m = quad_2d(12, 12)
        s = fvm.models.StructureModel(fvm.mesh.build_device_mesh(m))
        s.bc["left"].bc_type = "SpecifiedDeformation"
        s.bc["left"]["specifiedXDeformation"] = 0.0
        s.bc["left"]["specifiedYDeformation"] = 0.0
        s.bc["right"].bc_type = "SpecifiedForce"
        s.bc["right"]["specifiedXForce"] = 1e3
        s.bc["bottom"].bc_type = "SpecifiedTraction"
        s.bc["top"].bc_type = "SpecifiedTraction"
        s.options["verbose"] = False
        s.options["outerChunk"] = chunk
        s.init()
        h = s.advance(4)
        return h, np.asarray(s.getDeformation())

    h0, d0 = drive(0)
    h1, d1 = drive(3)
    _assert_hist_equal(h0, h1, rtol=1e-10)
    assert np.abs(d0 - d1).max() == 0.0
