"""Per-solver, per-shard-count golden convergence histories.

The reference's regression tier pins the FULL residual history of every
solver family at every process count with tight tolerances
(reference: src/fvm/test/PARALLEL_CAVITY_{AMG,BCGStab,CG,ILU0,JACOBI,
SPIKE}/TESTS:1-4 run np=1,4,16,64 against GOLDEN/convergence.dat;
AMG_MERGING_THERMAL/ptest.py:83-93 compares line-by-line at 1e-8).

This suite plays that role for fvm_tpu: the SIMPLE cavity (cav32
configuration: 32x32 unit cavity, mu=0.1, lid u=1, URFs 0.7/0.3) and the
thermal two-wall case are driven through each solver family at 1 and
4/8 shards; the recorded histories live in ``tests/goldens/histories.json``
and any drift beyond 1e-8 relative fails the test.

Regenerate goldens intentionally with:
    FVM_UPDATE_GOLDENS=1 python -m pytest tests/test_golden_histories.py
"""

import json
import os

import numpy as np
import pytest
import jax

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.flow import FlowModel
from fvm_tpu.models import ThermalModel
from fvm_tpu.linear import AMG, BiCGStab, CG, JacobiSolver
from fvm_tpu.linear.ilu import ILU0Solver
from fvm_tpu.linear.spike import SpikeSolver
from fvm_tpu.parallel import Partition

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "histories.json")
UPDATE = bool(os.environ.get("FVM_UPDATE_GOLDENS"))
RTOL = 1e-8

# pressure-solver families, mirroring the reference's PARALLEL_CAVITY_*
# suite names (TESTS:1-4).  Loose tolerances keep the outer histories
# informative (many decaying points) exactly like the reference configs.


def _solver(name, dist, partition=None):
    if name == "SPIKE" and dist:
        # cross-shard SPIKE: chunk-edge interfaces solved across the
        # shard boundaries (SpikeStorage.h:15 role)
        pre = SpikeSolver()
        pre.setup_structure_dist(partition)
        return BiCGStab(
            preconditioner=pre, relative_tolerance=1e-3,
            max_iterations=200,
        )
    if name == "AMG":
        s = AMG(coarse_size=16, relative_tolerance=1e-3, max_iterations=30)
        return s
    if name == "BCGStab":
        return BiCGStab(
            preconditioner=JacobiSolver(sweeps=3),
            relative_tolerance=1e-3,
            max_iterations=200,
        )
    if name == "CG":
        return CG(
            preconditioner=JacobiSolver(sweeps=3),
            relative_tolerance=1e-3,
            max_iterations=200,
        )
    if name == "ILU0":
        return BiCGStab(
            preconditioner=ILU0Solver(),
            relative_tolerance=1e-3,
            max_iterations=200,
        )
    if name == "JACOBI":
        return JacobiSolver(sweeps=60)
    if name == "SPIKE":
        return BiCGStab(
            preconditioner=SpikeSolver(),
            relative_tolerance=1e-3,
            max_iterations=200,
        )
    raise KeyError(name)


def run_cavity(solver_name, n_shards, niter=30):
    mesh = quad_2d(32, 32)
    part = None
    if n_shards > 1:
        if len(jax.devices()) < n_shards:
            pytest.skip(f"needs {n_shards} virtual devices")
        part = Partition(mesh, n_shards)
        m = FlowModel(part.sharded_mesh, partition=part)
    else:
        m = FlowModel(fvm.mesh.build_device_mesh(mesh))
    m.options["verbose"] = False
    m.vc["density"] = 1.0
    m.vc["viscosity"] = 0.1
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "NoSlipWall"
    m.bc["top"]["specifiedXVelocity"] = 1.0
    dist = n_shards > 1
    pres = _solver(solver_name, dist, part)
    if isinstance(pres, AMG):
        if dist:
            ok = pres.setup_structure_dist(
                np.asarray(part.sharded_mesh.cf_nbr).transpose(0, 2, 1),
                np.asarray(part.sharded_mesh.cf_mask).transpose(0, 2, 1),
                part.sharded_mesh.n_owned_cells,
            )
            assert ok
    m.options["pressureLinearSolver"] = pres
    m.init()
    hist = m.advance(niter)
    return [[float(h[1]), float(h[2])] for h in hist]


def run_thermal(solver_name, n_shards, niter=10):
    mesh = quad_2d(32, 32)
    part = None
    if n_shards > 1:
        if len(jax.devices()) < n_shards:
            pytest.skip(f"needs {n_shards} virtual devices")
        part = Partition(mesh, n_shards)
        t = ThermalModel(part.sharded_mesh, partition=part)
    else:
        t = ThermalModel(fvm.mesh.build_device_mesh(mesh))
    t.options["verbose"] = False
    s = _solver(solver_name, n_shards > 1, part)
    # loose inner solve => informative multi-point outer history, like the
    # reference's per-sweep convergence.dat lines
    s.relativeTolerance = 5e-2
    s.nMaxIterations = min(s.nMaxIterations, 8)
    t.options["linearSolver"] = s
    t.bc["left"].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = 400.0
    t.bc["right"].bc_type = "SpecifiedTemperature"
    t.bc["right"]["specifiedTemperature"] = 300.0
    t.bc["bottom"].bc_type = "Symmetry"
    t.bc["top"].bc_type = "Symmetry"
    t.init()
    hist = t.advance(niter)
    return [[float(h[1])] for h in hist]


CONFIGS = {
    # all six reference solver families, serial (TESTS:1)
    "cavity/AMG/np1": lambda: run_cavity("AMG", 1),
    "cavity/BCGStab/np1": lambda: run_cavity("BCGStab", 1),
    "cavity/CG/np1": lambda: run_cavity("CG", 1),
    "cavity/ILU0/np1": lambda: run_cavity("ILU0", 1),
    "cavity/JACOBI/np1": lambda: run_cavity("JACOBI", 1),
    "cavity/SPIKE/np1": lambda: run_cavity("SPIKE", 1),
    # sharded runs (TESTS:2-4 role; virtual CPU devices) — the full
    # solver matrix at np=4 and np=8 (PARALLEL_CAVITY_{CG,ILU0,JACOBI,
    # SPIKE}/TESTS:2-4; ILU0/JACOBI/SPIKE run as shard-local Schwarz
    # variants like the reference's additive pattern, SPIKE with the
    # cross-shard chunk-edge interfaces wired)
    "cavity/AMG/np4": lambda: run_cavity("AMG", 4),
    "cavity/AMG/np8": lambda: run_cavity("AMG", 8),
    "cavity/BCGStab/np4": lambda: run_cavity("BCGStab", 4),
    "cavity/BCGStab/np8": lambda: run_cavity("BCGStab", 8),
    "cavity/CG/np4": lambda: run_cavity("CG", 4),
    "cavity/CG/np8": lambda: run_cavity("CG", 8),
    "cavity/ILU0/np4": lambda: run_cavity("ILU0", 4),
    "cavity/ILU0/np8": lambda: run_cavity("ILU0", 8),
    "cavity/JACOBI/np4": lambda: run_cavity("JACOBI", 4),
    "cavity/JACOBI/np8": lambda: run_cavity("JACOBI", 8),
    "cavity/SPIKE/np4": lambda: run_cavity("SPIKE", 4),
    "cavity/SPIKE/np8": lambda: run_cavity("SPIKE", 8),
    # thermal (AMG_MERGING_THERMAL role)
    "thermal/AMG/np1": lambda: run_thermal("AMG", 1),
    "thermal/AMG/np8": lambda: run_thermal("AMG", 8),
    "thermal/BCGStab/np1": lambda: run_thermal("BCGStab", 1),
    "thermal/ILU0/np1": lambda: run_thermal("ILU0", 1),
    "thermal/SPIKE/np1": lambda: run_thermal("SPIKE", 1),
    "thermal/SPIKE/np8": lambda: run_thermal("SPIKE", 8),
    "thermal/ILU0/np8": lambda: run_thermal("ILU0", 8),
}


def _load_goldens():
    if not os.path.exists(GOLDEN_PATH):
        return {}
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def _store_golden(key, hist):
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    data = _load_goldens()
    data[key] = hist
    with open(GOLDEN_PATH, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)


@pytest.mark.parametrize("key", sorted(CONFIGS))
def test_golden_history(key):
    hist = CONFIGS[key]()
    if UPDATE:
        _store_golden(key, hist)
        return
    goldens = _load_goldens()
    assert key in goldens, (
        f"no golden for {key}; run FVM_UPDATE_GOLDENS=1 pytest "
        "tests/test_golden_histories.py"
    )
    ref = goldens[key]
    assert len(hist) == len(ref), (
        f"{key}: history length {len(hist)} != golden {len(ref)}"
    )
    for it, (h, r) in enumerate(zip(hist, ref)):
        for hv, rv in zip(h, r):
            assert hv == pytest.approx(rv, rel=RTOL, abs=1e-12), (
                f"{key}: iteration {it} drifted: {hv} vs golden {rv}"
            )
