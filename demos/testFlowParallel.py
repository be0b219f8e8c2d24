#!/usr/bin/env python
"""Lid-driven cavity flow, single- or multi-device.

Counterpart of the reference's canonical driver
(reference: src/fvm/scripts/testFlowParallel.py — mesh read, partition,
FlowModel setup with AMG/BCGStab, advance loop, timing dump).

usage: python testFlowParallel.py [n_cells_per_side] [n_shards] [case.cas]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import sys
import time

import numpy as np
import fvm_tpu as fvm
from fvm_tpu.models import FlowModel
from fvm_tpu.parallel import Partition
from fvm_tpu.io import write_vtk


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    t0 = time.time()
    if len(sys.argv) > 3:
        from fvm_tpu.io import read_fluent_mesh

        mesh = read_fluent_mesh(sys.argv[3])
    else:
        mesh = fvm.mesh.generate.quad_2d(n, n)
    part = None
    if shards > 1:
        part = Partition(mesh, shards)
        dmesh = part.sharded_mesh
    else:
        dmesh = fvm.mesh.build_device_mesh(mesh)
    t_part = time.time() - t0

    flow = FlowModel(dmesh, partition=part)
    flow.vc["viscosity"] = 0.01
    for g in dmesh.boundary_groups():
        flow.bc[g[1]].bc_type = "NoSlipWall"
    top = dmesh.boundary_groups()[-1][1]
    flow.bc[top].bc_type = "NoSlipWall"
    flow.bc[top]["specifiedXVelocity"] = 1.0
    flow.init()

    t0 = time.time()
    hist = flow.advance(500)
    t_solve = time.time() - t0

    # timing dump (reference writes time_mpi_totalprocs<N>.dat)
    with open(f"time_totaldevices{shards}.dat", "w") as f:
        f.write(f"partition_time {t_part:.4f}\nsolve_time {t_solve:.4f}\n")
        f.write(f"iterations {len(hist)}\n")
    if part is None:
        write_vtk(
            "cavity.vtk",
            mesh,
            {"velocity": flow.getVelocity(), "pressure": flow.getPressure()},
        )
    print(
        f"cavity {n}x{n} on {shards} device(s): {len(hist)} iters, "
        f"mom residual ratio {hist[-1][1]/hist[0][1]:.2e}, {t_solve:.1f}s"
    )


if __name__ == "__main__":
    main()
