#!/usr/bin/env python
"""Li-ion half-cell discharge on a double-shell mesh.

Counterpart of the reference's battery drivers (BatteryModel tests over
SpeciesTest.cas / FullBatterySimple.cas): electrolyte | electrode split by
a double-shell interface whose shell unknowns (phi_L, phi_R, ce_i, cs_i)
carry the Butler-Volmer kinetics, solved point-coupled by JFNK
(reference: BatteryPCLinearizeInterface_BV.h).

A constant current is drawn at the electrode contact; each time step moves
exactly dt*I/F moles of Li out of the electrode (the potential equation is
elliptic, so the interface current equals the applied current instantly)
and dt*(1-t+)*I/F into the electrolyte.

usage: python battery_cell.py [nx] [steps] [n_shards]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import numpy as np

import fvm_tpu as fvm
from fvm_tpu.mesh.metrics import compute_geometry
from fvm_tpu.models.battery import BatteryModel, FARADAY
from fvm_tpu.parallel import Partition


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    I, dt = 5.0, 20.0

    m = fvm.mesh.generate.quad_2d(nx, 4, lx=2.0, ly=1.0)
    xc0 = compute_geometry(m).cell_centroid[: m.n_interior_cells, 0]
    elyte = xc0 < 1.0
    m2 = m.make_interface(
        "sep", m.interface_faces_between(elyte, ~elyte), left_cells=elyte
    )

    part = Partition(m2, shards) if shards > 1 else None
    dmesh = part.sharded_mesh if part else fvm.mesh.build_device_mesh(m2)
    b = BatteryModel(dmesh, partition=part)
    b.options["verbose"] = False
    b.options["transient"] = True
    b.options["timeStep"] = dt

    xc = compute_geometry(m2).cell_centroid[: m2.n_interior_cells, 0]
    b.set_material_regions(np.where(xc < 1.0, 1, 2).astype(np.int32))
    b.vc["conductivity"] = (100.0, 1.0, 10.0)
    b.vc["diffusivity"] = (1e-2, 1e-2, 1e-2)
    b.bc["left"].bc_type = "SpecifiedPotential"
    b.bc["left"]["specifiedPotential"] = 0.0
    b.bc["right"].bc_type = "SpecifiedCurrent"
    b.bc["right"]["specifiedCurrent"] = I
    b.bc["top"].bc_type = "Symmetry"
    b.bc["bottom"].bc_type = "Symmetry"
    b.init()

    vol = 2.0 / m2.n_interior_cells
    c_prev = b.getConcentration()
    t0 = time.time()
    for step in range(steps):
        hist = b.advance(20)
        c_now = b.getConcentration()
        dcs = (c_now[~(xc < 1.0)] - c_prev[~(xc < 1.0)]).sum() * vol
        print(
            f"step {step}: Newton iters {len(hist)}, "
            f"residual {hist[-1][1]:.3e}, terminal V "
            f"{b.getPotential().max():.4f}, d(Li_electrode) {dcs:.6e} "
            f"(exact {-dt * I / FARADAY:.6e})"
        )
        b.updateTime()
        c_prev = c_now
    print(f"{steps} steps on {shards} device(s) in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
