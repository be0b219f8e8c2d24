#!/usr/bin/env python
"""Conjugate thermal conduction, single- or multi-device.

Counterpart of the reference's testThermalParallel.py driver.
usage: python testThermalParallel.py [n] [n_shards]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import sys
import time

import fvm_tpu as fvm
from fvm_tpu.models import ThermalModel
from fvm_tpu.parallel import Partition


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    mesh = fvm.mesh.generate.quad_2d(n, n)
    part = Partition(mesh, shards) if shards > 1 else None
    dmesh = part.sharded_mesh if part else fvm.mesh.build_device_mesh(mesh)

    t = ThermalModel(dmesh, partition=part)
    t.bc["left"].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = 400.0
    t.bc["right"].bc_type = "Convective"
    t.bc["right"]["heatTransferCoefficient"] = 10.0
    t.bc["right"]["farFieldTemperature"] = 300.0
    t.bc["bottom"].bc_type = "Symmetry"
    t.bc["top"].bc_type = "Symmetry"
    t.init()
    t0 = time.time()
    hist = t.advance(20)
    print(
        f"thermal {n}x{n} on {shards} device(s): residual "
        f"{hist[0][1]:.3e} -> {hist[-1][1]:.3e} in {time.time()-t0:.1f}s"
    )
    # convergence history dump (golden-test style, reference convergence.dat)
    with open("convergence.dat", "w") as f:
        for it, r in hist:
            f.write(f"{it} {r:.10e}\n")


if __name__ == "__main__":
    main()
