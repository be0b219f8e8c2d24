#!/usr/bin/env python
"""ES-BGK rarefied Couette flow driver.

Counterpart of the reference driver (reference:
src/fvm/scripts/ESBGK_Couette.py / test suite ESBGK-tests/Couette).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np
import fvm_tpu as fvm
from fvm_tpu.kinetic import KineticModel, Quadrature


def main():
    dm = fvm.mesh.build_device_mesh(fvm.mesh.generate.quad_2d(3, 32))
    m = KineticModel(dm, Quadrature(8, 8, 4))
    m.options["verbose"] = False
    m.options["collisionModel"] = "ESBGK"
    m.vc["relaxationTime"] = 0.1
    m.bc["top"].bc_type = "DiffuseWall"
    m.bc["top"]["specifiedXVelocity"] = 0.3
    m.bc["bottom"].bc_type = "DiffuseWall"
    m.bc["bottom"]["specifiedXVelocity"] = -0.3
    m.bc["left"].bc_type = "Symmetry"
    m.bc["right"].bc_type = "Symmetry"
    m.init()
    m.advance(80)
    rho, u, T = m.moments()
    ux = np.asarray(u[: dm.n_interior_cells, 0]).reshape(3, 32).mean(axis=0)
    y = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 1].reshape(3, 32)[0]
    print("y, u_x profile (Couette with slip):")
    for i in range(0, 32, 4):
        print(f"  {y[i]:.3f}  {ux[i]:+.4f}")
    slip = 0.3 - ux[-1]
    print(f"wall slip: {slip:.4f} (finite-Kn slip expected)")
    print("conservation error:", m.conservation_error())


if __name__ == "__main__":
    main()
