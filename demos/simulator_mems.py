#!/usr/bin/env python
"""MEMS electrostatic actuator: plate + electrostatics + contact.

Counterpart of the reference's MEMS switch app
(reference: src/fvm/scripts/Simulator.py — PlateModel + ElectricModel +
ContactModel + FlowModel damping, MeshSetup/ModelSetup helpers).

A clamped plate over a ground electrode at gap g0: electrostatic pressure
p = eps0 V^2 / (2 (g0 - w)^2) loads the plate; iterate to equilibrium and
sweep the voltage toward pull-in (w > ~g0/3 -> unstable).

Units: micrometers / MPa (keeps magnitudes O(1), float32-safe on TPU).
eps0 = 8.8542e-12 F/m -> pressure in MPa with gap in um:
p[MPa] = 8.8542e-6 * V^2 / (2 * g_um^2).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import fvm_tpu as fvm
from fvm_tpu.models import PlateModel

EPS0_UM = 8.8542e-6  # MPa um^2 / V^2


def deflection_at_voltage(V, g0=2.0, L=200.0, h=0.5, E=160e3, n=24):
    """g0/L/h in micrometers, E in MPa; returns w_max in micrometers."""
    dm = fvm.mesh.build_device_mesh(
        fvm.mesh.generate.quad_2d(n, n, lx=L, ly=L)
    )
    m = PlateModel(dm)
    m.options["verbose"] = False
    m.vc["ym"] = E
    m.vc["nu"] = 0.22
    m.vc["thickness"] = h
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "Clamped"
    m.init()
    w = np.zeros(dm.n_interior_cells)
    for it in range(40):
        gap = np.maximum(g0 - w, 0.05 * g0)
        p_es = EPS0_UM * V * V / (2.0 * gap**2)
        full = np.zeros(dm.n_cells)
        full[: dm.n_interior_cells] = -p_es  # pull toward the electrode
        m.set_pressure(full)
        m.advance(4)
        w_new = -m.getDeflection()  # deflection toward the electrode
        if np.abs(w_new - w).max() < 1e-9 * g0:
            w = w_new
            break
        w = 0.7 * w_new + 0.3 * w
    return float(w.max())


def main():
    g0 = 2.0  # micrometers
    print("V [V]   w_max/g0")
    for V in (5, 10, 15, 20, 25, 30, 40):
        wmax = deflection_at_voltage(V, g0=g0)
        print(f"{V:5.1f}   {wmax / g0:.4f}")
        if wmax > g0 / 3:
            print(f"-> pull-in reached near {V} V (w > g0/3)")
            break


if __name__ == "__main__":
    main()
