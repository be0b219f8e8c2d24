#!/usr/bin/env python
"""ES-BGK squeeze-film damping of a moving MEMS beam.

Counterpart of the reference damping driver (reference:
src/fvm/scripts/DampingESBGK.py on test/DampingESBGK/Damping2D.cas):
a beam face moves toward the substrate at u_wall inside a rarefied gas
pocket open to pressure inlets; the kinetic wall force on the beam is the
squeeze-film damping force that a continuum Reynolds model (SqueezeFilm)
underpredicts at finite Knudsen number.

Reads the reference's own Damping2D.cas when available and applies the
same BC layout (WallBC beam with specifiedYVelocity, WallBC substrate,
SymmetryBC left, PressureInletBC top/right); otherwise falls back to a
generated channel.  Prints the transient beam-force history and the
quasi-steady damping coefficient F_y / u_wall.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax

if os.environ.get("FVM_DEMO_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import fvm_tpu as fvm
from fvm_tpu.kinetic import KineticModel, Quadrature

CAS = "/root/reference/src/fvm/test/DampingESBGK/Damping2D.cas"
UWALL = 0.0297 * 0.2  # reference: DampingESBGK.py uwall (5 m/s reduced)


def main():
    if os.path.exists(CAS):
        from fvm_tpu.io.fluent import read_fluent_mesh

        mesh = read_fluent_mesh(CAS)
        names = dict(
            beam="beam_wall", substrate="substrate", sym="symmetry",
            inlets=("toppressureinlet", "rightpressureinlet"),
        )
    else:
        mesh = fvm.mesh.generate.quad_2d(24, 8, lx=3.0, ly=1.0)
        names = dict(beam="top", substrate="bottom", sym="left",
                     inlets=("right",))
    dm = fvm.mesh.build_device_mesh(mesh)
    m = KineticModel(dm, Quadrature(10, 10, 10))
    m.options["verbose"] = False
    m.options["collisionModel"] = "ESBGK"
    m.options["transient"] = True
    m.options["timeStep"] = 0.5e-2  # reference timestep
    m.vc["relaxationTime"] = 0.2

    m.bc[names["beam"]].bc_type = "DiffuseWall"
    m.bc[names["beam"]]["specifiedTemperature"] = 1.0
    m.bc[names["beam"]]["specifiedYVelocity"] = -UWALL  # toward substrate
    m.bc[names["substrate"]].bc_type = "DiffuseWall"
    m.bc[names["substrate"]]["specifiedTemperature"] = 1.0
    m.bc[names["sym"]].bc_type = "Symmetry"
    for nm in names["inlets"]:
        m.bc[nm].bc_type = "PressureInlet"
        m.bc[nm]["specifiedPressure"] = 1.0
        m.bc[nm]["specifiedTemperature"] = 1.0
    m.init()

    F0 = m.getMomentumFluxIntegral(names["beam"])
    print(f"static wall force  F = {F0}")
    nsteps = int(os.environ.get("FVM_DEMO_STEPS", "40"))
    for i in range(nsteps):
        m.advance(5)
        m.updateTime()
        if (i + 1) % 10 == 0:
            F = m.getMomentumFluxIntegral(names["beam"])
            print(f"step {i+1:4d}  beam force F = ({F[0]:+.5e}, "
                  f"{F[1]:+.5e}, {F[2]:+.5e})")
    F = m.getMomentumFluxIntegral(names["beam"])
    dF = F - F0
    print(f"damping force dF_y = {dF[1]:+.5e} at u_wall = {UWALL:.4f}")
    print(f"damping coefficient c = dF_y / u_wall = {dF[1] / UWALL:.4f}")
    drho, dmom, de = m.conservation_error()
    print(f"collision conservation error: {drho:.2e} {dmom:.2e} {de:.2e}")


if __name__ == "__main__":
    main()
