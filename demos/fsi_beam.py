#!/usr/bin/env python
"""Fluid-structure interaction: channel flow loading an elastic wall.

Counterpart of the reference's FSI coupling
(reference: scripts/FluidStructure.py + ServerCoupling/ClientCoupling —
two MPI jobs exchanging boundary forces/displacements; here the coupling
is in-process: FlowModel pressure loads a StructureModel strip, the
deformation feeds a MovingMeshModel, and the flow re-solves on the
deformed mesh).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import fvm_tpu as fvm
from fvm_tpu.models import FlowModel, StructureModel, MovingMeshModel


def main():
    n = 24
    mesh = fvm.mesh.generate.quad_2d(n, n // 2, lx=2.0, ly=1.0)
    wall_offset = 0.0  # cumulative wall position change

    for it in range(3):
        dmesh = fvm.mesh.build_device_mesh(mesh)
        flow = FlowModel(dmesh)
        flow.options["verbose"] = False
        flow.vc["viscosity"] = 0.05
        flow.bc["left"].bc_type = "VelocityBoundary"
        flow.bc["left"]["specifiedXVelocity"] = 1.0
        flow.bc["right"].bc_type = "PressureBoundary"
        flow.bc["bottom"].bc_type = "NoSlipWall"
        flow.bc["top"].bc_type = "NoSlipWall"
        flow.init()
        flow.advance(120)

        # pressure load on the top wall -> structure traction
        g = dmesh.group_by_name("top")
        sl = dmesh.group_faces(g)
        p_f = np.asarray(flow.state["pressure"])[np.asarray(dmesh.face_cell0)[sl]]
        p_mean = float(p_f.mean())

        # elastic wall: a strip loaded by the fluid pressure
        smesh = fvm.mesh.generate.quad_2d(n, 2, lx=2.0, ly=0.05, y0=1.0)
        sdm = fvm.mesh.build_device_mesh(smesh)
        solid = StructureModel(sdm)
        solid.options["verbose"] = False
        solid.vc["youngsModulus"] = 5e3
        solid.vc["poissonsRatio"] = 0.3
        solid.bc["left"].bc_type = "SpecifiedDeformation"
        solid.bc["right"].bc_type = "SpecifiedDeformation"
        solid.bc["top"].bc_type = "ZeroTraction"
        solid.bc["bottom"].bc_type = "SpecifiedTraction"
        solid.bc["bottom"]["specifiedYTraction"] = -p_f.mean()  # fluid pushes up(+)/down
        solid.init()
        solid.advance(6)
        w = solid.getDeformation()
        wy = w[:, 1].reshape(n, 2).mean(axis=1)

        # feed wall deflection back as INCREMENTAL, under-relaxed motion
        target = float(wy.mean())
        dmove = 0.5 * (target - wall_offset)
        wall_offset += dmove
        mm = MovingMeshModel(mesh)
        mm.set_boundary_displacement("top", [0.0, dmove])
        mesh, _ = mm.advance(150)
        print(
            f"FSI iter {it}: mean fluid p on wall {p_mean:+.4f}, "
            f"wall deflection mean {wy.mean():+.5f}, "
            f"fluid domain volume change {mm.volChange:+.5f}"
        )
    print("coupled loop ran: flow -> wall load -> deformation -> mesh motion")


if __name__ == "__main__":
    main()
