#!/usr/bin/env python
"""Two-program FSI: fluid client and solid server in SEPARATE processes.

Counterpart of the reference's two-MPI-job coupling
(scripts/ServerCoupling.py / ClientCoupling.py launched as separate
mpirun jobs joined via Open_port/Accept/Connect).  Here each side is its
own JAX program; the boundary load/displacement exchange rides a
CouplingServer/CouplingClient socket pipe (fvm_tpu.parallel.coupling).

  python fsi_two_program.py                 # spawns both roles
  python fsi_two_program.py --role server --port P   # solid job
  python fsi_two_program.py --role client --port P   # fluid job
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N_COUPLE = 3


def run_server(port: int, n: int) -> None:
    import jax

    if os.environ.get("FVM_DEMO_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import fvm_tpu as fvm
    from fvm_tpu.models import StructureModel
    from fvm_tpu.parallel.coupling import CouplingServer

    srv = CouplingServer(port=port)
    print(f"server: listening on {srv.address}", flush=True)
    srv.accept()

    smesh = fvm.mesh.generate.quad_2d(n, 2, lx=2.0, ly=0.05, y0=1.0)
    sdm = fvm.mesh.build_device_mesh(smesh)
    for it in range(N_COUPLE):
        load = srv.recv()  # fluid wall traction (ServerCoupling.accept)
        solid = StructureModel(sdm)
        solid.options["verbose"] = False
        solid.vc["youngsModulus"] = 5e3
        solid.vc["poissonsRatio"] = 0.3
        solid.bc["left"].bc_type = "SpecifiedDeformation"
        solid.bc["right"].bc_type = "SpecifiedDeformation"
        solid.bc["top"].bc_type = "ZeroTraction"
        solid.bc["bottom"].bc_type = "SpecifiedTraction"
        # full per-face traction array, like the reference's boundary
        # force exchange (ServerCoupling.accept)
        solid.bc["bottom"]["specifiedYTraction"] = load["traction_y"]
        solid.init()
        solid.advance(6)
        wy = solid.getDeformation()[:, 1].reshape(n, 2).mean(axis=1)
        srv.send(deflection=wy)  # ServerCoupling.update
        print(f"server it {it}: mean deflection {wy.mean():+.5f}", flush=True)
    srv.close()


def run_client(port: int, n: int) -> None:
    import jax

    if os.environ.get("FVM_DEMO_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import fvm_tpu as fvm
    from fvm_tpu.models import FlowModel, MovingMeshModel
    from fvm_tpu.parallel.coupling import CouplingClient

    cli = CouplingClient("127.0.0.1", port)
    mesh = fvm.mesh.generate.quad_2d(n, n // 2, lx=2.0, ly=1.0)
    wall_offset = 0.0
    for it in range(N_COUPLE):
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
        g = dmesh.group_by_name("top")
        sl = dmesh.group_faces(g)
        p_f = np.asarray(flow.state["pressure"])[np.asarray(dmesh.face_cell0)[sl]]
        cli.send(traction_y=-p_f)  # per-face wall load
        wy = cli.recv()["deflection"]
        target = float(wy.mean())
        dmove = 0.5 * (target - wall_offset)
        wall_offset += dmove
        mm = MovingMeshModel(mesh)
        mm.set_boundary_displacement("top", [0.0, dmove])
        mesh, _ = mm.advance(150)
        print(
            f"client it {it}: p_wall {p_f.mean():+.4f}, deflection "
            f"{target:+.5f}, dV {mm.volChange:+.5f}",
            flush=True,
        )
    cli.close()
    print("two-program coupling converged", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=["server", "client", "both"], default="both")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["FVM_DEMO_CPU"] = "1"

    if args.role == "server":
        run_server(args.port, args.n)
    elif args.role == "client":
        run_client(args.port, args.n)
    else:
        # pick a free port, then launch the two jobs (the reference's
        # launcher hands the MPI port name to both sides)
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        env = dict(os.environ)
        here = os.path.abspath(__file__)
        server = subprocess.Popen(
            [sys.executable, here, "--role", "server", "--port", str(port),
             "--n", str(args.n)],
            env=env,
        )
        import time

        time.sleep(2.0)  # let the listener come up
        client = subprocess.Popen(
            [sys.executable, here, "--role", "client", "--port", str(port),
             "--n", str(args.n)],
            env=env,
        )
        rc_c = client.wait(timeout=900)
        rc_s = server.wait(timeout=60)
        if rc_c or rc_s:
            raise SystemExit(f"coupling failed: client rc={rc_c} server rc={rc_s}")


if __name__ == "__main__":
    main()
