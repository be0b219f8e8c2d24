"""Unsteady immersed-boundary cantilever in air.

Reproduces the reference driver scripts/IBM-Unsteady-Cantilever.py on its
own case (test/2-D-Cantilever/fullbeam.cas + MPMs-fullbeam.dat): a
35 um x 1 um beam particle cloud immersed in a 250 x 200 um air box,
oscillating transversely at f = 114415 Hz with velocity amplitude
0.1 m/s.  Each time step imposes the instantaneous body velocity on the
(fixed) marked cells (the reference updates the particle velocities and
recomputes computeIBFaceVelocity; the marking itself — CellMark_Impl —
is done once) and records the IB-face force integral, the analogue of
the reference's getPressureIntegralonIBFaces history
(pIntegral-fullbeam.out).

Run: python demos/ibm_unsteady_cantilever.py [n_steps] [iters_per_step]
"""

import os
import sys
import math

import numpy as np

if os.environ.get("FVM_DEMO_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import fvm_tpu as fvm
from fvm_tpu.io.fluent import read_fluent_mesh
from fvm_tpu.geom.ibm import cell_mark_particles, IBType
from fvm_tpu.geom.mpm import MPM
from fvm_tpu.models.flow import FlowModel

REF = "/root/reference/src/fvm/test/2-D-Cantilever"

FREQUENCY = 114415.0  # reference: IBM-Unsteady-Cantilever.py:52
TIME_STEP = 5.0e-08  # reference :54
AMPLITUDE = 0.1  # reference :64 (v = 0.1 cos(2 pi f t))


def build(mesh=None, particles=None):
    m0 = mesh if mesh is not None else read_fluent_mesh(f"{REF}/fullbeam.cas")
    pts = (particles if particles is not None
           else MPM(f"{REF}/MPMs-fullbeam.dat").getCoordinates()[:, :2])
    # beam (1 um) is thinner than a cell (2 um): a radius just over half
    # the cell height marks the particle-containing rows, like the
    # reference's containment-based CellMark
    t = cell_mark_particles(m0, pts, radius=1.1e-6)
    n_int = m0.n_interior_cells
    solid = t[:n_int] == IBType.SOLID

    dm = fvm.mesh.build_device_mesh(m0)
    f = FlowModel(dm)
    f.options["verbose"] = False
    f.options["transient"] = True
    f.options["timeStep"] = TIME_STEP
    f.options["momentumURF"] = 0.9  # reference :160
    f.options["pressureURF"] = 0.1
    f.vc["viscosity"] = 1.7894e-5  # air (reference FlowModel default VC)
    f.vc["density"] = 1.225
    for g in m0.boundary_groups:
        f.bc[g.name].bc_type = "NoSlipWall"
    f.init()
    return f, solid, t[:n_int]


def advance_unsteady(f, solid, n_steps, iters_per_step, on_step=None):
    """The reference's advanceUnsteady loop (:55-95): set the body
    velocity, converge the step, record the IB force, updateTime."""
    hist = []
    t = 0.0
    n_solid = int(solid.sum())
    for step in range(n_steps):
        v = AMPLITUDE * math.cos(2.0 * math.pi * FREQUENCY * t)
        vel = np.zeros((f.mesh.n_interior_cells
                        if not f._dist else f.partition.mesh.n_interior_cells,
                        2))
        vel[solid, 1] = v
        f.set_immersed_boundary(solid, vel, solid_mask=solid)
        f.advance(iters_per_step)
        F = np.asarray(f.getIBForceIntegral())
        hist.append((t, v, F[0], F[1]))
        if on_step:
            on_step(step, t, v, F)
        t += TIME_STEP
        f.updateTime()
    return np.asarray(hist)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    f, solid, _ = build()
    print(f"marked solid cells: {solid.sum()}")

    def report(step, t, v, F):
        print(f"step {step:4d}  t={t:.3e}  v={v:+.4f}  "
              f"Fx={F[0]:+.3e}  Fy={F[1]:+.3e}")

    hist = advance_unsteady(f, solid, n_steps, iters, on_step=report)
    out = os.environ.get("FVM_OUT", "pIntegral-fullbeam.out")
    np.savetxt(out, hist, header="time v Fx Fy")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
