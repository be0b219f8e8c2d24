#!/usr/bin/env python
"""MEMS electrostatic switch: plate + IBM electrostatics + squeeze-film
damping + contact, composed for real.

Counterpart of the reference's MEMS switch app
(reference: src/fvm/scripts/Simulator.py — transient PlateModel loaded by
an ElectricModel on an IBM-marked fluid mesh, FlowModel squeeze damping,
ContactModel near pull-in; MeshSetup/ModelSetup helpers).

Composition here (units: micrometers / MPa / volts; eps0 = 8.8542e-6
MPa um^2 / V^2 keeps magnitudes O(1)):

  * PlateModel: clamped-clamped beam strip, transient (inertia) or
    quasi-static, carries the net load;
  * ElectricModel: 2D gap cross-section (x along the beam, y across the
    gap); each coupling pass marks the cells above the DEFORMED beam
    face as conductor at the bias V (set_immersed_boundary — the IBM
    electrostatics pipeline), solves for phi, and converts the surface
    field to the electrostatic traction p = eps0 E^2 / 2;
  * SqueezeFilmModel: Reynolds damping pressure from the gap rate;
  * ContactModel.gap_force: penalty repulsion once the local gap closes
    to the contact range (caps the snap-down).

The bias sweep reproduces pull-in at V_PI ~ sqrt(8 k g0^3/(27 eps0 A))
with k the beam's own lumped stiffness (measured from a unit-pressure
solve) — printed against the simulated pull-in bracket.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import fvm_tpu as fvm
from fvm_tpu.models import PlateModel, SqueezeFilmModel
from fvm_tpu.models.electric import ElectricModel
from fvm_tpu.models.contact import ContactModel

EPS0 = 8.8542e-6  # MPa um^2 / V^2


class MemsSwitch:
    def __init__(self, g0=2.0, L=200.0, W=20.0, h=0.5, E=160e3,
                 nx=40, ny_gap=16):
        self.g0, self.L, self.W = g0, L, W
        self.nx = nx
        # plate: clamped-clamped strip (midsurface mesh)
        dm_p = fvm.mesh.build_device_mesh(
            fvm.mesh.generate.quad_2d(nx, 3, lx=L, ly=W)
        )
        p = PlateModel(dm_p)
        p.options["verbose"] = False
        p.vc["ym"] = E
        p.vc["nu"] = 0.22
        p.vc["thickness"] = h
        p.vc["density"] = 2.33e-15  # kg/um^3 (silicon), for transient
        p.bc["left"].bc_type = "Clamped"
        p.bc["right"].bc_type = "Clamped"
        p.bc["bottom"].bc_type = "Symmetry"
        p.bc["top"].bc_type = "Symmetry"
        p.init()
        self.plate = p
        self.xp = np.asarray(dm_p.cell_centroid)[: dm_p.n_interior_cells, 0]

        # electrostatics: gap cross-section [0,L] x [0, g0]
        self.ny_gap = ny_gap
        dm_e = fvm.mesh.build_device_mesh(
            fvm.mesh.generate.quad_2d(nx, ny_gap, lx=L, ly=g0)
        )
        e = ElectricModel(dm_e)
        e.options["verbose"] = False
        e.bc["bottom"].bc_type = "SpecifiedPotential"  # ground electrode
        e.bc["bottom"]["specifiedPotential"] = 0.0
        e.bc["top"].bc_type = "SpecifiedPotential"
        e.bc["left"].bc_type = "Symmetry"
        e.bc["right"].bc_type = "Symmetry"
        e.init()
        self.elec = e
        cc = np.asarray(dm_e.cell_centroid)[: dm_e.n_interior_cells]
        self.xe, self.ye = cc[:, 0], cc[:, 1]

        # squeeze film on the plate mesh (vented ends, sealed sides)
        sq = SqueezeFilmModel(
            fvm.mesh.build_device_mesh(
                fvm.mesh.generate.quad_2d(nx, 3, lx=L, ly=W)
            )
        )
        sq.options["verbose"] = False
        sq.vc["viscosity"] = 1.8e-11  # MPa s (air)
        sq.vc["initialGap"] = g0
        sq.bc["left"].bc_type = "Dirichlet"
        sq.bc["right"].bc_type = "Dirichlet"
        sq.bc["bottom"].bc_type = "Symmetry"
        sq.bc["top"].bc_type = "Symmetry"
        sq.init()
        self.film = sq

        # contact against the ground plane (counter surface at gap 0)
        ct = ContactModel(dm_p, np.zeros((2, 2)))
        ct.vc["contactStiffness"] = 2e2   # MPa at full engagement
        ct.vc["contactGap"] = 0.1 * g0
        ct.vc["minimumGap"] = 1e-3 * g0
        self.contact = ct

    def electrostatic_pressure(self, w, V):
        """IBM electrostatics: mark cells above the deformed beam face as
        conductor at V, solve, return p_es(x) = eps0 E^2/2 at the
        surface (per plate interior cell)."""
        gap_x = np.interp(self.xe, self.xp, self.g0 - w)
        mask = self.ye > np.maximum(gap_x, 2.5 * self.g0 / self.ny_gap)
        self.elec.bc["top"]["specifiedPotential"] = float(V)
        self.elec.set_immersed_boundary(mask, float(V))
        self.elec.advance(2)
        E = np.linalg.norm(self.elec.getElectricField(), axis=1)
        # field magnitude in the topmost FLUID cell of each column
        ncol = self.nx
        p_es = np.zeros(ncol)
        col = np.round(
            (self.xe - self.xe.min())
            / (self.xe.max() - self.xe.min()) * (ncol - 1)
        ).astype(int)
        for c in range(ncol):
            sel = (col == c) & ~mask
            if sel.any():
                ytop = self.ye[sel].max()
                p_es[c] = EPS0 * float(E[sel][self.ye[sel] == ytop][0]) ** 2 / 2.0
        xcol = np.linspace(
            self.xe.min(), self.xe.max(), ncol
        )
        return np.interp(self.xp, xcol, p_es)

    def static_deflection(self, V, w0=None, iters=30):
        """Quasi-static equilibrium at bias V (None if pulled in)."""
        p = self.plate
        w = np.zeros_like(self.xp) if w0 is None else w0.copy()
        for it in range(iters):
            p_es = self.electrostatic_pressure(w, V)
            p_ct = self.contact.gap_force(self.g0 - w)
            load = np.zeros(p.mesh.n_cells)
            load[: p.mesh.n_interior_cells] = -p_es + p_ct
            p.set_pressure(load)
            p.state["u"] = p.state["u"] * 0.0
            p._initial_norm = None
            p.advance(4)
            w_new = -p.getDeflection()
            if np.abs(w_new - w).max() < 1e-6 * self.g0:
                return w_new
            w = 0.6 * w_new + 0.4 * w
            if w.max() > 0.95 * self.g0:
                return None  # pulled in (contact regime)
        return w

    def lumped_stiffness(self):
        """k = p A / w_max from a unit uniform pressure (beam's own)."""
        p = self.plate
        load = np.full(p.mesh.n_cells, -1e-3)  # 1 kPa down
        p.set_pressure(load)
        p.state["u"] = p.state["u"] * 0.0
        p._initial_norm = None
        p.advance(6)
        wmax = float(np.abs(p.getDeflection()).max())
        A = self.L * self.W
        return 1e-3 * A / wmax

    def dynamic_pullin(self, V, dt=2e-7, nsteps=160):
        """Transient snap-down at fixed V with squeeze damping + contact."""
        p = self.plate
        p.options["transient"] = True
        p.options["timeStep"] = dt
        p.init()  # rebuild with inertia terms
        w_prev = np.zeros_like(self.xp)
        traj = []
        for step in range(nsteps):
            w = np.clip(-p.getDeflection(), 0.0, 0.98 * self.g0)
            dwdt = (w - w_prev) / dt
            self.film.set_gap(
                np.maximum(self.g0 - w, 1e-2 * self.g0), -dwdt
            )
            self.film.advance(3)
            p_damp = self.film.get_field()  # resists closing
            p_es = self.electrostatic_pressure(w, V)
            p_ct = self.contact.gap_force(self.g0 - w)
            load = np.zeros(p.mesh.n_cells)
            load[: p.mesh.n_interior_cells] = -p_es + p_ct + p_damp
            p.set_pressure(load)
            p.advance(3)
            p.updateTime()
            w_prev = w
            traj.append(float(w.max()))
            if traj[-1] > self.g0 * (1 - 0.12):
                break
        return traj


def main():
    sw = MemsSwitch()
    g0 = sw.g0
    k = sw.lumped_stiffness()
    A = sw.L * sw.W
    V_pi_formula = np.sqrt(8.0 * k * g0**3 / (27.0 * EPS0 * A))
    print(f"lumped stiffness k = {k:.4g} MPa um (uniform-load)")
    print(f"parallel-plate pull-in estimate V_PI = {V_pi_formula:.2f} V")

    print("\nbias sweep (quasi-static, IBM electrostatics):")
    print("V [V]   w_max/g0")
    V_lo, V_hi = 0.0, None
    w = np.zeros_like(sw.xp)
    for V in np.linspace(0.2, 1.6, 8) * V_pi_formula:
        res = sw.static_deflection(V, w0=w)
        if res is None:
            V_hi = V
            print(f"{V:7.2f}  PULL-IN")
            break
        w = res
        V_lo = V
        print(f"{V:7.2f}  {w.max() / g0:8.4f}")
    if V_hi is None:
        print("no pull-in found in sweep range")
        return
    print(
        f"\nsimulated pull-in bracket: ({V_lo:.1f}, {V_hi:.1f}] V "
        f"vs formula {V_pi_formula:.1f} V"
    )

    print("\ntransient snap-down at V = 1.1 * V_PI "
          "(squeeze-film damped, contact-capped):")
    traj = sw.dynamic_pullin(1.1 * V_pi_formula)
    print("w_max/g0 trajectory:",
          " ".join(f"{x / g0:.3f}" for x in traj[::max(1, len(traj)//10)]))
    print(f"final w_max/g0 = {traj[-1] / g0:.3f} (contact-limited)")


if __name__ == "__main__":
    main()
