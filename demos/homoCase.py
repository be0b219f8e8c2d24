#!/usr/bin/env python
"""Two-way phase-field fracture <-> structure load-step driver.

Counterpart of the reference homoCase driver (reference:
demos/homoCase/homoCase.py — the 1031-line load-step loop: structure
equilibrium -> elastic energy density -> fracture source/sourcecoef
(:827-858, coef = 4 l_c psi/G_c + 1) -> phase-field solve with history
clamping -> stiffness degradation G*(d^2 + eta) back into the structure
model (:906-911) -> next displacement/traction increment), run on the
reference's own homoCase-10000.cas mesh.

Outputs the load-displacement curve and the damage statistics per load
step; damage localizes where the elastic energy concentrates and the
curve softens as stiffness degrades.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np
import fvm_tpu as fvm
from fvm_tpu.models import StructureModel, FractureModel
from fvm_tpu.io.fluent import read_fluent_mesh

REF = "/root/reference/demos/homoCase/homoCase-10000.cas"


def two_way_load_loop(dm, top_group, bot_group, free_groups,
                      E=1e9, nu=0.3, G_c=1.0, l_c=None,
                      n_load_steps=6, dtraction=2e5, n_picard=8,
                      pf_floor=1e-3, eta=1e-6, picard_tol=1e-4,
                      traction_axis="Y", verbose=True, notch=None,
                      loading="displacement", ddisp=None):
    """The reference's structure<->fracture equilibrium loop.

    ``loading``: "displacement" (the reference's DispStep protocol —
    stable through crack propagation, so the softening branch of the
    load-displacement curve is resolved) prescribes top displacements in
    increments of ``ddisp`` and records the top reaction force;
    "traction" prescribes traction increments ``dtraction`` and records
    the mean top displacement (no equilibrium exists past the peak
    load — expect failure to run away there).

    Returns (curve, d_hist, diag): curve rows are (displacement, load)
    ((load, displacement) for traction control); d_hist the final
    (irreversible) phase field; diag per-step dicts (picard iterations,
    converged flag, damaged count)."""
    nc_i = dm.n_interior_cells
    if l_c is None:
        # a couple of cells wide, like the reference's cLoC
        l_c = 2.0 * float(np.mean(dm.cell_volume[:nc_i]) ** (1.0 / dm.dim))

    s = StructureModel(dm)
    s.options["verbose"] = False
    s.vc["youngsModulus"] = E
    s.vc["poissonsRatio"] = nu
    s.bc[bot_group].bc_type = "SpecifiedDeformation"
    if loading == "displacement":
        s.bc[top_group].bc_type = "SpecifiedDeformation"
    else:
        s.bc[top_group].bc_type = "SpecifiedTraction"
    for g in free_groups:
        s.bc[g].bc_type = "ZeroTraction"
    s.init()

    f = FractureModel(dm)
    f.options["verbose"] = False
    f.options["transient"] = False
    f.vc["fractureConductivity"] = 4.0 * l_c * l_c
    for g in [top_group, bot_group] + list(free_groups):
        f.bc[g].bc_type = "SpecifiedFlux"
    f.init()

    d_hist = np.ones(nc_i)
    if notch is not None:
        # pre-damaged cells (the reference's crackPF initial crack)
        d_hist[np.asarray(notch)] = pf_floor
        f.state[f.var] = f.state[f.var].at[:nc_i].set(np.asarray(d_hist))
        s.set_stiffness_degradation(d_hist**2 + eta)
    H = np.zeros(nc_i)  # elastic-energy history (irreversibility)
    curve = [(0.0, 0.0)]
    diag = []
    axis = {"X": 0, "Y": 1, "Z": 2}[traction_axis.upper()]
    if loading == "displacement":
        bc_key = f"specified{traction_axis.upper()}Deformation"
        if ddisp is None:
            # a small fraction of the homogeneous AT2 damage-onset
            # displacement (measured: 0.5x fails the whole specimen in
            # one step on a 24^2 notch case; 0.05x resolves progressive
            # localized growth over ~8 steps)
            ddisp = 0.05 * float(np.sqrt(G_c / (4.0 * l_c * E)))
        dstep = ddisp
    else:
        bc_key = f"specified{traction_axis.upper()}Traction"
        dstep = dtraction
    top_sl = dm.group_faces(dm.group_by_name(top_group))

    for step in range(1, n_load_steps + 1):
        load = step * dstep
        s.bc[top_group][bc_key] = load
        converged = False
        for pic in range(n_picard):
            s.advance(8)
            H = np.maximum(H, s.getElasticEnergyDensity())
            # steady phase field: 4 l_c^2 lap d + 1 - (4 l_c H/G_c + 1) d = 0
            coef = np.zeros(dm.n_cells)
            coef[:nc_i] = 4.0 * l_c * H / G_c + 1.0
            f.set_driving_source(np.zeros(dm.n_cells), coef)
            f.advance(10)
            d = np.clip(f.getPhaseFieldValue(), pf_floor, 1.0)
            d_new = np.minimum(d_hist, d)  # irreversible damage
            delta = float(np.abs(d_new - d_hist).max())
            d_hist = d_new
            # clamp the model state to the history (the reference clamps
            # PhaseFieldA against PFHistoryField each sweep)
            f.state[f.var] = f.state[f.var].at[:nc_i].set(
                np.asarray(d_hist)
            )
            s.set_stiffness_degradation(d_hist**2 + eta)
            if delta < picard_tol and pic > 0:
                converged = True
                break
        s.advance(8)  # final equilibrium at the degraded stiffness
        if loading == "displacement":
            F = s.getBoundaryForceIntegral(top_group)
            curve.append((load, float(F[axis])))
        else:
            w = s.getDeformation()
            # mean displacement of the cells that own the loaded faces
            own = np.unique(np.asarray(dm.face_cell0[top_sl]))
            own = own[own < nc_i]
            curve.append((load, float(np.mean(w[own, axis]))))
        damaged = int((d_hist < 0.9).sum())
        diag.append({"step": step, "picard": pic + 1,
                     "converged": converged, "damaged_cells": damaged,
                     "min_d": float(d_hist.min())})
        if verbose:
            print(f"step {step}: ({curve[-1][0]:.3e}, {curve[-1][1]:.3e}),"
                  f" damaged {damaged} cells, min d {d_hist.min():.3f}, "
                  f"picard {pic+1} ({'ok' if converged else 'cap'})")
    return curve, d_hist, diag


def main():
    mesh = read_fluent_mesh(REF)
    dm = fvm.mesh.build_device_mesh(mesh)
    curve, d, diag = two_way_load_loop(
        dm, top_group="assembly.top", bot_group="assembly.bot",
        free_groups=["assembly.left", "assembly.right",
                     "assembly.front", "assembly.back"],
        E=1e9, nu=0.3, G_c=1.0, n_load_steps=8,
        loading="displacement",
    )
    print("\ndisplacement-load curve:")
    for u, F in curve:
        print(f"  {u:12.4e}  {F:12.5e}")
    print(f"final damage: min {d.min():.4f}, "
          f"{(d < 0.9).sum()} cells below 0.9")


if __name__ == "__main__":
    main()
