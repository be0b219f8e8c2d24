#!/usr/bin/env python
"""Cantilever-beam uncertainty quantification.

Counterpart of the reference's UQ driver
(reference: src/fvm/scripts/Simulator_Cantilever_UQ.py — a StructureModel
rebuilt with the Tangent/PC atypes to propagate a random Young's modulus
to the tip deflection).  Here the same study runs three ways:

  1. tangent linearization:  std(w_tip) ~ |d w_tip/dE| * std(E)
     via StructureModel.solve_tangent (one extra linear solve);
  2. Monte-Carlo sampling over E;
  3. analytic check: the end-loaded shear-dominated patch has
     w ~ 1/E so d(w)/dE = -w/E exactly.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np
import fvm_tpu as fvm
from fvm_tpu.models import StructureModel


def build(E):
    mesh = fvm.mesh.generate.quad_2d(40, 6, lx=1.0, ly=0.1)
    dm = fvm.mesh.build_device_mesh(mesh)
    m = StructureModel(dm)
    m.options["verbose"] = False
    m.vc["youngsModulus"] = E
    m.vc["poissonsRatio"] = 0.0
    m.bc["left"].bc_type = "SpecifiedDeformation"
    m.bc["right"].bc_type = "SpecifiedTraction"
    m.bc["right"]["specifiedYTraction"] = -1e4  # end shear load
    m.bc["top"].bc_type = "ZeroTraction"
    m.bc["bottom"].bc_type = "ZeroTraction"
    m.init()
    m.advance(15)
    return m


def tip_deflection(m):
    dm = m.mesh
    w = m.getDeformation()
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    return float(w[x > x.max() - 1e-6, 1].mean())


def main():
    E_mean, E_std = 1e9, 5e7  # 5% uncertain modulus

    m = build(E_mean)
    w0 = tip_deflection(m)
    print(f"tip deflection at E = {E_mean:.3g}: {w0:.6e}")

    # 1. tangent (one linear solve; reference: Tangent atype)
    dw = m.solve_tangent({"youngsModulus": 1.0})
    dm = m.mesh
    x = np.asarray(dm.cell_centroid)[: dm.n_interior_cells, 0]
    dtip_dE = float(dw[x > x.max() - 1e-6, 1].mean())
    lin_std = abs(dtip_dE) * E_std
    print(f"d(w_tip)/dE = {dtip_dE:.6e}  ->  linearized std = {lin_std:.4e}")
    print(f"  (exact-identity check -w/E: {-w0 / E_mean:.6e})")

    # 2. Monte-Carlo over E (small sample; the reference sweeps the same
    # way).  Reuse the one jitted model: scaling E scales mu/lam, so each
    # sample is a params update + re-solve — no re-init/recompile.
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    samples = rng.normal(E_mean, E_std, size=8)
    mu0, lam0 = m.params["mu"], m.params["lam"]

    def resolve(E):
        s = E / E_mean
        m.params = dict(m.params, mu=s * mu0, lam=s * lam0)
        m.state = dict(m.state, deformation=jnp.zeros_like(m.state["deformation"]))
        m._initial_norm = None
        m.advance(15)
        return tip_deflection(m)

    tips = np.array([resolve(E) for E in samples])
    print(
        f"MC (n=8): mean = {tips.mean():.6e}  std = {tips.std(ddof=1):.4e}"
    )
    print(f"tangent/MC std ratio: {lin_std / tips.std(ddof=1):.3f}")


if __name__ == "__main__":
    main()
