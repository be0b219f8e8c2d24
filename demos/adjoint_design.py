"""Adjoint-based design optimization (beyond the reference).

The reference's Tangent atype (atypes/tangent_double/atype.h:10) is
forward-mode only: each design variable costs a full re-solve, so
field-valued design (one variable per cell) is out of reach.  fvm_tpu's
``solve_adjoint`` returns the gradient of a scalar objective w.r.t. an
ENTIRE parameter field from one transposed solve, making gradient
descent over thousands of design variables routine.

Demo: conductivity-field design on a heated slab.  A unit square
conducts heat from a hot left wall (400 K) to a cold right wall
(300 K); the top/bottom are adiabatic.  A fixed budget of
high-conductivity material (mean k = 1, bounds 0.2 <= k <= 5) is
distributed to MINIMIZE the heat flux entering at the hot wall
(insulation design).  Each iteration: solve, adjoint gradient,
projected-gradient step onto the budget/bounds set.

Run: python demos/adjoint_design.py  (CPU ok: set jax_platforms first)
"""

import os
import sys

if os.environ.get("FVM_DEMO_CPU", "1") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

import fvm_tpu as fvm
from fvm_tpu.models import ThermalModel


def build(k_field, n=24):
    dm = fvm.mesh.build_device_mesh(fvm.mesh.generate.quad_2d(n, n))
    t = ThermalModel(dm)
    t.options["verbose"] = False
    t.vc["thermalConductivity"] = k_field
    t.bc["left"].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = 400.0
    t.bc["right"].bc_type = "SpecifiedTemperature"
    t.bc["right"]["specifiedTemperature"] = 300.0
    t.bc["top"].bc_type = "Symmetry"
    t.bc["bottom"].bc_type = "Symmetry"
    t.init()
    t.advance(40)
    return t


def project(k, budget=1.0, lo=0.2, hi=5.0, iters=60):
    """Project onto {mean(k) = budget, lo <= k <= hi} (bisection on the
    shift, exact for the box-plus-mean constraint set)."""
    s_lo, s_hi = lo - k.max(), hi - k.min()
    for _ in range(iters):
        s = 0.5 * (s_lo + s_hi)
        if np.clip(k + s, lo, hi).mean() < budget:
            s_lo = s
        else:
            s_hi = s
    return np.clip(k + 0.5 * (s_lo + s_hi), lo, hi)


def main():
    n = int(os.environ.get("FVM_DESIGN_N", "24"))
    steps = int(os.environ.get("FVM_DESIGN_STEPS", "12"))
    t0 = build(1.0, n)
    nc = t0.mesh.n_interior_cells
    # uniform k is a stationary point of the flux under the mean-k
    # constraint (symmetric maximum: AM-HM equality) — break the
    # symmetry so projected gradient descent can leave it
    k = project(1.0 + 0.05 * np.random.default_rng(0).standard_normal(nc))

    # objective: heat flux magnitude through the hot wall (minimize)
    def hot_wall_flux(t):
        return float(t.getHeatFluxIntegral("left"))

    print(f"# {nc} design variables (one per cell)")
    lr = 2.0
    J_prev = None
    from fvm_tpu.ops import discretizations as disc
    from fvm_tpu.ops.gradients import gradient

    for it in range(steps):
        t = build(k, n)
        J = hot_wall_flux(t)

        # adjoint gradient of the same objective, via the model's OWN
        # flux discretization (the 2-arg functional also captures the
        # explicit k-dependence of the integral); ghost T values are
        # closed over from the converged state — exact for a Dirichlet
        # wall, where the ghost holds the fixed wall temperature
        grp = t.mesh.group_by_name("left")
        T_tail = jnp.asarray(t.state["T"])[nc:]

        def functional(T_int, params):
            T_full = jnp.concatenate([T_int, T_tail])

            def face_flux(m, T, kk, grad_coeff=None):
                gamma_f = disc.harmonic_face_gamma(m, kk)
                gradT = (
                    gradient(m, grad_coeff, T)
                    if grad_coeff is not None
                    else None
                )
                return disc.diffusion_flux(m, T, gamma_f, gradT).F

            args = (T_full, params["k_cell"])
            if "grad_coeff" in params:
                args = args + (params["grad_coeff"],)
            F = t._map_mesh(face_flux, *args)
            return -t._sum_group(grp, F)  # heat INTO the domain

        gK = t.solve_adjoint(functional, ["k_cell"])["k_cell"]
        k = project(k - lr * gK / (np.abs(gK).max() + 1e-30))
        drop = "" if J_prev is None else f"  ({J - J_prev:+.4f})"
        print(f"iter {it:2d}: hot-wall flux J = {J:.4f}{drop}")
        J_prev = J

    Jfinal = hot_wall_flux(build(k, n))
    print(f"final: J = {Jfinal:.4f}; k in [{k.min():.2f}, {k.max():.2f}], "
          f"mean {k.mean():.3f}")
    if Jfinal >= 100.0:  # uniform-k flux is 100*1 = 100 exactly
        print("WARNING: no improvement over uniform k", file=sys.stderr)
        return 1
    print("OK: insulation layout beats uniform conductivity")
    return 0


if __name__ == "__main__":
    sys.exit(main())
