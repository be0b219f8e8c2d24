"""SIMPLE-type block preconditioner for the coupled pressure-velocity
system.

The reference's coupled FlowModel (FlowModel_impl.h:1474 advanceCoupled)
hands the (dim+1)-block LinearSystem to its AMG; without multigrid on the
elliptic pressure block, plain Jacobi-preconditioned Krylov iteration
counts grow with mesh size and the coupled path loses to SIMPLE at scale
(measured: 24 s/outer at 1M cells vs 0.13 s segregated).

``CoupledSIMPLE`` applies one SIMPLE pass as the preconditioner
M^-1 (r_u, r_p):

  1. momentum predictor   dV* = r_u / diag_vv            (block Jacobi)
  2. continuity residual  r_p' = r_p - (P-V row) dV*     (one block SpMV)
  3. pressure correction  dp   = AMG cycles on the p-p scalar sub-matrix
                                 (the Rhie-Chow Df Laplacian — the exact
                                 stencil the segregated pressure AMG
                                 solves)
  4. velocity correction  dV   = dV* - (V-P column) dp / diag_vv

This is the block analogue of pairing the segregated pressure solve with
AMG; steps 2/4 are single BlockELL matvecs, step 3 reuses the scalar AMG
machinery (hierarchy built once per outer solve in precond_setup).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ell import ELLMatrix
from .amg import AMG
from .base import LinearSolver


class CoupledSIMPLE(LinearSolver):
    """SIMPLE block preconditioner; use inside BiCGStab on a BlockELL
    coupled system.  ``dia`` (optional) is the mesh's DIAInfo so the
    scalar pressure sub-matrix keeps the roll-based SpMV fast path."""

    def __init__(self, amg: AMG | None = None, cycles: int = 2, dia=None,
                 momentum: str = "jacobi", **kw):
        """``momentum``: "jacobi" (diagonal predictor, the classic SIMPLE
        distributive form) or "amg" (AMG cycles on the scalar momentum
        stencil, one hierarchy shared by all velocity components).  The
        momentum block is ELLIPTIC at practical resolutions (cell Peclet
        u dx / 2 nu < 1 from ~256^2 up on the cavity benches), so a
        diagonal predictor degrades like sqrt(kappa) ~ O(n_1d): measured,
        the exact-Newton inner BiCGStab needs ~400 iterations at 32^2 and
        makes NO progress in hundreds of iterations at 256^2-512^2, while
        momentum-AMG keeps it bounded.  Used by flow.advanceNewton."""
        super().__init__(**kw)
        self.amg = amg or AMG(coarse_size=256)
        self.cycles = int(cycles)
        self.dia = dia
        self.momentum = momentum

    def setup_structure(self, cols, mask) -> None:
        """Host-side AMG aggregation for the pressure block (call once per
        mesh, like AMG.setup_structure)."""
        self.amg.setup_structure(cols, mask)

    def precond_setup(self, Ab):
        B = Ab.block
        dim = B - 1
        idx = jnp.arange(dim)
        dvv = Ab.diag[:, idx, idx]  # (n, dim) momentum diagonals
        dvv = jnp.where(jnp.abs(dvv) > 0.0, dvv, 1.0)

        Ap = ELLMatrix(
            diag=Ab.diag[:, dim, dim],
            off=Ab.off[:, :, dim, dim],
            cols=Ab.cols,
            mask=Ab.mask,
            halo=Ab.halo,
            axis_name=Ab.axis_name,
            n_owned=Ab.n_owned,
            dia=self.dia,
        ).prepare()
        # mirror the scalar AMG's solve entry: the hierarchy built by
        # setup_structure matches the BOUNDARY-CONDENSED pattern, so the
        # pressure residual must be condensed per application (XLA hoists
        # the loop-invariant coefficient transform out of the Krylov
        # while_loop)
        from .base import condensed

        Ap2, _, _ = condensed(Ap, jnp.zeros(Ap.diag.shape[0], Ab.diag.dtype))
        Ap2 = Ap2.prepare() if hasattr(Ap2, "prepare") else Ap2
        levels, mats, denses = self.amg._build_hierarchy(Ap2)
        cycles = self.cycles
        amg = self.amg

        def pressure_solve(rp):
            A2, b2, recover = condensed(Ap, rp)
            dp = amg._cycle0(levels, mats, denses, b2)
            for _ in range(cycles - 1):
                dp = dp + amg._cycle0(levels, mats, denses, b2 - Ap2.mv(dp))
            return recover(dp)

        if self.momentum == "amg":
            # scalar momentum stencil: the vv block is dF * I (one face
            # flux linearization shared by every component), so ONE
            # hierarchy preconditions all dim components
            Av = ELLMatrix(
                diag=Ab.diag[:, 0, 0],
                off=Ab.off[:, :, 0, 0],
                cols=Ab.cols,
                mask=Ab.mask,
                halo=Ab.halo,
                axis_name=Ab.axis_name,
                n_owned=Ab.n_owned,
                dia=self.dia,
            ).prepare()
            Av2, _, _ = condensed(
                Av, jnp.zeros(Av.diag.shape[0], Ab.diag.dtype)
            )
            Av2 = Av2.prepare() if hasattr(Av2, "prepare") else Av2
            levels_v, mats_v, denses_v = self.amg._build_hierarchy(Av2)

            mom_cycles = int(getattr(self, "momentum_cycles", 1) or 1)

            def mom_solve_1(rv1):
                _, b2, recover = condensed(Av, rv1)
                dv = amg._cycle0(levels_v, mats_v, denses_v, b2)
                for _ in range(mom_cycles - 1):
                    dv = dv + amg._cycle0(
                        levels_v, mats_v, denses_v, b2 - Av2.mv(dv)
                    )
                return recover(dv)

            def mom_solve(rv):
                return jnp.stack(
                    [mom_solve_1(rv[:, d]) for d in range(dim)], axis=1
                )
        else:
            mom_solve = lambda rv: rv / dvv

        def M(r):
            rv, rp = r[:, :dim], r[:, dim]
            dVs = mom_solve(rv)
            q = jnp.concatenate([dVs, jnp.zeros_like(rp)[:, None]], axis=1)
            rp2 = rp - Ab.mv(q)[:, dim]
            dp = pressure_solve(rp2)
            q2 = jnp.concatenate(
                [jnp.zeros_like(dVs), dp[:, None]], axis=1
            )
            dV = dVs - mom_solve(Ab.mv(q2)[:, :dim])
            return jnp.concatenate([dV, dp[:, None]], axis=1)

        return M
