"""Diffusion synthetic acceleration for the kinetic COMET solvers.

The role of the reference's COMET coarse-model hierarchy
(phononbase/COMETModel.h:1080 MakeCoarseModel, :2800-2985 cycle): the
point-coupled (Woodbury / Sherman-Morrison) preconditioner handles the
local collision coupling but nothing accelerates the SMOOTH equilibrium
modes, whose error obeys a diffusion equation in the acoustically thick
regime — inner Krylov iterations then grow with optical thickness times
resolution.  The fix is a coarse correction on the equilibrium subspace:

    z = M_point(r) + P MT(R r)

with R a restriction onto the slow mode (energy / temperature), MT two
AMG V-cycles on the synthetic operator -div(k_eff grad), and P the
equilibrium-increment prolongation (dM/dT or C/4pi).  ADDITIVE
composition only: the multiplicative variant breaks BiCGStab on some
mesh sizes.  The synthetic operator must be CONDENSED before cycling —
the AMG hierarchy is built on the condensed pattern and the mismatch
diverges catastrophically.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def build_scalar_diffusion_cycles(model, k_eff: float, dirichlet_types):
    """Return M_T(rT): two condensed AMG V-cycles on the synthetic
    scalar diffusion operator over ``model.mesh`` (single-device).

    Boundary faces of groups whose bc_type is in ``dirichlet_types``
    keep their coupling (ghost rows are Dirichlet delta=0); all other
    boundary faces carry no flux."""
    from ..ops import assembly as _asm
    from ..ops.assembly import FaceFlux as _FF
    from ..linear import AMG as _AMG

    mesh0 = model.mesh
    dtype = mesh0.cell_volume.dtype
    dir_face = np.zeros(mesh0.n_faces, dtype=bool)
    for g, bc in model._group_bcs():
        if bc.bc_type in dirichlet_types:
            dir_face[mesh0.group_faces(g)] = True
    bnd = np.arange(mesh0.n_faces) >= mesh0.n_interior_faces
    keep = jnp.asarray(~bnd | dir_face)
    gamT = jnp.where(keep, float(k_eff) * mesh0.face_e_over_d, 0.0)
    A_T, _ = _asm.assemble(
        mesh0, _FF(F=jnp.zeros(mesh0.n_faces, dtype), dF_dO=gamT,
                   dF_dN=-gamT),
    )
    gh = slice(mesh0.n_interior_cells, mesh0.n_cells)
    A_T = A_T.replace(
        diag=A_T.diag.at[gh].set(1.0), off=A_T.off.at[:, gh].set(0.0)
    ).prepare()
    amg_T = _AMG(coarse_size=32)
    amg_T.setup_structure(*mesh0.host_cf())
    A2c, _b0, _rec0 = A_T.condense(jnp.zeros(mesh0.n_cells, dtype))
    M_T1 = amg_T.precond_setup(A2c)
    plan = None if A_T.dia is None else A_T.dia.cond_plan
    if plan is not None and plan.ok:
        er, es, ep, ir, ik, ie = plan.as_device()
        offv = jnp.where(A_T.mask, A_T.off, 0.0)  # (K, n)
        vE = jnp.where(es >= 0, offv[jnp.maximum(es, 0), er], 0.0)
        dE = A_T.diag[er]
        vIn = offv[ik, ir]

        def _fold(b):
            bE = b[er]
            b2 = b.at[ir].add(-vIn / dE[ie] * bE[ie])
            return b2.at[er].set(0.0)

        def _recover(x2, b):
            xE = (b[er] - vE * x2[ep]) / dE
            return x2.at[er].set(xE)
    else:
        _fold = lambda b: b
        _recover = lambda x2, b: x2

    def M_T(rT):
        r2 = _fold(rT)
        z = M_T1(r2)
        z = z + M_T1(r2 - A2c.mv(z))
        return _recover(z, rT)

    return M_T


class DSAPrecond:
    """Point preconditioner + additive equilibrium-subspace correction."""

    def __init__(self, point, M_T, wE, pcoef, alive):
        self.point = point
        self.M_T = M_T
        self.wE = wE
        self.pcoef = pcoef
        self.alive = alive

    def precond_setup(self, op):
        Mp = self.point.precond_setup(op)
        M_T, wE, pcoef, alive = self.M_T, self.wE, self.pcoef, self.alive

        def M(r):
            z1 = Mp(r)
            rT = jnp.einsum("cn,n->c", r, wE)
            dT = M_T(jnp.where(alive, rT, 0.0))
            z2 = jnp.where(alive, dT, 0.0)[:, None] * pcoef[None, :]
            return z1 + z2

        return M

    def precond_setup_T(self, op):
        """Transposed application for the adjoint solves: the additive
        composition transposes term by term,

            M^T = Mp^T + wE (x) M_T^T pcoef^T,

        i.e. the restriction/prolongation roles of wE and pcoef swap.
        M_T itself stands in for M_T^T: the synthetic diffusion operator
        is symmetric and the V-cycle near-symmetric, and a preconditioner
        only shapes convergence — BiCGStab on A^T stays exact."""
        Mp = self.point.precond_setup_T(op)
        M_T, wE, pcoef, alive = self.M_T, self.wE, self.pcoef, self.alive

        def MT(r):
            z1 = Mp(r)
            rT = jnp.einsum("cn,n->c", r, pcoef)
            dT = M_T(jnp.where(alive, rT, 0.0))
            z2 = jnp.where(alive, dT, 0.0)[:, None] * wE[None, :]
            return z1 + z2

        return MT
