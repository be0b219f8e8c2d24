"""Passive particle tracking through a cell velocity field.

Counterpart of the reference's FVMParticles (FVMParticles.h) and the MPM
particle containers (MPM_Particles.h:15) in their tracer role.  Particles
advect with RK2; the velocity at a particle is the gradient-corrected
inverse-distance interpolation over the k nearest cells,

    u(x) = sum_i w_i [u_i + G_i . (x - x_i)] / sum_i w_i,

which is EXACT for linear velocity fields (second-order in space; the
plain nearest-centroid sampling is piecewise constant / first-order).
The cell gradients come from the mesh's least-squares machinery.
"""

from __future__ import annotations

import numpy as np

from .search import KSearchTree


class ParticleTracker:
    def __init__(self, dmesh, k: int = 4):
        self.mesh = dmesh
        self.k = int(k)
        self.cc = np.asarray(dmesh.cell_centroid)[: dmesh.n_interior_cells]
        self.tree = KSearchTree(self.cc)

    def _velocity_gradient(self, cell_velocity) -> np.ndarray:
        """LS cell gradients of the velocity, (n_interior, m, dim)."""
        import jax.numpy as jnp

        from ..core import bcs as bck
        from ..ops.gradients import ls_gradient_coefficients, gradient

        dm = self.mesh
        v = np.asarray(cell_velocity, dtype=float)
        full = jnp.zeros((dm.n_cells,) + v.shape[1:], dm.cell_volume.dtype)
        full = full.at[: v.shape[0]].set(jnp.asarray(v, full.dtype))
        full = bck.extend_to_ghosts(dm, full)
        coeff = getattr(self, "_grad_coeff", None)
        if coeff is None:
            coeff = self._grad_coeff = ls_gradient_coefficients(dm)
        G = gradient(dm, coeff, full)
        return np.asarray(G[: dm.n_interior_cells])

    def velocity_at(self, positions, cell_velocity, grad=None) -> np.ndarray:
        p = np.asarray(positions, dtype=np.float64)
        v = np.asarray(cell_velocity, dtype=np.float64)
        kk = min(self.k, len(self.cc))
        d, idx = self.tree.query_batch(p, kk)
        d = np.asarray(d).reshape(len(p), kk)
        idx = np.asarray(idx).reshape(len(p), kk)
        w = 1.0 / np.maximum(d, 1e-12)
        w = w / w.sum(axis=1, keepdims=True)
        vals = v[idx]  # (np, k, m)
        if grad is not None:
            dx = p[:, None, :] - self.cc[idx]  # (np, k, dim)
            vals = vals + np.einsum("pkmd,pkd->pkm", grad[idx], dx)
        return np.einsum("pk,pkm->pm", w, vals)

    def step(self, positions, cell_velocity, dt, grad=None) -> np.ndarray:
        """One RK2 advection step; returns updated positions."""
        p = np.asarray(positions, dtype=np.float64)
        if grad is None:
            grad = self._velocity_gradient(cell_velocity)
        v1 = self.velocity_at(p, cell_velocity, grad)
        mid = p + 0.5 * dt * v1
        v2 = self.velocity_at(mid, cell_velocity, grad)
        return p + dt * v2

    def track(self, positions, cell_velocity, dt, n_steps) -> np.ndarray:
        """Track particles; returns trajectory (n_steps+1, n, dim)."""
        grad = self._velocity_gradient(cell_velocity)
        traj = [np.asarray(positions, dtype=np.float64)]
        for _ in range(n_steps):
            traj.append(self.step(traj[-1], cell_velocity, dt, grad))
        return np.stack(traj)
