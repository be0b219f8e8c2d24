"""Passive particle tracking through a cell velocity field.

Counterpart of the reference's FVMParticles (FVMParticles.h) and the MPM
particle containers (MPM_Particles.h:15) in their tracer role.  Particles
advect with RK2 through the cell-centred velocity, located by nearest cell
centroid (kd-tree); jit-friendly batch stepping.
"""

from __future__ import annotations

import numpy as np

from .search import KSearchTree


class ParticleTracker:
    def __init__(self, dmesh):
        self.mesh = dmesh
        cc = np.asarray(dmesh.cell_centroid)[: dmesh.n_interior_cells]
        self.tree = KSearchTree(cc)

    def velocity_at(self, positions, cell_velocity) -> np.ndarray:
        _, idx = self.tree.query_batch(positions, 1)
        return np.asarray(cell_velocity)[idx]

    def step(self, positions, cell_velocity, dt) -> np.ndarray:
        """One RK2 advection step; returns updated positions."""
        p = np.asarray(positions, dtype=np.float64)
        v1 = self.velocity_at(p, cell_velocity)
        mid = p + 0.5 * dt * v1
        v2 = self.velocity_at(mid, cell_velocity)
        return p + dt * v2

    def track(self, positions, cell_velocity, dt, n_steps) -> np.ndarray:
        """Track particles; returns trajectory (n_steps+1, n, dim)."""
        traj = [np.asarray(positions, dtype=np.float64)]
        for _ in range(n_steps):
            traj.append(self.step(traj[-1], cell_velocity, dt))
        return np.stack(traj)
