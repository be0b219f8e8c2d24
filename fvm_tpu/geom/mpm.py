"""Material-point method: particle container, explicit solver, FVM coupling.

TPU-native counterpart of the reference's MPM machinery:
  - ``MPM``: the particle container + file IO
    (reference: MPM_Particles.h:15, MPM_Particles.cpp Impl/read*),
  - ``MPMSolver``: the material-point SOLVE the reference delegates to an
    external program over MPI ports — here an in-process explicit MLS-MPM
    stepper (quadratic B-splines, APIC transfer, Neo-Hookean stress) whose
    whole substep is one jitted scatter/gather pipeline over a structured
    background grid (static 3^d stencil loops, no dynamic shapes),
  - ``MPMCoupling``: the updateMPM/acceptMPM exchange
    (reference: MPMCoupling.h:18) as in-process calls: the FVM side marks
    solid/IB cells from the particle cloud (geom.ibm.cell_mark_particles)
    and the particles sample the FVM fields at their positions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import config
from ..ops.bell import small_inv


# ---------------------------------------------------------------------------
# particle container (reference: MPM_Particles.h)


class MPM:
    """Particle cloud: coordinates, velocities, types, temperatures.

    File format (reference MPM_Particles.cpp setandwriteParticles /
    read{Coordinates,Velocities,Types,Temperatures}): a text file holding
    ``count`` then count coordinate triplets, count velocity triplets,
    count integer types (1 = surface, 0 = interior), count temperatures.
    Trailing sections may be absent (zeros are assumed).
    """

    def __init__(self, filename: str | None = None):
        self._coordinates = np.zeros((0, 3))
        self._velocities = np.zeros((0, 3))
        self._types = np.zeros(0, dtype=np.int32)
        self._temperatures = np.zeros(0)
        if filename is not None:
            self.Impl(filename)

    # reference API --------------------------------------------------------

    def Init(self, coordinates, velocities, types, temperatures):
        self._coordinates = np.asarray(coordinates, dtype=np.float64).reshape(-1, 3)
        n = len(self._coordinates)

        def _take(a, shape, dtype):
            if a is None:
                return np.zeros(shape, dtype=dtype)
            return np.asarray(a, dtype=dtype).reshape(shape)

        self._velocities = _take(velocities, (n, 3), np.float64)
        self._types = _take(types, (n,), np.int32)
        self._temperatures = _take(temperatures, (n,), np.float64)

    def getParticles(self) -> int:
        return len(self._coordinates)

    def getCoordinates(self):
        return self._coordinates

    def getVelocities(self):
        return self._velocities

    def getTypes(self):
        return self._types

    def getTemperatures(self):
        return self._temperatures

    def Impl(self, filename: str) -> None:
        vals = []
        with open(filename) as f:
            tokens = f.read().split()
        n = int(tokens[0])
        flat = np.array(tokens[1:], dtype=np.float64)
        need = [3 * n, 3 * n, n, n]
        out = []
        pos = 0
        for k in need:
            if pos + k <= len(flat):
                out.append(flat[pos : pos + k])
                pos += k
            else:
                out.append(None)
        coords = out[0].reshape(n, 3)
        vel = out[1].reshape(n, 3) if out[1] is not None else None
        types = out[2] if out[2] is not None else None
        temps = out[3] if out[3] is not None else None
        self.Init(coords, vel, types, temps)

    def setandwriteParticles(self, filename: str) -> None:
        n = self.getParticles()
        with open(filename, "w") as f:
            f.write(f"{n}\n")
            for a in (self._coordinates, self._velocities):
                for row in a:
                    f.write("%.6f\t%.6f\t%.6f\n" % tuple(row))
            for t in self._types:
                f.write(f"{int(t)}\n")
            for t in self._temperatures:
                f.write("%.6f\n" % t)


# ---------------------------------------------------------------------------
# explicit MLS-MPM solver


class MPMSolver:
    """Explicit material-point solver on a structured background grid.

    Quadratic B-spline shape functions, APIC particle<->grid transfer and
    Neo-Hookean elasticity (MLS-MPM force form).  The grid is a box
    [origin, origin + dims*h]; grid-boundary nodes are sticky (zero
    velocity), interior obstacles can be added via ``node_mask``.

    The per-substep pipeline (P2G scatter, grid update, G2P gather,
    advect) is one jitted function with STATIC 3^dim stencil loops — the
    TPU-friendly formulation of the traditional per-particle loops.
    """

    def __init__(self, origin, h: float, dims, dim: int | None = None,
                 youngs: float = 1e4, poisson: float = 0.3,
                 density: float = 1000.0, gravity=None,
                 particles_per_cell: int = 4):
        self.dim = int(dim if dim is not None else len(dims))
        self.origin = np.asarray(origin, dtype=np.float64)[: self.dim]
        self.h = float(h)
        self.dims = tuple(int(d) for d in dims)[: self.dim]  # cells per axis
        self.nodes = tuple(d + 1 for d in self.dims)
        self.E = float(youngs)
        self.nu = float(poisson)
        self.mu0 = self.E / (2 * (1 + self.nu))
        self.lam0 = self.E * self.nu / ((1 + self.nu) * (1 - 2 * self.nu))
        self.rho = float(density)
        g = np.zeros(self.dim)
        if gravity is not None:
            g[:] = np.asarray(gravity, dtype=np.float64)[: self.dim]
        self.gravity = g
        self.ppc = int(particles_per_cell)
        self.state = None
        self.time = 0.0

    # -- seeding -----------------------------------------------------------

    def seed_box(self, lo, hi, velocity=None):
        """Fill a box with ppc particles per cell (regular sub-lattice)."""
        lo = np.asarray(lo, dtype=np.float64)[: self.dim]
        hi = np.asarray(hi, dtype=np.float64)[: self.dim]
        per_axis = max(1, int(round(self.ppc ** (1.0 / self.dim))))
        sub = (np.arange(per_axis) + 0.5) / per_axis * self.h
        axes = []
        for d in range(self.dim):
            base = np.arange(lo[d], hi[d] - 1e-12, self.h)
            axes.append((base[:, None] + sub[None, :]).ravel())
        grids = np.meshgrid(*axes, indexing="ij")
        x = np.stack([g.ravel() for g in grids], axis=1)
        keep = np.all((x >= lo) & (x < hi), axis=1)
        x = x[keep]
        v = np.zeros_like(x)
        if velocity is not None:
            v[:] = np.asarray(velocity, dtype=np.float64)[: self.dim]
        self.add_particles(x, v)
        return len(x)

    def add_particles(self, x, v=None, mass=None):
        x = np.asarray(x, dtype=np.float64).reshape(-1, self.dim)
        n = len(x)
        v = (np.zeros((n, self.dim)) if v is None
             else np.asarray(v, dtype=np.float64).reshape(n, self.dim))
        vol = self.h**self.dim / self.ppc
        m = np.full(n, self.rho * vol) if mass is None else np.asarray(mass)
        dtype = config.dtype
        F = np.broadcast_to(np.eye(self.dim), (n, self.dim, self.dim))
        new = {
            "x": jnp.asarray(x, dtype),
            "v": jnp.asarray(v, dtype),
            "F": jnp.asarray(F, dtype),
            "C": jnp.zeros((n, self.dim, self.dim), dtype),
            "m": jnp.asarray(m, dtype),
            "V0": jnp.full(n, vol, dtype),
        }
        if self.state is None:
            self.state = new
        else:
            self.state = {
                k: jnp.concatenate([self.state[k], new[k]]) for k in new
            }

    # -- reference-container interop ---------------------------------------

    @classmethod
    def from_particles(cls, mpm: MPM, h: float, origin, dims, **kw):
        """Build a solver from an MPM container's cloud."""
        solver = cls(origin, h, dims, **kw)
        dim = solver.dim
        solver.add_particles(
            mpm.getCoordinates()[:, :dim], mpm.getVelocities()[:, :dim]
        )
        return solver

    def export_particles(self, mpm: MPM) -> None:
        """Write the solver state back into a reference-style container."""
        n = self.state["x"].shape[0]
        coords = np.zeros((n, 3))
        vel = np.zeros((n, 3))
        coords[:, : self.dim] = np.asarray(self.state["x"])
        vel[:, : self.dim] = np.asarray(self.state["v"])
        types = (mpm.getTypes() if mpm.getParticles() == n
                 else np.zeros(n, dtype=np.int32))
        temps = (mpm.getTemperatures() if mpm.getParticles() == n
                 else np.zeros(n))
        mpm.Init(coords, vel, types, temps)

    # -- stepping ------------------------------------------------------------

    def cfl_dt(self, safety: float = 0.3) -> float:
        """Elastic wave CFL: dt <= safety * h / c, c = sqrt(E/rho)."""
        c = np.sqrt(self.E / self.rho) + 1e-12
        vmax = float(jnp.max(jnp.linalg.norm(self.state["v"], axis=1)))
        return safety * self.h / max(c, vmax, 1e-12)

    def advance(self, dt: float, substeps: int | None = None):
        """Advance by dt using CFL-bounded substeps (one jitted scan)."""
        if substeps is None:
            substeps = max(1, int(np.ceil(dt / self.cfl_dt())))
        sdt = dt / substeps
        self.state = _mpm_advance(
            self.state, sdt, substeps, self.dim, self.h,
            tuple(self.origin.tolist()), self.nodes,
            self.mu0, self.lam0, tuple(self.gravity.tolist()),
        )
        self.time += dt
        return substeps

    def kinetic_energy(self) -> float:
        s = self.state
        return float(0.5 * jnp.sum(s["m"][:, None] * s["v"] ** 2))

    def momentum(self) -> np.ndarray:
        s = self.state
        return np.asarray(jnp.sum(s["m"][:, None] * s["v"], axis=0))


def _bspline_weights(fx):
    """Quadratic B-spline weights for offsets 0,1,2 around the base node.

    fx in [0.5, 1.5) is the particle position minus the base node, in grid
    units; returns (3, n, d)."""
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    return jnp.stack([w0, w1, w2])


@functools.partial(
    jax.jit,
    static_argnames=("substeps", "dim", "nodes", "origin", "gravity"),
)
def _mpm_advance(state, sdt, substeps, dim, h, origin, nodes, mu0, lam0,
                 gravity):
    org = jnp.asarray(origin, state["x"].dtype)
    grav = jnp.asarray(gravity, state["x"].dtype)
    nn = int(np.prod(nodes))
    strides = np.cumprod((1,) + nodes[::-1][:-1])[::-1].copy()  # C-order
    strides_j = jnp.asarray(strides.astype(np.int32))
    eye = jnp.eye(dim, dtype=state["x"].dtype)
    import itertools

    offsets = list(itertools.product(range(3), repeat=dim))

    def substep(state, _):
        x, v, F, C, m, V0 = (
            state["x"], state["v"], state["F"], state["C"], state["m"],
            state["V0"],
        )
        gx = (x - org) / h
        base = jnp.floor(gx - 0.5).astype(jnp.int32)  # (np, dim)
        fx = gx - base
        w = _bspline_weights(fx)  # (3, np, dim)

        # Neo-Hookean first Piola-Kirchhoff, MLS-MPM force coefficient
        # (closed-form det: no f64 LU/det lowering on TPU)
        if dim == 2:
            J = F[:, 0, 0] * F[:, 1, 1] - F[:, 0, 1] * F[:, 1, 0]
        else:
            J = (
                F[:, 0, 0] * (F[:, 1, 1] * F[:, 2, 2] - F[:, 1, 2] * F[:, 2, 1])
                - F[:, 0, 1] * (F[:, 1, 0] * F[:, 2, 2] - F[:, 1, 2] * F[:, 2, 0])
                + F[:, 0, 2] * (F[:, 1, 0] * F[:, 2, 1] - F[:, 1, 1] * F[:, 2, 0])
            )
        FinvT = jnp.swapaxes(small_inv(F), -1, -2)
        P = mu0 * (F - FinvT) + lam0 * jnp.log(jnp.maximum(J, 1e-6))[
            :, None, None
        ] * FinvT
        stress = (-sdt * V0 * 4.0 / (h * h))[:, None, None] * jnp.einsum(
            "nij,nkj->nik", P, F
        )
        affine = stress + m[:, None, None] * C

        grid_mv = jnp.zeros((nn, dim), x.dtype)
        grid_m = jnp.zeros(nn, x.dtype)
        flat_base = (base * strides_j[None, :]).sum(axis=1)
        for off in offsets:
            wgt = jnp.ones(x.shape[0], x.dtype)
            for d in range(dim):
                wgt = wgt * w[off[d], :, d]
            dpos = (jnp.asarray(off, x.dtype)[None, :] - fx) * h
            idx = flat_base + int(np.dot(off, strides))
            mv = wgt[:, None] * (
                m[:, None] * v + jnp.einsum("nij,nj->ni", affine, dpos)
            )
            grid_mv = grid_mv.at[idx].add(mv)
            grid_m = grid_m.at[idx].add(wgt * m)

        gv = grid_mv / jnp.maximum(grid_m, 1e-30)[:, None]
        gv = gv + sdt * grav[None, :]
        # sticky box boundary: zero velocity on the outermost node layers
        idx_nd = jnp.stack(
            jnp.unravel_index(jnp.arange(nn), nodes), axis=1
        )
        boundary = jnp.zeros(nn, bool)
        for d in range(dim):
            boundary = boundary | (idx_nd[:, d] <= 0) | (
                idx_nd[:, d] >= nodes[d] - 1
            )
        gv = jnp.where(boundary[:, None], 0.0, gv)
        gv = jnp.where(grid_m[:, None] > 0, gv, 0.0)

        # G2P
        v_new = jnp.zeros_like(v)
        C_new = jnp.zeros_like(C)
        for off in offsets:
            wgt = jnp.ones(x.shape[0], x.dtype)
            for d in range(dim):
                wgt = wgt * w[off[d], :, d]
            dpos = (jnp.asarray(off, x.dtype)[None, :] - fx) * h
            idx = flat_base + int(np.dot(off, strides))
            gvi = gv[idx]
            v_new = v_new + wgt[:, None] * gvi
            C_new = C_new + (4.0 / (h * h)) * wgt[:, None, None] * jnp.einsum(
                "ni,nj->nij", gvi, dpos
            )
        x_new = x + sdt * v_new
        F_new = jnp.einsum("nij,njk->nik", eye + sdt * C_new, F)
        return dict(state, x=x_new, v=v_new, F=F_new, C=C_new), None

    state, _ = jax.lax.scan(substep, state, None, length=substeps)
    return state


# ---------------------------------------------------------------------------
# FVM coupling (reference: MPMCoupling.h updateMPM/acceptMPM)


class MPMCoupling:
    """In-process MPM <-> FVM exchange.

    The reference couples a separate MPM executable over MPI ports; here
    the solver lives in-process and the two calls keep their names:
      updateMPM(dt): advance the material points by the FVM time step and
        refresh the container (positions/velocities the FVM side reads).
      acceptMPM(model): mark the FVM model's cells covered by the particle
        cloud as solid/IB (geom.ibm.cell_mark_particles) and pin them to
        the particle velocity/temperature — the same role as the
        reference's IB-through-particles pipeline.
    """

    def __init__(self, mpm: MPM, solver: MPMSolver):
        self.mpm = mpm
        self.solver = solver
        self.timeMPM = 0.0

    def updateMPM(self, dt: float) -> None:
        self.solver.advance(dt)
        self.solver.export_particles(self.mpm)
        self.timeMPM = self.solver.time

    def acceptMPM(self, host_mesh, radius: float | None = None) -> np.ndarray:
        """Mark the FVM mesh cells covered by the particle cloud.

        Returns the per-cell ibType array (SOLID/IB/FLUID, see
        geom.ibm.IBType) for the HOST mesh; feed the solid/IB mask plus a
        particle-sampled value into the model's set_immersed_boundary.
        """
        from .ibm import cell_mark_particles

        r = self.solver.h if radius is None else radius
        coords = self.mpm.getCoordinates()[:, : host_mesh.dim]
        return cell_mark_particles(host_mesh, coords, r)

    def sample_particle_field(self, host_mesh, cell_values) -> np.ndarray:
        """Interpolate an FVM cell field to the particle positions
        (nearest-cell sampling via the geometry search tree) — the data the
        reference ships back over the MPM port."""
        from .search import KSearchTree
        from ..mesh.metrics import compute_geometry

        geom = compute_geometry(host_mesh)
        cc = geom.cell_centroid[: host_mesh.n_interior_cells]
        tree = KSearchTree(cc)
        pts = self.mpm.getCoordinates()[:, : host_mesh.dim]
        _, idx = tree.query_batch(pts, 1)
        vals = np.asarray(cell_values)[np.asarray(idx).reshape(-1)]
        return vals
