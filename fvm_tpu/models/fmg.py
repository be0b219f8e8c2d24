"""Mesh-sequencing (full-multigrid style) warm start for flow solves.

The SIMPLE outer iteration propagates long-wavelength information one
stencil per step, so the lid-driven-cavity "spin-up" phase costs O(N)
outer iterations on an N^2 mesh — measured ~6000 outers at 1024^2 just
to reach a 1e-3 relative residual.  Classic mesh sequencing sidesteps
it: converge the flow on a coarser mesh first (where outers are both
cheaper and fewer), interpolate (prolong) the converged state onto the
fine mesh, and let the fine solve start from a field that is already
steady up to the coarse level's truncation error.

The reference solver has no counterpart (its drivers always cold-start,
e.g. testFlowParallel.py); this is a TPU-native convergence feature
motivated by BASELINE.md target #2 (wall time to 1e-6 on 1M cells).

Design notes (TPU):
- The prolongation itself runs on the HOST (numpy + kd-tree): inverse-
  distance interpolation from the k nearest coarse interior centroids
  to every fine centroid.  Host-side is deliberate — a jitted gather
  graph over 1M cells would cost a multi-minute remote compile on the
  axon backend for a one-shot operation (see CLAUDE.md).
- Only the interior mass flux needs a device-side init (it feeds the
  first momentum convection); it is ONE small jit
  (cells_to_faces + dot) on the fine mesh.  Boundary-face mass flux is
  rebuilt from the BCs inside every step, so it needs no init.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..geom.search import KSearchTree


def interp_to_points(
    coarse_mesh, points, values, k: int = 4, grad: bool = False
) -> np.ndarray:
    """IDW-interpolate per-interior-cell values onto arbitrary points
    (host side).

    values: (n_coarse_interior, m).  Returns (len(points), m).
    grad=True adds the gradient-corrected term u_i + G_i.(x - x_i) per
    neighbor (exact for linear fields, second-order prolongation); the
    coarse LS gradient is one small jit on the coarse mesh's shapes.
    """
    cc = np.asarray(coarse_mesh.host.cell_centroid, dtype=np.float64)
    cc = cc[: coarse_mesh.n_interior_cells]
    fc = np.asarray(points, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    if v.ndim == 1:
        v = v[:, None]
    kk = min(int(k), len(cc))
    tree = KSearchTree(cc)
    d, idx = tree.query_batch(fc, kk)
    d = np.asarray(d).reshape(len(fc), kk)
    idx = np.asarray(idx).reshape(len(fc), kk)
    w = 1.0 / np.maximum(d, 1e-12)
    w = w / w.sum(axis=1, keepdims=True)
    vals = v[idx]  # (nf, k, m)
    if grad:
        from ..geom.particles import ParticleTracker

        tr = ParticleTracker(coarse_mesh, k=kk)
        G = tr._velocity_gradient(v)  # (n_int, m, dim)
        dx = fc[:, None, :] - cc[idx]
        vals = vals + np.einsum("pkmd,pkd->pkm", G[idx], dx)
    return np.einsum("pk,pkm->pm", w, vals)


def interp_cell_field(
    coarse_mesh, fine_mesh, values, k: int = 4, grad: bool = False
) -> np.ndarray:
    """IDW-interpolate per-interior-cell values between meshes (host side).

    Returns (n_fine_cells_total, m) — ghost/padded fine cells get the
    value of their nearest coarse interior cells (ghosts are refreshed
    from BCs inside the step, so this is only a safe fill).
    """
    return interp_to_points(
        coarse_mesh,
        np.asarray(fine_mesh.host.cell_centroid, dtype=np.float64),
        values,
        k=k,
        grad=grad,
    )


def promote_state(src, dst) -> None:
    """Copy model state between two models on the SAME mesh, casting to
    the destination's dtypes — the f32 -> f64 promotion used for a final
    residual-polish phase (an f32 SIMPLE fixed point floors at a
    round-off-limited relative residual, measured ~4e-5 at 1M cells;
    the last decades to 1e-6 need f64 state).  The round trip goes
    through host numpy: device dtype conversions trigger remote
    compiles on the axon backend (see CLAUDE.md), a host cast does not.
    """
    if src.mesh.host is not dst.mesh.host and (
        src.mesh.n_cells != dst.mesh.n_cells
        or src.mesh.n_faces != dst.mesh.n_faces
    ):
        raise ValueError("promote_state: meshes differ in shape")
    restore_state(dst, snapshot_state(src))


def snapshot_state(src) -> dict:
    """Pull a model's device state to host numpy (promote_state's read
    half).  Use snapshot -> free the source model -> build the
    destination -> restore when BOTH models' device buffers would not fit
    in HBM at once (measured: f32+f64 1M-cell model pairs coexisting
    crash the 16GB v5e worker during the f64 Newton-polish handoff)."""
    return {
        k: np.asarray(v)
        for k, v in src.state.items()
        if hasattr(v, "dtype")
    }


def restore_state(dst, snap: dict) -> None:
    """Write a host state snapshot into a model, casting to its dtypes
    (promote_state's write half; host cast — device dtype conversions
    remote-compile on the axon backend)."""
    for key, host in snap.items():
        if key not in dst.state or not hasattr(dst.state[key], "dtype"):
            continue
        tgt = dst.state[key]
        dst.state[key] = jnp.asarray(
            host.astype(np.dtype(tgt.dtype)).reshape(tgt.shape)
        )


class _HostMeshShim:
    """Minimal (host.cell_centroid, n_interior_cells) view used to feed
    interp_to_points from a gathered distributed coarse model."""

    def __init__(self, centroids, n_interior):
        from types import SimpleNamespace

        self.host = SimpleNamespace(cell_centroid=centroids)
        self.n_interior_cells = int(n_interior)


def prolong_flow_state(coarse, fine, k: int = 4, grad: bool = True) -> None:
    """Warm-start `fine` (an initialized FlowModel) from `coarse`'s state.

    Interpolates velocity and pressure from the coarse model's interior
    cells onto every fine cell and rebuilds a consistent interior face
    mass flux from the interpolated velocity.  Either model may be
    distributed: a dist coarse is gathered to the host first (plain IDW —
    the gradient correction needs a single-device coarse mesh), and a
    dist fine scatters the interpolant through its Partition and rebuilds
    the mass flux per shard under shard_map (the reference always
    cold-starts, testFlowParallel.py; warm starts matter most at scale,
    which is exactly the multi-chip case).
    """
    from ..core import bcs as bck
    from ..ops import assembly

    vel = coarse.getVelocity()  # (n_int, dim) host numpy (gathers if dist)
    p = coarse.getPressure()[:, None]
    both_src = np.concatenate([vel, p], axis=1)
    if getattr(coarse, "partition", None) is not None:
        cmesh = _HostMeshShim(
            coarse.partition.geom.cell_centroid[
                : coarse.partition.mesh.n_interior_cells
            ],
            coarse.partition.mesh.n_interior_cells,
        )
        grad = False  # LS-gradient correction needs a single-device mesh
    else:
        cmesh = coarse.mesh

    import jax

    part = getattr(fine, "partition", None)
    if part is None:
        mesh = fine.mesh
        both = interp_to_points(
            cmesh, np.asarray(mesh.host.cell_centroid, np.float64),
            both_src, k=k, grad=grad,
        )
        dtype = np.dtype(fine.state["pressure"].dtype)
        V = jnp.asarray(both[:, : mesh.dim].astype(dtype))
        pr = jnp.asarray(both[:, mesh.dim].astype(dtype))

        # interior mass flux from the prolonged velocity (one small jit);
        # ghost velocities are BC-refreshed inside the step, the owner-
        # copy extension only feeds near-boundary interior faces' averages
        @jax.jit
        def _mdot(V, rho):
            Vg = bck.extend_to_ghosts(mesh, V)
            Vf = assembly.cells_to_faces_distance_weighted(mesh, Vg)
            rho_f = assembly.cells_to_faces_distance_weighted(mesh, rho)
            return rho_f * jnp.einsum("fd,fd->f", Vf, mesh.face_area)

        mdot = _mdot(V, fine.params["rho"])
    else:
        dim = part.mesh.dim
        # wrapped global centroids: every cell any shard owns (interior +
        # boundary ghosts + periodic partners at their wrapped positions)
        pts = np.asarray(part._ccn_wrapped, dtype=np.float64)
        both = interp_to_points(cmesh, pts, both_src, k=k, grad=grad)
        dtype = np.dtype(fine.state["pressure"].dtype)
        V = part.device_put(
            part.scatter_cells(both[:, :dim].astype(dtype))
        )
        pr = part.device_put(
            part.scatter_cells(both[:, dim].astype(dtype))
        )

        def _mdot_local(mesh, V, rho):
            Vg = bck.extend_to_ghosts(mesh, V)
            Vf = assembly.cells_to_faces_distance_weighted(mesh, Vg)
            rho_f = assembly.cells_to_faces_distance_weighted(mesh, rho)
            return rho_f * jnp.einsum("fd,fd->f", Vf, mesh.face_area)

        mdot = fine._smap_cells(_mdot_local)(
            fine.mesh, V, fine.params["rho"]
        )

    fine.state["velocity"] = V
    fine.state["pressure"] = pr
    fine.state["massFlux"] = mdot
    if "velocity_N1" in fine.state:
        fine.state["velocity_N1"] = V
    if "velocity_N2" in fine.state:
        fine.state["velocity_N2"] = V
