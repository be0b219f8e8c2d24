"""SPIKE solver / preconditioner, TPU-native.

Counterpart of the reference's SPIKE banded parallel solver (reference:
src/fvm/src/modules/fvmbase/SpikeSolver.h:21, SpikeMatrix.h:20,
SpikeStorage.h:15): there, each MPI rank factors its local band and the
ranks couple through a small reduced "spike" system at the partition
interfaces.

TPU-native reformulation (truncated SPIKE, Polizzi & Sameh 2006): the
role of "ranks" is played by fixed-length CHUNKS of the tridiagonal band
along the mesh's natural line ordering (slot-major structured meshes
couple x-neighbors at DIA offsets +-1):

  1. every chunk solves its local tridiagonal with a batched Thomas
     sweep (lax.scan over the chunk length, all chunks in the batch
     dimension — the sequential span is L, not n);
  2. the left/right spike tips v = T^-1 e_1, w = T^-1 e_L couple
     adjacent chunks; with diagonal dominance the far tips decay, so the
     reduced system splits into INDEPENDENT 2x2 interface solves (the
     truncated variant) — all interfaces in parallel;
  3. the interior is corrected with the spike vectors.

The off-band couplings (the +-nx diagonals of a 2D mesh) stay with the
outer Krylov iteration, making this a line-relaxation preconditioner —
the standard cure for the stretched/anisotropic meshes the reference
deploys SPIKE on.  Line ends decouple automatically (their +-1
coefficients are zero), so chunk boundaries may fall anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ell import ELLMatrix
from .base import LinearSolver, SolveStats, condensed, prepared


def _thomas(a, d, c, r):
    """Batched Thomas solve of tridiagonal chunks.

    a, d, c: (m, L) sub/diag/super coefficients (a[:, 0] and c[:, -1]
    belong to neighbor chunks and must NOT be included — pass them
    zeroed).  r: (m, L, k) right-hand sides.  Returns x (m, L, k).
    """
    aT = jnp.swapaxes(a, 0, 1)[..., None]  # (L, m, 1)
    dT = jnp.swapaxes(d, 0, 1)[..., None]
    cT = jnp.swapaxes(c, 0, 1)[..., None]
    rT = jnp.swapaxes(r, 0, 1)  # (L, m, k)

    def fwd(carry, inp):
        w_prev, g_prev = carry
        ai, di, ci, ri = inp
        denom = di - ai * w_prev
        denom = jnp.where(jnp.abs(denom) > 0.0, denom, 1.0)
        w = ci / denom
        g = (ri - ai * g_prev) / denom
        return (w, g), (w, g)

    zero_w = jnp.zeros_like(dT[0])
    zero_g = jnp.zeros_like(rT[0])
    _, (w, g) = jax.lax.scan(fwd, (zero_w, zero_g), (aT, dT, cT, rT))

    def bwd(x_next, inp):
        wi, gi = inp
        x = gi - wi * x_next
        return x, x

    _, xT = jax.lax.scan(bwd, jnp.zeros_like(rT[0]), (w, g), reverse=True)
    return jnp.swapaxes(xT, 0, 1)  # (m, L, k)


def spike_apply(a_full, d_full, c_full, r, L, axis=None, axis_size=1,
                psub=None, psup=None):
    """Truncated-SPIKE application M(r) ~ T^-1 r for the global
    tridiagonal T = tridiag(a, d, c) of size n (padded to m*L).

    r: (n,) or (n, k).

    ``axis``: SPMD mode (the reference's cross-RANK spike system,
    SpikeStorage.h:15): the full tridiagonal is the concatenation of the
    per-shard bands along a named mesh axis; ``a_full[0]``/``c_full[-1]``
    hold the CROSS-SHARD couplings to the previous/next shard's adjacent
    row.  The truncated reduced system then has one extra 2x2 interface
    per shard boundary, solved from the neighbor shards' spike tips and
    chunk-end values exchanged with two tiny ``lax.ppermute``s (rides the
    ICI, no host round trip).  Requires n divisible by L."""
    n = d_full.shape[0]
    squeeze = r.ndim == 1
    if squeeze:
        r = r[:, None]
    k = r.shape[1]
    m = -(-n // L)
    pad = m * L - n

    def padv(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        ) if pad else x

    a = padv(a_full, 0.0).reshape(m, L)
    d = padv(d_full, 1.0).reshape(m, L)
    c = padv(c_full, 0.0).reshape(m, L)
    rr = padv(r, 0.0).reshape(m, L, k)

    # couplings that cross chunk boundaries move to the spike RHS
    a_cross = a[:, 0]  # couples chunk j row 0 to chunk j-1 row L-1
    c_cross = c[:, -1]  # couples chunk j row L-1 to chunk j+1 row 0
    a_in = a.at[:, 0].set(0.0)
    c_in = c.at[:, -1].set(0.0)

    # one batched Thomas for [r | a_cross e_1 | c_cross e_L]
    e1 = jnp.zeros((m, L, 1), r.dtype).at[:, 0, 0].set(a_cross)
    eL = jnp.zeros((m, L, 1), r.dtype).at[:, -1, 0].set(c_cross)
    sol = _thomas(a_in, d, c_in, jnp.concatenate([rr, e1, eL], axis=2))
    y = sol[:, :, :k]  # (m, L, k)
    v = sol[:, :, k]  # (m, L) left spike
    w = sol[:, :, k + 1]  # (m, L) right spike

    # truncated reduced system: independent 2x2 solves per interface
    #   b_j     + w_j[L-1] t_{j+1} = y_j[L-1]
    #   v_{j+1}[0] b_j + t_{j+1}   = y_{j+1}[0]
    wL = w[:-1, -1]  # (m-1,)
    v0 = v[1:, 0]
    det = 1.0 - wL * v0
    det = jnp.where(jnp.abs(det) > 0.0, det, 1.0)
    yb = y[:-1, -1, :]  # (m-1, k)
    yt = y[1:, 0, :]
    b = (yb - wL[:, None] * yt) / det[:, None]  # x_j[L-1], j = 0..m-2
    t = (yt - v0[:, None] * yb) / det[:, None]  # x_{j+1}[0]

    zero = jnp.zeros((1, k), r.dtype)
    b_prev = jnp.concatenate([zero, b], axis=0)  # (m, k): b_{j-1}
    t_next = jnp.concatenate([t, zero], axis=0)  # (m, k): t_{j+1}
    if axis is not None:
        # cross-shard interfaces (the reference's inter-rank spike
        # system, SpikeStorage.h:15): chunks whose left/right coupling
        # crosses the shard boundary solve the same truncated 2x2
        # against the PARTNER CHUNK on the neighbor shard.  Two tiny
        # lax.ppermute rounds ship every chunk's edge tips (v0, w_L)
        # and chunk-end values (y_top, y_bot); static partner tables
        # (psub/psup from SpikeSolver.setup_structure_dist) pick the
        # matching chunk — multiple line segments per shard pair up
        # independently.  Missing partners keep the in-shard values.
        S = axis_size
        from_next = lambda x: jax.lax.ppermute(
            x, axis, [(i + 1, i) for i in range(S - 1)]
        )
        from_prev = lambda x: jax.lax.ppermute(
            x, axis, [(i, i + 1) for i in range(S - 1)]
        )
        v0n = from_next(v[:, 0])  # (m,) next shard's chunk left tips
        ytn = from_next(y[:, 0, :])  # (m, k)
        wlp = from_prev(w[:, -1])  # prev shard's chunk right tips
        ybp = from_prev(y[:, -1, :])
        has_sub = psub >= 0
        has_sup = psup >= 0
        pL = jnp.clip(psub, 0)
        pR = jnp.clip(psup, 0)
        det_l = 1.0 - wlp[pL] * v[:, 0]
        det_l = jnp.where(jnp.abs(det_l) > 0.0, det_l, 1.0)
        bL = (ybp[pL] - wlp[pL][:, None] * y[:, 0, :]) / det_l[:, None]
        det_r = 1.0 - w[:, -1] * v0n[pR]
        det_r = jnp.where(jnp.abs(det_r) > 0.0, det_r, 1.0)
        tR = (ytn[pR] - v0n[pR][:, None] * y[:, -1, :]) / det_r[:, None]
        b_prev = jnp.where(has_sub[:, None], bL, b_prev)
        t_next = jnp.where(has_sup[:, None], tR, t_next)

    # interior correction: x_j = y_j - v_j b_{j-1} - w_j t_{j+1}
    x = y - v[:, :, None] * b_prev[:, None, :] - w[:, :, None] * t_next[:, None, :]
    x = x.reshape(m * L, k)[:n]
    return x[:, 0] if squeeze else x


class SpikeSolver(LinearSolver):
    """Truncated-SPIKE line solver / preconditioner.

    ``chunk``: Thomas chunk length L (the sequential span of the scan;
    the parallel "rank count" is n/L).  Falls back to damped Jacobi when
    the matrix has no DIA +-1 band (e.g. unstructured orderings or
    per-shard matrices), so it stays usable anywhere.
    """

    def __init__(self, chunk: int = 64, omega: float = 1.0, **kw):
        kw.setdefault("max_iterations", 50)
        super().__init__(**kw)
        self.chunk = int(chunk)
        self.omega = omega

    def setup_structure_dist(self, partition) -> bool:
        """Record per-shard band masks for the SPMD (cross-shard) SPIKE
        (the reference's inter-rank coupling storage, SpikeStorage.h:15
        built by MeshPartitioner; here static host tables selected by
        ``lax.axis_index`` inside the shard_map trace).

        The band follows GLOBAL cell-id adjacency (g +- 1, the same
        line ordering the single-device DIA +-1 band uses): in-shard
        couplings must also be locally adjacent (local row r <-> r-1,
        which RCB's sorted owned ordering guarantees); couplings to a
        halo cell enter only at the owned-interior edge rows 0 and
        nr-1, where spike_apply wires them across the shard boundary.
        Rows without a band entry (ghosts, padding, cut mid-chunk
        couplings) fall back to diagonal scaling — additive-Schwarz for
        whatever the band does not cover.  Returns True if any
        cross-shard coupling was found."""
        sm = partition.sharded_mesh
        S = partition.n_shards
        cf = np.asarray(sm.cf_nbr)  # (S, K, n) slot-leading
        mask = np.asarray(sm.cf_mask)
        _, K, n = cf.shape
        nr = sm.n_interior_cells
        n_owned = sm.n_owned_cells
        n_int_g = partition.mesh.n_interior_cells
        L = next(
            Ld for Ld in range(min(self.chunk, nr), 0, -1) if nr % Ld == 0
        )
        m = nr // L
        # global-cell -> owning shard
        owner = np.full(n_int_g, -1, np.int64)
        for d in range(S):
            oi = partition._own_int[d]
            oi = oi[(oi >= 0) & (oi < n_int_g)]
            owner[oi] = d
        rows = np.arange(n)
        l2g_all = np.full((S, n), -9, np.int64)
        for d in range(S):
            gc = np.nonzero(partition.g2l[d] >= 0)[0]
            l2g_all[d, partition.g2l[d][gc]] = gc
        subs, sups, psubs, psups = [], [], [], []
        any_cross = False
        for d in range(S):
            g_row = l2g_all[d]
            g_nbr = l2g_all[d][cf[d]]  # (K, n)
            int_row = ((rows < nr) & (g_row >= 0) & (g_row < n_int_g))[
                None, :
            ]
            int_nbr = (g_nbr >= 0) & (g_nbr < n_int_g)
            halo_nbr = cf[d] >= n_owned
            sub = (
                mask[d]
                & int_row
                & int_nbr
                & (g_nbr == g_row[None, :] - 1)
                & (
                    (cf[d] == rows[None, :] - 1)
                    | ((rows[None, :] % L == 0) & halo_nbr)
                )
            )
            sup = (
                mask[d]
                & int_row
                & int_nbr
                & (g_nbr == g_row[None, :] + 1)
                & (
                    (cf[d] == rows[None, :] + 1)
                    | ((rows[None, :] % L == L - 1) & halo_nbr)
                )
            )
            # chunk-edge cross partners: keep a cross coupling only when
            # the partner row is the matching chunk edge on the ADJACENT
            # shard index (ppermute connects i±1 only); otherwise drop it
            # (outer-Krylov/Schwarz fallback for that row)
            psub = np.full(m, -1, np.int64)
            psup = np.full(m, -1, np.int64)
            for j in range(m):
                rlo, rhi = j * L, j * L + L - 1
                if (sub[:, rlo] & halo_nbr[:, rlo]).any():
                    gp = g_row[rlo] - 1
                    pd = owner[gp] if gp >= 0 else -1
                    lr = partition.g2l[pd, gp] if pd >= 0 else -1
                    if pd == d - 1 and 0 <= lr < nr and lr % L == L - 1:
                        psub[j] = lr // L
                        any_cross = True
                    else:
                        sub[:, rlo] &= ~halo_nbr[:, rlo]
                if (sup[:, rhi] & halo_nbr[:, rhi]).any():
                    gp = g_row[rhi] + 1
                    pd = owner[gp] if gp < n_int_g else -1
                    lr = partition.g2l[pd, gp] if pd >= 0 else -1
                    if pd == d + 1 and 0 <= lr < nr and lr % L == 0:
                        psup[j] = lr // L
                        any_cross = True
                    else:
                        sup[:, rhi] &= ~halo_nbr[:, rhi]
            subs.append(sub)
            sups.append(sup)
            psubs.append(psub)
            psups.append(psup)
        self._dist_sub = jnp.asarray(np.stack(subs))
        self._dist_sup = jnp.asarray(np.stack(sups))
        self._dist_psub = jnp.asarray(np.stack(psubs))
        self._dist_psup = jnp.asarray(np.stack(psups))
        self._dist_shards = S
        self._dist_rows = nr
        self._dist_L = L
        return any_cross

    def _precond_dist(self, A: ELLMatrix):
        i = jax.lax.axis_index(A.axis_name)
        sub = self._dist_sub[i]  # (K, n)
        sup = self._dist_sup[i]
        psub = self._dist_psub[i]  # (m,)
        psup = self._dist_psup[i]
        offv = jnp.where(A.mask, A.off, 0.0)
        a = jnp.sum(jnp.where(sub, offv, 0.0), axis=0)
        c = jnp.sum(jnp.where(sup, offv, 0.0), axis=0)
        nr = self._dist_rows
        L = self._dist_L
        dsafe = jnp.where(jnp.abs(A.diag) > 0.0, A.diag, 1.0)
        axis, S = A.axis_name, self._dist_shards

        def M(r):
            x_band = spike_apply(
                a[:nr], dsafe[:nr], c[:nr], r[:nr], L,
                axis=axis, axis_size=S, psub=psub, psup=psup,
            )
            rest = (
                r[nr:] / dsafe[nr:, None]
                if r.ndim == 2
                else r[nr:] / dsafe[nr:]
            )
            return jnp.concatenate([x_band, rest], axis=0)

        return M

    def _band(self, A: ELLMatrix):
        if getattr(A, "dia", None) is None or A.dia_coef is None:
            return None
        if A.dia.fb_rows.shape[0]:
            return None
        offs = [int(o) for o in A.dia.offsets]
        if 1 not in offs or -1 not in offs:
            return None
        a = A.dia_coef[offs.index(-1)]
        c = A.dia_coef[offs.index(1)]
        # roll conventions: dia_coef[o][i] = A[i, i+o]; row 0 has no i-1
        # neighbor and row n-1 no i+1 (their coefficients are zero by
        # construction on line ends)
        a = a.at[0].set(0.0)
        c = c.at[-1].set(0.0)
        return a, A.diag, c

    def precond_setup(self, A):
        if A.axis_name is not None and \
                getattr(self, "_dist_sub", None) is not None:
            return self._precond_dist(A)
        A = prepared(A)
        band = self._band(A)
        if band is None:
            def M(r):
                return A.diag_solve(r)

            return M
        a, d, c = band
        L = self.chunk

        def M(r):
            return spike_apply(a, d, c, r, L)

        return M

    def solve_fn(self, A: ELLMatrix, b: jnp.ndarray, x0: jnp.ndarray):
        A, b, recover = condensed(A, b)
        A = prepared(A)
        M = self.precond_setup(A)
        rtol, atol, maxit = (
            self.relativeTolerance,
            self.absoluteTolerance,
            self.nMaxIterations,
        )
        omega = self.omega
        r0 = b - A.mv(x0)
        rnorm0 = A.norm(r0)
        target = jnp.maximum(rtol * rnorm0, atol)

        def cond(state):
            i, x, rn = state
            return (i < maxit) & (rn > target)

        def body(state):
            i, x, rn = state
            r = b - A.mv(x)
            x = x + omega * M(r)
            return (i + 1, x, A.norm(b - A.mv(x)))

        i, x, rn = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, rnorm0))
        return recover(x), SolveStats(i, rnorm0, rn, rn <= target)
