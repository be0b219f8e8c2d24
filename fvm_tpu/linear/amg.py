"""Algebraic multigrid (aggregation type), TPU-native.

Counterpart of the reference's agglomeration AMG
(reference: AMG.h:27, CRMatrix.h:468 ``createCoarsening``,
:598 ``createCoarseConnectivity``, :700 ``createCoarseMatrix``).

TPU-first redesign: the reference re-runs graph coarsening on every solve.
Here the *aggregation hierarchy is static* — built once on the host from the
matrix structure (which is fixed by the mesh topology) — while the coarse
matrix *values* are recomputed on device each solve as a Galerkin triple
product with piecewise-constant prolongation.  With 0/1 aggregation P, the
Galerkin product reduces to three ``segment_sum`` calls per level over
precomputed index maps, so the whole setup+cycle runs inside one jit with
static shapes.  The coarsest level is a dense on-chip solve (replacing the
reference's serial UMFPACK DirectSolver and its MPI rank-merging
LinearSystemMerger, AMG.h:53-103).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.ell import ELLMatrix
from .base import LinearSolver, SolveStats, norm
from .dense import gauss_solve, dense_inverse


# ---------------------------------------------------------------------------
# host-side setup
# ---------------------------------------------------------------------------


def aggregate_pairwise(cols: np.ndarray, mask: np.ndarray, level: int = 0):
    """Vectorized pairwise aggregation along the dominant index offset.

    For locality-preserving numberings the row graph is near-DIA; pairing
    cells (i, i+delta) with delta alternating between the smallest and
    largest dominant offsets per level gives full-dimensional coarsening
    across two levels (Notay-style pairwise aggregation) with O(n) setup
    — no python loop.  Returns None when the structure is not DIA-like
    (caller falls back to the greedy graph aggregation).
    """
    n, K = cols.shape
    delta = np.where(mask, cols - np.arange(n)[:, None], 0)
    pos = delta[delta > 0]
    if len(pos) < 0.3 * n:
        return None
    vals, counts = np.unique(pos, return_counts=True)
    strong = vals[counts > 0.2 * n]
    if len(strong) == 0:
        return None
    d1 = int(strong.min())
    d2 = int(strong.max())
    i = np.arange(n)
    if d2 > d1 and d2 % d1 == 0:
        # 2x2 block aggregation from the two dominant offsets (matches
        # geometric full coarsening; same quality as graph agglomeration)
        ny = d2 // d1
        sub = i % d1
        y = (i % d2) // d1
        x = i // d2
        ny2 = (ny + 1) // 2
        agg = ((x // 2) * ny2 + (y // 2)) * d1 + sub
    else:
        q, r = i // d1, i % d1
        agg = r + d1 * (q // 2)
    used, inv = np.unique(agg, return_inverse=True)
    return inv


def aggregate(cols: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Greedy aggregation of the row graph; returns agg id per row.

    Mirrors the agglomeration semantics of CRMatrix::createCoarsening
    (seed an unaggregated cell, absorb its unaggregated neighbors; orphans
    join an adjacent aggregate).

    The loop is O(nK) but python-bound (~8 s at 1M cells), so it runs in
    the native host library when available (fvm_tpu/native/hostlib.cpp,
    bit-identical result); this numpy loop is the fallback.
    """
    from .. import native

    res = native.aggregate(cols, mask)
    if res is not None:
        return _lump_isolated(res, mask)
    n, K = cols.shape
    agg = -np.ones(n, dtype=np.int64)
    next_agg = 0
    for i in range(n):
        if agg[i] >= 0:
            continue
        agg[i] = next_agg
        for k in range(K):
            if mask[i, k]:
                j = cols[i, k]
                if agg[j] < 0:
                    agg[j] = next_agg
        next_agg += 1
    # attach any remaining singleton aggregates of size 1 to a neighbor
    sizes = np.bincount(agg, minlength=next_agg)
    for i in range(n):
        if sizes[agg[i]] == 1:
            for k in range(K):
                if mask[i, k] and agg[cols[i, k]] != agg[i]:
                    old = agg[i]
                    agg[i] = agg[cols[i, k]]
                    sizes[old] -= 1
                    sizes[agg[i]] += 1
                    break
    # compress ids
    used = np.unique(agg)
    remap = np.zeros(next_agg, dtype=np.int64)
    remap[used] = np.arange(len(used))
    return _lump_isolated(remap[agg], mask)


def _lump_isolated(agg: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Merge DIAGONAL-ONLY singleton rows into one inert aggregate.

    Rows with no off-diagonal entries (boundary-condensed ghosts, dead
    padding) seed singleton aggregates that never coarsen, so they ride
    the hierarchy all the way down and bloat the dense coarse solve
    (measured: a 1000-cell column mesh with 4000 condensed Symmetry
    ghosts produced a 4004-row "dense coarse" = 3 s/solve).  A diagonal
    row is solved EXACTLY by one Jacobi sweep, so after pre-smoothing its
    restricted residual is zero and its coarse image is inert — lumping
    them all into a single aggregate is harmless for convergence and
    collapses the coarse level to the truly-coupled rows."""
    iso = ~mask.any(axis=1)
    if iso.sum() <= 1:
        return agg
    sizes = np.bincount(agg)
    single = iso & (sizes[agg] == 1)
    if single.sum() <= 1:
        return agg
    agg = agg.copy()
    agg[single] = agg.max() + 1
    used, inv = np.unique(agg, return_inverse=True)
    return inv


def detect_grid(cols: np.ndarray, mask: np.ndarray):
    """Detect a tensor-product grid structure in a row graph.

    Returns (nx, ny, merge) where rows [0, nx*ny) form a (ny, nx) grid
    (x fastest) whose in-grid couplings are exactly offsets {±1, ±nx} with
    consistent boundary behavior, and rows [nx*ny, n) are "tail" rows
    (boundary ghosts / padding) such that
      * each tail row couples to at most ONE grid cell (merge target;
        -1 for dead rows), and
      * every grid->tail coupling (i, g) satisfies merge[g] == i, so all
        tail entries fold into the coarse DIAGONAL under agglomeration.
    Returns None when the graph is not of this form (caller uses the
    generic greedy aggregation level).
    """
    n, K = cols.shape
    delta = np.where(mask, cols - np.arange(n)[:, None], 0)
    pos = delta[delta > 1]
    if len(pos) == 0:
        return None
    vals, counts = np.unique(pos, return_counts=True)
    nx = int(vals[np.argmax(counts)])
    if nx <= 1 or counts.max() < 0.25 * n:
        return None
    rows_up = np.nonzero((delta == nx).any(axis=1))[0]
    if len(rows_up) == 0:
        return None
    ny = int(rows_up.max()) // nx + 2
    m = nx * ny
    if m > n:
        return None

    g_rows = np.arange(m)
    gx, gy = g_rows % nx, g_rows // nx
    d_g = delta[:m]
    c_g = cols[:m]
    m_g = mask[:m]
    to_tail = m_g & (c_g >= m)
    in_grid = m_g & ~to_tail
    dg = np.where(in_grid, d_g, 0)
    ok = np.isin(dg, (0, 1, -1, nx, -nx)).all()
    if not ok:
        return None
    # boundary consistency: no ±1 across x edges, no ±nx outside y range
    if ((dg == -1) & (gx == 0)[:, None]).any():
        return None
    if ((dg == 1) & (gx == nx - 1)[:, None]).any():
        return None
    if ((dg == -nx) & (gy == 0)[:, None]).any():
        return None
    if ((dg == nx) & (gy == ny - 1)[:, None]).any():
        return None

    # tail rows: at most one distinct grid target each
    merge = np.full(n - m, -1, dtype=np.int64)
    t_cols = cols[m:]
    t_mask = mask[m:] & (cols[m:] != np.arange(m, n)[:, None])
    if (t_mask & (t_cols >= m)).any():
        return None  # tail-tail coupling
    for kk in range(t_mask.shape[1]):
        sel = t_mask[:, kk]
        tgt = t_cols[:, kk]
        bad = sel & (merge >= 0) & (merge != tgt)
        if bad.any():
            return None
        merge = np.where(sel, tgt, merge)
    # grid->tail couplings must point back at their own row
    ti, tk = np.nonzero(to_tail)
    if len(ti):
        g = c_g[ti, tk] - m
        if not (merge[g] == ti).all():
            return None
    return nx, ny, merge


class _StructuredLevel:
    """Index-pairing coarsening on a detected (ny, nx) grid.

    Pairs cells along the longer grid axis, so transfers are pure
    reshapes (restrict = pairwise sum, prolong = repeat) and the Galerkin
    product is elementwise on the DIA coefficient arrays — no gathers,
    no segment sums.  Tail rows (boundary ghosts) are agglomerated into
    their owner's aggregate; their matrix entries fold into the coarse
    diagonal (detect_grid guarantees this structurally).  The semantics
    match agglomeration AMG with size-2 aggregates — the same aggregate
    size the greedy graph aggregation produces on grid graphs.
    """

    def __init__(self, nx: int, ny: int, n: int, merge=None,
                 src_offsets=None, dtype=None, cols=None, mask=None):
        self.nx, self.ny = nx, ny
        self.n = n  # total fine rows incl. tail
        self.m = nx * ny
        self.pair_x = nx >= ny
        if self.pair_x:
            self.nx_c, self.ny_c = (nx + 1) // 2, ny
            self.odd = nx % 2 == 1
        else:
            self.nx_c, self.ny_c = nx, (ny + 1) // 2
            self.odd = ny % 2 == 1
        self.nC = self.nx_c * self.ny_c
        # fine DIA offsets of the grid block and coarse ones
        self.src_offsets = (
            tuple(src_offsets) if src_offsets is not None
            else (1, -1, nx, -nx)
        )
        off_c = {}
        for name, d in (("xp", 1), ("xm", -1), ("yp", self.nx_c),
                        ("ym", -self.nx_c)):
            off_c.setdefault(d, []).append(name)
        self.coarse_offsets = tuple(off_c.keys())
        self._off_c_names = off_c

        if merge is not None and len(merge):
            live = merge >= 0
            self.tail_rows = jnp.asarray(
                (np.arange(self.m, n)[live]).astype(np.int32))
            mg = merge[live]
            agg = self._agg_of_cell(mg)
            self.tail_agg = jnp.asarray(agg.astype(np.int32))
        else:
            self.tail_rows = jnp.zeros((0,), jnp.int32)
            self.tail_agg = jnp.zeros((0,), jnp.int32)

        # own ELL-slot -> offset-role mapping, used when the fine matrix
        # carries no DIA metadata (A.dia None / unprepared): bucket[k,i] in
        # {0..3} indexes (+1,-1,+nx,-nx); everything else (tail couplings)
        # goes to the fallback lists and folds into the coarse diagonal.
        # ``cols``/``mask`` arrive in HOST (n, K) orientation; the device
        # bucket is stored slot-leading (K, n) to match ELLMatrix.off.
        self._bucket = None
        if cols is not None:
            delta = np.where(mask, cols - np.arange(n)[:, None], 0)
            bucket = np.full(cols.shape, -1, dtype=np.int8)
            grid_rows = (np.arange(n) < self.m)[:, None]
            for i, d in enumerate((1, -1, nx, -nx)):
                bucket[(delta == d) & mask & grid_rows
                       & (cols < self.m)] = i
            fbm = mask & (bucket < 0) & (cols != np.arange(n)[:, None])
            fr, fk = np.nonzero(fbm)
            fc = cols[fr, fk]
            # fold target = grid-side cell of the coupling
            tgt = np.where(fr < self.m, fr, fc)
            self._bucket = jnp.asarray(np.ascontiguousarray(bucket.T))
            self._fb_rows = jnp.asarray(fr.astype(np.int32))
            self._fb_slots = jnp.asarray(fk.astype(np.int32))
            self._fb_agg = jnp.asarray(
                np.asarray(self._agg_of_cell(tgt)).astype(np.int32))

    def _agg_of_cell(self, i):
        x, y = i % self.nx, i // self.nx
        if self.pair_x:
            return y * self.nx_c + x // 2
        return (y // 2) * self.nx_c + x

    # -- helpers ------------------------------------------------------------
    #
    # Pair extraction/summation are lane-decimation ops; done as reshapes
    # they lower to strided relayouts (~2 ms at 1M on TPU).  Instead they
    # are matmuls against static 0/1 selection matrices: the MXU does the
    # relayout for free (a (1024x1024)@(1024x512) f32 matmul is ~10 us).

    def _sel(self, j, dtype):
        """Selection matrix S_j: pairs axis -> coarse axis, member j.

        Cached as numpy (a jnp constant created inside one trace must not
        leak into another); jnp.asarray at the use site is free."""
        key = (j, jnp.dtype(dtype).name)
        cache = self.__dict__.setdefault("_sel_cache", {})
        if key not in cache:
            if self.pair_x:
                fine, coarse = self.nx, self.nx_c
            else:
                fine, coarse = self.ny, self.ny_c
            S = np.zeros((fine, coarse), dtype=np.dtype(dtype))
            idx = 2 * np.arange(coarse) + j
            idx = idx[idx < fine]
            S[idx, np.arange(len(idx))] = 1.0
            cache[key] = S
        return jnp.asarray(cache[key])

    def _grid(self, v):
        """(n,) -> (ny, nx) grid view of the grid block."""
        return v[: self.m].reshape(self.ny, self.nx)

    def _matmul(self, g, S, left: bool):
        pt = jnp.float32 if g.dtype != jnp.float64 else jnp.float64
        if left:
            return jnp.einsum("yc,yx->cx", S, g,
                              preferred_element_type=pt).astype(g.dtype)
        return jnp.einsum("yx,xc->yc", g, S,
                          preferred_element_type=pt).astype(g.dtype)

    def _pairsum(self, g):
        """Sum fine pairs along the pairing axis -> (ny_c, nx_c)."""
        S = self._sel(0, g.dtype) + self._sel(1, g.dtype)
        return self._matmul(g, S, left=not self.pair_x)

    def _pair(self, g, j):
        """j-th member (0/1) of each pair -> (ny_c, nx_c)."""
        return self._matmul(g, self._sel(j, g.dtype), left=not self.pair_x)

    # -- transfers ----------------------------------------------------------

    def restrict(self, r):
        c = self._pairsum(self._grid(r)).reshape(-1)
        if self.tail_rows.shape[0]:
            c = c.at[self.tail_agg].add(r[self.tail_rows])
        return c

    def prolong(self, xc):
        g = xc.reshape(self.ny_c, self.nx_c)
        S = self._sel(0, g.dtype) + self._sel(1, g.dtype)  # (fine, coarse)
        pt = jnp.float32 if g.dtype != jnp.float64 else jnp.float64
        if self.pair_x:
            f = jnp.einsum("yc,xc->yx", g, S,
                           preferred_element_type=pt).astype(g.dtype)
        else:
            f = jnp.einsum("yc,cx->yx", S, g,
                           preferred_element_type=pt).astype(g.dtype)
        out = f.reshape(-1)
        if self.n > self.m:
            tail = jnp.zeros(self.n - self.m, xc.dtype)
            if self.tail_rows.shape[0]:
                tail = tail.at[self.tail_rows - self.m].set(xc[self.tail_agg])
            out = jnp.concatenate([out, tail])
        return out

    # -- Galerkin -----------------------------------------------------------

    def _coef_named(self, A):
        """Fine coefficient grids keyed by role xp/xm/yp/ym (zeros when the
        fine matrix lacks that offset), plus diagonal fold entries."""
        from ..ops.dia import DIAMatrix

        if isinstance(A, DIAMatrix):
            offsets, coef, diag = A.offsets, A.coef, A.diag
            fb = None
        elif A.dia is not None and A.dia_coef is not None:
            offsets, coef, diag = A.dia.offsets, A.dia_coef, A.diag
            fb = (A.dia.fb_rows, A.dia.fb_cols, A.dia_fb_vals)
        else:
            # no DIA metadata on the matrix: use the level's own slot
            # bucketing (built at setup from the same cols/mask)
            offv = jnp.where(A.mask, A.off, 0.0)  # (K, n)
            coef = jnp.stack([
                jnp.sum(jnp.where(self._bucket == i, offv, 0.0), axis=0)
                for i in range(4)
            ])
            offsets = (1, -1, self.nx, -self.nx)
            diag = A.diag
            if self._fb_rows.shape[0]:
                fb = ("own", self._fb_agg,
                      offv[self._fb_slots, self._fb_rows])
            else:
                fb = None
        lut = {int(d): i for i, d in enumerate(offsets)}
        zero = jnp.zeros((self.ny, self.nx), diag.dtype)

        def get(d):
            i = lut.get(d)
            return self._grid(coef[i]) if i is not None else zero

        if self.nx == 1:
            # degenerate single-column grid: flat +-1 IS the y-coupling
            names = {"xp": zero, "xm": zero, "yp": get(1), "ym": get(-1)}
            expected = (1, -1)
        else:
            names = {
                "xp": get(1), "xm": get(-1),
                "yp": get(self.nx), "ym": get(-self.nx),
            }
            expected = (1, -1, self.nx, -self.nx)
        # extra offsets = grid<->tail couplings that made it into the DIA
        # set (small grids); detect_grid guarantees they fold into the
        # coarse diagonal of the grid-side aggregate
        extras = [
            (int(d), coef[i]) for i, d in enumerate(offsets)
            if int(d) not in expected
        ]
        return names, self._grid(diag), diag, fb, extras

    def galerkin(self, A):
        """Coarse DIAMatrix = R A P, elementwise on the DIA grids."""
        from ..ops.dia import DIAMatrix

        C, Dg, diag_full, fb, extras = self._coef_named(A)
        if self.pair_x:
            diag_c = (self._pairsum(Dg) + self._pair(C["xp"], 0)
                      + self._pair(C["xm"], 1))
            parts = {
                "xp": self._pair(C["xp"], 1),
                "xm": self._pair(C["xm"], 0),
                "yp": self._pairsum(C["yp"]),
                "ym": self._pairsum(C["ym"]),
            }
        else:
            diag_c = (self._pairsum(Dg) + self._pair(C["yp"], 0)
                      + self._pair(C["ym"], 1))
            parts = {
                "xp": self._pairsum(C["xp"]),
                "xm": self._pairsum(C["xm"]),
                "yp": self._pair(C["yp"], 1),
                "ym": self._pair(C["ym"], 0),
            }
        diag_c = diag_c.reshape(-1)
        # extra-offset entries (grid<->tail couplings inside the DIA set)
        # fold into the coarse diagonal of the grid-side aggregate
        for d, cvec in extras:
            diag_c = diag_c + self._pairsum(self._grid(cvec)).reshape(-1)
            if self.n > self.m:
                tail_idx = np.arange(self.m, self.n)
                owner = np.clip(tail_idx + d, 0, self.m - 1)
                agg_np = jnp.asarray(
                    np.asarray(self._agg_of_cell(owner)).astype(np.int32)
                )
                diag_c = diag_c.at[agg_np].add(cvec[self.m:])
        # tail entries: ghost diagonals + both coupling directions fold
        # into the coarse diagonal of the owner aggregate
        if self.tail_rows.shape[0]:
            diag_c = diag_c.at[self.tail_agg].add(diag_full[self.tail_rows])
        if fb is not None:
            if isinstance(fb[0], str):
                _, fb_agg, fb_vals = fb
                diag_c = diag_c.at[fb_agg].add(fb_vals)
            elif fb[0].shape[0]:
                fb_rows, fb_cols, fb_vals = fb
                tgt_cell = jnp.where(fb_rows < self.m, fb_rows, fb_cols)
                # map grid cell -> aggregate arithmetically
                x = tgt_cell % self.nx
                y = tgt_cell // self.nx
                if self.pair_x:
                    agg = y * self.nx_c + x // 2
                else:
                    agg = (y // 2) * self.nx_c + x
                diag_c = diag_c.at[agg].add(fb_vals)
        coef_rows = []
        for d in self.coarse_offsets:
            acc = None
            for name in self._off_c_names[d]:
                v = parts[name].reshape(-1)
                acc = v if acc is None else acc + v
            coef_rows.append(acc)
        coef_c = jnp.stack(coef_rows)
        # zero out couplings that would wrap across coarse x edges
        # (guaranteed zero analytically; keep exact zeros for safety)
        return DIAMatrix(diag_c, coef_c, self.coarse_offsets)


class _Level:
    """Static per-level metadata (host-built, device index arrays)."""

    def __init__(self, cols: np.ndarray, mask: np.ndarray, level: int = 0,
                 agg: np.ndarray | None = None):
        n, K = cols.shape
        # pairwise/block index aggregation measured 2-2.5x worse
        # convergence than greedy graph agglomeration; greedy's python loop
        # is ~8 s at 1M cells (one-time) now that the coarse-map LUT is
        # vectorized, so greedy stays the default.  ``agg`` overrides the
        # aggregation (identity levels pad ragged per-shard hierarchies in
        # the distributed general path).
        if agg is None:
            agg = aggregate(cols, mask)
        nC = int(agg.max()) + 1

        # coarse graph structure
        fi = np.repeat(np.arange(n), K)
        fj = cols.reshape(-1)
        valid = mask.reshape(-1)
        I = agg[fi]
        J = agg[fj]
        offd = valid & (I != J)
        pairs = np.unique(np.stack([I[offd], J[offd]], axis=1), axis=0)
        counts = np.bincount(pairs[:, 0], minlength=nC)
        Kc = max(int(counts.max()) if len(pairs) else 1, 1)
        cols_c = np.tile(np.arange(nC, dtype=np.int64)[:, None], (1, Kc))
        mask_c = np.zeros((nC, Kc), dtype=bool)
        slot_of_pair = np.zeros(len(pairs), dtype=np.int64)
        ptr = np.zeros(nC + 1, dtype=np.int64)
        np.cumsum(counts, out=ptr[1:])
        slot_of_pair = np.arange(len(pairs)) - ptr[pairs[:, 0]]
        cols_c[pairs[:, 0], slot_of_pair] = pairs[:, 1]
        mask_c[pairs[:, 0], slot_of_pair] = True

        # map each fine off-diag flat entry to a coarse target
        # (I, J) -> flat coarse off index, via sorted-key searchsorted
        pair_key = pairs[:, 0] * nC + pairs[:, 1]
        flat_idx = pairs[:, 0] * Kc + slot_of_pair
        order2 = np.argsort(pair_key)
        pk_sorted = pair_key[order2]
        fi_sorted = flat_idx[order2]
        to_off = np.full(n * K, nC * Kc, dtype=np.int64)  # trash slot
        to_diag = np.full(n * K, nC, dtype=np.int64)  # trash slot
        same = valid & (I == J)
        to_diag[same] = I[same]
        if offd.any():
            keys = I[offd] * nC + J[offd]
            pos = np.searchsorted(pk_sorted, keys)
            to_off[np.nonzero(offd)[0]] = fi_sorted[pos]

        self.n, self.K, self.nC, self.Kc = n, K, nC, Kc
        self.agg = jnp.asarray(agg, jnp.int32)
        # device copies follow the slot-leading layout: flat fine entries
        # are ordered (k, i) to match A.off (K, n).reshape(-1), and the
        # coarse off target index is sl*nC + ic so the segment_sum output
        # reshapes straight to the (Kc, nC) coarse matrix
        to_diag_T = np.ascontiguousarray(
            to_diag.reshape(n, K).T
        ).reshape(-1)
        to_off_T = np.ascontiguousarray(to_off.reshape(n, K).T).reshape(-1)
        ic, sl = to_off_T // Kc, to_off_T % Kc
        to_off_T = np.where(to_off_T == nC * Kc, nC * Kc, sl * nC + ic)
        self.to_diag = jnp.asarray(to_diag_T, jnp.int32)
        self.to_off = jnp.asarray(to_off_T, jnp.int32)
        self.cols_c = jnp.asarray(np.ascontiguousarray(cols_c.T), jnp.int32)
        self.mask_c = jnp.asarray(np.ascontiguousarray(mask_c.T))
        self.cols_c_np = cols_c
        self.mask_c_np = mask_c
        # host copies for the distributed stacked-hierarchy setup (host
        # (i, k) flat order and ic*Kc+sl coarse targets)
        self.agg_np = agg
        self.to_diag_np = to_diag
        self.to_off_np = to_off
        # DIA fast path for the coarse SpMV (aggregation preserves locality)
        from ..ops.dia import DIAInfo

        self.dia_c = DIAInfo.build(cols_c, mask_c)

    def galerkin(self, A: ELLMatrix) -> ELLMatrix:
        """Coarse matrix values = R A P on device (3 segment sums)."""
        off_flat = jnp.where(A.mask, A.off, 0.0).reshape(-1)  # (k,i) order
        diag_c = jax.ops.segment_sum(A.diag, self.agg, num_segments=self.nC)
        diag_c = diag_c + jax.ops.segment_sum(
            off_flat, self.to_diag, num_segments=self.nC + 1
        )[: self.nC]
        off_c = jax.ops.segment_sum(
            off_flat, self.to_off, num_segments=self.nC * self.Kc + 1
        )[: self.nC * self.Kc].reshape(self.Kc, self.nC)
        return ELLMatrix(
            diag=diag_c, off=off_c, cols=self.cols_c, mask=self.mask_c, dia=self.dia_c
        )

    def restrict(self, r: jnp.ndarray) -> jnp.ndarray:
        return jax.ops.segment_sum(r, self.agg, num_segments=self.nC)

    def prolong(self, xc: jnp.ndarray) -> jnp.ndarray:
        return xc[self.agg]


def _dense_from_ell(A: ELLMatrix, n: int) -> jnp.ndarray:
    D = jnp.zeros((n, n), dtype=A.diag.dtype)
    D = D + jnp.diag(A.diag)
    # slot-leading (K, n): flat order is (k, i), row index tiles
    rows = jnp.tile(jnp.arange(n, dtype=A.cols.dtype), A.cols.shape[0])
    cols = A.cols.reshape(-1)
    vals = jnp.where(A.mask, A.off, 0.0).reshape(-1)
    return D.at[rows, cols].add(vals)


def _pad_stack(arrs, fill):
    """Pad 1D int arrays to a common length and stack: (S, L) + (S, L) valid."""
    L = max((len(a) for a in arrs), default=0)
    out = np.full((len(arrs), max(L, 1)), fill, dtype=np.int32)
    val = np.zeros((len(arrs), max(L, 1)), dtype=bool)
    for d, a in enumerate(arrs):
        out[d, : len(a)] = a
        val[d, : len(a)] = True
    return out, val


def _local_condense(A, arrs):
    """Per-shard boundary condensation with traced (data) index arrays.

    The distributed analogue of ELLMatrix.condense: the fold indices are
    shard-dependent DATA (selected by axis_index from stacked tables and
    padded to uniform length, with validity masks making padded entries
    no-ops).  Returns (diag2, offv, fold_b, recover)."""
    (er, es, ep, ir, ik, ie, e_val, in_val) = arrs
    offv = jnp.where(A.mask, A.off, 0.0)  # (K, n)
    vE = jnp.where(e_val & (es >= 0), offv[jnp.maximum(es, 0), er], 0.0)
    dE = jnp.where(e_val, A.diag[er], 1.0)
    vIn = jnp.where(in_val, offv[ik, ir], 0.0)
    # all scatters below are .add with padded entries contributing exactly
    # zero — scatter-set would be order-dependent for the padded duplicate
    # indices
    fac = vIn / dE[ie]
    diag2 = A.diag.at[ir].add(-fac * vE[ie])
    diag2 = diag2.at[er].add(jnp.where(e_val, 1.0 - diag2[er], 0.0))

    def fold_b(b):
        bE = b[er]
        if b.ndim == 1:
            b2 = b.at[ir].add(-fac * bE[ie])
            return b2.at[er].add(jnp.where(e_val, -b2[er], 0.0))
        b2 = b.at[ir].add(-fac[:, None] * bE[ie])
        return b2.at[er].add(jnp.where(e_val[:, None], -b2[er], 0.0))

    def recover(x2, b):
        if x2.ndim == 1:
            xE = (b[er] - vE * x2[ep]) / dE
            return x2.at[er].add(jnp.where(e_val, xE - x2[er], 0.0))
        xE = (b[er] - vE[:, None] * x2[ep]) / dE[:, None]
        return x2.at[er].add(
            jnp.where(e_val[:, None], xE - x2[er], 0.0)
        )

    return diag2, offv, fold_b, recover


class _StackedGraphLevel:
    """One level of the distributed GENERAL (graph-aggregation) hierarchy.

    Per-shard greedy hierarchies are ragged (each shard coarsens its own
    local graph), so every level is padded to the max fine/coarse sizes
    across shards and the index tables are stacked (S, ...) DATA selected
    by axis_index at trace time — the same stacking pattern
    ``_local_condense`` uses for condensation tables.  Padded fine rows
    map to a trash segment; padded coarse rows get identity diagonals, so
    smoothing on them is a no-op.  This is what makes the reference's
    "AMG at any np on any mesh" (AMG.h:53-103) hold here: the hierarchy
    no longer requires shards to share a structured condensed grid.
    """

    def __init__(self, shard_levels, n_pad: int, K_pad: int):
        S = len(shard_levels)
        self.nC = max(lev.nC for lev in shard_levels)
        self.Kc = max(lev.Kc for lev in shard_levels)
        nC, Kc = self.nC, self.Kc
        agg = np.full((S, n_pad), nC, dtype=np.int32)
        to_diag = np.full((S, n_pad * K_pad), nC, dtype=np.int32)
        to_off = np.full((S, n_pad * K_pad), nC * Kc, dtype=np.int32)
        cols_c = np.tile(
            np.arange(nC, dtype=np.int32)[None, :, None], (S, 1, Kc)
        )
        mask_c = np.zeros((S, nC, Kc), dtype=bool)
        live_c = np.zeros((S, nC), dtype=bool)
        for d, lev in enumerate(shard_levels):
            agg[d, : lev.n] = lev.agg_np
            # flat (i, k) reindex from the shard's (n_d, K_d) layout to the
            # padded (n_pad, K_pad) layout; trash targets remap too.  The
            # coarse off target uses the slot-leading flat order sl*nC+ic
            # (matches the (Kc, nC) coarse matrix reshape).
            td = lev.to_diag_np.reshape(lev.n, lev.K)
            to = lev.to_off_np.reshape(lev.n, lev.K)
            td = np.where(td == lev.nC, nC, td)
            ic, sl = to // lev.Kc, to % lev.Kc
            to = np.where(to == lev.nC * lev.Kc, nC * Kc, sl * nC + ic)
            block_d = to_diag.reshape(S, n_pad, K_pad)
            block_o = to_off.reshape(S, n_pad, K_pad)
            block_d[d, : lev.n, : lev.K] = td
            block_o[d, : lev.n, : lev.K] = to
            cols_c[d, : lev.nC, : lev.Kc] = lev.cols_c_np
            mask_c[d, : lev.nC, : lev.Kc] = lev.mask_c_np
            live_c[d, : lev.nC] = True
        self._agg = agg
        # device flat order is (k, i) — transpose the per-shard blocks
        self._to_diag = np.ascontiguousarray(
            to_diag.reshape(S, n_pad, K_pad).transpose(0, 2, 1)
        ).reshape(S, -1)
        self._to_off = np.ascontiguousarray(
            to_off.reshape(S, n_pad, K_pad).transpose(0, 2, 1)
        ).reshape(S, -1)
        self._cols_c = np.ascontiguousarray(cols_c.transpose(0, 2, 1))
        self._mask_c = np.ascontiguousarray(mask_c.transpose(0, 2, 1))
        self._live_c = live_c

    def select(self, idx):
        """Per-shard view (inside shard_map): returns a _ShardGraphLevel."""
        return _ShardGraphLevel(
            jnp.asarray(self._agg)[idx],
            jnp.asarray(self._to_diag)[idx],
            jnp.asarray(self._to_off)[idx],
            jnp.asarray(self._cols_c)[idx],
            jnp.asarray(self._mask_c)[idx],
            jnp.asarray(self._live_c)[idx],
            self.nC,
            self.Kc,
        )


class _ShardGraphLevel:
    """Traced per-shard level ops (restrict/prolong/galerkin) with padded
    static shapes; the index arrays are data, the sizes are static."""

    def __init__(self, agg, to_diag, to_off, cols_c, mask_c, live_c, nC, Kc):
        self.agg, self.to_diag, self.to_off = agg, to_diag, to_off
        self.cols_c, self.mask_c, self.live_c = cols_c, mask_c, live_c
        self.nC, self.Kc = nC, Kc

    def galerkin(self, A: ELLMatrix) -> ELLMatrix:
        nC, Kc = self.nC, self.Kc
        off_flat = jnp.where(A.mask, A.off, 0.0).reshape(-1)  # (k,i) order
        diag_c = jax.ops.segment_sum(
            A.diag, self.agg, num_segments=nC + 1
        )[:nC]
        diag_c = diag_c + jax.ops.segment_sum(
            off_flat, self.to_diag, num_segments=nC + 1
        )[:nC]
        off_c = jax.ops.segment_sum(
            off_flat, self.to_off, num_segments=nC * Kc + 1
        )[: nC * Kc].reshape(Kc, nC)
        diag_c = jnp.where(self.live_c, diag_c, 1.0)
        return ELLMatrix(
            diag=diag_c, off=off_c, cols=self.cols_c, mask=self.mask_c
        )

    def restrict(self, r):
        return jax.ops.segment_sum(r, self.agg, num_segments=self.nC + 1)[
            : self.nC
        ]

    def prolong(self, xc):
        # extra zero row: trash/padded fine rows read 0, not a clamped
        # out-of-bounds neighbor value
        return jnp.concatenate([xc, jnp.zeros((1,), xc.dtype)])[self.agg]


class AMG(LinearSolver):
    """Aggregation AMG; usable standalone or as a Krylov preconditioner.

    Options mirror the reference (AMG.h:40-70): cycle type (V/W/F),
    smoother sweeps, max coarse levels, coarsest-size threshold.
    """

    def __init__(
        self,
        max_levels: int = 20,
        coarse_size: int = 64,
        nu_pre: int = 1,
        nu_post: int = 1,
        smoother_omega: float = 0.7,
        smoother_sweeps: int = 2,
        cycle: str = "V",
        precision: str | None = None,
        structured: bool = True,
        **kw,
    ):
        kw.setdefault("max_iterations", 30)
        super().__init__(**kw)
        self.max_levels = max_levels
        self.coarse_size = coarse_size
        self.nu_pre = nu_pre
        self.nu_post = nu_post
        self.omega = smoother_omega
        self.smoother_sweeps = smoother_sweeps
        self.cycle_type = cycle
        # structured=True enables gather-free index-pairing levels on
        # tensor-product row graphs (detect_grid); False forces greedy
        # graph agglomeration everywhere.
        self.structured = structured
        # precision="bf16": run the whole V-cycle in bfloat16.  SpMV and
        # smoothing are HBM-bandwidth-bound on TPU, so halving the bytes
        # roughly doubles cycle throughput; as a PRECONDITIONER the lost
        # mantissa only costs a few outer Krylov iterations at worst.
        self.precision = precision
        self._levels_cache: dict = {}
        self._dist_setup = None

    # -- setup --------------------------------------------------------------

    def setup_structure(self, cols_np: np.ndarray, mask_np: np.ndarray, key=None):
        """Build the static aggregation hierarchy from matrix structure.

        ``cols_np``/``mask_np`` are HOST (n, K) tables (mesh.host_cf()).
        When the row graph is a tensor-product grid (structured meshes,
        which is also where the DIA SpMV fast path applies), the hierarchy
        uses index-pairing levels whose transfers/Galerkin products are
        pure reshapes (no gathers/segment-sums); otherwise greedy graph
        agglomeration (the general path)."""
        # cache key leads with the DEVICE (K, n) shape so _get_levels can
        # match a traced A.cols against it under jit
        key = key if key is not None else (
            cols_np.shape[::-1], cols_np.tobytes()[:64]
        )
        if key in self._levels_cache:
            return self._levels_cache[key]
        # mirror the solve-entry boundary condensation: levels must match
        # the structure the cycle actually smooths (ELLMatrix.condense)
        from ..ops.dia import DIAInfo

        dia = DIAInfo.build(cols_np, mask_np)
        if dia is not None and dia.cond_plan is not None:
            mask_np = dia.cond_plan.mask2
        levels = []
        n = cols_np.shape[0]
        grid = detect_grid(cols_np, mask_np) if self.structured else None
        if grid is not None:
            nx, ny, merge = grid
            c_np, m_np = cols_np, mask_np
            while n > self.coarse_size and len(levels) < self.max_levels \
                    and max(nx, ny) > 1:
                lev = _StructuredLevel(nx, ny, n, merge=merge,
                                       cols=c_np, mask=m_np)
                levels.append(lev)
                nx, ny, merge, n = lev.nx_c, lev.ny_c, None, lev.nC
                c_np = m_np = None
            self._levels_cache[key] = levels
            return levels
        cols, mask = cols_np, mask_np
        while n > self.coarse_size and len(levels) < self.max_levels:
            lev = _Level(cols, mask, level=len(levels))
            if lev.nC >= n:  # no coarsening progress; stop
                break
            levels.append(lev)
            cols, mask, n = lev.cols_c_np, lev.mask_c_np, lev.nC
        self._levels_cache[key] = levels
        return levels

    def setup_structure_dist(self, cols_S: np.ndarray, mask_S: np.ndarray,
                             n_owned: int) -> bool:
        """Static setup for the distributed (shard-local) AMG.

        TPU redesign of the reference's distributed AMG with coarse rank
        merging (AMG.h:53-103, LinearSystemMerger.h:22-37): each shard
        runs a LOCAL V-cycle on its owned block (couplings into halo
        columns dropped — additive Schwarz), used as a preconditioner
        inside a global psum-reduced Krylov iteration.  Two hierarchies:

          * structured: when every shard presents the same condensed
            tensor-product grid, gather-free index-pairing levels
            (fastest; regular partitions of structured meshes);
          * general: per-shard GREEDY graph-aggregation hierarchies,
            padded to uniform static shapes and stacked (S, ...) like the
            condensation tables — works on ANY mesh / partition, matching
            the reference's "AMG at any np" (AMG.h:53-103).

        Returns False only when no coarsening is possible at all.

        The per-shard condensation index tables differ by shard, so they
        are stored as stacked (S, L) arrays selected by axis_index at
        trace time; the level hierarchy itself is shard-uniform static.
        """
        from ..ops.dia import CondensePlan

        S = cols_S.shape[0]
        plans = [
            CondensePlan(np.asarray(cols_S[d]), np.asarray(mask_S[d]),
                         drop_beyond=n_owned)
            for d in range(S)
        ]
        if self.structured and self._setup_dist_structured(
            cols_S, mask_S, n_owned, plans
        ):
            return True
        return self._setup_dist_general(cols_S, mask_S, n_owned, plans)

    def _setup_dist_general(self, cols_S, mask_S, n_owned, plans) -> bool:
        """General distributed hierarchy: per-shard greedy graph
        aggregation, ragged hierarchies padded with identity levels and
        stacked to uniform shapes (see _StackedGraphLevel)."""
        S = cols_S.shape[0]
        per = []
        for d in range(S):
            cols, mask = np.asarray(cols_S[d]), plans[d].mask2
            n = cols.shape[0]
            levels_d = []
            while n > self.coarse_size and len(levels_d) < self.max_levels:
                lev = _Level(cols, mask)
                if lev.nC >= n:
                    break
                levels_d.append(lev)
                cols, mask, n = lev.cols_c_np, lev.mask_c_np, lev.nC
            per.append([levels_d, cols, mask, n])
        L = max(len(p[0]) for p in per)
        if L == 0:
            self._dist_setup = None
            return False
        for p in per:
            levels_d, cols, mask, n = p
            while len(levels_d) < L:
                lev = _Level(cols, mask, agg=np.arange(n, dtype=np.int64))
                levels_d.append(lev)
                cols, mask, n = lev.cols_c_np, lev.mask_c_np, lev.nC
        stacked = []
        n_pad, K_pad = cols_S.shape[1], cols_S.shape[2]
        for l in range(L):
            slev = _StackedGraphLevel(
                [per[d][0][l] for d in range(S)], n_pad, K_pad
            )
            stacked.append(slev)
            n_pad, K_pad = slev.nC, slev.Kc
        er, e_val = _pad_stack(
            [p.elim_rows if p.ok else [] for p in plans], 0)
        es, _ = _pad_stack([p.elim_slot if p.ok else [] for p in plans], -1)
        ep, _ = _pad_stack([p.elim_part if p.ok else [] for p in plans], 0)
        ir, in_val = _pad_stack([p.in_rows if p.ok else [] for p in plans], 0)
        ik, _ = _pad_stack([p.in_slots if p.ok else [] for p in plans], 0)
        ie, _ = _pad_stack([p.in_elim if p.ok else [] for p in plans], 0)
        self._dist_setup = {
            "kind": "general",
            "arrays": tuple(np.asarray(a) for a in
                            (er, es, ep, ir, ik, ie, e_val, in_val)),
            # device orientation: (S, K, n) slot-leading like ELLMatrix
            "mask2": np.ascontiguousarray(
                np.stack([p.mask2 for p in plans]).transpose(0, 2, 1)
            ),
            "levels": stacked,
        }
        return True

    def _setup_dist_structured(self, cols_S, mask_S, n_owned, plans) -> bool:
        S = cols_S.shape[0]
        # uniformity: after condensation every shard must present a grid
        # block of the SAME dimensions with fully dead tails (ghosts
        # eliminated, halos dropped).  Slot ORDER may differ per shard
        # (ghost vs halo couplings occupy different ELL slots), so the
        # slot->offset buckets are stacked per-shard DATA; the level
        # hierarchy and the offset set are shared static structure.
        grids = [detect_grid(np.asarray(cols_S[d]), plans[d].mask2)
                 for d in range(S)]
        if any(g is None for g in grids):
            self._dist_setup = None
            return False
        nx, ny = grids[0][0], grids[0][1]
        mgrid = nx * ny
        n, K = cols_S.shape[1], cols_S.shape[2]
        offsets = tuple(sorted((1, -1, nx, -nx)))
        buckets = np.full((S, n, K), -1, dtype=np.int8)
        for d in range(S):
            if grids[d][0] != nx or grids[d][1] != ny:
                self._dist_setup = None
                return False
            if (grids[d][2] >= 0).any() or plans[d].mask2[mgrid:].any():
                self._dist_setup = None
                return False
            cd = np.asarray(cols_S[d])
            delta = np.where(plans[d].mask2, cd - np.arange(n)[:, None], 0)
            covered = ~plans[d].mask2
            for i, off in enumerate(offsets):
                hit = plans[d].mask2 & (delta == off)
                buckets[d][hit] = i
                covered |= hit
            if not covered.all():  # a live coupling outside {+-1, +-nx}
                self._dist_setup = None
                return False
        levels = []
        nx_, ny_, n_ = nx, ny, n
        while (n_ > self.coarse_size and len(levels) < self.max_levels
               and max(nx_, ny_) > 1):
            lev = _StructuredLevel(nx_, ny_, n_)
            levels.append(lev)
            nx_, ny_, n_ = lev.nx_c, lev.ny_c, lev.nC
        if not levels:
            self._dist_setup = None
            return False
        er, e_val = _pad_stack([p.elim_rows if p.ok else [] for p in plans], 0)
        es, _ = _pad_stack(
            [p.elim_slot if p.ok else [] for p in plans], -1)
        ep, _ = _pad_stack(
            [p.elim_part if p.ok else [] for p in plans], 0)
        ir, in_val = _pad_stack([p.in_rows if p.ok else [] for p in plans], 0)
        ik, _ = _pad_stack([p.in_slots if p.ok else [] for p in plans], 0)
        ie, _ = _pad_stack([p.in_elim if p.ok else [] for p in plans], 0)
        self._dist_setup = {
            "arrays": tuple(np.asarray(a) for a in
                            (er, es, ep, ir, ik, ie, e_val, in_val)),
            # (S, K, n) slot-leading to match the device offv orientation
            "buckets": np.ascontiguousarray(buckets.transpose(0, 2, 1)),
            "offsets": offsets,
            "levels": levels,
        }
        return True

    def _precond_setup_dist(self, A: ELLMatrix):
        from ..ops.dia import DIAMatrix

        ds = getattr(self, "_dist_setup", None)
        if ds is None:
            return lambda r: A.diag_solve(r)
        if ds.get("kind") == "general":
            return self._precond_dist_general(A, ds)
        idx = jax.lax.axis_index(A.axis_name)
        arrs = tuple(jnp.asarray(a)[idx] for a in ds["arrays"])
        diag2, offv, fold_b, recover = _local_condense(A, arrs)
        bkt = jnp.asarray(ds["buckets"])[idx]  # (K, n)
        offsets = ds["offsets"]
        coef = jnp.stack([
            jnp.sum(jnp.where(bkt == i, offv, 0.0), axis=0)
            for i in range(len(offsets))
        ])
        A2 = DIAMatrix(diag2, coef, offsets).prepare()
        levels = ds["levels"]
        mats = [A2]
        for lev in levels:
            mats.append(lev.galerkin(mats[-1]).prepare())
        from ..ops.dia import DIAMatrix

        tail = mats[-1]
        dense = (tail.to_dense() if isinstance(tail, DIAMatrix)
                 else _dense_from_ell(tail, tail.diag.shape[0]))
        inv = dense_inverse(dense)
        n_owned = A.n_owned if A.n_owned is not None else A.n
        owned = jnp.arange(A.n) < n_owned

        def M(r):
            r2 = fold_b(r)
            z = self._cycle0(levels, mats, [inv], r2)
            z = recover(z, r)
            return jnp.where(owned if z.ndim == 1 else owned[:, None], z, 0.0)

        return M

    def _precond_dist_general(self, A: ELLMatrix, ds):
        """Shard-local graph-AMG V-cycle preconditioner (general meshes).

        Selects this shard's condensation tables and stacked level index
        arrays by axis_index, condenses the local block, drops halo
        couplings (additive Schwarz), runs the greedy-aggregation cycle
        with a dense coarse solve — all with shard-uniform static shapes
        so the whole thing lives inside one shard_map'd jit."""
        idx = jax.lax.axis_index(A.axis_name)
        arrs = tuple(jnp.asarray(a)[idx] for a in ds["arrays"])
        diag2, offv, fold_b, recover = _local_condense(A, arrs)
        mask2 = jnp.asarray(ds["mask2"])[idx]
        A2 = ELLMatrix(
            diag=diag2, off=jnp.where(mask2, offv, 0.0),
            cols=A.cols, mask=mask2,
        )
        levels = [slev.select(idx) for slev in ds["levels"]]
        mats = [A2]
        for lev in levels:
            mats.append(lev.galerkin(mats[-1]))
        tail = mats[-1]
        inv = dense_inverse(_dense_from_ell(tail, tail.diag.shape[0]))
        n_owned = A.n_owned if A.n_owned is not None else A.n
        owned = jnp.arange(A.n) < n_owned

        def M(r):
            r2 = fold_b(r)
            z = self._cycle0(levels, mats, [inv], r2)
            z = recover(z, r)
            return jnp.where(owned if z.ndim == 1 else owned[:, None], z, 0.0)

        return M

    def _get_levels(self, A: ELLMatrix):
        cols = A.cols
        if isinstance(cols, jax.core.Tracer):
            if not self._levels_cache:
                raise RuntimeError(
                    "AMG used inside jit before setup_structure() was called "
                    "with concrete matrix structure"
                )
            # one solver instance can precondition matrices of different
            # ELL widths (e.g. an IBM-widened momentum matrix next to the
            # untouched pressure matrix): match the hierarchy to THIS
            # matrix's static pattern shape, not merely the newest entry
            for key, lev in self._levels_cache.items():
                if (isinstance(key, tuple) and len(key) == 2
                        and key[0] == tuple(A.cols.shape)):
                    return lev
            return next(iter(self._levels_cache.values()))
        # device tables are slot-leading; setup takes host (n, K)
        return self.setup_structure(np.asarray(cols).T, np.asarray(A.mask).T)

    # -- cycle --------------------------------------------------------------

    def _smooth(self, A: ELLMatrix, x, b, sweeps):
        for _ in range(sweeps):
            x = A.jacobi_step(x, b, self.omega)
        return x

    def _cycle(self, levels, mats, denses, lvl, b, ctype=None):
        """One multigrid cycle starting with x=0 at level lvl; returns x.

        V: one coarse visit.  W: two coarse visits, both W.  F: the
        full-multigrid-style intermediate — an F-cycle coarse visit
        followed by a V-cycle correction (reference AMG.h:40-70 cycles
        V/W/F)."""
        ctype = ctype or self.cycle_type
        A = mats[lvl]
        if lvl == len(levels):
            return denses[-1] @ b
        x = self._smooth(A, jnp.zeros_like(b), b, self.nu_pre * self.smoother_sweeps)
        r = b - A.mv(x)
        rc = levels[lvl].restrict(r)
        xc = self._cycle(levels, mats, denses, lvl + 1, rc, ctype)
        if ctype in ("W", "F") and lvl + 1 < len(levels):
            rc2 = rc - mats[lvl + 1].mv(xc)
            xc = xc + self._cycle(
                levels, mats, denses, lvl + 1, rc2,
                "V" if ctype == "F" else "W",
            )
        x = x + levels[lvl].prolong(xc)
        x = self._smooth(A, x, b, self.nu_post * self.smoother_sweeps)
        return x

    def _build_hierarchy(self, A: ELLMatrix):
        from ..ops.dia import DIAMatrix

        levels = self._get_levels(A)
        mats = [A.prepare()]
        for lev in levels:
            mats.append(lev.galerkin(mats[-1]).prepare())
        tail = mats[-1]
        if isinstance(tail, DIAMatrix):
            dense = tail.to_dense()
        else:
            dense = _dense_from_ell(tail, tail.diag.shape[0])
        inv = dense_inverse(dense)
        if self.precision == "bf16":
            bf = jnp.bfloat16

            def cast(m):
                if isinstance(m, DIAMatrix):
                    return DIAMatrix(
                        m.diag.astype(bf), m.coef.astype(bf), m.offsets
                    ).prepare()
                return m.replace(
                    diag=m.diag.astype(bf),
                    off=m.off.astype(bf),
                    dia_coef=(None if m.dia_coef is None
                              else m.dia_coef.astype(bf)),
                    dia_fb_vals=(None if m.dia_fb_vals is None
                                 else m.dia_fb_vals.astype(bf)),
                    dia_pk=(None if m.dia_pk is None else
                            tuple(p.astype(bf) for p in m.dia_pk)),
                )

            mats = [cast(m) for m in mats]
            inv = inv.astype(bf)
        # factor once per solve; every cycle's coarse solve is then a matmul
        return levels, mats, [inv]

    # -- public -------------------------------------------------------------

    def _cycle0(self, levels, mats, denses, r):
        """Top-level cycle with optional low-precision cast at the edges."""
        if self.precision == "bf16":
            z = self._cycle(levels, mats, denses, 0, r.astype(jnp.bfloat16))
            return z.astype(r.dtype)
        return self._cycle(levels, mats, denses, 0, r)

    def precond_fn(self):
        def M(A: ELLMatrix, r: jnp.ndarray) -> jnp.ndarray:
            levels, mats, denses = self._build_hierarchy(A)
            return self._cycle0(levels, mats, denses, r)

        return M

    def precond_setup(self, A: ELLMatrix):
        """Build the hierarchy ONCE for this matrix; returns r -> z.

        Krylov solvers call this before their iteration loop so the
        Galerkin products and coarse factorization are hoisted out of the
        while_loop (the reference similarly separates createCoarseLevels
        from cycle(), AMG.cpp).  Distributed matrices get the shard-local
        additive-Schwarz cycle (setup_structure_dist)."""
        if getattr(A, "axis_name", None) is not None:
            return self._precond_setup_dist(A)
        levels, mats, denses = self._build_hierarchy(A)

        def M(r: jnp.ndarray) -> jnp.ndarray:
            return self._cycle0(levels, mats, denses, r)

        return M

    def solve_fn(self, A: ELLMatrix, b: jnp.ndarray, x0: jnp.ndarray):
        from .base import condensed

        if getattr(A, "axis_name", None) is not None:
            # distributed standalone solve: the shard-local cycles are an
            # additive-Schwarz preconditioner (no global coupling beyond
            # the seams), so plain Richardson stalls with many shards —
            # accelerate with a psum-reduced BiCGStab around the local
            # cycle, the TPU counterpart of the reference's distributed
            # AMG with coarse rank merging (AMG.h:53-103)
            from .krylov import BiCGStab

            inner = BiCGStab(
                preconditioner=self,
                relative_tolerance=self.relativeTolerance,
                absolute_tolerance=self.absoluteTolerance,
                max_iterations=self.nMaxIterations,
            )
            return inner.solve_fn(A, b, x0)

        A, b, recover = condensed(A, b)
        A = A.prepare()
        levels, mats, denses = self._build_hierarchy(A)
        rtol, atol, maxit = (
            self.relativeTolerance,
            self.absoluteTolerance,
            self.nMaxIterations,
        )
        r0n = norm(b - A.mv(x0))
        target = jnp.maximum(rtol * r0n, atol)

        # divergence guard: a V-cycle is not guaranteed to contract on
        # strongly convective matrices (upwinded mass flux mid-SIMPLE),
        # and one expanding cycle compounds geometrically; track the best
        # iterate and stop on clear divergence, returning the best (the
        # outer Picard loop then proceeds from a usable update)
        def cond(state):
            i, x, rn, bx, brn = state
            ok = jnp.isfinite(rn) & (rn < 1e4 * (r0n + atol))
            return (i < maxit) & (rn > target) & ok

        def body(state):
            i, x, rn, bx, brn = state
            r = b - A.mv(x)
            x = x + self._cycle0(levels, mats, denses, r)
            rn = norm(b - A.mv(x))
            better = jnp.isfinite(rn) & (rn < brn)
            bx = jnp.where(better, x, bx)
            brn = jnp.where(better, rn, brn)
            return (i + 1, x, rn, bx, brn)

        i, x, rn, bx, brn = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x0, r0n, x0, r0n)
        )
        return recover(bx), SolveStats(i, r0n, brn, brn <= target)


class DirectSolver(LinearSolver):
    """Dense on-chip direct solve (replaces the reference's UMFPACK-backed
    DirectSolver, DirectSolver.cpp:6-83).  For small systems / testing."""

    def solve_fn(self, A: ELLMatrix, b: jnp.ndarray, x0: jnp.ndarray):
        n = A.diag.shape[0]
        D = _dense_from_ell(A, n)
        x = gauss_solve(D, b)
        rn = norm(b - A.mv(x))
        r0 = norm(b - A.mv(x0))
        return x, SolveStats(jnp.int32(1), r0, rn, rn <= r0 * 1e-10 + 1e-30)
