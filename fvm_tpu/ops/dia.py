"""DIA (diagonal-offset) fast path for ELL SpMV on TPU.

TPU has no hardware gather: XLA lowers x[cols] to a per-element loop
(~6 cycles/element), which made the ELL SpMV the bottleneck of every
solver.  The TPU-native fix: with a locality-preserving cell numbering
(structured generators, RCB partitions, import-time renumbering), the vast
majority of matrix entries have col - row drawn from a handful of distinct
offsets (a structured quad mesh has exactly {-ny, -1, +1, +ny} for all
interior cells).  Bucketing ELL slots by offset turns the SpMV into

    y = diag * x + sum_o coef_o * roll(x, -delta_o) + small fallback

where each roll is a static slice+concat (pure VPU/memory op, no gather)
and coef_o is built from the ELL values with K elementwise selects.  The
few entries with rare offsets (boundary ghosts, partition seams) fall back
to an explicit gather + scatter-add over a short static index list.

This is the role CRMatrix's hand-tuned CSR loops play in the reference
(reference: CRMatrix.h:200 multiply) — redesigned for the vector unit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def analyze_offsets(cols: np.ndarray, mask: np.ndarray, max_offsets: int = 16,
                    min_fraction: float = 0.005):
    """Choose DIA offsets for an ELL structure.

    Returns (offsets tuple, bucket (n,K) int32 with -1 = fallback,
    fb_rows, fb_slots) — all static numpy; or None if DIA doesn't pay
    (fallback fraction too high).
    """
    n, K = cols.shape
    rows = np.arange(n)[:, None]
    delta = np.where(mask, cols - rows, np.iinfo(np.int32).max)
    vals, counts = np.unique(delta[mask], return_counts=True)
    order = np.argsort(counts)[::-1]
    vals, counts = vals[order], counts[order]
    total = counts.sum()
    keep = [
        int(v)
        for v, c in zip(vals[:max_offsets], counts[:max_offsets])
        if c >= min_fraction * total and v != 0
    ]
    if not keep:
        return None
    offsets = tuple(keep)
    lut = {v: i for i, v in enumerate(offsets)}
    bucket = np.full((n, K), -1, dtype=np.int32)
    for i, v in enumerate(offsets):
        bucket[delta == v] = i
    fb = mask & (bucket < 0)
    fb_frac = fb.sum() / max(total, 1)
    if fb_frac > 0.15:
        return None  # too unstructured; plain gather is better
    fb_rows, fb_slots = np.nonzero(fb)
    return offsets, bucket, fb_rows.astype(np.int32), fb_slots.astype(np.int32)


class CondensePlan:
    """Static row-elimination plan (boundary-ghost condensation).

    Rows with at most ONE off-diagonal coupling (boundary-condition ghost
    rows, dummy padding rows) are 2x2 relations that can be eliminated
    exactly before the solve — the TPU motivation is that these rows are
    precisely the source of the DIA fallback entries, whose scatter-add
    costs ~0.12 ms per SpMV at 1M cells.  After condensation the system
    is a pure tensor-product stencil (empty fallback), solved at full
    roll speed; the eliminated unknowns are recovered exactly afterwards.

    Counterpart of the reference's CRMatrix::eliminateBoundaryEquations
    (reference: CRMatrix.h:1064).
    """

    def __init__(self, cols: np.ndarray, mask: np.ndarray,
                 drop_beyond: int | None = None):
        n, K = cols.shape
        # drop_beyond: treat rows >= drop_beyond (distributed halo /
        # padding cells) as outside the local domain — their rows and all
        # couplings into them are removed from the pattern WITHOUT
        # folding (the additive-Schwarz approximation used when the plan
        # serves a local preconditioner).  Never used on an exact solve.
        if drop_beyond is not None:
            mask = mask.copy()
            mask[drop_beyond:] = False
            mask = mask & (cols < drop_beyond)
        valid = mask & (cols != np.arange(n)[:, None])
        deg = valid.sum(axis=1)
        cand = deg <= 1
        # partner of each candidate (or itself when degree 0)
        slot = np.where(cand, np.argmax(valid, axis=1), 0)
        part = np.where(cand & (deg == 1), cols[np.arange(n), slot],
                        np.arange(n))
        # drop candidates whose partner is itself a candidate (isolated
        # pairs) and, iteratively, those with an in-coupling from a row
        # that is not their partner (substitution would create fill-in)
        elim = cand & ~cand[part]
        for _ in range(2):
            ir, ik = np.nonzero(valid & elim[cols] & ~elim[:, None])
            tgt = cols[ir, ik]
            bad = part[tgt] != ir
            if not bad.any():
                break
            elim[tgt[bad]] = False
        self.ok = bool(elim.any())
        if not self.ok:
            # still expose the (possibly halo-dropped) structure so the
            # distributed setup can use it uniformly
            self.mask2 = mask
            self.dia2 = DIAInfo.build(cols, mask, condense=False)
            return
        e = np.nonzero(elim)[0]
        self.elim_rows = e.astype(np.int32)
        self.elim_slot = np.where(deg[e] == 1, slot[e], -1).astype(np.int32)
        self.elim_part = part[e].astype(np.int32)
        lut = np.full(n, -1, dtype=np.int64)
        lut[e] = np.arange(len(e))
        ir, ik = np.nonzero(valid & elim[cols] & ~elim[:, None])
        self.in_rows = ir.astype(np.int32)
        self.in_slots = ik.astype(np.int32)
        self.in_elim = lut[cols[ir, ik]].astype(np.int32)
        # condensed structure: eliminated couplings and rows removed
        mask2 = mask.copy()
        mask2[ir, ik] = False
        mask2[e] = False
        self.dia2 = DIAInfo.build(cols, mask2, condense=False)
        self.mask2 = mask2

    def as_device(self):
        # converted per use site: a jnp constant created inside one trace
        # must not be cached across traces
        return tuple(
            jnp.asarray(a) for a in (
                self.elim_rows, self.elim_slot, self.elim_part,
                self.in_rows, self.in_slots, self.in_elim,
            )
        )


class DIAInfo:
    """Static DIA metadata attached to a mesh or AMG level (hashable by id).

    Built from HOST (n, K) cols/mask tables; the device ``bucket`` array is
    stored SLOT-LEADING (K, n) to match the slot-leading ELL value layout
    (contiguous (n,)-lane selects on the VPU instead of period-K
    interleaves)."""

    def __init__(self, offsets, bucket, fb_rows, fb_slots, cols):
        self.offsets = offsets
        self.bucket = jnp.asarray(np.ascontiguousarray(bucket.T))  # (K, n)
        self.fb_rows = jnp.asarray(fb_rows)
        self.fb_slots = jnp.asarray(fb_slots)
        # fallback column indices (static): cols[fb_rows, fb_slots]
        self.fb_cols = jnp.asarray(
            np.asarray(cols)[np.asarray(fb_rows), np.asarray(fb_slots)]
        )
        self.cond_plan = None  # CondensePlan | None, set by build()

    @staticmethod
    def build(cols_np: np.ndarray, mask_np: np.ndarray, condense: bool = True):
        res = analyze_offsets(cols_np, mask_np)
        if res is None:
            return None
        offsets, bucket, fb_rows, fb_slots = res
        info = DIAInfo(offsets, bucket, fb_rows, fb_slots, cols_np)
        if condense and len(fb_rows):
            plan = CondensePlan(cols_np, mask_np)
            if plan.ok and plan.dia2 is not None:
                info.cond_plan = plan
        return info


class ShiftGather:
    """Gather ``x[idx]`` as a sum of offset-bucketed static slices.

    For locality-preserving numberings, ``idx[i] - i`` takes only a handful
    of distinct values (mesh face->cell and cell->face maps are piecewise
    affine).  Each bucket becomes one static slice of a zero-padded copy of
    x — no gather instruction at all; a small fallback gather covers the
    rare offsets.  This is the generalization of the DIA SpMV trick to
    every index map in the assembly fabric.
    """

    def __init__(self, offsets, bucket, fb_pos, fb_idx, n_out, n_src, pad_lo):
        self.offsets = offsets  # python ints
        self.bucket = jnp.asarray(bucket)  # (n_out,) int32, -1 = fallback
        self.fb_pos = jnp.asarray(fb_pos)  # output positions for fallback
        self.fb_idx = jnp.asarray(fb_idx)  # source indices for fallback
        self.n_out = int(n_out)
        self.n_src = int(n_src)
        self.pad_lo = int(pad_lo)

    @staticmethod
    def build(idx: np.ndarray, n_src: int, max_offsets: int = 24,
              min_fraction: float = 0.003):
        idx = np.asarray(idx)
        n_out = idx.shape[0]
        delta = idx.astype(np.int64) - np.arange(n_out)
        vals, counts = np.unique(delta, return_counts=True)
        order = np.argsort(counts)[::-1]
        vals, counts = vals[order], counts[order]
        keep = [
            int(v)
            for v, c in zip(vals[:max_offsets], counts[:max_offsets])
            if c >= min_fraction * n_out
        ]
        if not keep:
            return None
        bucket = np.full(n_out, -1, dtype=np.int32)
        for i, v in enumerate(keep):
            bucket[delta == v] = i
        fb = bucket < 0
        if fb.sum() > 0.2 * n_out:
            return None
        fb_pos = np.nonzero(fb)[0].astype(np.int32)
        fb_idx = idx[fb].astype(np.int32)
        pad_lo = max(0, -min(keep))
        return ShiftGather(tuple(keep), bucket, fb_pos, fb_idx, n_out, n_src, pad_lo)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (n_src, ...) -> (n_out, ...)."""
        trailing = x.shape[1:]
        pad_hi = max(0, self.pad_lo + max(self.offsets) + self.n_out - self.n_src)
        pad_width = [(self.pad_lo, pad_hi)] + [(0, 0)] * len(trailing)
        xp = jnp.pad(x, pad_width)
        out = jnp.zeros((self.n_out,) + trailing, x.dtype)
        bshape = (self.n_out,) + (1,) * len(trailing)
        for i, d in enumerate(self.offsets):
            sl = jax.lax.slice_in_dim(xp, self.pad_lo + d, self.pad_lo + d + self.n_out, axis=0)
            out = jnp.where((self.bucket == i).reshape(bshape), sl, out)
        if self.fb_pos.shape[0]:
            out = out.at[self.fb_pos].set(x[self.fb_idx])
        return out


def dia_gather_slots(dia: DIAInfo, cols, mask, x):
    """x[cols] per ELL slot using the DIA buckets: (K, n, ...) result.

    Used by gradient evaluation; identical semantics to a plain gather but
    built from rolls + selects (padded slots return x[row]).
    """
    K, n = cols.shape
    trailing = x.shape[1:]
    out = jnp.broadcast_to(x[None], (K, n) + trailing)
    bshape = (K, n) + (1,) * len(trailing)
    for i, d in enumerate(dia.offsets):
        rolled = jnp.roll(x, -d, axis=0)
        out = jnp.where(
            (dia.bucket == i).reshape(bshape), rolled[None], out
        )
    if dia.fb_rows.shape[0]:
        out = out.at[dia.fb_slots, dia.fb_rows].set(x[dia.fb_cols])
    return out


def build_coef(dia: DIAInfo, off, mask):
    """Precompute per-offset DIA coefficients from the ELL values.

    ``off``/``mask`` are slot-leading (K, n).  Returns (coef (D, n),
    fb_vals (n_fb,)).  Hoists the K-way select that dia_mv otherwise redoes
    on every SpMV: one pass per assembled matrix instead of one per mv
    (solvers do 10-30 mv per assembly); each select runs on contiguous
    (n,) lanes in this layout."""
    offv = jnp.where(mask, off, 0.0)
    coef = jnp.stack(
        [
            jnp.sum(jnp.where(dia.bucket == i, offv, 0.0), axis=0)
            for i in range(len(dia.offsets))
        ]
    )
    if dia.fb_rows.shape[0]:
        fb_vals = offv[dia.fb_slots, dia.fb_rows]
    else:
        fb_vals = jnp.zeros((0,), off.dtype)
    return coef, fb_vals


def _compmv_active() -> bool:
    from .compdot import mv_enabled

    return mv_enabled()


def fused_apply(offsets, diag, coef, x, b=None, omega=None, mode="mv",
                fb_rows=None, fb_cols=None, fb_vals=None, pk=None):
    """Fused DIA op with precomputed per-offset coefficients.

    mode "mv": A x;  "residual": b - A x;  "jacobi":
    x + omega (b - A x) / diag.  Dispatches to the Pallas TPU kernel for
    large n; falls back to the XLA roll formulation elsewhere.  The rare
    fallback entries (offsets outside the DIA set) are applied as a small
    scatter update after the fused bulk op.
    """
    from . import pallas_kernels as pkm

    n = diag.shape[0]
    # f32 only: Mosaic has no production f64 path (the f64 Newton-polish
    # endgame at 1M would otherwise route through the kernel), and bf16
    # AMG cycles use (16,128) tiles the f32-planned halo doesn't satisfy
    if pkm.use_pallas(n) and diag.dtype == jnp.float32:
        y = pkm.dia_apply(offsets, mode, coef, diag, x, b=b, omega=omega,
                          pk=pk)
    elif (
        diag.dtype == jnp.float64
        and mode in ("mv", "residual")
        and _compmv_active()
    ):
        # double-word f32 accumulation for f64-on-emulated backends:
        # the emulated-f64 roll-sum floors Krylov residuals at ~5e-8
        # (ops/compdot.comp_dia_apply docstring)
        from .compdot import comp_dia_apply

        y = comp_dia_apply(offsets, diag, coef, x, b=b, mode=mode)
    else:
        ax = diag[:, None] * x if x.ndim == 2 else diag * x
        for i, d in enumerate(offsets):
            c = coef[i] if x.ndim == 1 else coef[i][:, None]
            ax = ax + c * jnp.roll(x, -d, axis=0)
        if mode == "mv":
            y = ax
        elif mode == "residual":
            y = b - ax
        else:
            d = diag if x.ndim == 1 else diag[:, None]
            y = x + omega * (b - ax) / d
    if fb_rows is not None and fb_rows.shape[0]:
        contrib = (fb_vals * x[fb_cols] if x.ndim == 1
                   else fb_vals[:, None] * x[fb_cols])
        if mode == "mv":
            y = y.at[fb_rows].add(contrib)
        elif mode == "residual":
            y = y.at[fb_rows].add(-contrib)
        else:
            dfb = diag[fb_rows]
            corr = omega * contrib / (dfb if x.ndim == 1 else dfb[:, None])
            y = y.at[fb_rows].add(-corr)
    return y


def dia_apply_coef(dia: DIAInfo, diag, coef, fb_vals, x, b=None, omega=None,
                   mode: str = "mv", pk=None):
    """fused_apply with the fallback tables taken from a DIAInfo."""
    return fused_apply(
        dia.offsets, diag, coef, x, b=b, omega=omega, mode=mode,
        fb_rows=dia.fb_rows, fb_cols=dia.fb_cols, fb_vals=fb_vals, pk=pk,
    )


def dia_mv(dia: DIAInfo, diag, off, mask, x):
    """y = A x using the DIA fast path; off/mask are (K, n); x is (n,) or
    (n, m)."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    offv = jnp.where(mask, off, 0.0)
    y = diag[:, None] * x
    for i, d in enumerate(dia.offsets):
        # coef_i[c] = sum_k off[k,c] * (bucket[k,c] == i)
        coef = jnp.sum(jnp.where(dia.bucket == i, offv, 0.0), axis=0)
        y = y + coef[:, None] * jnp.roll(x, -d, axis=0)
    if dia.fb_rows.shape[0]:
        vals = offv[dia.fb_slots, dia.fb_rows]  # small gather
        contrib = vals[:, None] * x[dia.fb_cols]
        y = y.at[dia.fb_rows].add(contrib)
    return y[:, 0] if squeeze else y


@jax.tree_util.register_pytree_node_class
class DIAMatrix:
    """Pure-DIA sparse matrix: diag (n,) + per-offset coefficients (D, n).

    Used for AMG coarse levels built by structured (index-pairing)
    coarsening, where the level graph is exactly a tensor-product grid and
    the ELL cols/mask tables would be pure overhead.  Same solver-facing
    interface as ELLMatrix (mv/residual/jacobi_step/diag_solve/dot/norm);
    single-device only (AMG levels live on one chip).
    """

    def __init__(self, diag, coef, offsets, pk=None):
        self.diag = diag
        self.coef = coef
        self.offsets = tuple(int(d) for d in offsets)
        self.pk = pk  # packed (coef_p, diag_p) kernel layout, or None

    def tree_flatten(self):
        return (self.diag, self.coef, self.pk), self.offsets

    @classmethod
    def tree_unflatten(cls, offsets, leaves):
        return cls(leaves[0], leaves[1], offsets, pk=leaves[2])

    @property
    def n(self):
        return self.diag.shape[0]

    def prepare(self):
        from . import pallas_kernels as pkm

        if (self.pk is None and pkm.use_pallas(self.n)
                and self.diag.dtype == jnp.float32):
            return DIAMatrix(
                self.diag, self.coef, self.offsets,
                pk=pkm.pack(self.offsets, self.coef, self.diag),
            )
        return self

    def psum(self, v):
        return v

    def scale_coeffs(self, s):
        """Multiply every stored coefficient by the scalar ``s`` (used by
        linear.base.pow2_equilibrate — exact for powers of two)."""
        return DIAMatrix(self.diag * s, self.coef * s, self.offsets)

    def dot(self, a, b):
        from . import compdot

        if compdot.use_for(a):
            return compdot.dot(a, b)
        return jnp.sum(a * b)

    def norm(self, x):
        from . import compdot

        if compdot.use_for(x):
            return compdot.norm(x)
        return jnp.sqrt(jnp.sum(x * x))

    def mv(self, x):
        return fused_apply(self.offsets, self.diag, self.coef, x, mode="mv",
                           pk=self.pk)

    def residual(self, x, b):
        return fused_apply(
            self.offsets, self.diag, self.coef, x, b=b, mode="residual",
            pk=self.pk,
        )

    def diag_solve(self, r):
        return r / (self.diag if r.ndim == 1 else self.diag[:, None])

    def jacobi_step(self, x, b, omega=1.0):
        return fused_apply(
            self.offsets, self.diag, self.coef, x, b=b, omega=omega,
            mode="jacobi", pk=self.pk,
        )

    def to_dense(self):
        n = self.n
        D = jnp.diag(self.diag)
        for i, d in enumerate(self.offsets):
            c = self.coef[i]
            if d >= 0:
                D = D + jnp.diag(c[: n - d], d) if d < n else D
            else:
                D = D + jnp.diag(c[-d:], d) if -d < n else D
        return D


class MeshGathers:
    """Bundle of ShiftGathers for a mesh's hot index maps."""

    def __init__(self, face_cell0, face_cell1, cf_face, n_cells, n_faces):
        self.owner = ShiftGather.build(face_cell0, n_cells)
        self.nbr = ShiftGather.build(face_cell1, n_cells)
        K = cf_face.shape[1]
        self.slots = []
        ok = True
        for k in range(K):
            sg = ShiftGather.build(cf_face[:, k], n_faces)
            if sg is None:
                ok = False
                break
            self.slots.append(sg)
        if not ok:
            self.slots = None

    def take_faces(self, F, cf_face):
        """F[cf_face] -> (K, nc, ...); ``cf_face`` is the device
        slot-leading (K, nc) table."""
        if self.slots is None:
            return F[cf_face]
        return jnp.stack([sg(F) for sg in self.slots], axis=0)


class PlaneMajorGathers:
    """Gather bundle for the PLANE-MAJOR face layout.

    Interior face f = j*nci + c is the j-th face owned by cell c: a flat
    (nf,) face array IS a (K, nci) stack of contiguous cell-length planes
    (plus the boundary tail).  Every hot map is then lane-contiguous:

      * owner(x)[f] = x[f mod nci]      -> broadcast + reshape (no gather,
        no period-K repeat — the slot-major layout's repeats were the
        single largest VPU cost of assembly, measured 30x at 1M cells);
      * nbr(x)       -> per-(plane, offset) contiguous slices + selects;
      * take_faces(F) -> per-slot ShiftGathers stacked to (K, nc): in this
        numbering cf_face[c, k] - c is constant for owner slots (k*nci)
        and near-constant for neighbor slots, so each plane is a handful
        of contiguous slices.
    Boundary faces live in a contiguous tail handled by small gathers.
    """

    def __init__(self, owner, nbr, cf_face, cf_mask, face_valid,
                 n_cells, n_int_cells, n_faces, n_int_faces, K):
        self.K = int(K)
        self.nci = int(n_int_cells)
        self.n_int_f = int(n_int_faces)
        self.n_src_cells = int(n_cells)
        assert self.n_int_f == self.nci * self.K
        self.bnd_owner = jnp.asarray(owner[self.n_int_f:], jnp.int32)
        self.bnd_nbr = jnp.asarray(nbr[self.n_int_f:], jnp.int32)

        # neighbor cell offsets per (plane, cell): delta[j, c] = nbr - c
        validP = face_valid[: self.n_int_f].reshape(self.K, self.nci)
        nbrP = nbr[: self.n_int_f].reshape(self.K, self.nci)
        delta = np.where(validP, nbrP - np.arange(self.nci)[None, :], 0)
        vals, counts = np.unique(delta[validP], return_counts=True)
        order = np.argsort(counts)[::-1]
        keep = [int(v) for v, c in zip(vals[order][:16], counts[order][:16])
                if c >= 0.002 * max(self.n_int_f, 1)]
        bucket = np.full((self.K, self.nci), -1, dtype=np.int32)
        for i, v in enumerate(keep):
            bucket[(delta == v) & validP] = i
        fb = validP & (bucket < 0)
        self.nbr_offsets = tuple(keep)
        self.nbr_bucket = jnp.asarray(bucket)
        fbj, fbc = np.nonzero(fb)
        self.nbr_fb_pos = jnp.asarray(
            (fbj * self.nci + fbc).astype(np.int32))
        self.nbr_fb_idx = jnp.asarray(nbrP[fb].astype(np.int32))
        self.pad_lo = max(0, -min(keep)) if keep else 0
        self.pad_hi = (max(0, max(keep) + self.nci - self.n_src_cells)
                       if keep else 0)

        # per-slot cf_face maps (constant/near-constant offsets per plane)
        self.slots = []
        for k in range(cf_face.shape[1]):
            sg = ShiftGather.build(cf_face[:, k], n_faces)
            if sg is None:
                self.slots = None
                break
            self.slots.append(sg)

    # -- face <- cell maps --------------------------------------------------

    def owner(self, x):
        head = jnp.broadcast_to(
            x[None, : self.nci], (self.K, self.nci) + x.shape[1:]
        ).reshape((self.n_int_f,) + x.shape[1:])
        tail = x[self.bnd_owner]
        return jnp.concatenate([head, tail], axis=0)

    def nbr(self, x):
        trailing = x.shape[1:]
        pad = [(self.pad_lo, self.pad_hi)] + [(0, 0)] * len(trailing)
        xp = jnp.pad(x, pad)
        head = jnp.broadcast_to(
            x[None, : self.nci], (self.K, self.nci) + trailing
        )
        bshape = (self.K, self.nci) + (1,) * len(trailing)
        for i, d in enumerate(self.nbr_offsets):
            seg = jax.lax.slice_in_dim(
                xp, self.pad_lo + d, self.pad_lo + d + self.nci, axis=0
            )
            head = jnp.where(
                (self.nbr_bucket == i).reshape(bshape), seg[None], head
            )
        head = head.reshape((self.n_int_f,) + trailing)
        if self.nbr_fb_pos.shape[0]:
            head = head.at[self.nbr_fb_pos].set(x[self.nbr_fb_idx])
        tail = x[self.bnd_nbr]
        return jnp.concatenate([head, tail], axis=0)

    def take_faces(self, F, cf_face):
        """-> (K, nc, ...); ``cf_face`` is the device (K, nc) table."""
        if self.slots is None:
            return F[cf_face]
        return jnp.stack([sg(F) for sg in self.slots], axis=0)


