"""ELL-format sparse matrix and kernels (SpMV, smoothers, residual).

TPU-native replacement for the reference's ``CRMatrix<Diag,OffDiag,X>``
(reference: src/fvm/src/modules/fvmbase/CRMatrix.h:87).  CSR with
variable-length rows defeats XLA's static-shape model, so we store the
off-diagonal in fixed-width ELL slots aligned with the mesh's cell->face
table.  Layout is SLOT-LEADING: ``off[k, c]`` couples cell ``c`` to
``cols[k, c]`` — each slot plane is one contiguous (n,)-lane vector, so
the K-way masks/selects/reductions of assembly and coefficient builds run
on full VPU lanes instead of period-K interleaves (measured 30x on the
assembly fabric at 1M cells).  SpMV is a dense gather + reduction that
vectorizes on the VPU; no scatters anywhere.

Solution vectors are ``(n, m)`` — m right-hand components share one scalar
coefficient matrix (covers u/v/w momentum like the reference's vector-X
CRMatrix instantiation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ELLMatrix:
    """A x = diag * x + sum_k off[k,:] * x[cols[k,:]] (masked).

    Distributed mode (axis_name set): rows [0, n_owned) are owned by this
    shard; ``halo`` gives the exchange tables for refreshing the halo slots
    of x before the gather, and mv zeroes non-owned rows so global dot
    products count each row exactly once.
    """

    diag: jnp.ndarray  # (n,)
    off: jnp.ndarray  # (K, n) slot-leading
    cols: jnp.ndarray  # (K, n) int32; padded slots point at own row
    mask: jnp.ndarray  # (K, n) bool
    halo: object = None  # ops.halo.HaloSpec | None
    axis_name: str | None = struct.field(pytree_node=False, default=None)
    n_owned: int | None = struct.field(pytree_node=False, default=None)
    # DIA fast-path metadata (ops.dia.DIAInfo); static, compared by identity
    dia: object = struct.field(pytree_node=False, default=None)
    # precomputed DIA coefficients (build_coef): (D, n) per-offset values
    # and the rare-offset fallback values.  Set by prepare(); enables the
    # fused Pallas kernels and removes the per-mv K-way select.
    dia_coef: jnp.ndarray | None = None
    dia_fb_vals: jnp.ndarray | None = None
    # packed (coef_p, diag_p) kernel layout (pallas_kernels.pack)
    dia_pk: tuple | None = None

    @property
    def n(self) -> int:
        return self.diag.shape[0]

    def prepare(self):
        """Precompute DIA coefficients once per assembled matrix."""
        if self.dia is None or self.dia_coef is not None:
            return self
        from .dia import build_coef

        coef, fb = build_coef(self.dia, self.off, self.mask)
        from . import pallas_kernels as pkm

        pk = (pkm.pack(self.dia.offsets, coef, self.diag)
              if pkm.use_pallas(self.n) and self.diag.dtype == jnp.float32
              else None)
        return self.replace(dia_coef=coef, dia_fb_vals=fb, dia_pk=pk)

    @property
    def width(self) -> int:
        return self.off.shape[0]

    def scale_coeffs(self, s):
        """Multiply every stored coefficient by the scalar ``s`` (used by
        linear.base.pow2_equilibrate — exact for powers of two)."""
        return self.replace(
            diag=self.diag * s,
            off=self.off * s,
            dia_coef=None if self.dia_coef is None else self.dia_coef * s,
            dia_fb_vals=(
                None if self.dia_fb_vals is None else self.dia_fb_vals * s
            ),
            dia_pk=None,
        )

    def condense(self, b):
        """Eliminate boundary-ghost/padding rows exactly before the solve.

        Returns (A2, b2, recover) where A2 has the condensed DIA structure
        (empty fallback => pure roll SpMV), eliminated rows are identity
        with zero rhs, and recover(x2) back-substitutes their exact
        values.  Counterpart of CRMatrix::eliminateBoundaryEquations
        (reference: CRMatrix.h:1064); no-op when there is no plan or the
        matrix is distributed."""
        plan = None if self.dia is None else self.dia.cond_plan
        if plan is None or self.axis_name is not None:
            return self, b, (lambda x: x)
        er, es, ep, ir, ik, ie = plan.as_device()
        offv = jnp.where(self.mask, self.off, 0.0)
        vE = jnp.where(es >= 0, offv[jnp.maximum(es, 0), er], 0.0)
        dE = self.diag[er]
        vIn = offv[ik, ir]
        diag2 = self.diag.at[ir].add(-vIn * vE[ie] / dE[ie])
        diag2 = diag2.at[er].set(1.0)
        # zero eliminated couplings in the VALUES too so paths that read
        # off/mask directly (dense coarse build, generic AMG levels) see
        # the condensed operator
        off2 = offv.at[ik, ir].set(0.0)
        off2 = off2.at[:, er].set(0.0)
        bE = b[er]
        if b.ndim == 1:
            b2 = b.at[ir].add(-vIn / dE[ie] * bE[ie])
            b2 = b2.at[er].set(0.0)
        else:
            b2 = b.at[ir].add(-(vIn / dE[ie])[:, None] * bE[ie])
            b2 = b2.at[er].set(0.0)
        A2 = self.replace(
            diag=diag2, off=off2, dia=plan.dia2,
            dia_coef=None, dia_fb_vals=None, dia_pk=None,
        ).prepare()

        def recover(x2):
            if x2.ndim == 1:
                xE = (bE - vE * x2[ep]) / dE
            else:
                xE = (bE - vE[:, None] * x2[ep]) / dE[:, None]
            return x2.at[er].set(xE)

        return A2, b2, recover

    def sync(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.halo is not None and self.axis_name is not None:
            from .halo import halo_exchange

            return halo_exchange(x, self.halo, self.axis_name)
        return x

    def psum(self, v):
        if self.axis_name is not None:
            import jax

            return jax.lax.psum(v, self.axis_name)
        return v

    def dot(self, a: jnp.ndarray, b: jnp.ndarray):
        """Global inner product (psum across shards when distributed).
        f64 on emulated-f64 backends uses the compensated double-word
        path (ops/compdot.py) — plain emulated dots carry only ~f32
        accuracy and stall Krylov recurrences below rel ~1e-7."""
        from . import compdot

        if compdot.use_for(a):
            return compdot.dot(a, b, psum=self.psum)
        return self.psum(jnp.sum(a * b))

    def norm(self, x: jnp.ndarray):
        from . import compdot

        if compdot.use_for(x):
            return compdot.norm(x, psum=self.psum)
        return jnp.sqrt(self.psum(jnp.sum(x * x)))

    def _mask_owned(self, y):
        if self.n_owned is not None and self.n_owned < self.n:
            owned = jnp.arange(self.n) < self.n_owned
            y = jnp.where(owned if y.ndim == 1 else owned[:, None], y, 0.0)
        return y

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Sparse matrix-vector product; x is (n,) or (n, m)."""
        x = self.sync(x)
        if self.dia is not None:
            if self.dia_coef is not None:
                from .dia import dia_apply_coef

                y = dia_apply_coef(
                    self.dia, self.diag, self.dia_coef, self.dia_fb_vals, x,
                    pk=self.dia_pk,
                )
                return self._mask_owned(y)
            from .dia import dia_mv

            y = dia_mv(self.dia, self.diag, self.off, self.mask, x)
            return self._mask_owned(y)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        off = jnp.where(self.mask, self.off, 0.0)
        from . import compdot

        if x.dtype == jnp.float64 and compdot.mv_enabled():
            # double-word f32 row accumulation: the emulated-f64
            # gather-sum floors Krylov residuals at ~5e-8 on chip
            # (ops/compdot.comp_ell_rows docstring)
            y = compdot.comp_ell_rows(self.diag, off, self.cols, x)
        else:
            xn = x[self.cols]  # (K, n, m) gather
            y = self.diag[:, None] * x + jnp.einsum("kn,knm->nm", off, xn)
        if self.n_owned is not None and self.n_owned < self.n:
            owned = (jnp.arange(self.n) < self.n_owned)[:, None]
            y = jnp.where(owned, y, 0.0)
        return y[:, 0] if squeeze else y

    def _fused_ok(self):
        """Fused residual/jacobi need the DIA-coef path and no dist sync
        complications beyond what mv handles (sync happens first)."""
        return self.dia is not None and self.dia_coef is not None

    def residual(self, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if self._fused_ok() and (self.n_owned is None or self.n_owned >= self.n):
            from .dia import dia_apply_coef

            x = self.sync(x)
            return dia_apply_coef(
                self.dia, self.diag, self.dia_coef, self.dia_fb_vals, x,
                b=b, mode="residual", pk=self.dia_pk,
            )
        return b - self.mv(x)

    def diag_solve(self, r: jnp.ndarray) -> jnp.ndarray:
        return r / (self.diag if r.ndim == 1 else self.diag[:, None])

    def jacobi_step(self, x, b, omega=1.0):
        """Damped Jacobi: x + omega * D^-1 (b - A x)."""
        if self._fused_ok() and (self.n_owned is None or self.n_owned >= self.n):
            from .dia import dia_apply_coef

            x = self.sync(x)
            return dia_apply_coef(
                self.dia, self.diag, self.dia_coef, self.dia_fb_vals, x,
                b=b, omega=omega, mode="jacobi", pk=self.dia_pk,
            )
        return x + omega * self.diag_solve(self.residual(x, b))

    def colored_gs_step(self, x, b, color_masks, forward=True):
        """Multicolor Gauss-Seidel sweep.

        ``color_masks`` is a (ncolors, n) bool array built on the host
        (greedy coloring).  Updating one color at a time reproduces true GS
        within each color (no intra-color couplings by construction) while
        remaining fully vectorized — the TPU-native answer to the
        reference's sequential forwardGS/reverseGS (CRMatrix.h:303-353).
        """
        colors = range(color_masks.shape[0])
        if not forward:
            colors = reversed(list(colors))
        for c in colors:
            m = color_masks[c]
            r = self.residual(x, b)
            d = self.diag if x.ndim == 1 else self.diag[:, None]
            upd = x + r / d
            mm = m if x.ndim == 1 else m[:, None]
            x = jnp.where(mm, upd, x)
        return x

    def rowsum_offdiag_abs(self):
        off = jnp.where(self.mask, jnp.abs(self.off), 0.0)
        return off.sum(axis=0)

    def transpose_apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """A^T x via scatter-add (used rarely; e.g. adjoint checks)."""
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        off = jnp.where(self.mask, self.off, 0.0)
        y = self.diag[:, None] * x
        contrib = off[:, :, None] * x[None, :, :]  # (K, n, m)
        y = y.at[self.cols.reshape(-1)].add(
            contrib.reshape(-1, x.shape[1]), mode="drop"
        )
        return y[:, 0] if squeeze else y


def greedy_coloring(cols_np, mask_np):
    """Host-side greedy graph coloring; returns (ncolors, n) bool masks.

    Runs in the native host library when available (bit-identical to the
    python loop below, which is the fallback)."""
    import numpy as np

    from .. import native

    color_native = native.greedy_color(cols_np, mask_np)
    if color_native is not None:
        color = color_native
        ncolors = int(color.max()) + 1
        masks = np.zeros((ncolors, len(color)), dtype=bool)
        masks[color, np.arange(len(color))] = True
        return masks

    n, K = cols_np.shape
    color = -np.ones(n, dtype=np.int64)
    for i in range(n):
        nbr_colors = set(
            color[cols_np[i, k]] for k in range(K) if mask_np[i, k]
        )
        c = 0
        while c in nbr_colors:
            c += 1
        color[i] = c
    ncolors = int(color.max()) + 1
    masks = np.zeros((ncolors, n), dtype=bool)
    masks[color, np.arange(n)] = True
    return masks
