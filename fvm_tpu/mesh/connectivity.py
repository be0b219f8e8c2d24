"""Compressed-row connectivity between index spaces.

TPU-native counterpart of the reference's ``CRConnectivity``
(reference: src/fvm/src/modules/fvmbase/CRConnectivity.h:52) — a CSR graph
between two index spaces with transpose / multiply / subset algebra.  This
lives entirely on the host (numpy): connectivities are mesh-import-time
metadata that get baked into padded ELL index tables before anything touches
the device.
"""

from __future__ import annotations

import numpy as np

from ..exceptions import MeshError


class CRConnectivity:
    """CSR graph: ``count_from`` rows, entries index into [0, count_to).

    Parameters
    ----------
    row_ptr : (count_from + 1,) int64
    col : (nnz,) int64
    count_to : int
    """

    def __init__(self, row_ptr: np.ndarray, col: np.ndarray, count_to: int):
        self.row_ptr = np.ascontiguousarray(row_ptr, dtype=np.int64)
        self.col = np.ascontiguousarray(col, dtype=np.int64)
        self.count_to = int(count_to)
        if self.row_ptr.ndim != 1 or self.col.ndim != 1:
            raise MeshError("CRConnectivity arrays must be 1-D")
        if self.row_ptr[0] != 0 or self.row_ptr[-1] != len(self.col):
            raise MeshError("CRConnectivity row_ptr inconsistent with col")

    # -- basic accessors ---------------------------------------------------

    @property
    def count_from(self) -> int:
        return len(self.row_ptr) - 1

    @property
    def nnz(self) -> int:
        return len(self.col)

    def row(self, i: int) -> np.ndarray:
        return self.col[self.row_ptr[i] : self.row_ptr[i + 1]]

    def row_counts(self) -> np.ndarray:
        return np.diff(self.row_ptr)

    def __repr__(self) -> str:
        return (
            f"CRConnectivity({self.count_from} -> {self.count_to}, "
            f"nnz={self.nnz})"
        )

    # -- constructors ------------------------------------------------------

    @staticmethod
    def from_rows(rows, count_to: int) -> "CRConnectivity":
        """Build from an iterable of index sequences."""
        counts = np.fromiter((len(r) for r in rows), dtype=np.int64, count=len(rows))
        row_ptr = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(counts, out=row_ptr[1:])
        col = np.empty(row_ptr[-1], dtype=np.int64)
        for i, r in enumerate(rows):
            col[row_ptr[i] : row_ptr[i + 1]] = r
        return CRConnectivity(row_ptr, col, count_to)

    @staticmethod
    def from_pairs(
        row_idx: np.ndarray, col_idx: np.ndarray, count_from: int, count_to: int
    ) -> "CRConnectivity":
        """Build from COO (row, col) pairs; entries sorted by row (stable)."""
        order = np.argsort(row_idx, kind="stable")
        row_idx = np.asarray(row_idx)[order]
        col_idx = np.asarray(col_idx)[order]
        counts = np.bincount(row_idx, minlength=count_from)
        row_ptr = np.zeros(count_from + 1, dtype=np.int64)
        np.cumsum(counts, out=row_ptr[1:])
        return CRConnectivity(row_ptr, col_idx.astype(np.int64), count_to)

    # -- algebra (reference: CRConnectivity.h:74-100) ----------------------

    def transpose(self, count_from_override: int | None = None) -> "CRConnectivity":
        """Reverse the graph: (a -> b) becomes (b -> a)."""
        n_to = self.count_to if count_from_override is None else count_from_override
        rows = np.repeat(
            np.arange(self.count_from, dtype=np.int64), self.row_counts()
        )
        return CRConnectivity.from_pairs(self.col, rows, n_to, self.count_from)

    def multiply(self, other: "CRConnectivity", drop_self: bool = True) -> "CRConnectivity":
        """Compose: self (a -> b) * other (b -> c) = (a -> c), deduplicated.

        ``drop_self`` removes i from row i (used for cellCells from
        cellFaces * faceCells, mirroring CRConnectivity::multiply).
        """
        if self.count_to != other.count_from:
            raise MeshError("multiply: incompatible connectivities")
        out_rows = []
        for i in range(self.count_from):
            mids = self.row(i)
            if len(mids) == 0:
                out_rows.append(np.empty(0, dtype=np.int64))
                continue
            parts = [other.row(m) for m in mids]
            merged = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
            # preserve first-seen order (matters for reproducible layouts)
            uniq, first = np.unique(merged, return_index=True)
            merged = uniq[np.argsort(first)]
            if drop_self:
                merged = merged[merged != i]
            out_rows.append(merged)
        return CRConnectivity.from_rows(out_rows, other.count_to)

    def subset(self, row_indices: np.ndarray) -> "CRConnectivity":
        """Rows restricted to ``row_indices`` (renumbered 0..k-1 on the from side)."""
        row_indices = np.asarray(row_indices, dtype=np.int64)
        counts = self.row_counts()[row_indices]
        out_ptr = np.zeros(len(row_indices) + 1, dtype=np.int64)
        np.cumsum(counts, out=out_ptr[1:])
        starts = self.row_ptr[row_indices]
        take = (
            np.arange(out_ptr[-1], dtype=np.int64)
            - np.repeat(out_ptr[:-1], counts)
            + np.repeat(starts, counts)
        )
        return CRConnectivity(out_ptr, self.col[take], self.count_to)

    def localize(self, row_indices: np.ndarray) -> tuple["CRConnectivity", np.ndarray]:
        """Subset rows AND renumber the target space to only referenced nodes.

        Returns (connectivity, global_target_indices) where
        ``global_target_indices[local]`` maps back to the original target ids.
        (reference: CRConnectivity::getLocalizedSubset, CRConnectivity.h:85-100)
        """
        sub = self.subset(row_indices)
        used = np.unique(sub.col)
        remap = -np.ones(self.count_to, dtype=np.int64)
        remap[used] = np.arange(len(used))
        return CRConnectivity(sub.row_ptr, remap[sub.col], len(used)), used

    # -- padded ELL export (device layout) ---------------------------------

    def to_ell(self, pad_value: int = -1, width: int | None = None):
        """Export as a dense (count_from, K) int array padded with pad_value.

        This is the device-side layout: fixed-width rows so XLA sees static
        shapes and the gather vectorizes on the VPU.
        """
        counts = self.row_counts()
        k = int(counts.max()) if width is None else int(width)
        if width is not None and counts.max() > width:
            raise MeshError(f"to_ell: width {width} < max row count {counts.max()}")
        out = np.full((self.count_from, k), pad_value, dtype=np.int64)
        # vectorized fill
        rows = np.repeat(np.arange(self.count_from), counts)
        slot = np.arange(self.nnz) - np.repeat(self.row_ptr[:-1], counts)
        out[rows, slot] = self.col
        return out, counts
