"""Interpolation of experimental grid data onto mesh faces.

Counterpart of the reference's Grid component
(reference: Grid.h:25 ``computeInterpolatedVelocity`` :54 — interpolates
measured velocity fields, given on a rectilinear grid, onto mesh faces to
drive simulations from experimental data).
"""

from __future__ import annotations

import numpy as np
from scipy.interpolate import RegularGridInterpolator


class Grid:
    def __init__(self, axes, values):
        """axes: tuple of 1-D coordinate arrays; values: field sampled on
        the tensor grid, shape (*map(len, axes), n_components)."""
        self._interp = RegularGridInterpolator(
            tuple(np.asarray(a) for a in axes),
            np.asarray(values),
            bounds_error=False,
            fill_value=None,
        )

    def computeInterpolatedVelocity(self, points) -> np.ndarray:
        """Interpolate the stored field at arbitrary points (n, dim)."""
        return np.asarray(self._interp(np.asarray(points)))

    def interpolate_to_faces(self, dmesh, group_name=None) -> np.ndarray:
        centers = np.asarray(dmesh.face_centroid)
        if group_name is not None:
            g = dmesh.group_by_name(group_name)
            centers = centers[dmesh.group_faces(g)]
        return self.computeInterpolatedVelocity(centers)
