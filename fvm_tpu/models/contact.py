"""ContactModel: near-contact surface force closure.

TPU-native counterpart of the reference's ContactModel
(reference: ContactModel.h:17, ContactModel_impl.h:41
``computeSolidSurfaceForce`` — evaluates gap-dependent forces between a
deformable surface and a rigid counter-surface for MEMS pull-in; used by
scripts/Simulator.py).

Force law per boundary face (per unit area), as a function of the gap g to
the counter-surface: a contact-penalty repulsion active below ``g_contact``
plus an optional attractive (van der Waals-like) term:

    f(g) = k_c * max(0, g_c - g)^2 / g_c^2  -  A_h / (6 pi g^3)

directed along the face normal.  The reference's exact closure constants
live in driver scripts; both terms are configurable here.
"""

from __future__ import annotations

import numpy as np

from ..geom.search import KSearchTree
from ..core.options import BoundaryCondition


class ContactVC(BoundaryCondition):
    _defaults = {
        "contactStiffness": 1e6,  # k_c
        "contactGap": 1e-7,  # g_c
        "hamakerConstant": 0.0,  # A_h (attractive term off by default)
        "minimumGap": 1e-9,
    }


class ContactModel:
    name = "ContactModel"

    def __init__(self, dmesh, counter_surface_points: np.ndarray):
        """dmesh: DeviceMesh; counter_surface_points: (np, dim) rigid
        counter-surface sample points."""
        self.mesh = dmesh
        self.vc = ContactVC()
        self.tree = KSearchTree(np.asarray(counter_surface_points))

    def computeSolidSurfaceForce(self, group_name: str, node_displacement=None):
        """Per-face force vectors (count, dim) on a boundary group.

        (reference: ContactModel_impl.h:41)
        """
        mesh = self.mesh
        g = mesh.group_by_name(group_name)
        sl = mesh.group_faces(g)
        centers = np.asarray(mesh.face_centroid)[sl]
        if node_displacement is not None:
            centers = centers + np.asarray(node_displacement)
        dist, _ = self.tree.query_batch(centers, 1)
        mag = self.gap_force(dist)

        area = np.asarray(mesh.face_area)[sl]
        amag = np.asarray(mesh.face_area_mag)[sl]
        nhat = area / np.maximum(amag, 1e-300)[:, None]
        # repulsion pushes back along the inward normal
        return -mag[:, None] * nhat * amag[:, None]

    def gap_force(self, gaps) -> np.ndarray:
        """Per-sample contact force magnitude from the gap law (positive
        = repulsion).  The cell-level entry point for plate/membrane
        midsurface meshes where the gap to the counter-surface is known
        directly (the MEMS-switch driver couples it this way,
        reference: scripts/Simulator.py + ContactModel_impl.h:41)."""
        gap = np.maximum(
            np.asarray(gaps, dtype=float).reshape(-1),
            float(self.vc["minimumGap"]),
        )
        k_c = float(self.vc["contactStiffness"])
        g_c = float(self.vc["contactGap"])
        A_h = float(self.vc["hamakerConstant"])
        pen = np.where(gap < g_c, k_c * (g_c - gap) ** 2 / g_c**2, 0.0)
        vdw = -A_h / (6.0 * np.pi * gap**3)
        return pen + vdw
