"""Tecplot and Fluent-data exporters.

TPU-native counterparts of the reference's exporters:
* Tecplot ASCII dumps (reference: scripts/tecplotParallel.py and friends
  write FEQUADRILATERAL/FEBRICK zones with cell-centred variables);
* FluentDataExporter (reference: FluentDataExporter.h:14 — writes Fluent
  ``.dat`` scalar sections aligned with a previously read case).
"""

from __future__ import annotations

import numpy as np

from ..mesh.mesh import Mesh
from .vtk import _ordered_cell_nodes


def write_tecplot(path: str, mesh: Mesh, cell_fields: dict, title="fvm_tpu"):
    """Tecplot ASCII FE zone with cell-centred variables."""
    n_cells = mesh.n_interior_cells
    names = []
    arrays = []
    for name, arr in cell_fields.items():
        arr = np.asarray(arr)[:n_cells]
        if arr.ndim == 1:
            names.append(name)
            arrays.append(arr)
        else:
            for c in range(arr.shape[1]):
                names.append(f"{name}{'XYZ'[c]}")
                arrays.append(arr[:, c])
    coord_names = ["X", "Y", "Z"][: mesh.dim]
    zonetype = "FEQUADRILATERAL" if mesh.dim == 2 else "FEBRICK"
    nodes_per = 4 if mesh.dim == 2 else 8
    with open(path, "w") as f:
        f.write(f'TITLE = "{title}"\n')
        f.write(
            "VARIABLES = "
            + ", ".join(f'"{v}"' for v in coord_names + names)
            + "\n"
        )
        var_loc = ",".join(
            str(i) for i in range(mesh.dim + 1, mesh.dim + len(names) + 1)
        )
        f.write(
            f"ZONE T=\"mesh\", N={mesh.n_nodes}, E={n_cells}, "
            f"DATAPACKING=BLOCK, ZONETYPE={zonetype}"
        )
        if names:
            f.write(f", VARLOCATION=([{var_loc}]=CELLCENTERED)")
        f.write("\n")
        for c in range(mesh.dim):
            f.write("\n".join("%.10g" % v for v in mesh.coords[:, c]) + "\n")
        for arr in arrays:
            f.write("\n".join("%.10g" % v for v in arr) + "\n")
        for cidx in range(n_cells):
            nodes = _ordered_cell_nodes(mesh, cidx)
            if len(nodes) < nodes_per:  # degenerate (tri in quad zone)
                nodes = list(nodes) + [nodes[-1]] * (nodes_per - len(nodes))
            f.write(" ".join(str(n + 1) for n in nodes[:nodes_per]) + "\n")


def write_fluent_data(path: str, mesh: Mesh, cell_fields: dict):
    """Minimal Fluent .dat-style ASCII export: (300 ...) scalar sections.

    (reference: FluentDataExporter.h:14 writeScalarField — section id 300
    with zone/variable header followed by per-cell values)
    """
    n_cells = mesh.n_interior_cells
    with open(path, "w") as f:
        f.write('(0 "fvm_tpu data export")\n')
        f.write(f"(33 (1 {n_cells} 1))\n")
        for vid, (name, arr) in enumerate(cell_fields.items(), start=1):
            arr = np.asarray(arr)[:n_cells]
            if arr.ndim > 1:
                for c in range(arr.shape[1]):
                    _write_section(f, 300 + 0, vid * 10 + c, arr[:, c])
            else:
                _write_section(f, 300, vid, arr)


def _write_section(f, sec, subid, values):
    f.write(f"({sec} ({subid} 1 1 0 0 1 {len(values)})(\n")
    f.write("\n".join("%.10g" % v for v in values))
    f.write("\n))\n")
