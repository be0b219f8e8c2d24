"""Fluent case/mesh (.cas/.msh) reader — ASCII and binary scheme sections.

TPU-native counterpart of the reference's FluentReader
(reference: src/fvm/src/modules/importers/FluentReader.h:74, inheriting
SchemeReader.h:13; readMesh at :85).  Parses the sectioned format into a
host ``Mesh``:

  (2 ND)                           dimension
  (10 (zone first last type ND)(   node coordinates (zone 0: declaration)
  (12 (zone first last type et))   cell declaration
  (13 (zone first last bctype et)( face->nodes + c0 c1, hex, 1-based
  (39/45 (zone type name ...))     zone names
  (2010/3010, 2012/3012, 2013/3013) binary variants (f32/f64 reals,
                                   i32 ints), terminated by
                                   "End of Binary Section"

Face orientation from the file is ignored: geometry metrics re-orient all
face areas owner->neighbor, so only adjacency matters here.
"""

from __future__ import annotations

import numpy as np

from ..exceptions import MeshError
from ..mesh.connectivity import CRConnectivity
from ..mesh.mesh import Mesh

# Fluent boundary-condition zone type codes (FluentReader parses the same)
BC_TYPE_NAMES = {
    2: "interior",
    3: "wall",
    4: "pressure-inlet",
    5: "pressure-outlet",
    7: "symmetry",
    8: "periodic-shadow",
    9: "pressure-far-field",
    10: "velocity-inlet",
    12: "periodic",
    14: "fan",
    20: "port",
    24: "outflow",
    31: "interface",
    36: "outflow",
}

_WS = b" \t\r\n"


def _match_group(data: bytes, start: int) -> int:
    """data[start] == '('; return index just past the matching ')'."""
    depth = 0
    i = start
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c == b'"':
            i += 1
            while i < n and data[i : i + 1] != b'"':
                i += 1
        elif c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise MeshError("unbalanced parentheses in Fluent file")


class _Scanner:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def sections(self):
        data, n = self.data, len(self.data)
        while True:
            while self.pos < n and data[self.pos : self.pos + 1] != b"(":
                self.pos += 1
            if self.pos >= n:
                return
            sec_start = self.pos
            j = self.pos + 1
            while j < n and data[j : j + 1] not in b" (\t\r\n)":
                j += 1
            try:
                idx = int(data[self.pos + 1 : j])
            except ValueError:
                self.pos += 1
                continue
            k = j
            while k < n and data[k : k + 1] in _WS:
                k += 1
            if data[k : k + 1] != b"(":
                # inline payload up to section close: (2 3) etc.
                end = _match_group(data, sec_start)
                inline = data[j : end - 1].decode("ascii", "replace")
                self.pos = end
                yield idx, None, None, inline
                continue
            hend = _match_group(data, k)
            header = data[k + 1 : hend - 1].decode("ascii", "replace")
            k = hend
            while k < n and data[k : k + 1] in _WS:
                k += 1
            if data[k : k + 1] != b"(":
                # header-only section
                end = _match_group(data, sec_start)
                self.pos = end
                yield idx, header, None, None
                continue
            if idx >= 2000:
                # binary body: handler consumes via take_binary/finish_binary
                self.pos = k + 1
                yield idx, header, ("binary", k + 1), None
            else:
                bend = _match_group(data, k)
                body = data[k + 1 : bend - 1].decode("ascii", "replace")
                self.pos = _match_group(data, sec_start)
                yield idx, header, body, None

    def take_binary(self, offset: int, count: int, dtype) -> np.ndarray:
        arr = np.frombuffer(self.data, dtype=dtype, count=count, offset=offset)
        self.pos = offset + count * arr.dtype.itemsize
        self.skip_terminator()
        return arr

    def binary_ints(self, offset: int) -> np.ndarray:
        return np.frombuffer(
            self.data,
            dtype="<i4",
            count=(len(self.data) - offset) // 4,
            offset=offset,
        )

    def finish_binary(self, offset: int, n_ints_consumed: int):
        self.pos = offset + 4 * n_ints_consumed
        self.skip_terminator()

    def skip_terminator(self):
        marker = b"End of Binary Section"
        i = self.data.find(marker, self.pos)
        if i >= 0:
            j = self.data.find(b")", i)
            self.pos = (j + 1) if j >= 0 else i + len(marker)


def read_fluent_mesh(path: str) -> Mesh:
    """Read a Fluent .cas/.msh (ASCII or binary sections) into a host Mesh."""
    with open(path, "rb") as f:
        data = f.read()

    dim = None
    coords_parts: dict[int, np.ndarray] = {}
    face_rows: list = []
    face_cells: list = []
    face_zone: list = []
    zone_names: dict[int, tuple[str, str]] = {}
    zone_bctype: dict[int, int] = {}
    cell_zone_decl: dict[int, tuple[int, int]] = {}  # zone -> (first, last), 1-based
    n_nodes_decl = 0

    sc = _Scanner(data)
    for idx, header, body, inline in sc.sections():
        base = idx % 1000 if idx >= 2000 else idx
        is_binary = idx >= 2000
        real_dtype = "<f8" if idx >= 3000 else "<f4"

        if idx == 2 and (inline or header):
            txt = inline if inline is not None else header
            toks = txt.split()
            if toks:
                dim = int(toks[0])
        elif base == 10 and header is not None:
            toks = header.split()
            zone = int(toks[0], 16)
            first, last = int(toks[1], 16), int(toks[2], 16)
            if zone == 0:
                n_nodes_decl = max(n_nodes_decl, last)
                if is_binary and body:
                    sc.skip_terminator()
                continue
            nd = int(toks[4], 16) if len(toks) > 4 else (dim or 3)
            count = (last - first + 1) * nd
            if is_binary:
                vals = sc.take_binary(body[1], count, real_dtype).astype(np.float64)
            else:
                vals = np.fromiter(
                    (float(t) for t in body.split()), dtype=np.float64
                )
            coords_parts[first] = vals.reshape(last - first + 1, nd)
        elif base == 12 and header is not None:
            toks = header.split()
            zone = int(toks[0], 16)
            if zone != 0:
                # cell zone declaration (reference: FluentReader.cpp:182
                # FluentCellZone — one Mesh is created per cell zone)
                first, last = int(toks[1], 16), int(toks[2], 16)
                cell_zone_decl[zone] = (first, last)
                if is_binary and body:
                    et = int(toks[4], 16) if len(toks) > 4 else 1
                    if et == 0:
                        sc.take_binary(body[1], last - first + 1, "<i4")
                    else:
                        sc.skip_terminator()
        elif base == 13 and header is not None:
            toks = header.split()
            zone = int(toks[0], 16)
            if zone == 0:
                if is_binary and body:
                    sc.skip_terminator()
                continue
            first, last = int(toks[1], 16), int(toks[2], 16)
            bctype = int(toks[3], 16)
            etype = int(toks[4], 16) if len(toks) > 4 else 0
            zone_bctype[zone] = bctype
            nfaces = last - first + 1
            if is_binary:
                ints = sc.binary_ints(body[1])
                pos = 0
                if etype in (2, 3, 4):
                    nn = etype
                    rec = np.asarray(ints[: nfaces * (nn + 2)]).reshape(
                        nfaces, nn + 2
                    )
                    face_rows.extend((rec[:, :nn] - 1).tolist())
                    face_cells.extend((rec[:, nn:] - 1).tolist())
                    face_zone.extend([zone] * nfaces)
                    pos = nfaces * (nn + 2)
                else:  # mixed element type: leading node count per face
                    for _ in range(nfaces):
                        nn = int(ints[pos])
                        pos += 1
                        face_rows.append([int(x) - 1 for x in ints[pos : pos + nn]])
                        pos += nn
                        face_cells.append(
                            (int(ints[pos]) - 1, int(ints[pos + 1]) - 1)
                        )
                        pos += 2
                        face_zone.append(zone)
                sc.finish_binary(body[1], pos)
            else:
                vals = [int(t, 16) for t in body.split()]
                pos = 0
                for _ in range(nfaces):
                    if etype in (2, 3, 4):
                        nn = etype
                    else:
                        nn = vals[pos]
                        pos += 1
                    face_rows.append([x - 1 for x in vals[pos : pos + nn]])
                    pos += nn
                    face_cells.append((vals[pos] - 1, vals[pos + 1] - 1))
                    pos += 2
                    face_zone.append(zone)
        elif base in (39, 45) and header is not None:
            toks = header.split()
            try:
                zone = int(toks[0])
            except ValueError:
                continue
            ztype = toks[1] if len(toks) > 1 else ""
            name = toks[2] if len(toks) > 2 else f"zone{zone}"
            zone_names[zone] = (ztype, name)
        elif is_binary and body is not None:
            sc.skip_terminator()

    if dim is None:
        raise MeshError(f"{path}: no dimension section found")
    if not face_rows:
        raise MeshError(f"{path}: no face sections found")
    if not coords_parts:
        raise MeshError(f"{path}: no node coordinates found")

    coords = np.zeros((n_nodes_decl, dim))
    for first, block in coords_parts.items():
        coords[first - 1 : first - 1 + len(block)] = block[:, :dim]

    face_nodes = CRConnectivity.from_rows(face_rows, n_nodes_decl)
    fc = np.asarray(face_cells, dtype=np.int64)
    face_zone = np.asarray(face_zone)

    groups = []
    for zone in sorted(set(face_zone.tolist())):
        bctype = zone_bctype.get(zone, 3)
        ztype, name = zone_names.get(
            zone, (BC_TYPE_NAMES.get(bctype, "wall"), f"zone{zone}")
        )
        gtype = ztype if ztype == "interior" else BC_TYPE_NAMES.get(bctype, "wall")
        groups.append((zone, name, gtype, np.nonzero(face_zone == zone)[0]))

    mesh = Mesh(dim, coords, face_nodes, fc, groups)

    # attach cell zones (material regions).  Fluent numbers cells 1..N in
    # declaration order and the Mesh constructor never renumbers cells, so
    # zone extents map directly onto interior-cell ids.
    for zone in sorted(cell_zone_decl):
        first, last = cell_zone_decl[zone]
        ztype, name = zone_names.get(zone, ("fluid", f"zone{zone}"))
        mesh.cell_zones.append(
            (zone, name, ztype, np.arange(first - 1, last, dtype=np.int64))
        )
    return mesh


def read_fluent_meshes(path: str) -> list[Mesh]:
    """Read a Fluent case into ONE Mesh per cell zone (material region).

    Counterpart of the reference's ``FluentReader::getMeshList``
    (reference: src/fvm/src/modules/importers/FluentReader.h:89,
    FluentReader.cpp:705 — one Mesh per FluentCellZone, with the faces
    between two zones exposed on each side as an ``interface:<partner>``
    boundary group).  Single-zone cases return ``[read_fluent_mesh(path)]``.

    Multi-material workflows can ALSO stay on the fused mesh: keep the
    single ``read_fluent_mesh`` result, take per-material masks from
    ``Mesh.cell_zone_mask`` and pass ``Mesh.interface_faces_between`` to
    ``make_interface`` for double-shell coupling (the TPU-native route —
    one state array, no inter-mesh sync).
    """
    from ..mesh.assemble import extract_region

    fused = read_fluent_mesh(path)
    if len(fused.cell_zones) <= 1:
        return [fused]

    meshes = []
    for ident, name, ztype, cells in fused.cell_zones:
        mask = np.zeros(fused.n_interior_cells, dtype=bool)
        mask[cells] = True
        # name the cut after the dominant partner zone across the cut faces
        cut = fused.interface_faces_between(mask, ~mask)
        partner = "other"
        if len(cut):
            o, n = fused.face_cells[cut, 0], fused.face_cells[cut, 1]
            outside = np.where(mask[o], n, o)
            for pid, pname, _, pcells in fused.cell_zones:
                if pid != ident and np.isin(outside, pcells).any():
                    partner = pname
                    break
        m = extract_region(fused, mask, cut_name=f"interface:{partner}")
        m.mesh_id = int(ident)
        m.zone_name = name
        m.zone_type = ztype
        m.cell_zones = [(ident, name, ztype, np.arange(len(cells), dtype=np.int64))]
        meshes.append(m)
    return meshes
