"""Checkpoint / resume.

Counterpart of the reference's HDF5 Persistence layer
(reference: src/fvm/scripts/Persistence.py:3-37 writeField/readField/
saveMeshes, plus Model::getPersistenceData/restart, Model.h:23-26).

Uses a single compressed .npz archive per checkpoint: every registered
model contributes its persistence dict (all time levels included), plus
mesh node coordinates for moving-mesh restarts.  (The reference uses
HDF5; .npz carries the same content without the h5py dependency.)
"""

from __future__ import annotations

import numpy as np


class Persistence:
    """Save/restore the state of a set of models.

    usage::
        p = Persistence("ckpt.npz", mode="w")
        p.save_model("flow", flow_model)
        p.save_mesh(mesh)
        p.close()

        p = Persistence("ckpt.npz", mode="r")
        p.restore_model("flow", flow_model)
    """

    def __init__(self, path: str, mode: str = "r"):
        self.path = path
        self.mode = mode
        self._data: dict[str, np.ndarray] = {}
        if mode == "r":
            with np.load(path, allow_pickle=False) as z:
                self._data = {k: z[k] for k in z.files}

    # -- writing -----------------------------------------------------------

    def save_model(self, name: str, model) -> None:
        for k, v in model.getPersistenceData().items():
            self._data[f"model/{name}/{k}"] = np.asarray(v)

    def save_array(self, key: str, arr) -> None:
        self._data[f"array/{key}"] = np.asarray(arr)

    def save_mesh(self, mesh) -> None:
        self._data["mesh/coords"] = np.asarray(mesh.coords)

    def close(self) -> None:
        if self.mode == "w":
            np.savez_compressed(self.path, **self._data)

    # -- reading -----------------------------------------------------------

    def restore_model(self, name: str, model) -> None:
        prefix = f"model/{name}/"
        data = {
            k[len(prefix) :]: v
            for k, v in self._data.items()
            if k.startswith(prefix)
        }
        model.restart(data)

    def load_array(self, key: str) -> np.ndarray:
        return self._data[f"array/{key}"]

    def keys(self):
        return list(self._data)
