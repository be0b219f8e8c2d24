"""Model base class.

Counterpart of the reference's ``Model`` (reference: Model.h:13-26) plus the
driver conventions shared by all models: per-boundary BC maps, a VC dict,
a ModelOptions dict, ``init()`` / ``advance(n)`` / ``updateTime()``, and
persistence hooks (getPersistenceData/restart).

TPU-native structure: all mutable state lives in ``self.state`` — a flat
dict of jnp arrays (a pytree).  ``advance`` runs a jit-compiled
linearize+solve step; the python loop around it only checks convergence.
Forward-mode sensitivities (the reference's Tangent atype) come for free:
``jax.jvp(lambda s: model.step_fn(s), ...)`` over the same step.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..core.options import BoundaryCondition, ModelOptions
from ..exceptions import ConfigError


class Model:
    name = "Model"

    def __init__(self, mesh: DeviceMesh):
        self.mesh = mesh
        self.state: dict = {}
        self.options = self._make_options()
        # bc map keyed by both group name and ident (reference drivers use
        # ids, bc[zone.ident]; our generators use names)
        self.bc: dict = {}
        for g in mesh.boundary_groups():
            bc = self._make_bc()
            self.bc[g[1]] = bc
            self.bc[g[0]] = bc
        self._initialized = False

    # --- subclass hooks ---------------------------------------------------

    def _make_options(self) -> ModelOptions:
        return ModelOptions()

    def _make_bc(self) -> BoundaryCondition:
        return BoundaryCondition()

    def init(self) -> None:
        raise NotImplementedError

    def advance(self, niter: int = 1):
        raise NotImplementedError

    # --- common helpers ---------------------------------------------------

    def _group_bcs(self):
        """Yield (group_tuple, bc) for each boundary group."""
        for g in self.mesh.boundary_groups():
            bc = self.bc[g[1]]
            if bc.bc_type is None:
                raise ConfigError(
                    f"{self.name}: boundary group {g[1]!r} has no bc_type set"
                )
            yield g, bc

    def updateTime(self):
        """Shift time levels (reference: <Model>_impl updateTime)."""
        raise NotImplementedError(f"{self.name} is not transient")

    # alias
    def update_time(self):
        self.updateTime()

    # --- persistence (reference: Model.h:23-26) ---------------------------

    def getPersistenceData(self) -> dict:
        return {k: np.asarray(v) for k, v in self.state.items()}

    def restart(self, data: dict) -> None:
        for k, v in data.items():
            if k in self.state:
                self.state[k] = jnp.asarray(v, self.state[k].dtype)


class ResidualHistory(list):
    """Convergence history; printable like the reference's per-iteration
    '<n>: <residual>' lines (ThermalModel_impl.h:443)."""

    def converged(self, tol: float) -> bool:
        return len(self) > 0 and self[-1][1] <= tol
