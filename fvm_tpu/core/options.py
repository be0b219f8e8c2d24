"""Option / BC / VC dictionaries.

Counterpart of the reference's ``FloatVarDict`` family
(reference: src/fvm/src/modules/fvmbase/FloatVarDict.h:21-153): every model
exposes per-boundary BC dicts, per-mesh VC dicts and a model-options dict
where each scalar entry can instead be a per-face/cell array (the reference's
``FloatVal`` holds constant-or-Field).  ``resolve`` plays the role of
``FloatValEvaluator`` — broadcasting a constant or validating an array to the
requested size.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..exceptions import ConfigError


class FloatVarDict(dict):
    """dict with attribute access and constant-or-array values."""

    _defaults: dict = {}

    def __init__(self, **overrides):
        super().__init__()
        # merge _defaults across the MRO (base first, derived overrides)
        # so shared options (e.g. ModelOptions.outerChunk) reach every
        # model's option dict without each subclass redeclaring them
        for klass in reversed(type(self).__mro__):
            for k, v in vars(klass).get("_defaults", {}).items():
                self[k] = v
        self.update(overrides)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        elif isinstance(getattr(type(self), name, None), property):
            # route through property setters (e.g. bc_type)
            object.__setattr__(self, name, value)
        else:
            self[name] = value

    # reference API parity (FloatVarDict.i getVar/setVar)
    def getVar(self, name):
        return self[name]

    def setVar(self, name, value):
        if name not in self and name not in type(self)._defaults:
            raise ConfigError(
                f"{type(self).__name__}: unknown option {name!r}; "
                f"known: {sorted(self.keys())}"
            )
        self[name] = value

    def resolve(self, name, size, dtype=None):
        """Return entry as an array of shape (size,) (or (size, d) if the
        stored value is per-component).  Floats default to the configured
        dtype so f64 python literals never leak into an f32 graph."""
        from ..config import config

        v = self[name]
        if callable(v):
            raise ConfigError(f"{name}: callables not supported; pass arrays")
        if dtype is None and not hasattr(v, "dtype"):
            if isinstance(v, bool):
                dtype = None
            elif isinstance(v, (int, float)) or (
                isinstance(v, (list, tuple, np.ndarray))
            ):
                dtype = config.dtype
        elif dtype is None and hasattr(v, "dtype") and v.dtype.kind == "f":
            dtype = config.dtype
        arr = jnp.asarray(v, dtype=dtype)
        if arr.ndim == 0:
            return jnp.full((size,), arr, dtype=arr.dtype)
        if arr.shape[0] < size:
            # device meshes append ghost/padding cells beyond the host
            # mesh's interior count; zero-pad user arrays up to size
            pad = [(0, size - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
            arr = jnp.pad(arr, pad)
        elif arr.shape[0] != size:
            raise ConfigError(
                f"{name}: array of shape {arr.shape} does not match size {size}"
            )
        return arr


class BoundaryCondition(FloatVarDict):
    """Per-face-group BC: a type tag + value entries.

    (reference: e.g. ThermalBC<T> in ThermalBC.h with bcType + vars)
    """

    _allowed_types: tuple = ()

    def __init__(self, bc_type=None, **overrides):
        super().__init__(**overrides)
        object.__setattr__(self, "_bc_type", bc_type)

    @property
    def bc_type(self):
        return self._bc_type

    @bc_type.setter
    def bc_type(self, value):
        if self._allowed_types and value not in self._allowed_types:
            raise ConfigError(
                f"{type(self).__name__}: unknown bc_type {value!r}; "
                f"allowed: {self._allowed_types}"
            )
        object.__setattr__(self, "_bc_type", value)

    # reference drivers write bc.bcType = "..."
    @property
    def bcType(self):
        return self._bc_type

    @bcType.setter
    def bcType(self, value):
        self.bc_type = value


class ModelOptions(FloatVarDict):
    """Model options (tolerances, transient switches, solvers...)."""

    _defaults = {
        # outer iterations per device dispatch: >1 runs the outer
        # (linearize/solve/update) loop in a device-resident
        # lax.while_loop with the convergence check on device, paying
        # ONE host round-trip per chunk instead of per outer iteration
        # (the reference's advance loop, e.g. ThermalModel_impl.h:424,
        # has no per-iteration host sync either).  0/1 = classic
        # per-iteration python loop.
        "outerChunk": 0,
        # raise SolverError on a NaN/Inf outer residual (opt-in FPE trap,
        # reference role: baseExt.i:25-30 SIGFPE -> CException; see also
        # fvm_tpu.enable_fpe_checks for the per-primitive jax debug mode)
        "trapNonfinite": False,
    }
