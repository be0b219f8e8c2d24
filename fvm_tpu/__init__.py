"""fvm_tpu: a TPU-native unstructured-mesh finite-volume multiphysics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the c-PRIMED/MEMOSA
``fvm`` solver (fluid / thermal / electric / structural / species / kinetic
transport on unstructured meshes).  See SURVEY.md at the repo root for the
reference's architecture and the mapping to this package.

Quick start::

    import fvm_tpu as fvm
    mesh = fvm.mesh.generate.quad_2d(32, 32)
    dmesh = fvm.mesh.build_device_mesh(mesh)
    thermal = fvm.models.ThermalModel(dmesh)
    thermal.bc['left'].bc_type = 'SpecifiedTemperature'
    thermal.bc['left']['specifiedTemperature'] = 400.0
    thermal.init()
    thermal.advance(10)
"""

from . import config as _config_module
from .config import (config, set_default_dtype, default_dtype,
                     enable_fpe_checks)
from .exceptions import FVMError, MeshError, SolverError, ConfigError

from . import mesh
from . import ops
from . import linear
from . import models

__version__ = "0.1.0"


def set_atype(name: str) -> None:
    """Reference-API compatibility (src/fvm/lib/__init__.py:9-18).

    'double' selects float64 state; 'float' float32.  Tangent-mode AD is not
    a dtype here — use ``jax.jvp`` over any model step (see
    fvm_tpu.models.base for sensitivity helpers).
    """
    if name in ("double", "tangent"):
        set_default_dtype("float64")
    elif name in ("float", "float32"):
        set_default_dtype("float32")
    else:
        raise ConfigError(f"unknown atype {name!r}")
