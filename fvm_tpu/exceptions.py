"""Error types.

The reference propagates C++ ``CException`` to Python as ``RuntimeError``
(reference: src/fvm/src/modules/fvmbase/CException.h, baseExt.i:48-58).  Here
everything is Python already; we keep a distinct exception family so drivers
can catch solver/mesh errors specifically.
"""


class FVMError(RuntimeError):
    """Base error for fvm_tpu."""


class MeshError(FVMError):
    """Malformed or inconsistent mesh input."""


class SolverError(FVMError):
    """Linear or nonlinear solver failure (divergence, NaN residuals)."""


class ConfigError(FVMError):
    """Invalid model option / BC / VC configuration."""
