"""Global configuration for fvm_tpu.

The reference selects its scalar type ("atype") at import time via
``fvm.set_atype('double'|'tangent')`` (reference: src/fvm/lib/__init__.py:9-18).
On TPU the equivalent choices are the floating dtype used for device state
(float32 is the fast path on TPU; float64 is available — software-emulated on
TPU, native on CPU — for golden-accuracy runs) and forward-mode AD, which we
get for free from ``jax.jvp`` instead of a compile-time Tangent type.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Double precision must be enabled before any jax arrays are created.  We do
# it unconditionally: with x64 enabled, explicitly-dtyped float32 arrays stay
# float32 (weak-type promotion keeps python scalars from upcasting them), so
# the TPU fast path is unaffected.
jax.config.update("jax_enable_x64", True)

# Full-precision matmuls: the TPU MXU defaults to bf16 inputs for f32
# dots, which silently costs ~16 mantissa bits in the AMG coarse apply /
# dense solves / moment reductions — measured to DIVERGE the f32 coupled
# flow+thermal bench at 256^2 (AMG V-cycles amplify once the coarse
# correction carries ~1e-3 relative error).  The framework's hot path is
# roll/elementwise DIA SpMV, not matmuls, so HIGHEST costs nothing
# measurable while restoring solver robustness.
jax.config.update("jax_default_matmul_precision", "highest")

_DTYPES = {
    "float32": jnp.float32,
    "float64": jnp.float64,
    "f32": jnp.float32,
    "f64": jnp.float64,
}


class Config:
    """Process-wide numeric configuration.

    Attributes
    ----------
    dtype:
        Default floating dtype for device-side mesh/field state.
    index_dtype:
        Integer dtype for connectivity / gather indices (int32 is the TPU
        fast path and addresses >2B entries per shard is out of scope).
    """

    def __init__(self) -> None:
        env = os.environ.get("FVM_TPU_DTYPE", "")
        if env:
            self.dtype = _DTYPES[env]
        else:
            # Correctness-first default; benchmarks opt into float32.
            self.dtype = jnp.float64
        self.index_dtype = jnp.int32

    def set_dtype(self, dtype) -> None:
        if isinstance(dtype, str):
            dtype = _DTYPES[dtype]
        self.dtype = jnp.dtype(dtype).type


config = Config()


def set_default_dtype(dtype) -> None:
    """Set the default floating dtype for subsequently created device state."""
    config.set_dtype(dtype)


def default_dtype():
    return config.dtype


def index_dtype():
    return config.index_dtype


def enable_fpe_checks(enable: bool = True) -> None:
    """Convert floating-point faults (NaN/Inf production) into exceptions.

    Counterpart of the reference's SWIG-layer FPE signal handler that
    raises CException on floating-point exceptions
    (reference: src/fvm/src/modules/fvmbase/baseExt.i:25-30).  On the
    XLA side the equivalent is jax's NaN/Inf debugging mode: every jitted
    computation is re-run un-jitted when a NaN appears and the producing
    primitive raises FloatingPointError.  Costly - debugging only.
    """
    import jax as _jax

    _jax.config.update("jax_debug_nans", bool(enable))
    _jax.config.update("jax_debug_infs", bool(enable))
