"""Correctness of the Pallas DIA kernels (interpret mode on CPU).

The kernels are TPU-gated at runtime (ops/pallas_kernels.use_pallas);
here they run under pltpu.force_tpu_interpret_mode so the fused
mv/residual/jacobi modes are checked against the XLA roll formulation
on every CI run, including the double-buffered halo DMA pipeline.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from fvm_tpu.ops import pallas_kernels as pk
from fvm_tpu.ops.dia import fused_apply


def _case(n, offsets, nrhs, seed=0):
    rng = np.random.default_rng(seed)
    D = len(offsets)
    coef = rng.normal(size=(D, n)).astype(np.float32)
    # zero the coefficients whose shifted element is out of range, as
    # analyze_offsets guarantees for real matrices
    idx = np.arange(n)
    for j, d in enumerate(offsets):
        coef[j, (idx + d < 0) | (idx + d >= n)] = 0.0
    diag = (rng.normal(size=n).astype(np.float32) + 4.0)
    shape = (n,) if nrhs == 0 else (n, nrhs)
    x = rng.normal(size=shape).astype(np.float32)
    b = rng.normal(size=shape).astype(np.float32)
    return jnp.asarray(coef), jnp.asarray(diag), jnp.asarray(x), jnp.asarray(b)


@pytest.mark.parametrize("mode", ["mv", "residual", "jacobi"])
@pytest.mark.parametrize("nrhs", [0, 2])
def test_dia_kernel_matches_xla(mode, nrhs):
    n = 5000  # not a multiple of 128: exercises the pad/slice path
    offsets = (-70, -1, 1, 70)
    coef, diag, x, b = _case(n, offsets, nrhs)
    ref = fused_apply(offsets, diag, coef, x,
                      b=None if mode == "mv" else b,
                      omega=0.8 if mode == "jacobi" else None, mode=mode)
    with pltpu.force_tpu_interpret_mode():
        got = pk.dia_apply(offsets, mode, coef, diag, x,
                           b=None if mode == "mv" else b,
                           omega=0.8 if mode == "jacobi" else None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dia_kernel_multiblock_halo():
    # several grid blocks with offsets crossing block boundaries, plus a
    # prepacked layout (the in-solver path)
    n = 3 * 512 * 128 + 777
    offsets = (-640, -128, -1, 1, 128, 640)
    coef, diag, x, b = _case(n, offsets, 0, seed=1)
    ref = fused_apply(offsets, diag, coef, x, b=b, omega=0.7, mode="jacobi")
    with pltpu.force_tpu_interpret_mode():
        packed = pk.pack(offsets, coef, diag)
        got = pk.dia_apply(offsets, "jacobi", coef, diag, x, b=b,
                           omega=0.7, pk=packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not pk.tpu_available(), reason="needs a real TPU")
@pytest.mark.parametrize("mode", ["mv", "residual", "jacobi"])
def test_dia_kernel_real_tpu_equivalence(mode):
    """Real-TPU (non-interpret) numerical equivalence of the Mosaic
    kernel vs the XLA roll path at a production size (512^2), the check
    behind the docs/PALLAS_AB.md default decision."""
    import os
    import jax

    edge = 512
    n = edge * edge
    offsets = (-edge, -1, 1, edge)
    rng = np.random.default_rng(3)
    coef = -rng.random((len(offsets), n)).astype(np.float32)
    idx = np.arange(n)
    for j, d in enumerate(offsets):
        coef[j, (idx + d < 0) | (idx + d >= n)] = 0.0
    diag = (4.0 + rng.random(n)).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    kw = {} if mode == "mv" else {"b": jnp.asarray(b)}
    if mode == "jacobi":
        kw["omega"] = 0.8
    os.environ["FVM_TPU_PALLAS"] = "0"
    yx = jax.jit(
        lambda x_: fused_apply(offsets, jnp.asarray(diag),
                               jnp.asarray(coef), x_, mode=mode, **kw)
    )(jnp.asarray(x))
    os.environ["FVM_TPU_PALLAS"] = "1"
    try:
        pkd = pk.pack(offsets, jnp.asarray(coef), jnp.asarray(diag))
        yp = jax.jit(
            lambda x_: fused_apply(offsets, jnp.asarray(diag),
                                   jnp.asarray(coef), x_, mode=mode,
                                   pk=pkd, **kw)
        )(jnp.asarray(x))
    finally:
        os.environ.pop("FVM_TPU_PALLAS", None)
    scale = float(jnp.max(jnp.abs(yx)))
    np.testing.assert_allclose(
        np.asarray(yp), np.asarray(yx), atol=3e-7 * scale
    )
