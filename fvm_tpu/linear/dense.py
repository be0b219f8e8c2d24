"""Small dense direct solves, implemented from scratch on lax primitives.

Replaces the reference's UMFPACK-backed DirectSolver
(reference: DirectSolver.cpp:6-83) for AMG coarse levels and unit tests.
We do NOT use jnp.linalg.solve because XLA's LuDecomposition has no f64
lowering on TPU; Gaussian elimination with partial pivoting written on
fori_loop works for every dtype/backend and is trivially fast at coarse
sizes (n <= ~1024).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gauss_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b by Gaussian elimination with partial pivoting.

    A: (n, n); b: (n,) or (n, m).  Returns x with b's shape.
    """
    n = A.shape[0]
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    m = b.shape[1]
    Ab = jnp.concatenate([A, b], axis=1)  # (n, n+m)
    rows = jnp.arange(n)

    def elim(k, Ab):
        col = jnp.abs(Ab[:, k])
        col = jnp.where(rows >= k, col, -jnp.inf)
        p = jnp.argmax(col)
        rk = Ab[k]
        rp = Ab[p]
        Ab = Ab.at[k].set(rp).at[p].set(rk)
        pivot = Ab[k, k]
        safe = jnp.where(jnp.abs(pivot) > 0, pivot, 1.0)
        factors = jnp.where(rows > k, Ab[:, k] / safe, 0.0)
        return Ab - factors[:, None] * Ab[k][None, :]

    Ab = jax.lax.fori_loop(0, n, elim, Ab)

    def back(i, x):
        k = n - 1 - i
        # entries of x below k are already solved; row k of U hits only j >= k
        rhs = Ab[k, n:] - Ab[k, :n] @ x
        pivot = Ab[k, k]
        safe = jnp.where(jnp.abs(pivot) > 0, pivot, 1.0)
        return x.at[k].set(rhs / safe)

    x = jax.lax.fori_loop(0, n, back, jnp.zeros((n, m), Ab.dtype))
    return x[:, 0] if squeeze else x


def batched_small_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (..., B, B) @ x = (..., B) for small static B, batched.

    Unrolled Gauss-Jordan without pivoting (callers pass well-conditioned
    near-identity systems, e.g. the 5x5 Woodbury capacitance matrices of
    the COMET collision coupling).  Works on every backend/dtype — no XLA
    LU involved."""
    B = A.shape[-1]
    Ab = jnp.concatenate([A, b[..., None]], axis=-1)  # (..., B, B+1)
    for k in range(B):
        piv = Ab[..., k, :] / Ab[..., k, k:k + 1]
        fac = Ab[..., :, k:k + 1]  # (..., B, 1)
        Ab = Ab - fac * piv[..., None, :]
        Ab = Ab.at[..., k, :].set(piv)
    return Ab[..., B]


def dense_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Matrix inverse that works on every backend/dtype combination.

    XLA's LU lowering on TPU is f32-only, so f64-on-TPU falls back to
    Gauss-Jordan elimination (gauss_solve against the identity).  Used by
    AMG to factor the coarsest level once per solve so every cycle's coarse
    solve is a single (MXU) matmul instead of a sequential elimination.
    """
    n = A.shape[0]
    if A.dtype == jnp.float64 and jax.default_backend() == "tpu":
        return gauss_solve(A, jnp.eye(n, dtype=A.dtype))
    return jnp.linalg.inv(A)
