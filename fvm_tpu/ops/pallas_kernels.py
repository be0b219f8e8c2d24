"""Pallas TPU kernels for the DIA solver hot path.

The DIA SpMV ``y = diag*x + sum_d coef_d * shift(x, d)`` is
HBM-bandwidth-bound; the XLA roll formulation re-reads ``x`` once per
offset (D+1 read passes of the vector plus the coefficient streams) and
measured ~220 GB/s effective at 1M cells.  The kernel here reads each
operand from HBM exactly once per call:

  * the per-offset coefficients, the diagonal, ``b`` and the output are
    streamed block-by-block through the pallas pipeline (auto
    double-buffered against compute);
  * ``x`` needs a halo of ``H`` lane-rows around each block (offsets
    reach up to max|d| elements away), which BlockSpec cannot express,
    so it stays in HBM and is DMA'd manually with an explicitly
    double-buffered pipeline: the copy for block i+1 is issued before
    the compute for block i starts (the v1 kernel's serial
    start();wait() stalled on every block and sustained only
    ~170 GB/s);
  * the shifts become static row slices + lane rolls inside VMEM, and
    the surrounding vector algebra (residual, damped-Jacobi update) is
    fused into the same pass.

The per-offset coefficients and the diagonal are constant across the
10-30 kernel calls of a solve, so their padded 2D layouts are
precomputed once per matrix (``pack``) and carried on the matrix pytree;
only the vectors are padded per call (one fused pad each).

Three fused modes over the same kernel body:
  mv:       y = A x          (no b stream at all)
  residual: y = b - A x
  jacobi:   y = x + omega * (b - A x) / diag

Counterpart of the reference's hand-tuned CSR loops
(reference: src/fvm/src/modules/fvmbase/CRMatrix.h:200 multiply,
:303-353 Jacobi/GS sweeps), redesigned for the TPU vector unit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def tpu_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def use_pallas(n: int) -> bool:
    """Whether to route fused DIA ops through the Pallas kernels.

    Default OFF: three A/B runs on the real chip (docs/PALLAS_AB.md,
    2026-08-20) measured the double-buffered kernel WITHIN NOISE of the
    XLA roll formulation — per-config speedups 0.70-1.29x straddling
    1.0 across 256^2/512^2/1024^2 x mv/residual/jacobi, with ±25%
    server-side variance between repeated runs — so the simpler XLA
    path stays the default.  Set FVM_TPU_PALLAS=1 to route f32 DIA ops
    of >= 256k cells through the kernel (numerically equivalent to
    <= 2.5e-7 relative, same artifact)."""
    import os

    if os.environ.get("FVM_TPU_PALLAS", "") == "1":
        return tpu_available() and n >= 65536 * 4
    return False


def _plan(n: int, offsets, rb: int = 512):
    """Static block plan: (R rows, Rpad, halo rows H, n blocks, rb).

    H and rb are kept multiples of 8 so every DMA'd VMEM buffer
    (rb + 2H rows) is f32 sublane-tile aligned — unaligned row counts
    fault the DMA engine."""
    R = -(-n // LANES)  # rows of 128 lanes covering n
    maxd = max(abs(int(d)) for d in offsets) if offsets else 0
    H = max(8, ((-(-maxd // LANES)) + 7) // 8 * 8)
    rb = min(rb, max(8, (R + 7) // 8 * 8))
    nblk = -(-R // rb)
    Rpad = nblk * rb
    return R, Rpad, H, nblk, rb


def pack(offsets, coef, diag):
    """Pad (D, n) coefficients and (n,) diagonal into kernel 2D layouts.

    Done once per assembled matrix (inside the solve jit, hoisted out of
    the iteration loop); kernels then read these without per-call copies.
    Padding diag with 1.0 keeps the fused Jacobi division safe."""
    D, n = coef.shape
    _, Rpad, H, _, _ = _plan(n, offsets)
    grow = Rpad * LANES - n
    coef_p = jnp.pad(coef, ((0, 0), (0, grow))).reshape(D, Rpad, LANES)
    diag_p = jnp.pad(diag, (0, grow), constant_values=1.0).reshape(Rpad, LANES)
    return coef_p, diag_p


def _shift_rows(xt, d: int, H: int, rb: int):
    """rows [H..H+rb) of the flat-shifted halo tile.

    xt is (rb + 2H, 128) holding flat elements [(blk - H)*128, ...).
    Returns t with t[r, c] = xt_flat[(H + r)*128 + c + d] (zero-padded
    upstream, so out-of-range reads hit the zero halo of the padded
    array)."""
    q, s = divmod(int(d), LANES)
    if s == 0:
        return xt[H + q:H + q + rb, :]
    r0 = xt[H + q:H + q + rb, :]
    r1 = xt[H + q + 1:H + q + rb + 1, :]
    # pltpu.roll needs a non-negative shift; LANES - s == -s (mod LANES)
    sh = jnp.int32(LANES - s)
    a0 = pltpu.roll(r0, sh, axis=1)
    a1 = pltpu.roll(r1, sh, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    return jnp.where(col < LANES - s, a0, a1)


def _dia_kernel(offsets, H, rb, nblk, mode, nrhs, has_b, *refs):
    if has_b:
        x_hbm, coef_ref, diag_ref, b_ref, omega_ref, out_ref, xs, sem = refs
    else:
        x_hbm, coef_ref, diag_ref, omega_ref, out_ref, xs, sem = refs
        b_ref = None
    # all index arithmetic in explicit int32: mixed python-int/traced
    # promotion inside the Mosaic trace recurses under the global x64 flag
    one = jnp.int32(1)
    i = pl.program_id(0).astype(jnp.int32)
    W = rb + 2 * H

    def dma(idx, slot):
        # x_hbm rows are halo-padded: block idx's window starts at idx*rb
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(idx * jnp.int32(rb), W), :],
            xs.at[slot], sem.at[slot],
        )

    slot_i = jax.lax.bitwise_and(i, one)
    nxt = i + one
    slot_n = jax.lax.bitwise_and(nxt, one)

    @pl.when(i == 0)
    def _():
        dma(jnp.int32(0), jnp.int32(0)).start()

    @pl.when(nxt < jnp.int32(nblk))
    def _():
        dma(nxt, slot_n).start()

    dma(i, slot_i).wait()
    for m in range(nrhs):
        xt = xs[slot_i, m]
        xc = xt[H:H + rb, :]
        ax = diag_ref[:] * xc
        for j, d in enumerate(offsets):
            ax += coef_ref[j] * _shift_rows(xt, d, H, rb)
        if mode == "mv":
            out = ax
        elif mode == "residual":
            out = b_ref[m] - ax
        else:  # jacobi
            out = xc + omega_ref[0, 0] * (b_ref[m] - ax) / diag_ref[:]
        out_ref[m] = out


@functools.partial(jax.jit, static_argnames=("offsets", "mode", "n"))
def _dia_apply_packed(offsets, mode, n, coef_p, diag_p, x, b, omega):
    """x, b: (m, n); coef_p: (D, Rpad, L); diag_p: (Rpad, L)."""
    nrhs = x.shape[0]
    R, Rpad, H, nblk, rb = _plan(n, offsets)
    grow = Rpad * LANES - n
    # single fused pad: halo rows below + (pad-to-Rpad + halo rows) above
    xh = jnp.pad(x, ((0, 0), (H * LANES, grow + H * LANES))).reshape(
        nrhs, Rpad + 2 * H, LANES
    )
    has_b = mode != "mv"
    om = jnp.full((1, 1), omega if omega is not None else 0.0, x.dtype)

    kernel = functools.partial(
        _dia_kernel, tuple(offsets), H, rb, nblk, mode, nrhs, has_b
    )
    # NB: index-map constants must be i32 (the global x64 flag would make
    # bare python 0 trace as i64 and Mosaic rejects the mixed tuple)
    zero = np.int32(0)
    D = coef_p.shape[0]
    in_specs = [
        pl.BlockSpec(
            xh.shape, lambda i: (zero, zero, zero),
            memory_space=pl.ANY,  # x (+halo) stays in HBM
        ),
        pl.BlockSpec(
            (D, rb, LANES), lambda i: (zero, i, zero),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((rb, LANES), lambda i: (i, zero),
                     memory_space=pltpu.VMEM),
    ]
    args = [xh, coef_p, diag_p]
    if has_b:
        b2 = jnp.pad(b, ((0, 0), (0, grow))).reshape(nrhs, Rpad, LANES)
        in_specs.append(
            pl.BlockSpec(
                (nrhs, rb, LANES), lambda i: (zero, i, zero),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(b2)
    in_specs.append(
        pl.BlockSpec((1, 1), lambda i: (zero, zero), memory_space=pltpu.SMEM)
    )
    args.append(om)
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (nrhs, rb, LANES), lambda i: (zero, i, zero),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nrhs, Rpad, LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nrhs, rb + 2 * H, LANES), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(*args)
    return out.reshape(nrhs, Rpad * LANES)[:, :n]


def dia_apply(offsets, mode, coef, diag, x, b=None, omega=None, pk=None):
    """Fused DIA op on (n,) or (n, m) vectors; returns same shape as x.

    offsets: tuple of python ints (static); coef: (D, n) precomputed
    per-offset coefficients; mode in {"mv", "residual", "jacobi"};
    pk: optional (coef_p, diag_p) from pack() to skip per-call padding.
    """
    squeeze = x.ndim == 1
    xm = x[None] if squeeze else x.T  # (m, n)
    bm = None if b is None else (b[None] if squeeze else b.T)
    n = x.shape[0]
    if pk is None:
        pk = pack(offsets, coef, diag)
    y = _dia_apply_packed(tuple(int(d) for d in offsets), mode, n,
                          pk[0], pk[1], xm, bm, omega)
    return y[0] if squeeze else y.T
