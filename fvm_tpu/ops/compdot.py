"""Compensated (double-word float32) dot products and norms for TPU f64.

The axon TPU backend emulates float64, and its dot-product REDUCTIONS
carry only ~f32 accuracy (measured round 4: plain f64 BiCGStab
rho-breaks within a few iterations and the achievable relative residual
floors at ~1e-7, while CPU f64 reaches 1e-10).  The reference runs
linear tolerances of 1e-8..1e-10 (LinearSolver.h:22-23), so the Krylov
recurrences need trustworthy inner products.

This module rebuilds dot/norm from float32 primitives using error-free
transformations (TwoSum + Veltkamp-split TwoProd, Dekker 1971): every
f64 input is split into a (hi, lo) float32 pair, products are formed as
double-word values, and the reduction is a vectorized pairwise
double-word tree.  Each f32 add/mul is a single correctly-rounded VPU
op, so the result carries ~2x f32 precision (~48 mantissa bits,
relative error ~n * 2^-48 worst case, sqrt(n) * 2^-48 typical), enough
for 1e-10..1e-12 relative targets — and it avoids emulated-f64
arithmetic entirely in the loop, so it is not slower than the emulated
dot it replaces.

Caveats:
- The Veltkamp split multiplies by 2^12+1; inputs with |x| within ~2^12
  of the f32 overflow threshold would overflow.  Residual vectors in
  normalized solves are far from 3e38, so no guard is applied.
- Distributed: the per-shard double-word partial sums are combined in
  f64 before the psum (exact on CPU shards; on a real multi-chip TPU
  the few cross-shard adds reintroduce at most log2(n_shards) emulated
  adds of error).

Enable with FVM_TPU_COMPDOT=1 (or "auto", the default, which switches
on only when the runtime backend emulates f64 — i.e. TPU) — consumed by
the ELL/DIA/BlockELL dot/norm methods.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp

_SPLIT = 4097.0  # 2**12 + 1: Veltkamp split constant for float32


@lru_cache(maxsize=1)
def enabled() -> bool:
    """Whether compensated f64 reductions are active (env + backend)."""
    mode = os.environ.get("FVM_TPU_COMPDOT", "auto").lower()
    if mode in ("0", "off", "false"):
        return False
    if mode in ("1", "on", "true"):
        return True
    # auto: only where f64 is emulated (any TPU backend, incl. axon)
    try:
        return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
    except Exception:  # backend probing must never break tracing
        return False


def _opaque(x):
    """Hide a value from XLA's algebraic simplifier: under jit the
    whole EFT is one HLO graph and rewrites like (a+b)-a -> b erase the
    compensation terms (measured: jitted norm lost to 5e-10 rel while
    the eager path was exact)."""
    return jax.lax.optimization_barrier(x)


def _two_sum(a, b):
    """Error-free f32 addition: a + b = s + e exactly."""
    s = _opaque(a + b)
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a):
    """Veltkamp split: a = hi + lo with hi, lo carrying <=12 bits each."""
    c = _opaque(jnp.float32(_SPLIT) * a)
    hi = _opaque(c - (c - a))
    return hi, a - hi


def _two_prod(a, b):
    """Error-free f32 product: a * b = p + e exactly (Dekker)."""
    p = _opaque(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _dw_from_f64(x):
    """Split an (emulated-)f64 array into a float32 (hi, lo) pair."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def _dw_reduce(hi, lo):
    """Pairwise double-word tree sum of elementwise (hi, lo) values.

    Returns a float64 scalar.  Static log2(n) fold levels; zero padding
    keeps every fold exact."""
    hi = hi.ravel()
    lo = lo.ravel()
    n = hi.shape[0]
    # ALWAYS zero-pad to the next power of two STRICTLY above n: the
    # concatenate keeps XLA from fusing the elementwise product stage
    # into the first fold level (measured: without padding the pow2
    # sizes lose the compensation to ~1e-9 rel even with barriers; with
    # it every size is exact to f64 round-off).  Cost: <=2x transient
    # f32 buffers, negligible.
    m = 1 << n.bit_length()
    hi = jnp.concatenate([hi, jnp.zeros(m - n, hi.dtype)])
    lo = jnp.concatenate([lo, jnp.zeros(m - n, lo.dtype)])
    while m > 1:
        m //= 2
        # per-level barrier: without it XLA fuses/reassociates the add
        # chains ACROSS fold levels and the compensation terms vanish
        # (measured: n=1000 jitted dot off by 1e-6 abs; with per-level
        # barriers it is exact to f64 round-off)
        hi, lo = _opaque((hi, lo))
        s, e = _two_sum(hi[:m], hi[m:2 * m])
        hi = s
        lo = e + (lo[:m] + lo[m:2 * m])
    return hi[0].astype(jnp.float64) + lo[0].astype(jnp.float64)


def comp_dot_local(a, b):
    """Shard-local compensated <a, b> as an f64 scalar."""
    if a.dtype == jnp.float32:
        # native-f32 inputs: the TwoProd already captures the exact
        # per-element product, no double-word input split needed
        p, e = _two_prod(a, b)
    else:
        ah, al = _dw_from_f64(a)
        bh, bl = _dw_from_f64(b)
        p, e = _two_prod(ah, bh)
        # cross terms are O(eps32) relative; their rounding is O(eps32^2)
        e = e + (ah * bl + al * bh)
    # barrier between the product and reduction stages: fused end-to-end,
    # XLA's cross-stage rewrites reintroduce ~1e-6 absolute error
    # (measured n=1000 on CPU; each stage alone compiles exactly)
    p, e = _opaque((p, e))
    return _dw_reduce(p, e)


@lru_cache(maxsize=1)
def f32_enabled() -> bool:
    """FVM_TPU_COMPDOT_F32=1: also run FLOAT32 dot/norm through the
    compensated path (result still f64-accurate).  Experimental lever
    for the mixed-precision Newton inner, whose BiCGStab recurrence
    loses shadow orthogonality to f32 dot round-off (the round-3/4
    stall_restart rationale)."""
    return os.environ.get("FVM_TPU_COMPDOT_F32", "0") in ("1", "on", "true")


def use_for(x) -> bool:
    """Compensated path applies to f64 data when enabled(), and to f32
    data when additionally FVM_TPU_COMPDOT_F32 is set."""
    if x.dtype == jnp.float64:
        return enabled()
    if x.dtype == jnp.float32:
        return enabled() and f32_enabled()
    return False


def _dd_mul(ah, al, bh, bl):
    """(ah+al)*(bh+bl) as a double-word value (cross terms first-order)."""
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return p, e


def _dd_add(ah, ae, bh, be):
    s, e = _two_sum(ah, bh)
    return s, e + (ae + be)


@lru_cache(maxsize=1)
def mv_enabled() -> bool:
    """FVM_TPU_COMPMV: double-word f32 SpMV for f64 DIA applies.
    "auto" (default) = on wherever f64 is emulated — the emulated-f64
    matvec arithmetic floors Krylov residuals at ~5e-8 (measured round
    5 on cav_tetra with trustworthy compdot norms); the double-word
    path carries ~2^-48 per-element error instead."""
    mode = os.environ.get("FVM_TPU_COMPMV", "auto").lower()
    if mode in ("0", "off", "false"):
        return False
    if mode in ("1", "on", "true"):
        return True
    return enabled()


def comp_dia_apply(offsets, diag, coef, x, b=None, mode="mv"):
    """Double-word f32 DIA apply for f64 inputs: y = A x ("mv") or
    b - A x ("residual"), accumulated in error-free f32 pairs.  Exact
    rolls; per-slot barriers stop XLA from re-fusing the compensation
    away (see _dw_reduce)."""
    two_d = x.ndim == 2

    def dw(v, bcast):
        h, l = _dw_from_f64(v)
        if two_d and bcast:
            h, l = h[:, None], l[:, None]
        return h, l

    xh, xl = dw(x, False)
    dh, dl = dw(diag, True)
    acc_h, acc_e = _dd_mul(dh, dl, xh, xl)
    for i, d in enumerate(offsets):
        ch, cl = dw(coef[i], True)
        rh = jnp.roll(xh, -d, axis=0)
        rl = jnp.roll(xl, -d, axis=0)
        ph, pe = _dd_mul(ch, cl, rh, rl)
        acc_h, acc_e = _opaque(_dd_add(acc_h, acc_e, ph, pe))
    if mode == "residual":
        bh, bl = dw(b, False)
        acc_h, acc_e = _opaque(_dd_add(bh, bl, -acc_h, -acc_e))
    y = acc_h.astype(jnp.float64) + acc_e.astype(jnp.float64)
    return y


def comp_ell_rows(diag, off, cols, x):
    """Double-word f32 ELL row sums for f64 inputs:
    y[n, m] = diag[n] x[n, m] + sum_k off[k, n] x[cols[k, n], m],
    accumulated in error-free f32 pairs (gathers are exact; per-slot
    barriers stop XLA re-fusion — see _dw_reduce)."""
    xh, xl = _dw_from_f64(x)
    dh, dl = _dw_from_f64(diag)
    acc_h, acc_e = _dd_mul(dh[:, None], dl[:, None], xh, xl)
    K = off.shape[0]
    for k in range(K):
        oh, ol = _dw_from_f64(off[k])
        gh = xh[cols[k]]
        gl = xl[cols[k]]
        ph, pe = _dd_mul(oh[:, None], ol[:, None], gh, gl)
        acc_h, acc_e = _opaque(_dd_add(acc_h, acc_e, ph, pe))
    return acc_h.astype(jnp.float64) + acc_e.astype(jnp.float64)


@lru_cache(maxsize=1)
def vec_enabled() -> bool:
    """FVM_TPU_COMPVEC: double-word evaluation of the f64 Krylov
    recurrence's vector updates (x/r/p/s linear combinations).  "auto"
    (default) = on wherever f64 is emulated: with compensated dots AND
    matvecs the on-chip floor only moved 5.3e-8 -> 4.2e-8, implicating
    the emulated-f64 elementwise updates."""
    mode = os.environ.get("FVM_TPU_COMPVEC", "auto").lower()
    if mode in ("0", "off", "false"):
        return False
    if mode in ("1", "on", "true"):
        return True
    return enabled()


def lincomb(*terms):
    """sum_i c_i * v_i over (scalar, vector) pairs, evaluated in
    double-word f32 and rounded once to f64.  Scalars may be traced f64
    scalars; pass c_i = 1.0 for plain adds."""
    acc_h = acc_e = None
    for c, v in terms:
        vh, vl = _dw_from_f64(v)
        if isinstance(c, (int, float)) and c == 1.0:
            ph, pe = vh, vl
        else:
            c = jnp.asarray(c, jnp.float64)
            ch, cl = _dw_from_f64(c)
            ph, pe = _dd_mul(
                jnp.broadcast_to(ch, vh.shape), jnp.broadcast_to(cl, vh.shape),
                vh, vl,
            )
        if acc_h is None:
            acc_h, acc_e = ph, pe
        else:
            acc_h, acc_e = _opaque(_dd_add(acc_h, acc_e, ph, pe))
    return acc_h.astype(jnp.float64) + acc_e.astype(jnp.float64)


def use_vec(x) -> bool:
    return x.dtype == jnp.float64 and vec_enabled()


def dot(a, b, psum=None):
    s = comp_dot_local(a, b)
    if psum is not None:
        s = psum(s)
    # keep the caller's dtype: an f64 scalar leaking into an f32 graph
    # promotes every downstream vector op to (emulated) f64.  Rounding
    # the CORRECT sum to f32 still beats a noisy f32 tree sum.
    return s.astype(a.dtype)


def norm(x, psum=None):
    s = comp_dot_local(x, x)
    if psum is not None:
        s = psum(s)
    return jnp.sqrt(s).astype(x.dtype)
