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


@lru_cache(maxsize=1)
def dot_width() -> int:
    """FVM_TPU_COMPDOT_WIDTH: limbs in the compensated dot.  3 (default)
    = triple-word: inputs split EXACTLY (3x24 > 53 bits) and the
    pairwise tree accumulates in three f32 limbs (~2^-72-grade), which
    BEATS native f64 under Krylov-grade cancellation; 2 = the round-5
    double-word path (~2^-48 * kappa — measured to floor BiCGStab at
    1.5e-8 on the cav_tetra solve, worse than CPU-native f64)."""
    return int(os.environ.get("FVM_TPU_COMPDOT_WIDTH", "3"))


def _tw_from_f64(x):
    """EXACT 3-limb f32 split of an f64 array (24*3 = 72 > 53 bits)."""
    h1 = x.astype(jnp.float32)
    r1 = x - h1.astype(x.dtype)
    h2 = r1.astype(jnp.float32)
    r2 = r1 - h2.astype(x.dtype)
    return h1, h2, r2.astype(jnp.float32)


def _tw_fold(a1, a2, a3, b1, b2, b3):
    """Add two 3-limb values; rounding confined to the third limb."""
    s1, e1 = _two_sum(a1, b1)
    s2, e2 = _two_sum(a2, b2)
    t2, e3 = _two_sum(s2, e1)
    return s1, t2, a3 + b3 + (e2 + e3)


def _tw_reduce(l1, l2, l3):
    """Pairwise 3-limb tree sum -> f64 scalar (same barrier/padding
    rationale as _dw_reduce)."""
    l1, l2, l3 = l1.ravel(), l2.ravel(), l3.ravel()
    n = l1.shape[0]
    m = 1 << n.bit_length()
    z = jnp.zeros(m - n, l1.dtype)
    l1 = jnp.concatenate([l1, z])
    l2 = jnp.concatenate([l2, z])
    l3 = jnp.concatenate([l3, z])
    while m > 1:
        m //= 2
        l1, l2, l3 = _opaque((l1, l2, l3))
        l1, l2, l3 = _tw_fold(
            l1[:m], l2[:m], l3[:m], l1[m:2 * m], l2[m:2 * m], l3[m:2 * m]
        )
    return (
        l1[0].astype(jnp.float64)
        + l2[0].astype(jnp.float64)
        + l3[0].astype(jnp.float64)
    )


def _tw_dot_local(a, b):
    """<a, b> via exact 3-limb splits and 3-limb accumulation."""
    a1, a2, a3 = _tw_from_f64(a)
    b1, b2, b3 = _tw_from_f64(b)
    # leading product, exact
    p, e = _two_prod(a1, b1)
    # second-order cross products, errors tracked into limb 3
    c2a, f2a = _two_prod(a1, b2)
    c2b, f2b = _two_prod(a2, b1)
    l2, g1 = _two_sum(e, c2a)
    l2, g2 = _two_sum(l2, c2b)
    # third-order terms: plain f32 products/adds round at ~2^-72 of a*b
    l3 = (f2a + f2b) + (g1 + g2) + (a1 * b3 + a2 * b2 + a3 * b1)
    p, l2, l3 = _opaque((p, l2, l3))
    return _tw_reduce(p, l2, l3)


def _pow2_scale(v):
    """Exact power-of-two scale bringing max|v| into [1, 2): returns
    (v * 2^k, -k).  Multiplying an f64 by a power of two is EXACT, so
    this changes no information — it protects the f32 limbs from
    exponent-range underflow (measured: electrostatics residuals at
    rel 1e-8 have |r| ~ 1e-22; their squared products sit at 1e-44,
    BELOW the f32 subnormal floor, and the unscaled compensated dot
    returns 0 — the actual mechanism behind the 'compensated dots
    floor at 1e-8' finding, not accumulator width)."""
    m = jnp.max(jnp.abs(v))
    k = jnp.where(
        m > 0, jnp.floor(jnp.log2(m)), 0.0
    ).astype(jnp.int32)
    scale = jnp.exp2((-k).astype(v.dtype))
    return v * scale, k


def comp_dot_local(a, b):
    """Shard-local compensated <a, b> as an f64 scalar."""
    if a.dtype == jnp.float64:
        a, ka = _pow2_scale(a)
        b, kb = _pow2_scale(b)
        if dot_width() >= 3:
            s = _tw_dot_local(a, b)
        else:
            s = _dw_dot_local(a, b)
        return s * jnp.exp2((ka + kb).astype(s.dtype))
    # native-f32 inputs: the TwoProd already captures the exact
    # per-element product, no double-word input split needed; the same
    # exponent-range scaling guards deep-residual underflow
    a, ka = _pow2_scale(a)
    b, kb = _pow2_scale(b)
    p, e = _two_prod(a, b)
    # barrier between the product and reduction stages: fused end-to-end,
    # XLA's cross-stage rewrites reintroduce ~1e-6 absolute error
    # (measured n=1000 on CPU; each stage alone compiles exactly)
    p, e = _opaque((p, e))
    s = _dw_reduce(p, e)
    return s * jnp.exp2((ka + kb).astype(s.dtype))


def _dw_dot_local(a, b):
    """Double-word (48-bit) variant, pre-scaled f64 inputs."""
    ah, al = _dw_from_f64(a)
    bh, bl = _dw_from_f64(b)
    p, e = _two_prod(ah, bh)
    # cross terms are O(eps32) relative; their rounding is O(eps32^2)
    e = e + (ah * bl + al * bh)
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


def _tw_mul(a1, a2, a3, b1, b2, b3):
    """Elementwise product of two 3-limb values -> 3-limb (rounding
    confined to the third limb, ~2^-72 of the leading product).  Same
    algebra as _tw_dot_local's per-element stage."""
    p, e = _two_prod(a1, b1)
    c2a, f2a = _two_prod(a1, b2)
    c2b, f2b = _two_prod(a2, b1)
    l2, g1 = _two_sum(e, c2a)
    l2, g2 = _two_sum(l2, c2b)
    l3 = (f2a + f2b) + (g1 + g2) + (a1 * b3 + a2 * b2 + a3 * b1)
    return p, l2, l3


@lru_cache(maxsize=1)
def mv_width() -> int:
    """FVM_TPU_COMPMV_WIDTH: limbs in the compensated SpMV.  3 (default)
    = exact 3-limb input split + 3-limb accumulation (~2^-72/element).
    Measured round-5 closeout: the double-word SpMV left the on-chip
    cav_tetra BiCGStab floor at 2.3e-8, which is 2^-48 * kappa_eff
    (kappa_eff ~ 6e6) — the matvec noise floor, not the dots.  Width 3
    moves that term to 2^-72 * kappa (~1e-15 grade), restoring the
    reference's 1e-10-class tolerances (LinearSolver.h:22-23) on the
    emulated-f64 backend.  2 = the round-5 double-word path."""
    return int(os.environ.get("FVM_TPU_COMPMV_WIDTH", "3"))


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
    x, kx = _pow2_scale(x)
    mA = jnp.max(jnp.abs(diag))
    for i in range(len(offsets)):
        mA = jnp.maximum(mA, jnp.max(jnp.abs(coef[i])))
    kA = jnp.where(
        mA > 0, jnp.floor(jnp.log2(mA)), 0.0
    ).astype(jnp.int32)
    sA = jnp.exp2((-kA).astype(diag.dtype))
    diag = diag * sA
    ktot = kA + kx

    if mv_width() >= 3:
        def tw(v, bcast):
            l1, l2, l3 = _tw_from_f64(v)
            if two_d and bcast:
                l1, l2, l3 = l1[:, None], l2[:, None], l3[:, None]
            return l1, l2, l3

        x1, x2, x3 = tw(x, False)
        d1, d2, d3 = tw(diag, True)
        a1, a2, a3 = _tw_mul(d1, d2, d3, x1, x2, x3)
        for i, d in enumerate(offsets):
            c1, c2, c3 = tw(coef[i] * sA, True)
            r1 = jnp.roll(x1, -d, axis=0)
            r2 = jnp.roll(x2, -d, axis=0)
            r3 = jnp.roll(x3, -d, axis=0)
            p1, p2, p3 = _tw_mul(c1, c2, c3, r1, r2, r3)
            a1, a2, a3 = _opaque(_tw_fold(a1, a2, a3, p1, p2, p3))
        if mode == "residual":
            bs = b * jnp.exp2((-ktot).astype(b.dtype))
            b1, b2, b3 = tw(bs, False)
            a1, a2, a3 = _opaque(
                _tw_fold(b1, b2, b3, -a1, -a2, -a3)
            )
        y = (
            a1.astype(jnp.float64)
            + a2.astype(jnp.float64)
            + a3.astype(jnp.float64)
        )
        return y * jnp.exp2(ktot.astype(y.dtype))

    def dw(v, bcast):
        h, l = _dw_from_f64(v)
        if two_d and bcast:
            h, l = h[:, None], l[:, None]
        return h, l

    xh, xl = dw(x, False)
    dh, dl = dw(diag, True)
    acc_h, acc_e = _dd_mul(dh, dl, xh, xl)
    for i, d in enumerate(offsets):
        ch, cl = dw(coef[i] * sA, True)
        rh = jnp.roll(xh, -d, axis=0)
        rl = jnp.roll(xl, -d, axis=0)
        ph, pe = _dd_mul(ch, cl, rh, rl)
        acc_h, acc_e = _opaque(_dd_add(acc_h, acc_e, ph, pe))
    if mode == "residual":
        # bring b onto the scaled axis (exact power-of-two multiply)
        bs = b * jnp.exp2((-ktot).astype(b.dtype))
        bh, bl = dw(bs, False)
        acc_h, acc_e = _opaque(_dd_add(bh, bl, -acc_h, -acc_e))
    y = acc_h.astype(jnp.float64) + acc_e.astype(jnp.float64)
    return y * jnp.exp2(ktot.astype(y.dtype))


def comp_ell_rows(diag, off, cols, x):
    """Double-word f32 ELL row sums for f64 inputs:
    y[n, m] = diag[n] x[n, m] + sum_k off[k, n] x[cols[k, n], m],
    accumulated in error-free f32 pairs (gathers are exact; per-slot
    barriers stop XLA re-fusion — see _dw_reduce).  Inputs are
    power-of-two pre-scaled so the f32 limbs stay in exponent range
    (see _pow2_scale — physical units like eps0-scaled matrices put
    raw products far below the f32 subnormal floor)."""
    x, kx = _pow2_scale(x)
    mA = jnp.maximum(jnp.max(jnp.abs(diag)), jnp.max(jnp.abs(off)))
    kA = jnp.where(
        mA > 0, jnp.floor(jnp.log2(mA)), 0.0
    ).astype(jnp.int32)
    sA = jnp.exp2((-kA).astype(diag.dtype))
    diag = diag * sA
    off = off * sA
    if mv_width() >= 3:
        x1, x2, x3 = _tw_from_f64(x)
        d1, d2, d3 = _tw_from_f64(diag)
        a1, a2, a3 = _tw_mul(
            d1[:, None], d2[:, None], d3[:, None], x1, x2, x3
        )
        for k in range(off.shape[0]):
            o1, o2, o3 = _tw_from_f64(off[k])
            g1 = x1[cols[k]]
            g2 = x2[cols[k]]
            g3 = x3[cols[k]]
            p1, p2, p3 = _tw_mul(
                o1[:, None], o2[:, None], o3[:, None], g1, g2, g3
            )
            a1, a2, a3 = _opaque(_tw_fold(a1, a2, a3, p1, p2, p3))
        y = (
            a1.astype(jnp.float64)
            + a2.astype(jnp.float64)
            + a3.astype(jnp.float64)
        )
        return y * jnp.exp2((kA + kx).astype(y.dtype))
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
    y = acc_h.astype(jnp.float64) + acc_e.astype(jnp.float64)
    return y * jnp.exp2((kA + kx).astype(y.dtype))


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
    scalars.  The coefficients are jointly power-of-two scaled so the
    f32 limb products stay in exponent range for deep-residual-scale
    vectors (see _pow2_scale)."""
    cs = [jnp.asarray(c, jnp.float64) for c, _ in terms]
    vs = [v for _, v in terms]
    m = None
    for c, v in zip(cs, vs):
        t = jnp.abs(c) * jnp.max(jnp.abs(v))
        m = t if m is None else jnp.maximum(m, t)
    K = jnp.where(m > 0, jnp.floor(jnp.log2(m)), 0.0).astype(jnp.int32)
    sK = jnp.exp2((-K).astype(jnp.float64))
    acc_h = acc_e = None
    for c, v in zip(cs, vs):
        vh, vl = _dw_from_f64(v)
        ch, cl = _dw_from_f64(c * sK)
        ph, pe = _dd_mul(
            jnp.broadcast_to(ch, vh.shape), jnp.broadcast_to(cl, vh.shape),
            vh, vl,
        )
        if acc_h is None:
            acc_h, acc_e = ph, pe
        else:
            acc_h, acc_e = _opaque(_dd_add(acc_h, acc_e, ph, pe))
    y = acc_h.astype(jnp.float64) + acc_e.astype(jnp.float64)
    return y * jnp.exp2(K.astype(y.dtype))


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
