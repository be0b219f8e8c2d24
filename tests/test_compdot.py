"""Compensated double-word f32 reductions (ops/compdot.py).

On CPU the f64 reference is exact, so these tests check the error-free
transformation algebra itself: the compensated dot must (a) match the
exact value far better than a pure-f32 reduction on ill-conditioned
inputs, and (b) agree with the plain f64 dot to f64 round-off on
ordinary inputs.  (The accuracy WIN only shows on emulated-f64
backends; the round-4 gotcha this addresses is the TPU f64 Krylov floor
at rel ~1e-7.)"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fvm_tpu.ops import compdot


def _exact_dot(a, b):
    return math.fsum([float(x) * float(y) for x, y in zip(a, b)])


def test_comp_dot_matches_exact_on_cancelling_input():
    rng = np.random.default_rng(7)
    n = 4096
    # ill-conditioned: large cancelling pairs + small signal
    big = rng.standard_normal(n // 2) * 1e8
    a = np.concatenate([big, -big]) + rng.standard_normal(n)
    b = np.ones(n)
    rng.shuffle(a)
    exact = _exact_dot(a, b)
    got = float(compdot.comp_dot_local(jnp.asarray(a), jnp.asarray(b)))
    # the double-word split keeps ~48 of the 53 input mantissa bits, so
    # the attainable absolute error scales with 2^-48 * sum|a_i b_i|
    # (the f32 reduction loses the answer entirely under cancellation)
    f32 = float(np.dot(a.astype(np.float32), b.astype(np.float32)))
    S = float(np.sum(np.abs(a * b)))
    assert abs(got - exact) <= 64.0 * 2.0**-48 * S
    assert abs(got - exact) < 1e-4 * abs(f32 - exact)


def test_comp_dot_matches_f64_on_ordinary_input():
    rng = np.random.default_rng(3)
    a = rng.standard_normal(1000)
    b = rng.standard_normal(1000)
    exact = _exact_dot(a, b)
    got = float(compdot.comp_dot_local(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - exact) <= 1e-12 * (abs(exact) + 1.0)


def test_comp_norm_under_jit_and_odd_sizes():
    for n in (1, 3, 7, 1000, 1024):
        x = np.linspace(-1.0, 2.0, n)
        f = jax.jit(lambda v: compdot.norm(v))
        got = float(f(jnp.asarray(x)))
        assert got == pytest.approx(float(np.linalg.norm(x)), rel=1e-13)


def test_comp_dot_survives_deep_residual_scales():
    """Regression for the round-5 'compensated dots floor at 1e-8'
    finding: vectors at |x| ~ 1e-22 (electrostatics residuals near rel
    1e-8) have squared products BELOW the f32 subnormal floor, and the
    unscaled compensated dot returned 0.  The exact power-of-two
    pre-scale (_pow2_scale) must keep the answer."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal(4096) * 1e-22
    exact = _exact_dot(x, x)
    got = float(compdot.comp_dot_local(jnp.asarray(x), jnp.asarray(x)))
    assert got == pytest.approx(exact, rel=1e-10)
    # and under jit through the public norm()
    n = float(jax.jit(compdot.norm)(jnp.asarray(x)))
    assert n == pytest.approx(math.sqrt(exact), rel=1e-10)
    # huge scales too (the scale is exact, so no precision loss)
    y = rng.standard_normal(1000) * 1e30
    assert float(
        compdot.comp_dot_local(jnp.asarray(y), jnp.asarray(y))
    ) == pytest.approx(_exact_dot(y, y), rel=1e-10)


def test_triple_word_beats_double_word_under_cancellation(monkeypatch):
    """The width-3 accumulator (default) carries ~72 bits vs width-2's
    ~48: on a dot with condition ~1e13 the triple-word error must sit at
    f64 round-off while double-word shows its 2^-48*kappa signature."""
    rng = np.random.default_rng(5)
    n = 2048
    big = rng.standard_normal(n // 2) * 1e10
    a = np.concatenate([big, -big]) + rng.standard_normal(n) * 1e-3
    b = np.ones(n)
    rng.shuffle(a)
    exact = _exact_dot(a, b)
    errs = {}
    for w in (2, 3):
        monkeypatch.setenv("FVM_TPU_COMPDOT_WIDTH", str(w))
        compdot.dot_width.cache_clear()
        got = float(compdot.comp_dot_local(jnp.asarray(a), jnp.asarray(b)))
        errs[w] = abs(got - exact)
    compdot.dot_width.cache_clear()
    S = float(np.sum(np.abs(a * b)))
    # tw spec: ~2^-72 * S under cancellation (measured ~9e-11 on this
    # input with S ~ 1.6e13; dw sits ~3 decades higher at 2^-48 * S)
    assert errs[3] <= 256.0 * 2.0**-72 * S
    assert errs[3] < 1e-2 * errs[2]  # and decisively better than dw
    assert errs[2] <= 64.0 * 2.0**-48 * S  # dw stays in its own spec


def test_lincomb_matches_f64_combination():
    """Compensated vector updates (FVM_TPU_COMPVEC path): lincomb must
    agree with the exact per-element combination, including at deep
    residual scales."""
    rng = np.random.default_rng(2)
    for scale in (1.0, 1e-20):
        x = jnp.asarray(rng.standard_normal(777) * scale)
        y = jnp.asarray(rng.standard_normal(777) * scale)
        z = jnp.asarray(rng.standard_normal(777) * scale)
        a, bb, c = 1.0, -0.37251, 2.25e-3
        got = np.asarray(
            jax.jit(compdot.lincomb)((a, x), (bb, y), (c, z))
        )
        ref = a * np.asarray(x) + bb * np.asarray(y) + c * np.asarray(z)
        m = np.abs(ref).max()
        # dw limbs carry ~48 bits: per-element error ~2^-48 * m (still
        # far below the emulated-f64 update error this path replaces)
        assert np.abs(got - ref).max() <= 32.0 * 2.0**-48 * m


def test_comp_mv_matches_plain_f64(monkeypatch):
    """Double-word SpMV (FVM_TPU_COMPMV=1): DIA and gather-ELL applies
    match the plain f64 path to f64 round-off on CPU."""
    import fvm_tpu as fvm
    from fvm_tpu.mesh.generate import quad_2d, tri_2d
    from fvm_tpu.linear.base import prepared, condensed

    rng = np.random.default_rng(0)

    def system(gen):
        dm = fvm.mesh.build_device_mesh(gen(12, 12))
        t = fvm.models.ThermalModel(dm)
        for g in ("left", "right"):
            t.bc[g].bc_type = "SpecifiedTemperature"
        t.bc["bottom"].bc_type = "Symmetry"
        t.bc["top"].bc_type = "Symmetry"
        t.options["verbose"] = False
        t.init()
        bcv = t._resolve_bcvals()
        A, r = t._linearize(t.mesh, t.params, t.state, bcv)
        return condensed(A, r)[:2]

    for gen in (quad_2d, tri_2d):  # DIA path and gather path
        A, b = system(gen)
        x = jnp.asarray(rng.standard_normal(b.shape[0]))
        for w in ("2", "3"):  # double-word and triple-word variants
            monkeypatch.setenv("FVM_TPU_COMPMV", "1")
            monkeypatch.setenv("FVM_TPU_COMPMV_WIDTH", w)
            compdot.mv_enabled.cache_clear()
            compdot.mv_width.cache_clear()
            try:
                yc = np.asarray(prepared(A).mv(x))
            finally:
                monkeypatch.setenv("FVM_TPU_COMPMV", "0")
                compdot.mv_enabled.cache_clear()
            yp = np.asarray(prepared(A).mv(x))
            compdot.mv_enabled.cache_clear()
            compdot.mv_width.cache_clear()
            assert np.abs(yc - yp).max() <= 1e-13 * np.abs(yp).max()


def test_pow2_equilibrate_preserves_solution_and_units(monkeypatch):
    """The emulated-f64 exponent-range guard (linear.base.
    pow2_equilibrate, active when compdot is enabled): solving an
    eps0-scale system (coefficients ~1e-11) with the guard on must give
    the same solution as the plain path, and the reported residual
    norms must stay in ORIGINAL units."""
    import fvm_tpu as fvm
    from fvm_tpu.mesh.generate import quad_2d
    from fvm_tpu.linear.base import condensed
    from fvm_tpu.linear.krylov import BiCGStab, JacobiSolver

    dm = fvm.mesh.build_device_mesh(quad_2d(12, 12))
    t = fvm.models.ThermalModel(dm)
    for g in ("left", "right"):
        t.bc[g].bc_type = "SpecifiedTemperature"
    t.bc["left"]["specifiedTemperature"] = 1.0
    t.bc["bottom"].bc_type = "Symmetry"
    t.bc["top"].bc_type = "Symmetry"
    t.options["verbose"] = False
    t.init()
    bcv = t._resolve_bcvals()
    A0, r0 = t._linearize(t.mesh, t.params, t.state, bcv)
    A, b, _ = condensed(A0, r0)
    # physical eps0-like scale (not a power of two, deliberately)
    A = A.scale_coeffs(jnp.asarray(8.854e-12, b.dtype))
    b = b * 8.854e-12
    solver = BiCGStab(
        preconditioner=JacobiSolver(sweeps=2),
        relative_tolerance=1e-11, max_iterations=500,
    )
    sols = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("FVM_TPU_COMPDOT", mode)
        compdot.enabled.cache_clear()
        x, st = solver.solve_fn(A, b, jnp.zeros_like(b))
        sols[mode] = (np.asarray(x), float(st.residual0), float(st.residual))
    compdot.enabled.cache_clear()
    x_off, r0_off, rn_off = sols["0"]
    x_on, r0_on, rn_on = sols["1"]
    m = np.abs(x_off).max()
    assert np.abs(x_on - x_off).max() <= 1e-9 * m
    # stats back in original (eps0-scaled) units
    assert r0_on == pytest.approx(r0_off, rel=1e-10)
    assert rn_on <= 1e-10 * r0_on


def test_matrices_use_compdot_when_forced(monkeypatch):
    """With FVM_TPU_COMPDOT=1 the ELL dot/norm run the compensated path
    and still agree with the plain path to f64 round-off on CPU."""
    monkeypatch.setenv("FVM_TPU_COMPDOT", "1")
    compdot.enabled.cache_clear()
    try:
        assert compdot.enabled()
        import fvm_tpu as fvm
        from fvm_tpu.mesh.generate import quad_2d

        m = quad_2d(12, 12)
        dm = fvm.mesh.build_device_mesh(m)
        t = fvm.models.ThermalModel(dm)
        t.bc["left"].bc_type = "SpecifiedTemperature"
        t.bc["left"]["specifiedTemperature"] = 400.0
        t.bc["right"].bc_type = "SpecifiedTemperature"
        t.bc["right"]["specifiedTemperature"] = 300.0
        t.bc["bottom"].bc_type = "Symmetry"
        t.bc["top"].bc_type = "Symmetry"
        t.options["verbose"] = False
        t.init()
        h = t.advance(3)
        T = np.asarray(t.getTemperature())
        xc = np.asarray(dm.cell_centroid[: T.shape[0], 0])
        exact = 400.0 + (300.0 - 400.0) * xc
        assert np.abs(T - exact).max() < 1e-8
    finally:
        compdot.enabled.cache_clear()
