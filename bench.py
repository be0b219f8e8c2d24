"""Benchmark: coupled flow+thermal SIMPLE iteration throughput (cells/sec/chip).

Workload (per BASELINE.md): lid-driven cavity FlowModel (SIMPLE + Rhie-Chow,
AMG-preconditioned pressure solve) coupled one-way to a ThermalModel that
convects with the flow's face mass flux — one "outer step" = one momentum
multi-RHS solve + one pressure-correction solve + one thermal solve.

The reference (btanasoi/fvm) publishes no numbers (BASELINE.md); baseline
here is a documented estimate of the MPI C++ reference on one modern CPU
core: ~2.5e5 cells/sec for an equivalent flow+thermal outer iteration
(typical for scalar unstructured C++ FVM codes of that era; the SIMPLE loop
is dominated by CRMatrix GS sweeps, CRMatrix.h:303).  vs_baseline is
measured/baseline, i.e. the per-chip speedup target of >=20x corresponds to
vs_baseline >= 20.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Env knobs: FVM_BENCH_N (cavity edge cells, default 1024 -> 1,048,576 cells),
FVM_BENCH_ITERS (timed outer steps, default 10), FVM_BENCH_DTYPE (float32),
FVM_BENCH_AMG_PREC (AMG cycle precision: "" = f32 default; "bf16" measured
~1.5% faster at 512^2 but ~16% slower at 1M — converts + extra outer
iterations outweigh the bandwidth saving; the DIA SpMV is roll-bound).
"""

import json
import os
import sys
import time


def main():
    # persistent XLA compilation cache: repeat runs skip the multi-minute
    # first-step remote compile (harmless if the backend ignores it)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_fvm")
    import jax

    if os.environ.get("FVM_BENCH_CPU"):
        # CPU smoke runs (the TPU plugin ignores JAX_PLATFORMS; this
        # config update, before any jax array work, does not)
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    n = int(os.environ.get("FVM_BENCH_N", "1024"))
    iters = int(os.environ.get("FVM_BENCH_ITERS", "10"))
    dtype = os.environ.get("FVM_BENCH_DTYPE", "float32")
    amg_prec = os.environ.get("FVM_BENCH_AMG_PREC", "") or None

    import fvm_tpu as fvm
    from fvm_tpu.models.flow import FlowModel
    from fvm_tpu.models import ThermalModel
    from fvm_tpu.linear import AMG, BiCGStab

    fvm.set_default_dtype(dtype)

    # host mesh + geometry are dtype-independent: cache across the
    # f32 -> f64 polish rebuild (the 1M host mesh + geometry cost
    # ~10-45 s wall depending on host load)
    host_cache = {}

    def build_flow(nn, solver_kw=None):
        t0 = time.time()
        if nn not in host_cache:
            m_ = fvm.mesh.generate.quad_2d(nn, nn)
            from fvm_tpu.mesh.metrics import compute_geometry

            host_cache[nn] = (m_, compute_geometry(m_))
        mesh, geom_ = host_cache[nn]
        dmesh = fvm.mesh.build_device_mesh(mesh, geom=geom_)
        print(
            f"# mesh: {nn}x{nn} = {mesh.n_interior_cells} cells "
            f"({time.time()-t0:.1f}s)",
            file=sys.stderr,
        )
        solver_kw = solver_kw or {}
        flow = FlowModel(dmesh)
        flow.options["verbose"] = False
        urf_env = os.environ.get("FVM_BENCH_URF", "")
        if urf_env:
            # e.g. "0.9,0.5" — contracts ~2.5x faster per outer at 128^2
            # (0.975 vs 0.990/outer) but DIVERGES at 1M (the SIMPLE
            # stability window narrows with refinement); the default stays
            # the reference-classic 0.7/0.3, which is stable at every size
            # tested
            uv, up = (float(x) for x in urf_env.split(","))
            flow.options["momentumURF"] = uv
            flow.options["pressureURF"] = up
        if os.environ.get("FVM_BENCH_ACCEL"):
            # "anderson": windowed Anderson mixing of the SIMPLE outer fixed
            # point (linear/anderson.py) — measured 7.5x fewer outer
            # iterations to 1e-6 on the 64^2 cavity; the convergence-mode
            # lever for BASELINE target #2.  FVM_BENCH_ACCEL_INT mixes every
            # K-th step (noise-robust at 1M); FVM_BENCH_PTOL tightens the
            # pressure solve for acceleration-quality steps.
            flow.options["acceleration"] = os.environ["FVM_BENCH_ACCEL"]
            if os.environ.get("FVM_BENCH_ACCEL_INT"):
                flow.options["andersonInterval"] = int(
                    os.environ["FVM_BENCH_ACCEL_INT"]
                )
            flow.options["andersonDelay"] = int(
                os.environ.get("FVM_BENCH_ACCEL_DELAY", "5")
            )
        for opt, val in solver_kw.get("options", {}).items():
            flow.options[opt] = val
        if os.environ.get("FVM_BENCH_ALGO"):
            # "SIMPLEC": consistent correction coefficient, pressureURF ~ 1.
            # Wins ~1.6x outer iterations at moderate Re (viscosity 0.05
            # cavity: 138 vs 225 to 1e-12); at this bench's Re=100 the
            # trajectories coincide (measured identical to 7 digits at 1M)
            flow.options["algorithm"] = os.environ["FVM_BENCH_ALGO"]
            flow.options["pressureURF"] = 1.0
        flow.vc["viscosity"] = 0.01
        for side in ("left", "right", "bottom", "top"):
            flow.bc[side].bc_type = "NoSlipWall"
        flow.bc["top"]["specifiedXVelocity"] = 1.0
        # AMG used directly as the pressure solver: each V-cycle contracts
        # the residual ~5-10x, so rtol 1e-3 needs ~3 cycles vs ~16 inside
        # BiCGStab
        ptol = solver_kw.get(
            "ptol", float(os.environ.get("FVM_BENCH_PTOL", "1e-3"))
        )
        pit = solver_kw.get(
            "pit", int(os.environ.get("FVM_BENCH_PIT", "6"))
        )
        flow.options["pressureLinearSolver"] = AMG(
            coarse_size=256, relative_tolerance=ptol, max_iterations=pit,
            precision=amg_prec,
        )
        flow.options["momentumLinearSolver"] = BiCGStab(
            relative_tolerance=solver_kw.get("mtol", 1e-2),
            max_iterations=solver_kw.get("mit", 10),
        )
        t0 = time.time()
        flow.init()
        print(
            f"# flow init (incl AMG setup): {time.time()-t0:.1f}s",
            file=sys.stderr,
        )
        return flow

    flow = build_flow(n)
    dmesh = flow.mesh
    n_cells = n * n

    fmg_time = 0.0
    if os.environ.get("FVM_BENCH_FMG"):
        # mesh sequencing (models/fmg.py): converge the cavity on coarser
        # levels first and prolong — skips the O(N) spin-up phase that
        # dominates time-to-residual at 1M (see PARITY.md).  Levels are
        # comma-separated edge sizes, e.g. FVM_BENCH_FMG=512.
        from fvm_tpu.models.fmg import prolong_flow_state

        fmg_tol = float(os.environ.get("FVM_BENCH_FMG_TOL", "1e-4"))
        fmg_max = int(os.environ.get("FVM_BENCH_FMG_MAX", "8000"))
        t_fmg = time.time()
        prev = None
        for ncoarse in (
            int(x) for x in os.environ["FVM_BENCH_FMG"].split(",")
        ):
            fc_ = build_flow(ncoarse)
            fc_.options["residualSync"] = False
            if prev is not None:
                prolong_flow_state(prev, fc_)
            r0 = None
            steps_c = 0
            while steps_c < fmg_max:
                h = fc_.advance(100)
                steps_c += 100
                rere = float(h[-1][1])
                if r0 is None:
                    r0 = float(h[0][1])
                if rere / r0 < fmg_tol:
                    break
            print(
                f"# fmg level {ncoarse}: {steps_c} outers, rel "
                f"{rere / r0:.2e} ({time.time()-t_fmg:.1f}s)",
                file=sys.stderr,
            )
            prev = fc_
        prolong_flow_state(prev, flow)
        fmg_time = time.time() - t_fmg
        print(f"# fmg total: {fmg_time:.1f}s", file=sys.stderr)

    def build_thermal(dmesh_):
        thermal = ThermalModel(dmesh_)
        thermal.options["verbose"] = False
        thermal.options["convective"] = True
        thermal.options["linearSolver"] = AMG(
            coarse_size=256, relative_tolerance=1e-3, max_iterations=6,
            precision=amg_prec,
        )
        thermal.bc["left"].bc_type = "SpecifiedTemperature"
        thermal.bc["left"]["specifiedTemperature"] = 400.0
        thermal.bc["right"].bc_type = "SpecifiedTemperature"
        thermal.bc["right"]["specifiedTemperature"] = 300.0
        thermal.bc["bottom"].bc_type = "Symmetry"
        thermal.bc["top"].bc_type = "Symmetry"
        t0 = time.time()
        thermal.init()
        print(f"# thermal init: {time.time()-t0:.1f}s", file=sys.stderr)
        return thermal

    thermal = build_thermal(dmesh)

    # residual norms stay on device during the timed loop (a float() sync
    # costs ~30 ms through the TPU tunnel, comparable to a whole step);
    # one explicit sync after the loop closes the timing.
    flow.options["residualSync"] = False
    thermal.options["residualSync"] = False

    def outer_step():
        hist_f = flow.advance(1)
        thermal.state["massFlux"] = flow.state["massFlux"]
        hist_t = thermal.advance(1)
        return hist_f, hist_t

    def sync(hists):
        vals = [float(v) for h in hists for v in h[-1][1:]]
        assert all(v == v for v in vals), "NaN residual"
        return vals

    # warmup / compile
    t0 = time.time()
    sync(outer_step())
    print(f"# first step (compile): {time.time()-t0:.1f}s", file=sys.stderr)
    sync(outer_step())

    # fused timed loop (round 5, FVM_BENCH_FUSE=0 restores the
    # per-step dispatch): all `iters` coupled outers run as ONE device
    # program (lax.scan over flow step -> massFlux handoff -> thermal
    # step), eliminating per-outer dispatch/queue overhead — the same
    # device-resident outer-loop capability models expose via
    # options["outerChunk"].
    # In CONVERGE mode the classic timed loop runs instead (norm0 — the
    # converge denominator — must come from the SAME 12-step prefix as
    # rounds 3/4; the fused loop's extra steps shrink it and silently
    # tighten the absolute target, measured +2000 f32 outers), and the
    # fused program is only compiled for the converge phase.
    fuse_on = os.environ.get("FVM_BENCH_FUSE", "1") != "0"
    conv_mode = bool(os.environ.get("FVM_BENCH_CONVERGE"))
    if fuse_on and not conv_mode:
        fstep, tstep = flow._step_raw, thermal._step_raw
        fbc = flow._resolve_bcvals()
        tbc = thermal._resolve_bcvals()

        def one(carry, _):
            fstate, tstate = carry
            fstate, faux = fstep(flow.mesh, flow.params, fstate, fbc)
            tstate = dict(tstate, massFlux=fstate["massFlux"])
            tstate, taux = tstep(
                thermal.mesh, thermal.params, tstate, tbc
            )
            return (fstate, tstate), (
                faux["mom_norm"], faux["cont_norm"], taux["rnorm"]
            )

        import jax as _jax

        @_jax.jit
        def run_iters(fstate, tstate):
            (fstate, tstate), res = _jax.lax.scan(
                one, (fstate, tstate), None, length=iters
            )
            return fstate, tstate, res

        t0 = time.time()
        fs, ts, res = run_iters(flow.state, thermal.state)
        _jax.block_until_ready(res)
        print(
            f"# fused-loop compile+run: {time.time()-t0:.1f}s",
            file=sys.stderr,
        )
        t0 = time.time()
        fs, ts, res = run_iters(fs, ts)
        _jax.block_until_ready(res)
        dt = time.time() - t0
        flow.state, thermal.state = fs, ts
        resids = [float(v[-1]) for v in res]
        assert all(v == v for v in resids), "NaN residual"
        print(f"# final residuals: {resids}", file=sys.stderr)
        cells_per_sec = n_cells * iters / dt
        fused_run = run_iters
    else:
        fused_run = None
        t0 = time.time()
        for _ in range(iters):
            hists = outer_step()
        resids = sync(hists)  # forces completion of the whole queue
        dt = time.time() - t0
        print(f"# final residuals: {resids}", file=sys.stderr)
        cells_per_sec = n_cells * iters / dt
        if fuse_on and conv_mode:
            # compile the fused converge-phase program AFTER norm0's
            # classic prefix; the one compile call advances 10 steps
            # (pre-t0, excluded — and it warms the converge phase)
            fstep, tstep = flow._step_raw, thermal._step_raw
            fbc = flow._resolve_bcvals()
            tbc = thermal._resolve_bcvals()

            def one(carry, _):
                fstate, tstate = carry
                fstate, faux = fstep(flow.mesh, flow.params, fstate, fbc)
                tstate = dict(tstate, massFlux=fstate["massFlux"])
                tstate, taux = tstep(
                    thermal.mesh, thermal.params, tstate, tbc
                )
                return (fstate, tstate), (
                    faux["mom_norm"], faux["cont_norm"], taux["rnorm"]
                )

            import jax as _jax

            @_jax.jit
            def run_iters(fstate, tstate):
                (fstate, tstate), res = _jax.lax.scan(
                    one, (fstate, tstate), None, length=iters
                )
                return fstate, tstate, res

            t0 = time.time()
            fs, ts, res = run_iters(flow.state, thermal.state)
            _jax.block_until_ready(res)
            flow.state, thermal.state = fs, ts
            print(
                f"# fused converge-phase compile: {time.time()-t0:.1f}s",
                file=sys.stderr,
            )
            fused_run = run_iters
    print(
        f"# {iters} coupled steps in {dt:.2f}s -> {cells_per_sec:.3e} cells/s",
        file=sys.stderr,
    )

    if os.environ.get("FVM_BENCH_CONVERGE"):
        # BASELINE.md target #2: wall time to 1e-6 relative momentum
        # residual on the 1M-cell coupled case.  Residuals stay on device;
        # sync every `check` steps (a float() through the tunnel costs a
        # step's worth of wall time).
        target_rel = float(os.environ.get("FVM_BENCH_CONVERGE_TOL", "1e-6"))
        check = 50
        max_steps = int(os.environ.get("FVM_BENCH_CONVERGE_MAX", "4000"))
        # FMG runs warm-start far below the cold initial residual; for a
        # comparable "relative to cold start" metric pass the cold run's
        # recorded norm0 via FVM_BENCH_NORM0
        norm0 = float(os.environ.get("FVM_BENCH_NORM0") or resids[0])
        # FVM_BENCH_POLISH=float64: when the f32 phase stalls at its
        # round-off floor (measured rel ~4e-5 at 1M; an f32 state cannot
        # satisfy the discrete equations more tightly), promote the state
        # onto a rebuilt f64 model pair (models/fmg.promote_state) and
        # finish the last decades in f64 (~20x slower per step on TPU,
        # but only ~1 decade remains).
        polish = os.environ.get("FVM_BENCH_POLISH", "")
        # engage the polish on a detected stall below this level.  At 1M
        # the f32 SIMPLE tail contraction is ~0.9998/outer and flattens
        # near rel ~2e-3 in practical step budgets (measured r3: 6000
        # steps -> 1.37e-3), so the old 1e-4 gate never fired; the
        # Newton endgame is quadratic from anywhere in the asymptotic
        # basin, so entering at the stall is both safe and optimal
        polish_at = float(os.environ.get("FVM_BENCH_POLISH_AT", "5e-3"))
        t0 = time.time()
        steps = 0
        rel = 1.0
        prev_rel = None
        # phase breakdown for the convergence artifact
        # (FVM_BENCH_CONVERGE_OUT)
        phases = {
            "fmg_s": fmg_time, "f32_steps": 0, "f32_s": 0.0,
            "polish_setup_s": 0.0, "newton": [],
        }
        while steps < max_steps:
            if fused_run is not None and check % iters == 0:
                # device-resident outer chunks (round 5): the f32 phase
                # is dispatch-bound and its wall time varies 4.5x with
                # tunnel/worker load (measured 59 s r4 vs 263 s r5 for
                # the SAME 1300 steps while the device-bound Newton
                # chunks ran at identical speed) — scanning `iters`
                # coupled outers per dispatch makes it device-bound too
                for _ in range(check // iters):
                    fs_c, ts_c, res_c = fused_run(
                        flow.state, thermal.state
                    )
                    flow.state, thermal.state = fs_c, ts_c
                steps += check
                rel = float(res_c[0][-1]) / norm0
            else:
                for _ in range(check):
                    hists = outer_step()
                steps += check
                rel = sync(hists)[0] / norm0
            print(
                f"# converge: step {steps} mom rel {rel:.3e}",
                file=sys.stderr,
            )
            if rel < target_rel:
                break
            # <10% improvement per 50 steps = contraction >0.998/outer,
            # hopeless for the remaining decades -> declare a floor
            stalled = prev_rel is not None and rel > 0.9 * prev_rel
            prev_rel = rel
            if polish and rel < polish_at and stalled:
                from fvm_tpu.models.fmg import (
                    promote_state, snapshot_state, restore_state,
                )

                print(
                    f"# polish: f32 floor at rel {rel:.3e} after {steps} "
                    f"steps; promoting to {polish}",
                    file=sys.stderr,
                )
                t_p = time.time()
                phases["f32_steps"] = steps
                phases["f32_s"] = t_p - t0
                phases["f32_floor_rel"] = rel
                fvm.set_default_dtype(polish)
                # default polish engine: JFNK Newton endgame
                # (flow.advanceNewton) — quadratic from the f32 floor,
                # 2-4 steps to 1e-6 and beyond, vs SIMPLE+Anderson's
                # ~0.9998/outer asymptotic crawl at 1M (measured: 2600
                # f64 Anderson steps only reached 2.3e-5).
                # FVM_BENCH_POLISH_NEWTON=0 restores the Anderson loop.
                use_newton = os.environ.get(
                    "FVM_BENCH_POLISH_NEWTON", "1"
                ) != "0"
                if use_newton:
                    # The Newton endgame MUST run in f64: the inner
                    # BiCGStab on the coupled Newton system is f32-
                    # precision-limited from 256^2 up (measured on CPU
                    # and TPU alike: inner rel stuck at 1.0 after
                    # hundreds of iterations at 256^2-512^2 f32, while
                    # f64 converges).  Inner Krylov runs CHUNKED
                    # (newtonChunkIterations): the axon worker kills
                    # long-running device programs — a 1500-iteration
                    # inner while_loop crashes it from 512^2 up.
                    # snapshot the f32 state to HOST and free the f32
                    # models BEFORE building the f64 pair: both model
                    # generations' device buffers coexisting crash the
                    # 16GB v5e worker at 1M (measured: TPU worker
                    # process crash during the f64 Newton handoff)
                    import gc

                    snap_flow = snapshot_state(flow)
                    snap_thermal = snapshot_state(thermal)
                    flow = thermal = None
                    gc.collect()
                    flow64 = build_flow(n)
                    # inexact-Newton forcing: from the f32 floor
                    # (rel ~4e-5 at 1M) to 1e-6 is <2 decades, so the
                    # inner Krylov only needs eta ~ 1e-3 per step
                    # (|r1| <= eta*|r0| + O(|r0|^2)); the 1e-5 default
                    # oversolves ~3x in inner iterations
                    flow64.options["newtonKrylovTolerance"] = float(
                        os.environ.get("FVM_BENCH_NEWTON_KTOL", "1e-3")
                    )
                    flow64.options["newtonKrylovIterations"] = int(
                        # measured at 512^2: ~800-1400 inner its/step to
                        # eta=1e-3 with the momentum-AMG preconditioner;
                        # give 1M headroom
                        os.environ.get("FVM_BENCH_NEWTON_KIT", "4000")
                    )
                    # mixed-precision inner solve (default float32): the
                    # Newton state/rhs/update stay f64 but the Jacobian
                    # matvecs + CoupledSIMPLE preconditioner run on
                    # f32-cast views — ~20x cheaper per inner iteration
                    # on TPU (f64 is emulated).  The rhs comes from the
                    # f64 "resid" program, so this avoids the all-f32
                    # stall (rhs = representation noise at the f32
                    # floor).  FVM_BENCH_NEWTON_PREC="" restores the
                    # all-f64 inner solve.
                    nprec = os.environ.get(
                        "FVM_BENCH_NEWTON_PREC", "float32"
                    )
                    if nprec:
                        flow64.options["newtonInnerPrecision"] = nprec
                    # inner Krylov method (round 5): GMRES(32) was tried
                    # against BiCGStab's f32-noise transient and MEASURED
                    # STAGNANT at 1M (rel 1.000 after 1792 its — the
                    # restart discards the growing Krylov space the
                    # coupled spectrum needs; BiCGStab's unrestarted
                    # recurrence eventually plunges).  BiCGStab stays the
                    # default; FVM_BENCH_NEWTON_SOLVER=gmres opts in.
                    flow64.options["newtonInnerSolver"] = os.environ.get(
                        "FVM_BENCH_NEWTON_SOLVER", "bicgstab"
                    )
                    flow64.options["newtonGmresRestart"] = int(
                        os.environ.get("FVM_BENCH_NEWTON_RESTART", "32")
                    )
                    # Eisenstat-Walker cap: the measured first-step
                    # contraction at 1M is NONLINEARITY-limited (1.5x
                    # even at inner rel 0.089), so a loose early eta is
                    # nearly free — FVM_BENCH_NEWTON_FMAX tunes it
                    fmax = os.environ.get("FVM_BENCH_NEWTON_FMAX")
                    if fmax:
                        flow64.options["newtonForcingMax"] = float(fmax)
                    # chunk size bounds each device program (the worker
                    # kills long programs): f64 inner iterations cost
                    # ~2.6 s each at 1M -> chunk 80; f32 ~0.15-0.3 s ->
                    # chunk 240 keeps programs ~1 min
                    flow64.options["newtonChunkIterations"] = int(
                        os.environ.get(
                            "FVM_BENCH_NEWTON_CHUNK64",
                            "240" if nprec else "80",
                        )
                    )
                    flow64.options["newtonVerboseInner"] = True
                    thermal64 = build_thermal(flow64.mesh)
                    flow64.options["residualSync"] = False
                    thermal64.options["residualSync"] = False
                    restore_state(flow64, snap_flow)
                    restore_state(thermal64, snap_thermal)
                    # refreeze the Rhie-Chow momAp/massFlux at f64
                    # fidelity before the first Newton step (the
                    # restored aP is the f32-inherited one, and the
                    # first frozen-aP Jacobian then mismatches the f64
                    # rhs — measured: step 1 contracts only 1.5-2.3x
                    # while step 2 gets ~11x at the same eta).  Uses the
                    # already-compiled "finish" program with dq=0 — no
                    # extra compile.  FVM_BENCH_NEWTON_REFREEZE=0 off.
                    if os.environ.get(
                        "FVM_BENCH_NEWTON_REFREEZE", "1"
                    ) != "0":
                        flow64.options["newtonRefreeze"] = True
                    # stop as soon as the post-update residual meets the
                    # target (the per-call loop used to overshoot by one
                    # full Newton step); ONE advanceNewton call keeps the
                    # Eisenstat-Walker forcing schedule alive across steps
                    flow64.options["newtonTargetResidual"] = (
                        target_rel * norm0
                    )
                    phases["polish_setup_s"] = time.time() - t_p
                    print(
                        f"# polish setup: {time.time()-t_p:.1f}s",
                        file=sys.stderr,
                    )
                    nmax = int(os.environ.get("FVM_BENCH_NEWTON_MAX", "10"))
                    hn = flow64.advanceNewton(nmax)
                    rel = float(hn[-1][1]) / norm0
                    # count only Newton steps that ran an inner solve (the
                    # trailing "target met" history entry runs none)
                    steps += len(getattr(flow64, "_newton_trace", None) or hn)
                    for k, tr in enumerate(
                        getattr(flow64, "_newton_trace", [])
                    ):
                        tr = dict(tr, entry_rel=tr["entry_mom"] / norm0)
                        phases["newton"].append(tr)
                        print(
                            f"# newton {k}: entry mom rel "
                            f"{tr['entry_rel']:.3e} eta {tr['eta']:.1e} "
                            f"inner {tr['inner_its']} its to "
                            f"{tr['inner_rel']:.1e} ({tr['s']}s)",
                            file=sys.stderr,
                        )
                    # converge the (linear, given massFlux) thermal field
                    # on the Newton flow solution
                    thermal64.state["massFlux"] = flow64.state["massFlux"]
                    thermal64.advance(20)
                    flow, thermal = flow64, thermal64
                    break
                # polish-phase solver settings: the endgame contraction is
                # Anderson-limited by INNER-solve noise (measured at 256^2:
                # tail-rate 0.998 at ptol 1e-3 vs 0.987 with ptol 1e-6 +
                # mtol 1e-4 + depth-8 every-step mixing); tight inner
                # solves only pay off here, where the differences Anderson
                # extrapolates are ~1e-5 relative.  Interval mixing wins
                # at scale: 512^2 A/B measured tail-rate 0.99757 with
                # depth 12 every-5-steps vs 0.99897 every-step (and
                # depth 24 every-step matched int5 at 2x the wall time)
                pkw = {
                    "ptol": float(
                        os.environ.get("FVM_BENCH_POLISH_PTOL", "1e-6")
                    ),
                    "pit": int(
                        os.environ.get("FVM_BENCH_POLISH_PIT", "20")
                    ),
                    "mtol": float(
                        os.environ.get("FVM_BENCH_POLISH_MTOL", "1e-4")
                    ),
                    "mit": int(
                        os.environ.get("FVM_BENCH_POLISH_MIT", "30")
                    ),
                }
                if os.environ.get("FVM_BENCH_ACCEL"):
                    pkw["options"] = {
                        "andersonInterval": int(
                            os.environ.get("FVM_BENCH_POLISH_AA_INT", "5")
                        ),
                        "andersonDepth": int(
                            os.environ.get("FVM_BENCH_POLISH_AA_DEPTH", "12")
                        ),
                        "andersonDelay": int(
                            os.environ.get("FVM_BENCH_POLISH_AA_DELAY", "5")
                        ),
                    }
                flow64 = build_flow(n, solver_kw=pkw)
                thermal64 = build_thermal(flow64.mesh)
                flow64.options["residualSync"] = False
                thermal64.options["residualSync"] = False
                promote_state(flow, flow64)
                promote_state(thermal, thermal64)
                flow, thermal = flow64, thermal64
                polish = ""  # once
                prev_rel = None
                max_steps = steps + int(
                    os.environ.get("FVM_BENCH_POLISH_MAX", "2000")
                )
                print(
                    f"# polish setup: {time.time()-t_p:.1f}s",
                    file=sys.stderr,
                )
        dt_conv = time.time() - t0 + fmg_time
        print(
            f"# time-to-{target_rel:g}: {dt_conv:.1f}s incl. "
            f"{fmg_time:.1f}s fmg ({steps} outer steps, rel {rel:.3e})",
            file=sys.stderr,
        )
        art = os.environ.get("FVM_BENCH_CONVERGE_OUT")
        if art:
            # reference estimate for the same workload: ~0.25 s/outer/core
            # at 1M cells x ~75k outers (0.9998 contraction x 6 decades)
            # ~= 5.2 h single-core (BASELINE.md target #2: >=20x faster
            # per chip -> <= 940 s)
            ref_s = 5.2 * 3600.0
            # the 5.2 h estimate is for the default 1M-cell cavity; for
            # other FVM_BENCH_N the per-cell scaling is a rough guide at
            # best, so only report vs_baseline on the calibrated size
            vs_base = ref_s / dt_conv if n == 1024 else None
            with open(art, "w") as f:
                json.dump(
                    {
                        "metric": "time_to_rel_residual",
                        "target_rel": target_rel,
                        "reached_rel": rel,
                        "converged": rel < target_rel,
                        "n_cells": n_cells,
                        "value": dt_conv,
                        "unit": "s",
                        "vs_baseline": vs_base,
                        "outer_steps": steps,
                        "phases": phases,
                    },
                    f,
                    indent=1,
                )
            print(f"# wrote {art}", file=sys.stderr)

    baseline = 2.5e5  # est. reference MPI C++ on one CPU core (see docstring)
    print(
        json.dumps(
            {
                "metric": "flow_thermal_cells_per_sec_per_chip",
                "value": cells_per_sec,
                "unit": "cells/s",
                "vs_baseline": cells_per_sec / baseline,
            }
        )
    )


def suite():
    """The remaining BASELINE.md benchmark configs, one JSON line each:
    homoCase thermal diffusion (the reference's own demos/homoCase
    10k-cell beam mesh), a heated-channel conjugate flow+thermal case
    (solid slab conducting under an IBM-pinned channel flow), and
    electrostatics on the reference's unstructured tet cavity with
    BCGStab (cav_tetra.cas).  The headline 1M coupled cavity is main().

    Run: python bench.py --suite     (TPU; CPU works for smoke tests)
    """
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_fvm")
    if os.environ.get("FVM_BENCH_CPU"):
        # CPU smoke runs: the TPU plugin ignores JAX_PLATFORMS, this
        # config update (before any jax array work) does not
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import fvm_tpu as fvm
    from fvm_tpu.io.fluent import read_fluent_mesh
    from fvm_tpu.models import ThermalModel
    from fvm_tpu.models.flow import FlowModel
    from fvm_tpu.models.electric import ElectricModel
    from fvm_tpu.linear import AMG, BiCGStab, JacobiSolver

    fvm.set_default_dtype(os.environ.get("FVM_BENCH_DTYPE", "float32"))
    ref = "/root/reference"
    baseline_cps = 2.5e5  # est. reference C++ per CPU core (see main())

    def emit(metric, value, unit, vs, **kw):
        print(json.dumps(dict(
            {"metric": metric, "value": value, "unit": unit,
             "vs_baseline": vs}, **kw)))

    # ---- 1) homoCase thermal diffusion (serial) ----------------------
    mesh = read_fluent_mesh(f"{ref}/demos/homoCase/homoCase-10000.cas")
    dm = fvm.mesh.build_device_mesh(mesh)
    t = ThermalModel(dm)
    t.options["verbose"] = False
    t.options["linearSolver"] = AMG(
        coarse_size=64, relative_tolerance=1e-3, max_iterations=20
    )
    t.bc["assembly.top"].bc_type = "SpecifiedTemperature"
    t.bc["assembly.top"]["specifiedTemperature"] = 400.0
    t.bc["assembly.bot"].bc_type = "SpecifiedTemperature"
    t.bc["assembly.bot"]["specifiedTemperature"] = 300.0
    for g in ("assembly.left", "assembly.right", "assembly.front",
              "assembly.back"):
        t.bc[g].bc_type = "Symmetry"
    t.init()
    # device-resident outer loop (options.outerChunk, round 5): all
    # timed outers run in ONE dispatch — the round-4 version paid a
    # ~1-3 ms tunnel dispatch + readback PER OUTER, which dominated
    # this 10k-cell case (0.25x baseline measured)
    iters = 20
    t.options["outerChunk"] = iters
    # no early exit: this is a fixed-work throughput benchmark (the
    # case converges in ~2 outers; zero tolerances keep all `iters`
    # linearize+AMG-solve steps running)
    t.options["absoluteTolerance"] = 0.0
    t.options["relativeTolerance"] = 0.0
    h = t.advance(iters)  # compile
    t0 = time.time()
    h = t.advance(iters)
    cps = dm.n_interior_cells * iters / (time.time() - t0)
    # converged residual, for the record (solved well past round-off)
    emit("homocase_thermal_cells_per_sec", cps, "cells/s",
         cps / baseline_cps, residual=float(h[-1][1]),
         converged=float(h[-1][1]) < 1e-6)

    # ---- 2) heated-channel conjugate flow+thermal --------------------
    nx, ny = 384, 128
    mesh = fvm.mesh.generate.quad_2d(nx, ny, lx=3.0, ly=1.0)
    import fvm_tpu.mesh.metrics as metrics

    geom = metrics.compute_geometry(mesh)
    yc = geom.cell_centroid[: mesh.n_interior_cells, 1]
    solid = yc < 0.25  # conducting slab under the channel
    dm = fvm.mesh.build_device_mesh(mesh)
    flow = FlowModel(dm)
    flow.options["verbose"] = False
    flow.vc["viscosity"] = 0.01
    flow.options["pressureLinearSolver"] = AMG(
        coarse_size=128, relative_tolerance=1e-3, max_iterations=6
    )
    flow.options["momentumLinearSolver"] = BiCGStab(
        relative_tolerance=1e-2, max_iterations=10
    )
    flow.bc["left"].bc_type = "VelocityBoundary"
    # inlet profile: zero over the solid slab rows
    u_in = np.where(yc[:ny] >= 0.25, 1.0, 0.0)  # cells are y-fastest
    flow.bc["left"]["specifiedXVelocity"] = u_in
    flow.bc["right"].bc_type = "PressureBoundary"
    flow.bc["top"].bc_type = "NoSlipWall"
    flow.bc["bottom"].bc_type = "NoSlipWall"
    flow.init()
    flow.set_immersed_boundary(solid, [0.0, 0.0], solid_mask=solid)
    thermal = ThermalModel(dm)
    thermal.options["verbose"] = False
    thermal.options["convective"] = True
    thermal.options["linearSolver"] = AMG(
        coarse_size=128, relative_tolerance=1e-3, max_iterations=6
    )
    thermal.vc["thermalConductivity"] = np.where(solid, 20.0, 1.0)
    thermal.bc["left"].bc_type = "SpecifiedTemperature"
    thermal.bc["left"]["specifiedTemperature"] = 300.0
    thermal.bc["bottom"].bc_type = "SpecifiedTemperature"
    thermal.bc["bottom"]["specifiedTemperature"] = 400.0
    thermal.bc["right"].bc_type = "ZeroGradient"  # convective outflow
    thermal.bc["top"].bc_type = "Symmetry"
    thermal.init()

    # time-to-target (round 5; the round-4 version timed 10 fixed outers
    # and emitted an unconverged raw residual).  The coupling is one-way
    # (flow -> massFlux -> thermal), so converge the flow first, hand
    # the mass flux over once, then converge the advected thermal field;
    # both phases run device-resident chunked outer loops.
    # momentum target: the f32 SIMPLE tail on this conjugate case floors
    # near rel ~2e-4 (measured CPU smoke, 3000 outers) — 5e-4 is the
    # converged-engineering target; the (linear, given massFlux) thermal
    # solve gets the tight 1e-5
    tol = float(os.environ.get("FVM_BENCH_CHANNEL_TOL", "5e-4"))
    ttol = float(os.environ.get("FVM_BENCH_CHANNEL_TTOL", "1e-5"))
    maxout = int(os.environ.get("FVM_BENCH_CHANNEL_MAX", "6000"))
    chunk = int(os.environ.get("FVM_BENCH_CHANNEL_CHUNK", "100"))
    flow.options["outerChunk"] = chunk
    flow.options["momentumTolerance"] = tol
    flow.options["continuityTolerance"] = tol
    flow.options["absoluteTolerance"] = 0.0
    thermal.options["outerChunk"] = 20
    thermal.options["relativeTolerance"] = ttol
    thermal.options["absoluteTolerance"] = 0.0
    snapf = dict(flow.state)
    snapt = dict(thermal.state)
    flow.advance(chunk)  # compile (real work, discarded below)
    thermal.state["massFlux"] = flow.state["massFlux"]
    thermal.advance(20)  # compile
    # cold restart for the timed run
    flow.state, flow._norm0 = snapf, None
    thermal.state, thermal._initial_norm = snapt, None
    t0 = time.time()
    hf = flow.advance(maxout)
    thermal.state["massFlux"] = flow.state["massFlux"]
    ht = thermal.advance(maxout)
    dt = time.time() - t0
    mom_rel = float(hf[-1][1]) / max(float(hf[0][1]), 1e-300)
    th_rel = float(ht[-1][1]) / max(float(ht[0][1]), 1e-300)
    conv = (mom_rel < tol) and (th_rel < ttol)
    outers = len(hf) + len(ht)
    # reference estimate: the same SIMPLE outer count at the documented
    # per-core throughput
    ref_s = outers * nx * ny / baseline_cps
    emit("heated_channel_time_to_tol", dt, "s", ref_s / dt,
         target_rel=tol, mom_rel=mom_rel, thermal_rel=th_rel,
         outer_steps=outers, converged=conv)

    # ---- 3) electrostatics on unstructured tets + BCGStab ------------
    # f64 like the reference driver: the BCGStab target is below f32
    # resolution (measured: f32 caps at 2000 iterations unconverged).
    # Round 5/6: reference-grade 1e-10 is now reached ON CHIP (measured
    # rel 9.9e-11 in 44 its) via (a) compensated dot/norm/SpMV/vector
    # paths (ops/compdot.py, auto-on for emulated-f64 backends) making
    # the Krylov arithmetic trustworthy, and (b) exact power-of-two
    # system equilibration (linear/base.pow2_equilibrate): the old
    # 1e-7..2e-8 "floor" was the emulated format's f32-grade EXPONENT
    # range underflowing rho = |r|^2 on this eps0-scaled (~1e-11)
    # system, not a precision limit.  FVM_BENCH_TET_TOL overrides;
    # reference-grade is 1e-8..1e-10 (LinearSolver.h:22-23).
    # stall_restart stays as a safety net.
    fvm.set_default_dtype("float64")
    mesh = read_fluent_mesh(f"{ref}/src/fvm/test/cav_tetra.cas")
    dm = fvm.mesh.build_device_mesh(mesh)
    em = ElectricModel(dm)
    em.options["verbose"] = False
    tet_default = "1e-10"  # same target on chip and CPU (see above)
    solver = BiCGStab(
        preconditioner=JacobiSolver(sweeps=2),
        relative_tolerance=float(
            os.environ.get("FVM_BENCH_TET_TOL", tet_default)
        ),
        max_iterations=2000,
        stall_restart=True,
    )
    em.options["electrostaticsLinearSolver"] = solver
    em.bc["wall.2"].bc_type = "SpecifiedPotential"
    em.bc["wall.2"]["specifiedPotential"] = 1.0
    em.bc["new_wall.2"].bc_type = "SpecifiedPotential"
    em.bc["new_wall.2"]["specifiedPotential"] = 0.0
    em.init()
    bcvals = em._resolve_bcvals()
    A, r = em._linearize_potential(dm, em.params, em.state, bcvals)
    x, st = solver.solve_fn(A, r, jnp.zeros_like(r))  # compile
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        x, st = solver.solve_fn(A, r, jnp.zeros_like(r))
    its = int(st.iterations)
    dt = (time.time() - t0) / reps
    cps = dm.n_interior_cells * its / dt
    emit("electrostatics_tet_bcgstab_cells_x_iters_per_sec", cps,
         "cell-iters/s", cps / (baseline_cps * 10),
         iterations_to_tol=its, solve_seconds=dt,
         converged=bool(st.converged))


if __name__ == "__main__":
    if "--suite" in sys.argv or os.environ.get("FVM_BENCH_SUITE"):
        suite()
    else:
        main()
