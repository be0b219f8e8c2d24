"""Generic scalar transport model base.

Factors the diffusion/convection/source/transient + BC pattern shared by
several of the reference's scalar models (VacancyModel_impl.h,
FractureModel_impl.h, and the thermal/species structure) into one
parameterized implementation.  Subclasses set the field/BC vocabulary and
may override source hooks.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceMesh
from ..core.options import BoundaryCondition, ModelOptions
from ..core import bcs as bck
from ..core import interfaces as ifc
from ..ops import assembly, discretizations as disc
from ..ops.halo import maybe_sync
from ..ops.gradients import ls_gradient_coefficients, gradient
from ..linear import AMG, BiCGStab, CG, JacobiSolver
from ..exceptions import ConfigError
from .base import Model, ResidualHistory


class PCExpansion:
    """Polynomial-chaos expansion result (reference: fvmbase/PC.h:61 —
    the intrusive PC<ORDER,DIM> atype's _data coefficients, here obtained
    by non-intrusive spectral projection).

    ``coefficients`` maps multi-index tuples alpha -> (n_interior,)
    coefficient fields in the ORTHONORMAL probabilists' Hermite basis,
    so mean = c_0 and variance = sum_{alpha != 0} c_alpha^2 (the same
    stdDev() the reference reads off its PC arithmetic)."""

    def __init__(self, coefficients: dict, ndim: int):
        self.coefficients = coefficients
        self.ndim = ndim

    def mean(self) -> np.ndarray:
        return self.coefficients[(0,) * self.ndim]

    def variance(self) -> np.ndarray:
        z = (0,) * self.ndim
        return sum(
            c**2 for a, c in self.coefficients.items() if a != z
        )

    def std(self) -> np.ndarray:
        return np.sqrt(self.variance())

    def eval(self, xi) -> np.ndarray:
        """Evaluate the surrogate at a sample point xi (ndim,)."""
        from math import factorial

        xi = np.atleast_1d(np.asarray(xi, np.float64))
        out = 0.0
        for a, c in self.coefficients.items():
            psi = 1.0
            for i, k in enumerate(a):
                hc = np.zeros(k + 1)
                hc[k] = 1.0
                psi *= np.polynomial.hermite_e.hermeval(
                    xi[i], hc
                ) / np.sqrt(factorial(k))
            out = out + psi * c
        return out


class GenericScalarModel(Model):
    """Scalar transport: d(rho phi)/dt + div(mdot phi) = div(D grad phi) + S.

    Subclass knobs:
      var            state key for the unknown
      diffusivity_vc VC key for D
      initial_vc     VC key for the initial value
      bc_dirichlet   BC key holding the Dirichlet value
      bc_flux        BC key holding the specified boundary flux (per area)
    """

    var = "phi"
    _supports_interfaces = True
    diffusivity_vc = "diffusivity"
    initial_vc = "initialValue"
    bc_dirichlet = "specifiedValue"
    bc_flux = "specifiedFlux"

    def init(self) -> None:
        mesh = self.mesh
        x0 = self._cell_field(self.vc, self.initial_vc, extend_ghosts=True)
        self.state = {self.var: x0, "massFlux": self._full_faces(0.0)}
        if self.options["transient"]:
            self.state[f"{self.var}_N1"] = x0
            if self.options.get("timeDiscretizationOrder", 1) > 1:
                self.state[f"{self.var}_N2"] = x0
        self.params = {
            "D": self._cell_field(self.vc, self.diffusivity_vc, extend_ghosts=True),
        }
        self._extra_params()
        for g, bc in self._group_bcs():
            if bc.bc_type == "Periodic":
                self.params[f"periodic_src:{g[1]}"] = self._periodic_group_src(g)
        if self.options.get("nonOrthogonalCorrection", True):
            self.params["grad_coeff"] = (
                jax.vmap(ls_gradient_coefficients)(mesh)
                if self._dist
                else ls_gradient_coefficients(mesh)
            )
        solver = self.options.get("linearSolver")
        if solver is None:
            if self._dist:
                # ghost BC rows (flux/extrapolation) and interface
                # closures are nonsymmetric, and dist matrices are not
                # boundary-condensed: CG silently diverges on them,
                # BiCGStab is robust
                solver = BiCGStab(
                    preconditioner=JacobiSolver(sweeps=3),
                    relative_tolerance=1e-10,
                    max_iterations=500,
                )
            else:
                solver = BiCGStab(
                    preconditioner=AMG(), relative_tolerance=1e-10, max_iterations=50
                )
            self.options["linearSolver"] = solver
        pre = getattr(solver, "preconditioner", None)
        for s in (solver, pre):
            if isinstance(s, AMG) and not self._dist:
                s.setup_structure(*mesh.host_cf())
        if self._dist:
            self.state = self.partition.device_put(self.state)
            self.params = self.partition.device_put(self.params)
        self._step = self._wrap_step(self._build_step())
        self._initial_norm = None
        self._initialized = True

    # hooks ---------------------------------------------------------------

    def _extra_params(self):
        pass

    def _source_terms(self, mesh, params, state, phi):
        """Return (diag_cell, r_cell) source contributions."""
        z = jnp.zeros(mesh.n_cells, phi.dtype)
        return z, z

    # ---------------------------------------------------------------------

    def _linearize(self, mesh, params, state, bcvals):
        opts = self.options
        phi = maybe_sync(mesh, state[self.var])
        D_f = disc.harmonic_face_gamma(mesh, params["D"])
        gradp = None
        if "grad_coeff" in params:
            gradp = maybe_sync(mesh, gradient(mesh, params["grad_coeff"], phi))
        flux = disc.diffusion_flux(mesh, phi, D_f, gradp)
        if opts.get("convective", False):
            flux = flux + disc.convection_flux(
                mesh, phi, state["massFlux"], opts.get("convectionScheme", "upwind"),
                gradp,
            )
        for g, bc in self._group_bcs():
            sl = mesh.group_faces(g)
            if bc.bc_type == "Symmetry":
                flux = bck.set_flux_fixed(flux, sl, 0.0)
            elif bc.bc_type == "SpecifiedFlux":
                q = bcvals[f"{g[1]}:{self.bc_flux}"]
                flux = bck.set_flux_fixed(flux, sl, -q * mesh.face_area_mag[sl])
        diag_cell, r_cell = self._source_terms(mesh, params, state, phi)
        if opts["transient"]:
            d2, r2 = disc.transient_term(
                mesh,
                phi,
                state[f"{self.var}_N1"],
                opts["timeStep"],
                1.0,
                state.get(f"{self.var}_N2"),
            )
            diag_cell = diag_cell + d2
            r_cell = r_cell + r2
        A, r = assembly.assemble(mesh, flux, r_cell=r_cell, diag_cell=diag_cell)
        for g, bc in self._group_bcs():
            gc = mesh.ghost_cells_of_group(g)
            sl = mesh.group_faces(g)
            valid = bcvals[f"{g[1]}:__valid"]
            scale = D_f[sl] * mesh.face_e_over_d[sl]
            if bc.bc_type == "Dirichlet":
                A, r = bck.dirichlet_rows(
                    mesh, A, r, gc, bcvals[f"{g[1]}:{self.bc_dirichlet}"], phi,
                    valid, scale,
                )
            elif bc.bc_type == "Periodic":
                psrc = params[f"periodic_src:{g[1]}"]
                A, r = bck.periodic_rows(
                    mesh, A, r, gc, phi, psrc, valid, scale
                )
            else:
                A, r = bck.extrapolation_rows(mesh, A, r, gc, phi, valid, scale)
        A, r = ifc.apply_model_interfaces(
            mesh, self.interface, A, r, phi, flux, D_f
        )
        A, r = assembly.identity_unowned_rows(mesh, A, r)
        return A, r

    def _build_step(self):
        solver = self.options["linearSolver"]
        urf = float(self.options.get("urf", 1.0))

        def step(mesh, params, state, bcvals):
            A, r = self._linearize(mesh, params, state, bcvals)
            rnorm = A.norm(r)
            dx, _ = solver.solve_fn(A, r, jnp.zeros_like(r))
            state = dict(state)
            state[self.var] = state[self.var] + urf * dx
            return state, {"rnorm": rnorm}

        return step

    def advance(self, niter: int = 1) -> ResidualHistory:
        if not self._initialized:
            raise ConfigError("call init() before advance()")
        opts = self.options
        hist = ResidualHistory()
        bcvals = self._resolve_bcvals()
        for it in range(niter):
            with self._phase("step"):
                self.state, aux = self._step(
                    self.mesh, self.params, self.state, bcvals
                )
            rnorm = float(aux["rnorm"])
            if self._initial_norm is None or self._initial_norm == 0.0:
                self._initial_norm = rnorm
            hist.append((it, rnorm))
            self._log_iteration(f"{self.name}: {it}: {rnorm:.6e}")
            if rnorm < opts["absoluteTolerance"]:
                break
            if rnorm / max(self._initial_norm, 1e-300) < opts["relativeTolerance"]:
                break
        return hist

    def updateTime(self):
        if not self.options["transient"]:
            raise ConfigError(f"{self.name}: transient option is off")
        if f"{self.var}_N2" in self.state:
            self.state[f"{self.var}_N2"] = self.state[f"{self.var}_N1"]
        self.state[f"{self.var}_N1"] = self.state[self.var]

    def get_field(self) -> np.ndarray:
        if self._dist:
            return self.partition.gather_cells(self.state[self.var])
        return np.asarray(self.state[self.var][: self.mesh.n_interior_cells])

    # --- sensitivities / UQ (reference: atypes/tangent_double, PC.h) -------

    def solve_tangent(self, param_tangents: dict) -> np.ndarray:
        """Forward-mode sensitivity d(phi*)/d(params) . dparams at the
        current (converged) state.

        The reference gets parameter sensitivities by recompiling every
        model with the Tangent atype (atypes/tangent_double/atype.h:10);
        here one jax.jvp through an implicitly-differentiated solve step
        does the same: at convergence phi* satisfies R(phi*, p) = 0, so
        d(phi*) = A^{-1} dR/dp . dp with A = -dR/dphi — exactly the
        tangent of ``phi + A^{-1} r`` evaluated at r = 0.  Exact for the
        linearizations in A (diffusion/transient/sources); convection
        upwind is Picard-linearized, as in the reference.

        param_tangents maps keys of ``self.params`` (e.g. "D") to tangent
        arrays of the same shape ((n_interior,) accepted — zero-padded and
        ghost-extended like the primal).  Returns d(phi) on interior cells.
        """
        if not self._initialized:
            raise ConfigError("call init() + advance() before solve_tangent")
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        state = self.state
        solver = self.options["linearSolver"]

        if self._dist:
            # per-shard jvp through the implicitly-differentiated solve
            # under shard_map (Krylov reductions psum across shards)
            def pad_dist(key, v):
                ref = self.params[key]
                v_ = np.asarray(v)
                if v_.shape == tuple(ref.shape):
                    return jnp.asarray(v_, ref.dtype)
                return self._scatter_host_cells(
                    v_, ref.dtype, extend_ghosts=True
                )

            keys = list(param_tangents)
            tans = {k: pad_dist(k, v) for k, v in param_tangents.items()}

            def local_fn(lmesh, params_all, lstate, lbcvals, tans_p):
                def step_from_converged(p):
                    params = dict(params_all, **p)
                    A, r = self._linearize(lmesh, params, lstate, lbcvals)
                    dx, _ = solver.solve_fn_implicit(A, r, jnp.zeros_like(r))
                    return lstate[self.var] + dx

                base_p = {k: params_all[k] for k in keys}
                return jax.jvp(step_from_converged, (base_p,), (tans_p,))[1]

            mapped = self._smap_cells(local_fn)
            dphi = mapped(mesh, self.params, state, bcvals, tans)
            return self.partition.gather_cells(dphi)

        def pad(key, v):
            ref = self.params[key]
            v = jnp.asarray(v, ref.dtype)
            if v.shape != ref.shape:
                v = jnp.zeros(ref.shape, ref.dtype).at[: v.shape[0]].set(v)
                v = bck.extend_to_ghosts(mesh, v)
            return v

        keys = list(param_tangents)
        base = {k: self.params[k] for k in keys}
        tans = {k: pad(k, v) for k, v in param_tangents.items()}

        @jax.jit
        def step_from_converged(p):
            params = dict(self.params, **p)
            A, r = self._linearize(mesh, params, state, bcvals)
            dx, _ = solver.solve_fn_implicit(A, r, jnp.zeros_like(r))
            return state[self.var] + dx

        _, dphi = jax.jvp(step_from_converged, (base,), (tans,))
        return np.asarray(dphi[: mesh.n_interior_cells])

    def solve_mc(self, param_key: str, samples, niter: int = 20) -> np.ndarray:
        """UQ parameter sweep: vmapped solves over a batch of parameter
        fields (the role of the reference's polynomial-chaos atype,
        PC.h:61, replaced by embarrassingly-parallel sampling on the
        vector unit).  ``samples`` is (S,) scalars or (S, n) fields for
        ``self.params[param_key]``; returns (S, n_interior) solutions,
        each re-solved from the initial condition with ``niter`` outer
        iterations."""
        if not self._initialized:
            raise ConfigError("call init() before solve_mc")
        mesh = self.mesh
        bcvals = self._resolve_bcvals()
        solver = self.options["linearSolver"]

        if self._dist:
            # vmap over samples OUTSIDE the shard_map'd per-sample solve:
            # the batch runs on every shard, psums reduce per sample
            ref = self.params[param_key]
            samples = np.asarray(samples)
            if samples.ndim == 1:
                scat = jnp.stack(
                    [
                        self._scatter_host_cells(s, ref.dtype)
                        for s in samples
                    ]
                )  # (S_samples, n_shards, nc_local)
            else:
                scat = jnp.stack(
                    [
                        self._scatter_host_cells(
                            s, ref.dtype, extend_ghosts=True
                        )
                        for s in samples
                    ]
                )
            state0 = self.state

            def local_fn(lmesh, params_all, lstate, lbcvals, val):
                params = dict(params_all, **{param_key: val})

                def body(st, _):
                    A, r = self._linearize(lmesh, params, st, lbcvals)
                    dx, _ = solver.solve_fn(A, r, jnp.zeros_like(r))
                    return dict(st, **{self.var: st[self.var] + dx}), None

                st, _ = jax.lax.scan(body, lstate, None, length=niter)
                return st[self.var]

            mapped = self._smap_cells(local_fn)
            sols = jax.vmap(
                lambda v: mapped(mesh, self.params, state0, bcvals, v)
            )(scat)
            return np.stack(
                [self.partition.gather_cells(s) for s in np.asarray(sols)]
            )

        ref = self.params[param_key]
        samples = jnp.asarray(samples, ref.dtype)
        if samples.ndim == 1:
            samples = jnp.broadcast_to(
                samples[:, None], (samples.shape[0],) + ref.shape
            )
        elif samples.shape[1] != ref.shape[0]:
            pad = jnp.zeros((samples.shape[0],) + ref.shape, ref.dtype)
            samples = pad.at[:, : samples.shape[1]].set(samples)
            samples = jax.vmap(lambda v: bck.extend_to_ghosts(mesh, v))(samples)
        state0 = self.state

        @jax.jit
        @functools.partial(jax.vmap)
        def solve_one(val):
            params = dict(self.params, **{param_key: val})

            def body(st, _):
                A, r = self._linearize(mesh, params, st, bcvals)
                dx, _ = solver.solve_fn(A, r, jnp.zeros_like(r))
                return dict(st, **{self.var: st[self.var] + dx}), None

            st, _ = jax.lax.scan(body, state0, None, length=niter)
            return st[self.var][: mesh.n_interior_cells]

        return np.asarray(solve_one(samples))

    def solve_pc(
        self,
        param_key: str,
        mean,
        directions,
        order: int = 2,
        niter: int = 20,
        quad_points: int | None = None,
    ) -> "PCExpansion":
        """Non-intrusive polynomial-chaos expansion (the role of the
        reference's intrusive PC<ORDER,DIM> atype, fvmbase/PC.h:61).

        The uncertain parameter is  p(xi) = mean + sum_i xi_i * dir_i
        with xi_i independent standard normals.  Solutions at tensor
        Gauss-Hermite nodes (vmapped through ``solve_mc``) are projected
        onto the orthonormal probabilists' Hermite basis up to total
        degree ``order``; mean/variance come from the coefficients
        (variance = sum of squared non-constant coefficients), matching
        what the reference extracts from its PC arithmetic.

        ``mean``: scalar or (n_interior,) field; ``directions``: sequence
        of scalars/fields (one per random dimension).  Returns a
        ``PCExpansion``."""
        import itertools
        from math import factorial

        dirs = [np.asarray(d, dtype=np.float64) for d in directions]
        ndim = len(dirs)
        q = int(quad_points or (order + 1))
        nodes, weights = np.polynomial.hermite_e.hermegauss(q)
        weights = weights / weights.sum()  # normalize N(0,1) quadrature

        n_int = (
            self.partition.mesh.n_interior_cells
            if self._dist
            else self.mesh.n_interior_cells
        )
        mean_f = np.broadcast_to(np.asarray(mean, np.float64), (n_int,))
        dir_f = [np.broadcast_to(d, (n_int,)) for d in dirs]

        grids = list(itertools.product(range(q), repeat=ndim))
        xi = np.array([[nodes[i] for i in g] for g in grids])  # (Q, ndim)
        W = np.array([np.prod([weights[i] for i in g]) for g in grids])
        samples = mean_f[None, :] + xi @ np.stack(dir_f)  # (Q, n_int)
        sols = self.solve_mc(param_key, samples, niter=niter)  # (Q, n_int)

        # orthonormal probabilists' Hermite: he_k(x)/sqrt(k!)
        def he(k, x):
            c = np.zeros(k + 1)
            c[k] = 1.0
            return np.polynomial.hermite_e.hermeval(x, c) / np.sqrt(
                factorial(k)
            )

        alphas = [
            a
            for a in itertools.product(range(order + 1), repeat=ndim)
            if sum(a) <= order
        ]
        coeffs = {}
        for a in alphas:
            psi = np.prod(
                [he(k, xi[:, i]) for i, k in enumerate(a)], axis=0
            )  # (Q,)
            coeffs[a] = (W * psi) @ sols
        return PCExpansion(coeffs, ndim)

    def getFluxIntegral(self, group_name) -> float:
        """Diffusive flux leaving the domain through a boundary group
        (reference: the per-model get<Var>FluxIntegral accessors)."""
        mesh = self.mesh
        g = (
            mesh.group_by_name(group_name)
            if isinstance(group_name, str)
            else group_name
        )

        def face_flux(m, phi, D, grad_coeff=None):
            D_f = disc.harmonic_face_gamma(m, D)
            gradp = (
                gradient(m, grad_coeff, phi) if grad_coeff is not None else None
            )
            return disc.diffusion_flux(m, phi, D_f, gradp).F

        args = (self.state[self.var], self.params["D"])
        if "grad_coeff" in self.params:
            args = args + (self.params["grad_coeff"],)
        F = self._map_mesh(face_flux, *args)
        return float(self._sum_group(g, F))
