"""SqueezeFilmModel: Reynolds-equation gas damping for MEMS gaps.

Plays the role of the squeeze-film flow damping in the reference's MEMS
simulator (reference: src/fvm/scripts/MEMS/Simulator.py couples a thin-gap
FlowModel under the moving plate for damping).  Here the thin film is
reduced to the isothermal incompressible Reynolds equation on the plate's
2D mesh — the idiomatic lubrication limit for squeeze numbers << 1:

    div( h^3/(12 mu) grad p ) = dh/dt

with h the local gap, p the damping pressure (gauge), dh/dt the plate
approach velocity.  Vented edges are Dirichlet p = 0; sealed edges are
Symmetry (zero flux).  The damping load on the plate is -p per unit area
(getDampingForce integrates p over the cells).

Built on GenericScalarModel: the only specializations are the gap-cubed
mobility in place of a material diffusivity and the dh/dt source.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.options import BoundaryCondition, ModelOptions
from ..core import bcs as bck
from ..exceptions import ConfigError
from .scalar_generic import GenericScalarModel


class SqueezeFilmBC(BoundaryCondition):
    _allowed_types = ("Dirichlet", "SpecifiedFlux", "Symmetry", "Periodic")
    _defaults = {
        "specifiedPressure": 0.0,
        "specifiedFlowRate": 0.0,
    }


class SqueezeFilmVC(BoundaryCondition):
    _defaults = {
        "viscosity": 1.8e-5,
        "initialGap": 1.0,
        "initialPressure": 0.0,
    }


class SqueezeFilmModelOptions(ModelOptions):
    _defaults = {
        "transient": False,
        "timeStep": 1e-6,
        "timeDiscretizationOrder": 1,
        "convective": False,
        "nonOrthogonalCorrection": True,
        "relativeTolerance": 1e-10,
        "absoluteTolerance": 1e-16,
        "verbose": True,
    }


class SqueezeFilmModel(GenericScalarModel):
    name = "SqueezeFilmModel"
    var = "pressure"
    diffusivity_vc = "initialGap"  # placeholder; D is rebuilt from the gap
    initial_vc = "initialPressure"
    bc_dirichlet = "specifiedPressure"
    bc_flux = "specifiedFlowRate"

    def __init__(self, mesh, partition=None):
        super().__init__(mesh, partition)
        self.vc = SqueezeFilmVC()

    def _make_options(self):
        return SqueezeFilmModelOptions()

    def _make_bc(self):
        return SqueezeFilmBC()

    def _extra_params(self):
        mesh = self.mesh
        h = self._cell_field(self.vc, "initialGap", extend_ghosts=True)
        self.params["mu"] = self._cell_field(
            self.vc, "viscosity", extend_ghosts=True
        )
        self.params["dhdt"] = self._full_cells(0.0)
        self._apply_gap(h)

    def _apply_gap(self, h):
        self.params["h"] = h
        self.params["D"] = h**3 / (12.0 * self.params["mu"])

    def set_gap(self, h, dhdt) -> None:
        """Update the local gap and its rate (e.g. from a PlateModel's
        deflection and velocity) before the next solve.  Values are GLOBAL
        (host-mesh interior ordering) scalars or arrays; distributed
        models scatter them to the per-shard local meshes."""
        mesh = self.mesh
        dtype = self.params["h"].dtype
        if self._dist:
            self._apply_gap(self._scatter_host_cells(h, dtype, True))
            self.params["dhdt"] = self._scatter_host_cells(dhdt, dtype)
            return
        h = jnp.asarray(h, dtype)
        if h.ndim == 0:
            h = jnp.full((mesh.n_cells,), h)
        elif h.shape[0] < mesh.n_cells:
            h = jnp.pad(h, (0, mesh.n_cells - h.shape[0]))
        h = bck.extend_to_ghosts(mesh, h)
        self._apply_gap(h)
        d = jnp.asarray(dhdt, dtype)
        if d.ndim == 0:
            d = jnp.full((mesh.n_cells,), d)
        elif d.shape[0] < mesh.n_cells:
            d = jnp.pad(d, (0, mesh.n_cells - d.shape[0]))
        self.params["dhdt"] = d

    def _source_terms(self, mesh, params, state, phi):
        # div(D grad p) - dh/dt = 0  ->  source S = -dh/dt
        z = jnp.zeros(mesh.n_cells, phi.dtype)
        return z, -params["dhdt"] * mesh.cell_volume

    def getPressure(self) -> np.ndarray:
        return self.get_field()

    def getDampingForce(self) -> float:
        """Total reaction force of the film on the plate: integral of the
        damping pressure (positive resists closing, dh/dt < 0)."""
        mesh = self.mesh
        if self._dist:
            # gather to GLOBAL interior ordering, integrate with the host
            # mesh's cell volumes (padded local volumes double-count halos)
            p = self.partition.gather_cells(self.state[self.var])
            vol = self.partition.geom.cell_volume[
                : self.partition.mesh.n_interior_cells
            ]
            return float(np.sum(p * vol))
        p = self.state[self.var]
        f = jnp.sum(
            p[: mesh.n_interior_cells]
            * mesh.cell_volume[: mesh.n_interior_cells]
        )
        return float(f)
