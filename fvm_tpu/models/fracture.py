"""FractureModel: phase-field fracture evolution.

TPU-native counterpart of the reference's FractureModel
(reference: FractureModel.h:19, FractureModel_impl.h — diffusion of
'phasefieldvalue' with 'fractureConductivity', plus
SourceDiscretizationforFracture.h:  r += V*(1 + source),
diag += V*sourcecoef, where source/sourcecoef encode the elastic energy
driving force; used by demos/homoCase/homoCase.py:44-57).

The phase field d in [0,1] marks damage; source fields are supplied by the
driver (typically from a StructureModel's strain energy).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.options import BoundaryCondition, ModelOptions
from .scalar_generic import GenericScalarModel


class FractureBC(BoundaryCondition):
    _allowed_types = ("Dirichlet", "SpecifiedFlux", "Symmetry", "Periodic")
    _defaults = {
        "specifiedPhaseFieldValue": 1.0,
        "specifiedPhaseFieldFlux": 0.0,
    }


class FractureVC(BoundaryCondition):
    _defaults = {
        "fractureConductivity": 1.0,
        "initialPhaseFieldValue": 1.0,
        "fractureSource": 0.0,  # per-cell driving source (field or const)
        "fractureSourceCoef": 0.0,  # implicit source coefficient
    }


class FractureModelOptions(ModelOptions):
    _defaults = {
        "transient": True,
        "timeStep": 1e-3,
        "timeDiscretizationOrder": 1,
        "convective": False,
        "nonOrthogonalCorrection": True,
        "relativeTolerance": 1e-8,
        "absoluteTolerance": 1e-16,
        "verbose": True,
    }


class FractureModel(GenericScalarModel):
    name = "FractureModel"
    var = "phasefieldvalue"
    diffusivity_vc = "fractureConductivity"
    initial_vc = "initialPhaseFieldValue"
    bc_dirichlet = "specifiedPhaseFieldValue"
    bc_flux = "specifiedPhaseFieldFlux"

    def __init__(self, mesh, partition=None):
        super().__init__(mesh, partition)
        self.vc = FractureVC()

    def _make_options(self):
        return FractureModelOptions()

    def _make_bc(self):
        return FractureBC()

    def _extra_params(self):
        self.params["source"] = self._cell_field(self.vc, "fractureSource")
        self.params["sourcecoef"] = self._cell_field(self.vc, "fractureSourceCoef")

    def set_driving_source(self, source, sourcecoef):
        """Update the elastic driving force fields (e.g. per load step)."""
        self.params["source"] = jnp.asarray(source, self.params["source"].dtype)
        self.params["sourcecoef"] = jnp.asarray(
            sourcecoef, self.params["sourcecoef"].dtype
        )

    def _source_terms(self, mesh, params, state, phi):
        # reference SourceDiscretizationforFracture.h adds
        #   r += V*(1 + source);  diag += V*sourcecoef
        # i.e. the sourcecoef term only damps the delta.  We keep the
        # consistent reaction form (residual includes -V*coef*phi) so the
        # steady state  k lap(d) + (1+source) - coef*d = 0  is well-posed;
        # transiently the linearization is identical.
        V = mesh.cell_volume
        r = V * (1.0 + params["source"] - params["sourcecoef"] * phi)
        diag = V * params["sourcecoef"]
        return diag, r

    def getPhaseFieldValue(self):
        return self.get_field()
