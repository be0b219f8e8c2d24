"""KeModel: decaying homogeneous turbulence vs the exact ODE solution.

dk/dt = -eps, deps/dt = -C2 eps^2/k has the closed-form decay
k(t) = k0 (1 + (C2-1) (e0/k0) t)^(-1/(C2-1)).
"""

import numpy as np
import pytest

import fvm_tpu as fvm
from fvm_tpu.mesh.generate import quad_2d
from fvm_tpu.models.ke import KeModel, C2


def test_decaying_turbulence():
    dm = fvm.mesh.build_device_mesh(quad_2d(4, 4))
    m = KeModel(dm)
    m.options["verbose"] = False
    m.options["transient"] = True
    dt = 0.002
    m.options["timeStep"] = dt
    k0, e0 = 1.0, 2.0
    m.vc["initialK"] = k0
    m.vc["initialE"] = e0
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "Symmetry"
    m.init()
    nsteps = 50
    for _ in range(nsteps):
        m.advance(4)
        m.updateTime()
    t = nsteps * dt
    k_exact = k0 * (1 + (C2 - 1) * (e0 / k0) * t) ** (-1 / (C2 - 1))
    k = m.getK()
    np.testing.assert_allclose(k, k_exact, rtol=2e-2)
    # field stays uniform (no spurious gradients)
    assert k.std() < 1e-8 * k.mean()


def test_ke_with_shear_production():
    """Uniform shear flow: P = mu_t * S^2 > 0 drives k above its decaying
    value."""
    dm = fvm.mesh.build_device_mesh(quad_2d(4, 4))
    m = KeModel(dm)
    m.options["verbose"] = False
    m.options["transient"] = True
    m.options["timeStep"] = 0.002
    m.vc["initialK"] = 1.0
    m.vc["initialE"] = 2.0
    for s in ("left", "right", "bottom", "top"):
        m.bc[s].bc_type = "Symmetry"
    m.init()
    # impose linear shear u = (y, 0)
    import jax.numpy as jnp

    cc = dm.cell_centroid
    V = jnp.stack([cc[:, 1], jnp.zeros_like(cc[:, 0])], axis=1)
    m.set_flow_state(velocity=V)
    for _ in range(20):
        m.advance(3)
        m.updateTime()
    k_sheared = m.getK().mean()

    m2 = KeModel(dm)
    m2.options["verbose"] = False
    m2.options["transient"] = True
    m2.options["timeStep"] = 0.002
    m2.vc["initialK"] = 1.0
    m2.vc["initialE"] = 2.0
    for s in ("left", "right", "bottom", "top"):
        m2.bc[s].bc_type = "Symmetry"
    m2.init()
    for _ in range(20):
        m2.advance(3)
        m2.updateTime()
    assert k_sheared > m2.getK().mean()
    assert m.getTurbulentViscosity().min() > 0


def test_wall_functions_equilibrium():
    """Sheared near-wall flow: wall functions keep k/eps positive and the
    wall-cell dissipation matches eps_w = Cmu^0.75 k^1.5/(kappa y)."""
    import jax.numpy as jnp
    from fvm_tpu.models.ke import CMU, KAPPA

    dm = fvm.mesh.build_device_mesh(quad_2d(4, 16))
    m = KeModel(dm)
    m.options["verbose"] = False
    m.options["transient"] = True
    m.options["timeStep"] = 0.01
    m.vc["initialK"] = 0.1
    m.vc["initialE"] = 0.3
    m.vc["viscosity"] = 1e-4
    m.bc["bottom"].bc_type = "Wall"
    m.bc["top"].bc_type = "SpecifiedKE"
    m.bc["top"]["specifiedK"] = 0.1
    m.bc["top"]["specifiedE"] = 0.3
    m.bc["left"].bc_type = "Symmetry"
    m.bc["right"].bc_type = "Symmetry"
    m.init()
    cc = dm.cell_centroid
    V = jnp.stack([cc[:, 1] * 2.0, jnp.zeros(dm.n_cells)], axis=1)
    m.set_flow_state(velocity=V)
    for _ in range(10):
        m.advance(3)
        m.updateTime()
    k = m.getK()
    e = m.getEpsilon()
    assert (k > 0).all() and (e > 0).all()
    wall = np.asarray(m.params["wall_mask"])[: dm.n_interior_cells]
    y = np.asarray(m.params["wall_dist"])[: dm.n_interior_cells]
    e_wall_expect = CMU**0.75 * k[wall] ** 1.5 / (KAPPA * y[wall])
    np.testing.assert_allclose(e[wall], e_wall_expect, rtol=1e-4)
    muw = m.getWallViscosity("bottom")
    assert (muw > 0).all()
