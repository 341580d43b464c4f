"""mu_shock artificial-viscosity diagnostic (src/mu_shock.cc)."""

import jax.numpy as jnp
import numpy as np

from dflo_tpu import ic
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import cell_averages
from dflo_tpu.stab.mushock import make_laplacian_diffusion, make_mu_shock


def test_mu_shock_zero_on_constant_positive_at_jump():
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(32, 4, 0.0, 1.0, 0.0, 0.125)
    mu_fn = make_mu_shock(basis, mesh, diffusion_coef=1.0)

    const = lambda x, y, t=0.0: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    u = ic.set_initial_condition(basis, mesh, const)
    mu = np.array(mu_fn(u, cell_averages(basis, u)))
    np.testing.assert_allclose(mu, 0.0, atol=1e-13)

    def jumpy(x, y, t=0.0):
        rho = jnp.where(x <= 0.51, 1.0, 0.125)
        E = jnp.where(x <= 0.51, 2.5, 0.25)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, E])

    u2 = ic.set_initial_condition(basis, mesh, jumpy)
    mu2 = np.array(mu_fn(u2, cell_averages(basis, u2)))
    assert mu2[:, 15:18].max() > 10 * max(mu2[:, :8].max(), 1e-30)
    assert (mu2 >= -1e-12).all()   # entropy jump product is sign-definite


def test_laplacian_diffusion_damps_oscillation():
    """The opt-in IP application: viscosity drives an oscillatory mode toward
    its mean (negative-semidefinite operator)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(8, 8, 0.0, 1.0, 0.0, 1.0)
    diff = make_laplacian_diffusion(basis, mesh)
    osc = lambda x, y, t=0.0: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x),
         1.0 + 0.1 * jnp.sin(8 * jnp.pi * x), jnp.full_like(x, 2.5)])
    u = ic.set_initial_condition(basis, mesh, osc)
    mu = jnp.full((8, 8), 1e-3)
    R = diff(u, mu)
    # the diffusion residual opposes the in-cell density deviation
    dev = u[euler.RHO] - cell_averages(basis, u)[euler.RHO][None]
    corr = float(jnp.sum(R[euler.RHO] * dev))
    assert corr < 0.0


def test_mu_shock_boundary_ghost_jumps():
    """With `bcs`, boundary faces evaluate compute_Wminus ghost states
    (shock_boundary_term, src/mu_shock.cc:120-190): a slip wall seen by
    wall-tangential flow and an outflow side produce zero boundary jump,
    while an inflow side whose prescribed state mismatches the interior
    produces a positive jump confined to the inflow cell column."""
    from dflo_tpu.solver.spatial import BoundarySide

    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(16, 8, 0.0, 1.0, 0.0, 0.5)

    # uniform x-flow: tangential to S/N slip walls
    state = np.array([0.5, 0.0, 1.0, 2.5 + 0.5 * 0.25])
    uniform = lambda x, y, t=0.0: jnp.stack(  # noqa: E731
        [jnp.full_like(x, state[0]), jnp.full_like(x, state[1]),
         jnp.full_like(x, state[2]), jnp.full_like(x, state[3])])
    u = ic.set_initial_condition(basis, mesh, uniform)

    match_in = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, state[0]), jnp.full_like(x, state[1]),
         jnp.full_like(x, state[2]), jnp.full_like(x, state[3])])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, match_in),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    mu_fn = make_mu_shock(basis, mesh, 1.0, bcs=bcs)
    mu = np.array(mu_fn(u, cell_averages(basis, u)))
    np.testing.assert_allclose(mu, 0.0, atol=1e-12)

    # mismatched inflow: jump only in the west column
    cold = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x),
         jnp.full_like(x, 4.0), jnp.full_like(x, 10.0)])
    bcs2 = dict(bcs, W=BoundarySide(euler.BC_INFLOW, cold))
    mu2 = np.array(make_mu_shock(basis, mesh, 1.0, bcs=bcs2)(
        u, cell_averages(basis, u)))
    assert mu2[:, 0].min() > 0.0
    np.testing.assert_allclose(mu2[:, 1:], 0.0, atol=1e-12)
