"""minmax limiter + u2/residual indicator variants
(src_mpi/limiter.cc:397-555, src/indicator.cc:34-46,
src_gll/indicator.cc:40-62)."""

import jax.numpy as jnp
import numpy as np
import pytest

import riemann_exact
from dflo_tpu import ic
from dflo_tpu.driver import LimiterConfig, Solver
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, cell_averages, make_rhs
from dflo_tpu.stab.indicator import make_shock_indicator
from dflo_tpu.stab.limiter import make_minmax_limiter


def sod_setup(limiter_type, char_lim=True, indicator="limiter"):
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(100, 4, 0.0, 1.0, 0.0, 0.04)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type=limiter_type, shock_indicator=indicator,
                        beta=2.0, char_lim=char_lim)
    s = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.9)

    def sod(x, y, t=0.0):
        rho = jnp.where(x <= 0.5, 1.0, 0.125)
        E = jnp.where(x <= 0.5, 2.5, 0.25)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, E])

    return basis, mesh, s, ic.set_initial_condition(basis, mesh, sod)


@pytest.mark.parametrize("char_lim", [False, True])
def test_minmax_limiter_sod(char_lim):
    """Sod with the Barth-Jespersen minmax limiter: near-monotone profile,
    exact-solution agreement (the src_mpi tree's `type = minmax`)."""
    basis, mesh, s, u = sod_setup("minmax", char_lim=char_lim)
    u, t, it = s.run(u, 0.2)
    rho = np.array(s.cell_averages(u))[euler.RHO].mean(axis=0)
    xc = mesh.cell_centers()[0][0]
    rex, _, _ = riemann_exact.sample((xc - 0.5) / t, 1.0, 0.0, 1.0,
                                     0.125, 0.0, 0.1)
    assert np.abs(rho - rex).mean() < 0.008
    assert rho.min() > 0.12 and rho.max() < 1.01


def test_minmax_preserves_linear_data():
    """Barth-Jespersen is exact on smooth monotone data: a globally linear
    density field must pass through untouched (theta = 1)."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(8, 8, 0.0, 1.0, 0.0, 1.0)
    lim = make_minmax_limiter(basis, mesh)

    def lin(x, y, t=0.0):
        return jnp.stack([0.1 * jnp.ones_like(x), jnp.zeros_like(x),
                          1.0 + 0.2 * x + 0.1 * y, jnp.full_like(x, 3.0)])

    u = ic.set_initial_condition(basis, mesh, lin)
    ubar = cell_averages(basis, u)
    marked = jnp.full((8, 8), 1e20)
    v = lim(u, ubar, marked)
    # interior cells untouched (boundary cells clip like the reference: the
    # theta loop visits all 4 faces but min/max only sees existing neighbors)
    np.testing.assert_allclose(np.array(v)[..., 1:-1, 1:-1],
                               np.array(u)[..., 1:-1, 1:-1], atol=1e-12)


def test_u2_indicator_marks_kinks():
    """u2 marks cells around a slope discontinuity, not smooth regions."""
    basis = make_basis("Pk", 2)
    mesh = CartesianMesh(32, 4, 0.0, 1.0, 0.0, 0.125)

    def kinked(x, y, t=0.0):
        # kink at x = 0.515625, inside cell 16 (a kink exactly on a cell edge
        # projects to piecewise-linear data with zero curvature everywhere)
        rho = 1.0 + jnp.abs(x - 0.515625)
        return jnp.stack([jnp.zeros_like(x), jnp.zeros_like(x), rho,
                          jnp.full_like(x, 3.0)])

    u = ic.set_initial_condition(basis, mesh, kinked)
    ind = make_shock_indicator(basis, mesh, "u2")
    shock, _ = ind(u, cell_averages(basis, u))
    shock = np.array(shock)
    assert (shock[:, 15:18] > 1.0).any()     # kink cells marked
    assert (shock[:, 2:8] <= 1.0).all()      # smooth (linear) region clean


def test_residual_indicator_zero_on_equilibrium():
    """Residual indicator (src_gll): zero on a constant state, marks where
    the residual is nonzero."""
    basis = make_basis("Qk_gll", 1)
    mesh = CartesianMesh(8, 8, 0.0, 1.0, 0.0, 1.0)
    per = BoundarySide(euler.BC_PERIODIC)
    rhs = make_rhs(basis, mesh, dict(W=per, E=per, S=per, N=per))
    ind = make_shock_indicator(basis, mesh, "residual", per_x=True,
                               per_y=True, rhs=rhs)
    const = lambda x, y, t=0.0: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    u = ic.set_initial_condition(basis, mesh, const)
    shock, _ = ind(u, cell_averages(basis, u))
    assert (np.array(shock) == 0.0).all()
    u2 = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex(5.0, 0.5, 0.5))
    shock2, _ = ind(u2, cell_averages(basis, u2))
    assert (np.array(shock2) > 1.0).any()
