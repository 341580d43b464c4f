"""MOOD cascade tests (src/mood.cc, iterate_mood src/claw.cc:777-871).

Oracles: smooth flows keep full order (no reduction fires); shocked flows
satisfy the DMP on density averages; the cascade + marked-cell TVB limiting
gives an essentially monotone Sod profile."""

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
from dflo_tpu.stab.mood import make_mood, neighborhood_max, neighborhood_min


def test_mood_requires_pk():
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(4, 4, 0.0, 1.0, 0.0, 1.0)
    per = BoundarySide(euler.BC_PERIODIC)
    rhs = make_rhs(basis, mesh, dict(W=per, E=per, S=per, N=per))
    with pytest.raises(ValueError, match="Pk"):
        make_mood(basis, mesh, rhs)


def test_mood_inactive_on_smooth_flow():
    """On a weak smooth vortex no cell violates the DMP (undershoots at the
    extremum are far below the 1e-6 tolerance): the MOOD candidate equals the
    plain forward-Euler update and nothing is marked.  (A strong vortex on a
    coarse grid legitimately trips the DMP at the core and cascades, exactly
    as the reference would.)"""
    basis = make_basis("Pk", 2)
    mesh = CartesianMesh(24, 24, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    rhs = make_rhs(basis, mesh, bcs, flux="lxf")
    mood = make_mood(basis, mesh, rhs, per_x=True, per_y=True)
    u = ic.set_initial_condition(basis, mesh,
                                 ic.isentropic_vortex_steady(beta=0.5))
    dt = 1e-3
    u_c, marked = mood(u, 0.0, dt)
    u_plain = u + dt * rhs(u, 0.0)
    np.testing.assert_allclose(np.array(u_c), np.array(u_plain),
                               rtol=1e-12, atol=1e-12)
    assert not bool(jnp.any(marked))


def test_mood_cascades_at_unresolved_extremum():
    """A strong vortex on a coarse grid: the core cells violate the DMP, the
    cascade reduces their degree, and the accepted candidate differs from the
    unlimited update only near the core (src/mood.cc:314-340 behavior)."""
    basis = make_basis("Pk", 2)
    mesh = CartesianMesh(24, 24, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    rhs = make_rhs(basis, mesh, dict(W=per, E=per, S=per, N=per), flux="lxf")
    mood = make_mood(basis, mesh, rhs, per_x=True, per_y=True)
    u = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex_steady())
    u_c, marked = mood(u, 0.0, 1e-3)
    u_plain = u + 1e-3 * rhs(u, 0.0)
    diff = np.abs(np.array(u_c - u_plain)).max(axis=(0, 1))
    assert diff[11:13, 11:13].max() > 1e-4          # core was reduced
    assert diff[:6, :].max() < 1e-12                # far field untouched


def test_mood_sod_dmp_and_profile():
    """examples/sod_shock_tube run with `method = mood`: density averages
    respect the neighborhood DMP and match the exact solution."""
    basis = make_basis("Pk", 2)
    mesh = CartesianMesh(100, 4, 0.0, 1.0, 0.0, 0.04)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", shock_indicator="limiter", beta=2.0,
                        char_lim=True, pos_lim=True)
    s = Solver(basis, mesh, bcs, flux="lxf", limiter=lim, cfl=0.5,
               method="mood")

    def sod(x, y, t=0.0):
        rho = jnp.where(x <= 0.5, 1.0, 0.125)
        E = jnp.where(x <= 0.5, 2.5, 0.25)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, E])

    u = ic.set_initial_condition(basis, mesh, sod)
    u, t, it = s.run(u, 0.2)
    rho = np.array(s.cell_averages(u))[euler.RHO].mean(axis=0)
    xc = mesh.cell_centers()[0][0]
    rex, _, _ = riemann_exact.sample((xc - 0.5) / t, 1.0, 0.0, 1.0,
                                     0.125, 0.0, 0.1)
    assert np.abs(rho - rex).mean() < 0.01
    assert rho.min() > 0.12 and rho.max() < 1.02


def test_neighborhood_minmax_edges():
    from dflo_tpu.stab.limiter import neighbor_valid
    a = jnp.asarray(np.arange(12.0).reshape(3, 4))
    valid = tuple(jnp.asarray(v) for v in neighbor_valid((3, 4), False, False))
    mn = np.array(neighborhood_min(a, valid))
    mx = np.array(neighborhood_max(a, valid))
    assert mn[0, 0] == 0.0 and mx[0, 0] == 4.0      # corner: self, E, N
    assert mn[1, 1] == 1.0 and mx[1, 1] == 9.0      # interior 5-point
