"""Curvilinear block tests (the reference's `mapping = q1` capability):
free-stream preservation on a wavy mesh (discrete metric identities), vortex
convergence under mesh distortion, annulus wall equilibrium, Cartesian-limit
equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflo_tpu import ic
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.mesh.curvilinear import (CurvilinearMesh, annulus_mesh,
                                       wavy_mesh)
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.rk import rk_coeffs, ssp_rk_step
from dflo_tpu.solver.spatial import BoundarySide, make_rhs
from dflo_tpu.solver.spatial_curvi import (compute_dt_curvilinear,
                                           make_rhs_curvilinear)

# integration/e2e tier: minutes of CPU emulation; the quick dev tier
# skips this file (pytest.ini 'heavy'); the full suite runs it
pytestmark = pytest.mark.heavy

PER = BoundarySide(euler.BC_PERIODIC)


def const_state(x, y, t=0.0):
    return jnp.stack([jnp.full_like(x, 0.3), jnp.full_like(x, -0.2),
                      jnp.full_like(x, 1.1), jnp.full_like(x, 3.0)])


@pytest.mark.parametrize("p", [1, 2, 3])
@pytest.mark.parametrize("flux", ["lxf", "hllc", "roe"])
def test_free_stream_on_wavy_mesh(p, flux):
    """Discrete metric identities: constant states are exact steady states
    on arbitrarily distorted bilinear meshes."""
    basis = make_basis("Qk", p)
    mesh = wavy_mesh(10, 8, 0.0, 2.0, 0.0, 1.0, amp=0.08)
    out = BoundarySide(euler.BC_OUTFLOW)
    rhs = make_rhs_curvilinear(basis, mesh,
                               dict(W=out, E=out, S=out, N=out), flux=flux)
    u = ic.set_initial_condition(basis, mesh, const_state)
    r = rhs(u, 0.0)
    assert float(jnp.abs(r).max()) < 1e-12


def test_matches_cartesian_limit():
    """On an undistorted grid the curvilinear residual equals the Cartesian
    one to roundoff."""
    basis = make_basis("Qk", 2)
    cart = CartesianMesh(12, 8, 0.0, 3.0, 0.0, 2.0)
    xs = np.linspace(0.0, 3.0, 13)
    ys = np.linspace(0.0, 2.0, 9)
    XX, YY = np.meshgrid(xs, ys)
    curv = CurvilinearMesh(XX, YY)
    bcs = dict(W=PER, E=PER, S=PER, N=PER)
    rhs_c = make_rhs(basis, cart, bcs, flux="hllc")
    rhs_k = make_rhs_curvilinear(basis, curv, bcs, flux="hllc")
    u = ic.set_initial_condition(basis, cart, ic.isentropic_vortex(5.0, 1.5, 1.0))
    r1 = np.array(rhs_c(u, 0.0))
    r2 = np.array(rhs_k(u, 0.0))
    np.testing.assert_allclose(r2, r1, rtol=1e-10, atol=1e-10)


def test_vortex_convergence_on_wavy_mesh():
    """Design-order-ish convergence survives smooth mesh distortion."""
    vort = ic.isentropic_vortex_steady()
    errs = []
    for n in (16, 32):
        basis = make_basis("Qk", 2)
        mesh = wavy_mesh(n, n, -5.0, 5.0, -5.0, 5.0, amp=0.03)
        far = BoundarySide(euler.BC_FARFIELD, lambda x, y, t: vort(x, y))
        rhs = make_rhs_curvilinear(basis, mesh,
                                   dict(W=far, E=far, S=far, N=far), flux="roe")
        u = ic.set_initial_condition(basis, mesh, vort)
        ark, st = rk_coeffs("rk3")
        step = jax.jit(lambda u, dt: ssp_rk_step(rhs, u, 0.0, dt, ark, st))
        t, T = 0.0, 0.25
        while t < T - 1e-12:
            dt = float(compute_dt_curvilinear(rhs.cell_averages(u), mesh, 2, 0.4))
            dt = min(dt, T - t)
            u = step(u, dt)
            t += dt
        # L2 error with metric weights via nodal values
        xq, yq = mesh.point_coords(basis.nodes)
        ue = vort(jnp.asarray(xq), jnp.asarray(yq))
        err = float(jnp.sqrt(jnp.mean((u - ue) ** 2)))
        errs.append(err)
    rate = np.log2(errs[0] / errs[1])
    assert rate > 2.3, (errs, rate)


def test_annulus_slip_walls_hold_rotation():
    """Rigidly-rotating isentropic flow in an annulus with slip walls:
    no blow-up, near-zero radial mass flux at the walls after steps."""
    basis = make_basis("Qk", 2)
    mesh = annulus_mesh(0.5, 1.0, 8, 64)
    slip = BoundarySide(euler.BC_SLIP)
    bcs = dict(W=PER, E=PER, S=slip, N=slip)
    rhs = make_rhs_curvilinear(basis, mesh, bcs, flux="hllc")

    def rotating(x, y, t=0.0):
        # solid-body rotation omega=1: v = (-y, x); p from radial balance
        r2 = x * x + y * y
        rho = jnp.ones_like(x)
        p = 1.0 + 0.5 * r2
        return jnp.stack([-y * rho, x * rho, rho,
                          p / (euler.GAMMA - 1.0) + 0.5 * rho * r2])

    u = ic.set_initial_condition(basis, mesh, rotating)
    ark, st = rk_coeffs("rk3")
    step = jax.jit(lambda u, dt: ssp_rk_step(rhs, u, 0.0, dt, ark, st))
    for _ in range(20):
        dt = float(compute_dt_curvilinear(rhs.cell_averages(u), mesh, 2, 0.4))
        u = step(u, dt)
    assert np.isfinite(np.array(u)).all()
    ub = rhs.cell_averages(u)
    # radial velocity of inner/outer rings stays small
    xc, yc = mesh.cell_centers()
    r = np.hypot(xc, yc)
    vr = (np.array(ub[euler.MX]) * xc + np.array(ub[euler.MY]) * yc) \
        / (np.array(ub[euler.RHO]) * r)
    assert np.abs(vr[0]).max() < 0.02 and np.abs(vr[-1]).max() < 0.02
