"""End-to-end solver tests: the reference's validation methodology as pytest
(SURVEY.md §4): free-stream preservation, conservation under periodic BCs, and
L2 convergence at design order on the isentropic vortex
(examples/isentropic_vortex, error harness src_gll/claw.cc:1190-1246)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflo_tpu import ic
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.rk import (compute_dt, default_scheme, rk_coeffs,
                                ssp_rk_step)
from dflo_tpu.solver.spatial import BoundarySide, cell_averages, make_rhs

PER = BoundarySide(euler.BC_PERIODIC)
PER_BCS = dict(W=PER, E=PER, S=PER, N=PER)


def run_to(basis, mesh, bcs, u, T, cfl=0.4, flux="lxf"):
    rhs = make_rhs(basis, mesh, bcs, flux=flux)
    ark, st = rk_coeffs(default_scheme(basis.degree))
    step = jax.jit(lambda u, t, dt: ssp_rk_step(rhs, u, t, dt, ark, st))
    t = 0.0
    while t < T - 1e-12:
        dt = float(compute_dt(cell_averages(basis, u), mesh, basis.degree, cfl))
        dt = min(dt, T - t)
        u = step(u, t, dt)
        t += dt
    return u


@pytest.mark.parametrize("family", ["Qk", "Qk_gll", "Pk"])
@pytest.mark.parametrize("flux", ["lxf", "roe", "hllc", "kfvs", "sw", "kep"])
def test_free_stream_preservation(family, flux):
    """A constant state must be an exact discrete steady state for every flux."""
    basis = make_basis(family, 2)
    mesh = CartesianMesh(8, 6, -1.0, 1.0, 0.0, 1.0)
    rhs = make_rhs(basis, mesh, PER_BCS, flux=flux)
    const = lambda x, y, t=0.0: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 0.3), jnp.full_like(x, -0.2),
         jnp.full_like(x, 1.1), jnp.full_like(x, 3.0)])
    u = ic.set_initial_condition(basis, mesh, const)
    r = rhs(u, 0.0)
    assert float(jnp.abs(r).max()) < 1e-12


@pytest.mark.parametrize("family", ["Qk", "Pk"])
def test_conservation_periodic(family):
    """Total mass/momentum/energy exactly conserved on a periodic domain."""
    basis = make_basis(family, 2)
    mesh = CartesianMesh(16, 16, -5.0, 5.0, -5.0, 5.0)
    u = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())
    m0 = np.array(cell_averages(basis, u).sum(axis=(1, 2)))
    u = run_to(basis, mesh, PER_BCS, u, T=0.2)
    m1 = np.array(cell_averages(basis, u).sum(axis=(1, 2)))
    np.testing.assert_allclose(m1, m0, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("family,p,min_rate", [
    ("Qk", 1, 1.8), ("Qk", 2, 2.5), ("Qk", 3, 3.6),
    ("Pk", 1, 1.8), ("Pk", 2, 2.5),
    ("Qk_gll", 2, 2.5),
])
def test_vortex_convergence(family, p, min_rate):
    """L2 error on the steady vortex converges at >= design-order-ish rate
    between successive refinements (BASELINE.md parity metric)."""
    vort = ic.isentropic_vortex_steady()
    errs = []
    for n in (16, 32):
        basis = make_basis(family, p)
        mesh = CartesianMesh(n, n, -5.0, 5.0, -5.0, 5.0)
        u = ic.set_initial_condition(basis, mesh, vort)
        u = run_to(basis, mesh, PER_BCS, u, T=0.25)
        errs.append(float(ic.l2_error(basis, mesh, u, vort)[euler.RHO]))
    rate = np.log2(errs[0] / errs[1])
    assert rate > min_rate, (errs, rate)


def test_steady_vortex_residual_small():
    """The corrected vortex is a near-exact steady state: residual -> 0 with h."""
    vort = ic.isentropic_vortex_steady()
    norms = []
    for n in (16, 32):
        basis = make_basis("Qk", 2)
        mesh = CartesianMesh(n, n, -5.0, 5.0, -5.0, 5.0)
        rhs = make_rhs(basis, mesh, PER_BCS, flux="roe")
        u = ic.set_initial_condition(basis, mesh, vort)
        norms.append(float(jnp.abs(rhs(u, 0.0)).max()))
    assert norms[1] < 0.5 * norms[0]
