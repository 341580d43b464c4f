"""Well-balanced gravity tests (src_gll tree, SURVEY.md §2.3 rows 43-49).

Oracles (BASELINE.md): hydrostatic equilibria preserved to machine epsilon;
UnsteadyGravity exact solution for convergence; full-vs-diagonal mass option.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dflo_tpu import ic
from dflo_tpu.driver import Solver
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, make_rhs
from dflo_tpu.solver.rk import rk_coeffs, ssp_rk_step, compute_dt
from dflo_tpu.solver.spatial import cell_averages


def linear_potential(x, y):
    return x + y          # IsothermalHydrostatic field (src_gll/ic.cc:109)


def run_steps(solver, u, n, t_end=1e9):
    t = 0.0
    for _ in range(n):
        u, dt, bad, _ = solver._step(u, t, t_end)
        assert not bool(bad)
        t += float(dt)
    return u, t


@pytest.mark.parametrize("p", [1, 2])
def test_isothermal_well_balance(p):
    """rho = rho0 exp(-(x+y)): preserved to ~machine eps over many steps
    (the src_gll scheme's defining property,
    examples/gravity/iso_xing_shu/input_cart.prm)."""
    basis = make_basis("Qk_gll", p)
    mesh = CartesianMesh(16, 16, 0.0, 1.0, 0.0, 1.0)
    # hydrostatic condition grad p = -rho grad(phi): with rho = rho0 e^{-rho0 g (x+y)/p0}
    # and g = 1, phi = x + y (examples/gravity/iso_xing_shu/input_cart.prm)
    pot = linear_potential
    out = BoundarySide(euler.BC_OUTFLOW)
    bcs = dict(W=out, E=out, S=out, N=out)
    s = Solver(basis, mesh, bcs, flux="lxf", cfl=0.5,
               well_balanced="isothermal", potential=pot)
    u0 = ic.set_initial_condition(basis, mesh, ic.isothermal_hydrostatic())
    u, t = run_steps(s, u0, 25)
    drift = float(jnp.abs(u - u0).max())
    assert drift < 5e-13, drift


def test_isothermal_not_balanced_without_scheme():
    """Sanity: the same run with the naive pointwise gravity source is NOT
    machine-exact — the well-balanced discretization is doing real work."""
    basis = make_basis("Qk_gll", 1)
    mesh = CartesianMesh(16, 16, 0.0, 1.0, 0.0, 1.0)
    out = BoundarySide(euler.BC_OUTFLOW)
    bcs = dict(W=out, E=out, S=out, N=out)

    def naive_source(x, y, t, W):
        # -rho grad(phi) with phi = 1.21(x+y)
        gx = gy = -1.21
        return euler.forcing_external(W, jnp.full_like(x, gx),
                                      jnp.full_like(x, gy))

    s = Solver(basis, mesh, bcs, flux="lxf", cfl=0.5, source=naive_source)
    u0 = ic.set_initial_condition(basis, mesh, ic.isothermal_hydrostatic())
    u, t = run_steps(s, u0, 25)
    drift = float(jnp.abs(u - u0).max())
    assert drift > 1e-8, drift


def test_polytropic_well_balance():
    """Polytropic equilibrium with phi = y preserved to machine eps
    (src_gll/assemble_explicit.cc:138-230,
    examples/gravity/polytropic/input.prm)."""
    basis = make_basis("Qk_gll", 2)
    mesh = CartesianMesh(12, 12, 0.0, 1.0, 0.0, 1.0)
    out = BoundarySide(euler.BC_OUTFLOW)
    bcs = dict(W=out, E=out, S=out, N=out)
    s = Solver(basis, mesh, bcs, flux="lxf", cfl=0.5,
               well_balanced="polytropic", potential=lambda x, y: y,
               polytropic_nu=1.2)
    u0 = ic.set_initial_condition(basis, mesh, ic.polytropic_hydrostatic(1.2))
    u, t = run_steps(s, u0, 25)
    drift = float(jnp.abs(u - u0).max())
    assert drift < 5e-13, drift


def test_unsteady_gravity_convergence():
    """UnsteadyGravity exact solution (src_gll/ic.cc:128-146): L2 error
    converges under refinement with the well-balanced isothermal source and
    periodic-free Dirichlet-style farfield BCs."""
    exact = ic.unsteady_gravity()
    errs = []
    for n in (12, 24):
        basis = make_basis("Qk_gll", 1)
        mesh = CartesianMesh(n, n, 0.0, 2.0, 0.0, 2.0)
        far = BoundarySide(euler.BC_FARFIELD,
                           lambda x, y, t: exact(x, y, t))
        bcs = dict(W=far, E=far, S=far, N=far)
        s = Solver(basis, mesh, bcs, flux="lxf", cfl=0.3,
                   well_balanced="isothermal", potential=lambda x, y: x + y)
        u = ic.set_initial_condition(basis, mesh, exact)
        t, T = 0.0, 0.1
        while t < T - 1e-12:
            dt = min(float(compute_dt(cell_averages(basis, u), mesh, 1, 0.3)),
                     T - t)
            u, _, _, _ = s._step(u, t, jnp.asarray(T))
            t += dt
        errs.append(float(ic.l2_error(basis, mesh, u, exact, t=t)[euler.RHO]))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.5, (errs, rate)


def test_full_mass_matrix_matches_on_smooth():
    """GLL `mass matrix = full` (consistent) vs diagonal (lumped): both
    converge; on a smooth vortex they agree to discretization order
    (src_gll/parameters.cc:342, src_gll/claw.cc:754-770)."""
    basis = make_basis("Qk_gll", 2)
    mesh = CartesianMesh(16, 16, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    vort = ic.isentropic_vortex_steady()
    u0 = ic.set_initial_condition(basis, mesh, vort)

    outs = {}
    for mm in ("diagonal", "full"):
        rhs = make_rhs(basis, mesh, bcs, flux="roe", mass_matrix=mm)
        ark, st = rk_coeffs("rk3")
        u = u0
        for _ in range(5):
            dt = compute_dt(cell_averages(basis, u), mesh, 2, 0.4)
            u = ssp_rk_step(rhs, u, 0.0, dt, ark, st)
        outs[mm] = np.array(u)
    diff = np.abs(outs["full"] - outs["diagonal"]).max()
    assert 0.0 < diff < 0.05          # different schemes, same smooth solution
    for mm in outs:
        err = float(ic.l2_error(basis, mesh, jnp.asarray(outs[mm]), vort)[euler.RHO])
        assert err < 1e-3, (mm, err)
