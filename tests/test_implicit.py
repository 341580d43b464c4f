"""Matrix-free implicit (Newton-Krylov) tests — the TPU replacement for the
Sacado/Trilinos path (src/assemble_implicit.cc, src/claw.cc:649-720,876-933).

Oracles: backward Euler stable far beyond the explicit CFL; accuracy vs an
explicit reference solution; pseudo-transient steady convergence with CFL
ramping (the naca0012 workflow, examples/naca0012/m063.prm)."""

import jax
import jax.numpy as jnp
import numpy as np

from dflo_tpu import ic
from dflo_tpu.driver import Solver
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.implicit import make_implicit_step, run_steady
from dflo_tpu.solver.spatial import BoundarySide, cell_averages, make_rhs
from dflo_tpu.solver.rk import compute_dt
import pytest

# interpret-mode/virtual-device emulation dominates CPU wall time: the
# quick dev tier skips this file (pytest.ini 'heavy'); the full suite runs it
pytestmark = pytest.mark.heavy

PER = BoundarySide(euler.BC_PERIODIC)
PER_BCS = dict(W=PER, E=PER, S=PER, N=PER)


def test_backward_euler_stable_beyond_explicit_cfl():
    """Implicit step with dt = 20x the explicit CFL limit stays stable and
    accurate on the smooth vortex."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(24, 24, -5.0, 5.0, -5.0, 5.0)
    rhs = make_rhs(basis, mesh, PER_BCS, flux="roe")
    vort = ic.isentropic_vortex_steady()
    u = ic.set_initial_condition(basis, mesh, vort)
    dt_exp = float(compute_dt(cell_averages(basis, u), mesh, 1, 1.0))

    step = jax.jit(make_implicit_step(rhs, theta=1.0, max_newton=3,
                                      lin_tol=1e-6, gmres_maxiter=40))
    dt = 20.0 * dt_exp
    t = 0.0
    for _ in range(4):
        u, res = step(u, t, dt)
        t += dt
    assert np.isfinite(np.array(u)).all()
    err = float(ic.l2_error(basis, mesh, u, vort)[euler.RHO])
    assert err < 5e-3, err       # steady solution: BE should hold it well


def test_theta_midpoint_more_accurate_than_be():
    """theta = 0.5 (midpoint, src/assemble_implicit.cc:125-135) beats
    backward Euler at the same dt on an unsteady smooth flow."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(24, 24, -5.0, 5.0, -5.0, 5.0)
    rhs = make_rhs(basis, mesh, PER_BCS, flux="roe")
    # reference-parity (non-steady) vortex => genuinely time-dependent field
    vort = ic.isentropic_vortex()
    u0 = ic.set_initial_condition(basis, mesh, vort)
    dt_exp = float(compute_dt(cell_averages(basis, u0), mesh, 1, 1.0))

    # explicit fine-step reference
    from dflo_tpu.solver.rk import rk_coeffs, ssp_rk_step
    ark, st = rk_coeffs("rk3")
    uref = u0
    T = 8 * dt_exp
    nref = 16
    for _ in range(nref):
        uref = ssp_rk_step(rhs, uref, 0.0, T / nref, ark, st)

    errs = {}
    for theta in (1.0, 0.5):
        step = jax.jit(make_implicit_step(rhs, theta=theta, max_newton=4,
                                          lin_tol=1e-8, gmres_maxiter=50))
        u = u0
        for i in range(2):
            u, _ = step(u, i * T / 2, T / 2)
        errs[theta] = float(jnp.sqrt(jnp.mean((u - uref) ** 2)))
    assert errs[0.5] < 0.5 * errs[1.0], errs


def test_pseudo_transient_steady_convergence():
    """Freestream + perturbation: local-dt backward-Euler pseudo-transient
    with CFL ramping drives the residual down by many orders
    (the naca0012 m063.prm workflow)."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(16, 16, 0.0, 1.0, 0.0, 1.0)
    far = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 0.5), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.6)])
    bcs = dict(W=BoundarySide(euler.BC_FARFIELD, far),
               E=BoundarySide(euler.BC_FARFIELD, far),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    s = Solver(basis, mesh, bcs, flux="roe", cfl=5.0, method="implicit",
               max_nonlin_iter=2, linear_residual=1e-6)

    def perturbed(x, y, t=0.0):
        bump = 0.05 * jnp.exp(-50 * ((x - 0.5) ** 2 + (y - 0.5) ** 2))
        return jnp.stack([0.5 + bump, bump, 1.0 + bump,
                          jnp.full_like(x, 2.6)])

    u = ic.set_initial_condition(basis, mesh, perturbed)
    u, hist = run_steady(s, u, cfl0=5.0, min_residual=1e-9, max_steps=200)
    assert hist[-1] < 1e-9 or hist[-1] < hist[0] * 1e-6, \
        (hist[0], hist[-1], len(hist))
    # converged state is uniform freestream
    ub = np.array(s.cell_averages(u))
    assert np.abs(ub[euler.RHO] - 1.0).max() < 1e-6


def test_block_jacobi_preconditioner_accelerates_stiff_solve():
    """Exact per-cell diagonal-block preconditioning (the matrix-free analog
    of the reference's BlockSSOR, src/claw.cc:666-691) reduces the residual
    substantially faster at a fixed Krylov budget on a stiff (50x explicit
    CFL) backward-Euler system."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(12, 12, 0.0, 1.0, 0.0, 1.0)
    far = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 0.5), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.6)])
    bcs = dict(W=BoundarySide(euler.BC_FARFIELD, far),
               E=BoundarySide(euler.BC_FARFIELD, far),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    rhs = make_rhs(basis, mesh, bcs, flux="roe")

    def pert(x, y, t=0.0):
        b = 0.05 * jnp.exp(-50 * ((x - 0.5) ** 2 + (y - 0.5) ** 2))
        return jnp.stack([0.5 + b, b, 1.0 + b, jnp.full_like(x, 2.6)])

    u0 = ic.set_initial_condition(basis, mesh, pert)
    dt = 50.0 * float(compute_dt(cell_averages(basis, u0), mesh, 1, 1.0))

    out = {}
    for pc in (None, "block_jacobi"):
        step = jax.jit(make_implicit_step(
            rhs, theta=1.0, max_newton=1, lin_tol=1e-8,
            gmres_restart=10, gmres_maxiter=1, precondition=pc))
        u = u0
        for _ in range(6):
            u, _ = step(u, 0.0, dt)
        out[pc] = float(jnp.sqrt(jnp.sum(rhs(u, 0.0) ** 2)))
    assert out["block_jacobi"] < 0.5 * out[None], out


def test_predictor_extrapolation_reduces_newton_work():
    """Seeding Newton with the extrapolated predictor 2u - u_old
    (src/claw.cc:1063-1065, 1104-1108) cuts the residual ENTERING each
    Newton solve on a smooth unsteady theta-scheme run — the predictor's
    convergence effect (a second-order-accurate seed vs the first-order
    u_old seed) — with at-most-equal iteration counts and the same Newton
    fixed point."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(16, 16, -5.0, 5.0, -5.0, 5.0)
    rhs = make_rhs(basis, mesh, PER_BCS, flux="roe")
    vort = ic.isentropic_vortex()          # genuinely time-dependent
    u0 = ic.set_initial_condition(basis, mesh, vort)
    # the seed-error ratio pred/plain scales as dt*||u''||/||u'|| ~ dt*c/h:
    # extrapolation wins when the time step RESOLVES the temporal scale
    # (dt*omega < 1), the regime the reference's unsteady theta runs use
    dt = float(compute_dt(cell_averages(basis, u0), mesh, 1, 1.0))

    step = jax.jit(make_implicit_step(rhs, theta=0.5, max_newton=6,
                                      lin_tol=1e-8, gmres_restart=30,
                                      gmres_maxiter=8, newton_atol=1e-9))
    # plain: every Newton starts at u_old
    u, tot_plain, r0_plain = u0, 0, []
    for i in range(4):
        u, info = step(u, i * dt, dt)
        assert not bool(info.diverged)
        tot_plain += int(info.iters)
        r0_plain.append(float(info.res0))
    u_plain = u
    # predictor: start at 2u - u_old carried across steps; the first step's
    # seed is the solution itself (src/claw.cc:1003), so compare from step 2
    u, pred, tot_pred, r0_pred = u0, u0, 0, []
    for i in range(4):
        un, info = step(u, i * dt, dt, u_guess=pred)
        assert not bool(info.diverged)
        tot_pred += int(info.iters)
        r0_pred.append(float(info.res0))
        pred = 2.0 * un - u
        u = un
    # the extrapolated seed cuts the entering residual on every
    # predictor-seeded step (O(dt^2) vs O(dt) seed error), by >30% overall
    assert all(rp < rq for rp, rq in zip(r0_pred[1:], r0_plain[1:])), \
        (r0_pred, r0_plain)
    assert sum(r0_pred[1:]) < 0.7 * sum(r0_plain[1:]), (r0_pred, r0_plain)
    assert tot_pred <= tot_plain, (tot_pred, tot_plain)
    # both trajectories hit the same Newton fixed point
    np.testing.assert_allclose(np.array(u), np.array(u_plain),
                               rtol=0, atol=1e-7)


def test_linear_residual_reported():
    """NewtonInfo.lin_res carries the achieved RELATIVE linear residual
    (the reference prints and warn-checks it, src/claw.cc:677-687):
    <= tol under a generous Krylov budget, > tol when the budget cannot
    converge — the driver's warn-and-continue hook."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(12, 12, 0.0, 1.0, 0.0, 1.0)
    far = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 0.5), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.6)])
    bcs = dict(W=BoundarySide(euler.BC_FARFIELD, far),
               E=BoundarySide(euler.BC_FARFIELD, far),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    rhs = make_rhs(basis, mesh, bcs, flux="roe")

    def pert(x, y, t=0.0):
        b = 0.05 * jnp.exp(-50 * ((x - 0.5) ** 2 + (y - 0.5) ** 2))
        return jnp.stack([0.5 + b, b, 1.0 + b, jnp.full_like(x, 2.6)])

    u0 = ic.set_initial_condition(basis, mesh, pert)
    dt = 50.0 * float(compute_dt(cell_averages(basis, u0), mesh, 1, 1.0))

    good = jax.jit(make_implicit_step(rhs, max_newton=1, lin_tol=1e-8,
                                      gmres_restart=60, gmres_maxiter=40,
                                      precondition="block_jacobi"))
    _, info = good(u0, 0.0, dt)
    assert float(info.lin_res) <= 1.5e-8, float(info.lin_res)

    bad = jax.jit(make_implicit_step(rhs, max_newton=1, lin_tol=1e-8,
                                     gmres_restart=3, gmres_maxiter=1))
    _, info = bad(u0, 0.0, dt)
    assert float(info.lin_res) > 1e-8, float(info.lin_res)


def test_jacobi_lag_converges_same_steady_state():
    """run_steady(jacobi_lag=5) — dR/du probe blocks reused across steps,
    only the I/dt shift rebuilt — reaches the same steady state as fresh
    per-step probes (the reference rebuilds its preconditioner every Newton
    iteration, src/claw.cc:666-691; lagging is pure savings near steady
    state where the iterates barely move)."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(16, 16, 0.0, 1.0, 0.0, 1.0)
    far = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 0.5), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.6)])
    bcs = dict(W=BoundarySide(euler.BC_FARFIELD, far),
               E=BoundarySide(euler.BC_FARFIELD, far),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))

    def perturbed(x, y, t=0.0):
        bump = 0.05 * jnp.exp(-50 * ((x - 0.5) ** 2 + (y - 0.5) ** 2))
        return jnp.stack([0.5 + bump, bump, 1.0 + bump,
                          jnp.full_like(x, 2.6)])

    u0 = ic.set_initial_condition(basis, mesh, perturbed)
    out = {}
    for lag in (1, 5):
        s = Solver(basis, mesh, bcs, flux="roe", cfl=5.0, method="implicit",
                   max_nonlin_iter=2, linear_residual=1e-6,
                   precondition="block_jacobi")
        u, hist = run_steady(s, u0, cfl0=5.0, min_residual=1e-9,
                             max_steps=200, jacobi_lag=lag)
        assert hist[-1] < 1e-9 or hist[-1] < hist[0] * 1e-6, \
            (lag, hist[0], hist[-1], len(hist))
        out[lag] = np.array(s.cell_averages(u))
    # same uniform-freestream steady state from both preconditioner cadences
    np.testing.assert_allclose(out[5], out[1], rtol=0, atol=1e-7)


def test_implicit_global_chunked_matches_host_loop():
    """Implicit global stepping carries the extrapolated predictor across
    steps IDENTICALLY in the host loop and the chunked device while_loop
    (src/claw.cc:1104-1108 carried state)."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(16, 16, -5.0, 5.0, -5.0, 5.0)
    bcs = PER_BCS
    s = Solver(basis, mesh, bcs, flux="roe", cfl=2.0, method="implicit",
               theta=0.5, max_nonlin_iter=3, linear_residual=1e-8)
    u0 = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())
    T = 0.2
    u1, t1, it1 = s.run(u0, T, chunk=1)
    u2, t2, it2 = s.run(u0, T, chunk=16)
    assert it1 == it2
    assert abs(t1 - t2) < 1e-13
    np.testing.assert_allclose(np.array(u1), np.array(u2),
                               rtol=1e-12, atol=1e-13)


def test_fused_primal_rhs_pairing_matches_xla():
    """Implicit on the production kernel (VERDICT r4 item 6): with
    volume_kernel='fused' the driver pairs the fused Pallas residual
    (primal) with the XLA operator's linearization (tangent) through
    jax.custom_jvp (solver/implicit.fused_primal_rhs).  In interpret mode
    the fused kernel is numerically identical to XLA, so a full implicit
    step must match the all-XLA solver to fusion roundoff, and the paired
    rhs must expose working jax.linearize tangents (the GMRES operator)."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(16, 8, -5.0, 5.0, -2.5, 2.5)
    sx = Solver(basis, mesh, PER_BCS, flux="roe", cfl=2.0,
                method="implicit", theta=1.0, max_nonlin_iter=2,
                linear_residual=1e-8, volume_kernel="xla")
    sf = Solver(basis, mesh, PER_BCS, flux="roe", cfl=2.0,
                method="implicit", theta=1.0, max_nonlin_iter=2,
                linear_residual=1e-8, volume_kernel="fused")
    u0 = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())

    # primal parity (fused kernel vs XLA in interpret mode)
    np.testing.assert_allclose(np.array(sf.rhs(u0, 0.0)),
                               np.array(sx.rhs(u0, 0.0)),
                               rtol=1e-11, atol=1e-12)
    # tangent parity: the custom-jvp pairing must linearize (XLA side)
    tang = jnp.sin(jnp.arange(u0.size, dtype=u0.dtype)).reshape(u0.shape)
    _, fl = jax.linearize(lambda v: sf.rhs(v, 0.0), u0)
    _, xl = jax.linearize(lambda v: sx.rhs(v, 0.0), u0)
    np.testing.assert_allclose(np.array(fl(tang)), np.array(xl(tang)),
                               rtol=1e-11, atol=1e-12)

    # one full implicit step end-to-end (global stepping carries the
    # Newton predictor: 5-tuple step signature)
    uf, dtf, badf, stf, _pf = sf._step(u0, 0.0, 1.0, None, u0)
    ux, dtx, badx, stx, _px = sx._step(u0, 0.0, 1.0, None, u0)
    assert not bool(badf) and not bool(badx)
    np.testing.assert_allclose(np.array(uf), np.array(ux),
                               rtol=1e-10, atol=1e-11)
