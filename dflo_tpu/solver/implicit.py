"""Implicit theta-scheme via matrix-free Newton-Krylov.

Replaces the reference's implicit path wholesale (SURVEY.md §7.1): the
Sacado-AD element Jacobians + assembled Trilinos sparse matrix + GMRES/
BlockSSOR or UMFPACK direct solve (src/assemble_implicit.cc, src/claw.cc:
649-720, 876-933) become jax.jvp Jacobian-vector products feeding
jax.scipy GMRES — no matrix is ever formed, which is the idiomatic (and
BASELINE.json-mandated) accelerator formulation.

Scheme (src/assemble_implicit.cc:125-135): with the blended state
W_theta = theta*u + (1-theta)*u_old,

    F(u) = (u - u_old) / dt  -  R(W_theta, t) = 0

(R is the mass-solved spatial operator du/dt).  theta = 1 is backward Euler
(naca0012 steady config), theta = 0.5 the midpoint rule.  `dt` may be a
scalar (time-accurate) or a per-cell field (`time step type = local`
pseudo-transient stepping, src/claw.cc:444-481), and the outer driver ramps
the CFL by the residual-history factor clamped to [0.5, 2]
(src/claw.cc:1079-1090).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dflo_tpu.solver import rk as rk_mod


def make_implicit_step(rhs: Callable, theta: float = 1.0,
                       max_newton: int = 1, lin_tol: float = 1e-4,
                       gmres_restart: int = 30, gmres_maxiter: int = 10):
    """Build step(u_old, t, dt) -> (u_new, res_norm).

    lin_tol is the relative Krylov tolerance (`linear solver residual`,
    src/parameters.cc:22-24); max_newton mirrors `nonlinear iterations`.
    dt broadcasts: scalar for global stepping, [ny, nx] for local."""

    def step(u_old, t, dt):
        dtb = jnp.asarray(dt)
        if dtb.ndim == 2:
            dtb = dtb[None, None]

        def F(v):
            w = theta * v + (1.0 - theta) * u_old
            return (v - u_old) / dtb - rhs(w, t)

        def newton_iter(u, _):
            Fv = F(u)

            def Av(w):
                return jax.jvp(F, (u,), (w,))[1]

            du, _info = jax.scipy.sparse.linalg.gmres(
                Av, -Fv, tol=lin_tol, atol=0.0,
                restart=gmres_restart, maxiter=gmres_maxiter,
                solve_method="batched")
            return u + du, None

        u, _ = jax.lax.scan(newton_iter, u_old, None, length=max_newton)
        res = jnp.sqrt(jnp.sum(F(u) ** 2))
        return u, res

    return step


def run_steady(solver, u, cfl0: float | None = None,
               min_residual: float = 1e-10, max_steps: int = 2000,
               verbose: bool = False):
    """Pseudo-transient continuation to steady state: local per-cell dt,
    backward-Euler Newton steps, CFL ramped by the residual-history factor
    clamped to [0.5, 2] (src/claw.cc:1079-1090).

    `solver` is a dflo_tpu.driver.Solver built with method='implicit'.
    Returns (u, residual_history)."""
    cfl = cfl0 if cfl0 is not None else solver.cfl
    history = []
    step = solver._implicit_step

    curvi = getattr(solver, "curvilinear", False)
    if curvi:
        h_field = jnp.asarray(solver.mesh.cell_h())

    @jax.jit
    def one(u, cfl):
        ubar = solver.cell_averages(u)
        if curvi:
            from dflo_tpu.physics import euler as _euler
            lam = _euler.max_eigenvalue(ubar)
            dtc = h_field / lam / (2.0 * solver.basis.degree + 1.0)
        else:
            dtc = rk_mod.local_dt(ubar, solver.mesh, solver.basis.degree, 1.0)
        u_new, _newton_res = step(u, 0.0, dtc * cfl)
        u_new = solver.post_stage(u_new)
        # convergence is measured on the SPATIAL residual ||R(u)||, the
        # steady-state defect (the reference's res_norm approaches this as
        # the CFL ramp sends dt -> inf)
        res = jnp.sqrt(jnp.sum(solver.rhs(u_new, 0.0) ** 2))
        return u_new, res

    for it in range(max_steps):
        u, res = one(u, cfl)
        res = float(res)
        if it >= 2:
            factor = min(max(history[-1] / res, 0.5), 2.0)
            cfl *= factor
        history.append(res)
        if verbose and it % 10 == 0:
            print(f"  steady it={it:5d} res={res:.3e} cfl={cfl:.2f}")
        if res < min_residual:
            break
    return u, history
