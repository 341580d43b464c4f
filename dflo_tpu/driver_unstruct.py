"""Solver driver for general unstructured quad meshes.

The unstructured counterpart of dflo_tpu.driver.Solver: same run-loop
semantics (ConservationLaw::run, src/claw.cc:953-1130) over the flat-cell
state ``u[4, K, N]`` with the gather-based residual of
solver.spatial_unstruct, the mapping-general minmax limiter
(src_mpi/limiter.cc:397-555) and Zhang-Shu positivity.  This is the path
that runs the reference's fully unstructured Gmsh cases (the delquad disk
meshes of examples/gravity/*/grid_uns.geo) end-to-end.

Feature parity with the structured driver (VERDICT r2 item 4):
- KXRCF shock indicator through the face-gather tables
  (src/indicator.cc:48-198 runs on any deal.II mesh);
- method='implicit': the same matrix-free Newton-Krylov theta-scheme
  (solver.implicit is layout-agnostic; src/assemble_implicit.cc works on
  any quad mesh, driven by src/claw.cc:876-933);
- device_mesh: 1-D cell-axis GSPMD sharding (parallel.flat_sharding);
- run(chunk=N): the device-side while_loop multi-step with Kahan time.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dflo_tpu.driver import LimiterConfig
from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.physics import euler
from dflo_tpu.solver import rk as rk_mod
from dflo_tpu.solver.spatial import BoundarySide
from dflo_tpu.solver.spatial_unstruct import (compute_dt_unstructured,
                                              make_rhs_unstructured)
from dflo_tpu.stab.limiter_unstruct import (
    make_minmax_limiter_unstructured, make_positivity_limiter_unstructured)
from dflo_tpu.stab.positivity import negative_average_flag


class UnstructuredSolver:
    """DG solver on an UnstructuredQuadMesh (explicit RK or implicit)."""

    def __init__(self, basis: basis_mod.Basis, mesh,
                 bc_table: dict[int, BoundarySide], flux: str = "lxf",
                 limiter: LimiterConfig | None = None,
                 source: Callable | None = None, scheme: str | None = None,
                 cfl: float = 0.9, dtype=None,
                 fixed_time_step: float | None = None,
                 well_balanced: str | None = None, potential=None,
                 method: str = "rk", theta: float = 1.0,
                 max_nonlin_iter: int = 1, linear_residual: float = 1e-4,
                 gmres_restart: int = 30, gmres_maxiter: int = 10,
                 precondition: str | None = "block_jacobi",
                 time_step_type: str = "global", device_mesh=None):
        self.basis = basis
        self.mesh = mesh
        self.cfl = cfl
        self.fixed_time_step = fixed_time_step
        self.limiter_cfg = limiter or LimiterConfig()
        dtype = dtype or jnp.zeros(0).dtype
        self.dtype = dtype
        self.curvilinear = True          # general q1 mapping
        self.mask = None
        self.method = method
        self.time_step_type = time_step_type
        self.device_mesh = device_mesh

        self.rhs = make_rhs_unstructured(basis, mesh, bc_table, flux=flux,
                                         source=source, dtype=dtype,
                                         well_balanced=well_balanced,
                                         potential=potential)
        self._h_field = jnp.asarray(mesh.cell_h(), dtype)

        cfg = self.limiter_cfg
        if cfg.type in ("minmax", "TVB"):
            # TVB is Cartesian-only in the reference (src/parameters.cc:545);
            # on general meshes both names run the mapping-general minmax
            # limiter, the reference's own general-mesh option
            self._limit = make_minmax_limiter_unstructured(
                basis, mesh, M=cfg.M, char_lim=cfg.char_lim, dtype=dtype)
        elif cfg.type == "none":
            self._limit = None
        else:
            raise ValueError(f"unknown limiter type {cfg.type!r}")
        if cfg.shock_indicator not in ("limiter", "density", "energy",
                                       "residual"):
            raise ValueError(
                "unstructured runs support shock indicator in "
                "{limiter, density, energy, residual} "
                "(src/indicator.cc:15-198)")
        from dflo_tpu.stab.indicator_unstruct import \
            make_shock_indicator_unstructured
        self._indicator = make_shock_indicator_unstructured(
            basis, mesh, cfg.shock_indicator, dtype=dtype, rhs=self.rhs)
        self._positivity = (make_positivity_limiter_unstructured(basis, dtype)
                            if cfg.pos_lim else None)

        self.ark, self.stage_times = rk_mod.rk_coeffs(
            scheme or rk_mod.default_scheme(basis.degree))
        if method == "implicit":
            from dflo_tpu.solver.implicit import make_implicit_step
            self._implicit_step = make_implicit_step(
                self.rhs, theta=theta, max_newton=max_nonlin_iter,
                lin_tol=linear_residual, gmres_restart=gmres_restart,
                gmres_maxiter=gmres_maxiter, precondition=precondition,
                post_update=self.post_stage)
        elif method != "rk":
            raise ValueError(f"unknown solver method {method!r}")
        self.precondition = precondition
        self.linear_residual = linear_residual
        self._step = jax.jit(self._make_step())
        self._multi_cache = {}
        self.last_stats = None

    # ------------------------------------------------------------------
    def cell_averages(self, u):
        return self.rhs.cell_averages(u)

    def shard(self, u):
        """Place the state on the 1-D cell-axis device mesh."""
        if self.device_mesh is None:
            return u
        from dflo_tpu.parallel.sharding import shard_state_flat
        return shard_state_flat(u, self.device_mesh)

    def post_stage(self, u, t=0.0):
        if self._limit is None and self._positivity is None:
            return u
        ubar = self.cell_averages(u)
        if self._limit is not None:
            marked, _ = self._indicator(u, ubar, t)
            u = self._limit(u, ubar, marked)
        if self._positivity is not None:
            u = self._positivity(u, ubar)
        return u

    def _make_step(self):
        def step(u, t, t_end):
            if self.device_mesh is not None:
                from dflo_tpu.parallel.sharding import flat_sharding
                u = jax.lax.with_sharding_constraint(
                    u, flat_sharding(self.device_mesh))
            ubar = self.cell_averages(u)
            if self.fixed_time_step is not None:
                dt = jnp.asarray(self.fixed_time_step, u.dtype)
            else:
                dt = compute_dt_unstructured(ubar, self.mesh,
                                             self.basis.degree, self.cfl,
                                             h_field=self._h_field)
            dt = jnp.minimum(dt, t_end - t)
            dt_field = None
            if self.time_step_type == "local":
                # per-cell pseudo-transient dt (src/claw.cc:444-481)
                lam = euler.max_eigenvalue(ubar)
                dt_field = (self.cfl * self._h_field / lam
                            / (2.0 * self.basis.degree + 1.0))
            stats = ()
            if self.method == "implicit":
                u, stats = self._implicit_step(
                    u, t, dt if dt_field is None else dt_field)
            else:
                u = rk_mod.ssp_rk_step(self.rhs, u, t, dt, self.ark,
                                       self.stage_times,
                                       post_stage=self.post_stage,
                                       dt_field=dt_field)
            bad = negative_average_flag(self.cell_averages(u))
            if self.method == "implicit":
                bad = bad | stats.diverged
            return u, dt, bad, stats
        return step

    def _multi_step(self, chunk: int):
        """Device-side while_loop of up to `chunk` steps with Kahan time
        accumulation (same design as driver.Solver._multi_step)."""
        if chunk not in self._multi_cache:
            step = self._make_step()

            def multi(u, t, t_end):
                zero = jnp.zeros((), t.dtype)
                st_shape = jax.eval_shape(step, u, t, t_end)[3]
                stats0 = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), st_shape)

                def body(carry):
                    u, t, comp, it, _bad, _stats = carry
                    un, dt, bad, stats = step(u, t, t_end)
                    y = dt - comp
                    t2 = t + y
                    comp = (t2 - t) - y
                    return un, t2, comp, it + 1, bad, stats

                def cond(carry):
                    _u, t, _c, it, bad, _s = carry
                    return (t < t_end - 1e-12) & (it < chunk) & ~bad

                u, t, _c, it, bad, stats = jax.lax.while_loop(
                    cond, body, (u, t, zero, jnp.asarray(0),
                                 jnp.asarray(False), stats0))
                return u, t, it, bad, stats

            self._multi_cache[chunk] = jax.jit(multi)
        return self._multi_cache[chunk]

    # ------------------------------------------------------------------
    def run(self, u, t_end: float, t0: float = 0.0,
            callback: Callable | None = None, max_steps: int = 10**7,
            chunk: int = 1):
        t, it = t0, 0
        u = self.post_stage(u, t0)    # IC pre-limit (src/claw.cc:997-1001)
        if chunk > 1:
            multi = self._multi_step(chunk)
            tdev = jnp.asarray(t, self.dtype)
            while t < t_end - 1e-12 and it < max_steps:
                u, tdev, n, bad, stats = multi(
                    u, tdev, jnp.asarray(t_end, self.dtype))
                self.last_stats = stats
                if bool(bad):
                    raise FloatingPointError(
                        f"negative density/pressure cell average (or Newton "
                        f"divergence) near t={float(tdev)!r} "
                        f"(src/positivity.cc:26-39 fatal condition)")
                t = float(tdev)
                it += int(n)
                if callback is not None:
                    callback(u, t, it)
                if int(n) == 0:
                    break   # device loop done at solver precision
            return u, t, it
        while t < t_end - 1e-12 and it < max_steps:
            u, dt, bad, stats = self._step(u, t, t_end)
            self.last_stats = stats
            if bool(bad):
                raise FloatingPointError(
                    f"negative density/pressure cell average at t={t!r} "
                    f"(src/positivity.cc:26-39 fatal condition)")
            t += float(dt)
            it += 1
            if callback is not None:
                callback(u, t, it)
            if float(dt) <= 0.0:
                # solver-dtype t_end clamp hit exactly 0 (f32(t) ==
                # f32(t_end) half-ulp window): final time reached at solver
                # precision — terminate instead of spinning (see
                # driver.Solver.run)
                break
        return u, t, it


def set_initial_condition_unstructured(basis: basis_mod.Basis, mesh, fn,
                                       dtype=None):
    """Nodal interpolation of fn(x, y) -> [4, ...] at the mapped basis nodes
    (set_initial_condition, src/ic.cc:104-126): u[4, K, N]."""
    dtype = dtype or jnp.zeros(0).dtype
    xn, yn = mesh.point_coords(np.asarray(basis.nodes))    # [K, N]
    vals = fn(jnp.asarray(xn, dtype), jnp.asarray(yn, dtype))
    return jnp.asarray(vals, dtype)
