"""Explicit solver driver for general unstructured quad meshes.

The unstructured counterpart of dflo_tpu.driver.Solver: same run-loop
semantics (ConservationLaw::run, src/claw.cc:953-1130) over the flat-cell
state ``u[4, K, N]`` with the gather-based residual of
solver.spatial_unstruct, the mapping-general minmax limiter
(src_mpi/limiter.cc:397-555) and Zhang-Shu positivity.  This is the path
that runs the reference's fully unstructured Gmsh cases (the delquad disk
meshes of examples/gravity/*/grid_uns.geo) end-to-end.
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
    """Explicit DG solver on an UnstructuredQuadMesh."""

    def __init__(self, basis: basis_mod.Basis, mesh,
                 bc_table: dict[int, BoundarySide], flux: str = "lxf",
                 limiter: LimiterConfig | None = None,
                 source: Callable | None = None, scheme: str | None = None,
                 cfl: float = 0.9, dtype=None,
                 fixed_time_step: float | None = None,
                 well_balanced: str | None = None, potential=None):
        self.basis = basis
        self.mesh = mesh
        self.cfl = cfl
        self.fixed_time_step = fixed_time_step
        self.limiter_cfg = limiter or LimiterConfig()
        dtype = dtype or jnp.zeros(0).dtype
        self.dtype = dtype
        self.curvilinear = True          # general q1 mapping
        self.mask = None

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
        if cfg.shock_indicator not in ("limiter",):
            raise ValueError("unstructured runs support `shock indicator = "
                             "limiter` (mark all, src/indicator.cc:15-21)")
        self._positivity = (make_positivity_limiter_unstructured(basis, dtype)
                            if cfg.pos_lim else None)

        self.ark, self.stage_times = rk_mod.rk_coeffs(
            scheme or rk_mod.default_scheme(basis.degree))
        self._step = jax.jit(self._make_step())

    # ------------------------------------------------------------------
    def cell_averages(self, u):
        return self.rhs.cell_averages(u)

    def post_stage(self, u, t=0.0):
        if self._limit is None and self._positivity is None:
            return u
        ubar = self.cell_averages(u)
        if self._limit is not None:
            marked = jnp.full(u.shape[-1:], 2.0, u.dtype)  # mark all
            u = self._limit(u, ubar, marked)
        if self._positivity is not None:
            u = self._positivity(u, ubar)
        return u

    def _make_step(self):
        def step(u, t, t_end):
            ubar = self.cell_averages(u)
            if self.fixed_time_step is not None:
                dt = jnp.asarray(self.fixed_time_step, u.dtype)
            else:
                dt = compute_dt_unstructured(ubar, self.mesh,
                                             self.basis.degree, self.cfl,
                                             h_field=self._h_field)
            dt = jnp.minimum(dt, t_end - t)
            u = rk_mod.ssp_rk_step(self.rhs, u, t, dt, self.ark,
                                   self.stage_times,
                                   post_stage=self.post_stage)
            bad = negative_average_flag(self.cell_averages(u))
            return u, dt, bad
        return step

    # ------------------------------------------------------------------
    def run(self, u, t_end: float, t0: float = 0.0,
            callback: Callable | None = None, max_steps: int = 10**7):
        t, it = t0, 0
        u = self.post_stage(u, t0)    # IC pre-limit (src/claw.cc:997-1001)
        while t < t_end - 1e-12 and it < max_steps:
            u, dt, bad = self._step(u, t, t_end)
            if bool(bad):
                raise FloatingPointError(
                    f"negative density/pressure cell average at t={t!r} "
                    f"(src/positivity.cc:26-39 fatal condition)")
            t += float(dt)
            it += 1
            if callback is not None:
                callback(u, t, it)
        return u, t, it


def set_initial_condition_unstructured(basis: basis_mod.Basis, mesh, fn,
                                       dtype=None):
    """Nodal interpolation of fn(x, y) -> [4, ...] at the mapped basis nodes
    (set_initial_condition, src/ic.cc:104-126): u[4, K, N]."""
    dtype = dtype or jnp.zeros(0).dtype
    xn, yn = mesh.point_coords(np.asarray(basis.nodes))    # [K, N]
    vals = fn(jnp.asarray(xn, dtype), jnp.asarray(yn, dtype))
    return jnp.asarray(vals, dtype)
