"""Explicit solver driver: the ConservationLaw run loop, TPU-style.

Replaces the reference's ConservationLaw<dim> orchestration (src/claw.h:57-365,
src/claw.cc:725-772, 953-1130) for the explicit path: one jit-compiled step
fuses {residual, SSP-RK stages, cell averages, shock indicator, TVB limiter,
positivity limiter, dt} — the per-stage stabilization chain runs exactly where
the reference calls it (src/claw.cc:762-766).  The Python host loop only
checks termination and output cadence.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.physics import euler
from dflo_tpu.solver import rk as rk_mod
from dflo_tpu.solver.spatial import BoundarySide, make_rhs
from dflo_tpu.stab.indicator import make_shock_indicator
from dflo_tpu.stab.limiter import make_tvb_limiter
from dflo_tpu.stab.positivity import make_positivity_limiter, negative_average_flag


@dataclasses.dataclass(frozen=True)
class LimiterConfig:
    """Mirrors Parameters::Limiter (src/parameters.h:241-256)."""
    type: str = "none"               # none | TVB
    shock_indicator: str = "limiter"  # limiter | density | energy
    M: float = 0.0
    beta: float = 1.0
    char_lim: bool = False
    pos_lim: bool = False
    conserve_angular_momentum: bool = False


class Solver:
    """Explicit DG solver on a Cartesian mesh."""

    def __init__(self, basis: basis_mod.Basis, mesh, bcs: dict[str, BoundarySide],
                 flux: str = "lxf", limiter: LimiterConfig | None = None,
                 source: Callable | None = None, scheme: str | None = None,
                 cfl: float = 0.9, device_mesh=None, mask=None,
                 solid_state=(0.0, 0.0, 1.0, 2.5), dtype=None,
                 well_balanced: str | None = None, potential=None,
                 polytropic_nu: float = 1.2, mass_matrix: str = "diagonal",
                 method: str = "rk", theta: float = 1.0,
                 max_nonlin_iter: int = 1, linear_residual: float = 1e-4,
                 gmres_restart: int = 30, gmres_maxiter: int = 10,
                 fixed_time_step: float | None = None,
                 volume_kernel: str = "auto", precondition: str | None = None,
                 time_step_type: str = "global", post_kernel: str = "auto"):
        self.basis = basis
        self.mesh = mesh
        self.bcs = bcs
        self.cfl = cfl
        self.fixed_time_step = fixed_time_step
        self.device_mesh = device_mesh
        if time_step_type not in ("global", "local"):
            raise ValueError(f"unknown time step type {time_step_type!r}")
        if time_step_type == "local" and method == "mood":
            raise ValueError("MOOD requires global time stepping "
                             "(src/parameters.cc:536-544)")
        self.time_step_type = time_step_type
        self.limiter_cfg = limiter or LimiterConfig()
        dtype = dtype or jnp.zeros(0).dtype
        self.dtype = dtype

        self.mask = mask
        if mask is not None:
            self._fmask = jnp.asarray(mask, bool)
            self._u_solid = jnp.asarray(solid_state, dtype)[:, None, None, None]
        per_x = getattr(bcs["W"], "kind", None) == euler.BC_PERIODIC
        per_y = getattr(bcs["S"], "kind", None) == euler.BC_PERIODIC
        # curvilinear blocks (mapping = q1) carry per-cell metric terms
        self.curvilinear = hasattr(mesh, "metric")

        # 'auto': use the fused Pallas kernels on real TPUs whenever the
        # configuration sits inside their envelope (the production hot
        # path); XLA everywhere else.  CPU always resolves to XLA —
        # interpret-mode Pallas would crawl.
        cfg0 = self.limiter_cfg
        from dflo_tpu.ops.pallas_kernels import fused_shape_ok
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        if device_mesh is not None:
            # sharded: per-device block dims must be (sublane, lane)-
            # tile aligned (no internal padding under a device mesh)
            from dflo_tpu.parallel.sharding import mesh_grid_shape
            DY_, DX_ = mesh_grid_shape(device_mesh)
            tiles_ok = (mesh.ny % DY_ == 0 and mesh.nx % DX_ == 0
                        and (mesh.ny // DY_) % 8 == 0
                        and (mesh.nx // DX_) % 128 == 0
                        # sharded fused path has no masked-domain
                        # delta-strip support
                        and mask is None)
        else:
            # single chip: ANY shape rides the fused kernels (ragged nx
            # becomes one full-width lane tile, ragged ny gains internal
            # solid pad rows) except huge lane-ragged widths
            tiles_ok = fused_shape_ok(mesh.ny, mesh.nx)
        if volume_kernel == "auto" or post_kernel == "auto":
            vol_ok = (on_tpu and not self.curvilinear
                      # body forces ride the fused kernel everywhere: the
                      # in-kernel quadrature-point source (pallas_kernels
                      # ops['src']) takes device-local coordinate slices
                      # under a device mesh
                      # isothermal well-balanced gravity rides the
                      # single-chip kernel (in-kernel exp(-phi/RT) source);
                      # polytropic falls back to XLA
                      and (well_balanced is None
                           or (well_balanced == "isothermal"
                               and device_mesh is None
                               and basis.is_nodal_collocated))
                      and mass_matrix == "diagonal"
                      and basis.degree >= 1
                      # implicit rides the fused kernel through a
                      # custom_jvp pairing (fused primal, XLA tangent —
                      # pallas_call itself has no JVP rule), built below
                      and method in ("rk", "mood", "implicit")
                      and tiles_ok)
            post_ok = (vol_ok
                       and cfg0.type == "TVB"
                       and basis.family == "Qk" and basis.is_nodal_collocated
                       and not cfg0.conserve_angular_momentum
                       # ragged ny pads with solid rows, which cannot model
                       # a y-periodic neighbor stencil (single-chip only —
                       # sharded blocks are tile-aligned by tiles_ok)
                       and not (device_mesh is None and per_y
                                and mesh.ny % 8 != 0)
                       and cfg0.shock_indicator in ("density", "energy",
                                                    "limiter"))
            if volume_kernel == "auto":
                volume_kernel = "fused" if vol_ok else "xla"
            if post_kernel == "auto":
                post_kernel = "fused" if post_ok else "xla"
        # fused dt/negativity diagnostics: built whenever the mesh sits in
        # the fused envelope — independent of how volume/post kernels were
        # selected, so explicit volume_kernel='fused' configurations also
        # get the fused diag and the carry-lam chunked loop
        self._fused_diag = None
        self._fused_modal_pos_diag = None
        if (on_tpu and device_mesh is None and not self.curvilinear
                and fused_shape_ok(mesh.ny, mesh.nx)):
            # fused dt/negativity diagnostics (any basis; mask-aware)
            from dflo_tpu.ops.pallas_kernels import make_fused_diag
            self._fused_diag = make_fused_diag(basis, mesh, dtype,
                                               mask=mask)
        elif (on_tpu and device_mesh is not None
              and not self.curvilinear and tiles_ok):
            # per-device block reduction + one pmax/pmin across the mesh
            from dflo_tpu.ops.pallas_kernels import make_fused_diag_sharded
            self._fused_diag = make_fused_diag_sharded(
                basis, mesh, device_mesh, dtype)
        if self.curvilinear:
            from dflo_tpu.solver.spatial_curvi import make_rhs_curvilinear
            if self.limiter_cfg.type == "TVB":
                raise ValueError(
                    "the TVB limiter requires the cartesian mapping "
                    "(src/parameters.cc:545-546); q1 meshes use the "
                    "mapping-general minmax limiter "
                    "(src_mpi/limiter.cc:397-555)")
            if mask is not None or well_balanced is not None:
                raise ValueError("masks / well-balanced gravity are "
                                 "Cartesian-path features")
            self.rhs = make_rhs_curvilinear(basis, mesh, bcs, flux=flux,
                                            source=source, dtype=dtype)
        else:
            self.rhs = make_rhs(basis, mesh, bcs, flux=flux, source=source,
                                mask=mask, dtype=dtype,
                                well_balanced=well_balanced,
                                potential=potential,
                                polytropic_nu=polytropic_nu,
                                mass_matrix=mass_matrix,
                                volume_kernel=volume_kernel,
                                device_mesh=device_mesh)
            if method == "implicit" and volume_kernel == "fused":
                # Newton-Krylov on the production kernel: fused primal
                # residuals, XLA-linearized tangents (jax.custom_jvp
                # pairing — see solver/implicit.fused_primal_rhs)
                from dflo_tpu.solver.implicit import fused_primal_rhs
                rhs_xla = make_rhs(basis, mesh, bcs, flux=flux,
                                   source=source, mask=mask, dtype=dtype,
                                   well_balanced=well_balanced,
                                   potential=potential,
                                   polytropic_nu=polytropic_nu,
                                   mass_matrix=mass_matrix,
                                   volume_kernel="xla",
                                   device_mesh=device_mesh)
                self.rhs = fused_primal_rhs(self.rhs, rhs_xla)
        self.avg_op = jnp.asarray(basis.wq2 @ basis.V, dtype)
        _avg_np = basis.wq2 @ basis.V
        self._mode0_mean = (basis.family == "Pk"
                            and float(abs(_avg_np[1:]).max()) < 1e-13)
        self._avg0 = float(_avg_np[0])

        cfg = self.limiter_cfg
        self._indicator = (make_shock_indicator(
            basis, mesh, cfg.shock_indicator, per_x, per_y, dtype, mask=mask,
            rhs=self.rhs) if not self.curvilinear else None)
        if cfg.type == "TVB":
            self._limit = make_tvb_limiter(
                basis, mesh, M=cfg.M, beta=cfg.beta, char_lim=cfg.char_lim,
                conserve_angular_momentum=cfg.conserve_angular_momentum,
                per_x=per_x, per_y=per_y, dtype=dtype, mask=mask)
        elif cfg.type == "minmax" and self.curvilinear:
            # mapping-general minmax on the structured curvilinear block:
            # the unstructured-view limiter over the same cells (row-major
            # flat order), with wrap seams merged into interior faces
            from dflo_tpu.mesh.unstructured import from_curvilinear
            from dflo_tpu.stab.limiter_unstruct import \
                make_minmax_limiter_unstructured
            umesh = from_curvilinear(mesh, merge_coincident=per_x or per_y)
            inner = make_minmax_limiter_unstructured(
                basis, umesh, M=cfg.M, char_lim=cfg.char_lim, dtype=dtype)

            def _limit_curvi(u, ubar, marked, _inner=inner):
                c, K, ny, nx = u.shape
                out = _inner(u.reshape(c, K, ny * nx),
                             ubar.reshape(c, ny * nx),
                             jnp.reshape(marked, (ny * nx,)))
                return out.reshape(c, K, ny, nx)

            self._limit = _limit_curvi
        elif cfg.type == "minmax":
            from dflo_tpu.stab.limiter import make_minmax_limiter
            self._limit = make_minmax_limiter(
                basis, mesh, M=cfg.M, char_lim=cfg.char_lim,
                per_x=per_x, per_y=per_y, dtype=dtype, mask=mask)
        elif cfg.type == "none":
            self._limit = None
        else:
            raise ValueError(f"unknown limiter type {cfg.type!r}")
        self._positivity = (make_positivity_limiter(basis, mesh, dtype)
                            if cfg.pos_lim else None)
        self._fused_post = None
        self._post_diag = False
        if post_kernel == "fused":
            # one-VMEM-pass {averages -> indicator -> TVB -> positivity}
            # chain; same eligibility envelope as volume_kernel='fused'
            if (self.curvilinear or cfg.type != "TVB"
                    or cfg.conserve_angular_momentum
                    or cfg.shock_indicator not in ("density", "energy",
                                                   "limiter")
                    or basis.family != "Qk"
                    or not basis.is_nodal_collocated
                    or (device_mesh is not None and mask is not None)):
                raise ValueError("post_kernel='fused' covers the plain "
                                 "Cartesian Qk TVB hot path only (masked "
                                 "domains: single chip only)")
            # for the plain RK method the post kernel also emits the
            # (lam_max, minq) diagnostics from its in-kernel averages, so
            # the step's standalone diag passes disappear (post preserves
            # cell means, making end-of-stage values exact)
            self._post_diag = method == "rk"
            if device_mesh is not None:
                # sharded chain: per-device VMEM kernel + ppermuted
                # neighbor face/average packs over ICI
                from dflo_tpu.ops.pallas_kernels import make_fused_post_sharded
                self._fused_post = make_fused_post_sharded(
                    basis, mesh, device_mesh, indicator=cfg.shock_indicator,
                    M=cfg.M, beta=cfg.beta, char_lim=cfg.char_lim,
                    pos_lim=cfg.pos_lim, per_x=per_x, per_y=per_y,
                    dtype=dtype, with_diag=self._post_diag)
            else:
                from dflo_tpu.ops.pallas_kernels import make_fused_post
                self._fused_post = make_fused_post(
                    basis, mesh, indicator=cfg.shock_indicator, M=cfg.M,
                    beta=cfg.beta, char_lim=cfg.char_lim, pos_lim=cfg.pos_lim,
                    per_x=per_x, per_y=per_y, dtype=dtype,
                    with_diag=self._post_diag, mask=mask)
        elif post_kernel != "xla":
            raise ValueError(f"unknown post kernel {post_kernel!r}")

        self.ark, self.stage_times = rk_mod.rk_coeffs(
            scheme or rk_mod.default_scheme(basis.degree))
        self.method = method
        if method == "mood":
            from dflo_tpu.stab.mood import make_mood
            # fused {truncation -> positivity} kernel on the TPU hot path
            # (element-local, any shape; CPU interpret mode would crawl)
            ftp = None
            if (volume_kernel == "fused" and self._positivity is not None
                    and basis.family == "Pk"):
                from dflo_tpu.ops.pallas_kernels import make_fused_modal_pos
                ftp = make_fused_modal_pos(basis, dtype, with_trunc=True)
                fmp = make_fused_modal_pos(basis, dtype, with_trunc=False)
                if device_mesh is not None:
                    # the kernel is element-local: each device runs it on
                    # its own block (pallas_call cannot consume a
                    # GSPMD-sharded operand directly)
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    from dflo_tpu.parallel.sharding import mesh_y_axes
                    yax = mesh_y_axes(device_mesh)
                    xax = device_mesh.axis_names[-1]
                    su = P(None, None, yax, xax)
                    ftp = shard_map(ftp, mesh=device_mesh,
                                    in_specs=(su, P(yax, xax)),
                                    out_specs=su, check_vma=False)
                    fmp = shard_map(fmp, mesh=device_mesh,
                                    in_specs=(su,), out_specs=su,
                                    check_vma=False)
                self._fused_modal_pos = fmp
                if device_mesh is None and mask is None and mesh.ny % 8 == 0:
                    # last-stage variant that also emits the CFL wave speed
                    # and negativity min from its in-kernel (mean-preserving)
                    # averages — the next step's dt and the fatal-negativity
                    # flag then cost no extra whole-state pass (the MOOD
                    # analog of the RK path's carry-λ fused post diag)
                    self._fused_modal_pos_diag = make_fused_modal_pos(
                        basis, dtype, with_trunc=False, with_diag=True,
                        mesh=mesh)
            self._fused_modal_pos = getattr(self, "_fused_modal_pos", None)
            self._fused_modal_pos_diag = getattr(
                self, "_fused_modal_pos_diag", None)
            # fused Pk per-stage post: {averages -> modal TVB on marked ->
            # positivity [-> diag]} as ONE VMEM pass (r5; the XLA chain it
            # replaces measured 0.69 ms/stage at the bench shapes)
            if (ftp is not None and device_mesh is None and mask is None
                    and mesh.ny % 8 == 0
                    and cfg.type == "TVB"
                    and not cfg.conserve_angular_momentum):
                from dflo_tpu.ops.pallas_kernels import make_fused_pk_post
                self._fused_pk_post = make_fused_pk_post(
                    basis, mesh, M=cfg.M, beta=cfg.beta,
                    char_lim=cfg.char_lim, per_x=per_x, per_y=per_y,
                    dtype=dtype)
                self._fused_pk_post_diag = make_fused_pk_post(
                    basis, mesh, M=cfg.M, beta=cfg.beta,
                    char_lim=cfg.char_lim, per_x=per_x, per_y=per_y,
                    dtype=dtype, with_diag=True)
            self._mood_stage = make_mood(basis, mesh, self.rhs, per_x, per_y,
                                         mask=mask, dtype=dtype,
                                         positivity=self._positivity,
                                         fused_trunc_pos=ftp,
                                         sharded=device_mesh is not None)
        elif method == "implicit":
            from dflo_tpu.solver.implicit import make_implicit_step
            # the stabilization chain runs after EVERY Newton update, where
            # the reference limits (src/claw.cc:905-911)
            self._implicit_step = make_implicit_step(
                self.rhs, theta=theta, max_newton=max_nonlin_iter,
                lin_tol=linear_residual, gmres_restart=gmres_restart,
                gmres_maxiter=gmres_maxiter, precondition=precondition,
                post_update=self.post_stage)
        elif method != "rk":
            raise ValueError(f"unknown solver method {method!r}")
        self.precondition = precondition
        self.linear_residual = linear_residual
        # global-dt implicit stepping seeds Newton with the extrapolated
        # predictor 2u - u_old carried across steps (src/claw.cc:1063-1065,
        # 1101-1108); local (pseudo-transient) stepping does not
        # (src/claw.cc:1101-1103)
        self._carry_pred = (method == "implicit"
                            and time_step_type == "global")
        self._fused_modal_pos = getattr(self, "_fused_modal_pos", None)
        self._fused_modal_pos_diag = getattr(self, "_fused_modal_pos_diag",
                                             None)
        self._fused_pk_post = getattr(self, "_fused_pk_post", None)
        self._fused_pk_post_diag = getattr(self, "_fused_pk_post_diag", None)
        self._step = jax.jit(self._make_step())
        self._multi_cache = {}
        self.last_stats = None       # device-side MoodStats/NewtonInfo of
                                     # the most recent step (CLI printing)

    # ------------------------------------------------------------------
    def cell_averages(self, u):
        if self.curvilinear:
            return self.rhs.cell_averages(u)   # metric-weighted means
        if self._mode0_mean:
            # modal Legendre: mode 0 IS the mean — one plane slice instead
            # of a whole-state contraction
            return self._avg0 * u[:, 0]
        from dflo_tpu.ops.contract import basis_reduce
        return basis_reduce(self.avg_op, u)

    def apply_mask(self, u):
        """Freeze solid-masked cells at the benign reference state."""
        if self.mask is None:
            return u
        return jnp.where(self._fmask[None, None], u, self._u_solid)

    def post_stage(self, u, t=0.0):
        """Stabilization chain after each RK stage (src/claw.cc:762-766)."""
        if self._fused_post is not None:
            # masked domains pin solid cells to the benign reference state
            # before the chain (the XLA path does the same)
            out = self._fused_post(self.apply_mask(u))
            return out[0] if self._post_diag else out
        u = self.apply_mask(u)
        if self._limit is None and self._positivity is None:
            return u
        ubar = self.cell_averages(u)
        if self._limit is not None:
            if self._indicator is not None:
                shock, _ = self._indicator(u, ubar, t)
            else:
                # curvilinear: `shock indicator = limiter` (mark all,
                # src/indicator.cc:15-21)
                shock = jnp.full(ubar.shape[-2:], 2.0, u.dtype)
            u = self._limit(u, ubar, shock)
        if self._positivity is not None:
            u = self._positivity(u, ubar)
        return u

    def shard(self, u):
        """Place the state on the device mesh (domain decomposition,
        dflo_tpu.parallel; replaces p4est partitioning src_mpi/claw.cc:59-76)."""
        if self.device_mesh is None:
            return u
        from dflo_tpu.parallel.sharding import shard_state
        return shard_state(u, self.device_mesh)

    def _mood_rk_step(self, u, t, dt):
        """SSP stages with the MOOD cascade replacing plain forward-Euler
        updates (iterate_mood, src/claw.cc:777-871).  After each stage the
        TVB limiter runs ONLY on cells the cascade marked
        (shock_indicator set to 1e20, src/mood.cc:335-340) followed by the
        positivity limiter (src/claw.cc:866-869).  Returns the summed
        cascade counters over the stages (src/claw.cc:851 printout).

        Every stage re-cascades from full degree p with a fresh limiter
        mark set, exactly like the reference (src/mood.cc:436-489).  Warm-
        starting later stages/steps at the previous settled degree map was
        built and MEASURED SLOWER and more dissipative — starting a
        cascade with cells already at degree 1 re-triggers the
        mark -> spread -> reduce chain every stage, which the fresh
        re-cascade structurally avoids (see PERF.md negative results)."""
        from dflo_tpu.stab.mood import MoodStats
        u_old = u
        stats = None
        diag = None
        n_st = len(self.ark)
        for si, (a, c) in enumerate(zip(self.ark, self.stage_times)):
            u_cand, marked, st = self._mood_stage(u, t + c * dt, dt)
            stats = st if stats is None else MoodStats(
                stats.n_reduce + st.n_reduce, stats.n_marked + st.n_marked,
                stats.iters + st.iters)
            u = a * u_old + (1.0 - a) * u_cand
            u = self.apply_mask(u)
            if self._fused_pk_post is not None:
                # one VMEM pass: {averages -> TVB-on-marked -> positivity
                # [-> diag]} (make_fused_pk_post); replaces the XLA mode-0
                # slice + modal TVB + standalone modal-pos chain below
                shock = jnp.where(marked, 2.0, 0.0).astype(u.dtype)
                if si == n_st - 1 and self._fused_pk_post_diag is not None:
                    u, lam, minq = self._fused_pk_post_diag(u, shock)
                    diag = (lam, minq)
                else:
                    u = self._fused_pk_post(u, shock)
                continue
            ubar = self.cell_averages(u)
            if self._limit is not None:
                shock = jnp.where(marked, 1e20, 0.0)
                u = self._limit(u, ubar, shock)
            if (si == n_st - 1 and self._fused_modal_pos_diag is not None):
                u, lam, minq = self._fused_modal_pos_diag(u)
                diag = (lam, minq)
            elif self._fused_modal_pos is not None:
                u = self._fused_modal_pos(u)
            elif self._positivity is not None:
                u = self._positivity(u, ubar)
        return u, stats, diag

    def _carry_lam_ok(self) -> bool:
        """Single source of truth for carry-λ eligibility (shared by
        _make_step's assert and _multi_step's mode selection, ADVICE r4):
        the CFL wave speed can ride the chunk carry only when a fused diag
        emitter exists on the step's tail — the RK fused post (post_diag)
        or the MOOD final-stage fused modal-pos diag — and dt is the plain
        global-CFL Cartesian form it replaces."""
        diag_tail = (self._post_diag and self.method == "rk"
                     or (self.method == "mood"
                         and self._fused_modal_pos_diag is not None))
        return (diag_tail
                and self.fixed_time_step is None
                and self.time_step_type == "global"
                and not self.curvilinear)

    def _make_step(self, carry_lam: bool = False):
        """carry_lam=True builds the chunked-loop variant
        step(u, t, t_end, lam_prev) -> (..., lam_next): the CFL wave speed
        rides the loop carry (seeded once per chunk) instead of a per-step
        whole-state diag pass — valid because the post chain preserves cell
        means, so the final stage's in-kernel lam equals lam(u_next)."""
        use_post_diag = self._post_diag and self.method == "rk"
        if carry_lam:
            assert self._carry_lam_ok()
        carry_pred = self._carry_pred

        def step(u, t, t_end, lam_prev=None, pred=None):
            u_in = u
            if self.device_mesh is not None:
                from dflo_tpu.parallel.sharding import cell_sharding
                u = jax.lax.with_sharding_constraint(
                    u, cell_sharding(self.device_mesh))
            fm = self._fmask if self.mask is not None else None
            use_diag = (self._fused_diag is not None
                        and self.time_step_type == "global")
            if self.fixed_time_step is not None:
                # `set time step = ...` with cfl <= 0 (src/claw.cc:455-459)
                dt = jnp.asarray(self.fixed_time_step, u.dtype)
            elif carry_lam:
                dt = self.cfl / lam_prev / (2.0 * self.basis.degree + 1.0)
            elif use_diag:
                # one VMEM pass instead of materializing ubar in HBM
                lam, _ = self._fused_diag(u)
                dt = self.cfl / lam / (2.0 * self.basis.degree + 1.0)
            elif self.curvilinear:
                from dflo_tpu.solver.spatial_curvi import compute_dt_curvilinear
                ubar = self.cell_averages(u)
                dt = compute_dt_curvilinear(ubar, self.mesh,
                                            self.basis.degree, self.cfl)
            else:
                ubar = self.cell_averages(u)
                dt = rk_mod.compute_dt(ubar, self.mesh, self.basis.degree,
                                       self.cfl, mask=fm)
            dt = jnp.minimum(dt, t_end - t)
            dt_field = None
            if self.time_step_type == "local" and not self.curvilinear:
                # per-cell pseudo-transient dt (src/claw.cc:444-481); the
                # reported/advanced dt stays the global min
                dt_field = rk_mod.local_dt(self.cell_averages(u), self.mesh,
                                           self.basis.degree, self.cfl)
                if fm is not None:
                    dt_field = jnp.where(fm, dt_field, 0.0)
            stats = ()
            diag_out = None
            if self.method == "mood":
                u, stats, diag_out = self._mood_rk_step(u, t, dt)
            elif self.method == "implicit":
                u, stats = self._implicit_step(
                    u, t, dt if dt_field is None else dt_field,
                    u_guess=pred if carry_pred else None)
            elif use_post_diag:
                u, lam_new, minq = rk_mod.ssp_rk_step(
                    self.rhs, u, t, dt, self.ark, self.stage_times,
                    post_stage=lambda v, tt: self._fused_post(
                        self.apply_mask(v)),
                    dt_field=dt_field, post_diag=True)
                diag_out = (lam_new, minq)
            else:
                u = rk_mod.ssp_rk_step(self.rhs, u, t, dt, self.ark,
                                       self.stage_times,
                                       post_stage=self.post_stage,
                                       dt_field=dt_field)
            if diag_out is not None:
                from dflo_tpu.stab.positivity import EPS
                bad = ~(diag_out[1] >= EPS)   # NaN-safe
            elif self._fused_diag is not None:
                from dflo_tpu.stab.positivity import EPS
                _, minq = self._fused_diag(u)
                bad = ~(minq >= EPS)       # NaN-safe (blow-ups trip it too)
            else:
                bad = negative_average_flag(self.cell_averages(u), mask=fm)
            if self.method == "implicit":
                # Newton divergence aborts the run like the reference's
                # AssertThrow (src/claw.cc:919-923)
                bad = bad | stats.diverged
            if carry_lam:
                return u, dt, bad, stats, diag_out[0]
            if carry_pred:
                # extrapolated Newton seed for the NEXT step
                # (src/claw.cc:1104-1108: predictor = 2 u - u_old)
                return u, dt, bad, stats, 2.0 * u - u_in
            return u, dt, bad, stats
        return step

    def _multi_step(self, chunk: int):
        """jit a device-side loop of up to `chunk` steps with no host sync
        in between (the reference's per-step host control costs nothing on
        CPU/MPI but serializes dispatch on an accelerator).  Time is
        accumulated in Kahan compensated form so long f32 runs on TPU don't
        drift.  Returns (u, t, n_done, bad, last_stats)."""
        if chunk not in self._multi_cache:
            carry_lam = self._carry_lam_ok() and self._fused_diag is not None
            step = self._make_step(carry_lam=carry_lam)

            carry_pred = self._carry_pred

            def multi(u, t, t_end):
                zero = jnp.zeros((), t.dtype)
                # one mode-dependent extra carry slot: the CFL wave speed
                # (carry_lam) or the Newton predictor (carry_pred) —
                # mutually exclusive by method
                if carry_lam:
                    # seed once per chunk; thereafter the wave speed comes
                    # free from the final stage's fused post diagnostics
                    xtr0, _ = self._fused_diag(u)
                    st_shape = jax.eval_shape(step, u, t, t_end, xtr0)[3]
                elif carry_pred:
                    # first step's Newton seed is the solution itself
                    # (src/claw.cc:1003: predictor = current_solution)
                    xtr0 = u
                    st_shape = jax.eval_shape(step, u, t, t_end, None, u)[3]
                else:
                    xtr0 = zero
                    st_shape = jax.eval_shape(step, u, t, t_end)[3]
                stats0 = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), st_shape)

                def body(carry):
                    u, t, comp, it, _bad, _stats, xtr = carry
                    if carry_lam:
                        un, dt, bad, stats, xtr = step(u, t, t_end, xtr)
                    elif carry_pred:
                        un, dt, bad, stats, xtr = step(u, t, t_end, None,
                                                       xtr)
                    else:
                        un, dt, bad, stats = step(u, t, t_end)
                    y = dt - comp
                    t2 = t + y
                    comp = (t2 - t) - y
                    return un, t2, comp, it + 1, bad, stats, xtr

                def cond(carry):
                    _u, t, _c, it, bad, _s, _x = carry
                    return (t < t_end - 1e-12) & (it < chunk) & ~bad

                u, t, _c, it, bad, stats, _x = jax.lax.while_loop(
                    cond, body, (u, t, zero, jnp.asarray(0),
                                 jnp.asarray(False), stats0, xtr0))
                return u, t, it, bad, stats

            self._multi_cache[chunk] = jax.jit(multi)
        return self._multi_cache[chunk]

    # ------------------------------------------------------------------
    def run(self, u, t_end: float, t0: float = 0.0,
            callback: Callable | None = None, max_steps: int = 10**7,
            chunk: int = 1):
        """Advance u from t0 to t_end; callback(u, t, it) after every chunk.

        chunk > 1 runs that many steps inside ONE device-side while_loop per
        host round trip, removing the per-step dispatch sync (the throughput
        tax of the reference-style host loop on an accelerator); failure
        flags and callbacks are then checked at chunk granularity."""
        t, it = t0, 0
        # the reference limits the freshly-set IC before the first step
        # (src/claw.cc:997-1001); without this a projected discontinuous IC
        # can hand unlimited oscillations to the first flux evaluation
        u = self.post_stage(u, t0)
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
                    # the device loop (solver-dtype comparison) considers the
                    # run finished even though host-double t is still below
                    # t_end - 1e-12 (possible when float(dtype(t_end)) <
                    # t_end); without this break the host would re-dispatch
                    # zero-step chunks forever
                    break
            return u, t, it
        pred = u if self._carry_pred else None
        while t < t_end - 1e-12 and it < max_steps:
            if self._carry_pred:
                u, dt, bad, stats, pred = self._step(u, t, t_end, None, pred)
            else:
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
                # the step's t_end clamp (dt = min(dt, t_end - t), solver
                # dtype) returned 0: in f32, once host-double t enters the
                # half-ulp window below t_end (f32(t) == f32(t_end)) the
                # clamp underflows to exactly 0 while the host-double loop
                # condition is still true, and t += 0 would spin forever.
                # Final time is reached at solver precision — terminate.
                # (The reference's clamp is all-double, src/claw.cc:1026-1046,
                # which silently avoided this.)
                break
        return u, t, it
