"""MOOD a posteriori stabilization as a masked dense fixed point.

Re-implements the reference's MOOD cascade (src/mood.cc:1-491 pseudocode at
1-34; driver iterate_mood, src/claw.cc:777-871) in the TPU-native form
promised by SURVEY.md §7.1: instead of per-cell re-update lists and degree
states driving sparse recomputation, every MOOD pass recomputes the forward-
Euler candidate for ALL cells from the stage predictor with the current
per-cell degree truncation (dense compute is cheap; divergence is expensive),
inside a lax.while_loop that runs until no cell's degree changed.  This is
semantically equivalent: the reference resets every re-updated cell to the
stage predictor anyway (src/mood.cc:436-489), and untouched cells recompute
to identical values.

Per pass (apply_mood, src/mood.cc:290-400):
- DMP check on the new density average against the neighborhood min/max of
  the stage-predictor averages (+-1e-6, src/mood.cc:314-317).  NOTE the
  reference's compute_min_max_mood_var (src/mood.cc:75-115) re-initializes
  each cell's bounds after writing neighbor contributions, collapsing the
  bounds to the cell's own average; we implement the intended neighborhood
  min/max instead.
- u2 smoothness exemption (Diot): second-derivative Legendre coefficients
  sign-consistent and comparable across the neighborhood
  (src/mood.cc:233-282, eps = 0.5).
- failing cells with degree > 1 drop one degree (Pk modal truncation,
  src/mood.cc:174-191); failing degree-1 cells switch on the TVB limiter
  (src/mood.cc:335-340); failing degree-1 cells already marked spread the
  reduction to their neighbors (src/mood.cc:341-394).

MOOD requires the Pk basis and global time stepping (src/parameters.cc:536-544).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.contract import basis_reduce
from dflo_tpu.physics import euler

DMP_EPS = 1.0e-6     # src/mood.cc:296
U2_EPS = 0.5         # src/mood.cc:271
U2_TINY = 1.0e-12    # absolute guard: curvatures at roundoff level count as
                     # smooth (the raw Diot ratio test is sign-noise sensitive
                     # on exactly-flat data; not in the reference)


def neighborhood_min(a, valid):
    vW, vE, vS, vN = valid
    big = jnp.asarray(jnp.inf, a.dtype)
    m = a
    m = jnp.minimum(m, jnp.where(vW, jnp.roll(a, 1, -1), big))
    m = jnp.minimum(m, jnp.where(vE, jnp.roll(a, -1, -1), big))
    m = jnp.minimum(m, jnp.where(vS, jnp.roll(a, 1, -2), big))
    m = jnp.minimum(m, jnp.where(vN, jnp.roll(a, -1, -2), big))
    return m


def neighborhood_max(a, valid):
    vW, vE, vS, vN = valid
    big = jnp.asarray(-jnp.inf, a.dtype)
    m = a
    m = jnp.maximum(m, jnp.where(vW, jnp.roll(a, 1, -1), big))
    m = jnp.maximum(m, jnp.where(vE, jnp.roll(a, -1, -1), big))
    m = jnp.maximum(m, jnp.where(vS, jnp.roll(a, 1, -2), big))
    m = jnp.maximum(m, jnp.where(vN, jnp.roll(a, -1, -2), big))
    return m


def dilate4(flag):
    """4-neighborhood dilation of a bool field (neighbor spreading)."""
    out = flag
    out = out | jnp.roll(flag, 1, -1) | jnp.roll(flag, -1, -1)
    out = out | jnp.roll(flag, 1, -2) | jnp.roll(flag, -1, -2)
    return out


# ---------------------------------------------------------------------------
# Window-reduction forms of the plus-stencil neighborhood ops (UTILITIES —
# not used by make_mood).  A plus stencil is separable into two 3-wide 1-D
# reduce_windows whose 'SAME' identity padding reproduces the non-periodic
# neighbor_valid semantics.  Measured on v5e: perf-NEUTRAL vs the roll
# forms (0.572 vs 0.539 ms per check chain at bench shapes) — and inside a
# SHARDED jitted step the SPMD partitioner produced WRONG results for the
# in-loop reduce_windows (the cascade silently stopped firing; every
# isolated-op probe was exact).  make_mood therefore uses the
# validity-masked roll forms everywhere; these stay for reference and for
# the fused-check equivalence test, with the hazard documented.
# ---------------------------------------------------------------------------

def plus_min(a):
    """min over the plus stencil {c, W, E, S, N}, boundary = identity."""
    init = jnp.asarray(jnp.inf, a.dtype)
    mx = jax.lax.reduce_window(a, init, jax.lax.min, (1, 3), (1, 1), "SAME")
    my = jax.lax.reduce_window(a, init, jax.lax.min, (3, 1), (1, 1), "SAME")
    return jnp.minimum(mx, my)


def plus_max(a):
    """max over the plus stencil {c, W, E, S, N}, boundary = identity."""
    init = jnp.asarray(-jnp.inf, a.dtype)
    mx = jax.lax.reduce_window(a, init, jax.lax.max, (1, 3), (1, 1), "SAME")
    my = jax.lax.reduce_window(a, init, jax.lax.max, (3, 1), (1, 1), "SAME")
    return jnp.maximum(mx, my)


def dilate4_valid(flag, valid):
    """Validity-masked 4-neighborhood dilation: spread reaches only
    EXISTING face neighbors (src/mood.cc:341-394) — non-wrapping at
    domain boundaries, correctly wrapping under periodicity (where the
    valid flags are all-true and the rolls wrap).  Roll-based, so it
    partitions exactly under GSPMD."""
    vW, vE, vS, vN = valid
    out = flag
    out = out | (vW & jnp.roll(flag, 1, -1)) | (vE & jnp.roll(flag, -1, -1))
    out = out | (vS & jnp.roll(flag, 1, -2)) | (vN & jnp.roll(flag, -1, -2))
    return out


def dilate4_window(flag):
    """Non-wrapping 4-neighborhood dilation (the reference's neighbor
    spread touches actual face neighbors only, src/mood.cc:341-394; the
    roll form wraps at domain edges)."""
    f = flag.astype(jnp.int8)
    init = jnp.asarray(0, jnp.int8)
    mx = jax.lax.reduce_window(f, init, jax.lax.max, (1, 3), (1, 1), "SAME")
    my = jax.lax.reduce_window(f, init, jax.lax.max, (3, 1), (1, 1), "SAME")
    return (mx | my).astype(bool)


class MoodStats(NamedTuple):
    """Per-stage cascade counters, the analog of the reference's
    n_reduce / n_re_update / n_reset printout (src/claw.cc:851).  In the
    dense masked formulation every cell is re-evaluated each pass, so the
    honest counters are: total degree reductions, cells handed to the TVB
    limiter, and fixed-point passes."""
    n_reduce: jax.Array     # sum over cells of (p - final degree)
    n_marked: jax.Array     # cells with the limiter switched on
    iters: jax.Array        # cascade passes until the degree map settled


def make_mood(basis: basis_mod.Basis, mesh, rhs, per_x: bool = False,
              per_y: bool = False, mask=None, dtype=None, max_iters: int = 20,
              positivity=None, dmp_bounds: str = "neighborhood",
              fused_trunc_pos=None, sparse_mode: str = "auto",
              sharded: bool = False):
    """Build mood_stage(u_pre, t, dt) -> (u_candidate, limiter_marked,
    MoodStats).

    dmp_bounds selects the discrete-maximum-principle interval:
      'neighborhood' (default) — min/max of the density average over
        {cell, 4 face neighbors}, the published MOOD criterion and what
        compute_min_max_mood_var INTENDS (src/mood.cc:75-115);
      'collapsed' — what the reference's loop actually EXECUTES: its
        neighbor updates write `min_mood_var[cn] = min(.., avg[cn])`
        (src/mood.cc:95-110), a self-assignment, so every cell's interval
        collapses to [rho_c, rho_c] and the DMP check degenerates to
        |drho| <= 1e-6 per stage.  Kept only for side-by-side validation of
        the deviation (tests/test_mood.py); 'collapsed' marks a superset of
        'neighborhood' cells, so the default is strictly less dissipative
        while still enforcing the published DMP.

    u_pre is the stage predictor; the returned candidate is the accepted
    forward-Euler update u_pre + dt*R under the final degree map; marked
    flags cells whose TVB limiter the cascade switched on.

    positivity: optional Zhang-Shu limiter (u, ubar) -> u applied to the
    degree-truncated predictor before each candidate rhs evaluation.  Modal
    truncation does not preserve point positivity (only the mean), so at
    strong shocks an un-relimited truncated polynomial can hand negative
    density/pressure trace values to the Riemann flux; re-applying Zhang-Shu
    after truncation restores the positivity invariant the candidate update
    relies on (the reference's fused positivity-inside-the-limiter-loop
    pattern, src_mpi/limiter.cc:230,389,549).

    fused_trunc_pos: optional fused {truncation -> positivity} kernel
    (u, deg) -> u_t (ops/pallas_kernels.make_fused_modal_pos) replacing the
    XLA truncation gather + positivity chain on TPU.

    Warm start: mood_stage(u_pre, t, dt, deg_in) with an int32 [ny, nx]
    per-cell degree map starts the cascade AT deg_in instead of re-cascading
    from p, and returns a 4-tuple (..., deg_settled) so the caller can carry
    the map across stages/steps (the degree-recovery policy — when and by
    how much carried degrees ratchet back up toward p — belongs to the
    caller, see driver._mood_rk_step).  The reference re-cascades from full
    degree every stage (src/mood.cc:436-489); warm start reaches the same
    accepted states through strictly fewer candidate evaluations wherever
    the settled map is stable between stages, at the price of testing
    degree recovery only as often as the caller raises deg_in."""
    dtype = dtype or jnp.zeros(0).dtype
    if basis.family != "Pk":
        raise ValueError("MOOD is implemented only for Pk "
                         "(src/parameters.cc:541-544)")
    p = basis.degree
    K = basis.K

    from dflo_tpu.stab.limiter import neighbor_valid
    valid = tuple(jnp.asarray(v) for v in
                  neighbor_valid((mesh.ny, mesh.nx), per_x, per_y, mask))
    # Plus-stencil ops: validity-masked ROLL forms everywhere.  The
    # neighbor min/max were always validity-masked (non-wrapping at domain
    # boundaries); the r5 change makes the SPREAD dilation validity-masked
    # too — the reference spreads to existing face neighbors only
    # (src/mood.cc:341-394); the old unmasked dilate4 wrapped at domain
    # edges.  reduce_window ('SAME') forms were built and are KEPT as
    # utilities (plus_min/plus_max/dilate4_window, measured perf-neutral
    # on v5e) but are NOT used here: inside the sharded jitted step the
    # SPMD partitioner produced wrong results for the in-loop
    # reduce_windows (measured: the sharded cascade silently stopped
    # firing, 5 -> 0 reductions on the parallel equality test), while
    # rolls partition exactly.  The fused check kernel (TPU single-chip)
    # implements the same validity-masked semantics in-kernel.
    nb_min = lambda a, v=valid: neighborhood_min(a, v)     # noqa: E731
    nb_max = lambda a, v=valid: neighborhood_max(a, v)     # noqa: E731
    dilate = lambda f, v=valid: dilate4_valid(f, v)        # noqa: E731

    # truncation masks: keep modes with total degree <= d  (src/mood.cc:174-191)
    trunc = np.zeros((p + 1, K))
    for d in range(p + 1):
        trunc[d] = (basis.mode_degree <= d).astype(float)
    trunc = jnp.asarray(trunc, dtype)
    avg_np = basis.wq2 @ basis.V
    avg_op = jnp.asarray(avg_np, dtype)
    # modal Legendre: mode 0 IS the cell mean, so averages are one plane
    # slice instead of a whole-state contraction (the other coefficients of
    # avg_np are quadrature roundoff, < 1e-13)
    mode0_mean = float(np.abs(avg_np[1:]).max()) < 1e-13
    avg0 = float(avg_np[0])

    def rho_mean(u):
        if mode0_mean:
            return avg0 * u[euler.RHO, 0]
        return basis_reduce(avg_op, u)[euler.RHO]

    # u2 second-derivative coefficient positions (src/mood.cc:215-231)
    if p >= 2:
        ix_xx, ix_yy = 2, 2 * p + 1

    def u2_ok(u):
        """Diot's u2 smoothness exemption on the density Legendre
        coefficients (src/mood.cc:240-282)."""
        if p < 2:
            return jnp.zeros(u.shape[-2:], bool)
        ok = jnp.ones(u.shape[-2:], bool)
        for ix in (ix_xx, ix_yy):
            D2 = u[euler.RHO, ix]
            mn = nb_min(D2)
            mx = nb_max(D2)
            amn = jnp.abs(mn)
            amx = jnp.abs(mx)
            flat = jnp.maximum(amn, amx) < U2_TINY
            ok = ok & (flat | ((mn * mx >= 0)
                               & (amn >= amx * (1.0 - U2_EPS))))
        return ok

    if dmp_bounds not in ("neighborhood", "collapsed"):
        raise ValueError(f"unknown dmp_bounds {dmp_bounds!r}")

    use_fused = fused_trunc_pos is not None and positivity is not None
    # Sparse re-update (src/claw.cc:806-852): cascade passes after the
    # first only change the candidate at cells whose degree changed plus
    # their face neighbors, so when the rhs exposes a sparse tile kernel
    # (solver/spatial sparse_candidate on the fused Pk path), later passes
    # recompute ONLY the affected 8x128 tiles — the TPU analog of the
    # reference's re_update cell list.  The pallas grid is DYNAMIC (exactly
    # as many programs as affected tiles), so there is no capacity/overflow
    # tradeoff and no runtime dense fallback.
    sparse_fn = getattr(rhs, "sparse_candidate", None)
    use_sparse = (sparse_mode != "off"
                  and use_fused and sparse_fn is not None and mask is None
                  and mesh.ny % 8 == 0 and mesh.nx % 128 == 0)
    if use_sparse:
        ni_t, nj_t = mesh.ny // 8, mesh.nx // 128
    # fused acceptance check (r5): DMP + u2 + spread bookkeeping as one
    # VMEM plane kernel instead of ~10 whole-plane XLA window/select passes
    # per cascade iteration (make_fused_mood_check)
    fused_check = None
    # sharded=True: the state arrays are GSPMD-sharded and a plain
    # pallas_call cannot consume them — the sharded MOOD path keeps the
    # XLA check (its window ops partition fine under GSPMD)
    if (use_fused and not sharded and mask is None and p >= 2
            and mesh.ny % 8 == 0):
        try:
            from dflo_tpu.ops.pallas_kernels import make_fused_mood_check
            fused_check = make_fused_mood_check(basis, mesh, per_x=per_x,
                                                per_y=per_y, dtype=dtype)
        except ValueError:
            fused_check = None       # outside the kernel's shape envelope
    # Candidate form: {trunc -> pos} pass (fused kernel on TPU) followed by
    # a plain XLA axpy on the rhs output.  Two "obvious" fusions were built
    # and MEASURED SLOWER on v5e (see PERF.md negative results): the
    # in-kernel a=0 SSP blend (rhs.stage — the extra u_old tile read costs
    # more than the axpy it saves) and the one-pass modal_tp candidate
    # kernel (rhs.mood_candidate — in-kernel tp of the tile + halo strips
    # adds VPU work to an already compute-bound kernel).  Both entry points
    # remain available and tested; no driver path uses them.

    def mood_stage(u_pre, t, dt, deg_in=None):
        if use_fused or positivity is None:
            rho0 = rho_mean(u_pre)
            ubar0 = None            # full averages only feed XLA positivity
        else:
            ubar0 = basis_reduce(avg_op, u_pre)
            rho0 = ubar0[euler.RHO]
        if dmp_bounds == "collapsed":
            dmp_min = dmp_max = rho0
        else:
            dmp_min = nb_min(rho0)
            dmp_max = nb_max(rho0)

        if deg_in is None:
            deg0 = jnp.full(u_pre.shape[-2:], p, jnp.int32)
        else:
            deg0 = jnp.clip(deg_in.astype(jnp.int32), 1, p)
        lim0 = jnp.zeros(u_pre.shape[-2:], bool)

        def candidate(deg):
            if use_fused:
                # one VMEM pass: truncation + positivity, no HBM temps
                u_t = fused_trunc_pos(u_pre, deg)
            else:
                tm = trunc[deg]                      # [ny, nx, K]
                u_t = u_pre * jnp.moveaxis(tm, -1, 0)[None]
                if positivity is not None:
                    # truncation keeps the mean (mode 0) but not positivity
                    # at the quadrature/trace points; re-limit before the
                    # flux eval
                    u_t = positivity(u_t, ubar0)
            return u_t + dt * rhs(u_t, t)

        def check_update(deg, lim, u_c, it):
            """DMP acceptance + degree-reduction/mark bookkeeping on a
            candidate (apply_mood, src/mood.cc:290-491)."""
            if fused_check is not None:
                cand3 = jnp.stack([u_c[euler.RHO, 0], u_c[euler.RHO, ix_xx],
                                   u_c[euler.RHO, ix_yy]])
                deg_new, lim_new, chg = fused_check(cand3, dmp_min, dmp_max,
                                                    deg, lim)
                return (deg_new, lim_new, u_c, it + 1, chg)
            rho = rho_mean(u_c)
            dmp = (rho - dmp_min > -DMP_EPS) & (rho - dmp_max < DMP_EPS)
            ok = dmp | u2_ok(u_c)
            fail = ~ok
            if mask is not None:
                fail = fail & jnp.asarray(mask)

            red_self = fail & (deg > 1)
            mark_self = fail & (deg == 1) & ~lim
            spread = fail & (deg == 1) & lim
            nb = dilate(spread)
            red_nb = nb & (deg > 1) & ~red_self
            mark_nb = nb & (deg == 1) & ~lim & ~mark_self

            deg_new = deg - (red_self | red_nb).astype(deg.dtype)
            lim_new = lim | mark_self | mark_nb
            # the per-cell change MASK rides the carry (not just its any())
            # so the sparse pass knows WHICH cells' candidates to redo
            chg = red_self | red_nb
            return (deg_new, lim_new, u_c, it + 1, chg)

        def body(carry):
            deg, lim, u_c, it, chg = carry
            if use_sparse:
                # candidate values change only where deg changed or a face
                # neighbor's deg changed
                aff = chg | dilate(chg)
                tiles = aff.reshape(ni_t, 8, nj_t, 128).any(axis=(1, 3))
                cnt = jnp.sum(tiles)
                ty_, tx_ = jnp.nonzero(tiles, size=ni_t * nj_t,
                                       fill_value=0)
                u_new = sparse_fn(u_pre, u_c, deg, t, dt,
                                  ty_.astype(jnp.int32),
                                  tx_.astype(jnp.int32),
                                  cnt.astype(jnp.int32))
            else:
                u_new = candidate(deg)
            return check_update(deg, lim, u_new, it)

        def cond(carry):
            _, _, _, it, chg = carry
            return jnp.any(chg) & (it < max_iters)

        # ---- pass 1, peeled out of the loop ---------------------------
        # With deg_in None the entry degrees are p everywhere: truncation
        # is the identity, and the positivity pre-limit is skipped too —
        # the reference's first cascade pass assembles the UNMODIFIED stage
        # predictor (src/claw.cc:806-812), and the driver chain positivity-
        # limited u_pre one op earlier (src/claw.cc:866-869), so the
        # {trunc -> pos} kernel was an identity costing a full VMEM pass
        # per stage.  (Truncation-only XLA mood keeps its exact all-ones
        # multiply semantics: u * 1 is bitwise u.)
        if deg_in is None:
            u_c0 = u_pre + dt * rhs(u_pre, t)
        else:
            u_c0 = candidate(deg0)
        carry = check_update(deg0, lim0, u_c0, jnp.asarray(0))
        # each pass recomputes the candidate with the degrees as of pass
        # entry; on exit with changed == False that candidate is consistent
        # with the settled degree map, exactly the accepted MOOD state
        deg, lim, u_c, it, changed = jax.lax.while_loop(cond, body, carry)
        stats = MoodStats(jnp.sum(p - deg), jnp.sum(lim), it)
        if deg_in is not None:
            return u_c, lim, stats, deg
        return u_c, lim, stats

    return mood_stage
