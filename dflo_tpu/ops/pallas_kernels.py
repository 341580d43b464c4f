"""Pallas TPU kernels for the hot ops.

The DG residual is small-K tensor-contraction bound (K = (p+1)^2 local DoFs,
far below the 128-wide MXU tiles), so XLA fusions already sit near the
practical roofline; the hand-written kernels here buy the remaining ~10-20%
on the volume term by keeping the state tile resident in VMEM through
{flux evaluation -> dual-direction lift} with zero HBM round-trips for the
intermediate flux arrays (src/assemble_explicit.cc:29-120's hot loop 1).

Enabled with make_rhs(..., volume_kernel='pallas'); numerically identical to
the XLA path (same operations, f32).  Falls back to interpret mode off-TPU,
so the CPU test suite exercises the identical kernel code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dflo_tpu.physics import euler

#: debug escape hatch: force interpret mode even on TPU (bit-exact
#: reference semantics for isolating Mosaic compilation issues)
FORCE_INTERPRET = False


def _interpret() -> bool:
    return FORCE_INTERPRET or jax.devices()[0].platform in ("cpu",)



#: row-tile height for the fused kernels (multiple of 8).  8 is the Mosaic
#: minimum; larger tiles cut the up/dn halo-row staging cost (the XLA
#: row-gather moves 2/TY of the state per call) at the price of VMEM
#: footprint.  Overridable for experiments; _pick_ty clamps to a divisor.
TILE_TY = 8


def _pick_ty(ny: int) -> int:
    if ny % 8:
        return ny
    ty = min(TILE_TY, ny)
    ty -= ty % 8
    while ty > 8 and ny % ty:
        ty -= 8
    return max(ty, 8) if ny % 8 == 0 else ny


def _pick_tx(nx: int) -> int:
    """Lane-tile width: largest 128-multiple divisor up to 512, else the
    full (ragged) width — a block dim equal to the array dim is always legal
    and Mosaic lane-pads it internally."""
    for cand in (512, 384, 256, 128):
        if nx % cand == 0:
            return cand
    return nx


def _strip_sx(TX: int) -> int:
    """Lane width of the lf/rt neighbor edge blocks.  For lane-aligned tiles
    a 128-lane block (one lane tile) suffices; a ragged TX cannot be
    sub-blocked (the edge offset arithmetic needs TX == r * SX exactly), so
    the strip degenerates to the whole neighbor tile width."""
    return 128 if TX % 128 == 0 else TX


def _pad_y(ny: int) -> int:
    """Rows of internal padding that make the sublane tiling legal:
    0 when ny is already a multiple of 8, else up to 7 solid rows
    (the padded state rides the masked-kernel machinery; the true north/
    south boundary fluxes arrive as delta strips at their global rows)."""
    return (-ny) % 8


def fused_shape_ok(ny: int, nx: int) -> bool:
    """Can (ny, nx) ride the fused kernels on one chip?  Always true except
    for huge lane-ragged widths, where the mandatory full-width tile would
    blow VMEM (ragged nx cannot be sub-blocked)."""
    if nx % 128 == 0 or _pick_tx(nx) != nx:
        return True
    return -(-nx // 128) * 128 <= 1024


def _cmm(op, slabs):
    """Static-unrolled sparse matmul over VMEM slabs.

    out[m] = sum_k op[m, k] * slabs[k], with `op` a NUMPY matrix baked into
    the instruction stream at trace time.  Exact zeros are skipped — the
    tensor-product trace/lift operators of a collocated Qk basis are ~2/3
    zeros (a face trace only touches one line of nodes, src/equation.h's
    fe_face_values sparsity made explicit) — and unit coefficients skip the
    multiply.  Compared to an in-kernel jnp.dot this removes BOTH the
    [K, c*ty*tx] relayout (moveaxis+reshape forces a VMEM transpose) and the
    dead MXU lanes of a K~9 contraction; the VPU does ~1/3 the dense FLOPs
    on naturally-laid-out tiles.
    """
    outs = []
    for m in range(op.shape[0]):
        acc = None
        for k in range(op.shape[1]):
            co = float(op[m, k])
            if co == 0.0:
                continue
            t = slabs[k] if co == 1.0 else co * slabs[k]
            acc = t if acc is None else acc + t
        outs.append(acc if acc is not None else jnp.zeros_like(slabs[0]))
    return outs


def _volume_kernel(L_ref, u_ref, out_ref, *, K):
    """One (TY, TX) tile: collocated flux evaluation + stacked lift.

    u_ref  : [4, K, TY, TX] conserved DoFs (= point values, collocated)
    L_ref  : [K, 2K] stacked lift  [dy*GxW.T | dx*GyW.T]
    out_ref: [4, K, TY, TX] volume residual contribution
    """
    W = u_ref[:]
    rho = W[euler.RHO]
    p = (euler.GAMMA - 1.0) * (W[euler.ENE]
                               - 0.5 * (W[euler.MX]**2 + W[euler.MY]**2) / rho)
    uvel = W[euler.MX] / rho
    vvel = W[euler.MY] / rho
    Fx = jnp.stack([W[euler.MX] * uvel + p, W[euler.MY] * uvel,
                    W[euler.MX], (W[euler.ENE] + p) * uvel])
    Fy = jnp.stack([W[euler.MX] * vvel, W[euler.MY] * vvel + p,
                    W[euler.MY], (W[euler.ENE] + p) * vvel])
    F = jnp.concatenate([Fx, Fy], axis=1)               # [4, 2K, TY, TX]
    ty, tx = F.shape[2], F.shape[3]
    Ff = jnp.moveaxis(F, 1, 0).reshape(2 * K, -1)
    R = jnp.dot(L_ref[:], Ff, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.moveaxis(R.reshape(K, 4, ty, tx), 0, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _volume_call(lift, u, interpret=False):
    c, K, ny, nx = u.shape
    # tile: full rows of cells; sized to keep in+out+flux-temps well inside
    # the ~16 MB VMEM (4*K*TY*TX*4B each, F temp is 2x)
    TX = nx
    TY = max(8, min(ny, (2 * 1024 * 1024) // (4 * K * TX * 4)) // 8 * 8)
    while ny % TY:            # sublane rule: TY multiple of 8 (or == ny)
        TY -= 8
        if TY <= 0:
            TY = ny
            break
    return pl.pallas_call(
        functools.partial(_volume_kernel, K=K),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(ny // TY,),
        in_specs=[pl.BlockSpec((K, 2 * K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, K, TY, TX), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, K, TY, TX), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lift, u)


def volume_residual(lift, u):
    """Fused volume term: returns lift-contracted fluxes of the collocated
    state u[4, K, ny, nx] (the `R = [dy GxW.T | dx GyW.T] @ [Fx; Fy]`
    contraction of dflo_tpu.solver.spatial).  Uses the compiled kernel on
    TPU, interpret mode elsewhere."""
    return _volume_call(lift, u, interpret=_interpret())


# ---------------------------------------------------------------------------
# Fully-fused DG residual: {volume flux -> trace eval -> Riemann flux ->
# face lift -> mass solve} in ONE VMEM-resident pass over the state.
#
# This is the SURVEY.md §7.3(6) "face pipeline" battle: the XLA path
# materializes the trace stack, the per-direction interface fluxes and the
# lift results as separate HBM arrays (~35x the 2-state-array roofline
# traffic measured on v5e); here each row-band of cells is loaded once,
# everything happens in VMEM, and one residual tile is written back.
#
# Neighbor access without halos: interface fluxes are evaluated ONCE PER
# SIDE with bitwise-identical operands (the AMR tile-pool's "canonical
# recompute" trick, dflo_tpu/amr_pool.py) — the x-direction neighbor is a
# lane roll inside the tile (full-width tiles make it the global wrap), and
# the y-direction neighbors arrive as whole-state rolls prepared by XLA
# outside.  The kernel therefore computes the PERIODIC residual everywhere;
# the caller passes per-side delta-flux strips (true boundary flux minus
# the wrap flux the kernel used) which the kernel lifts into its edge
# rows/columns — zero extra HBM round trips for corrections.
# ---------------------------------------------------------------------------


def _modal_tp_slabs(slabs, dg, *, mode_deg, avg0, P_np, dtype):
    """{Pk degree truncation -> Zhang-Shu positivity} on slab lists.

    slabs: list of K mode slabs, each [4, *sp]; dg [*sp] int32.  Returns the
    limited slab list.  The shared body of make_fused_modal_pos's kernel in
    layout-free form, so the fused residual kernel can apply the same chain
    to its state tile AND its halo row/column strips before tracing (the
    one-pass MOOD candidate) with no in-kernel transposes.  Numerically
    identical to stab/mood truncation (src/mood.cc:174-191) + stab/positivity
    (src/positivity.cc:16-208) with dtype-aware floors."""
    K = len(slabs)
    slabs = [jnp.where(dg >= mode_deg[kk], slabs[kk], 0.0)
             if mode_deg[kk] > 0 else slabs[kk] for kk in range(K)]
    return _modal_pos_slabs(slabs, avg0=avg0, P_np=P_np, dtype=dtype)


def _modal_pos_slabs(slabs, *, avg0, P_np, dtype):
    """Zhang-Shu positivity on modal slab lists (the pos half of
    _modal_tp_slabs, callable on its own by kernels that already hold a
    truncation-free state — e.g. the fused Pk per-stage post)."""
    from dflo_tpu.stab.positivity import EPS, REL_F32
    K = len(slabs)
    ub = avg0 * slabs[0]                            # [4, *sp]
    if dtype != jnp.float64:
        eps_r = jnp.maximum(EPS, REL_F32 * ub[euler.RHO])
        p_avg = (euler.GAMMA - 1.0) * (
            ub[euler.ENE] - 0.5 * (ub[euler.MX] ** 2 + ub[euler.MY] ** 2)
            / ub[euler.RHO])
        eps_p = jnp.maximum(EPS, REL_F32 * p_avg)[None]
    else:
        eps_r = EPS
        eps_p = EPS
    Wp = jnp.stack(_cmm(P_np, slabs), axis=1)       # [4, Qp, *sp]
    rho_min = jnp.min(Wp[euler.RHO], axis=0)
    rho_avg = ub[euler.RHO]
    rat = jnp.abs(rho_avg - eps_r) / (jnp.abs(rho_avg - rho_min) + 1.0e-13)
    theta1 = jnp.minimum(rat, 1.0)                  # [*sp]
    rho_new = [slabs[0][euler.RHO] * theta1 + rho_avg * (1.0 - theta1)] + \
        [slabs[kk][euler.RHO] * theta1 for kk in range(1, K)]
    slabs = [jnp.stack([rho_new[kk] if ci == euler.RHO else slabs[kk][ci]
                        for ci in range(4)]) for kk in range(K)]
    Wp = jnp.stack([Wp[ci] * theta1[None] + rho_avg[None] * (1.0 - theta1)
                    if ci == euler.RHO else Wp[ci] for ci in range(4)])
    pre = (euler.GAMMA - 1.0) * (
        Wp[euler.ENE] - 0.5 * (Wp[euler.MX] ** 2 + Wp[euler.MY] ** 2)
        / Wp[euler.RHO])
    d = Wp - ub[:, None]
    drho, dE = d[euler.RHO], d[euler.ENE]
    dmx, dmy = d[euler.MX], d[euler.MY]
    mavg_x, mavg_y = ub[euler.MX][None], ub[euler.MY][None]
    ravg, Eavg = ub[euler.RHO][None], ub[euler.ENE][None]
    a1 = 2.0 * drho * dE - (dmx * dmx + dmy * dmy)
    b1 = (2.0 * drho * (Eavg - eps_p / (euler.GAMMA - 1.0))
          + 2.0 * ravg * dE - 2.0 * (mavg_x * dmx + mavg_y * dmy))
    c1 = (2.0 * ravg * Eavg - (mavg_x ** 2 + mavg_y ** 2)
          - 2.0 * eps_p * ravg / (euler.GAMMA - 1.0))
    a1s = jnp.where(a1 == 0.0, 1.0, a1)
    b1n, c1n = b1 / a1s, c1 / a1s
    Dq = jnp.sqrt(jnp.abs(b1n * b1n - 4.0 * c1n))
    t1 = 0.5 * (-b1n - Dq)
    t2 = 0.5 * (-b1n + Dq)
    t1_ok = (t1 > -1.0e-12) & (t1 < 1.0 + 1.0e-12)
    t = jnp.where(t1_ok, t1, t2)
    t = jnp.clip(t, 0.0, 1.0)
    t = jnp.where(jnp.abs(1.0 - t) < 1.0e-14, 0.0, t)
    t = jnp.where(pre < eps_p, t, 1.0)
    theta2 = jnp.min(t, axis=0)                     # [*sp]
    return [jnp.stack([slabs[0][ci] * theta2 + ub[ci] * (1.0 - theta2)
                       for ci in range(4)])] + \
        [slabs[kk] * theta2[None] for kk in range(1, K)]


def _fused_kernel(*refs, ops, K, nq, flux_name, per_x, per_y, blend, masked,
                  collocated=True, Q=None, ny_true=None, nx_true=None,
                  source=None, wb_iso=False, inv_dx=None, inv_dy=None,
                  modal_tp=False, sparse_nij=None):
    from dflo_tpu.physics.fluxes import get_flux
    num_flux = get_flux(flux_name, kernel_safe=True)
    refs = list(refs)
    if sparse_nij is not None:
        # SPARSE tile grid (the MOOD re-update set, src/claw.cc:806-852):
        # a 1-D grid over a compact list of affected tiles; the tile
        # coordinates arrive as scalar-prefetch refs and replace
        # program_id, so every BlockSpec/body index below is dynamic.
        # The second-to-last ref is the aliased previous-candidate buffer
        # (untouched tiles keep their accepted values) — never read.
        ps = pl.program_id(0)
        iy_ref, ix_ref = refs[0], refs[1]
        del refs[0:2]
        del refs[-2]
        i_dyn, j_dyn = iy_ref[ps], ix_ref[ps]
    if masked:
        # solid-cell mask tiles (self + 4 halo neighbors), fluid = 1;
        # fluid-solid interfaces get slip-wall mirror operands and solid
        # residuals are zeroed (mirrors the XLA path's wallx/wally logic)
        m_ref, m_up_ref, m_dn_ref, m_lf_ref, m_rt_ref = refs[5:10]
        del refs[5:10]
    if source is not None:
        # body-force inputs: quadrature-point coordinate tiles + the time
        # scalar (src/equation.h:829-850 gravity / src_mpi external force)
        xq_ref, yq_ref, t_ref = refs[9:12]
        del refs[9:12]
    elif wb_iso:
        # well-balanced isothermal gravity: the nodal potential plane
        # (src_gll/assemble_explicit.cc:30-135)
        phi_ref = refs[9]
        del refs[9:10]
    if modal_tp:
        # one-pass MOOD candidate: per-cell degree map tile + its halo
        # strips (same BlockSpec scheme as the state), and the [dt] scalar;
        # the kernel applies {Pk truncation -> positivity} to the state AND
        # every consumed halo strip before tracing, then emits
        # u_t + dt * R(u_t) directly (stab/mood.py candidate() as ONE
        # VMEM pass instead of the separate trunc+pos kernel + blend pass)
        (deg_ref, dup_ref, ddn_ref, dlf_ref, drt_ref, tp_sc_ref) = refs[9:15]
        del refs[9:15]
    if blend:
        # extra inputs: the previous-step state tile + [a, dt] scalars;
        # the kernel then emits the complete SSP stage
        # a*u_old + (1-a)*(u + dt*R) (src/claw.cc:757-760) — the separate
        # axpy pass and its 4 state-sized HBM transfers disappear
        (u_ref, up_ref, dn_ref, lf_ref, rt_ref,
         dfw_ref, dfe_ref, dfs_ref, dfn_ref,
         uold_ref, sc_ref, out_ref) = refs
    else:
        (u_ref, up_ref, dn_ref, lf_ref, rt_ref,
         dfw_ref, dfe_ref, dfs_ref, dfn_ref, out_ref) = refs
    if sparse_nij is not None:
        i, j = i_dyn, j_dyn
        n_i, n_j = sparse_nij
    else:
        i = pl.program_id(0)
        j = pl.program_id(1)
        n_i = pl.num_programs(0)
        n_j = pl.num_programs(1)
    # operators as baked trace-time constants (sparse-unrolled VPU FMAs,
    # see _cmm); faceV rows are the UNWEIGHTED traces, `lift` carries the
    # mass-solved scaled volume+face lift with face signs folded
    faceV, avg_row, lift_all = ops["faceV"], ops["avg"], ops["lift"]

    def traces(tile):
        """[4,K,ty,tx] -> (uW,uE,uS,uN,ub) via sparse-unrolled FMAs."""
        slabs = [tile[:, kk] for kk in range(K)]
        sides = [jnp.stack(_cmm(faceV[f], slabs), axis=1) for f in range(4)]
        ubar = _cmm(avg_row, slabs)[0]
        return sides[0], sides[1], sides[2], sides[3], ubar

    W = u_ref[:]
    c, k, ty, tx = W.shape
    if modal_tp:
        # {truncation -> positivity} on the state tile BEFORE tracing: the
        # candidate is evaluated at u_t, exactly stab/mood.py candidate()
        tp_kw = dict(mode_deg=ops["mode_deg"], avg0=ops["avg0"],
                     P_np=ops["P"], dtype=W.dtype)
        W = jnp.stack(
            _modal_tp_slabs([W[:, kk] for kk in range(K)], deg_ref[:],
                            **tp_kw), axis=1)
    uW, uE, uS, uN, ub = traces(W)
    # Halo inputs arrive as STRIPS, not whole neighbor tiles: only one face
    # row/column of each neighbor is ever consumed.  lf/rt fetch the
    # neighbors' 128-lane edge block [c,k,ty,<=128]; up/dn fetch ONE row
    # [1,c,1,k,tx] out of a row-gathered side array keyed by tile index
    # (Mosaic's 8-sublane block rule forbids 1-row blocks of u itself).
    # Net: ~5x less halo HBM traffic than full tiles (VERDICT r2 weak #2).

    def row_trace(tile_ref, side, dg_row=None):
        """face trace + avg of a [1,c,1,k,tx] row strip
        -> [c,nq,1,tx],[c,1,tx].  dg_row [1,tx]: tp the strip first."""
        slabs = [tile_ref[0, :, :, kk, :] for kk in range(K)]   # [c,1,tx]
        if dg_row is not None:
            slabs = _modal_tp_slabs(slabs, dg_row, **tp_kw)
        face = jnp.stack(_cmm(faceV[side], slabs), axis=1)   # [c,nq,1,tx]
        ab = _cmm(avg_row, slabs)[0]                         # [c,1,tx]
        return face, ab

    def col_trace(tile_ref, side, last, dg_ref=None):
        """face trace + avg of ONE column of an edge strip
        -> [c,nq,ty,1],[c,ty,1].  dg_ref [ty,sx]: tp the column first."""
        sx = tile_ref.shape[-1]
        cc = sx - 1 if last else 0
        slabs = [tile_ref[:, kk, :, cc:cc + 1] for kk in range(K)]
        if dg_ref is not None:
            slabs = _modal_tp_slabs(slabs, dg_ref[:, cc:cc + 1], **tp_kw)
        face = jnp.stack(_cmm(faceV[side], slabs), axis=1)
        ab = _cmm(avg_row, slabs)[0]
        return face, ab

    # up strip: its NORTH face (the neighbor's last row); dn strip: SOUTH
    # face (first row); lf/rt strips: the single adjacent column's E/W face
    if sparse_nij is not None:
        # sparse tile grid: up/dn arrive as FULL neighbor tiles of u (and
        # deg) — the dense path's row-gathered side arrays would cost a
        # whole-state XLA transpose per cascade pass; reading one row of a
        # dynamically-indexed full tile costs only the extra DMA bytes
        def row_trace_full(tile_ref, side, row0, dg_full):
            sl = slice(row0, row0 + 1)
            slabs = [tile_ref[:, kk, sl, :] for kk in range(K)]  # [c,1,tx]
            if dg_full is not None:
                slabs = _modal_tp_slabs(slabs, dg_full[sl, :], **tp_kw)
            face = jnp.stack(_cmm(faceV[side], slabs), axis=1)
            ab = _cmm(avg_row, slabs)[0]
            return face, ab

        up_uN_last, up_ub_last = row_trace_full(
            up_ref, 3, ty - 1, dup_ref if modal_tp else None)
        dn_uS_first, dn_ub_first = row_trace_full(
            dn_ref, 2, 0, ddn_ref if modal_tp else None)
    else:
        dgu = dup_ref[0] if modal_tp else None
        dgd = ddn_ref[0] if modal_tp else None
        up_uN_last, up_ub_last = row_trace(up_ref, 3, dgu)  # [c,nq,1,tx]
        dn_uS_first, dn_ub_first = row_trace(dn_ref, 2, dgd)
    lf_uE, lf_ub = col_trace(lf_ref, 1, last=True,
                             dg_ref=dlf_ref[:] if modal_tp else None)
    rt_uW, rt_ub = col_trace(rt_ref, 0, last=False,
                             dg_ref=drt_ref[:] if modal_tp else None)
    # halo shifts as roll + iota-select: measured FASTER under Mosaic than
    # the "obvious" concat+slice single-op form (bench r3: concat cost ~4%
    # RK / ~5% MOOD — lane-axis concatenation lowers to a worse shuffle
    # sequence than roll + where)
    def _edge_iota(ndim, axis_len, axis_from_end):
        shape = [1] * ndim
        shape[ndim - axis_from_end] = axis_len
        return jax.lax.broadcasted_iota(jnp.int32, tuple(shape),
                                        ndim - axis_from_end)

    def patch_first_row(a, patch):
        """a[..., r, :] -> a[..., r-1, :] with row 0 from the halo patch."""
        return jnp.where(_edge_iota(a.ndim, ty, 2) == 0, patch,
                         jnp.roll(a, 1, axis=-2))

    def patch_last_row(a, patch):
        return jnp.where(_edge_iota(a.ndim, ty, 2) == ty - 1, patch,
                         jnp.roll(a, -1, axis=-2))

    def shift_cols_right(a, halo_col):
        """a[..., q] -> a[..., q-1], col 0 from the halo column."""
        return jnp.where(_edge_iota(a.ndim, tx, 1) == 0, halo_col,
                         jnp.roll(a, 1, axis=-1))

    def shift_cols_left(a, halo_col):
        return jnp.where(_edge_iota(a.ndim, tx, 1) == tx - 1, halo_col,
                         jnp.roll(a, -1, axis=-1))

    uN_up = patch_first_row(uN, up_uN_last)
    ub_up = patch_first_row(ub, up_ub_last)
    uS_dn = patch_last_row(uS, dn_uS_first)
    ub_dn = patch_last_row(ub, dn_ub_first)
    uE_lf = shift_cols_right(uE, lf_uE)
    ub_lf = shift_cols_right(ub, lf_ub)
    uW_rt = shift_cols_left(uW, rt_uW)
    ub_rt = shift_cols_left(ub, rt_ub)

    # ---- volume flux ---------------------------------------------------
    if collocated:
        Wv = W                                      # nodes == quad points
        nQ = K
    else:
        # modal / non-collocated bases (Pk Legendre, over-integrated Qk):
        # the volume flux needs point values Wq = V u at the Q quadrature
        # points (the XLA path's basis_apply(V, u), spatial.py:331)
        nQ = Q
        Wv = jnp.stack(_cmm(ops["V"], [W[:, kk] for kk in range(K)]),
                       axis=1)
    rho = Wv[euler.RHO]
    pres = (euler.GAMMA - 1.0) * (
        Wv[euler.ENE] - 0.5 * (Wv[euler.MX] ** 2 + Wv[euler.MY] ** 2) / rho)
    uvel = Wv[euler.MX] / rho
    vvel = Wv[euler.MY] / rho
    Fx = jnp.stack([Wv[euler.MX] * uvel + pres, Wv[euler.MY] * uvel,
                    Wv[euler.MX], (Wv[euler.ENE] + pres) * uvel])
    Fy = jnp.stack([Wv[euler.MX] * vvel, Wv[euler.MY] * vvel + pres,
                    Wv[euler.MY], (Wv[euler.ENE] + pres) * vvel])

    A_c = jnp.broadcast_to(ub[:, None], uW.shape)

    def mirror_x(U):
        return jnp.stack([-U[0], U[1], U[2], U[3]])

    def mirror_y(U):
        return jnp.stack([U[0], -U[1], U[2], U[3]])

    def wall_fix(FL, FR, AL, AR, mL, mR, mirror):
        """Slip-wall mirror operands at fluid-solid interfaces
        (spatial.py's wallx/wally replacement, src/equation.h:787-807)."""
        wL = ((mL < 0.5) & (mR > 0.5))[None, None]   # L solid | R fluid
        wR = ((mL > 0.5) & (mR < 0.5))[None, None]
        FLn = jnp.where(wL, mirror(FR), FL)
        ALn = jnp.where(wL, mirror(AR), AL)
        FRn = jnp.where(wR, mirror(FL), FR)
        ARn = jnp.where(wR, mirror(AL), AR)
        return FLn, FRn, ALn, ARn

    if masked:
        m_c = m_ref[:]                              # [ty, tx], fluid = 1
        msx = m_lf_ref.shape[-1]                    # edge strips like u's
        m_W = shift_cols_right(m_c, m_lf_ref[:, msx - 1:msx])
        m_E = shift_cols_left(m_c, m_rt_ref[:, 0:1])
        m_S = patch_first_row(m_c, m_up_ref[0])
        m_N = patch_last_row(m_c, m_dn_ref[0])

    # ---- x interfaces ---------------------------------------------------
    # evaluate each interface flux ONCE: the west-face flux of every
    # column, plus the single east-face flux of the last column (whose
    # interface belongs to the right halo); east faces of interior columns
    # are the next column's west flux, shifted in
    A_lf = jnp.broadcast_to(ub_lf[:, None], uE_lf.shape)
    FLx, FRx, ALx, ARx = uE_lf, uW, A_lf, A_c
    if masked:
        FLx, FRx, ALx, ARx = wall_fix(FLx, FRx, ALx, ARx, m_W, m_c, mirror_x)
    Fw_all = num_flux(FLx, FRx, 1.0, 0.0, AL=ALx, AR=ARx)  # [4,nq,ty,tx]
    FLe = uE[..., tx - 1:tx]
    FRe = uW_rt[..., tx - 1:tx]
    ALe = A_c[..., tx - 1:tx]
    ARe = jnp.broadcast_to(ub_rt[:, None], uW_rt.shape)[..., tx - 1:tx]
    if masked:
        FLe, FRe, ALe, ARe = wall_fix(
            FLe, FRe, ALe, ARe, m_c[:, tx - 1:tx], m_E[:, tx - 1:tx],
            mirror_x)
    Fe_last = num_flux(FLe, FRe, 1.0, 0.0, AL=ALe, AR=ARe)
    Fe_all = shift_cols_left(Fw_all, Fe_last)

    # ---- y interfaces ---------------------------------------------------
    A_up = jnp.broadcast_to(ub_up[:, None], uN_up.shape)
    FLy, FRy, ALy, ARy = uN_up, uS, A_up, A_c
    if masked:
        FLy, FRy, ALy, ARy = wall_fix(FLy, FRy, ALy, ARy, m_S, m_c, mirror_y)
    Fs_all = num_flux(FLy, FRy, 0.0, 1.0, AL=ALy, AR=ARy)
    FLn = uN[..., ty - 1:ty, :]
    FRn = uS_dn[..., ty - 1:ty, :]
    ALn = A_c[..., ty - 1:ty, :]
    ARn = jnp.broadcast_to(ub_dn[:, None], uS_dn.shape)[..., ty - 1:ty, :]
    if masked:
        FLn, FRn, ALn, ARn = wall_fix(
            FLn, FRn, ALn, ARn, m_c[ty - 1:ty, :], m_N[ty - 1:ty, :],
            mirror_y)
    Fn_last = num_flux(FLn, FRn, 0.0, 1.0, AL=ALn, AR=ARn)
    Fn_all = patch_last_row(Fs_all, Fn_last)

    # ---- boundary corrections (delta fluxes, precomputed outside) ------
    # one-hot masked adds: .at[].add lowers to scatter-add, which Mosaic
    # does not implement — a broadcasted where against an iota does the
    # same column/row-targeted update as dense VPU ops
    # strip targets by GLOBAL row/column index: the true domain edge can sit
    # mid-tile when the state carries internal pad rows (ny % 8 != 0)
    gxe = (nx_true if nx_true is not None else n_j * tx) - 1
    gyn = (ny_true if ny_true is not None else n_i * ty) - 1

    if not per_x:
        # W/E strips ride as [ny, 4, nq] so the tile-blocked dim is first
        # (the last two dims must be whole, per the TPU block rules)
        dfw = jnp.moveaxis(dfw_ref[:], 0, -1)           # [4, nq, ty]
        dfe = jnp.moveaxis(dfe_ref[:], 0, -1)
        gcol = j * tx + jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, tx), 3)
        Fw_all = Fw_all + jnp.where(gcol == 0, dfw[..., None], 0.0)
        Fe_all = Fe_all + jnp.where(gcol == gxe, dfe[..., None], 0.0)
    if not per_y:
        # the tile owning the domain's true bottom/top row applies the strip
        dfs = dfs_ref[:]                                # [4, nq, tx]
        dfn = dfn_ref[:]
        grow = i * ty + jax.lax.broadcasted_iota(jnp.int32, (1, 1, ty, 1), 2)
        Fs_all = Fs_all + jnp.where(grow == 0, dfs[:, :, None, :], 0.0)
        Fn_all = Fn_all + jnp.where(grow == gyn, dfn[:, :, None, :], 0.0)

    # ---- all lifts in ONE sparse-unrolled pass -------------------------
    # lift_all = [dy*GxW.T | dx*GyW.T | +W | -E | +S | -N face lifts], all
    # rows pre-scaled by minv/area with the face signs folded; each output
    # DoF row accumulates its ~10 nonzero terms straight from the
    # naturally-laid-out flux slabs (no relayout, no MXU)
    slabs = ([Fx[:, q] for q in range(nQ)] + [Fy[:, q] for q in range(nQ)]
             + [Fw_all[:, q] for q in range(nq)]
             + [Fe_all[:, q] for q in range(nq)]
             + [Fs_all[:, q] for q in range(nq)]
             + [Fn_all[:, q] for q in range(nq)])
    R = jnp.stack(_cmm(lift_all, slabs), axis=1)

    if source is not None:
        # du/dt source contribution: minv . Vw^T S (for a collocated basis
        # the baked operator is exactly the identity, so this is Q adds)
        S = source(xq_ref[:], yq_ref[:], t_ref[0], Wv)
        R = R + jnp.stack(_cmm(ops["src"], [S[:, q] for q in range(nQ)]),
                          axis=1)
    elif wb_iso:
        # well-balanced isothermal source S_m = rho RT / E * grad_h E with
        # E = exp(-phi/RT), RT from the cell average
        # (src_gll/assemble_explicit.cc:30-135); requires a collocated
        # basis, where the mass-solved projection is the identity, so the
        # nodal source adds straight into du/dt
        RTb = (euler.GAMMA - 1.0) * (
            ub[euler.ENE]
            - 0.5 * (ub[euler.MX] ** 2 + ub[euler.MY] ** 2)
            / ub[euler.RHO]) / ub[euler.RHO]                  # [ty, tx]
        Ewb = jnp.exp(-phi_ref[:] / RTb[None])                # [K, ty, tx]
        Eslabs = [Ewb[kk] for kk in range(K)]
        dEx = jnp.stack(_cmm(ops["Gxn"], Eslabs)) * inv_dx
        dEy = jnp.stack(_cmm(ops["Gyn"], Eslabs)) * inv_dy
        fac = Wv[euler.RHO] * RTb[None] / Ewb
        Sx = fac * dEx
        Sy = fac * dEy
        SE = (Wv[euler.MX] * Sx + Wv[euler.MY] * Sy) / Wv[euler.RHO]
        R = R + jnp.stack([Sx, Sy, jnp.zeros_like(Sx), SE])

    if masked:
        R = R * m_c[None, None]                     # solid cells are frozen
    if modal_tp:
        # the complete forward-Euler MOOD candidate u_t + dt R(u_t) —
        # W here IS the tp'd state (src/mood.cc:436-489's re-update)
        out_ref[:] = W + tp_sc_ref[0] * R
    elif blend:
        a = sc_ref[0]
        dt = sc_ref[1]
        out_ref[:] = a * uold_ref[:] + (1.0 - a) * (W + dt * R)
    else:
        out_ref[:] = R


#: benign state for internal pad rows (positive rho/p so flux evaluations
#: on pad cells stay finite; the pad residual is mask-zeroed and sliced off)
_PAD_STATE = (0.0, 0.0, 1.0, 2.5)


def make_fused_residual(basis, mesh, flux_name: str, per_x: bool,
                        per_y: bool, dtype=jnp.float32, mask=None,
                        source=None, well_balanced=None, potential=None,
                        modal_tp: bool = False):
    """Build fused(u, dfw, dfe, dfs, dfn) -> M^{-1} R(u) for any
    diagonal-mass basis on a Cartesian mesh (the bench/production hot path):
    collocated Qk/Qk_gll directly, modal Pk (the MOOD basis,
    src/parameters.cc:541-544) and over-integrated Qk via an in-kernel
    V contraction to quadrature-point values.

    The mass solve and area scaling are folded into the lift constants:
    rows of every lift operator are pre-multiplied by minv/area, so the
    kernel's single output IS du/dt's interior part.

    Shapes need NOT be tile-aligned: a ragged nx becomes one full-width lane
    tile (Mosaic pads lanes internally), and a ragged ny gains up to 7
    internal solid pad rows (ny -> ceil8) that ride the masked-kernel
    machinery — the kernel then computes wall-mirror fluxes at the true
    north/south edges and the caller's delta strips (targeted by GLOBAL row
    index) correct them to the true boundary/periodic fluxes.  The returned
    function exposes `.pad_y` so the strip builder can match the wrap-flux
    semantics."""
    K, nq = basis.K, basis.nq
    collocated = basis.is_nodal_collocated
    Q = len(basis.wq2)
    scale = (1.0 / basis.mass)[:, None] / (mesh.dx * mesh.dy)
    GxW = basis.wq2[:, None] * basis.Gx
    GyW = basis.wq2[:, None] * basis.Gy
    avg_op = basis.wq2 @ basis.V
    liftv = np.concatenate([mesh.dy * GxW.T, mesh.dx * GyW.T],
                           axis=1) * scale
    fvw = [basis.wq[:, None] * basis.faceV[f] for f in range(4)]
    # every operator is baked into the kernel as trace-time constants (the
    # sparse-unrolled _cmm path); lift columns: [volume x | volume y |
    # +W face | -E | +S | -N], rows pre-scaled by minv/area
    ops = {
        "faceV": [np.asarray(basis.faceV[f], np.float64) for f in range(4)],
        "avg": np.asarray(avg_op, np.float64)[None],
        "lift": np.concatenate(
            [liftv,
             mesh.dy * fvw[0].T * scale, -mesh.dy * fvw[1].T * scale,
             mesh.dx * fvw[2].T * scale, -mesh.dx * fvw[3].T * scale],
            axis=1),
    }
    if not collocated:
        ops["V"] = np.asarray(basis.V, np.float64)
    if modal_tp:
        # one-pass MOOD candidate constants: positivity-point evaluation,
        # per-mode total degree, and the mode-0 mean weight (Legendre mode 0
        # IS the cell mean, checked below)
        from dflo_tpu.stab.positivity import _pos_points
        if basis.family != "Pk":
            raise ValueError("modal_tp needs a modal (Pk) basis")
        if source is not None or well_balanced is not None:
            raise ValueError("modal_tp composes with neither body forces "
                             "nor well-balanced gravity (the MOOD tree has "
                             "no source examples, src/parameters.cc:536)")
        avg_full = np.asarray(basis.wq2 @ basis.V)
        assert np.abs(avg_full[1:]).max() < 1e-13, "mode 0 must be the mean"
        ops["P"] = np.asarray(basis.eval_at(_pos_points(basis.degree)),
                              np.float64)
        ops["mode_deg"] = [int(d) for d in basis.mode_degree]
        ops["avg0"] = float(avg_full[0])
    ny_true, nx_true = mesh.ny, mesh.nx
    pad_y = _pad_y(ny_true)
    if source is not None:
        # body force (src/equation.h:829-850 / src_mpi/equation.h:1186-1202):
        # source(x, y, t, W) evaluated at the volume quadrature points inside
        # the kernel; the mass-solved projection operator minv . (wq2 V)^T is
        # baked like the lifts (identity for a collocated basis)
        ops["src"] = ((1.0 / np.asarray(basis.mass, float))[:, None]
                      * (np.asarray(basis.wq2, float)[None, :]
                         * np.asarray(basis.V, float).T))
        QXs, QYs = np.meshgrid(basis.xq, basis.xq, indexing="xy")
        ref_pts = np.stack([QXs.ravel(), QYs.ravel()], axis=1)
        xq_np, yq_np = mesh.point_coords(ref_pts)       # [Q, ny, nx]
        xq_np = np.asarray(xq_np, float)
        yq_np = np.asarray(yq_np, float)
        if _pad_y(ny_true):
            padw = ((0, 0), (0, _pad_y(ny_true)), (0, 0))
            xq_np = np.pad(xq_np, padw, mode="edge")
            yq_np = np.pad(yq_np, padw, mode="edge")
        xq_pl = jnp.asarray(xq_np, dtype)
        yq_pl = jnp.asarray(yq_np, dtype)
    wb_iso = well_balanced == "isothermal"
    if well_balanced is not None and not wb_iso:
        raise ValueError("the fused kernel supports well_balanced="
                         "'isothermal' only (polytropic rides the XLA path)")
    if wb_iso:
        if not basis.is_nodal_collocated:
            raise ValueError("fused well-balanced gravity needs a "
                             "nodal-collocated basis (Qk_gll, "
                             "src_gll/assemble_explicit.cc:66-72)")
        if source is not None:
            raise ValueError("fused kernel: source and well_balanced are "
                             "mutually exclusive inputs")
        if potential is None:
            raise ValueError("well-balanced gravity needs a potential "
                             "phi(x, y)")
        ops["Gxn"] = np.asarray(basis.Gx, np.float64)    # nodal derivative
        ops["Gyn"] = np.asarray(basis.Gy, np.float64)    # matrices (V = I)
        QXp, QYp = np.meshgrid(basis.xq, basis.xq, indexing="xy")
        ppts = np.stack([QXp.ravel(), QYp.ravel()], axis=1)
        xphi, yphi = mesh.point_coords(ppts)
        phi_np = np.asarray(potential(jnp.asarray(xphi, dtype),
                                      jnp.asarray(yphi, dtype)))
        if _pad_y(ny_true):
            phi_np = np.pad(phi_np,
                            ((0, 0), (0, _pad_y(ny_true)), (0, 0)),
                            mode="edge")
        phi_pl = jnp.asarray(phi_np, dtype)
    # internal pad rows are solid cells: the masked machinery gives the true
    # edge rows wall-mirror wrap fluxes, which the global-row-targeted delta
    # strips correct; y-periodicity then ALWAYS goes through the strips
    per_y_kernel = per_y and pad_y == 0
    masked = mask is not None or pad_y > 0
    if masked:
        m_np = (np.ones((ny_true, nx_true), bool) if mask is None
                else np.asarray(mask, bool))
        if pad_y:
            m_np = np.concatenate(
                [m_np, np.zeros((pad_y, nx_true), bool)], axis=0)
        fmask = jnp.asarray(np.asarray(m_np, np.float32), dtype)
    else:
        fmask = None
    # DoF coefficients of the constant pad state in THIS basis (all-nodes
    # value for nodal bases, mode-0-only for modal Legendre)
    _ones_c = np.linalg.lstsq(np.asarray(basis.V, float),
                              np.ones(np.asarray(basis.V).shape[0]),
                              rcond=None)[0]
    pad_coeff = jnp.asarray(
        np.asarray(_PAD_STATE, float)[:, None] * _ones_c[None, :], dtype)

    @functools.partial(jax.jit,
                       static_argnames=("interpret", "blend"))
    def fused(u, dfw, dfe, dfs, dfn, u_old=None, scalars=None, t=None,
              xq=None, yq=None, deg=None, dt_tp=None, interpret=False,
              blend=False):
        if pad_y:
            c_, k_, _, nx_ = u.shape
            pad = jnp.broadcast_to(pad_coeff[:, :, None, None],
                                   (c_, k_, pad_y, nx_))
            u = jnp.concatenate([u, pad], axis=2)
            if u_old is not None:
                u_old = jnp.concatenate([u_old, pad], axis=2)
            if deg is not None:
                # pad rows at degree 0: only the constant mode of the
                # benign pad state survives the in-kernel truncation
                deg = jnp.concatenate(
                    [deg, jnp.zeros((pad_y, nx_), deg.dtype)], axis=0)
        c, k, ny, nx = u.shape
        TY = _pick_ty(ny)
        TX = _pick_tx(nx)
        ni, nj = ny // TY, nx // TX
        spec_u = pl.BlockSpec((c, k, TY, TX), lambda i, j: (0, 0, i, j),
                              memory_space=pltpu.VMEM)
        # halos = STRIPS of the four neighbor tiles (periodic-wrapped index
        # maps, matching the kernel's wrap semantics): the kernel consumes
        # one face row/column of each neighbor.  lf/rt fetch the
        # lane-aligned 128-wide edge block straight from u (SX/TX the
        # bytes); up/dn fetch ONE row of a row-gathered [ni, c, 1, k, nx]
        # side array (Mosaic forbids 1-sublane blocks of u itself; the
        # gather costs 2/TY state reads+writes in XLA and keys the strip by
        # tile index so the kernel block is a legal [1, c, 1, k, TX])
        SX = _strip_sx(TX)
        r = TX // SX
        u5 = u.reshape(c, k, ni, TY, nx)
        rows_first = jnp.transpose(u5[:, :, :, 0, :], (2, 0, 1, 3))[:, :, None]
        rows_last = jnp.transpose(u5[:, :, :, TY - 1, :],
                                  (2, 0, 1, 3))[:, :, None]
        spec_up = pl.BlockSpec((1, c, 1, k, TX),
                               lambda i, j: ((i - 1) % ni, 0, 0, 0, j),
                               memory_space=pltpu.VMEM)
        spec_dn = pl.BlockSpec((1, c, 1, k, TX),
                               lambda i, j: ((i + 1) % ni, 0, 0, 0, j),
                               memory_space=pltpu.VMEM)
        spec_lf = pl.BlockSpec((c, k, TY, SX),
                               lambda i, j: (0, 0, i,
                                             ((j - 1) % nj) * r + r - 1),
                               memory_space=pltpu.VMEM)
        spec_rt = pl.BlockSpec((c, k, TY, SX),
                               lambda i, j: (0, 0, i, ((j + 1) % nj) * r),
                               memory_space=pltpu.VMEM)
        in_specs = [spec_u, spec_up, spec_dn, spec_lf, spec_rt]
        args = [u, rows_last, rows_first, u, u]
        if masked:
            m3 = fmask.reshape(ni, TY, nx)
            m_last = m3[:, TY - 1:TY, :]            # [ni, 1, nx]
            m_first = m3[:, 0:1, :]
            sm = pl.BlockSpec((TY, TX), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
            in_specs += [sm,
                         pl.BlockSpec((1, 1, TX),
                                      lambda i, j: ((i - 1) % ni, 0, j),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((1, 1, TX),
                                      lambda i, j: ((i + 1) % ni, 0, j),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((TY, SX),
                                      lambda i, j: (i,
                                                    ((j - 1) % nj) * r
                                                    + r - 1),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((TY, SX),
                                      lambda i, j: (i, ((j + 1) % nj) * r),
                                      memory_space=pltpu.VMEM)]
            args += [fmask, m_last, m_first, fmask, fmask]
        in_specs += [pl.BlockSpec((TY, 4, nq), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((TY, 4, nq), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((4, nq, TX), lambda i, j: (0, 0, j),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((4, nq, TX), lambda i, j: (0, 0, j),
                                  memory_space=pltpu.VMEM)]
        dfw_r = jnp.moveaxis(dfw, -1, 0)          # [ny_true, 4, nq]
        dfe_r = jnp.moveaxis(dfe, -1, 0)
        if pad_y:
            zrow = jnp.zeros((pad_y, 4, nq), u.dtype)
            dfw_r = jnp.concatenate([dfw_r, zrow], axis=0)
            dfe_r = jnp.concatenate([dfe_r, zrow], axis=0)
        args += [dfw_r, dfe_r, dfs, dfn]
        if source is not None:
            # coordinate planes: the builder's global planes, or per-call
            # overrides (the sharded path passes device-local slices whose
            # shapes match its local block)
            xq_a = xq_pl if xq is None else xq
            yq_a = yq_pl if yq is None else yq
            Qn = xq_a.shape[0]
            spec_xy = pl.BlockSpec((Qn, TY, TX), lambda i, j: (0, i, j),
                                   memory_space=pltpu.VMEM)
            in_specs += [spec_xy, spec_xy,
                         pl.BlockSpec((1,), lambda i, j: (0,),
                                      memory_space=pltpu.SMEM)]
            t_sc = jnp.zeros((), u.dtype) if t is None else t
            args += [xq_a, yq_a,
                     jnp.reshape(jnp.asarray(t_sc, u.dtype), (1,))]
        elif wb_iso:
            in_specs += [pl.BlockSpec((K, TY, TX), lambda i, j: (0, i, j),
                                      memory_space=pltpu.VMEM)]
            args += [phi_pl]
        if modal_tp and deg is not None:
            # degree-map tile + halo strips, mirroring the state's scheme
            # (up/dn rows keyed by tile index, lf/rt 128-lane edge blocks),
            # plus the [dt] forward-Euler scalar
            deg3 = deg.reshape(ni, TY, nx)
            in_specs += [pl.BlockSpec((TY, TX), lambda i, j: (i, j),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((1, 1, TX),
                                      lambda i, j: ((i - 1) % ni, 0, j),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((1, 1, TX),
                                      lambda i, j: ((i + 1) % ni, 0, j),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((TY, SX),
                                      lambda i, j: (i,
                                                    ((j - 1) % nj) * r
                                                    + r - 1),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((TY, SX),
                                      lambda i, j: (i, ((j + 1) % nj) * r),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((1,), lambda i, j: (0,),
                                      memory_space=pltpu.SMEM)]
            args += [deg, deg3[:, TY - 1:TY, :], deg3[:, 0:1, :], deg, deg,
                     jnp.reshape(jnp.asarray(dt_tp, u.dtype), (1,))]
        if blend:
            in_specs += [spec_u,
                         pl.BlockSpec((2,), lambda i, j: (0,),
                                      memory_space=pltpu.SMEM)]
            args += [u_old, scalars]
        out = pl.pallas_call(
            functools.partial(_fused_kernel, ops=ops, K=K, nq=nq,
                              flux_name=flux_name,
                              per_x=per_x, per_y=per_y_kernel, blend=blend,
                              masked=masked, collocated=collocated, Q=Q,
                              source=source, wb_iso=wb_iso,
                              modal_tp=modal_tp and deg is not None,
                              inv_dx=1.0 / mesh.dx, inv_dy=1.0 / mesh.dy,
                              # true dims from the CALL shape (the sharded
                              # path hands per-device local blocks)
                              ny_true=ny - pad_y, nx_true=nx),
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            grid=(ni, nj),
            in_specs=in_specs,
            out_specs=spec_u,
            interpret=interpret,
        )(*args)
        return out[:, :, :ny - pad_y, :] if pad_y else out

    def fused_residual(u, dfw, dfe, dfs, dfn, u_old=None, a=None, dt=None,
                       t=None, xq=None, yq=None, deg=None):
        """R(u) (mass-solved), or with (u_old, a, dt) the full SSP stage
        a*u_old + (1-a)*(u + dt*R).  With (deg, dt) on a modal_tp builder:
        the ONE-PASS MOOD candidate u_t + dt*R(u_t), u_t = {Pk truncation
        -> positivity}(u) applied in VMEM — the caller must compute the
        boundary strips from the SAME u_t edge lines (tp_line below).
        t feeds the in-kernel body force (only consumed when the builder
        got a source); xq/yq override the coordinate planes with
        device-local slices on the sharded path."""
        if deg is not None:
            assert modal_tp and u_old is None
            return fused(u, dfw, dfe, dfs, dfn, t=t, xq=xq, yq=yq,
                         deg=deg, dt_tp=dt, interpret=_interpret())
        if u_old is None:
            return fused(u, dfw, dfe, dfs, dfn, t=t, xq=xq, yq=yq,
                         interpret=_interpret())
        sc = jnp.stack([jnp.asarray(a, u.dtype), jnp.asarray(dt, u.dtype)])
        return fused(u, dfw, dfe, dfs, dfn, u_old, sc, t=t, xq=xq, yq=yq,
                     interpret=_interpret(), blend=True)

    fused_residual.pad_y = pad_y
    if modal_tp:
        _tp_kw = dict(mode_deg=ops["mode_deg"], avg0=ops["avg0"],
                      P_np=ops["P"], dtype=dtype)

        def tp_line(x, dg):
            """XLA twin of the kernel's in-VMEM {truncation -> positivity}
            for a [4, K, L] DoF edge line with per-cell degrees dg [L]: the
            O(boundary) strip inputs must see the SAME u_t the kernel
            traces (same _modal_tp_slabs body, so the math is identical up
            to XLA-vs-Mosaic FMA reassociation)."""
            slabs = _modal_tp_slabs([x[:, kk] for kk in range(K)],
                                    dg, **_tp_kw)
            return jnp.stack(slabs, axis=1)

        fused_residual.tp_line = tp_line

    if modal_tp and pad_y == 0 and mask is None:
        # ---- sparse MOOD re-update (src/claw.cc:806-852) ----------------
        # Cascade passes after the first only change the candidate at
        # cells whose degree changed plus their face neighbors; this entry
        # recomputes EXACTLY the affected tiles: a 1-D pallas grid over a
        # compact (iy, ix) tile list delivered by scalar prefetch, every
        # BlockSpec index dynamic, with the previous candidate aliased to
        # the output so untouched tiles keep their accepted values.  The
        # tile is fixed at 8 x 128 (one sublane x lane tile) for sparsity
        # granularity, independent of the dense call's TY/TX.
        @functools.partial(jax.jit, static_argnames=("interpret",))
        def _sparse(u, u_prev, deg, iy, ix, cnt, dfw, dfe, dfs, dfn, dt_tp,
                    interpret=False):
            c, k, ny, nx = u.shape
            TYs, TXs = 8, 128
            if ny % TYs or nx % TXs:
                raise ValueError("sparse MOOD candidate needs ny % 8 == 0 "
                                 "and nx % 128 == 0")
            ni, nj = ny // TYs, nx // TXs
            dfw_r = jnp.moveaxis(dfw, -1, 0)        # [ny, 4, nq]
            dfe_r = jnp.moveaxis(dfe, -1, 0)
            V = pltpu.VMEM
            spec_u = pl.BlockSpec((c, k, TYs, TXs),
                                  lambda p, iy, ix: (0, 0, iy[p], ix[p]),
                                  memory_space=V)
            # up/dn halos as FULL dynamically-indexed neighbor tiles of u
            # and deg (the dense path's row-gathered side arrays would cost
            # a whole-state transpose per cascade pass)
            in_specs = [
                spec_u,
                pl.BlockSpec((c, k, TYs, TXs),
                             lambda p, iy, ix: (0, 0, (iy[p] - 1) % ni,
                                                ix[p]), memory_space=V),
                pl.BlockSpec((c, k, TYs, TXs),
                             lambda p, iy, ix: (0, 0, (iy[p] + 1) % ni,
                                                ix[p]), memory_space=V),
                pl.BlockSpec((c, k, TYs, TXs),
                             lambda p, iy, ix: (0, 0, iy[p],
                                                (ix[p] - 1) % nj),
                             memory_space=V),
                pl.BlockSpec((c, k, TYs, TXs),
                             lambda p, iy, ix: (0, 0, iy[p],
                                                (ix[p] + 1) % nj),
                             memory_space=V),
                pl.BlockSpec((TYs, 4, nq),
                             lambda p, iy, ix: (iy[p], 0, 0),
                             memory_space=V),
                pl.BlockSpec((TYs, 4, nq),
                             lambda p, iy, ix: (iy[p], 0, 0),
                             memory_space=V),
                pl.BlockSpec((4, nq, TXs),
                             lambda p, iy, ix: (0, 0, ix[p]),
                             memory_space=V),
                pl.BlockSpec((4, nq, TXs),
                             lambda p, iy, ix: (0, 0, ix[p]),
                             memory_space=V),
                pl.BlockSpec((TYs, TXs),
                             lambda p, iy, ix: (iy[p], ix[p]),
                             memory_space=V),
                pl.BlockSpec((TYs, TXs),
                             lambda p, iy, ix: ((iy[p] - 1) % ni, ix[p]),
                             memory_space=V),
                pl.BlockSpec((TYs, TXs),
                             lambda p, iy, ix: ((iy[p] + 1) % ni, ix[p]),
                             memory_space=V),
                pl.BlockSpec((TYs, TXs),
                             lambda p, iy, ix: (iy[p], (ix[p] - 1) % nj),
                             memory_space=V),
                pl.BlockSpec((TYs, TXs),
                             lambda p, iy, ix: (iy[p], (ix[p] + 1) % nj),
                             memory_space=V),
                pl.BlockSpec((1,), lambda p, iy, ix: (0,),
                             memory_space=pltpu.SMEM),
                spec_u,                         # aliased previous candidate
            ]
            args = [u, u, u, u, u,
                    dfw_r, dfe_r, dfs, dfn,
                    deg, deg, deg, deg, deg,
                    jnp.reshape(jnp.asarray(dt_tp, u.dtype), (1,)),
                    u_prev]
            # DYNAMIC grid: exactly cnt programs run — the (iy, ix) arrays
            # are fixed-capacity (one slot per tile, overflow impossible),
            # but dead slots past cnt are never executed, so the pass costs
            # what the affected set costs, not the capacity
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(jnp.asarray(cnt, jnp.int32),),
                in_specs=in_specs, out_specs=spec_u)
            return pl.pallas_call(
                functools.partial(
                    _fused_kernel, ops=ops, K=K, nq=nq,
                    flux_name=flux_name, per_x=per_x, per_y=per_y,
                    blend=False, masked=False, collocated=collocated, Q=Q,
                    source=None, wb_iso=False, modal_tp=True,
                    sparse_nij=(ni, nj),
                    inv_dx=1.0 / mesh.dx, inv_dy=1.0 / mesh.dy,
                    ny_true=ny, nx_true=nx),
                out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
                grid_spec=grid_spec,
                # alias indices count the scalar-prefetch args
                input_output_aliases={2 + len(args) - 1: 0},
                interpret=interpret,
            )(jnp.asarray(iy, jnp.int32), jnp.asarray(ix, jnp.int32), *args)

        def sparse_candidate(u, u_prev, deg, iy, ix, cnt, dfw, dfe, dfs,
                             dfn, dt):
            """Recompute the one-pass MOOD candidate u_t + dt*R(u_t) on the
            first cnt of the listed (iy, ix) 8x128 tiles only; all other
            cells of the returned array keep u_prev's values."""
            return _sparse(u, u_prev, deg, iy, ix, cnt, dfw, dfe, dfs, dfn,
                           dt, interpret=_interpret())

        fused_residual.sparse = sparse_candidate
    return fused_residual


# ---------------------------------------------------------------------------
# Fused stabilization chain: {cell averages -> KXRCF indicator -> TVB
# (characteristic) limiter -> Zhang-Shu positivity} in ONE VMEM pass.
#
# post_stage costs more than the fused residual on the XLA path (the chain
# materializes averages, traces, eigen matrices and the rebuilt state in
# HBM); the stencil structure is identical to the residual (4-neighbor),
# so the same 5-tile periodic-wrapped halo layout applies.  Supports the
# production hot path: Qk nodal basis, Cartesian mesh, no mask,
# density/energy/limiter indicator, TVB limiter (optionally
# characteristic), optional positivity.  Numerically identical to
# stab/indicator.py + stab/limiter.py + stab/positivity.py.
# ---------------------------------------------------------------------------


def make_fused_post(basis, mesh, *, indicator: str = "density",
                    M: float = 0.0, beta: float = 1.0,
                    char_lim: bool = False, pos_lim: bool = True,
                    per_x: bool = False, per_y: bool = False,
                    dtype=jnp.float32, with_diag: bool = False, mask=None,
                    device_edges: bool = False):
    """Build post(u) -> u_limited, the fused per-stage stabilization chain.

    Equivalent (to f32 roundoff) to Solver.post_stage for the supported
    configuration; cites the same reference passes:
    indicator src/indicator.cc:48-198, TVB src/limiter.cc:224-370,
    positivity src/positivity.cc:16-208.

    with_diag=True additionally returns (lam_max, minq) — the CFL wave
    speed and fatal-negativity scalars of make_fused_diag — computed from
    the in-kernel cell averages at zero extra HBM cost, so the driver's two
    standalone diagnostic passes per step disappear.

    mask (solid-cell domains, forward_step) and ragged ny (internal solid
    pad rows) ride a static neighbor-valid flag plane [5, ny, nx] —
    (W, E, S, N fluid-neighbor flags + self fluid flag) exactly matching
    stab.limiter.neighbor_valid — instead of the in-kernel edge arithmetic.
    The caller must NOT combine y-periodicity with a ragged ny.

    device_edges=True builds the per-device-block kernel of the SHARDED
    post chain (make_fused_post_sharded): `mesh` is the device-local block,
    and the returned callable takes fused_post(u_loc, vflags, ovS, ovN,
    ovW, ovE) where vflags is the RUNTIME neighbor-valid plane [5, ny, nx]
    and ovS/ovN/ovW/ovE are cross-device neighbor packs — the adjacent
    device's wq-weighted face trace + cell average of its edge line
    ([c, nq+1, nx] for S/N, [c, nq+1, ny, 1] for W/E, delivered by
    ppermute) — that replace the block-wrap values at edge tiles.  This is
    the stabilization-chain analog of the residual kernel's delta-flux
    strips (the TPU-native update_ghost_values, src_mpi/claw.cc:793).
    """
    from dflo_tpu.physics import euler as _euler
    from dflo_tpu.stab.positivity import EPS, REL_F32, _pos_points

    if basis.family != "Qk" or not basis.is_nodal_collocated:
        raise ValueError("fused post needs the collocated Qk basis")
    if indicator not in ("density", "energy", "limiter"):
        raise ValueError(f"fused post does not support indicator "
                         f"{indicator!r}")
    ny_true, nx_true = mesh.ny, mesh.nx
    pad_y = _pad_y(ny_true)
    if pad_y and per_y:
        raise ValueError("fused post cannot combine y-periodicity with a "
                         "ragged ny (internal pad rows); use the XLA chain")
    if device_edges:
        if mask is not None:
            raise ValueError("sharded fused post does not support masked "
                             "domains")
        if pad_y:
            raise ValueError("sharded fused post needs the per-device block "
                             "height to be a multiple of 8 (no internal "
                             "pad rows under a device mesh)")
        if per_x or per_y:
            raise ValueError("device_edges handles periodicity through the "
                             "runtime flags/override packs; pass "
                             "per_x=per_y=False")
    use_flags = mask is not None or pad_y > 0 or device_edges
    if use_flags and not device_edges:
        from dflo_tpu.stab.limiter import neighbor_valid
        vf = np.stack(neighbor_valid((ny_true, nx_true), per_x, per_y,
                                     mask), axis=0).astype(np.float64)
        m_self = (np.ones((ny_true, nx_true)) if mask is None
                  else np.asarray(mask, np.float64))
        vf = np.concatenate([vf, m_self[None]], axis=0)       # [5, ny, nx]
        if pad_y:
            vf = np.concatenate(
                [vf, np.zeros((5, pad_y, nx_true))], axis=1)
        vflags = jnp.asarray(vf, dtype)
        _ones_c = np.linalg.lstsq(np.asarray(basis.V, float),
                                  np.ones(np.asarray(basis.V).shape[0]),
                                  rcond=None)[0]
        pad_coeff = jnp.asarray(
            np.asarray(_PAD_STATE, float)[:, None] * _ones_c[None, :], dtype)
    p = basis.degree
    K, nq = basis.K, basis.nq
    dx, dy = mesh.dx, mesh.dy
    h = mesh.diameter_h
    diam = float(np.sqrt(dx * dx + dy * dy))
    Mdx2 = M * h * h
    comp = {"density": euler.RHO, "energy": euler.ENE,
            "limiter": euler.RHO}[indicator]
    mark_all = indicator == "limiter"

    # closure operator constants, all baked into the instruction stream as
    # sparse-unrolled FMAs (_cmm).  Quadrature weights are folded into the
    # face-trace operators so the indicator's face integral is a plain axis
    # sum, and the nodal linear rebuild is a [K,3] unroll over
    # [ub, Dxn, Dyn].
    avg_np = (basis.wq2 @ basis.V)[None]            # [1, K]
    gx_np = (basis.wq2 @ basis.Gx)[None]
    gy_np = (basis.wq2 @ basis.Gy)[None]
    P_np = basis.eval_at(_pos_points(p))            # [Qp, K]
    reb_np = np.stack([np.ones(K),
                       (basis.nodes[:, 0] - 0.5) * dx / h,
                       (basis.nodes[:, 1] - 0.5) * dy / h], axis=1)  # [K,3]

    fVw_np = [np.asarray(basis.wq[:, None] * basis.faceV[f], np.float64)
              for f in range(4)]                    # wq-weighted face traces

    def kernel(u_ref, up_ref, dn_ref, lf_ref, rt_ref, *rest):
        if use_flags:
            vf_ref, rest = rest[0], rest[1:]
        if device_edges:
            ovS_ref, ovN_ref, ovW_ref, ovE_ref = rest[:4]
            rest = rest[4:]
        if with_diag:
            out_ref, lam_ref, minq_ref = rest
        else:
            (out_ref,) = rest
        i = pl.program_id(0)
        j = pl.program_id(1)
        n_i = pl.num_programs(0)
        n_j = pl.num_programs(1)
        W = u_ref[:]
        c, k, ty, tx = W.shape
        f32 = W.dtype

        def avg_of(tile):
            return _cmm(avg_np, [tile[:, kk] for kk in range(K)])[0]

        # halo inputs arrive as STRIPS (same BlockSpec scheme as the fused
        # residual): up/dn as one row of the row-gathered [ni,c,1,k,nx]
        # side arrays, lf/rt as 128-lane edge blocks of which one column
        # is consumed
        def row_trace(tile_ref, side):
            slabs = [tile_ref[0, :, :, kk, :] for kk in range(K)]  # [c,1,tx]
            face = jnp.stack(_cmm(fVw_np[side], slabs), axis=1)
            return face, _cmm(avg_np, slabs)[0]     # [c,nq,1,tx], [c,1,tx]

        def col_trace(tile_ref, side, last):
            sx = tile_ref.shape[-1]
            cc = sx - 1 if last else 0
            slabs = [tile_ref[:, kk, :, cc:cc + 1] for kk in range(K)]
            face = jnp.stack(_cmm(fVw_np[side], slabs), axis=1)
            return face, _cmm(avg_np, slabs)[0]     # [c,nq,ty,1], [c,ty,1]

        ub = avg_of(W)
        up_face, up_avg = row_trace(up_ref, 3)          # N face, last row
        dn_face, dn_avg = row_trace(dn_ref, 2)          # S face, first row
        lf_face, lf_avg = col_trace(lf_ref, 1, last=True)   # E face
        rt_face, rt_avg = col_trace(rt_ref, 0, last=False)  # W face

        if device_edges:
            # block-edge tiles: the wrap values above point at the wrong
            # (own-block) neighbor — replace them with the ppermuted
            # cross-device packs (neighbor's wq-weighted face trace rows
            # 0..nq-1 + its cell-average row nq).  Interior tiles keep the
            # in-block wrap; at true domain boundaries the pack content is
            # never consumed (the vflags zero those stencil arms).
            ovS = ovS_ref[:]                            # [c, nq+1, tx]
            up_face = jnp.where(i == 0, ovS[:, :nq][:, :, None], up_face)
            up_avg = jnp.where(i == 0, ovS[:, nq][:, None], up_avg)
            ovN = ovN_ref[:]
            dn_face = jnp.where(i == n_i - 1,
                                ovN[:, :nq][:, :, None], dn_face)
            dn_avg = jnp.where(i == n_i - 1, ovN[:, nq][:, None], dn_avg)
            ovW = ovW_ref[:]                            # [c, nq+1, ty, 1]
            lf_face = jnp.where(j == 0, ovW[:, :nq], lf_face)
            lf_avg = jnp.where(j == 0, ovW[:, nq], lf_avg)
            ovE = ovE_ref[:]
            rt_face = jnp.where(j == n_j - 1, ovE[:, :nq], rt_face)
            rt_avg = jnp.where(j == n_j - 1, ovE[:, nq], rt_avg)

        # halo shifts as roll + iota-select (measured faster under Mosaic
        # than concat+slice, see _fused_kernel)
        def _edge_iota(ndim, axis_len, axis_from_end):
            shape = [1] * ndim
            shape[ndim - axis_from_end] = axis_len
            return jax.lax.broadcasted_iota(jnp.int32, tuple(shape),
                                            ndim - axis_from_end)

        def patch_dn(a, patch):  # value from row above (r-1)
            return jnp.where(_edge_iota(a.ndim, ty, 2) == 0, patch,
                             jnp.roll(a, 1, axis=-2))

        def patch_up(a, patch):  # value from row below (r+1)
            return jnp.where(_edge_iota(a.ndim, ty, 2) == ty - 1, patch,
                             jnp.roll(a, -1, axis=-2))

        def sh_rt(a, halo_col):  # value from column left (c-1)
            return jnp.where(_edge_iota(a.ndim, tx, 1) == 0, halo_col,
                             jnp.roll(a, 1, axis=-1))

        def sh_lf(a, halo_col):  # value from column right (c+1)
            return jnp.where(_edge_iota(a.ndim, tx, 1) == tx - 1, halo_col,
                             jnp.roll(a, -1, axis=-1))

        ub_W = sh_rt(ub, lf_avg)                    # west-neighbor averages
        ub_E = sh_lf(ub, rt_avg)
        ub_S = patch_dn(ub, up_avg)
        ub_N = patch_up(ub, dn_avg)

        # neighbor-exists flags: static mask/pad-aware plane when present
        # (matches stab.limiter.neighbor_valid), else global-edge arithmetic
        if use_flags:
            vfl = vf_ref[:]
            vW, vE, vS, vN = vfl[0:1], vfl[1:2], vfl[2:3], vfl[3:4]
            m_self = vfl[4]
        else:
            one = jnp.ones((1, ty, tx), f32)
            row2 = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)
            col2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tx), 2)
            vW = one if per_x else \
                jnp.where((j == 0) & (col2 == 0), 0.0, one)
            vE = one if per_x else \
                jnp.where((j == n_j - 1) & (col2 == tx - 1), 0.0, one)
            vS = one if per_y else \
                jnp.where((i == 0) & (row2 == 0), 0.0, one)
            vN = one if per_y else \
                jnp.where((i == n_i - 1) & (row2 == ty - 1), 0.0, one)

        # ---- KXRCF shock indicator (src/indicator.cc:48-198) -----------
        if mark_all:
            active0 = jnp.ones((ty, tx), bool)
        else:
            def dtr(tile):
                slabs = [tile[comp, kk] for kk in range(K)]   # [ty, tx] each
                return tuple(jnp.stack(_cmm(fVw_np[f], slabs))
                             for f in range(4))               # [nq, ty, tx]

            tW, tE, tS, tN = dtr(W)
            jW = (tW - sh_rt(tE, lf_face[comp])) * vW
            jE = (tE - sh_lf(tW, rt_face[comp])) * vE
            jS = (tS - patch_dn(tN, up_face[comp])) * vS
            jN = (tN - patch_up(tS, dn_face[comp])) * vN

            vx = ub[euler.MX] / ub[euler.RHO]
            vy = ub[euler.MY] / ub[euler.RHO]
            inW = (-vx < 0) * vW[0]
            inE = (vx < 0) * vE[0]
            inS = (-vy < 0) * vS[0]
            inN = (vy < 0) * vN[0]

            def fint(jv):
                # weights already folded into trcd
                return jnp.sum(jv, axis=0)

            ind = (inW * fint(jW) + inE * fint(jE)) * dy \
                + (inS * fint(jS) + inN * fint(jN)) * dx
            measure = (inW + inE) * dy + (inS + inN) * dx
            denom = diam ** (0.5 * (p + 1)) * measure * ub[comp]
            shock = jnp.where(jnp.abs(denom) > 0.0,
                              jnp.abs(ind) / jnp.where(denom == 0.0, 1.0,
                                                       denom), 0.0)
            active0 = shock > 1.0

        # ---- TVB limiter (src/limiter.cc:224-370) ----------------------
        Wk = [W[:, kk] for kk in range(K)]
        Dx = (h / dx) * _cmm(gx_np, Wk)[0]
        Dy = (h / dy) * _cmm(gy_np, Wk)[0]
        dbx = jnp.where(vW > 0, ub - ub_W, Dx)
        dfx = jnp.where(vE > 0, ub_E - ub, Dx)
        dby = jnp.where(vS > 0, ub - ub_S, Dy)
        dfy = jnp.where(vN > 0, ub_N - ub, Dy)

        if char_lim:
            Rx, Lx, Ry, Ly = _euler.eigen_matrices(ub)
            cDx = _euler.to_characteristic(Lx, Dx)
            cDy = _euler.to_characteristic(Ly, Dy)
            cdbx = _euler.to_characteristic(Lx, dbx)
            cdfx = _euler.to_characteristic(Lx, dfx)
            cdby = _euler.to_characteristic(Ly, dby)
            cdfy = _euler.to_characteristic(Ly, dfy)
        else:
            cDx, cDy = Dx, Dy
            cdbx, cdfx, cdby, cdfy = dbx, dfx, dby, dfy

        def minmod(a, b, c_):
            samesign = (a * b > 0) & (b * c_ > 0)
            m = jnp.sign(a) * jnp.minimum(jnp.abs(a),
                                          jnp.minimum(jnp.abs(b),
                                                      jnp.abs(c_)))
            return jnp.where(jnp.abs(a) < Mdx2, a,
                             jnp.where(samesign, m, 0.0))

        Dxn = minmod(cDx, beta * cdbx, beta * cdfx)
        Dyn = minmod(cDy, beta * cdby, beta * cdfy)
        change = (jnp.mean(jnp.abs(Dxn - cDx), axis=0)
                  + jnp.mean(jnp.abs(Dyn - cDy), axis=0))
        if char_lim:
            Dxn = _euler.to_conserved(Rx, Dxn)
            Dyn = _euler.to_conserved(Ry, Dyn)

        # nodal linear rebuild ub + Dxn*(x-xc)/h + Dyn*(y-yc)/h per node
        u_lim = jnp.stack(_cmm(reb_np, [ub, Dxn, Dyn]), axis=1)
        active = active0 & (change > 1.0e-10)
        u1 = jnp.where(active[None, None], u_lim, W)

        # ---- Zhang-Shu positivity (src/positivity.cc:16-208) -----------
        if pos_lim:
            # floor choice keyed on the RUNTIME tile dtype (pos_floors):
            # x64 runs keep the reference's absolute 1e-13 parity
            if W.dtype != jnp.float64:
                # dtype-aware floors (stab/positivity.pos_floors): in f32
                # the squeeze rounding (~ulp * avg) dwarfs the reference's
                # absolute 1e-13, so near-vacuum points can land at -O(ulp)
                # where 1/rho flips the pressure test
                eps_r = jnp.maximum(EPS, REL_F32 * ub[euler.RHO])
                p_avg_f = (euler.GAMMA - 1.0) * (
                    ub[euler.ENE]
                    - 0.5 * (ub[euler.MX] ** 2 + ub[euler.MY] ** 2)
                    / ub[euler.RHO])
                eps_p = jnp.maximum(EPS, REL_F32 * p_avg_f)[None]
            else:
                eps_r = EPS
                eps_p = EPS
            Wp = jnp.stack(_cmm(P_np, [u1[:, kk] for kk in range(K)]),
                           axis=1)                  # [4, Qp, ty, tx]
            rho_min = jnp.min(Wp[euler.RHO], axis=0)
            rho_avg = ub[euler.RHO]
            rat = (jnp.abs(rho_avg - eps_r)
                   / (jnp.abs(rho_avg - rho_min) + 1.0e-13))
            theta1 = jnp.minimum(rat, 1.0)
            u1 = jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (c, 1, 1, 1), 0)
                 == euler.RHO),
                u1 * theta1[None, None] + ub[:, None] * (1 - theta1[None, None]),
                u1)
            Wp = jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (c, 1, 1, 1), 0)
                 == euler.RHO),
                Wp * theta1[None, None] + ub[euler.RHO][None, None]
                * (1 - theta1[None, None]),
                Wp)
            pre = _euler.pressure(Wp)
            d = Wp - ub[:, None]
            drho, dE = d[euler.RHO], d[euler.ENE]
            dmx, dmy = d[euler.MX], d[euler.MY]
            mavg_x, mavg_y = ub[euler.MX][None], ub[euler.MY][None]
            ravg, Eavg = ub[euler.RHO][None], ub[euler.ENE][None]
            a1 = 2.0 * drho * dE - (dmx * dmx + dmy * dmy)
            b1 = (2.0 * drho * (Eavg - eps_p / (euler.GAMMA - 1.0))
                  + 2.0 * ravg * dE - 2.0 * (mavg_x * dmx + mavg_y * dmy))
            c1 = (2.0 * ravg * Eavg - (mavg_x**2 + mavg_y**2)
                  - 2.0 * eps_p * ravg / (euler.GAMMA - 1.0))
            a1s = jnp.where(a1 == 0.0, 1.0, a1)
            b1n, c1n = b1 / a1s, c1 / a1s
            Dq = jnp.sqrt(jnp.abs(b1n * b1n - 4.0 * c1n))
            t1 = 0.5 * (-b1n - Dq)
            t2 = 0.5 * (-b1n + Dq)
            t1_ok = (t1 > -1.0e-12) & (t1 < 1.0 + 1.0e-12)
            t = jnp.where(t1_ok, t1, t2)
            t = jnp.clip(t, 0.0, 1.0)
            t = jnp.where(jnp.abs(1.0 - t) < 1.0e-14, 0.0, t)
            t = jnp.where(pre < eps_p, t, 1.0)
            theta2 = jnp.min(t, axis=0)
            u1 = u1 * theta2[None, None] + ub[:, None] * (1 - theta2[None, None])

        out_ref[:] = u1
        if with_diag:
            # free per-step diagnostics from the already-computed averages
            # (the whole chain preserves cell means exactly, so ub(u1)==ub):
            # CFL wave speed (src/claw.cc:483-512) + fatal-negativity min
            # (src/positivity.cc:26-39) — replaces two standalone
            # full-state passes per step
            rho_d = ub[euler.RHO]
            pre_d = (euler.GAMMA - 1.0) * (
                ub[euler.ENE]
                - 0.5 * (ub[euler.MX] ** 2 + ub[euler.MY] ** 2) / rho_d)
            cs = jnp.sqrt(euler.GAMMA * jnp.abs(pre_d) / jnp.abs(rho_d))
            vxa = jnp.abs(ub[euler.MX] / rho_d)
            vya = jnp.abs(ub[euler.MY] / rho_d)
            lam = (cs + vxa) / h + (cs + vya) / h
            if use_flags:
                # solid/pad cells contribute neither wave speed nor the
                # fatal-negativity min (negative_average_flag's mask arg)
                lam = jnp.where(m_self > 0.5, lam, 0.0)
                rho_d = jnp.where(m_self > 0.5, rho_d, jnp.inf)
                pre_d = jnp.where(m_self > 0.5, pre_d, jnp.inf)
            lam_ref[:] = jnp.full((8, 128), jnp.max(lam), f32)
            minq_ref[:] = jnp.full((8, 128),
                                   jnp.minimum(jnp.min(rho_d),
                                               jnp.min(pre_d)), f32)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def call(u, extra=(), interpret=False):
        if pad_y:
            c_, k_, _, nx_ = u.shape
            pad = jnp.broadcast_to(pad_coeff[:, :, None, None],
                                   (c_, k_, pad_y, nx_))
            u = jnp.concatenate([u, pad], axis=2)
        c, k, ny, nx = u.shape
        # Mosaic block rule: the last two block dims must be multiples of
        # (8, 128) or equal to the full array dims
        TY = _pick_ty(ny)
        TX = _pick_tx(nx)
        ni, nj = ny // TY, nx // TX
        spec_u = pl.BlockSpec((c, k, TY, TX), lambda i, j: (0, 0, i, j),
                              memory_space=pltpu.VMEM)
        # halo STRIPS (see make_fused_residual): one row of the
        # row-gathered side arrays / 128-lane edge block of each neighbor
        # instead of the whole tile
        SX = _strip_sx(TX)
        r = TX // SX
        u5 = u.reshape(c, k, ni, TY, nx)
        rows_first = jnp.transpose(u5[:, :, :, 0, :], (2, 0, 1, 3))[:, :, None]
        rows_last = jnp.transpose(u5[:, :, :, TY - 1, :],
                                  (2, 0, 1, 3))[:, :, None]
        spec_up = pl.BlockSpec((1, c, 1, k, TX),
                               lambda i, j: ((i - 1) % ni, 0, 0, 0, j),
                               memory_space=pltpu.VMEM)
        spec_dn = pl.BlockSpec((1, c, 1, k, TX),
                               lambda i, j: ((i + 1) % ni, 0, 0, 0, j),
                               memory_space=pltpu.VMEM)
        spec_lf = pl.BlockSpec((c, k, TY, SX),
                               lambda i, j: (0, 0, i,
                                             ((j - 1) % nj) * r + r - 1),
                               memory_space=pltpu.VMEM)
        spec_rt = pl.BlockSpec((c, k, TY, SX),
                               lambda i, j: (0, 0, i, ((j + 1) % nj) * r),
                               memory_space=pltpu.VMEM)
        in_specs = [spec_u, spec_up, spec_dn, spec_lf, spec_rt]
        args = [u, rows_last, rows_first, u, u]
        if use_flags:
            in_specs.append(pl.BlockSpec((5, TY, TX), lambda i, j: (0, i, j),
                                         memory_space=pltpu.VMEM))
            args.append(extra[0] if device_edges else vflags)
        if device_edges:
            _, ovS, ovN, ovW, ovE = extra
            # S/N packs blocked by tile column, W/E packs (trailing
            # singleton lane axis so the block stays tile-legal) by tile row
            spec_sn = pl.BlockSpec((c, nq + 1, TX), lambda i, j: (0, 0, j),
                                   memory_space=pltpu.VMEM)
            spec_we = pl.BlockSpec((c, nq + 1, TY, 1),
                                   lambda i, j: (0, 0, i, 0),
                                   memory_space=pltpu.VMEM)
            in_specs += [spec_sn, spec_sn, spec_we, spec_we]
            args += [ovS, ovN, ovW, ovE]
        out_shape = jax.ShapeDtypeStruct(u.shape, u.dtype)
        out_specs = spec_u
        if with_diag:
            dshape = jax.ShapeDtypeStruct((ni * 8, nj * 128), u.dtype)
            dspec = pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
            out_shape = [out_shape, dshape, dshape]
            out_specs = [out_specs, dspec, dspec]
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(ni, nj),
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(*args)
        if with_diag:
            u1, lam, minq = out
            if pad_y:
                u1 = u1[:, :, :ny - pad_y, :]
            return u1, jnp.max(lam), jnp.min(minq)
        return out[:, :, :ny - pad_y, :] if pad_y else out

    def fused_post(u, *halo):
        return call(u, tuple(halo), interpret=_interpret())

    return fused_post


def make_fused_post_sharded(basis, mesh, device_mesh, *,
                            indicator: str = "density", M: float = 0.0,
                            beta: float = 1.0, char_lim: bool = False,
                            pos_lim: bool = True, per_x: bool = False,
                            per_y: bool = False, dtype=jnp.float32,
                            with_diag: bool = False):
    """Sharded fused stabilization chain: post(u) over a device mesh.

    Each device runs the single-chip VMEM post kernel
    (make_fused_post(device_edges=True)) on its local block; the
    cross-device neighbor cell averages and face traces it needs at block
    edges arrive as ppermuted (nq+1)-row packs over ICI — O(boundary)
    bytes per stage, the stabilization-chain counterpart of the sharded
    fused residual's delta-flux strips (replaces the reference's
    update_ghost_values before the limiter sweep, src_mpi/claw.cc:793,
    src_mpi/limiter.cc:397-555).  Global periodic seams ride the same
    wrap ppermutes; true domain boundaries are flagged off per device.

    with_diag=True: returns (u_limited, lam_max, minq) with the scalars
    reduced across the mesh (pmax/pmin — MPI::min dt of
    src_mpi/claw.cc:579)."""
    import types

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dflo_tpu.parallel.sharding import mesh_grid_shape, mesh_y_axes

    YAX = mesh_y_axes(device_mesh)
    XAX = device_mesh.axis_names[-1]
    DY, DX = mesh_grid_shape(device_mesh)
    if mesh.ny % DY or mesh.nx % DX:
        raise ValueError(f"mesh {mesh.ny}x{mesh.nx} not divisible by "
                         f"device mesh {DY}x{DX}")
    ly, lx = mesh.ny // DY, mesh.nx // DX
    if ly % 8:
        raise ValueError("sharded fused post needs ny/DY % 8 == 0")
    if lx % 128:
        # matches the driver's tiles_ok envelope: per-device blocks must be
        # lane-tile aligned — the device_edges + ragged-lx combination is
        # untested and unsupported
        raise ValueError("sharded fused post needs nx/DX % 128 == 0")
    if not fused_shape_ok(ly, lx):
        raise ValueError(f"per-device block {ly}x{lx} outside the fused "
                         "kernel envelope")
    lmesh = types.SimpleNamespace(ny=ly, nx=lx, dx=mesh.dx, dy=mesh.dy,
                                  diameter_h=mesh.diameter_h)
    fpost = make_fused_post(basis, lmesh, indicator=indicator, M=M,
                            beta=beta, char_lim=char_lim, pos_lim=pos_lim,
                            per_x=False, per_y=False, dtype=dtype,
                            with_diag=with_diag, mask=None,
                            device_edges=True)
    nq = basis.nq
    fVw = [jnp.asarray(basis.wq[:, None] * basis.faceV[f], dtype)
           for f in range(4)]
    avg_vec = jnp.asarray(basis.wq2 @ basis.V, dtype)
    HI = jax.lax.Precision.HIGHEST

    def _pack(x, face):
        """[c, K, L] k-resolved edge line -> [c, nq+1, L] pack of the
        wq-weighted face trace (rows 0..nq-1) + cell average (row nq) —
        exactly the quantities the kernel's row_trace/col_trace compute.

        Precision note: these packs are contracted HERE with an XLA einsum
        (Precision.HIGHEST) while the kernel computes its own-side traces
        with `_cmm` unrolled FMAs, so 1-vs-N device states agree to f32
        reassociation roundoff, not bitwise (the reference's MPI ghost
        exchange copies DoFs verbatim and is bit-identical to serial,
        src_mpi/claw.cc:793).  A near-tie indicator/minmod decision at a
        block edge can therefore flip vs single chip in f32; physics-level
        results are unaffected (both sides satisfy the same limiter
        bounds).  Bit-parity would require shipping the raw K-row DoF edge
        lines and tracing in-kernel — deliberately not done: +K/(nq+1)x
        edge bytes for no accuracy gain."""
        tr = jnp.einsum("qk,ckl->cql", fVw[face], x, precision=HI)
        av = jnp.einsum("k,ckl->cl", avg_vec, x, precision=HI)
        return jnp.concatenate([tr, av[:, None]], axis=1)

    def _local(u_loc):
        iy = jax.lax.axis_index(YAX)
        ix = jax.lax.axis_index(XAX)
        north = [(d, (d + 1) % DY) for d in range(DY)]
        south = [(d, (d - 1) % DY) for d in range(DY)]
        east = [(d, (d + 1) % DX) for d in range(DX)]
        west = [(d, (d - 1) % DX) for d in range(DX)]
        # my south neighbor's north-face pack of its LAST row, etc. —
        # same orientation as the sharded residual's trace ppermutes
        ovS = jax.lax.ppermute(_pack(u_loc[:, :, -1, :], 3), YAX, north)
        ovN = jax.lax.ppermute(_pack(u_loc[:, :, 0, :], 2), YAX, south)
        ovW = jax.lax.ppermute(_pack(u_loc[:, :, :, -1], 1), XAX,
                               east)[..., None]
        ovE = jax.lax.ppermute(_pack(u_loc[:, :, :, 0], 0), XAX,
                               west)[..., None]
        # device-edge neighbor-valid flags (stab.limiter.neighbor_valid
        # semantics, evaluated per device at runtime)
        one = jnp.ones((ly, lx), dtype)
        row = jax.lax.broadcasted_iota(jnp.int32, (ly, lx), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (ly, lx), 1)
        vW = one if per_x else jnp.where((ix == 0) & (col == 0), 0.0, one)
        vE = one if per_x else \
            jnp.where((ix == DX - 1) & (col == lx - 1), 0.0, one)
        vS = one if per_y else jnp.where((iy == 0) & (row == 0), 0.0, one)
        vN = one if per_y else \
            jnp.where((iy == DY - 1) & (row == ly - 1), 0.0, one)
        vflags = jnp.stack([vW, vE, vS, vN, one]).astype(dtype)
        out = fpost(u_loc, vflags, ovS, ovN, ovW, ovE)
        if with_diag:
            u1, lam, minq = out
            ax = tuple(YAX) + (XAX,)
            return u1, jax.lax.pmax(lam, ax), jax.lax.pmin(minq, ax)
        return out

    su = P(None, None, YAX, XAX)
    outs = (su, P(), P()) if with_diag else su
    return shard_map(_local, mesh=device_mesh, in_specs=(su,),
                     out_specs=outs, check_vma=False)


# ---------------------------------------------------------------------------
# Fused per-step diagnostics: {cell averages -> max wave speed, min of
# (rho_avg, p_avg)} reduced in VMEM to one scalar pair per tile.  Replaces
# two whole-domain XLA passes per step (compute_time_step_cartesian,
# src/claw.cc:483-512, and the positivity fatal check,
# src/positivity.cc:26-39) that each materialized the full ubar array.
# ---------------------------------------------------------------------------


def make_fused_diag(basis, mesh, dtype=jnp.float32, mask=None):
    """Build diag(u) -> (lam_max, min_rho_p): the global max of
    (c+|vx|)/h + (c+|vy|)/h over cell averages, and the global min of
    density/pressure averages (for the fatal-negativity flag).  Solid cells
    of a masked domain (and internal pad rows for ragged ny) are excluded
    from both reductions, matching rk.compute_dt(mask=...) and
    positivity.negative_average_flag(mask=...)."""
    K = basis.K
    avg_np = (basis.wq2 @ basis.V)[None]            # [1, K]
    h = mesh.diameter_h
    ny_true, nx_true = mesh.ny, mesh.nx
    pad_y = _pad_y(ny_true)
    use_mask = mask is not None or pad_y > 0
    if use_mask:
        m_np = (np.ones((ny_true, nx_true), bool) if mask is None
                else np.asarray(mask, bool))
        if pad_y:
            m_np = np.concatenate(
                [m_np, np.zeros((pad_y, nx_true), bool)], axis=0)
        fmask = jnp.asarray(np.asarray(m_np, np.float64), dtype)
        _ones_c = np.linalg.lstsq(np.asarray(basis.V, float),
                                  np.ones(np.asarray(basis.V).shape[0]),
                                  rcond=None)[0]
        pad_coeff = jnp.asarray(
            np.asarray(_PAD_STATE, float)[:, None] * _ones_c[None, :], dtype)

    def kernel(*refs):
        if use_mask:
            u_ref, m_ref, lam_ref, minq_ref = refs
        else:
            u_ref, lam_ref, minq_ref = refs
        W = u_ref[:]
        c, k, ty, tx = W.shape
        f32 = W.dtype
        ub = _cmm(avg_np, [W[:, kk] for kk in range(K)])[0]
        rho = ub[euler.RHO]
        pre = (euler.GAMMA - 1.0) * (
            ub[euler.ENE]
            - 0.5 * (ub[euler.MX] ** 2 + ub[euler.MY] ** 2) / rho)
        cs = jnp.sqrt(euler.GAMMA * jnp.abs(pre) / jnp.abs(rho))
        vx = jnp.abs(ub[euler.MX] / rho)
        vy = jnp.abs(ub[euler.MY] / rho)
        lam = (cs + vx) / h + (cs + vy) / h
        if use_mask:
            m_c = m_ref[:]
            lam = jnp.where(m_c > 0.5, lam, 0.0)
            rho = jnp.where(m_c > 0.5, rho, jnp.inf)
            pre = jnp.where(m_c > 0.5, pre, jnp.inf)
        # each program owns one (8,128) block (the minimum TPU tile);
        # broadcast the tile scalar across it
        lam_ref[:] = jnp.full((8, 128), jnp.max(lam), f32)
        minq_ref[:] = jnp.full((8, 128),
                               jnp.minimum(jnp.min(rho), jnp.min(pre)), f32)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def call(u, interpret=False):
        if pad_y:
            c_, k_, _, nx_ = u.shape
            pad = jnp.broadcast_to(pad_coeff[:, :, None, None],
                                   (c_, k_, pad_y, nx_))
            u = jnp.concatenate([u, pad], axis=2)
        c, k, ny, nx = u.shape
        # Mosaic block rule: the last two block dims must be multiples of
        # (8, 128) or equal to the full array dims
        TY = _pick_ty(ny)
        TX = _pick_tx(nx)
        ni, nj = ny // TY, nx // TX
        in_specs = [pl.BlockSpec((c, k, TY, TX),
                                 lambda i, j: (0, 0, i, j),
                                 memory_space=pltpu.VMEM)]
        args = [u]
        if use_mask:
            in_specs.append(pl.BlockSpec((TY, TX), lambda i, j: (i, j),
                                         memory_space=pltpu.VMEM))
            args.append(fmask)
        lam, minq = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((ni * 8, nj * 128), u.dtype),
                       jax.ShapeDtypeStruct((ni * 8, nj * 128), u.dtype)],
            grid=(ni, nj),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM)],
            interpret=interpret,
        )(*args)
        return jnp.max(lam), jnp.min(minq)

    def diag(u):
        return call(u, interpret=_interpret())

    return diag


def make_fused_diag_sharded(basis, mesh, device_mesh, dtype=jnp.float32):
    """Sharded fused diagnostics: each device reduces its own block in VMEM
    (make_fused_diag on the local shape), then one pmax/pmin pair crosses
    the mesh — the MPI::min-dt / negativity-check collectives of
    src_mpi/claw.cc:579 and src/positivity.cc:26-39."""
    import types

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dflo_tpu.parallel.sharding import mesh_grid_shape, mesh_y_axes

    YAX = mesh_y_axes(device_mesh)
    XAX = device_mesh.axis_names[-1]
    DY, DX = mesh_grid_shape(device_mesh)
    if mesh.ny % DY or mesh.nx % DX:
        raise ValueError(f"mesh {mesh.ny}x{mesh.nx} not divisible by "
                         f"device mesh {DY}x{DX}")
    ly, lx = mesh.ny // DY, mesh.nx // DX
    if not fused_shape_ok(ly, lx):
        raise ValueError(f"per-device block {ly}x{lx} outside the fused "
                         "kernel envelope")
    lmesh = types.SimpleNamespace(ny=ly, nx=lx, dx=mesh.dx, dy=mesh.dy,
                                  diameter_h=mesh.diameter_h)
    fdiag = make_fused_diag(basis, lmesh, dtype)
    ax = tuple(YAX) + (XAX,)

    def _local(u_loc):
        lam, minq = fdiag(u_loc)
        return jax.lax.pmax(lam, ax), jax.lax.pmin(minq, ax)

    su = P(None, None, YAX, XAX)
    return shard_map(_local, mesh=device_mesh, in_specs=(su,),
                     out_specs=(P(), P()), check_vma=False)


# ---------------------------------------------------------------------------
# Fused modal-basis stage post: {MOOD degree truncation -> Zhang-Shu
# positivity} in ONE element-local VMEM pass (no halos — both operations are
# cell-local).  The MOOD cascade calls this before every candidate rhs
# evaluation (stab/mood.py candidate()); the XLA chain it replaces
# materializes the truncation gather, the pos-point evaluation and two
# scale passes in HBM (~6 state transfers/pass measured at 2.9 ms on v5e
# for the bench shapes, ~35x the bandwidth roofline).
# ---------------------------------------------------------------------------


def make_fused_modal_pos(basis, dtype=jnp.float32, with_trunc: bool = True,
                         with_diag: bool = False, mesh=None):
    """Build fused(u[, deg]) -> u_limited for a modal (Pk) basis.

    with_trunc=True: zero every mode of total degree > deg[cell] first
    (reduce_degree_Pk, src/mood.cc:174-191), then apply the Zhang-Shu
    positivity limiter (src/positivity.cc:16-208) about the (truncation-
    invariant) mode-0 cell average.  Numerically identical to
    stab/positivity.make_positivity_limiter on the truncated state,
    including its dtype-aware positivity floors (pos_floors)."""
    from dflo_tpu.stab.positivity import EPS, REL_F32, _pos_points

    if basis.family != "Pk":
        raise ValueError("fused modal positivity needs a modal (Pk) basis")
    if with_diag and mesh is None:
        raise ValueError("with_diag needs the mesh (for the CFL h)")
    h = mesh.diameter_h if with_diag else None
    K = basis.K
    avg_full = basis.wq2 @ basis.V
    assert np.abs(avg_full[1:]).max() < 1e-13, "mode 0 must carry the mean"
    avg0 = float(avg_full[0])
    mode_deg = [int(d) for d in basis.mode_degree]
    P_np = np.asarray(basis.eval_at(_pos_points(basis.degree)), np.float64)

    def kernel(*refs):
        if with_trunc and with_diag:
            u_ref, deg_ref, out_ref, lam_ref, minq_ref = refs
            dg = deg_ref[:]
        elif with_trunc:
            u_ref, deg_ref, out_ref = refs
            dg = deg_ref[:]                             # [ty, tx] int32
        elif with_diag:
            u_ref, out_ref, lam_ref, minq_ref = refs
        else:
            u_ref, out_ref = refs
        W = u_ref[:]                                    # [4, K, ty, tx]
        if with_trunc:
            W = jnp.stack(
                [jnp.where(dg >= mode_deg[kk], W[:, kk], 0.0)
                 if mode_deg[kk] > 0 else W[:, kk] for kk in range(K)],
                axis=1)
        ub = avg0 * W[:, 0]                             # [4, ty, tx]
        if W.dtype != jnp.float64:   # pos_floors, keyed on runtime dtype
            eps_r = jnp.maximum(EPS, REL_F32 * ub[euler.RHO])
            p_avg = (euler.GAMMA - 1.0) * (
                ub[euler.ENE] - 0.5 * (ub[euler.MX] ** 2 + ub[euler.MY] ** 2)
                / ub[euler.RHO])
            eps_p = jnp.maximum(EPS, REL_F32 * p_avg)[None]
        else:
            eps_r = EPS
            eps_p = EPS

        # ---- density pass (src/positivity.cc:68-111) -------------------
        Wp = jnp.stack(_cmm(P_np, [W[:, kk] for kk in range(K)]),
                       axis=1)                          # [4, Qp, ty, tx]
        rho_min = jnp.min(Wp[euler.RHO], axis=0)
        rho_avg = ub[euler.RHO]
        rat = jnp.abs(rho_avg - eps_r) / (jnp.abs(rho_avg - rho_min) + 1.0e-13)
        theta1 = jnp.minimum(rat, 1.0)[None]            # [1, ty, tx]
        # modal scaling: non-mean coefficients shrink, mode 0 mixes toward
        # the average (scale_about_avg, stab/positivity.py).  Mosaic has no
        # scatter: single-row updates on the untiled leading axes are
        # expressed as concat/stack instead of .at[].set
        rho0_new = (W[euler.RHO, 0] * theta1[0]
                    + ub[euler.RHO] * (1.0 - theta1[0]))
        rho_modes = jnp.concatenate(
            [rho0_new[None], W[euler.RHO, 1:] * theta1], axis=0)
        W = jnp.stack([rho_modes if ci == euler.RHO else W[ci]
                       for ci in range(4)])
        Wp = jnp.stack([Wp[ci] * theta1 + rho_avg[None] * (1.0 - theta1)
                        if ci == euler.RHO else Wp[ci] for ci in range(4)])

        # ---- pressure pass (src/positivity.cc:113-182) ------------------
        pre = (euler.GAMMA - 1.0) * (
            Wp[euler.ENE] - 0.5 * (Wp[euler.MX] ** 2 + Wp[euler.MY] ** 2)
            / Wp[euler.RHO])
        d = Wp - ub[:, None]
        drho, dE = d[euler.RHO], d[euler.ENE]
        dmx, dmy = d[euler.MX], d[euler.MY]
        mavg_x, mavg_y = ub[euler.MX][None], ub[euler.MY][None]
        ravg, Eavg = ub[euler.RHO][None], ub[euler.ENE][None]
        a1 = 2.0 * drho * dE - (dmx * dmx + dmy * dmy)
        b1 = (2.0 * drho * (Eavg - eps_p / (euler.GAMMA - 1.0))
              + 2.0 * ravg * dE - 2.0 * (mavg_x * dmx + mavg_y * dmy))
        c1 = (2.0 * ravg * Eavg - (mavg_x**2 + mavg_y**2)
              - 2.0 * eps_p * ravg / (euler.GAMMA - 1.0))
        a1s = jnp.where(a1 == 0.0, 1.0, a1)
        b1n, c1n = b1 / a1s, c1 / a1s
        Dq = jnp.sqrt(jnp.abs(b1n * b1n - 4.0 * c1n))
        t1 = 0.5 * (-b1n - Dq)
        t2 = 0.5 * (-b1n + Dq)
        t1_ok = (t1 > -1.0e-12) & (t1 < 1.0 + 1.0e-12)
        t = jnp.where(t1_ok, t1, t2)
        t = jnp.clip(t, 0.0, 1.0)
        t = jnp.where(jnp.abs(1.0 - t) < 1.0e-14, 0.0, t)
        t = jnp.where(pre < eps_p, t, 1.0)
        theta2 = jnp.min(t, axis=0)[None]               # [1, ty, tx]
        out0 = W[:, 0] * theta2 + ub * (1.0 - theta2)   # [4, ty, tx]
        out_ref[:] = jnp.concatenate(
            [out0[:, None], W[:, 1:] * theta2[:, None]], axis=1)
        if with_diag:
            # CFL wave speed + negativity min over the (mean-preserving)
            # limited state: truncation keeps mode 0 and Zhang-Shu scales
            # about the average, so `ub` IS the final cell mean — the same
            # quantities make_fused_diag would reduce in a second whole-
            # state pass (src_mpi/claw.cc:579, src/positivity.cc:26-39)
            f32 = W.dtype
            rho_a = ub[euler.RHO]
            p_a = (euler.GAMMA - 1.0) * (
                ub[euler.ENE]
                - 0.5 * (ub[euler.MX] ** 2 + ub[euler.MY] ** 2) / rho_a)
            cs = jnp.sqrt(euler.GAMMA * jnp.abs(p_a) / jnp.abs(rho_a))
            vxa = jnp.abs(ub[euler.MX] / rho_a)
            vya = jnp.abs(ub[euler.MY] / rho_a)
            lam = (cs + vxa) / h + (cs + vya) / h
            lam_ref[:] = jnp.full((8, 128), jnp.max(lam), f32)
            minq_ref[:] = jnp.full(
                (8, 128), jnp.minimum(jnp.min(rho_a), jnp.min(p_a)), f32)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def call(u, deg=None, interpret=False):
        c, k, ny0, nx0 = u.shape
        # element-local op: ragged ny pads with benign constant rows (mode 0
        # only) so the sublane tiling stays legal, sliced off on return
        pad_y = _pad_y(ny0)
        if pad_y:
            e0 = np.zeros(k)
            e0[0] = 1.0 / avg0
            padc = jnp.asarray(np.asarray(_PAD_STATE, float)[:, None]
                               * e0[None, :], u.dtype)
            u = jnp.concatenate(
                [u, jnp.broadcast_to(padc[:, :, None, None],
                                     (c, k, pad_y, nx0))], axis=2)
            if deg is not None:
                deg = jnp.concatenate(
                    [deg, jnp.zeros((pad_y, nx0), deg.dtype)], axis=0)
        c, k, ny, nx = u.shape
        TY = _pick_ty(ny)
        TX = _pick_tx(nx)
        ni, nj = ny // TY, nx // TX
        spec_u = pl.BlockSpec((c, k, TY, TX), lambda i, j: (0, 0, i, j),
                              memory_space=pltpu.VMEM)
        in_specs = [spec_u]
        args = [u]
        if with_trunc:
            in_specs.append(pl.BlockSpec((TY, TX), lambda i, j: (i, j),
                                         memory_space=pltpu.VMEM))
            args.append(deg)
        if with_diag:
            if pad_y:
                # benign pad rows would enter the tile reductions
                raise ValueError("with_diag requires ny % 8 == 0")
            spec_s = pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)
            out, lam, minq = pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct(u.shape, u.dtype),
                           jax.ShapeDtypeStruct((ni * 8, nj * 128), u.dtype),
                           jax.ShapeDtypeStruct((ni * 8, nj * 128), u.dtype)],
                grid=(ni, nj),
                in_specs=in_specs,
                out_specs=[spec_u, spec_s, spec_s],
                interpret=interpret,
            )(*args)
            return out, jnp.max(lam), jnp.min(minq)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            grid=(ni, nj),
            in_specs=in_specs,
            out_specs=spec_u,
            interpret=interpret,
        )(*args)
        return out[:, :, :ny0, :] if pad_y else out

    if with_trunc:
        return lambda u, deg: call(u, deg, interpret=_interpret())
    return lambda u: call(u, interpret=_interpret())


# ---------------------------------------------------------------------------
# Fused Pk (MOOD) per-stage post chain: {cell averages -> modal TVB limiter
# on MOOD-marked cells -> Zhang-Shu positivity [-> CFL/negativity diag]} in
# ONE VMEM pass over the blended stage state.  Replaces the XLA sequence in
# driver._mood_rk_step (mode-0 averages + stab/limiter modal TVB + the
# standalone fused modal-pos kernel), whose glue measured 0.69 ms/stage at
# the bench shapes (scripts/mood_profile.py, PERF.md r5) — reference passes:
# TVB src/limiter.cc:376-516 (Pk modal), positivity src/positivity.cc:16-208,
# per-stage chain src/claw.cc:854-870.
# ---------------------------------------------------------------------------


def make_fused_pk_post(basis, mesh, *, M: float = 0.0, beta: float = 1.0,
                       char_lim: bool = False, per_x: bool = False,
                       per_y: bool = False, dtype=jnp.float32,
                       with_diag: bool = False):
    """Build post(u, shock) -> u_limited [, lam_max, minq] for a modal Pk
    basis on a Cartesian mesh (unmasked, ny % 8 == 0).

    shock: [ny, nx] float plane; cells with shock > 1 get the modal TVB
    limiter (the MOOD cascade's limiter_marked cells, src/mood.cc:335-340,
    encoded as 1e20/0 exactly like the XLA chain).  Neighbor cell averages
    arrive through the same strip-halo scheme as make_fused_post: one
    row of the row-gathered tile-edge arrays + one column of the neighbor's
    128-lane edge block."""
    from dflo_tpu.physics import euler as _euler
    from dflo_tpu.stab.positivity import _pos_points

    if basis.family != "Pk":
        raise ValueError("fused Pk post needs a modal (Pk) basis")
    if mesh.ny % 8 != 0:
        raise ValueError("fused Pk post needs ny % 8 == 0")
    p = basis.degree
    if p < 1:
        raise ValueError("fused Pk post needs degree >= 1")
    K = basis.K
    h = mesh.diameter_h
    Mdx2 = M * h * h
    beta_eff = 0.5 * beta            # src/limiter.cc:395 (Pk form)
    sqrt3 = float(np.sqrt(3.0))
    ix_x, ix_y = 1, p + 1            # (1,0)/(0,1) modes (src/limiter.cc:414)
    avg_full = basis.wq2 @ basis.V
    assert np.abs(avg_full[1:]).max() < 1e-13, "mode 0 must carry the mean"
    avg0 = float(avg_full[0])
    P_np = np.asarray(basis.eval_at(_pos_points(p)), np.float64)
    tp_kw = dict(avg0=avg0, P_np=P_np, dtype=dtype)

    def kernel(u_ref, up_ref, dn_ref, lf_ref, rt_ref, mk_ref, *rest):
        if with_diag:
            out_ref, lam_ref, minq_ref = rest
        else:
            (out_ref,) = rest
        i = pl.program_id(0)
        j = pl.program_id(1)
        n_i = pl.num_programs(0)
        n_j = pl.num_programs(1)
        W = u_ref[:]                                 # [4, K, ty, tx]
        c, k, ty, tx = W.shape
        f32 = W.dtype

        ub = avg0 * W[:, 0]                          # [4, ty, tx]
        # neighbor averages from the mode-0 slab of each halo strip
        up_avg = avg0 * up_ref[0, :, :, 0, :]        # [c, 1, tx] (N nbr row)
        dn_avg = avg0 * dn_ref[0, :, :, 0, :]        # [c, 1, tx] (S nbr row)
        sx = lf_ref.shape[-1]
        lf_avg = avg0 * lf_ref[:, 0, :, sx - 1:sx]   # [c, ty, 1] (W nbr col)
        rt_avg = avg0 * rt_ref[:, 0, :, 0:1]         # [c, ty, 1] (E nbr col)

        def _edge_iota(ndim, axis_len, axis_from_end):
            shape = [1] * ndim
            shape[ndim - axis_from_end] = axis_len
            return jax.lax.broadcasted_iota(jnp.int32, tuple(shape),
                                            ndim - axis_from_end)

        def patch_dn(a, patch):      # value from row above (r-1)
            return jnp.where(_edge_iota(a.ndim, ty, 2) == 0, patch,
                             jnp.roll(a, 1, axis=-2))

        def patch_up(a, patch):      # value from row below (r+1)
            return jnp.where(_edge_iota(a.ndim, ty, 2) == ty - 1, patch,
                             jnp.roll(a, -1, axis=-2))

        def sh_rt(a, halo_col):      # value from column left (c-1)
            return jnp.where(_edge_iota(a.ndim, tx, 1) == 0, halo_col,
                             jnp.roll(a, 1, axis=-1))

        def sh_lf(a, halo_col):      # value from column right (c+1)
            return jnp.where(_edge_iota(a.ndim, tx, 1) == tx - 1, halo_col,
                             jnp.roll(a, -1, axis=-1))

        ub_W = sh_rt(ub, lf_avg)
        ub_E = sh_lf(ub, rt_avg)
        ub_S = patch_dn(ub, up_avg)
        ub_N = patch_up(ub, dn_avg)

        one = jnp.ones((1, ty, tx), f32)
        row2 = jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1)
        col2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tx), 2)
        vW = one if per_x else jnp.where((j == 0) & (col2 == 0), 0.0, one)
        vE = one if per_x else \
            jnp.where((j == n_j - 1) & (col2 == tx - 1), 0.0, one)
        vS = one if per_y else jnp.where((i == 0) & (row2 == 0), 0.0, one)
        vN = one if per_y else \
            jnp.where((i == n_i - 1) & (row2 == ty - 1), 0.0, one)

        # ---- modal TVB limiter (src/limiter.cc:376-516) ----------------
        Dx = sqrt3 * W[:, ix_x]
        Dy = sqrt3 * W[:, ix_y]
        dbx = jnp.where(vW > 0, ub - ub_W, Dx)
        dfx = jnp.where(vE > 0, ub_E - ub, Dx)
        dby = jnp.where(vS > 0, ub - ub_S, Dy)
        dfy = jnp.where(vN > 0, ub_N - ub, Dy)

        if char_lim:
            Rx, Lx, Ry, Ly = _euler.eigen_matrices(ub)
            cDx = _euler.to_characteristic(Lx, Dx)
            cDy = _euler.to_characteristic(Ly, Dy)
            cdbx = _euler.to_characteristic(Lx, dbx)
            cdfx = _euler.to_characteristic(Lx, dfx)
            cdby = _euler.to_characteristic(Ly, dby)
            cdfy = _euler.to_characteristic(Ly, dfy)
        else:
            cDx, cDy = Dx, Dy
            cdbx, cdfx, cdby, cdfy = dbx, dfx, dby, dfy

        def minmod(a, b, c_):
            samesign = (a * b > 0) & (b * c_ > 0)
            m = jnp.sign(a) * jnp.minimum(jnp.abs(a),
                                          jnp.minimum(jnp.abs(b),
                                                      jnp.abs(c_)))
            return jnp.where(jnp.abs(a) < Mdx2, a,
                             jnp.where(samesign, m, 0.0))

        Dxn = minmod(cDx, beta_eff * cdbx, beta_eff * cdfx)
        Dyn = minmod(cDy, beta_eff * cdby, beta_eff * cdfy)
        change = (jnp.mean(jnp.abs(Dxn - cDx), axis=0)
                  + jnp.mean(jnp.abs(Dyn - cDy), axis=0))
        if char_lim:
            Dxn = _euler.to_conserved(Rx, Dxn)
            Dyn = _euler.to_conserved(Ry, Dyn)

        active = (mk_ref[:] > 1.0) & (change > 1.0e-10)   # [ty, tx]
        # modal linear rebuild: keep [mean, x-slope, y-slope], zero the rest
        zero = jnp.zeros_like(ub)
        lim_slabs = [ub / avg0 if kk == 0
                     else Dxn / sqrt3 if kk == ix_x
                     else Dyn / sqrt3 if kk == ix_y
                     else zero for kk in range(K)]
        slabs = [jnp.where(active[None], lim_slabs[kk], W[:, kk])
                 for kk in range(K)]

        # ---- Zhang-Shu positivity (mean-preserving) --------------------
        slabs = _modal_pos_slabs(slabs, **tp_kw)
        out_ref[:] = jnp.stack(slabs, axis=1)

        if with_diag:
            # chain preserves cell means -> ub is the final average; same
            # epilogue as make_fused_modal_pos(with_diag=True)
            rho_d = ub[euler.RHO]
            pre_d = (euler.GAMMA - 1.0) * (
                ub[euler.ENE]
                - 0.5 * (ub[euler.MX] ** 2 + ub[euler.MY] ** 2) / rho_d)
            cs = jnp.sqrt(euler.GAMMA * jnp.abs(pre_d) / jnp.abs(rho_d))
            vxa = jnp.abs(ub[euler.MX] / rho_d)
            vya = jnp.abs(ub[euler.MY] / rho_d)
            lam = (cs + vxa) / h + (cs + vya) / h
            lam_ref[:] = jnp.full((8, 128), jnp.max(lam), f32)
            minq_ref[:] = jnp.full((8, 128),
                                   jnp.minimum(jnp.min(rho_d),
                                               jnp.min(pre_d)), f32)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def call(u, shock, interpret=False):
        c, k, ny, nx = u.shape
        TY = _pick_ty(ny)
        TX = _pick_tx(nx)
        ni, nj = ny // TY, nx // TX
        spec_u = pl.BlockSpec((c, k, TY, TX), lambda i, j: (0, 0, i, j),
                              memory_space=pltpu.VMEM)
        SX = _strip_sx(TX)
        r = TX // SX
        u5 = u.reshape(c, k, ni, TY, nx)
        rows_first = jnp.transpose(u5[:, :, :, 0, :], (2, 0, 1, 3))[:, :, None]
        rows_last = jnp.transpose(u5[:, :, :, TY - 1, :],
                                  (2, 0, 1, 3))[:, :, None]
        spec_up = pl.BlockSpec((1, c, 1, k, TX),
                               lambda i, j: ((i - 1) % ni, 0, 0, 0, j),
                               memory_space=pltpu.VMEM)
        spec_dn = pl.BlockSpec((1, c, 1, k, TX),
                               lambda i, j: ((i + 1) % ni, 0, 0, 0, j),
                               memory_space=pltpu.VMEM)
        spec_lf = pl.BlockSpec((c, k, TY, SX),
                               lambda i, j: (0, 0, i,
                                             ((j - 1) % nj) * r + r - 1),
                               memory_space=pltpu.VMEM)
        spec_rt = pl.BlockSpec((c, k, TY, SX),
                               lambda i, j: (0, 0, i, ((j + 1) % nj) * r),
                               memory_space=pltpu.VMEM)
        spec_mk = pl.BlockSpec((TY, TX), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)
        in_specs = [spec_u, spec_up, spec_dn, spec_lf, spec_rt, spec_mk]
        args = [u, rows_last, rows_first, u, u, shock]
        out_shape = jax.ShapeDtypeStruct(u.shape, u.dtype)
        out_specs = spec_u
        if with_diag:
            dshape = jax.ShapeDtypeStruct((ni * 8, nj * 128), u.dtype)
            dspec = pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
            out_shape = [out_shape, dshape, dshape]
            out_specs = [out_specs, dspec, dspec]
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(ni, nj),
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(*args)
        if with_diag:
            u1, lam, minq = out
            return u1, jnp.max(lam), jnp.min(minq)
        return out

    return lambda u, shock: call(u, shock, interpret=_interpret())


# ---------------------------------------------------------------------------
# Fused MOOD acceptance check: {DMP + u2 smoothness + degree-reduction /
# limiter-mark / neighbor-spread bookkeeping} (apply_mood,
# src/mood.cc:290-491) as ONE VMEM pass over three candidate PLANES.
# The XLA form in stab/mood.check_update runs ~10 whole-plane window/select
# passes per cascade iteration (~0.3 ms at bench shapes even with the
# r5 reduce_window forms); this kernel reads 3 candidate planes + 2 bounds
# planes + deg/lim and writes deg/lim/chg in ~9 plane transfers total.
# ---------------------------------------------------------------------------


def make_fused_mood_check(basis, mesh, *, per_x: bool = False,
                          per_y: bool = False, dtype=jnp.float32):
    """Build check(cand3, dmp_min, dmp_max, deg, lim) ->
    (deg_new, lim_new, chg) for a modal Pk basis.

    cand3: [3, ny, nx] = candidate's (rho mode-0, rho D2xx, rho D2yy)
    coefficient planes (u_c[RHO, 0], u_c[RHO, 2], u_c[RHO, 2p+1]);
    dmp_min/max: [ny, nx] predictor density bounds; deg int32 [ny, nx];
    lim bool [ny, nx].  Returns int32 deg_new, bool lim_new, bool chg.

    Envelope: unmasked, ny % 8 == 0, and a lane axis that can ride ONE
    full-width block (nx % 128 == 0, or ragged-but-small so Mosaic
    lane-pads it) — the planes are small (a [3, ty+4, nx] working set is
    ~170 KB at bench shapes), so unlike the state kernels the full width
    always fits VMEM.  x-neighbor access is then an in-block roll
    (periodic wrap exactly right for per_x; edge arms killed by validity
    iotas otherwise), and only 2-deep up/dn halo rows cross tiles (the u2
    window feeding the spread dilation reaches 2 rows).
    """
    from dflo_tpu.stab.mood import DMP_EPS, U2_EPS, U2_TINY

    if basis.family != "Pk" or basis.degree < 2:
        raise ValueError("fused MOOD check needs modal Pk, degree >= 2")
    ny, nx = mesh.ny, mesh.nx
    if ny % 8 != 0 or not (nx % 128 == 0 or _pick_tx(nx) == nx):
        raise ValueError("fused MOOD check needs ny % 8 == 0 and a "
                         "full-width-blockable nx")
    avg_full = basis.wq2 @ basis.V
    avg0 = float(avg_full[0])

    def kernel(c_ref, up_ref, dn_ref, bmin_ref, bmax_ref, deg_ref, lim_ref,
               deg_out, lim_out, chg_out):
        i = pl.program_id(0)
        n_i = pl.num_programs(0)
        C = c_ref[:]                                  # [3, ty, tx]
        _, ty, tx = C.shape
        up = up_ref[0]                                # [3, 2, tx] rows -2,-1
        dn = dn_ref[0]                                # [3, 2, tx] rows +1,+2

        # extended plane with 2 halo rows on each side: [3, ty+4, tx]
        # (halo packs arrive pre-transposed so no in-kernel transpose)
        ext = jnp.concatenate([up, C, dn], axis=1)

        row_e = jax.lax.broadcasted_iota(jnp.int32, (ty + 4, 1), 0) - 2 \
            + i * ty                                  # global row id
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tx), 1)
        nyg = n_i * ty
        if per_y:      # wrapped halo rows are REAL cells under periodicity
            in_dom = jnp.ones_like(row_e, jnp.bool_)
        else:
            in_dom = (row_e >= 0) & (row_e <= nyg - 1)
        vS_e = jnp.ones((ty + 4, 1), jnp.bool_) if per_y else (row_e >= 1)
        vN_e = jnp.ones((ty + 4, 1), jnp.bool_) if per_y else \
            (row_e <= nyg - 2)
        vW = jnp.ones((1, tx), jnp.bool_) if per_x else (col >= 1)
        vE = jnp.ones((1, tx), jnp.bool_) if per_x else (col <= tx - 2)

        def sh_we(a, shift):
            # lane roll: exact periodic wrap; edge arms masked by vW/vE
            return jnp.roll(a, shift, axis=-1)

        def sh_sn(a, shift):
            # sublane shift within the extended rows (halo rows supply
            # the out-of-tile values; the outermost 2 rows' own S/N arms
            # are never consumed at the depths used below)
            return jnp.roll(a, shift, axis=-2)

        def plus_min_e(a, vS, vN):
            big = jnp.asarray(jnp.inf, a.dtype)
            m = a
            m = jnp.minimum(m, jnp.where(vW, sh_we(a, 1), big))
            m = jnp.minimum(m, jnp.where(vE, sh_we(a, -1), big))
            m = jnp.minimum(m, jnp.where(vS, sh_sn(a, 1), big))
            m = jnp.minimum(m, jnp.where(vN, sh_sn(a, -1), big))
            return m

        def plus_max_e(a, vS, vN):
            big = jnp.asarray(-jnp.inf, a.dtype)
            m = a
            m = jnp.maximum(m, jnp.where(vW, sh_we(a, 1), big))
            m = jnp.maximum(m, jnp.where(vE, sh_we(a, -1), big))
            m = jnp.maximum(m, jnp.where(vS, sh_sn(a, 1), big))
            m = jnp.maximum(m, jnp.where(vN, sh_sn(a, -1), big))
            return m

        # ---- u2 smoothness on the extended rows (valid rows -1..ty) ----
        ok_e = jnp.ones((ty + 4, tx), jnp.bool_)
        for pi in (1, 2):
            D2 = ext[pi]
            mn = plus_min_e(D2, vS_e, vN_e)
            mx = plus_max_e(D2, vS_e, vN_e)
            amn = jnp.abs(mn)
            amx = jnp.abs(mx)
            flat = jnp.maximum(amn, amx) < U2_TINY
            ok_e = ok_e & (flat | ((mn * mx >= 0)
                                   & (amn >= amx * (1.0 - U2_EPS))))

        # ---- DMP on rows -1..ty (bounds tiles carry 1-row halos too) ---
        bmin = bmin_ref[0]                            # [ty+2, tx] rows -1..ty
        bmax = bmax_ref[0]
        rho_e = avg0 * ext[0, 1:ty + 3]               # rows -1..ty
        dmp = (rho_e - bmin > -DMP_EPS) & (rho_e - bmax < DMP_EPS)
        fail_e = ~(dmp | ok_e[1:ty + 3])              # rows -1..ty
        fail_e = fail_e & in_dom[1:ty + 3]            # halo rows off-domain

        deg = deg_ref[0]                              # [ty+2, tx] rows -1..ty
        lim = lim_ref[0] > 0.5
        red_self_e = fail_e & (deg > 1)
        mark_self_e = fail_e & (deg == 1) & ~lim
        spread_e = fail_e & (deg == 1) & lim
        # neighbor spread: plus-dilation, non-wrapping in y via row
        # validity, lane-roll wrap in x is exact for per_x
        # dilation in f32: Mosaic can neither roll i1 vectors nor
        # truncate i8->i1, so the spread flag shifts as 0.0/1.0 floats
        spf = spread_e.astype(jnp.float32)
        vS_c = vS_e[1:ty + 3]
        vN_c = vN_e[1:ty + 3]
        nbf = spf
        nbf = jnp.maximum(nbf, jnp.where(vW, sh_we(spf, 1), 0.0))
        nbf = jnp.maximum(nbf, jnp.where(vE, sh_we(spf, -1), 0.0))
        nbf = jnp.maximum(nbf, jnp.where(vS_c, sh_sn(spf, 1), 0.0))
        nbf = jnp.maximum(nbf, jnp.where(vN_c, sh_sn(spf, -1), 0.0))
        nb = nbf > 0.5
        red_nb_e = nb & (deg > 1) & ~red_self_e
        mark_nb_e = nb & (deg == 1) & ~lim & ~mark_self_e

        deg_new = deg - (red_self_e | red_nb_e).astype(deg.dtype)
        lim_new = lim | mark_self_e | mark_nb_e
        chg = red_self_e | red_nb_e

        # write the CENTER rows (1..ty of the (ty+2)-row working set)
        deg_out[0] = deg_new[1:ty + 1]
        lim_out[0] = lim_new[1:ty + 1].astype(jnp.float32)
        chg_out[0] = chg[1:ty + 1].astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def call(cand3, dmp_min, dmp_max, deg, lim, interpret=False):
        TY = _pick_ty(ny)
        ni = ny // TY
        TX = nx

        # 2-deep halo row packs, gathered once per call: rows (i*TY-2,
        # i*TY-1) and (i*TY+TY, i*TY+TY+1) with periodic wrap (non-periodic
        # arms are masked in-kernel)
        c5 = cand3.reshape(3, ni, TY, nx)
        top2 = jnp.stack([c5[:, :, 0, :], c5[:, :, 1, :]], axis=2)
        bot2 = jnp.stack([c5[:, :, TY - 2, :], c5[:, :, TY - 1, :]], axis=2)
        # up pack for tile i = last two rows of tile i-1; dn = first two of
        # tile i+1 -> [ni, 3, 2, nx] (pre-transposed: no in-kernel transpose)
        up_rows = jnp.transpose(bot2, (1, 0, 2, 3))
        dn_rows = jnp.transpose(top2, (1, 0, 2, 3))
        spec_up = pl.BlockSpec((1, 3, 2, TX), lambda i: ((i - 1) % ni, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_dn = pl.BlockSpec((1, 3, 2, TX), lambda i: ((i + 1) % ni, 0, 0, 0),
                               memory_space=pltpu.VMEM)

        # 1-row-halo row packs for the scalar planes: [ni, TY+2, nx] built
        # by gathering the wrap rows once
        def with_halo1(a):
            a3 = a.reshape(ni, TY, nx)
            up1 = jnp.roll(a3[:, TY - 1, :], 1, axis=0)[:, None]
            dn1 = jnp.roll(a3[:, 0, :], -1, axis=0)[:, None]
            return jnp.concatenate([up1, a3, dn1], axis=1)  # [ni, TY+2, nx]

        spec_h1 = pl.BlockSpec((1, TY + 2, TX), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_c = pl.BlockSpec((3, TY, TX), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        spec_o = pl.BlockSpec((1, TY, TX), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

        deg_new, lim_new, chg = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((ni, TY, nx), deg.dtype),
                       jax.ShapeDtypeStruct((ni, TY, nx), jnp.float32),
                       jax.ShapeDtypeStruct((ni, TY, nx), jnp.float32)],
            grid=(ni,),
            in_specs=[spec_c, spec_up, spec_dn, spec_h1, spec_h1,
                      spec_h1, spec_h1],
            out_specs=[spec_o, spec_o, spec_o],
            interpret=interpret,
        )(cand3, up_rows, dn_rows, with_halo1(dmp_min), with_halo1(dmp_max),
          with_halo1(deg), with_halo1(lim.astype(jnp.float32)))
        return (deg_new.reshape(ny, nx),
                lim_new.reshape(ny, nx) > 0.5,
                chg.reshape(ny, nx) > 0.5)

    return lambda cand3, dmn, dmx, deg, lim: call(
        cand3, dmn, dmx, deg, lim, interpret=_interpret())
