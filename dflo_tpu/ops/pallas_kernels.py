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


def _fused_kernel(*refs, K, nq, flux_name, per_x, per_y, blend, masked,
                  collocated=True, Q=None):
    from dflo_tpu.physics.fluxes import get_flux
    num_flux = get_flux(flux_name, kernel_safe=True)
    refs = list(refs)
    if not collocated:
        # modal / non-collocated bases (Pk Legendre, over-integrated Qk):
        # the volume flux needs point values Wq = V u at the Q quadrature
        # points (the XLA path's basis_apply(V, u), spatial.py:331); the
        # trace/avg/lift operators act on coefficients and are unchanged
        vop_ref = refs.pop(4)
    if masked:
        # solid-cell mask tiles (self + 4 halo neighbors), fluid = 1;
        # fluid-solid interfaces get slip-wall mirror operands and solid
        # residuals are zeroed (mirrors the XLA path's wallx/wally logic)
        m_ref, m_up_ref, m_dn_ref, m_lf_ref, m_rt_ref = refs[9:14]
        del refs[9:14]
    if blend:
        # extra inputs: the previous-step state tile + [a, dt] scalars;
        # the kernel then emits the complete SSP stage
        # a*u_old + (1-a)*(u + dt*R) (src/claw.cc:757-760) — the separate
        # axpy pass and its 4 state-sized HBM transfers disappear
        (trc_ref, trcs_ref, liftv_ref, liftf_ref, u_ref, up_ref, dn_ref,
         lf_ref, rt_ref, dfw_ref, dfe_ref, dfs_ref, dfn_ref,
         uold_ref, sc_ref, out_ref) = refs
    else:
        (trc_ref, trcs_ref, liftv_ref, liftf_ref, u_ref, up_ref, dn_ref,
         lf_ref, rt_ref, dfw_ref, dfe_ref, dfs_ref, dfn_ref,
         out_ref) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_j = pl.num_programs(1)
    P = jax.lax.Precision.HIGHEST

    def traces(tile):
        """[4,K,ty,tx] -> (uW,uE,uS,uN,ub) via one stacked matmul."""
        c_, _k, ty_, tx_ = tile.shape
        flat = jnp.moveaxis(tile, 1, 0).reshape(K, c_ * ty_ * tx_)
        TR = jnp.dot(trc_ref[:], flat, preferred_element_type=flat.dtype,
                     precision=P)
        TR = jnp.moveaxis(TR.reshape(4 * nq + 1, c_, ty_, tx_), 1, 0)
        return (TR[:, 0 * nq:1 * nq], TR[:, 1 * nq:2 * nq],
                TR[:, 2 * nq:3 * nq], TR[:, 3 * nq:4 * nq], TR[:, 4 * nq])

    W = u_ref[:]
    c, k, ty, tx = W.shape
    uW, uE, uS, uN, ub = traces(W)
    # Halo inputs are the four neighbor tiles (periodic-wrapped index
    # maps), but only one face row/column of each is needed, so the halo
    # trace work is slimmed: up/dn tiles get per-component row-sliced
    # [face+avg, K] x [K, tx] dots on just the boundary row; lf/rt tiles
    # get whole-tile dots with only the (nq+1) needed operator rows.
    # trcs_ref rows: [W-face rows + avg | E | S | N] per side block.
    m1 = nq + 1

    def row_trace(tile_ref, side, row):
        """face trace + avg of ONE row of a halo tile -> [c,nq,1,tx],[c,1,tx]."""
        op = trcs_ref[side * m1:(side + 1) * m1]
        outs = [jnp.dot(op, tile_ref[ci, :, row, :],
                        preferred_element_type=W.dtype, precision=P)
                for ci in range(c)]                 # each [nq+1, tx]
        st = jnp.stack(outs)                        # [c, nq+1, tx]
        # slice-only assembly (int+newaxis indexing lowers to >2D gather,
        # which Mosaic rejects): [c, nq, 1, tx] face patch + [c, 1, tx] avg
        face = jnp.stack([st[:, q:q + 1, :] for q in range(nq)], axis=1)
        return face, st[:, nq:nq + 1, :]

    def side_trace(tile, side):
        """face trace + avg of a whole tile -> [c,nq,ty,tx],[c,ty,tx]."""
        c_, _k, ty_, tx_ = tile.shape
        op = trcs_ref[side * m1:(side + 1) * m1]
        flat = jnp.moveaxis(tile, 1, 0).reshape(K, c_ * ty_ * tx_)
        TR = jnp.dot(op, flat, preferred_element_type=tile.dtype, precision=P)
        TR = jnp.moveaxis(TR.reshape(m1, c_, ty_, tx_), 1, 0)
        return TR[:, :nq], TR[:, nq]

    # up tile: its NORTH face on its last row; dn tile: SOUTH face, first row
    up_uN_last, up_ub_last = row_trace(up_ref, 3, ty - 1)  # [c,nq,1,tx]
    dn_uS_first, dn_ub_first = row_trace(dn_ref, 2, 0)
    lf_uE, lf_ub = side_trace(lf_ref[:], 1)
    rt_uW, rt_ub = side_trace(rt_ref[:], 0)
    rowq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ty, 1), 2)
    colq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, tx), 3)
    row2 = rowq[:, 0]
    col2 = colq[:, 0]

    def patch_first_row(a, patch, iota):
        """a[..., r, :] -> a[..., r-1, :] with row 0 from the halo patch."""
        return jnp.where(iota == 0, patch, jnp.roll(a, 1, axis=-2))

    def patch_last_row(a, patch, iota):
        return jnp.where(iota == ty - 1, patch, jnp.roll(a, -1, axis=-2))

    def shift_cols_right(a, halo_last, iota):
        return jnp.where(iota == 0, halo_last[..., tx - 1:tx],
                         jnp.roll(a, 1, axis=-1))

    def shift_cols_left(a, halo_first, iota):
        return jnp.where(iota == tx - 1, halo_first[..., 0:1],
                         jnp.roll(a, -1, axis=-1))

    uN_up = patch_first_row(uN, up_uN_last, rowq)
    ub_up = patch_first_row(ub, up_ub_last, row2)
    uS_dn = patch_last_row(uS, dn_uS_first, rowq)
    ub_dn = patch_last_row(ub, dn_ub_first, row2)
    uE_lf = shift_cols_right(uE, lf_uE, colq)
    ub_lf = shift_cols_right(ub, lf_ub, col2)
    uW_rt = shift_cols_left(uW, rt_uW, colq)
    ub_rt = shift_cols_left(ub, rt_ub, col2)

    def lift(op, F):
        """[K, m] x [4, m, ty, tx] -> [4, K, ty, tx]."""
        Ff = jnp.moveaxis(F, 1, 0).reshape(F.shape[1], -1)
        r = jnp.dot(op, Ff, preferred_element_type=Ff.dtype,
                    precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(r.reshape(K, c, ty, tx), 0, 1)

    # ---- volume flux ---------------------------------------------------
    if collocated:
        Wv = W                                      # nodes == quad points
        nQ = K
    else:
        nQ = Q
        flatW = jnp.moveaxis(W, 1, 0).reshape(K, c * ty * tx)
        Wq = jnp.dot(vop_ref[:], flatW, preferred_element_type=W.dtype,
                     precision=P)
        Wv = jnp.moveaxis(Wq.reshape(nQ, c, ty, tx), 1, 0)
    rho = Wv[euler.RHO]
    pres = (euler.GAMMA - 1.0) * (
        Wv[euler.ENE] - 0.5 * (Wv[euler.MX] ** 2 + Wv[euler.MY] ** 2) / rho)
    uvel = Wv[euler.MX] / rho
    vvel = Wv[euler.MY] / rho
    Fx = jnp.stack([Wv[euler.MX] * uvel + pres, Wv[euler.MY] * uvel,
                    Wv[euler.MX], (Wv[euler.ENE] + pres) * uvel])
    Fy = jnp.stack([Wv[euler.MX] * vvel, Wv[euler.MY] * vvel + pres,
                    Wv[euler.MY], (Wv[euler.ENE] + pres) * vvel])
    R = lift(liftv_ref[:, :nQ], Fx) + lift(liftv_ref[:, nQ:], Fy)

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
        m_W = jnp.where(colq[0, 0] == 0, m_lf_ref[:, tx - 1:tx],
                        jnp.roll(m_c, 1, axis=-1))
        m_E = jnp.where(colq[0, 0] == tx - 1, m_rt_ref[:, 0:1],
                        jnp.roll(m_c, -1, axis=-1))
        m_S = jnp.where(rowq[0, 0] == 0, m_up_ref[ty - 1:ty, :],
                        jnp.roll(m_c, 1, axis=-2))
        m_N = jnp.where(rowq[0, 0] == ty - 1, m_dn_ref[0:1, :],
                        jnp.roll(m_c, -1, axis=-2))

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
    Fe_all = shift_cols_left(Fw_all, Fe_last, colq)

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
    Fn_all = patch_last_row(Fs_all, Fn_last, rowq)

    # ---- boundary corrections (delta fluxes, precomputed outside) ------
    # one-hot masked adds: .at[].add lowers to scatter-add, which Mosaic
    # does not implement — a broadcasted where against an iota does the
    # same column/row-targeted update as dense VPU ops
    if not per_x:
        # W/E strips ride as [ny, 4, nq] so the tile-blocked dim is first
        # (the last two dims must be whole, per the TPU block rules)
        dfw = jnp.moveaxis(dfw_ref[:], 0, -1)           # [4, nq, ty]
        dfe = jnp.moveaxis(dfe_ref[:], 0, -1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, tx), 3)
        Fw_all = Fw_all + jnp.where((j == 0) & (col == 0),
                                    dfw[..., None], 0.0)
        Fe_all = Fe_all + jnp.where((j == n_j - 1) & (col == tx - 1),
                                    dfe[..., None], 0.0)
    if not per_y:
        # first/last row-tile owns the domain's bottom/top row
        dfs = dfs_ref[:]                                # [4, nq, tx]
        dfn = dfn_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ty, 1), 2)
        Fs_all = Fs_all + jnp.where((i == 0) & (row == 0),
                                    dfs[:, :, None, :], 0.0)
        Fn_all = Fn_all + jnp.where((i == n_i - 1) & (row == ty - 1),
                                    dfn[:, :, None, :], 0.0)

    # ---- face lifts ----------------------------------------------------
    R = R + lift(liftf_ref[:, 0 * nq:1 * nq], Fw_all)
    R = R - lift(liftf_ref[:, 1 * nq:2 * nq], Fe_all)
    R = R + lift(liftf_ref[:, 2 * nq:3 * nq], Fs_all)
    R = R - lift(liftf_ref[:, 3 * nq:4 * nq], Fn_all)

    if masked:
        R = R * m_c[None, None]                     # solid cells are frozen
    if blend:
        a = sc_ref[0]
        dt = sc_ref[1]
        out_ref[:] = a * uold_ref[:] + (1.0 - a) * (W + dt * R)
    else:
        out_ref[:] = R


def make_fused_residual(basis, mesh, flux_name: str, per_x: bool,
                        per_y: bool, dtype=jnp.float32, mask=None):
    """Build fused(u, dfw, dfe, dfs, dfn) -> M^{-1} R(u) for any
    diagonal-mass basis on a Cartesian mesh (the bench/production hot path):
    collocated Qk/Qk_gll directly, modal Pk (the MOOD basis,
    src/parameters.cc:541-544) and over-integrated Qk via an in-kernel
    V contraction to quadrature-point values.

    The mass solve and area scaling are folded into the lift constants:
    rows of every lift operator are pre-multiplied by minv/area, so the
    kernel's single output IS du/dt's interior part."""
    K, nq = basis.K, basis.nq
    collocated = basis.is_nodal_collocated
    Q = len(basis.wq2)
    scale = (1.0 / basis.mass)[:, None] / (mesh.dx * mesh.dy)
    GxW = basis.wq2[:, None] * basis.Gx
    GyW = basis.wq2[:, None] * basis.Gy
    avg_op = basis.wq2 @ basis.V
    trc = np.concatenate([basis.faceV[0], basis.faceV[1], basis.faceV[2],
                          basis.faceV[3], avg_op[None]], axis=0)
    # per-side [face rows | avg] blocks for the slimmed halo traces
    trcs = np.concatenate(
        [np.concatenate([basis.faceV[f], avg_op[None]], axis=0)
         for f in range(4)], axis=0)
    liftv = np.concatenate([mesh.dy * GxW.T, mesh.dx * GyW.T],
                           axis=1) * scale
    fvw = [basis.wq[:, None] * basis.faceV[f] for f in range(4)]
    # order matches FSTK: [Fw(all +west lift), -Fe(east), Fs(south), -Fn(north)]
    liftf = np.concatenate([mesh.dy * fvw[0].T, mesh.dy * fvw[1].T,
                            mesh.dx * fvw[2].T, mesh.dx * fvw[3].T],
                           axis=1) * scale
    trc = jnp.asarray(trc, dtype)
    trcs = jnp.asarray(trcs, dtype)
    liftv = jnp.asarray(liftv, dtype)
    liftf = jnp.asarray(liftf, dtype)
    vop = None if collocated else jnp.asarray(basis.V, dtype)
    masked = mask is not None
    fmask = (jnp.asarray(np.asarray(mask, np.float32), dtype)
             if masked else None)

    @functools.partial(jax.jit,
                       static_argnames=("interpret", "blend"))
    def fused(u, dfw, dfe, dfs, dfn, u_old=None, scalars=None,
              interpret=False, blend=False):
        c, k, ny, nx = u.shape
        TY = 8 if ny % 8 == 0 else ny
        # lanes: largest 128-multiple divisor of nx up to 512, else full nx
        TX = nx
        for cand in (512, 384, 256, 128):
            if nx % cand == 0:
                TX = cand
                break
        ni, nj = ny // TY, nx // TX
        spec_u = pl.BlockSpec((c, k, TY, TX), lambda i, j: (0, 0, i, j),
                              memory_space=pltpu.VMEM)
        # halos = the four neighbor TILES fetched straight from u
        # (periodic-wrapped index maps, matching the kernel's wrap
        # semantics); the kernel traces only one row/column of each
        spec_up = pl.BlockSpec((c, k, TY, TX),
                               lambda i, j: (0, 0, (i - 1) % ni, j),
                               memory_space=pltpu.VMEM)
        spec_dn = pl.BlockSpec((c, k, TY, TX),
                               lambda i, j: (0, 0, (i + 1) % ni, j),
                               memory_space=pltpu.VMEM)
        spec_lf = pl.BlockSpec((c, k, TY, TX),
                               lambda i, j: (0, 0, i, (j - 1) % nj),
                               memory_space=pltpu.VMEM)
        spec_rt = pl.BlockSpec((c, k, TY, TX),
                               lambda i, j: (0, 0, i, (j + 1) % nj),
                               memory_space=pltpu.VMEM)
        spec_op = lambda s: pl.BlockSpec(  # noqa: E731
            s, lambda i, j: tuple(0 for _ in s), memory_space=pltpu.VMEM)
        in_specs = [spec_op(trc.shape), spec_op(trcs.shape),
                    spec_op(liftv.shape), spec_op(liftf.shape)]
        args = [trc, trcs, liftv, liftf]
        if not collocated:
            in_specs += [spec_op(vop.shape)]
            args += [vop]
        in_specs += [spec_u, spec_up, spec_dn, spec_lf, spec_rt]
        args += [u, u, u, u, u]
        if masked:
            sm = pl.BlockSpec((TY, TX), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
            in_specs += [sm,
                         pl.BlockSpec((TY, TX),
                                      lambda i, j: ((i - 1) % ni, j),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((TY, TX),
                                      lambda i, j: ((i + 1) % ni, j),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((TY, TX),
                                      lambda i, j: (i, (j - 1) % nj),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((TY, TX),
                                      lambda i, j: (i, (j + 1) % nj),
                                      memory_space=pltpu.VMEM)]
            args += [fmask, fmask, fmask, fmask, fmask]
        in_specs += [pl.BlockSpec((TY, 4, nq), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((TY, 4, nq), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((4, nq, TX), lambda i, j: (0, 0, j),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((4, nq, TX), lambda i, j: (0, 0, j),
                                  memory_space=pltpu.VMEM)]
        args += [jnp.moveaxis(dfw, -1, 0), jnp.moveaxis(dfe, -1, 0), dfs, dfn]
        if blend:
            in_specs += [spec_u,
                         pl.BlockSpec((2,), lambda i, j: (0,),
                                      memory_space=pltpu.SMEM)]
            args += [u_old, scalars]
        return pl.pallas_call(
            functools.partial(_fused_kernel, K=K, nq=nq,
                              flux_name=flux_name,
                              per_x=per_x, per_y=per_y, blend=blend,
                              masked=masked, collocated=collocated, Q=Q),
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            grid=(ni, nj),
            in_specs=in_specs,
            out_specs=spec_u,
            interpret=interpret,
        )(*args)

    def fused_residual(u, dfw, dfe, dfs, dfn, u_old=None, a=None, dt=None):
        """R(u) (mass-solved), or with (u_old, a, dt) the full SSP stage
        a*u_old + (1-a)*(u + dt*R)."""
        if u_old is None:
            return fused(u, dfw, dfe, dfs, dfn, interpret=_interpret())
        sc = jnp.stack([jnp.asarray(a, u.dtype), jnp.asarray(dt, u.dtype)])
        return fused(u, dfw, dfe, dfs, dfn, u_old, sc,
                     interpret=_interpret(), blend=True)

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
                    dtype=jnp.float32):
    """Build post(u) -> u_limited, the fused per-stage stabilization chain.

    Equivalent (to f32 roundoff) to Solver.post_stage for the supported
    configuration; cites the same reference passes:
    indicator src/indicator.cc:48-198, TVB src/limiter.cc:224-370,
    positivity src/positivity.cc:16-208.
    """
    from dflo_tpu.physics import euler as _euler
    from dflo_tpu.stab.positivity import EPS, _pos_points

    if basis.family != "Qk" or not basis.is_nodal_collocated:
        raise ValueError("fused post needs the collocated Qk basis")
    if indicator not in ("density", "energy", "limiter"):
        raise ValueError(f"fused post does not support indicator "
                         f"{indicator!r}")
    p = basis.degree
    K, nq = basis.K, basis.nq
    dx, dy = mesh.dx, mesh.dy
    h = mesh.diameter_h
    diam = float(np.sqrt(dx * dx + dy * dy))
    Mdx2 = M * h * h
    comp = {"density": euler.RHO, "energy": euler.ENE,
            "limiter": euler.RHO}[indicator]
    mark_all = indicator == "limiter"

    # closure operator constants (small; become vector constants in-kernel).
    # Quadrature weights are baked into the face-trace operator so the
    # indicator's face integral is a plain axis sum, and the nodal linear
    # rebuild is a [K,3] matmul over stacked [ub, Dxn, Dyn] — both avoid
    # 1-D -> 3-D broadcasts that Mosaic's layout inference rejects.
    trcd_np = np.concatenate([basis.wq[:, None] * basis.faceV[f]
                              for f in range(4)], axis=0)
    avg_np = (basis.wq2 @ basis.V)[None]            # [1, K]
    # per-side [wq-weighted face rows | avg] blocks for slimmed halo work
    trcsp_np = np.concatenate(
        [np.concatenate([basis.wq[:, None] * basis.faceV[f], avg_np], axis=0)
         for f in range(4)], axis=0)                # [4*(nq+1), K]
    gx_np = (basis.wq2 @ basis.Gx)[None]
    gy_np = (basis.wq2 @ basis.Gy)[None]
    P_np = basis.eval_at(_pos_points(p))            # [Qp, K]
    reb_np = np.stack([np.ones(K),
                       (basis.nodes[:, 0] - 0.5) * dx / h,
                       (basis.nodes[:, 1] - 0.5) * dy / h], axis=1)  # [K,3]

    def kernel(trcd_ref, trcs_ref, ops1_ref, P_ref, reb_ref,
               u_ref, up_ref, dn_ref, lf_ref, rt_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        n_i = pl.num_programs(0)
        n_j = pl.num_programs(1)
        W = u_ref[:]
        c, k, ty, tx = W.shape
        f32 = W.dtype
        trcd = trcd_ref[:]
        avg = ops1_ref[0:1]
        gx = ops1_ref[1:2]
        gy = ops1_ref[2:3]
        P = P_ref[:]
        HI = jax.lax.Precision.HIGHEST
        m1 = nq + 1

        def rowmat(op, tile):
            """[m, K] x [4, K, ty, tx] -> [4, m, ty, tx]."""
            c_, _k, ty_, tx_ = tile.shape
            flat = jnp.moveaxis(tile, 1, 0).reshape(K, c_ * ty_ * tx_)
            r = jnp.dot(op, flat, preferred_element_type=f32,
                        precision=HI)
            return jnp.moveaxis(r.reshape(op.shape[0], c_, ty_, tx_), 1, 0)

        def avg_of(tile):
            return rowmat(avg, tile)[:, 0]          # [4, ty, tx]

        # slimmed halo work (same pattern as the fused residual): only one
        # face row/column of each halo tile is ever consumed
        def row_trace(tile_ref, side, row):
            op = trcs_ref[side * m1:(side + 1) * m1]
            outs = [jnp.dot(op, tile_ref[ci, :, row, :],
                            preferred_element_type=f32, precision=HI)
                    for ci in range(c)]             # each [nq+1, tx]
            st = jnp.stack(outs)                    # [c, nq+1, tx]
            face = jnp.stack([st[:, q:q + 1, :] for q in range(nq)], axis=1)
            return face, st[:, nq:nq + 1, :]        # [c,nq,1,tx], [c,1,tx]

        def side_trace(tile, side):
            c_, _k, ty_, tx_ = tile.shape
            op = trcs_ref[side * m1:(side + 1) * m1]
            flat = jnp.moveaxis(tile, 1, 0).reshape(K, c_ * ty_ * tx_)
            TR = jnp.dot(op, flat, preferred_element_type=f32, precision=HI)
            TR = jnp.moveaxis(TR.reshape(m1, c_, ty_, tx_), 1, 0)
            return TR[:, :nq], TR[:, nq]            # [c,nq,ty,tx], [c,ty,tx]

        ub = avg_of(W)
        up_face, up_avg = row_trace(up_ref, 3, ty - 1)  # N face, last row
        dn_face, dn_avg = row_trace(dn_ref, 2, 0)       # S face, first row
        lf_face, lf_avg = side_trace(lf_ref[:], 1)      # E face
        rt_face, rt_avg = side_trace(rt_ref[:], 0)      # W face

        rowq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ty, 1), 2)
        colq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, tx), 3)
        row2 = rowq[:, 0]
        col2 = colq[:, 0]

        def patch_dn(a, patch, iota):  # value from row above (r-1)
            return jnp.where(iota == 0, patch, jnp.roll(a, 1, axis=-2))

        def patch_up(a, patch, iota):  # value from row below (r+1)
            return jnp.where(iota == ty - 1, patch, jnp.roll(a, -1, axis=-2))

        def sh_rt(a, halo, iota):      # value from column left (c-1)
            return jnp.where(iota == 0, halo[..., tx - 1:tx],
                             jnp.roll(a, 1, axis=-1))

        def sh_lf(a, halo, iota):      # value from column right (c+1)
            return jnp.where(iota == tx - 1, halo[..., 0:1],
                             jnp.roll(a, -1, axis=-1))

        ub_W = sh_rt(ub, lf_avg, col2)              # west-neighbor averages
        ub_E = sh_lf(ub, rt_avg, col2)
        ub_S = patch_dn(ub, up_avg, row2)
        ub_N = patch_up(ub, dn_avg, row2)

        # neighbor-exists flags (global edges unless periodic)
        one = jnp.ones((1, ty, tx), f32)
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
                v = jnp.moveaxis(tile[comp], 0, 0).reshape(K, -1)
                r = jnp.dot(trcd, v, preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
                r = r.reshape(4 * nq, tile.shape[2], tile.shape[3])
                return (r[0 * nq:1 * nq], r[1 * nq:2 * nq],
                        r[2 * nq:3 * nq], r[3 * nq:4 * nq])

            tW, tE, tS, tN = dtr(W)
            jW = (tW - sh_rt(tE, lf_face[comp], colq[0])) * vW
            jE = (tE - sh_lf(tW, rt_face[comp], colq[0])) * vE
            jS = (tS - patch_dn(tN, up_face[comp], rowq[0])) * vS
            jN = (tN - patch_up(tS, dn_face[comp], rowq[0])) * vN

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
        Dx = (h / dx) * rowmat(gx, W)[:, 0]
        Dy = (h / dy) * rowmat(gy, W)[:, 0]
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

        S = jnp.stack([ub, Dxn, Dyn], axis=1)       # [4, 3, ty, tx]
        Sf = jnp.moveaxis(S, 1, 0).reshape(3, -1)
        u_lim = jnp.moveaxis(
            jnp.dot(reb_ref[:], Sf, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST).reshape(K, c, ty, tx), 0, 1)
        active = active0 & (change > 1.0e-10)
        u1 = jnp.where(active[None, None], u_lim, W)

        # ---- Zhang-Shu positivity (src/positivity.cc:16-208) -----------
        if pos_lim:
            Wp = rowmat(P, u1)                      # [4, Qp, ty, tx]
            rho_min = jnp.min(Wp[euler.RHO], axis=0)
            rho_avg = ub[euler.RHO]
            rat = (jnp.abs(rho_avg - EPS)
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
            b1 = (2.0 * drho * (Eavg - EPS / (euler.GAMMA - 1.0))
                  + 2.0 * ravg * dE - 2.0 * (mavg_x * dmx + mavg_y * dmy))
            c1 = (2.0 * ravg * Eavg - (mavg_x**2 + mavg_y**2)
                  - 2.0 * EPS * ravg / (euler.GAMMA - 1.0))
            a1s = jnp.where(a1 == 0.0, 1.0, a1)
            b1n, c1n = b1 / a1s, c1 / a1s
            Dq = jnp.sqrt(jnp.abs(b1n * b1n - 4.0 * c1n))
            t1 = 0.5 * (-b1n - Dq)
            t2 = 0.5 * (-b1n + Dq)
            t1_ok = (t1 > -1.0e-12) & (t1 < 1.0 + 1.0e-12)
            t = jnp.where(t1_ok, t1, t2)
            t = jnp.clip(t, 0.0, 1.0)
            t = jnp.where(jnp.abs(1.0 - t) < 1.0e-14, 0.0, t)
            t = jnp.where(pre < EPS, t, 1.0)
            theta2 = jnp.min(t, axis=0)
            u1 = u1 * theta2[None, None] + ub[:, None] * (1 - theta2[None, None])

        out_ref[:] = u1

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def call(u, interpret=False):
        c, k, ny, nx = u.shape
        # Mosaic block rule: the last two block dims must be multiples of
        # (8, 128) or equal to the full array dims
        TY = 8 if ny % 8 == 0 else ny
        TX = nx
        for cand in (512, 384, 256, 128):
            if nx % cand == 0:
                TX = cand
                break
        ni, nj = ny // TY, nx // TX
        spec_u = pl.BlockSpec((c, k, TY, TX), lambda i, j: (0, 0, i, j),
                              memory_space=pltpu.VMEM)
        spec_up = pl.BlockSpec((c, k, TY, TX),
                               lambda i, j: (0, 0, (i - 1) % ni, j),
                               memory_space=pltpu.VMEM)
        spec_dn = pl.BlockSpec((c, k, TY, TX),
                               lambda i, j: (0, 0, (i + 1) % ni, j),
                               memory_space=pltpu.VMEM)
        spec_lf = pl.BlockSpec((c, k, TY, TX),
                               lambda i, j: (0, 0, i, (j - 1) % nj),
                               memory_space=pltpu.VMEM)
        spec_rt = pl.BlockSpec((c, k, TY, TX),
                               lambda i, j: (0, 0, i, (j + 1) % nj),
                               memory_space=pltpu.VMEM)
        spec_op = lambda sh: pl.BlockSpec(  # noqa: E731
            sh, lambda i, j: tuple(0 for _ in sh), memory_space=pltpu.VMEM)
        trcd = jnp.asarray(trcd_np, u.dtype)
        trcs = jnp.asarray(trcsp_np, u.dtype)
        ops1 = jnp.asarray(np.concatenate([avg_np, gx_np, gy_np]), u.dtype)
        P = jnp.asarray(P_np, u.dtype)
        reb = jnp.asarray(reb_np, u.dtype)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            grid=(ni, nj),
            in_specs=[spec_op(trcd.shape), spec_op(trcs.shape),
                      spec_op(ops1.shape),
                      spec_op(P.shape), spec_op(reb.shape),
                      spec_u, spec_up, spec_dn, spec_lf, spec_rt],
            out_specs=spec_u,
            interpret=interpret,
        )(trcd, trcs, ops1, P, reb, u, u, u, u, u)

    def fused_post(u):
        return call(u, interpret=_interpret())

    return fused_post


# ---------------------------------------------------------------------------
# Fused per-step diagnostics: {cell averages -> max wave speed, min of
# (rho_avg, p_avg)} reduced in VMEM to one scalar pair per tile.  Replaces
# two whole-domain XLA passes per step (compute_time_step_cartesian,
# src/claw.cc:483-512, and the positivity fatal check,
# src/positivity.cc:26-39) that each materialized the full ubar array.
# ---------------------------------------------------------------------------


def make_fused_diag(basis, mesh, dtype=jnp.float32):
    """Build diag(u) -> (lam_max, min_rho_p): the global max of
    (c+|vx|)/h + (c+|vy|)/h over cell averages, and the global min of
    density/pressure averages (for the fatal-negativity flag)."""
    K = basis.K
    avg_np = (basis.wq2 @ basis.V)[None]            # [1, K]
    h = mesh.diameter_h

    def kernel(avg_ref, u_ref, lam_ref, minq_ref):
        W = u_ref[:]
        c, k, ty, tx = W.shape
        f32 = W.dtype
        flat = jnp.moveaxis(W, 1, 0).reshape(K, c * ty * tx)
        ub = jnp.dot(avg_ref[:], flat, preferred_element_type=f32,
                     precision=jax.lax.Precision.HIGHEST)
        ub = ub.reshape(c, ty, tx)
        rho = ub[euler.RHO]
        pre = (euler.GAMMA - 1.0) * (
            ub[euler.ENE]
            - 0.5 * (ub[euler.MX] ** 2 + ub[euler.MY] ** 2) / rho)
        cs = jnp.sqrt(euler.GAMMA * jnp.abs(pre) / jnp.abs(rho))
        vx = jnp.abs(ub[euler.MX] / rho)
        vy = jnp.abs(ub[euler.MY] / rho)
        lam = (cs + vx) / h + (cs + vy) / h
        # each program owns one (8,128) block (the minimum TPU tile);
        # broadcast the tile scalar across it
        lam_ref[:] = jnp.full((8, 128), jnp.max(lam), f32)
        minq_ref[:] = jnp.full((8, 128),
                               jnp.minimum(jnp.min(rho), jnp.min(pre)), f32)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def call(u, interpret=False):
        c, k, ny, nx = u.shape
        # Mosaic block rule: the last two block dims must be multiples of
        # (8, 128) or equal to the full array dims
        TY = 8 if ny % 8 == 0 else ny
        TX = nx
        for cand in (512, 384, 256, 128):
            if nx % cand == 0:
                TX = cand
                break
        ni, nj = ny // TY, nx // TX
        avg = jnp.asarray(avg_np, u.dtype)
        lam, minq = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((ni * 8, nj * 128), u.dtype),
                       jax.ShapeDtypeStruct((ni * 8, nj * 128), u.dtype)],
            grid=(ni, nj),
            in_specs=[pl.BlockSpec((1, K), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((c, k, TY, TX),
                                   lambda i, j: (0, 0, i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM)],
            interpret=interpret,
        )(avg, u)
        return jnp.max(lam), jnp.min(minq)

    def diag(u):
        return call(u, interpret=_interpret())

    return diag
