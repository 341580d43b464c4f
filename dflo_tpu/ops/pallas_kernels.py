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
    R = jnp.dot(L_ref[:], Ff, preferred_element_type=jnp.float32)
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
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    return _volume_call(lift, u, interpret=not on_tpu)


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


def _fused_kernel(trc_ref, liftv_ref, liftf_ref, u_ref, up_ref, dn_ref,
                  lf_ref, rt_ref, dfw_ref, dfe_ref, dfs_ref, dfn_ref,
                  out_ref, *, K, nq, flux_name, per_x, per_y):
    from dflo_tpu.physics.fluxes import get_flux
    num_flux = get_flux(flux_name)
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)
    n_j = pl.num_programs(1)

    def traces(tile):
        """[4,K,ty,tx] -> (uW,uE,uS,uN,ub) via one stacked matmul."""
        c_, _k, ty_, tx_ = tile.shape
        flat = jnp.moveaxis(tile, 1, 0).reshape(K, c_ * ty_ * tx_)
        TR = jnp.dot(trc_ref[:], flat, preferred_element_type=flat.dtype)
        TR = jnp.moveaxis(TR.reshape(4 * nq + 1, c_, ty_, tx_), 1, 0)
        return (TR[:, 0 * nq:1 * nq], TR[:, 1 * nq:2 * nq],
                TR[:, 2 * nq:3 * nq], TR[:, 3 * nq:4 * nq], TR[:, 4 * nq])

    W = u_ref[:]
    c, k, ty, tx = W.shape
    uW, uE, uS, uN, ub = traces(W)
    # halo inputs are the four neighbor tiles (periodic-wrapped index
    # maps), traced whole (Mosaic rejects reshape on 1-lane slices); the
    # in-tile neighbor view is a roll with the wrapped-in row/column
    # patched from the halo's far edge via a masked where
    _, _, _, up_uN, up_ub = traces(up_ref[:])
    _, _, dn_uS, _, dn_ub = traces(dn_ref[:])
    _, lf_uE, _, _, lf_ub = traces(lf_ref[:])
    rt_uW, _, _, _, rt_ub = traces(rt_ref[:])
    rowq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ty, 1), 2)
    colq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, tx), 3)
    row2 = rowq[:, 0]
    col2 = colq[:, 0]

    def shift_rows_down(a, halo_last, iota):
        """a[..., r, :] -> a[..., r-1, :] with row 0 from the halo tile."""
        return jnp.where(iota == 0, halo_last[..., ty - 1:ty, :],
                         jnp.roll(a, 1, axis=-2))

    def shift_rows_up(a, halo_first, iota):
        return jnp.where(iota == ty - 1, halo_first[..., 0:1, :],
                         jnp.roll(a, -1, axis=-2))

    def shift_cols_right(a, halo_last, iota):
        return jnp.where(iota == 0, halo_last[..., tx - 1:tx],
                         jnp.roll(a, 1, axis=-1))

    def shift_cols_left(a, halo_first, iota):
        return jnp.where(iota == tx - 1, halo_first[..., 0:1],
                         jnp.roll(a, -1, axis=-1))

    uN_up = shift_rows_down(uN, up_uN, rowq)
    ub_up = shift_rows_down(ub, up_ub, row2)
    uS_dn = shift_rows_up(uS, dn_uS, rowq)
    ub_dn = shift_rows_up(ub, dn_ub, row2)
    uE_lf = shift_cols_right(uE, lf_uE, colq)
    ub_lf = shift_cols_right(ub, lf_ub, col2)
    uW_rt = shift_cols_left(uW, rt_uW, colq)
    ub_rt = shift_cols_left(ub, rt_ub, col2)

    def lift(op, F):
        """[K, m] x [4, m, ty, tx] -> [4, K, ty, tx]."""
        Ff = jnp.moveaxis(F, 1, 0).reshape(F.shape[1], -1)
        r = jnp.dot(op, Ff, preferred_element_type=Ff.dtype)
        return jnp.moveaxis(r.reshape(K, c, ty, tx), 0, 1)

    # ---- volume flux (collocated nodes) -------------------------------
    rho = W[euler.RHO]
    pres = (euler.GAMMA - 1.0) * (
        W[euler.ENE] - 0.5 * (W[euler.MX] ** 2 + W[euler.MY] ** 2) / rho)
    uvel = W[euler.MX] / rho
    vvel = W[euler.MY] / rho
    Fx = jnp.stack([W[euler.MX] * uvel + pres, W[euler.MY] * uvel,
                    W[euler.MX], (W[euler.ENE] + pres) * uvel])
    Fy = jnp.stack([W[euler.MX] * vvel, W[euler.MY] * vvel + pres,
                    W[euler.MY], (W[euler.ENE] + pres) * vvel])
    R = lift(liftv_ref[:, :K], Fx) + lift(liftv_ref[:, K:], Fy)

    A_c = jnp.broadcast_to(ub[:, None], uW.shape)

    # ---- x interfaces: west face per column, east face per column ------
    A_lf = jnp.broadcast_to(ub_lf[:, None], uE_lf.shape)
    Fw_all = num_flux(uE_lf, uW, 1.0, 0.0, AL=A_lf, AR=A_c)  # [4,nq,ty,tx]
    A_rt = jnp.broadcast_to(ub_rt[:, None], uW_rt.shape)
    Fe_all = num_flux(uE, uW_rt, 1.0, 0.0, AL=A_c, AR=A_rt)

    # ---- y interfaces ---------------------------------------------------
    A_up = jnp.broadcast_to(ub_up[:, None], uN_up.shape)
    Fs_all = num_flux(uN_up, uS, 0.0, 1.0, AL=A_up, AR=A_c)
    A_dn = jnp.broadcast_to(ub_dn[:, None], uS_dn.shape)
    Fn_all = num_flux(uN, uS_dn, 0.0, 1.0, AL=A_c, AR=A_dn)

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

    out_ref[:] = R


def make_fused_residual(basis, mesh, flux_name: str, per_x: bool,
                        per_y: bool, dtype=jnp.float32):
    """Build fused(u, dfw, dfe, dfs, dfn) -> M^{-1} R(u) for a collocated
    Qk basis on a Cartesian mesh (the bench/production hot path).

    The mass solve and area scaling are folded into the lift constants:
    rows of every lift operator are pre-multiplied by minv/area, so the
    kernel's single output IS du/dt's interior part."""
    K, nq = basis.K, basis.nq
    scale = (1.0 / basis.mass)[:, None] / (mesh.dx * mesh.dy)
    GxW = basis.wq2[:, None] * basis.Gx
    GyW = basis.wq2[:, None] * basis.Gy
    avg_op = basis.wq2 @ basis.V
    trc = np.concatenate([basis.faceV[0], basis.faceV[1], basis.faceV[2],
                          basis.faceV[3], avg_op[None]], axis=0)
    liftv = np.concatenate([mesh.dy * GxW.T, mesh.dx * GyW.T],
                           axis=1) * scale
    fvw = [basis.wq[:, None] * basis.faceV[f] for f in range(4)]
    # order matches FSTK: [Fw(all +west lift), -Fe(east), Fs(south), -Fn(north)]
    liftf = np.concatenate([mesh.dy * fvw[0].T, mesh.dy * fvw[1].T,
                            mesh.dx * fvw[2].T, mesh.dx * fvw[3].T],
                           axis=1) * scale
    trc = jnp.asarray(trc, dtype)
    liftv = jnp.asarray(liftv, dtype)
    liftf = jnp.asarray(liftf, dtype)

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def fused(u, dfw, dfe, dfs, dfn, interpret=False):
        c, k, ny, nx = u.shape
        TY = 8
        while ny % TY:
            TY //= 2
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
        return pl.pallas_call(
            functools.partial(_fused_kernel, K=K, nq=nq,
                              flux_name=flux_name,
                              per_x=per_x, per_y=per_y),
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            grid=(ni, nj),
            in_specs=[spec_op(trc.shape), spec_op(liftv.shape),
                      spec_op(liftf.shape),
                      spec_u, spec_up, spec_dn, spec_lf, spec_rt,
                      pl.BlockSpec((TY, 4, nq), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TY, 4, nq), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((4, nq, TX), lambda i, j: (0, 0, j),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((4, nq, TX), lambda i, j: (0, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=spec_u,
            interpret=interpret,
        )(trc, liftv, liftf, u, u, u, u, u,
          jnp.moveaxis(dfw, -1, 0), jnp.moveaxis(dfe, -1, 0), dfs, dfn)

    def fused_residual(u, dfw, dfe, dfs, dfn):
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        return fused(u, dfw, dfe, dfs, dfn, interpret=not on_tpu)

    return fused_residual
