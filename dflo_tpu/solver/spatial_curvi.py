"""DG residual on structured curvilinear blocks.

The curvilinear counterpart of dflo_tpu.solver.spatial (the reference's
`mapping = q1` path, where FEValues supplies per-cell Jacobians/normals/JxW
instead of the Cartesian shortcuts): identical whole-domain contraction
structure over u[4, K, ny, nx], but

- the volume term contracts the flux against the contravariant metric
  combinations  detJ*grad(phi) = (Gx*y_eta - Gy*y_xi, -Gx*x_eta + Gy*x_xi)
  precomputed at the quadrature points of every cell,
- interface fluxes use the per-edge unit normals and edge lengths (bilinear
  cells have straight edges, so both are constant along each edge),
- the diagonal collocation mass is w_k * detJ_k per cell node
  (compute_inv_mass_matrix, src/claw.cc:228-258).

Requires the nodal-collocated Qk (Gauss) basis; the reference likewise
restricts Pk and the TVB limiter to Cartesian mappings
(src/parameters.cc:545-550).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.basis import WEST, EAST, SOUTH, NORTH
from dflo_tpu.ops.contract import basis_apply, basis_reduce
from dflo_tpu.physics import euler
from dflo_tpu.physics.fluxes import get_flux
from dflo_tpu.solver.spatial import (BoundarySide, SegmentedSide,
                                     _as_segmented, _lift)


def make_rhs_curvilinear(basis: basis_mod.Basis, mesh,
                         bcs: dict[str, BoundarySide], flux: str = "lxf",
                         source: Callable | None = None, dtype=None):
    """Build du/dt = rhs(u, t) on a CurvilinearMesh."""
    dtype = dtype or jnp.zeros(0).dtype
    num_flux = get_flux(flux)
    if not basis.is_nodal_collocated:
        raise ValueError("curvilinear blocks need the collocated Qk basis "
                         "(diagonal collocation mass, src/claw.cc:228-258)")

    ny, nx = mesh.ny, mesh.nx
    bcs = {"W": _as_segmented(bcs["W"], ny), "E": _as_segmented(bcs["E"], ny),
           "S": _as_segmented(bcs["S"], nx), "N": _as_segmented(bcs["N"], nx)}
    per_x = bcs["W"].kind == euler.BC_PERIODIC
    per_y = bcs["S"].kind == euler.BC_PERIODIC

    cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731
    GxW = cast(basis.wq2[:, None] * basis.Gx)
    GyW = cast(basis.wq2[:, None] * basis.Gy)
    Vw = cast(basis.wq2[:, None] * basis.V)
    faceV = [cast(basis.faceV[f]) for f in range(4)]
    faceVw = [cast(basis.wq[:, None] * basis.faceV[f]) for f in range(4)]

    # volume metric fields at the (collocated) quadrature points
    QX, QY = np.meshgrid(basis.xq, basis.xq, indexing="xy")
    qpts = np.stack([QX.ravel(), QY.ravel()], axis=1)
    x_xi, x_eta, y_xi, y_eta, detJ = mesh.metric(qpts)
    x_xi, x_eta = cast(x_xi), cast(x_eta)
    y_xi, y_eta = cast(y_xi), cast(y_eta)
    detJc = cast(detJ)
    if float(np.min(detJ)) <= 0.0:
        raise ValueError("mesh has inverted/degenerate cells (detJ <= 0)")
    minv_field = 1.0 / (cast(basis.wq2)[:, None, None] * detJc)  # [K, ny, nx]

    # interface geometry
    enx_x, eny_x, L_x = (cast(a) for a in mesh.x_edges())   # [ny, nx+1]
    enx_y, eny_y, L_y = (cast(a) for a in mesh.y_edges())   # [ny+1, nx]

    # cell averages with metric weights
    w2 = cast(basis.wq2)

    def averages(u):
        Wq = u  # collocated
        num = jnp.sum((w2[:, None, None] * detJc)[None] * Wq, axis=1)
        den = jnp.sum(w2[:, None, None] * detJc, axis=0)
        return num / den[None]

    # boundary-face coordinates for BC expressions
    face_xy = {}
    for name, side in (("W", WEST), ("E", EAST), ("S", SOUTH), ("N", NORTH)):
        xb, yb = mesh.face_coords(side, basis.xq)
        face_xy[name] = (cast(xb), cast(yb))

    # outward normals per boundary side (constant per edge, per cell slot)
    out_n = {
        "W": (-enx_x[:, 0], -eny_x[:, 0]),
        "E": (enx_x[:, -1], eny_x[:, -1]),
        "S": (-enx_y[0, :], -eny_y[0, :]),
        "N": (enx_y[-1, :], eny_y[-1, :]),
    }

    if source is not None:
        xq2, yq2 = mesh.point_coords(qpts)
        xq2, yq2 = cast(xq2), cast(yq2)

    def boundary_flux(name, trace, ubar_b, t):
        sseg = bcs[name]
        nxo, nyo = out_n[name]
        nxo, nyo = nxo[None, :], nyo[None, :]
        xb, yb = face_xy[name]
        ghost = None
        seg_id = jnp.asarray(sseg.seg_id)
        for si, seg in enumerate(sseg.segments):
            if seg.values is not None:
                bvals = jnp.broadcast_to(
                    jnp.asarray(seg.values(xb, yb, t), dtype), trace.shape)
            else:
                bvals = trace
            g = euler.compute_wminus(seg.kind, nxo, nyo, trace, bvals)
            ghost = g if ghost is None else jnp.where(
                seg_id[None, None, :] == si, g, ghost)
        A = jnp.broadcast_to(ubar_b[:, None, :], trace.shape)
        return num_flux(trace, ghost, nxo, nyo, AL=A, AR=A)

    def rhs(u, t):
        W = u  # collocated: quadrature values ARE the DoFs
        Fx = euler.flux_x(W)
        Fy = euler.flux_y(W)

        # volume: int F . grad(phi) dV with metric-contravariant weights
        C1 = Fx * y_eta[None] - Fy * x_eta[None]
        C2 = -Fx * y_xi[None] + Fy * x_xi[None]
        R = basis_apply(GxW.T, C1) + basis_apply(GyW.T, C2)

        if source is not None:
            S = source(xq2, yq2, t, W)
            R = R + basis_apply(Vw.T, S * detJc[None])

        ub = averages(u)

        uW = basis_apply(faceV[WEST], u)
        uE = basis_apply(faceV[EAST], u)
        uS = basis_apply(faceV[SOUTH], u)
        uN = basis_apply(faceV[NORTH], u)

        # ---- xi-interfaces ------------------------------------------------
        FL, FR = uE[..., :-1], uW[..., 1:]
        AL = jnp.broadcast_to(ub[:, None, :, :-1], FL.shape)
        AR = jnp.broadcast_to(ub[:, None, :, 1:], FR.shape)
        nxi = enx_x[None, :, 1:-1]
        nyi = eny_x[None, :, 1:-1]
        Fi = num_flux(FL, FR, nxi, nyi, AL=AL, AR=AR)
        if per_x:
            Aw = jnp.broadcast_to(ub[:, None, :, -1], uE[..., -1].shape)
            Ae = jnp.broadcast_to(ub[:, None, :, 0], uW[..., 0].shape)
            Fw = num_flux(uE[..., -1], uW[..., 0],
                          enx_x[None, :, 0], eny_x[None, :, 0], AL=Aw, AR=Ae)
            Fx_all = jnp.concatenate([Fw[..., None], Fi, Fw[..., None]],
                                     axis=-1)
        else:
            Fw = -boundary_flux("W", uW[..., 0], ub[..., 0], t)
            Fe = boundary_flux("E", uE[..., -1], ub[..., -1], t)
            Fx_all = jnp.concatenate([Fw[..., None], Fi, Fe[..., None]],
                                     axis=-1)
        Fx_all = Fx_all * L_x[None, None]
        R = R - _lift(faceVw[EAST], Fx_all[..., 1:])
        R = R + _lift(faceVw[WEST], Fx_all[..., :-1])

        # ---- eta-interfaces ----------------------------------------------
        FL, FR = uN[..., :-1, :], uS[..., 1:, :]
        AL = jnp.broadcast_to(ub[:, None, :-1, :], FL.shape)
        AR = jnp.broadcast_to(ub[:, None, 1:, :], FR.shape)
        nxj = enx_y[None, 1:-1, :]
        nyj = eny_y[None, 1:-1, :]
        Fj = num_flux(FL, FR, nxj, nyj, AL=AL, AR=AR)
        if per_y:
            As = jnp.broadcast_to(ub[:, None, -1, :], uN[..., -1, :].shape)
            An = jnp.broadcast_to(ub[:, None, 0, :], uS[..., 0, :].shape)
            Fs = num_flux(uN[..., -1, :], uS[..., 0, :],
                          enx_y[None, 0, :], eny_y[None, 0, :], AL=As, AR=An)
            Fy_all = jnp.concatenate([Fs[..., None, :], Fj, Fs[..., None, :]],
                                     axis=-2)
        else:
            Fs = -boundary_flux("S", uS[..., 0, :], ub[..., 0, :], t)
            Fn = boundary_flux("N", uN[..., -1, :], ub[..., -1, :], t)
            Fy_all = jnp.concatenate([Fs[..., None, :], Fj, Fn[..., None, :]],
                                     axis=-2)
        Fy_all = Fy_all * L_y[None, None]
        R = R - _lift(faceVw[NORTH], Fy_all[..., 1:, :])
        R = R + _lift(faceVw[SOUTH], Fy_all[..., :-1, :])

        return R * minv_field[None]

    rhs.cell_averages = averages
    return rhs


def compute_dt_curvilinear(ubar, mesh, degree: int, cfl: float, h_field=None):
    """Per-cell CFL dt on a curvilinear block (compute_time_step_q,
    src/claw.cc:520-557): dt = cfl*h/max_eig/(2p+1), h = diameter/sqrt(dim)."""
    h = jnp.asarray(mesh.cell_h(), ubar.dtype) if h_field is None else h_field
    lam = euler.max_eigenvalue(ubar)
    return jnp.min(cfl * h / lam / (2.0 * degree + 1.0))
