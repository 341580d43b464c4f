"""TVB minmod slope limiter, vectorized over all cells.

Re-implements the reference's gradient-based Qk limiter
(apply_limiter_TVB_Qk, src/limiter.cc:224-370) and the modal Pk limiter
(apply_limiter_TVB_Pk, src/limiter.cc:376-516) as one masked whole-domain
update: the per-marked-cell loop with L/R/B/T neighbor-table lookups
(src/claw.cc:336-380) becomes array shifts of the cell-average field; the
characteristic transform is a batched 4x4 contraction (src/equation.h:225-306);
the "reduce to linear" rewrite is a select between the original DoFs and the
limited linear reconstruction.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.contract import basis_reduce
from dflo_tpu.physics import euler


def minmod(a, b, c, Mdx2):
    """TVB minmod (src/limiter.cc:15-30): pass-through below the TVB
    threshold, sign-matched minimum otherwise."""
    samesign = (a * b > 0) & (b * c > 0)
    m = jnp.sign(a) * jnp.minimum(jnp.abs(a),
                                  jnp.minimum(jnp.abs(b), jnp.abs(c)))
    return jnp.where(jnp.abs(a) < Mdx2, a, jnp.where(samesign, m, 0.0))


def neighbor_valid(shape, per_x: bool, per_y: bool,
                   mask: np.ndarray | None = None):
    """Bool [ny, nx] flags (W, E, S, N): does a usable (in-domain, fluid)
    neighbor exist in that direction?  Encodes the reference's lcell/rcell/
    bcell/tcell tables (src/claw.cc:336-380) plus the solid-cell mask."""
    m = np.ones(shape, bool) if mask is None else np.asarray(mask, bool)

    def shifted(axis, shift, periodic):
        s = np.roll(m, shift, axis=axis)
        if not periodic:
            if axis == 1 and shift == 1:
                s[:, 0] = False
            elif axis == 1:
                s[:, -1] = False
            elif shift == 1:
                s[0, :] = False
            else:
                s[-1, :] = False
        return s

    return (shifted(1, 1, per_x), shifted(1, -1, per_x),
            shifted(0, 1, per_y), shifted(0, -1, per_y))


def neighbor_diffs(ubar, D, valid):
    """Forward/backward cell-average differences with the reference's
    boundary fallback: where a neighbor is missing the difference degrades to
    the cell's own slope D (src/limiter.cc:283-316).

    ubar [4, ny, nx]; D = (Dx, Dy) each [4, ny, nx]; valid = (W, E, S, N)
    neighbor flags.  Returns (dbx, dfx, dby, dfy)."""
    Dx, Dy = D
    vW, vE, vS, vN = valid
    dbx = jnp.where(vW[None], ubar - jnp.roll(ubar, 1, axis=-1), Dx)
    dfx = jnp.where(vE[None], jnp.roll(ubar, -1, axis=-1) - ubar, Dx)
    dby = jnp.where(vS[None], ubar - jnp.roll(ubar, 1, axis=-2), Dy)
    dfy = jnp.where(vN[None], jnp.roll(ubar, -1, axis=-2) - ubar, Dy)
    return dbx, dfx, dby, dfy


def make_tvb_limiter(basis: basis_mod.Basis, mesh, M: float = 0.0,
                     beta: float = 1.0, char_lim: bool = False,
                     conserve_angular_momentum: bool = False,
                     per_x: bool = False, per_y: bool = False, dtype=None,
                     mask: np.ndarray | None = None):
    """Build limit(u, ubar, marked) -> u.

    marked : [ny, nx] bool/float mask (shock indicator > 1,
             src/limiter.cc:263).
    M, beta, char_lim mirror Parameters::Limiter (src/parameters.h:241-256).
    """
    dtype = dtype or jnp.zeros(0).dtype
    p = basis.degree
    if p == 0:
        return lambda u, ubar, marked: u

    h = mesh.diameter_h
    Mdx2 = M * h * h
    modal = basis.family == "Pk"
    sqrt3 = float(np.sqrt(3.0))
    valid = tuple(jnp.asarray(v) for v in
                  neighbor_valid((mesh.ny, mesh.nx), per_x, per_y, mask))

    if modal:
        ix_x = 1              # (1,0) mode position (src/limiter.cc:414-419)
        ix_y = p + 1          # (0,1) mode position
        beta_eff = 0.5 * beta  # src/limiter.cc:395
        keep = np.zeros(basis.K)
        keep[0] = 1.0
        keep = jnp.asarray(keep, dtype)
        ex = jnp.asarray(np.eye(basis.K)[ix_x], dtype)
        ey = jnp.asarray(np.eye(basis.K)[ix_y], dtype)
    else:
        beta_eff = beta
        # mean reference gradient operators: gx[k] = sum_q w2q dphi_k/dx
        gx_op = jnp.asarray(basis.wq2 @ basis.Gx, dtype)
        gy_op = jnp.asarray(basis.wq2 @ basis.Gy, dtype)
        # physical node offsets from the cell center
        drx = jnp.asarray((basis.nodes[:, 0] - 0.5) * mesh.dx, dtype)
        dry = jnp.asarray((basis.nodes[:, 1] - 0.5) * mesh.dy, dtype)

    def limit(u, ubar, marked):
        if modal:
            Dx = sqrt3 * u[:, ix_x]                     # [4, ny, nx]
            Dy = sqrt3 * u[:, ix_y]
        else:
            # h * mean physical gradient (src/limiter.cc:269-281)
            Dx = (h / mesh.dx) * basis_reduce(gx_op, u)
            Dy = (h / mesh.dy) * basis_reduce(gy_op, u)

        ang_mom = Dx[euler.MY] - Dy[euler.MX]           # src/limiter.cc:422

        dbx, dfx, dby, dfy = neighbor_diffs(ubar, (Dx, Dy), valid)

        if char_lim:
            Rx, Lx, Ry, Ly = euler.eigen_matrices(ubar)
            cDx = euler.to_characteristic(Lx, Dx)
            cDy = euler.to_characteristic(Ly, Dy)
            cdbx = euler.to_characteristic(Lx, dbx)
            cdfx = euler.to_characteristic(Lx, dfx)
            cdby = euler.to_characteristic(Ly, dby)
            cdfy = euler.to_characteristic(Ly, dfy)
        else:
            cDx, cDy, cdbx, cdfx, cdby, cdfy = Dx, Dy, dbx, dfx, dby, dfy

        Dxn = minmod(cDx, beta_eff * cdbx, beta_eff * cdfx, Mdx2)
        Dyn = minmod(cDy, beta_eff * cdby, beta_eff * cdfy, Mdx2)

        change = (jnp.mean(jnp.abs(Dxn - cDx), axis=0)
                  + jnp.mean(jnp.abs(Dyn - cDy), axis=0))

        if char_lim:
            Dxn = euler.to_conserved(Rx, Dxn)
            Dyn = euler.to_conserved(Ry, Dyn)

        if conserve_angular_momentum:                   # src/limiter.cc:496-500
            Dyn_mx = 0.5 * (Dyn[euler.MX] - (ang_mom - Dxn[euler.MY]))
            Dxn_my = ang_mom + Dyn_mx
            Dyn = Dyn.at[euler.MX].set(Dyn_mx)
            Dxn = Dxn.at[euler.MY].set(Dxn_my)

        if modal:
            u_lim = (ubar[:, None] * keep[None, :, None, None]
                     + (Dxn / sqrt3)[:, None] * ex[None, :, None, None]
                     + (Dyn / sqrt3)[:, None] * ey[None, :, None, None])
        else:
            # linear rebuild at the nodal points (src/limiter.cc:355-366)
            u_lim = (ubar[:, None]
                     + drx[None, :, None, None] * (Dxn / h)[:, None]
                     + dry[None, :, None, None] * (Dyn / h)[:, None])

        active = (marked > 1.0) & (change > 1.0e-10)
        return jnp.where(active[None, None], u_lim, u)

    return limit


def make_minmax_limiter(basis: basis_mod.Basis, mesh, M: float = 0.0,
                        char_lim: bool = False,
                        per_x: bool = False, per_y: bool = False, dtype=None,
                        mask: np.ndarray | None = None):
    """Barth-Jespersen-type minmax limiter (apply_limiter_minmax_Qk,
    src_mpi/limiter.cc:397-555): per-face theta clipping of the mean gradient
    so face-center reconstructions stay within the neighborhood min/max of
    cell averages; characteristic option uses the streamline-direction
    eigenvectors (src_mpi/equation.h:300-331)."""
    dtype = dtype or jnp.zeros(0).dtype
    p = basis.degree
    if p == 0:
        return lambda u, ubar, marked: u
    if basis.family == "Pk":
        raise ValueError("minmax limiter is implemented for nodal Qk bases "
                         "(src_mpi tree is Qk-only)")

    h = mesh.diameter_h
    Mdx2 = M * h * h
    gx_op = jnp.asarray(basis.wq2 @ basis.Gx, dtype)
    gy_op = jnp.asarray(basis.wq2 @ basis.Gy, dtype)
    drx = jnp.asarray((basis.nodes[:, 0] - 0.5) * mesh.dx, dtype)
    dry = jnp.asarray((basis.nodes[:, 1] - 0.5) * mesh.dy, dtype)
    valid = tuple(jnp.asarray(v) for v in
                  neighbor_valid((mesh.ny, mesh.nx), per_x, per_y, mask))
    vW, vE, vS, vN = valid

    def limit(u, ubar, marked):
        # mean physical gradients (src_mpi/limiter.cc:478-494)
        Dx = basis_reduce(gx_op, u) / mesh.dx
        Dy = basis_reduce(gy_op, u) / mesh.dy

        if char_lim:
            R, L = euler.streamline_eigen_matrices(ubar)
            a_c = euler.to_characteristic(L, ubar)
            cDx = euler.to_characteristic(L, Dx)
            cDy = euler.to_characteristic(L, Dy)
        else:
            a_c, cDx, cDy = ubar, Dx, Dy

        def nbr_char(shift, axis, v):
            a = jnp.roll(ubar, shift, axis=axis)
            if char_lim:
                a = euler.to_characteristic(L, a)
            inf = jnp.asarray(jnp.inf, u.dtype)
            return jnp.where(v[None], a, inf), jnp.where(v[None], a, -inf)

        amin, amax = a_c, a_c
        for shift, axis, v in ((1, -1, vW), (-1, -1, vE),
                               (1, -2, vS), (-1, -2, vN)):
            lo, hi = nbr_char(shift, axis, v)
            amin = jnp.minimum(amin, lo)
            amax = jnp.maximum(amax, hi)

        dumin = amin - a_c
        dumax = amax - a_c
        gate = (dumax - dumin) > Mdx2            # src_mpi/limiter.cc:505-507

        theta = jnp.ones_like(a_c)
        for du in (0.5 * mesh.dx * cDx, -0.5 * mesh.dx * cDx,
                   0.5 * mesh.dy * cDy, -0.5 * mesh.dy * cDy):
            dus = jnp.where(du == 0.0, 1.0, du)
            t = jnp.where(du > 0.0, dumax / dus,
                          jnp.where(du < 0.0, dumin / dus, jnp.inf))
            theta = jnp.minimum(theta, jnp.where(gate, t, jnp.inf))
        theta = jnp.minimum(theta, 1.0)

        change = jnp.mean(theta, axis=0)          # src_mpi/limiter.cc:519-523
        Dxn = cDx * theta
        Dyn = cDy * theta
        if char_lim:
            Dxn = euler.to_conserved(R, Dxn)
            Dyn = euler.to_conserved(R, Dyn)

        u_lim = (ubar[:, None]
                 + drx[None, :, None, None] * Dxn[:, None]
                 + dry[None, :, None, None] * Dyn[:, None])
        active = (marked > 1.0) & (change < 0.99)
        return jnp.where(active[None, None], u_lim, u)

    return limit
