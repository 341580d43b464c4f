"""Shock indicators as whole-domain array sweeps.

Re-implements the reference's KXRCF indicator (compute_shock_indicator_kxrcf,
src/indicator.cc:48-198): per cell, the inflow-part boundary integral of the
jump in an indicator variable (density or energy), normalized by
h^{(p+1)/2} * inflow measure * cell average.  The reference's per-cell
face loop with neighbor lookups becomes four trace contractions plus array
shifts; boundary faces contribute no jump (src/indicator.cc:174-179).

A cell is "marked" (limiter active) when indicator > 1
(src/limiter.cc:263, 405).  The `limiter` indicator type marks every cell
(src/indicator.cc:19-22).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.contract import basis_apply1, quad_reduce1
from dflo_tpu.ops.basis import WEST, EAST, SOUTH, NORTH
from dflo_tpu.physics import euler


def make_shock_indicator(basis: basis_mod.Basis, mesh, kind: str = "density",
                         per_x: bool = False, per_y: bool = False,
                         dtype=None, mask: np.ndarray | None = None,
                         rhs=None):
    """Build indicator(u, ubar, t=0.0) -> (shock_ind[ny,nx], jump_ind[ny,nx]).

    kind : 'limiter' (mark all, src/indicator.cc:19-22)
           'density' | 'energy' (KXRCF, src/indicator.cc:48-198)
           'u2' (Diot smoothness, src/indicator.cc:34-46 + src/mood.cc:233-282)
           'residual' (per-cell rhs RMS > 1e-12,
                       src_gll/indicator.cc:40-62; needs `rhs`)
    mask : optional bool [ny, nx] fluid mask; faces whose neighbor is solid
           count like boundary faces (skipped, src/indicator.cc:174-179).
    """
    dtype = dtype or jnp.zeros(0).dtype
    if kind == "limiter":
        def mark_all(u, ubar, t=0.0):
            shape = u.shape[-2:]
            big = jnp.full(shape, 1e20, dtype)
            return big, jnp.zeros(shape, dtype)
        return mark_all

    if kind == "u2":
        from dflo_tpu.stab.limiter import neighbor_valid
        from dflo_tpu.stab import mood as mood_mod
        if basis.family != "Pk" or basis.degree < 2:
            raise ValueError("u2 indicator needs the Pk basis with degree >= 2"
                             " (src/mood.cc:215-231 modal coefficients)")
        p = basis.degree
        valid = tuple(jnp.asarray(v) for v in
                      neighbor_valid((mesh.ny, mesh.nx), per_x, per_y, mask))

        def u2_indicator(u, ubar, t=0.0):
            ok = jnp.ones(u.shape[-2:], bool)
            for ix in (2, 2 * p + 1):
                D2 = u[euler.RHO, ix]
                mn = mood_mod.neighborhood_min(D2, valid)
                mx = mood_mod.neighborhood_max(D2, valid)
                amn, amx = jnp.abs(mn), jnp.abs(mx)
                flat = jnp.maximum(amn, amx) < mood_mod.U2_TINY
                ok = ok & (flat | ((mn * mx >= 0)
                                   & (amn >= amx * (1.0 - mood_mod.U2_EPS))))
            shock = jnp.where(ok, 0.0, 1e20).astype(dtype)
            return shock, jnp.zeros_like(shock)
        return u2_indicator

    if kind == "residual":
        if rhs is None:
            raise ValueError("residual indicator needs the rhs function")

        def residual_indicator(u, ubar, t=0.0):
            r = rhs(u, t)                          # [4, K, ny, nx]
            rms = jnp.sqrt(jnp.mean(r * r, axis=(0, 1)))
            shock = jnp.where(rms > 1.0e-12, 1e20, 0.0).astype(dtype)
            return shock, rms
        return residual_indicator

    comp = {"density": euler.RHO, "energy": euler.ENE}[kind]
    faceV = [jnp.asarray(basis.faceV[f], dtype) for f in range(4)]
    wq = jnp.asarray(basis.wq, dtype)
    dx, dy = mesh.dx, mesh.dy
    diam = float(np.sqrt(dx * dx + dy * dy))  # host-side setup constant
    h = mesh.diameter_h
    p = basis.degree

    # interior-fluid-neighbor flags per face direction (boundary and solid
    # faces are skipped entirely, like the reference's at_boundary guard)
    m = np.ones((mesh.ny, mesh.nx), bool) if mask is None else np.asarray(mask, bool)

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

    vW = jnp.asarray(shifted(1, 1, per_x), dtype)   # has fluid west neighbor
    vE = jnp.asarray(shifted(1, -1, per_x), dtype)
    vS = jnp.asarray(shifted(0, 1, per_y), dtype)
    vN = jnp.asarray(shifted(0, -1, per_y), dtype)

    def indicator(u, ubar, t=0.0):
        v = u[comp]                                   # [K, ny, nx]
        # traces of the indicator variable on each face: [nq, ny, nx]
        tW = basis_apply1(faceV[WEST], v)
        tE = basis_apply1(faceV[EAST], v)
        tS = basis_apply1(faceV[SOUTH], v)
        tN = basis_apply1(faceV[NORTH], v)

        # neighbor traces across each face (quadrature points coincide on a
        # conforming Cartesian mesh); skipped faces get zero jump
        jW = (tW - jnp.roll(tE, 1, axis=2)) * vW
        jE = (tE - jnp.roll(tW, -1, axis=2)) * vE
        jS = (tS - jnp.roll(tN, 1, axis=1)) * vS
        jN = (tN - jnp.roll(tS, -1, axis=1)) * vN

        # inflow flags per face from cell-average velocity (vel . n < 0)
        vx = ubar[euler.MX] / ubar[euler.RHO]
        vy = ubar[euler.MY] / ubar[euler.RHO]
        inW = (-vx < 0) * vW
        inE = (vx < 0) * vE
        inS = (-vy < 0) * vS
        inN = (vy < 0) * vN

        def fint(j):                                  # sum_q j wq (x ds later)
            return quad_reduce1(wq, j)

        ind = (inW * fint(jW) + inE * fint(jE)) * dy \
            + (inS * fint(jS) + inN * fint(jN)) * dx
        measure = (inW + inE) * dy + (inS + inN) * dx

        denom = diam ** (0.5 * (p + 1)) * measure * ubar[comp]
        shock = jnp.where(jnp.abs(denom) > 0.0,
                          jnp.abs(ind) / jnp.where(denom == 0.0, 1.0, denom),
                          0.0)

        jump2 = ((fint(jW**2) * vW + fint(jE**2) * vE) * dy
                 + (fint(jS**2) * vS + fint(jN**2) * vN) * dx)
        jump = jnp.sqrt(jump2 / (4.0 * h)) * diam
        return shock, jump

    return indicator
