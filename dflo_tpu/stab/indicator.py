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
                         dtype=None):
    """Build indicator(u, ubar) -> (shock_ind[ny,nx], jump_ind[ny,nx]).

    kind : 'limiter' (mark all), 'density', 'energy'
    """
    dtype = dtype or jnp.zeros(0).dtype
    if kind == "limiter":
        def mark_all(u, ubar):
            shape = u.shape[-2:]
            big = jnp.full(shape, 1e20, dtype)
            return big, jnp.zeros(shape, dtype)
        return mark_all

    comp = {"density": euler.RHO, "energy": euler.ENE}[kind]
    faceV = [jnp.asarray(basis.faceV[f], dtype) for f in range(4)]
    wq = jnp.asarray(basis.wq, dtype)
    dx, dy = mesh.dx, mesh.dy
    diam = float(np.sqrt(dx * dx + dy * dy))  # host-side setup constant
    h = mesh.diameter_h
    p = basis.degree

    def indicator(u, ubar):
        v = u[comp]                                   # [K, ny, nx]
        # traces of the indicator variable on each face: [nq, ny, nx]
        tW = basis_apply1(faceV[WEST], v)
        tE = basis_apply1(faceV[EAST], v)
        tS = basis_apply1(faceV[SOUTH], v)
        tN = basis_apply1(faceV[NORTH], v)

        # neighbor traces across each face (quad points coincide on a
        # conforming Cartesian mesh); zero jump at non-periodic boundaries
        # (src/indicator.cc:174-179)
        def nbr(trace_nbr, axis, shift, periodic):
            roll = jnp.roll(trace_nbr, shift, axis=axis)
            if periodic:
                return roll
            # replace the wrapped slab with the cell's own trace -> zero jump
            return roll
        jW = tW - nbr(tE, 2, 1, per_x)
        jE = tE - nbr(tW, 2, -1, per_x)
        jS = tS - nbr(tN, 1, 1, per_y)
        jN = tN - nbr(tS, 1, -1, per_y)
        if not per_x:
            jW = jW.at[:, :, 0].set(0.0)
            jE = jE.at[:, :, -1].set(0.0)
        if not per_y:
            jS = jS.at[:, 0, :].set(0.0)
            jN = jN.at[:, -1, :].set(0.0)

        # inflow flags per face from cell-average velocity (vel . n < 0)
        vx = ubar[euler.MX] / ubar[euler.RHO]
        vy = ubar[euler.MY] / ubar[euler.RHO]
        inW = (-vx < 0).astype(u.dtype)
        inE = (vx < 0).astype(u.dtype)
        inS = (-vy < 0).astype(u.dtype)
        inN = (vy < 0).astype(u.dtype)

        def fint(j):                                  # sum_q j wq (x ds later)
            return quad_reduce1(wq, j)

        ind = (inW * fint(jW) + inE * fint(jE)) * dy \
            + (inS * fint(jS) + inN * fint(jN)) * dx
        measure = (inW + inE) * dy + (inS + inN) * dx

        denom = diam ** (0.5 * (p + 1)) * measure * ubar[comp]
        shock = jnp.where(jnp.abs(denom) > 0.0,
                          jnp.abs(ind) / jnp.where(denom == 0.0, 1.0, denom),
                          0.0)

        jump2 = (fint(jW**2) + fint(jE**2)) * dy + (fint(jS**2) + fint(jN**2)) * dx
        jump = jnp.sqrt(jump2 / (4.0 * h)) * diam
        return shock, jump

    return indicator
