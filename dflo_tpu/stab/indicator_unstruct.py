"""KXRCF shock indicator on general unstructured quad meshes.

Generalizes stab.indicator's structured sweeps to arbitrary conforming
connectivity through the face-gather tables (the reference's KXRCF runs on
any deal.II triangulation, src/indicator.cc:48-198): per cell, the
inflow-part boundary integral of the jump of the indicator component,
normalized by diameter^{(p+1)/2} * inflow measure * cell average.  Boundary
faces contribute no jump and no measure (src/indicator.cc:174-179).

Face jumps are computed ONCE per interior face and scatter-added to both
cells with opposite signs (the L-perspective jump is (uL - uR); R sees its
negative), exactly mirroring how the structured path shares one flux per
interface.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.contract import PRECISION
from dflo_tpu.physics import euler


def make_shock_indicator_unstructured(basis: basis_mod.Basis, mesh,
                                      kind: str = "density", dtype=None,
                                      rhs=None):
    """Build indicator(u, ubar, t=0.0) -> (shock[N], jump[N]) for u[4,K,N].

    kind : 'limiter' (mark all, src/indicator.cc:19-22)
           'density' | 'energy' (KXRCF, src/indicator.cc:48-198)
           'residual' (per-cell rhs RMS > 1e-12, src_gll/indicator.cc:40-62)
    """
    dtype = dtype or jnp.zeros(0).dtype
    N = mesh.n_cells

    if kind == "limiter":
        def mark_all(u, ubar, t=0.0):
            big = jnp.full((N,), 1e20, dtype)
            return big, jnp.zeros((N,), dtype)
        return mark_all

    if kind == "residual":
        if rhs is None:
            raise ValueError("residual indicator needs the rhs closure")
        K = basis.K

        def residual_indicator(u, ubar, t=0.0):
            R = rhs(u, t)
            r = jnp.sqrt(jnp.mean(R ** 2, axis=(0, 1)))      # [N]
            return jnp.where(r > 1e-12, 1e20, 0.0).astype(dtype), r
        return residual_indicator

    comp = {"density": euler.RHO, "energy": euler.ENE}[kind]
    K, nq = basis.K, basis.nq
    p = basis.degree
    cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    # face-trace operator of ONE component: [4*nq, K]
    faceV_flat = cast(np.asarray(basis.faceV).reshape(4 * nq, K))
    wq = cast(basis.wq)                                       # sums to 1

    f = mesh.faces
    snx, sny, slen = mesh.side_geometry()
    fcl, fcr = jnp.asarray(f.cell_l), jnp.asarray(f.cell_r)
    flip = jnp.asarray(f.flip_r)[None, :]
    gl = jnp.asarray(f.side_l * N) + fcl
    gr = jnp.asarray(f.side_r * N) + fcr
    nxL = cast(snx[f.side_l, f.cell_l])
    nyL = cast(sny[f.side_l, f.cell_l])
    lenF = cast(slen[f.side_l, f.cell_l])
    # diameter^{(p+1)/2} (src/indicator.cc:161; cell_h = diameter/sqrt(2))
    diam_pow = cast((mesh.cell_h() * np.sqrt(2.0)) ** (0.5 * (p + 1)))

    def indicator(u, ubar, t=0.0):
        # all four side traces of the indicator component: [nq, 4*N]
        T = jnp.einsum("qk,kn->qn", faceV_flat, u[comp],
                       precision=PRECISION)
        T4 = jnp.moveaxis(T.reshape(4, nq, N), 0, 1).reshape(nq, 4 * N)
        uL = T4[:, gl]                                        # [nq, Nf]
        uRr = T4[:, gr]
        uR = jnp.where(flip, uRr[::-1, :], uRr)
        # signed jump integral per face: int (uL - uR) ds
        jump = jnp.einsum("q,qf->f", wq, uL - uR,
                          precision=PRECISION) * lenF         # [Nf]
        # inflow tests on the cell-average velocity (src/indicator.cc:139)
        vxL = ubar[euler.MX, fcl] / ubar[euler.RHO, fcl]
        vyL = ubar[euler.MY, fcl] / ubar[euler.RHO, fcl]
        vxR = ubar[euler.MX, fcr] / ubar[euler.RHO, fcr]
        vyR = ubar[euler.MY, fcr] / ubar[euler.RHO, fcr]
        inL = (vxL * nxL + vyL * nyL) < 0.0     # L outward normal = nL
        inR = (vxR * nxL + vyR * nyL) > 0.0     # R outward normal = -nL
        ind = jnp.zeros((N,), dtype)
        ind = ind.at[fcl].add(jnp.where(inL, jump, 0.0))
        ind = ind.at[fcr].add(jnp.where(inR, -jump, 0.0))
        measure = jnp.zeros((N,), dtype)
        measure = measure.at[fcl].add(jnp.where(inL, lenF, 0.0))
        measure = measure.at[fcr].add(jnp.where(inR, lenF, 0.0))
        denom = diam_pow * measure * ubar[comp]
        shock = jnp.where(jnp.abs(denom) > 0.0,
                          jnp.abs(ind) / jnp.where(denom == 0.0, 1.0, denom),
                          0.0)
        return shock, jnp.abs(ind)

    return indicator
