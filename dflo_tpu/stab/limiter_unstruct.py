"""Barth-Jespersen minmax limiter on general unstructured quad meshes.

The mapping-general limiter the reference runs on q1 meshes
(apply_limiter_minmax_Qk, src_mpi/limiter.cc:397-555): per cell, the mean
physical gradient is theta-clipped so the reconstruction at each FACE CENTER
stays within the min/max of the face-neighbor cell averages, then the cell
is rebuilt as a linear function about its centroid.  Neighbor lookups are
index gathers through mesh.neighbor_table() (missing neighbors contribute
nothing, mirroring the at_boundary skip at src_mpi/limiter.cc:457).

State layout u[4, K, N]; all geometry ([N] per-cell h, centroids, face
centers, measures) precomputed in numpy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.physics import euler


def make_minmax_limiter_unstructured(basis: basis_mod.Basis, mesh,
                                     M: float = 0.0, char_lim: bool = False,
                                     dtype=None):
    """Build limit(u, ubar, marked) -> u for u[4, K, N]."""
    dtype = dtype or jnp.zeros(0).dtype
    if basis.degree == 0:
        return lambda u, ubar, marked: u
    if basis.family == "Pk":
        raise ValueError("minmax limiter needs a nodal Qk basis "
                         "(src_mpi tree is Qk-only)")
    cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    N = mesh.n_cells
    # per-cell TVB threshold M*dx^2 with dx = diameter/sqrt(dim)
    # (src_mpi/limiter.cc:439-440)
    h = mesh.cell_h()
    Mdx2 = cast(M * h * h)

    # mean physical gradient: integral of J^{-T} grad_ref u over the cell
    # divided by the measure; detJ * J^{-T} grad_ref has the contravariant
    # form below, so the integral needs only the reference weights
    # (src_mpi/limiter.cc:478-494 computes the same average gradient)
    QX, QY = np.meshgrid(basis.xq, basis.xq, indexing="xy")
    qpts = np.stack([QX.ravel(), QY.ravel()], axis=1)
    x_xi, x_eta, y_xi, y_eta, _ = mesh.metric(qpts)
    measure = mesh.cell_measure()
    w2 = basis.wq2
    Gx, Gy = np.asarray(basis.Gx), np.asarray(basis.Gy)
    # d/dx op[K -> scalar]: sum_q w2_q (y_eta*Gx - y_xi*Gy)[q, :] / measure
    ddx_op = cast((np.einsum("q,qn,qk->kn", w2, y_eta, Gx)
                   - np.einsum("q,qn,qk->kn", w2, y_xi, Gy))
                  / measure[None, :])                       # [K, N]
    ddy_op = cast((np.einsum("q,qn,qk->kn", w2, x_xi, Gy)
                   - np.einsum("q,qn,qk->kn", w2, x_eta, Gx))
                  / measure[None, :])

    # neighbor gathers (missing -> own cell, which contributes no new bound)
    nbr = mesh.neighbor_table()
    nbr_idx = jnp.asarray(np.where(nbr >= 0, nbr, np.arange(N)[None, :]))

    # face-center and node offsets from the centroid
    xc, yc = mesh.cell_centers()
    mx_, my_ = mesh.side_midpoints()
    drx_f = cast(mx_ - xc[None, :])                      # [4, N]
    dry_f = cast(my_ - yc[None, :])
    xn, yn = mesh.point_coords(basis.nodes)              # [K, N]
    drx_n = cast(xn - xc[None, :])
    dry_n = cast(yn - yc[None, :])

    def limit(u, ubar, marked):
        # mean gradient per cell: [4, N]  (elementwise mul + K-reduce; the
        # batched-dot einsum form compiles pathologically on TPU)
        Dx = jnp.sum(u * ddx_op[None], axis=1)
        Dy = jnp.sum(u * ddy_op[None], axis=1)

        if char_lim:
            R, L = euler.streamline_eigen_matrices(ubar)
            a_c = euler.to_characteristic(L, ubar)
            cDx = euler.to_characteristic(L, Dx)
            cDy = euler.to_characteristic(L, Dy)
        else:
            a_c, cDx, cDy = ubar, Dx, Dy

        amin, amax = a_c, a_c
        for s in range(4):
            a_n = ubar[:, nbr_idx[s]]
            if char_lim:
                a_n = euler.to_characteristic(L, a_n)
            amin = jnp.minimum(amin, a_n)
            amax = jnp.maximum(amax, a_n)
        dumin = amin - a_c
        dumax = amax - a_c
        gate = (dumax - dumin) > Mdx2[None]     # src_mpi/limiter.cc:505-507

        theta = jnp.ones_like(a_c)
        for s in range(4):
            du = drx_f[s][None] * cDx + dry_f[s][None] * cDy
            dus = jnp.where(du == 0.0, 1.0, du)
            t = jnp.where(du > 0.0, dumax / dus,
                          jnp.where(du < 0.0, dumin / dus, jnp.inf))
            theta = jnp.minimum(theta, jnp.where(gate, t, jnp.inf))
        theta = jnp.minimum(theta, 1.0)

        change = jnp.mean(theta, axis=0)        # src_mpi/limiter.cc:515-523
        Dxn = cDx * theta
        Dyn = cDy * theta
        if char_lim:
            Dxn = euler.to_conserved(R, Dxn)
            Dyn = euler.to_conserved(R, Dyn)

        # linear rebuild at the physical node points
        # (src_mpi/limiter.cc:535-547)
        u_lim = (ubar[:, None] + drx_n[None] * Dxn[:, None]
                 + dry_n[None] * Dyn[:, None])
        active = (marked > 1.0) & (change < 0.99)
        return jnp.where(active[None, None], u_lim, u)

    return limit


def make_positivity_limiter_unstructured(basis: basis_mod.Basis, dtype=None):
    """Zhang-Shu positivity on the flat cell axis: the structured limiter
    applied through a [4, K, 1, N] view (it is cell-local, so the layout is
    irrelevant; src/positivity.cc:16-208)."""
    from dflo_tpu.stab.positivity import make_positivity_limiter
    inner = make_positivity_limiter(basis, mesh=None, dtype=dtype)
    if basis.degree == 0:
        return lambda u, ubar: u

    def limit(u, ubar):
        out = inner(u[:, :, None, :], ubar[:, None, :])
        return out[:, :, 0, :]

    return limit
