"""Physics monitors (SURVEY.md §5.5).

- total angular momentum time series (compute_angular_momentum,
  src/claw.cc:602-635; MPI-summed in src_mpi/claw.cc:708)
- conserved-quantity totals (mass/momentum/energy)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.contract import basis_apply
from dflo_tpu.physics import euler


def angular_momentum(basis: basis_mod.Basis, mesh, u, mask=None):
    """int (x m_y - y m_x) dV over the domain (src/claw.cc:626-630)."""
    QX, QY = np.meshgrid(basis.xq, basis.xq, indexing="xy")
    pts = np.stack([QX.ravel(), QY.ravel()], axis=1)
    w2 = jnp.asarray(np.outer(basis.wq, basis.wq).ravel(), u.dtype)
    V = jnp.asarray(basis.eval_at(pts), u.dtype)
    xq, yq = mesh.point_coords(pts)
    xq = jnp.asarray(xq, u.dtype)
    yq = jnp.asarray(yq, u.dtype)
    m = basis_apply(V, u[euler.MX:euler.MY + 1])     # [2, Q, ny, nx]
    cross = xq * m[1] - yq * m[0]
    if mask is not None:
        cross = cross * jnp.asarray(mask, u.dtype)[None]
    return jnp.sum(w2[:, None, None] * cross) * (mesh.dx * mesh.dy)


def totals(basis: basis_mod.Basis, mesh, u, mask=None):
    """Domain integrals of the conserved variables [4]."""
    from dflo_tpu.ops.contract import basis_reduce
    avg_op = jnp.asarray(basis.wq2 @ basis.V, u.dtype)
    ub = basis_reduce(avg_op, u)
    if mask is not None:
        ub = ub * jnp.asarray(mask, u.dtype)[None]
    return jnp.sum(ub, axis=(1, 2)) * (mesh.dx * mesh.dy)
