"""Basis-operator contractions as plain 2-D matmuls.

All DG operators are small dense matrices applied over the cell grid.  The
naive einsum form ``qk,ckyx->cqyx`` (batched dot with the new axis inserted
mid-shape) triggers a pathological TPU compile (~6 min for one op on v5e);
flattening to a single [Q,K] x [K, c*ny*nx] matmul with explicit transposes
compiles in <1 s and lowers to the same fused HLO.  Every basis contraction
in the solver goes through these helpers so the layout trick lives in one
place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Full-f32 matmuls everywhere: the TPU default (bf16 passes, ~1e-3
# relative) is unacceptable for a production solver whose limiters key on
# 1e-10-level slope changes; the basis operators are tiny-K and the paths
# that use them are HBM-bound, so HIGHEST costs nothing measurable.
PRECISION = jax.lax.Precision.HIGHEST


def _mm(M, flat):
    return jnp.matmul(M, flat, precision=PRECISION)


def basis_apply(M, u):
    """[Q, K] x [c, K, *rest] -> [c, Q, *rest].

    The workhorse: solution/trace evaluation (M = V or faceV) and lifting
    (M = faceV.T / Gx.T weighted)."""
    c, K = u.shape[:2]
    rest = u.shape[2:]
    flat = jnp.moveaxis(u, 1, 0).reshape(K, -1)
    out = _mm(M, flat).reshape((M.shape[0], c) + rest)
    return jnp.moveaxis(out, 0, 1)


def basis_reduce(v, u):
    """[K] x [c, K, *rest] -> [c, *rest] (e.g. cell averages)."""
    return basis_apply(v[None, :], u)[:, 0]


def basis_apply1(M, u):
    """[Q, K] x [K, *rest] -> [Q, *rest] (single-component variant)."""
    K = u.shape[0]
    rest = u.shape[1:]
    return _mm(M, u.reshape(K, -1)).reshape((M.shape[0],) + rest)


def quad_reduce1(w, F):
    """[Q] x [Q, *rest] -> [*rest]."""
    return basis_apply1(w[None, :], F)[0]


def mat4_apply(L, v):
    """Per-cell 4x4 matrix application: [4, 4, *rest] x [4, *rest] ->
    [4, *rest], written as elementwise mul + 4-term reduce (the batched-dot
    einsum form compiles pathologically on the TPU toolchain)."""
    return jnp.sum(L * v[None, :], axis=1)
