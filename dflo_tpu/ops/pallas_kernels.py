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
