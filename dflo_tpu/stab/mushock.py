"""Artificial-viscosity field mu_shock (src/mu_shock.cc:41-374).

Per cell:  mu = diffusion_coef * diameter^2 * (avg max-eigenvalue)
                / (integral of density)
                * sum over faces of  oint (V+ - V-) . (W+ - W-) ds,

the entropy-variable/state jump product integrated over the cell boundary
(shock_face_term/shock_boundary_term, src/mu_shock.cc:120-287), then the
cell scaling of shock_cell_term (src/mu_shock.cc:77-93).

NOTE: in the reference the terms that would APPLY this viscosity to the
residual are commented out (src/assemble_explicit.cc:100-107, 223-240,
358-378) and every shipped config sets `diffusion coefficient = 0`; the
field is computed as a shock diagnostic and written to output.  We mirror
that: `make_mu_shock` produces the diagnostic field; `make_laplacian_diffusion`
additionally offers the (reference-disabled) interior-penalty application as
an opt-in.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.basis import WEST, EAST, SOUTH, NORTH
from dflo_tpu.ops.contract import basis_apply, basis_reduce, quad_reduce1
from dflo_tpu.physics import euler


def make_mu_shock(basis: basis_mod.Basis, mesh, diffusion_coef: float,
                  per_x: bool = False, per_y: bool = False, dtype=None,
                  bcs: dict | None = None):
    """Build mu(u, ubar, t=0.0) -> [ny, nx].

    Boundary faces evaluate the BC ghost state via compute_Wminus and use
    the trace-vs-ghost jump, exactly like shock_boundary_term
    (src/mu_shock.cc:120-190); without `bcs` they contribute zero jump
    (correct for periodic layouts; for slip/outflow the ghost jump is
    small or zero anyway)."""
    dtype = dtype or jnp.zeros(0).dtype
    faceV = [jnp.asarray(basis.faceV[f], dtype) for f in range(4)]
    wq = jnp.asarray(basis.wq, dtype)
    V = jnp.asarray(basis.V, dtype)
    wq2 = jnp.asarray(basis.wq2, dtype)
    dx, dy = mesh.dx, mesh.dy
    diam2 = dx * dx + dy * dy
    area = dx * dy

    # boundary side table: side name -> (face id, outward normal, arc ds,
    # slab indexer into [ny, nx])
    NORMALS = {"W": (-1.0, 0.0), "E": (1.0, 0.0),
               "S": (0.0, -1.0), "N": (0.0, 1.0)}
    sides = {}
    segged = {}
    if bcs is not None:
        from dflo_tpu.solver.spatial import _as_segmented
        for name, f in (("W", WEST), ("E", EAST), ("S", SOUTH), ("N", NORTH)):
            per = per_x if name in ("W", "E") else per_y
            if per:
                continue
            xb, yb = mesh.face_coords(f, basis.xq)
            n_along = mesh.ny if name in ("W", "E") else mesh.nx
            segged[name] = _as_segmented(bcs[name], n_along)
            sides[name] = (f, NORMALS[name],
                           dy if name in ("W", "E") else dx,
                           (jnp.asarray(xb, dtype), jnp.asarray(yb, dtype)))

    def ghost_of(name, trace, t):
        """Segmented BC ghost state on one side (mirrors the boundary_flux
        dispatch of solver/spatial.py)."""
        f, (nx_, ny_), _ds, (xb, yb) = sides[name]
        sseg = segged[name]
        seg_id = jnp.asarray(sseg.seg_id)
        ghost = None
        for si, seg in enumerate(sseg.segments):
            if seg.values is not None:
                bvals = jnp.broadcast_to(
                    jnp.asarray(seg.values(xb, yb, t), dtype), trace.shape)
            else:
                bvals = trace
            g = euler.compute_wminus(seg.kind, nx_, ny_, trace, bvals)
            ghost = g if ghost is None else jnp.where(
                seg_id[None, None, :] == si, g, ghost)
        return ghost

    def mu(u, ubar, t=0.0):
        if diffusion_coef == 0.0:
            return jnp.zeros(u.shape[-2:], dtype)
        # traces on each face [4, nq, ny, nx]
        tr = [basis_apply(faceV[f], u) for f in range(4)]
        jump = jnp.zeros(u.shape[-2:], dtype)
        specs = [(WEST, EAST, 2, 1, per_x, dy), (EAST, WEST, 2, -1, per_x, dy),
                 (SOUTH, NORTH, 1, 1, per_y, dx), (NORTH, SOUTH, 1, -1, per_y, dx)]
        for f, fo, axis, shift, per, ds in specs:
            Wp = tr[f]
            Wm = jnp.roll(tr[fo], shift, axis=axis + 1)  # +1: comp axis leads
            dV = euler.entropy_var(Wp) - euler.entropy_var(Wm)
            dW = Wp - Wm
            face_jump = quad_reduce1(wq, jnp.sum(dV * dW, axis=0)) * ds
            if not per:
                # zero the wrapped (boundary) slab; ghost states fill it below
                zero = np.ones((mesh.ny, mesh.nx), bool)
                if axis == 2:
                    (zero[:, 0] if shift == 1 else zero[:, -1]).fill(False)
                else:
                    (zero[0, :] if shift == 1 else zero[-1, :]).fill(False)
                face_jump = face_jump * jnp.asarray(zero)
            jump = jump + face_jump

        # boundary faces: trace-vs-ghost jumps (shock_boundary_term)
        for name in sides:
            f, _n, ds, _xy = sides[name]
            if name == "W":
                Wp = tr[WEST][:, :, :, 0]
            elif name == "E":
                Wp = tr[EAST][:, :, :, -1]
            elif name == "S":
                Wp = tr[SOUTH][:, :, 0, :]
            else:
                Wp = tr[NORTH][:, :, -1, :]
            Wm = ghost_of(name, Wp, t)
            dV = euler.entropy_var(Wp) - euler.entropy_var(Wm)
            strip = quad_reduce1(wq, jnp.sum(dV * (Wp - Wm), axis=0)) * ds
            if name == "W":
                jump = jump.at[:, 0].add(strip)
            elif name == "E":
                jump = jump.at[:, -1].add(strip)
            elif name == "S":
                jump = jump.at[0, :].add(strip)
            else:
                jump = jump.at[-1, :].add(strip)

        Wq = basis_apply(V, u)                       # volume quadrature states
        density_norm = quad_reduce1(wq2, Wq[euler.RHO]) * area
        avg_speed = quad_reduce1(wq2, euler.max_eigenvalue(Wq))  # /|cell|*area=1
        return diffusion_coef * diam2 * avg_speed / density_norm * jump

    return mu


def make_laplacian_diffusion(basis: basis_mod.Basis, mesh, dtype=None):
    """Optional application of mu_shock as cellwise Laplacian viscosity
    (the commented-out volume term mu grad(W).grad(phi),
    src/assemble_explicit.cc:100-107).  Returns extra_rhs(u, mu) to ADD to
    du/dt (mass solve included)."""
    dtype = dtype or jnp.zeros(0).dtype
    GxW = jnp.asarray(basis.wq2[:, None] * basis.Gx, dtype)
    GyW = jnp.asarray(basis.wq2[:, None] * basis.Gy, dtype)
    Gx = jnp.asarray(basis.Gx, dtype)
    Gy = jnp.asarray(basis.Gy, dtype)
    minv = jnp.asarray(1.0 / basis.mass, dtype)
    dx, dy = mesh.dx, mesh.dy
    area = dx * dy

    def extra_rhs(u, mu):
        dWx = basis_apply(Gx, u) / dx
        dWy = basis_apply(Gy, u) / dy
        mub = mu[None, None]
        R = -(dy * basis_apply(GxW.T, mub * dWx)
              + dx * basis_apply(GyW.T, mub * dWy))
        return R * (minv[None, :, None, None] / area)

    return extra_rhs
