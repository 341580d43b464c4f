"""2-D compressible Euler physics as pure jnp functions.

Vectorized re-design of the reference's EulerEquations<dim> static struct
(src/equation.h:22-1214).  All functions operate on conserved-state arrays
``U[4, ...]`` with the component axis leading and arbitrary trailing batch
dims (quad points / cells); everything is branchless so it fuses on the VPU
and differentiates with jax.jvp (replacing the reference's Sacado AD).

Component order matches the reference (src/equation.h:26-28):
momentum first, then density, then energy.
"""

from __future__ import annotations

import jax.numpy as jnp

# component indices (dim = 2)
MX, MY, RHO, ENE = 0, 1, 2, 3
N_COMP = 4
GAMMA = 1.4  # src/equation.cc:33

#: positivity floor for wave-speed computations.  The Zhang-Shu limiter
#: guarantees p, rho >= 1e-13 at its check points IN EXACT ARITHMETIC
#: (src/positivity.cc:27); re-evaluating the same traces in f32 inside the
#: flux kernels can round marginally-positive pressures negative at strong
#: shocks (Mach-10 DMR post-shock cells), and an unguarded sqrt then NaNs
#: the whole run.  Flooring only the sqrt arguments keeps every
#: finite-state result bit-identical while making f32 production runs
#: shock-safe; the reference runs f64 only and never hits this.
FLOOR = 1.0e-13


def _pos(x):
    """max(x, FLOOR) for quantities that are positive up to roundoff."""
    return jnp.maximum(x, FLOOR)


def kinetic_energy(U):
    """0.5*|m|^2/rho  (src/equation.h:67-79)."""
    return 0.5 * (U[MX] * U[MX] + U[MY] * U[MY]) / U[RHO]


def pressure(U):
    """(gamma-1)(E - ke)  (src/equation.h:84-92)."""
    return (GAMMA - 1.0) * (U[ENE] - kinetic_energy(U))


def sound_speed(U):
    return jnp.sqrt(GAMMA * _pos(pressure(U)) / _pos(U[RHO]))


def max_eigenvalue(U):
    """|v| + c  (src/equation.h:97-114)."""
    v = jnp.sqrt(U[MX] * U[MX] + U[MY] * U[MY]) / U[RHO]
    return v + sound_speed(U)


def max_eigenvalue_normal(U, nx, ny):
    """|v.n| + c  (src/equation.h:119-137)."""
    vn = (U[MX] * nx + U[MY] * ny) / U[RHO]
    return jnp.abs(vn) + sound_speed(U)


def flux_x(U):
    """Cartesian x-flux column F(U)  (src/equation.h:158-193)."""
    p = pressure(U)
    u = U[MX] / U[RHO]
    return jnp.stack([U[MX] * u + p, U[MY] * u, U[MX], (U[ENE] + p) * u])


def flux_y(U):
    p = pressure(U)
    v = U[MY] / U[RHO]
    return jnp.stack([U[MX] * v, U[MY] * v + p, U[MY], (U[ENE] + p) * v])


def normal_flux(U, nx, ny):
    """Physical flux along a unit normal  (src/equation.h:198-215)."""
    p = pressure(U)
    vn = (U[MX] * nx + U[MY] * ny) / U[RHO]
    return jnp.stack([
        p * nx + U[MX] * vn,
        p * ny + U[MY] * vn,
        U[RHO] * vn,
        (U[ENE] + p) * vn,
    ])


def entropy_var(U):
    """Entropy variables V(U)  (src/equation.h:1039-1058)."""
    p = pressure(U)
    T = p / U[RHO]
    u = U[MX] / U[RHO]
    v = U[MY] / U[RHO]
    u2 = u * u + v * v
    Vr = jnp.log(U[RHO] / T ** (1.0 / (GAMMA - 1.0))) - 0.5 * u2 / T
    return jnp.stack([u / T, v / T, Vr, -1.0 / T])


# -----------------------------------------------------------------------------
# Characteristic algebra (src/equation.h:225-306). The eigenvector matrices are
# written in the internal ordering (rho, mx, my, E); transform_to_char/con do
# the reorder from/to the conserved layout exactly as the reference.
# -----------------------------------------------------------------------------

def eigen_matrices(U):
    """Left/right eigenvector matrices along x and y from state U[4, ...].

    Returns (Rx, Lx, Ry, Ly), each [4, 4, ...] in the (rho, mx, my, E)
    internal ordering of src/equation.h:225-265.
    """
    g1 = GAMMA - 1.0
    rho = U[RHO]
    u = U[MX] / rho
    v = U[MY] / rho
    q2 = u * u + v * v
    p = g1 * (U[ENE] - 0.5 * rho * q2)
    c2 = GAMMA * _pos(p) / _pos(rho)
    c = jnp.sqrt(c2)
    beta = 0.5 / c2
    phi2 = 0.5 * g1 * q2
    h = c2 / g1 + 0.5 * q2
    zero = jnp.zeros_like(rho)
    one = jnp.ones_like(rho)

    def M(rows):
        return jnp.stack([jnp.stack(r) for r in rows])

    Rx = M([[one, zero, one, one],
            [u, zero, u + c, u - c],
            [v, -one, v, v],
            [0.5 * q2, -v, h + c * u, h - c * u]])
    Ry = M([[one, zero, one, one],
            [u, one, u, u],
            [v, zero, v + c, v - c],
            [0.5 * q2, u, h + c * v, h - c * v]])
    Lx = M([[1 - phi2 / c2, g1 * u / c2, g1 * v / c2, -g1 / c2 * one],
            [v, zero, -one, zero],
            [beta * (phi2 - c * u), beta * (c - g1 * u), -beta * g1 * v, beta * g1],
            [beta * (phi2 + c * u), -beta * (c + g1 * u), -beta * g1 * v, beta * g1]])
    Ly = M([[1 - phi2 / c2, g1 * u / c2, g1 * v / c2, -g1 / c2 * one],
            [-u, one, zero, zero],
            [beta * (phi2 - c * v), -beta * g1 * u, beta * (c - g1 * v), beta * g1],
            [beta * (phi2 + c * v), -beta * g1 * u, -beta * (c + g1 * v), beta * g1]])
    return Rx, Lx, Ry, Ly


def eigen_matrices_dir(U, kx, ky):
    """Eigenvector matrices for the direction k = (kx, ky): the 2-argument
    compute_eigen_matrix of src_mpi/equation.h:300-331.  Returns (R, L) in
    the internal (rho, mx, my, E) ordering."""
    g1 = GAMMA - 1.0
    rho = U[RHO]
    u = U[MX] / rho
    v = U[MY] / rho
    q2 = u * u + v * v
    p = g1 * (U[ENE] - 0.5 * rho * q2)
    c2 = GAMMA * _pos(p) / _pos(rho)
    c = jnp.sqrt(c2)
    beta = 0.5 / c2
    phi2 = 0.5 * g1 * q2
    h = c2 / g1 + 0.5 * q2
    uk = u * kx + v * ky
    one = jnp.ones_like(rho)
    zero = jnp.zeros_like(rho)

    def M(rows):
        return jnp.stack([jnp.stack([jnp.broadcast_to(e, rho.shape)
                                     for e in r]) for r in rows])

    R = M([[one, zero, one, one],
           [u, ky * one, u + kx * c, u - kx * c],
           [v, -kx * one, v + ky * c, v - ky * c],
           [0.5 * q2, ky * u - kx * v, h + c * uk, h - c * uk]])
    L = M([[1 - phi2 / c2, g1 * u / c2, g1 * v / c2, -g1 / c2 * one],
           [-(ky * u - kx * v), ky * one, -kx * one, zero],
           [beta * (phi2 - c * uk), beta * (kx * c - g1 * u),
            beta * (ky * c - g1 * v), beta * g1 * one],
           [beta * (phi2 + c * uk), -beta * (kx * c + g1 * u),
            -beta * (ky * c + g1 * v), beta * g1 * one]])
    return R, L


def streamline_eigen_matrices(U):
    """(R, L) along the local velocity direction (src_mpi/equation.h:315-317,
    theta = atan2(v, u)); falls back to the x-direction for stagnant cells."""
    theta = jnp.arctan2(U[MY], U[MX])
    return eigen_matrices_dir(U, jnp.cos(theta), jnp.sin(theta))


def _reorder_to_internal(W):
    """(mx, my, rho, E) -> (rho, mx, my, E)  (src/equation.h:276-279)."""
    return jnp.stack([W[RHO], W[MX], W[MY], W[ENE]])


def _reorder_to_conserved(V):
    return jnp.stack([V[1], V[2], V[0], V[3]])


def to_characteristic(L, W):
    """W_char = L @ reorder(W); L is [4, 4, ...], W is [4, ...]."""
    V = _reorder_to_internal(W)
    return jnp.sum(L * V[None, :], axis=1)


def to_conserved(R, Wc):
    """Inverse transform (src/equation.h:290-306)."""
    V = jnp.sum(R * Wc[None, :], axis=1)
    return _reorder_to_conserved(V)


# -----------------------------------------------------------------------------
# Boundary conditions (src/equation.h:862-1033)
# -----------------------------------------------------------------------------

# BoundaryKind codes; `periodic` is handled topologically by the mesh layer
# (src_mpi/parameters.cc:397-410), not via ghost states.
BC_INFLOW, BC_OUTFLOW, BC_SLIP, BC_PRESSURE, BC_FARFIELD, BC_PERIODIC, BC_NONE = (
    0, 1, 2, 3, 4, 5, -1)

BC_KIND_NAMES = {
    "inflow": BC_INFLOW,
    "outflow": BC_OUTFLOW,
    "slip": BC_SLIP,
    "pressure": BC_PRESSURE,
    "farfield": BC_FARFIELD,
    "periodic": BC_PERIODIC,
}


def compute_wminus(kind, nx, ny, Wplus, bvals):
    """Ghost state from the inside trace + BC data (src/equation.h:939-1033).

    kind  : int array broadcastable against the trailing dims (per-face code)
    nx,ny : outward unit normal components
    Wplus : [4, ...] inside trace
    bvals : [4, ...] boundary expression values (pressure BC reads its
            prescribed pressure from the energy slot, src/equation.h:992)
    """
    # inflow / farfield: prescribed state
    w_dirichlet = bvals
    # outflow: copy
    w_out = Wplus
    # pressure: keep momentum+density, set energy from prescribed pressure
    ke = kinetic_energy(Wplus)
    w_pres = jnp.stack([Wplus[MX], Wplus[MY], Wplus[RHO],
                        bvals[ENE] / (GAMMA - 1.0) + ke])
    # slip: mirror the normal momentum
    vdotn = Wplus[MX] * nx + Wplus[MY] * ny
    w_slip = jnp.stack([Wplus[MX] - 2.0 * vdotn * nx,
                        Wplus[MY] - 2.0 * vdotn * ny,
                        Wplus[RHO], Wplus[ENE]])

    out = jnp.where(kind == BC_INFLOW, w_dirichlet, w_out)
    out = jnp.where(kind == BC_FARFIELD, w_dirichlet, out)
    out = jnp.where(kind == BC_PRESSURE, w_pres, out)
    out = jnp.where(kind == BC_SLIP, w_slip, out)
    return out


def no_penetration_flux(U, nx, ny):
    """Pressure-only wall flux (src/equation.h:787-807)."""
    p = pressure(U)
    z = jnp.zeros_like(p)
    return jnp.stack([p * nx, p * ny, z, z])


def forcing_gravity(U, gvec=(0.0, -1.0)):
    """Gravity source (g1*rho, g2*rho, 0, rho g.v)  (src/equation.h:829-850).

    The reference hardcodes g = (0,-1) scaled by `parameters.gravity`
    (src/assemble_explicit.cc:108); we keep the direction configurable.
    """
    gx, gy = gvec
    z = jnp.zeros_like(U[RHO])
    fx = gx * U[RHO]
    fy = gy * U[RHO]
    fe = gx * U[MX] + gy * U[MY]
    return jnp.stack([fx, fy, z, fe])


def forcing_external(U, fx, fy):
    """General body force f(x,t): (rho fx, rho fy, 0, f.m)
    (src_mpi/equation.h:1186-1202)."""
    z = jnp.zeros_like(U[RHO])
    return jnp.stack([U[RHO] * fx, U[RHO] * fy, z, U[MX] * fx + U[MY] * fy])
