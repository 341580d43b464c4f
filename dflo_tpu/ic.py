"""Analytic initial conditions + interpolation/projection onto the DG space.

Re-implements the reference's IC layer (src/ic.{h,cc}): the three analytic IC
classes as vectorized jnp-compatible closures over coordinate arrays, plus the
basis-dependent IC setter — nodal interpolation for Qk
(set_initial_condition_Qk, src/ic.cc:104-121) and quadrature L2-projection
for Pk / non-collocated bases (set_initial_condition_Pk, src/ic.cc:128-168).
Expression-defined ICs from .prm files plug in through the same callable
interface (dflo_tpu.config.expressions).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops import quadrature
from dflo_tpu.ops.contract import basis_apply
from dflo_tpu.physics.euler import GAMMA


def isentropic_vortex(beta: float = 5.0, x0: float = 0.0, y0: float = 0.0):
    """IsentropicVortex(beta, x0, y0) of src/ic.h:28-53 / src/ic.cc:44-61.

    A stationary vortex (no advection): the exact solution at any time equals
    the IC — the convergence-study oracle (examples/isentropic_vortex)."""
    a1 = 0.5 * beta / np.pi
    a2 = (GAMMA - 1.0) * a1 * a1 / 2.0

    def fn(x, y, t=0.0):
        r2 = (x - x0) ** 2 + (y - y0) ** 2
        rho = (1.0 - a2 * jnp.exp(1.0 - r2)) ** (1.0 / (GAMMA - 1.0))
        vex = -a1 * (y - y0) * jnp.exp(0.5 * (1.0 - r2))
        vey = a1 * (x - x0) * jnp.exp(0.5 * (1.0 - r2))
        pre = rho ** GAMMA
        return jnp.stack([rho * vex, rho * vey, rho,
                          pre / (GAMMA - 1.0) + 0.5 * rho * (vex**2 + vey**2)])

    return fn


def isentropic_vortex_steady(beta: float = 5.0, x0: float = 0.0, y0: float = 0.0):
    """Exactly-steady isentropic vortex (Shu's scaling, a2 = (g-1)a1^2/(2g)).

    The reference's IC (src/ic.h:43-44) omits the 1/gamma factor in a2, so its
    vortex is not an exact Euler solution; this variant restores it and is the
    convergence-order oracle used by the test suite (SURVEY.md §4c)."""
    a1 = 0.5 * beta / np.pi
    a2 = (GAMMA - 1.0) * a1 * a1 / (2.0 * GAMMA)

    def fn(x, y, t=0.0):
        r2 = (x - x0) ** 2 + (y - y0) ** 2
        T = 1.0 - a2 * jnp.exp(1.0 - r2)
        rho = T ** (1.0 / (GAMMA - 1.0))
        vex = -a1 * (y - y0) * jnp.exp(0.5 * (1.0 - r2))
        vey = a1 * (x - x0) * jnp.exp(0.5 * (1.0 - r2))
        pre = rho * T
        return jnp.stack([rho * vex, rho * vey, rho,
                          pre / (GAMMA - 1.0) + 0.5 * rho * (vex**2 + vey**2)])

    return fn


def rayleigh_taylor(gravity: float, Lx: float = 0.5, Ly: float = 1.5,
                    A: float = 0.01, P0: float = 2.5):
    """RayleighTaylor IC (src/ic.h:10-27, src/ic.cc:12-38)."""

    def fn(x, y, t=0.0):
        rho = jnp.where(y < 0.0, 1.0, 2.0)
        vel = A * (1.0 + jnp.cos(2.0 * jnp.pi * x / Lx)) / 2.0 \
            * (1.0 + jnp.cos(2.0 * jnp.pi * y / Ly)) / 2.0
        pre = P0 - gravity * rho * y
        return jnp.stack([jnp.zeros_like(rho), rho * vel, rho,
                          pre / (GAMMA - 1.0) + 0.5 * rho * vel * vel])

    return fn


def vortex_system():
    """Three-vortex system (src/ic.h:55-84, src/ic.cc:67-100)."""
    beta, Rc = 5.0, 4.0
    a1 = 0.5 * beta / np.pi
    a2 = (GAMMA - 1.0) * a1 * a1 / 2.0
    xs = [0.0, Rc * np.cos(np.pi / 6.0), -Rc * np.cos(np.pi / 6.0)]
    ys = [-Rc, Rc * np.sin(np.pi / 6.0), Rc * np.sin(np.pi / 6.0)]

    def fn(x, y, t=0.0):
        rho = jnp.zeros_like(x)
        vex = jnp.zeros_like(x)
        vey = jnp.zeros_like(x)
        for xi, yi in zip(xs, ys):
            r2 = (x - xi) ** 2 + (y - yi) ** 2
            rho = rho + (1.0 - a2 * jnp.exp(1.0 - r2)) ** (1.0 / (GAMMA - 1.0))
            vex = vex - a1 * (y - yi) * jnp.exp(0.5 * (1.0 - r2))
            vey = vey + a1 * (x - xi) * jnp.exp(0.5 * (1.0 - r2))
        rho = rho - 2.0
        vex = vex / 3.0
        vey = vey / 3.0
        pre = rho ** GAMMA
        # high-pressure patch near the origin (src/ic.cc:90)
        pre = jnp.where((jnp.abs(x) < 0.1) & (jnp.abs(y) < 0.1), 50.0, pre)
        return jnp.stack([rho * vex, rho * vey, rho,
                          pre / (GAMMA - 1.0) + 0.5 * rho * (vex**2 + vey**2)])

    return fn


def polytropic_hydrostatic(nu: float = 1.2, p0: float = 1.0,
                           rho0: float = 1.0, alpha: float = 1.0):
    """Polytropic hydrostatic equilibrium, phi = y
    (src_gll/ic.h:11-27, src_gll/ic.cc:13-29)."""

    def fn(x, y, t=0.0):
        rho = (rho0 ** (nu - 1.0) - alpha * (nu - 1.0) / nu * y) \
            ** (1.0 / (nu - 1.0))
        pre = alpha * rho ** nu
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, pre / (GAMMA - 1.0)])

    return fn


def isothermal_hydrostatic(eta: float = 0.0, rho0: float = 1.21,
                           p0: float = 1.0, g: float = 1.0):
    """Xing-Shu isothermal equilibrium with optional Gaussian pressure
    perturbation eta (src_gll/ic.h:72-89, src_gll/ic.cc:106-122);
    phi = g*(x + y)."""

    def fn(x, y, t=0.0):
        ff1 = -(rho0 * g) / p0 * (x + y)
        ff2 = -(100.0 * rho0 * g) / p0 * ((x - 0.3) ** 2 + (y - 0.3) ** 2)
        rho = rho0 * jnp.exp(ff1)
        pre = p0 * jnp.exp(ff1) + eta * jnp.exp(ff2)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, pre / (GAMMA - 1.0)])

    return fn


def radial_rayleigh_taylor(r0: float = 0.6, eta: float = 0.02,
                           k: float = 20.0, drho: float = 0.1):
    """Radial RT in a radial gravity field, phi = r
    (src_gll/ic.h:51-67, src_gll/ic.cc:67-100)."""
    alpha = np.exp(-r0) / (np.exp(-r0) + drho)
    factor = np.exp(r0 * (1.0 - alpha) / alpha)

    def fn(x, y, t=0.0):
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(y, x)
        pre = jnp.where(r < r0, jnp.exp(-r), factor * jnp.exp(-r / alpha))
        ds = 0.01
        ri = r0 * (1.0 + eta * jnp.cos(k * theta))
        H = 0.5 * (1.0 - jnp.tanh((r - ri) / ds))
        rho = jnp.exp(-r) * H + factor / alpha * jnp.exp(-r / alpha) * (1.0 - H)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, pre / (GAMMA - 1.0)])

    return fn


def unsteady_gravity(u0: float = 1.0, v0: float = 1.0, p0: float = 4.5):
    """Xing-Shu sec. 5.4 exact unsteady solution in a linear field,
    phi = x + y (src_gll/ic.h:92-110, src_gll/ic.cc:128-146).  Time-dependent:
    the exact-solution oracle for gravity convergence studies."""

    def fn(x, y, t=0.0):
        rho = 1.0 + 0.2 * jnp.sin(jnp.pi * (x + y - t * (u0 + v0)))
        pre = (p0 - x - y + t * (u0 + v0)
               + 0.2 * jnp.cos(jnp.pi * (x + y - t * (u0 + v0))) / jnp.pi)
        return jnp.stack([rho * u0, rho * v0, rho,
                          pre / (GAMMA - 1.0)
                          + 0.5 * (u0 * u0 + v0 * v0) * rho])

    return fn


def keplerian_disk(r0: float = 0.5, r1: float = 2.0, rs: float = 0.01,
                   rho_out: float = 1.0e-6, rho_disk: float = 1.0,
                   p0: float = 1.0e-6):
    """Rotating Keplerian disk (src_mpi/ic.h:95-115, src_mpi/ic.cc:103-130;
    the reference marks it TO BE COMPLETED — we keep its declared
    parameters and v_theta = 1/sqrt(r) profile)."""

    def fn(x, y, t=0.0):
        r = jnp.sqrt(x * x + y * y)
        vtheta = 1.0 / jnp.sqrt(r)
        vex = -vtheta * y / r
        vey = vtheta * x / r
        rho = jnp.where((r < r0 - rs) | (r > r1 + rs), rho_out, rho_disk)
        return jnp.stack([rho * vex, rho * vey, rho,
                          p0 / (GAMMA - 1.0) + 0.5 * rho * (vex**2 + vey**2)])

    return fn


def set_initial_condition_cellcentered(basis, mesh, fn, t: float = 0.0,
                                       dtype=None):
    """Nodal interpolation where the IC may branch on the CELL CENTER —
    the src_gll programmatic setters place density jumps cell-wise to avoid
    straddling an interface (set_initial_condition_Rayleigh_Taylor /
    _shocktube, src_gll/ic.cc:226-345).

    fn(x, y, xc, yc, t) -> [4, ...] with nodal (x, y) and per-cell (xc, yc).
    """
    dtype = dtype or jnp.zeros(0).dtype
    xn, yn = mesh.point_coords(basis.nodes)
    xc, yc = mesh.cell_centers()
    u = fn(jnp.asarray(xn, dtype), jnp.asarray(yn, dtype),
           jnp.asarray(xc, dtype)[None], jnp.asarray(yc, dtype)[None], t)
    return jnp.asarray(u, dtype)


def rayleigh_taylor_gll(gravity: float = 1.0, eta: float = 0.01, P0: float = 2.5):
    """src_gll RT setter (src_gll/ic.cc:226-284): cell-centered density jump
    (1 below, 2 above y=0), hydrostatic pressure from the pointwise y, and a
    localized y-velocity perturbation eta*sin(4 pi x)*exp(-50 y^2)."""

    def fn(x, y, xc, yc, t=0.0):
        rho = jnp.where(yc < 0.0, 1.0, 2.0) * jnp.ones_like(y)
        pre = P0 - gravity * jnp.where(y < 0.0, y, 2.0 * y)
        v = eta * jnp.sin(4.0 * jnp.pi * x) * jnp.exp(-50.0 * y * y)
        return jnp.stack([jnp.zeros_like(x), rho * v, rho,
                          pre / (GAMMA - 1.0) + 0.5 * rho * v * v])

    return fn


def shocktube_gll():
    """src_gll Sod setter with the cell-centered jump
    (set_initial_condition_shocktube, src_gll/ic.cc:289-345)."""

    def fn(x, y, xc, yc, t=0.0):
        rho = jnp.where(xc < 0.5, 1.0, 0.125) * jnp.ones_like(x)
        E = jnp.where(xc < 0.5, 2.5, 0.25) * jnp.ones_like(x)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, E])

    return fn


IC_FUNCTIONS = {
    # names match the reference's ic_function dispatch
    # (src/ic.cc:104-121, src_gll/ic.cc:354-377)
    "isenvort": lambda params=None: isentropic_vortex(5.0, 0.0, 0.0),
    "vortsys": lambda params=None: vortex_system(),
    "rt": lambda params=None: rayleigh_taylor(
        getattr(params, "gravity", 1.0) if params is not None else 1.0),
    "rrt": lambda params=None: radial_rayleigh_taylor(),
    "isohydro": lambda params=None: isothermal_hydrostatic(),
    "polyhydro": lambda params=None: polytropic_hydrostatic(1.2),
    "keplerian": lambda params=None: keplerian_disk(),
}

# setters that branch on cell centers (go through
# set_initial_condition_cellcentered; src_gll/ic.cc:226-345)
IC_CELLWISE = {
    "shocktube": lambda params=None: shocktube_gll(),
    "rt_gll": lambda params=None: rayleigh_taylor_gll(
        getattr(params, "gravity", 1.0) if params is not None else 1.0),
}


def set_initial_condition(basis: basis_mod.Basis, mesh, fn, t: float = 0.0,
                          dtype=None) -> jnp.ndarray:
    """Project an analytic state fn(x, y, t) -> [4, ...] onto u[4, K, ny, nx].

    Qk/Qk_gll: nodal interpolation (src/ic.cc:104-121).
    Pk: L2 projection with QGauss(p+1), i.e. coef = M^-1 int f phi
    (src/ic.cc:128-168).
    """
    dtype = dtype or jnp.zeros(0).dtype
    if basis.family in ("Qk", "Qk_gll"):
        xn, yn = mesh.point_coords(basis.nodes)
        u = fn(jnp.asarray(xn, dtype), jnp.asarray(yn, dtype), t)
    else:
        xq, wq = quadrature.gauss(basis.degree + 1)
        QX, QY = np.meshgrid(xq, xq, indexing="xy")
        pts = np.stack([QX.ravel(), QY.ravel()], axis=1)
        w2 = np.outer(wq, wq).ravel()
        Vq = basis.eval_at(pts)                       # [Q, K]
        xqq, yqq = mesh.point_coords(pts)
        f = fn(jnp.asarray(xqq, dtype), jnp.asarray(yqq, dtype), t)  # [4,Q,ny,nx]
        proj = jnp.asarray(w2[:, None] * Vq, dtype)   # cell Jacobian cancels M^-1
        u = basis_apply(proj.T, f) \
            * jnp.asarray(1.0 / basis.mass, dtype)[None, :, None, None]
    return jnp.asarray(u, dtype)


def l2_error(basis: basis_mod.Basis, mesh, u, exact_fn, t: float = 0.0,
             nq: int | None = None) -> jnp.ndarray:
    """Per-component L2 error vs an analytic state, normalized by domain area
    (compute_errors, src_gll/claw.cc:1190-1246).  Returns [4]."""
    nq = nq or (basis.degree + 2)
    xq, wq = quadrature.gauss(nq)
    QX, QY = np.meshgrid(xq, xq, indexing="xy")
    pts = np.stack([QX.ravel(), QY.ravel()], axis=1)
    w2 = jnp.asarray(np.outer(wq, wq).ravel(), u.dtype)
    Vq = jnp.asarray(basis.eval_at(pts), u.dtype)
    xqq, yqq = mesh.point_coords(pts)
    uh = basis_apply(Vq, u)
    ue = exact_fn(jnp.asarray(xqq, u.dtype), jnp.asarray(yqq, u.dtype), t)
    cell_area = mesh.dx * mesh.dy
    err2 = jnp.sum(w2[None, :, None, None] * (uh - ue) ** 2, axis=(1, 2, 3)) * cell_area
    domain_area = (mesh.x1 - mesh.x0) * (mesh.y1 - mesh.y0)
    return jnp.sqrt(err2 / domain_area)
