"""Exact Sedov-Taylor point-blast solution (standard case, uniform medium).

Self-similar solution of the Euler equations for an instantaneous point
release of energy E into a cold uniform gas, following J. Kamm,
"Evaluation of the Sedov-von Neumann-Taylor blast wave solution",
LA-UR-00-6055 (the same formulation the reference's bundled generator
implements, examples/sedov/sedov3.f; workflow examples/sedov/README:1-21).
Restricted to the case that workflow exercises: omega = 0 (uniform ambient
density) in the "standard" regime where the solution extends from the shock
to the origin with finite central pressure — true for gamma = 1.4 in planar,
cylindrical and spherical geometry.

The solution is parametric in the similarity variable V (scaled velocity):
closed-form expressions give lambda(V) = r/r_shock and the profiles
f = u/u2, g = rho/rho2, h = p/p2 (Kamm eqs. 29-41); the energy-conservation
integrals J1, J2 (Kamm eqs. 55-58, 66-68) fix the dimensionless energy
alpha, hence the shock trajectory r2(t) = (E t^2 / (alpha rho0))^(1/(j+2)).

Pure numpy + scipy; float64 is ample for the profile tolerances the tests
assert (the reference generator uses quad precision only to chase the
rho -> 0 origin limit).
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad
from scipy.optimize import brentq

GAMMA_DEFAULT = 1.4


class SedovSolution:
    """Exact solution evaluator for one (gamma, geometry) pair.

    j = 1 planar, 2 cylindrical (the 2-D Euler case), 3 spherical.
    """

    def __init__(self, gamma: float = GAMMA_DEFAULT, j: int = 2,
                 eblast: float = 1.0, rho0: float = 1.0):
        self.gamma, self.j, self.eblast, self.rho0 = gamma, j, eblast, rho0
        g, gp1, gm1 = gamma, gamma + 1.0, gamma - 1.0
        xg2 = j + 2.0                      # omega = 0
        self.xg2 = xg2

        # similarity-variable endpoints (Kamm eqs. 18, 23)
        self.v2 = 4.0 / (xg2 * gp1)        # immediately behind the shock
        self.v0 = 2.0 / (xg2 * g)          # at the origin
        vstar = 2.0 / (gm1 * j + 2.0)
        if not self.v2 < vstar - 1e-4:
            raise NotImplementedError(
                "only the standard (finite central pressure) case is "
                "implemented; gamma/geometry combination is "
                "singular/vacuum (sedov3.f lsingular/lvacuum branches)")

        # exponents, Kamm eqs. 42-47 (omega = 0)
        denom2 = 2.0 * gm1 + j
        denom3 = j * (2.0 - g)
        self.a0 = 2.0 / xg2
        self.a2 = -gm1 / denom2
        self.a1 = (xg2 * g / (2.0 + j * gm1)
                   * (2.0 * j * (2.0 - g) / (g * xg2 * xg2) - self.a2))
        self.a3 = j / denom2
        self.a4 = xg2 * j * self.a1 / denom3
        self.a5 = -2.0 * j / denom3

        # frequent combinations, Kamm eqs. 33-37
        self.a_val = 0.25 * xg2 * gp1
        self.b_val = gp1 / gm1
        self.c_val = 0.5 * xg2 * g
        self.d_val = xg2 * gp1 / (xg2 * gp1 - 2.0 * (2.0 + j * gm1))
        self.e_val = 0.5 * (2.0 + j * gm1)

        # dimensionless energy alpha from the two energy integrals
        # (Kamm eqs. 66-68; combination eqs. 57-58)
        j1, _ = quad(self._efun1, self.v0, self.v2, limit=200)
        j2, _ = quad(self._efun2, self.v0, self.v2, limit=200)
        if j == 1:
            self.alpha = 0.5 * j1 + j2 / gm1
        else:
            self.alpha = (j - 1.0) * np.pi * (j1 + 2.0 * j2 / gm1)

    # -- parametric profile functions (Kamm eqs. 29-41) -----------------
    def _funcs(self, v):
        x1 = self.a_val * v
        x2 = self.b_val * np.maximum(self.c_val * v - 1.0, 1e-300)
        x3 = self.d_val * (1.0 - self.e_val * v)
        x4 = self.b_val * (1.0 - 0.5 * self.xg2 * v)
        lam = x1 ** (-self.a0) * x2 ** (-self.a2) * x3 ** (-self.a1)
        dlamdv = -(self.a0 * self.a_val / x1
                   + self.a2 * self.b_val * self.c_val / x2
                   - self.a1 * self.d_val * self.e_val / x3) * lam
        f = x1 * lam
        g_ = x2 ** self.a3 * x3 ** self.a4 * x4 ** self.a5
        h = (x1 ** (self.a0 * self.j)
             * x3 ** (self.a4 - 2.0 * self.a1)
             * x4 ** (1.0 + self.a5))
        return lam, dlamdv, f, g_, h

    def _efun1(self, v):
        lam, dlamdv, _f, g_, _h = self._funcs(v)
        return dlamdv * lam ** (self.j + 1.0) * self.b_val * g_ * v ** 2

    def _efun2(self, v):
        lam, dlamdv, _f, _g, h = self._funcs(v)
        z = 8.0 / (self.xg2 ** 2 * (self.gamma + 1.0))
        return dlamdv * lam ** (self.j - 1.0) * h * z

    # -- shock state at time t (Kamm eqs. 13-16) -------------------------
    def shock(self, t: float):
        """Returns (r2, us, u2, rho2, p2)."""
        g, gp1 = self.gamma, self.gamma + 1.0
        r2 = ((self.eblast / (self.alpha * self.rho0)) ** (1.0 / self.xg2)
              * t ** (2.0 / self.xg2))
        us = (2.0 / self.xg2) * r2 / t
        u2 = 2.0 * us / gp1
        rho2 = gp1 / (g - 1.0) * self.rho0
        p2 = 2.0 * self.rho0 * us ** 2 / gp1
        return r2, us, u2, rho2, p2

    def profile(self, r, t: float, p0: float = 0.0):
        """Density, radial velocity, pressure at radii r (array) and time t."""
        r = np.asarray(r, float)
        r2, _us, u2, rho2, p2 = self.shock(t)
        rho = np.full_like(r, self.rho0)
        vel = np.zeros_like(r)
        pres = np.full_like(r, p0)
        inside = r <= r2
        vmin = self.v0 * (1.0 + 1e-13)
        lam_min, _, f_min, g_min, h_min = self._funcs(vmin)
        for i in np.nonzero(inside)[0]:
            lam_want = r[i] / r2
            if lam_want <= lam_min:
                # near the origin (v -> v0): lambda ~ x2^(-a2), rho ~ x2^a3,
                # u ~ lambda, p -> finite central value — so extend by the
                # exact leading power laws (rho ~ lambda^(a3/(-a2)) = the
                # classical r^(j/(gamma-1)) central scaling)
                s = lam_want / lam_min
                rho[i] = rho2 * g_min * s ** (self.a3 / (-self.a2))
                vel[i] = u2 * f_min * s
                pres[i] = p2 * h_min
                continue
            v = brentq(
                lambda vv: self._funcs(vv)[0] - lam_want,
                vmin, self.v2, xtol=1e-15)
            _lam, _d, f, g_, h = self._funcs(v)
            rho[i] = rho2 * g_
            vel[i] = u2 * f
            pres[i] = p2 * h
        return rho, vel, pres
