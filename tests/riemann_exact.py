"""Exact Riemann solver for the 1-D Euler equations (Toro's iterative method).

Test oracle for the Sod shock tube (the reference validates against the exact
solution curve, examples/sod_shock_tube/README + lineout tooling;
SURVEY.md §4.2).  Pure numpy, float64.
"""

import numpy as np

GAMMA = 1.4


def _f(p, rho_k, p_k, c_k):
    if p > p_k:  # shock
        A = 2.0 / ((GAMMA + 1.0) * rho_k)
        B = (GAMMA - 1.0) / (GAMMA + 1.0) * p_k
        return (p - p_k) * np.sqrt(A / (p + B))
    # rarefaction
    return (2.0 * c_k / (GAMMA - 1.0)) * ((p / p_k) ** ((GAMMA - 1.0) / (2.0 * GAMMA)) - 1.0)


def _fprime(p, rho_k, p_k, c_k):
    if p > p_k:
        A = 2.0 / ((GAMMA + 1.0) * rho_k)
        B = (GAMMA - 1.0) / (GAMMA + 1.0) * p_k
        return np.sqrt(A / (p + B)) * (1.0 - (p - p_k) / (2.0 * (p + B)))
    return (1.0 / (rho_k * c_k)) * (p / p_k) ** (-(GAMMA + 1.0) / (2.0 * GAMMA))


def solve(rho_l, u_l, p_l, rho_r, u_r, p_r):
    """Star-region pressure/velocity."""
    c_l = np.sqrt(GAMMA * p_l / rho_l)
    c_r = np.sqrt(GAMMA * p_r / rho_r)
    p = 0.5 * (p_l + p_r)
    for _ in range(60):
        f = _f(p, rho_l, p_l, c_l) + _f(p, rho_r, p_r, c_r) + (u_r - u_l)
        df = _fprime(p, rho_l, p_l, c_l) + _fprime(p, rho_r, p_r, c_r)
        dp = f / df
        p = max(p - dp, 1e-12)
        if abs(dp) < 1e-14:
            break
    u = 0.5 * (u_l + u_r) + 0.5 * (_f(p, rho_r, p_r, c_r) - _f(p, rho_l, p_l, c_l))
    return p, u


def sample(xi, rho_l, u_l, p_l, rho_r, u_r, p_r):
    """Solution (rho, u, p) at similarity coordinates xi = x/t (vectorized)."""
    c_l = np.sqrt(GAMMA * p_l / rho_l)
    c_r = np.sqrt(GAMMA * p_r / rho_r)
    p_s, u_s = solve(rho_l, u_l, p_l, rho_r, u_r, p_r)
    g1 = (GAMMA - 1.0) / (GAMMA + 1.0)
    xi = np.asarray(xi, dtype=np.float64)
    rho = np.empty_like(xi)
    u = np.empty_like(xi)
    p = np.empty_like(xi)

    for i, s in np.ndenumerate(xi):
        if s <= u_s:  # left of contact
            if p_s > p_l:  # left shock
                rho_sl = rho_l * ((p_s / p_l + g1) / (g1 * p_s / p_l + 1.0))
                S_l = u_l - c_l * np.sqrt((GAMMA + 1.0) / (2 * GAMMA) * p_s / p_l
                                          + (GAMMA - 1.0) / (2 * GAMMA))
                if s < S_l:
                    rho[i], u[i], p[i] = rho_l, u_l, p_l
                else:
                    rho[i], u[i], p[i] = rho_sl, u_s, p_s
            else:  # left rarefaction
                rho_sl = rho_l * (p_s / p_l) ** (1.0 / GAMMA)
                c_sl = c_l * (p_s / p_l) ** ((GAMMA - 1.0) / (2 * GAMMA))
                if s < u_l - c_l:
                    rho[i], u[i], p[i] = rho_l, u_l, p_l
                elif s > u_s - c_sl:
                    rho[i], u[i], p[i] = rho_sl, u_s, p_s
                else:  # fan
                    uf = 2.0 / (GAMMA + 1.0) * (c_l + (GAMMA - 1.0) / 2.0 * u_l + s)
                    cf = 2.0 / (GAMMA + 1.0) * (c_l + (GAMMA - 1.0) / 2.0 * (u_l - s))
                    rho[i] = rho_l * (cf / c_l) ** (2.0 / (GAMMA - 1.0))
                    u[i] = uf
                    p[i] = p_l * (cf / c_l) ** (2.0 * GAMMA / (GAMMA - 1.0))
        else:  # right of contact
            if p_s > p_r:  # right shock
                rho_sr = rho_r * ((p_s / p_r + g1) / (g1 * p_s / p_r + 1.0))
                S_r = u_r + c_r * np.sqrt((GAMMA + 1.0) / (2 * GAMMA) * p_s / p_r
                                          + (GAMMA - 1.0) / (2 * GAMMA))
                if s > S_r:
                    rho[i], u[i], p[i] = rho_r, u_r, p_r
                else:
                    rho[i], u[i], p[i] = rho_sr, u_s, p_s
            else:  # right rarefaction
                rho_sr = rho_r * (p_s / p_r) ** (1.0 / GAMMA)
                c_sr = c_r * (p_s / p_r) ** ((GAMMA - 1.0) / (2 * GAMMA))
                if s > u_r + c_r:
                    rho[i], u[i], p[i] = rho_r, u_r, p_r
                elif s < u_s + c_sr:
                    rho[i], u[i], p[i] = rho_sr, u_s, p_s
                else:
                    uf = 2.0 / (GAMMA + 1.0) * (-c_r + (GAMMA - 1.0) / 2.0 * u_r + s)
                    cf = 2.0 / (GAMMA + 1.0) * (c_r - (GAMMA - 1.0) / 2.0 * (u_r - s))
                    rho[i] = rho_r * (cf / c_r) ** (2.0 / (GAMMA - 1.0))
                    u[i] = uf
                    p[i] = p_r * (cf / c_r) ** (2.0 * GAMMA / (GAMMA - 1.0))
    return rho, u, p
