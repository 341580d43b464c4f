"""Numerical (Riemann) fluxes, vectorized and branchless.

Re-implements the reference's six normal-flux functions
(src/equation.h:324-782, src_mpi/equation.h:838-1040) over batched states:
every function takes left/right traces ``UL, UR [4, ...]`` and unit-normal
components ``nx, ny`` (broadcastable), and returns the numerical normal flux
``[4, ...]``.  All control flow is jnp.where selects so the whole face sweep
compiles to one fused VPU kernel; the double-where pattern keeps untaken
branches NaN-free for jax.jvp (used by the implicit path).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erf

from dflo_tpu.physics.euler import (GAMMA, MX, MY, RHO, ENE, _pos, pressure,
                                    max_eigenvalue_normal)


def _vn(U, nx, ny):
    return (U[MX] * nx + U[MY] * ny) / U[RHO]


def lxf(UL, UR, nx, ny, AL=None, AR=None):
    """Local Lax-Friedrichs (src/equation.h:324-377).

    The dissipation speed uses the *cell-average* states AL/AR exactly like
    the reference (lxf_flux's Aplus/Aminus args, src/assemble_explicit.cc:335-340);
    defaults to the traces when averages are not supplied.
    """
    AL = UL if AL is None else AL
    AR = UR if AR is None else AR
    vnl, vnr = _vn(UL, nx, ny), _vn(UR, nx, ny)
    pl, pr = pressure(UL), pressure(UR)
    lam = jnp.maximum(max_eigenvalue_normal(AL, nx, ny),
                      max_eigenvalue_normal(AR, nx, ny))
    f = jnp.stack([
        0.5 * (pl * nx + UL[MX] * vnl + pr * nx + UR[MX] * vnr),
        0.5 * (pl * ny + UL[MY] * vnl + pr * ny + UR[MY] * vnr),
        0.5 * (UL[RHO] * vnl + UR[RHO] * vnr),
        0.5 * ((UL[ENE] + pl) * vnl + (UR[ENE] + pr) * vnr),
    ])
    return f + 0.5 * lam * (UL - UR)


def steger_warming(UL, UR, nx, ny, AL=None, AR=None):
    """Steger-Warming flux-vector splitting (src/equation.h:382-464)."""
    def split(U, sign):
        rho = U[RHO]
        vn = _vn(U, nx, ny)
        q2 = (U[MX] * U[MX] + U[MY] * U[MY]) / (rho * rho)
        p = pressure(U)
        c = jnp.sqrt(GAMMA * _pos(p) / _pos(rho))
        if sign > 0:
            l1 = jnp.maximum(vn, 0.0)
            l2 = jnp.maximum(vn + c, 0.0)
            l3 = jnp.maximum(vn - c, 0.0)
        else:
            l1 = jnp.minimum(vn, 0.0)
            l2 = jnp.minimum(vn + c, 0.0)
            l3 = jnp.minimum(vn - c, 0.0)
        a = 2.0 * (GAMMA - 1.0) * l1 + l2 + l3
        fscale = 0.5 * rho / GAMMA
        fm = jnp.stack([
            a * U[MX] / rho + c * (l2 - l3) * nx,
            a * U[MY] / rho + c * (l2 - l3) * ny,
            a,
            0.5 * a * q2 + c * vn * (l2 - l3) + c * c * (l2 + l3) / (GAMMA - 1.0),
        ])
        return fscale * fm

    return split(UL, +1) + split(UR, -1)


def roe(UL, UR, nx, ny, AL=None, AR=None):
    """Roe flux with Harten entropy fix delta = 0.1c (src/equation.h:469-556)."""
    rl, rr = UL[RHO], UR[RHO]
    sl, sr = jnp.sqrt(_pos(rl)), jnp.sqrt(_pos(rr))
    fl = sl / (sl + sr)
    fr = 1.0 - fl

    ul, vl = UL[MX] / rl, UL[MY] / rl
    ur, vr = UR[MX] / rr, UR[MY] / rr
    v2l = ul * ul + vl * vl
    v2r = ur * ur + vr * vr
    vnl = ul * nx + vl * ny
    vnr = ur * nx + vr * ny
    u = ul * fl + ur * fr
    v = vl * fl + vr * fr
    vn = u * nx + v * ny
    v2 = u * u + v * v
    du_, dv_ = ur - ul, vr - vl
    v_dot_dv = u * du_ + v * dv_

    pl = (GAMMA - 1.0) * (UL[ENE] - 0.5 * rl * v2l)
    pr = (GAMMA - 1.0) * (UR[ENE] - 0.5 * rr * v2r)
    hl = GAMMA * pl / rl / (GAMMA - 1.0) + 0.5 * v2l
    hr = GAMMA * pr / rr / (GAMMA - 1.0) + 0.5 * v2r

    rho = sl * sr
    h = hl * fl + hr * fr
    c = jnp.sqrt(_pos((GAMMA - 1.0) * (h - 0.5 * v2)))
    drho = rr - rl
    dp = pr - pl
    dvn = vnr - vnl

    a1 = (dp - rho * c * dvn) / (2.0 * c * c)
    a2 = drho - dp / (c * c)
    a3 = (dp + rho * c * dvn) / (2.0 * c * c)

    l1 = jnp.abs(vn - c)
    l2 = jnp.abs(vn)
    l3 = jnp.abs(vn + c)
    delta = 0.1 * c
    l1 = jnp.where(l1 < delta, 0.5 * (l1 * l1 / delta + delta), l1)
    l3 = jnp.where(l3 < delta, 0.5 * (l3 * l3 / delta + delta), l3)

    d_rho = l1 * a1 + l2 * a2 + l3 * a3
    d_ene = (l1 * a1 * (h - c * vn) + l2 * a2 * 0.5 * v2
             + l2 * rho * (v_dot_dv - vn * dvn) + l3 * a3 * (h + c * vn))
    p_avg = 0.5 * (pl + pr)
    d_mx = ((u - nx * c) * l1 * a1 + u * l2 * a2
            + (du_ - nx * dvn) * l2 * rho + (u + nx * c) * l3 * a3)
    d_my = ((v - ny * c) * l1 * a1 + v * l2 * a2
            + (dv_ - ny * dvn) * l2 * rho + (v + ny * c) * l3 * a3)

    return jnp.stack([
        nx * p_avg + 0.5 * (UL[MX] * vnl + UR[MX] * vnr) - 0.5 * d_mx,
        ny * p_avg + 0.5 * (UL[MY] * vnl + UR[MY] * vnr) - 0.5 * d_my,
        0.5 * (rl * vnl + rr * vnr - d_rho),
        0.5 * (rl * hl * vnl + rr * hr * vnr - d_ene),
    ])


def hllc(UL, UR, nx, ny, AL=None, AR=None):
    """HLLC flux, SU2-derived variant (src/equation.h:559-681), branchless."""
    rl, rr = UL[RHO], UR[RHO]
    sl_, sr_ = jnp.sqrt(_pos(rl)), jnp.sqrt(_pos(rr))
    fl = sl_ / (sl_ + sr_)
    fr = 1.0 - fl

    ul, vl = UL[MX] / rl, UL[MY] / rl
    ur, vr = UR[MX] / rr, UR[MY] / rr
    v2l = ul * ul + vl * vl
    v2r = ur * ur + vr * vr
    vnl = ul * nx + vl * ny
    vnr = ur * nx + vr * ny
    u = ul * fl + ur * fr
    v = vl * fl + vr * fr
    vn = u * nx + v * ny
    v2 = u * u + v * v

    pl = (GAMMA - 1.0) * (UL[ENE] - 0.5 * rl * v2l)
    pr = (GAMMA - 1.0) * (UR[ENE] - 0.5 * rr * v2r)
    hl = (UL[ENE] + pl) / rl
    hr = (UR[ENE] + pr) / rr
    cl = jnp.sqrt(GAMMA * _pos(pl) / _pos(rl))
    cr = jnp.sqrt(GAMMA * _pos(pr) / _pos(rr))
    el = UL[ENE] / rl
    er = UR[ENE] / rr

    h = hl * fl + hr * fr
    c = jnp.sqrt(_pos((GAMMA - 1.0) * (h - 0.5 * v2)))

    s_l = jnp.minimum(vn - c, vnl - cl)
    s_r = jnp.maximum(vn + c, vnr + cr)
    s_m = (pl - pr - rl * vnl * (s_l - vnl) + rr * vnr * (s_r - vnr)) / (
        rr * (s_r - vnr) - rl * (s_l - vnl))
    p_star = rr * (vnr - s_r) * (vnr - s_m) + pr

    # pure upwind fluxes
    f_l = jnp.stack([rl * ul * vnl + pl * nx, rl * vl * vnl + pl * ny,
                     rl * vnl, el * rl * vnl + pl * vnl])
    f_r = jnp.stack([rr * ur * vnr + pr * nx, rr * vr * vnr + pr * ny,
                     rr * vnr, er * rr * vnr + pr * vnr])

    def star(U, rho, uu, vv, vnn, p, e, s, side_nx, side_ny):
        den = s - s_m
        den = jnp.where(jnp.abs(den) < 1e-300, 1.0, den)
        inv = 1.0 / den
        smu = s - vnn
        rho_s = rho * smu * inv
        mx_s = (rho * uu * smu + (p_star - p) * nx) * inv
        my_s = (rho * vv * smu + (p_star - p) * ny) * inv
        e_s = (smu * e * rho - p * vnn + p_star * s_m) * inv
        return jnp.stack([mx_s * s_m + p_star * nx,
                          my_s * s_m + p_star * ny,
                          rho_s * s_m,
                          (e_s + p_star) * s_m])

    f_star_l = star(UL, rl, ul, vl, vnl, pl, el, s_l, nx, ny)
    f_star_r = star(UR, rr, ur, vr, vnr, pr, er, s_r, nx, ny)

    left = jnp.where(s_l > 0.0, f_l, f_star_l)       # s_m >= 0 branch
    right = jnp.where(s_r >= 0.0, f_star_r, f_r)     # s_m <  0 branch
    return jnp.where(s_m >= 0.0, left, right)


def erf_approx(x):
    """Rational erf approximation, Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7,
    i.e. below f32 roundoff).  The reference carries its own ERF for the same
    reason deal.II lacked one (src/equation.h:686-712); here the approximation
    exists because jax.scipy.special.erf has no Mosaic (Pallas TPU) lowering,
    so the fused kernels use this kernel-safe variant of kfvs."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _kinetic_split(U, sign, nx, ny, erf_fn=erf):
    """Kinetic split flux of Deshpande/Mandal (src/equation.h:714-751)."""
    vn = _vn(U, nx, ny)
    p = pressure(U)
    beta = 0.5 * _pos(U[RHO]) / _pos(p)
    s = vn * jnp.sqrt(beta)
    A = 0.5 * (1.0 + sign * erf_fn(s))
    B = 0.5 * sign * jnp.exp(-s * s) / jnp.sqrt(jnp.pi * beta)
    ufact = vn * A + B
    return jnp.stack([
        p * nx * A + U[MX] * ufact,
        p * ny * A + U[MY] * ufact,
        U[RHO] * ufact,
        (U[ENE] + p) * vn * A + (U[ENE] + 0.5 * p) * B,
    ])


def kfvs(UL, UR, nx, ny, AL=None, AR=None):
    """KFVS flux (src/equation.h:756-782)."""
    return _kinetic_split(UL, +1, nx, ny) + _kinetic_split(UR, -1, nx, ny)


def kfvs_kernel(UL, UR, nx, ny, AL=None, AR=None):
    """kfvs with the A&S erf (the Mosaic-compilable variant; agrees with
    kfvs to 1.5e-7 relative, below f32 eps)."""
    return (_kinetic_split(UL, +1, nx, ny, erf_fn=erf_approx)
            + _kinetic_split(UR, -1, nx, ny, erf_fn=erf_approx))


def logavg(a, b):
    """Logarithmic mean with the series guard (src_mpi/equation.h:26-45)."""
    xi = b / a
    f = (xi - 1.0) / (xi + 1.0)
    u = f * f
    u2 = u * u
    series = 1.0 + u / 3.0 + u2 / 5.0 + u2 * u / 7.0
    f_safe = jnp.where(u < 1.0e-2, 1.0, f)
    exact = jnp.log(xi) / (2.0 * f_safe)
    F = jnp.where(u < 1.0e-2, series, exact)
    return 0.5 * (a + b) / F


def kep(UL, UR, nx, ny, AL=None, AR=None):
    """Chandrashekar-style kinetic-energy-preserving, entropy-stable flux
    with eigen-decomposed entropy-variable dissipation
    (kep_flux + kep_diff_matrix, src_mpi/equation.h:748-920).

    The dissipation matrix is evaluated on the cell-average states AL/AR as
    in the reference (Aplus/Aminus), with a Rusanov-type eigenvalue bump
    BETA*|lambda_L - lambda_R|.
    """
    AL = UL if AL is None else AL
    AR = UR if AR is None else AR
    BETA = 1.0 / 6.0

    rl, rr = UL[RHO], UR[RHO]
    rho = logavg(rl, rr)
    ul, vl = UL[MX] / rl, UL[MY] / rl
    ur, vr = UR[MX] / rr, UR[MY] / rr
    v2l = ul * ul + vl * vl
    v2r = ur * ur + vr * vr
    u = 0.5 * (ul + ur)
    v = 0.5 * (vl + vr)
    vn = u * nx + v * ny
    v2 = u * u + v * v
    vel2 = 0.5 * (v2l + v2r)

    pl = (GAMMA - 1.0) * (UL[ENE] - 0.5 * rl * v2l)
    pr = (GAMMA - 1.0) * (UR[ENE] - 0.5 * rr * v2r)
    betal = 0.5 * _pos(rl) / _pos(pl)
    betar = 0.5 * _pos(rr) / _pos(pr)
    beta = logavg(betal, betar)
    a = jnp.sqrt(0.5 * GAMMA / beta)
    p = 0.5 * (rl + rr) / (betal + betar)

    # central entropy-conservative part (src_mpi/equation.h:891-897)
    f_rho = rho * vn
    f_mx = nx * p + u * f_rho
    f_my = ny * p + v * f_rho
    f_ene = (0.5 * (1.0 / ((GAMMA - 1.0) * beta) - vel2) * f_rho
             + f_mx * u + f_my * v)

    # --- dissipation matrix on the average states (kep_diff_matrix) ---------
    arl, arr = AL[RHO], AR[RHO]
    arho = logavg(arl, arr)
    aul, avl = AL[MX] / arl, AL[MY] / arl
    aur, avr = AR[MX] / arr, AR[MY] / arr
    av2l = aul * aul + avl * avl
    av2r = aur * aur + avr * avr
    avnl = aul * nx + avl * ny
    avnr = aur * nx + avr * ny
    au = 0.5 * (aul + aur)
    av = 0.5 * (avl + avr)
    avn = au * nx + av * ny
    av2 = au * au + av * av

    apl = (GAMMA - 1.0) * (AL[ENE] - 0.5 * arl * av2l)
    apr = (GAMMA - 1.0) * (AR[ENE] - 0.5 * arr * av2r)
    abetal = 0.5 * _pos(arl) / _pos(apl)
    abetar = 0.5 * _pos(arr) / _pos(apr)
    abeta = logavg(abetal, abetar)
    aa = jnp.sqrt(0.5 * GAMMA / abeta)
    ap = 0.5 * (arl + arr) / (abetal + abetar)

    H = aa * aa / (GAMMA - 1.0) + 0.5 * av2
    v1 = au * ny - av * nx
    one = jnp.ones_like(arho)
    zero = jnp.zeros_like(arho)
    # R columns: eigenvectors in (rho, mx, my, E) internal ordering
    Rcols = [
        jnp.stack([one, au - aa * nx, av - aa * ny, H - aa * avn]),
        jnp.stack([one, au, av, 0.5 * av2]),
        jnp.stack([zero, ny * one, -nx * one, v1]),
        jnp.stack([one, au + aa * nx, av + aa * ny, H + aa * avn]),
    ]
    al_ = jnp.sqrt(GAMMA * _pos(apl) / _pos(arl))
    ar_ = jnp.sqrt(GAMMA * _pos(apr) / _pos(arr))
    lam = [
        jnp.abs(avn - aa) + BETA * jnp.abs((avnl - al_) - (avnr - ar_)),
        jnp.abs(avn),
        jnp.abs(avn),
        jnp.abs(avn + aa) + BETA * jnp.abs((avnl + al_) - (avnr + ar_)),
    ]
    S = [0.5 * arho / GAMMA, (GAMMA - 1.0) * arho / GAMMA, ap,
         0.5 * arho / GAMMA]

    # jump in entropy variables (src_mpi/equation.h:902-908)
    ds = jnp.log(pr / pl) - GAMMA * jnp.log(rr / rl)
    dV = jnp.stack([
        -ds / (GAMMA - 1.0) - (betar * v2r - betal * v2l),
        2.0 * (betar * ur - betal * ul),
        2.0 * (betar * vr - betal * vl),
        -2.0 * (betar - betal),
    ])

    # Diff = sum_k R_k (lam_k S_k) (R_k . dV)
    diff = jnp.zeros_like(dV)
    for k in range(4):
        proj = jnp.sum(Rcols[k] * dV, axis=0)
        diff = diff + Rcols[k] * (lam[k] * S[k] * proj)

    return jnp.stack([
        f_mx - 0.5 * diff[1],
        f_my - 0.5 * diff[2],
        f_rho - 0.5 * diff[0],
        f_ene - 0.5 * diff[3],
    ])


FLUX_FUNCTIONS = {
    "lxf": lxf,
    "sw": steger_warming,
    "roe": roe,
    "hllc": hllc,
    "kfvs": kfvs,
    "kep": kep,
}


def get_flux(name: str, kernel_safe: bool = False):
    """Flux by prm name; kernel_safe=True swaps kfvs for its A&S-erf variant
    (jax.scipy erf has no Mosaic lowering)."""
    if kernel_safe and name == "kfvs":
        return kfvs_kernel
    try:
        return FLUX_FUNCTIONS[name]
    except KeyError:
        raise ValueError(f"unknown numerical flux {name!r}; "
                         f"choose from {sorted(FLUX_FUNCTIONS)}") from None
