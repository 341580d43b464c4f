"""Zhang-Shu positivity-preserving limiter, vectorized and branchless.

Re-implements apply_positivity_limiter (src/positivity.cc:16-208): density
and pressure are checked at the mixed GLL x Gauss quadrature point sets
(src/positivity.cc:42-46), cells squeeze toward their (positive) average with
scale factors theta1 (density) and theta2 (pressure, from the per-point
quadratic root solve of src/positivity.cc:140-177).  The reference's per-cell
loop with an early exit becomes a masked whole-domain update; the fatal
negative-average abort (src/positivity.cc:26-39) is surfaced separately by
`negative_average_flag` so the host driver can raise outside jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops import quadrature
from dflo_tpu.ops.contract import basis_apply
from dflo_tpu.physics import euler

EPS = 1.0e-13  # src/positivity.cc:27

#: f32 relative floor (~32 ulps): the reference's absolute 1e-13 floor is
#: meaningful in f64 but sits far BELOW f32 squeeze rounding (~1e-7 * avg),
#: so an f32 Zhang-Shu squeeze can land point densities at -O(ulp) — where
#: p = (gamma-1)(E - m^2/(2 rho)) flips sign with huge magnitude and the
#: pressure pass wrongly skips the cell.  Relative floors keep the squeezed
#: values a safe margin above the rounding noise.
REL_F32 = 4.0e-6


def pos_floors(ubar, dtype):
    """Per-cell (eps_rho, eps_p) positivity floors: the reference's absolute
    EPS in f64 (src/positivity.cc:27), relative floors in f32."""
    if jnp.dtype(dtype) == jnp.float64:
        e = jnp.asarray(EPS, dtype)
        return e, e
    eps_r = jnp.maximum(EPS, REL_F32 * ubar[euler.RHO])
    eps_p = jnp.maximum(EPS, REL_F32 * euler.pressure(ubar))
    return eps_r, eps_p


def _pos_points(degree: int) -> np.ndarray:
    """Mixed GLL x Gauss point sets (src/positivity.cc:42-46): 2N-3 >= degree."""
    N = (degree + 3) // 2 if (degree + 3) % 2 == 0 else (degree + 4) // 2
    xg, _ = quadrature.gauss_lobatto(N)
    xq, _ = quadrature.gauss(degree + 1)
    # set 1: GLL in x, Gauss in y; set 2: swapped
    px = np.array([(a, b) for b in xq for a in xg])
    py = np.array([(a, b) for b in xg for a in xq])
    return np.concatenate([px, py], axis=0)


def make_positivity_limiter(basis: basis_mod.Basis, mesh=None, dtype=None):
    """Build limit(u, ubar) -> u (Zhang-Shu scaling)."""
    dtype = dtype or jnp.zeros(0).dtype
    if basis.degree == 0:
        return lambda u, ubar: u
    P = jnp.asarray(basis.eval_at(_pos_points(basis.degree)), dtype)  # [Qp,K]
    modal = basis.family == "Pk"
    if modal:
        keep = np.zeros(basis.K)
        keep[0] = 1.0
        keep = jnp.asarray(keep, dtype)

    def scale_about_avg(u, ubar, theta, comps=None):
        """theta*u + (1-theta)*avg per cell; modal bases scale the
        non-mean coefficients (src/positivity.cc:90-110)."""
        th = theta[None, None]
        if modal:
            kb = keep[(None, slice(None)) + (None,) * (u.ndim - 2)]
            u_new = u * th + ubar[:, None] * kb * (1.0 - th)
        else:
            u_new = u * th + ubar[:, None] * (1.0 - th)
        if comps is None:
            return u_new
        mask = jnp.zeros((euler.N_COMP,), bool).at[jnp.array(comps)].set(True)
        return jnp.where(mask[(...,) + (None,) * (u.ndim - 1)], u_new, u)

    def limit(u, ubar):
        eps_r, eps_p = pos_floors(ubar, u.dtype)
        # ---- density pass (src/positivity.cc:68-111) ----------------------
        W = basis_apply(P, u)                          # [4, Qp, ny, nx]
        rho_min = jnp.min(W[euler.RHO], axis=0)        # [ny, nx]
        rho_avg = ubar[euler.RHO]
        rat = jnp.abs(rho_avg - eps_r) / (jnp.abs(rho_avg - rho_min) + 1.0e-13)
        theta1 = jnp.minimum(rat, 1.0)
        u = scale_about_avg(u, ubar, theta1, comps=(euler.RHO,))

        # ---- pressure pass (src/positivity.cc:113-182) --------------------
        # only density changed, and the squeeze acts identically on point
        # values: update W's density row analytically instead of re-applying
        # the evaluation matrix (saves one full contraction per stage)
        W = W.at[euler.RHO].set(W[euler.RHO] * theta1[None]
                                + rho_avg[None] * (1.0 - theta1[None]))
        pre = euler.pressure(W)
        d = W - ubar[:, None]                          # deviations from avg
        drho, dE = d[euler.RHO], d[euler.ENE]
        dmx, dmy = d[euler.MX], d[euler.MY]
        mavg_x, mavg_y = ubar[euler.MX][None], ubar[euler.MY][None]
        ravg, Eavg = ubar[euler.RHO][None], ubar[euler.ENE][None]

        epn = eps_p[None]
        a1 = 2.0 * drho * dE - (dmx * dmx + dmy * dmy)
        b1 = (2.0 * drho * (Eavg - epn / (euler.GAMMA - 1.0))
              + 2.0 * ravg * dE - 2.0 * (mavg_x * dmx + mavg_y * dmy))
        c1 = (2.0 * ravg * Eavg - (mavg_x**2 + mavg_y**2)
              - 2.0 * epn * ravg / (euler.GAMMA - 1.0))
        a1s = jnp.where(a1 == 0.0, 1.0, a1)            # guard /0 of untaken pts
        b1n, c1n = b1 / a1s, c1 / a1s
        D = jnp.sqrt(jnp.abs(b1n * b1n - 4.0 * c1n))
        t1 = 0.5 * (-b1n - D)
        t2 = 0.5 * (-b1n + D)
        t1_ok = (t1 > -1.0e-12) & (t1 < 1.0 + 1.0e-12)
        t = jnp.where(t1_ok, t1, t2)
        t = jnp.clip(t, 0.0, 1.0)
        t = jnp.where(jnp.abs(1.0 - t) < 1.0e-14, 0.0, t)  # round-off guard
        t = jnp.where(pre < epn, t, 1.0)
        theta2 = jnp.min(t, axis=0)                    # [ny, nx]
        return scale_about_avg(u, ubar, theta2)

    return limit


def negative_average_flag(ubar, mask=None) -> jnp.ndarray:
    """True if any (fluid) cell-average density or pressure < EPS — the fatal
    condition of src/positivity.cc:26-39; raise on the host.  Written as
    ~(x >= EPS) so NaN states (f32 blow-ups) also trip the flag."""
    bad = ~(jnp.minimum(ubar[euler.RHO], euler.pressure(ubar)) >= EPS)
    if mask is not None:
        bad = bad & mask
    return jnp.any(bad)
