"""On-device self-check: the Mosaic-COMPILED fused kernels vs the XLA path.

The CPU test suite exercises the same kernel code in interpret mode; Mosaic
compilation is a second implementation of record (lowering differences such
as unsupported primitives or layout bugs only appear here).  Run on a real
TPU:  python scripts/tpu_selfcheck.py

Checks, all in production f32 on DMR-scale states:
  1. fused residual (Qk + Pk, all five fluxes) vs XLA rhs
  2. fused SSP stage (blend) vs XLA stage arithmetic
  3. fused post chain vs XLA {indicator -> TVB -> positivity}
  4. fused modal trunc+positivity vs XLA truncation + positivity
  5. fused diag (lam, minq) vs XLA reductions
Tolerances are f32 reassociation-scale, relative to each field's magnitude.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from dflo_tpu import ic
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, make_rhs


def dmr_ic(x, y, t=0.0):
    post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
    rho = jnp.where(post, 8.0, 1.4)
    vx = jnp.where(post, 7.14471, 0.0)
    vy = jnp.where(post, -4.125, 0.0)
    p = jnp.where(post, 116.5, 1.0)
    return jnp.stack([rho * vx, rho * vy, rho,
                      p / (euler.GAMMA - 1.0) + 0.5 * rho * (vx**2 + vy**2)])


def rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-30))


def main():
    assert jax.devices()[0].platform not in ("cpu",), \
        "self-check needs a real TPU (CPU runs exercise interpret mode)"
    failures = []

    def check(name, r, tol):
        ok = r < tol
        print(f"  {'PASS' if ok else 'FAIL'}  {name}: rel {r:.3e} "
              f"(tol {tol:.0e})")
        if not ok:
            failures.append(name)

    nx, ny = 256, 64
    mesh = CartesianMesh(nx, ny, 0.0, 4.0, 0.0, 1.0)
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, dmr_ic),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_FARFIELD, dmr_ic))

    print("1/2. fused residual + stage vs XLA")
    for fam in ("Qk", "Pk"):
        basis = make_basis(fam, 2)
        u = ic.set_initial_condition(basis, mesh, dmr_ic)
        for flux in ("lxf", "sw", "roe", "hllc", "kfvs"):
            rx = make_rhs(basis, mesh, bcs, flux=flux)
            rf = make_rhs(basis, mesh, bcs, flux=flux, volume_kernel="fused")
            check(f"rhs {fam} {flux}", rel(rf(u, 0.0), rx(u, 0.0)), 2e-5)
        rf = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused")
        rx = make_rhs(basis, mesh, bcs, flux="hllc")
        a, dt = 0.3, 1e-4
        st = rf.stage(u, u, 0.0, a, dt)
        ref = a * u + (1 - a) * (u + dt * rx(u, 0.0))
        check(f"stage {fam} hllc", rel(st, ref), 2e-6)

    print("3. fused post chain vs XLA")
    from dflo_tpu.ops.contract import basis_reduce
    from dflo_tpu.ops.pallas_kernels import make_fused_post
    from dflo_tpu.stab.indicator import make_shock_indicator
    from dflo_tpu.stab.limiter import make_tvb_limiter
    from dflo_tpu.stab.positivity import make_positivity_limiter
    basis = make_basis("Qk", 2)
    u = ic.set_initial_condition(basis, mesh, dmr_ic)
    ubar = basis_reduce(jnp.asarray(basis.wq2 @ basis.V, u.dtype), u)
    shock, _ = make_shock_indicator(basis, mesh, "density", False, False,
                                    u.dtype)(u, ubar, 0.0)
    ux = make_tvb_limiter(basis, mesh, M=10.0, char_lim=True,
                          dtype=u.dtype)(u, ubar, shock)
    ux = make_positivity_limiter(basis, mesh, u.dtype)(ux, ubar)
    fp = make_fused_post(basis, mesh, indicator="density", M=10.0,
                         char_lim=True, pos_lim=True, dtype=u.dtype)
    check("post chain", rel(fp(u), ux), 2e-5)

    print("4. fused modal trunc+pos vs XLA")
    from dflo_tpu.ops.pallas_kernels import make_fused_modal_pos
    basis_p = make_basis("Pk", 2)
    up = ic.set_initial_condition(basis_p, mesh, dmr_ic)
    rng = np.random.default_rng(0)
    deg = jnp.asarray(rng.integers(1, 3, (ny, nx)), jnp.int32)
    trunc = np.zeros((3, basis_p.K))
    for d in range(3):
        trunc[d] = (basis_p.mode_degree <= d).astype(float)
    u_t = up * jnp.moveaxis(jnp.asarray(trunc, up.dtype)[deg], -1, 0)[None]
    ub = basis_reduce(jnp.asarray(basis_p.wq2 @ basis_p.V, up.dtype), up)
    ref = make_positivity_limiter(basis_p, mesh, up.dtype)(u_t, ub)
    got = make_fused_modal_pos(basis_p, up.dtype, with_trunc=True)(up, deg)
    check("modal trunc+pos", rel(got, ref), 2e-6)

    print("4b. fused Pk post chain vs XLA {modal TVB -> modal pos}")
    from dflo_tpu.ops.pallas_kernels import make_fused_pk_post
    marked = jnp.asarray(rng.random((ny, nx)) < 0.3)
    lim_pk = make_tvb_limiter(basis_p, mesh, M=0.0, beta=2.0, char_lim=True,
                              dtype=up.dtype)
    avg0 = float((basis_p.wq2 @ basis_p.V)[0])
    ref_pk = make_fused_modal_pos(basis_p, up.dtype, with_trunc=False)(
        lim_pk(up, avg0 * up[:, 0], jnp.where(marked, 1e20, 0.0)))
    pkp = make_fused_pk_post(basis_p, mesh, M=0.0, beta=2.0, char_lim=True,
                             dtype=up.dtype)
    shock_f = jnp.where(marked, 2.0, 0.0).astype(up.dtype)
    check("pk post chain", rel(pkp(up, shock_f), ref_pk), 2e-6)
    pkp_d = make_fused_pk_post(basis_p, mesh, M=0.0, beta=2.0, char_lim=True,
                               dtype=up.dtype, with_diag=True)
    got_pk, lam_pk, minq_pk = pkp_d(up, shock_f)
    check("pk post diag state", rel(got_pk, ref_pk), 2e-6)
    ub_pk = avg0 * ref_pk[:, 0]
    cs_pk = jnp.sqrt(euler.GAMMA * euler.pressure(ub_pk) / ub_pk[euler.RHO])
    vx_pk = jnp.abs(ub_pk[euler.MX] / ub_pk[euler.RHO])
    vy_pk = jnp.abs(ub_pk[euler.MY] / ub_pk[euler.RHO])
    lam_pk_ref = jnp.max((cs_pk + vx_pk) / mesh.diameter_h
                         + (cs_pk + vy_pk) / mesh.diameter_h)
    minq_pk_ref = jnp.minimum(ub_pk[euler.RHO].min(),
                              euler.pressure(ub_pk).min())
    check("pk post diag lam", rel(lam_pk, lam_pk_ref), 1e-5)
    check("pk post diag minq", rel(minq_pk, minq_pk_ref), 1e-5)

    print("5. fused diag vs XLA reductions")
    from dflo_tpu.ops.pallas_kernels import make_fused_diag
    lam, minq = make_fused_diag(basis, mesh, u.dtype)(u)
    cs = jnp.sqrt(euler.GAMMA * euler.pressure(ubar) / ubar[euler.RHO])
    vx = jnp.abs(ubar[euler.MX] / ubar[euler.RHO])
    vy = jnp.abs(ubar[euler.MY] / ubar[euler.RHO])
    lam_ref = jnp.max((cs + vx) / mesh.diameter_h + (cs + vy) / mesh.diameter_h)
    minq_ref = jnp.minimum(ubar[euler.RHO].min(), euler.pressure(ubar).min())
    check("diag lam", rel(lam, lam_ref), 1e-6)
    check("diag minq", rel(minq, minq_ref), 1e-6)

    print("6. ragged shapes (shipped reference resolutions, internal pads)")
    # sod's 100x10 and DMR's 401x100 are NOT tile-aligned: ragged nx rides
    # one full-width lane tile, ragged ny gains internal solid pad rows
    for rnx, rny in ((100, 10), (401, 100)):
        rmesh = CartesianMesh(rnx, rny, 0.0, 4.0, 0.0, 1.0)
        for fam in ("Qk", "Pk"):
            rb = make_basis(fam, 2)
            ru = ic.set_initial_condition(rb, rmesh, dmr_ic)
            rx_ = make_rhs(rb, rmesh, bcs, flux="hllc")
            rf_ = make_rhs(rb, rmesh, bcs, flux="hllc", volume_kernel="fused")
            check(f"rhs ragged {rnx}x{rny} {fam}",
                  rel(rf_(ru, 0.0), rx_(ru, 0.0)), 2e-5)
    rb = make_basis("Qk", 2)
    rmesh = CartesianMesh(100, 20, 0.0, 4.0, 0.0, 1.0)
    ru = ic.set_initial_condition(rb, rmesh, dmr_ic)
    rub = basis_reduce(jnp.asarray(rb.wq2 @ rb.V, ru.dtype), ru)
    rshock, _ = make_shock_indicator(rb, rmesh, "density", False, False,
                                     ru.dtype)(ru, rub, 0.0)
    rux = make_tvb_limiter(rb, rmesh, M=10.0, char_lim=True,
                           dtype=ru.dtype)(ru, rub, rshock)
    rux = make_positivity_limiter(rb, rmesh, ru.dtype)(rux, rub)
    rfp = make_fused_post(rb, rmesh, indicator="density", M=10.0,
                          char_lim=True, pos_lim=True, dtype=ru.dtype)
    check("post chain ragged 100x20", rel(rfp(ru), rux), 2e-5)
    rlam, rminq = make_fused_diag(rb, rmesh, ru.dtype)(ru)
    rcs = jnp.sqrt(euler.GAMMA * euler.pressure(rub) / rub[euler.RHO])
    rvx = jnp.abs(rub[euler.MX] / rub[euler.RHO])
    rvy = jnp.abs(rub[euler.MY] / rub[euler.RHO])
    rlam_ref = jnp.max((rcs + rvx) / rmesh.diameter_h
                       + (rcs + rvy) / rmesh.diameter_h)
    rminq_ref = jnp.minimum(rub[euler.RHO].min(), euler.pressure(rub).min())
    check("diag ragged lam", rel(rlam, rlam_ref), 1e-6)
    check("diag ragged minq", rel(rminq, rminq_ref), 1e-6)

    print("7. masked domain (forward_step-style solid block), compiled")
    m_np = np.ones((20, 100), bool)
    m_np[:10, 60:] = False
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 1.4 * 3.0), jnp.zeros_like(x),
         jnp.full_like(x, 1.4),
         jnp.full_like(x, 1.0 / (euler.GAMMA - 1.0) + 0.5 * 1.4 * 9.0)])
    mbcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
                E=BoundarySide(euler.BC_OUTFLOW),
                S=BoundarySide(euler.BC_SLIP),
                N=BoundarySide(euler.BC_SLIP))
    mmesh = CartesianMesh(100, 20, 0.0, 3.0, 0.0, 1.0)
    mu = ic.set_initial_condition(rb, mmesh, inflow)
    mx_ = make_rhs(rb, mmesh, mbcs, flux="hllc", mask=m_np)
    mf_ = make_rhs(rb, mmesh, mbcs, flux="hllc", mask=m_np,
                   volume_kernel="fused")
    check("rhs masked+ragged", rel(mf_(mu, 0.0), mx_(mu, 0.0)), 2e-5)
    mub = basis_reduce(jnp.asarray(rb.wq2 @ rb.V, mu.dtype), mu)
    mshock, _ = make_shock_indicator(rb, mmesh, "density", False, False,
                                     mu.dtype, mask=m_np)(mu, mub, 0.0)
    mux = make_tvb_limiter(rb, mmesh, M=10.0, char_lim=True,
                           dtype=mu.dtype, mask=m_np)(mu, mub, mshock)
    mux = make_positivity_limiter(rb, mmesh, mu.dtype)(mux, mub)
    mfp = make_fused_post(rb, mmesh, indicator="density", M=10.0,
                          char_lim=True, pos_lim=True, dtype=mu.dtype,
                          mask=m_np)
    got = jnp.where(jnp.asarray(m_np)[None, None], mfp(mu), mux)
    check("post chain masked+ragged", rel(got, mux), 2e-5)

    if failures:
        print(f"\nSELF-CHECK FAILED: {failures}")
        sys.exit(1)
    print("\nall compiled-kernel checks PASSED")


if __name__ == "__main__":
    main()
