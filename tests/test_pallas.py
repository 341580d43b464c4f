"""Pallas volume kernel: identical results to the XLA path (interpret mode
on CPU exercises the same kernel code that runs compiled on TPU)."""

import jax.numpy as jnp
import numpy as np

from dflo_tpu import ic
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, make_rhs
import pytest

# interpret-mode/virtual-device emulation dominates CPU wall time: the
# quick dev tier skips this file (pytest.ini 'heavy'); the full suite runs it
pytestmark = pytest.mark.heavy


def test_pallas_volume_matches_xla():
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(16, 8, -5.0, 5.0, -2.0, 2.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex(5.0, 0.0, 0.0))
    u = jnp.asarray(u, jnp.float32)
    r_x = make_rhs(basis, mesh, bcs, flux="hllc", dtype=jnp.float32)(u, 0.0)
    r_p = make_rhs(basis, mesh, bcs, flux="hllc", dtype=jnp.float32,
                   volume_kernel="pallas")(u, 0.0)
    np.testing.assert_allclose(np.array(r_p), np.array(r_x),
                               rtol=2e-5, atol=2e-5)


def test_fused_residual_matches_xla_all_bc_combos():
    """The fully-fused VMEM residual kernel (volume + trace + Riemann flux
    + lift + mass solve, ops/pallas_kernels.make_fused_residual) equals the
    XLA path to roundoff on periodic, mixed, and all-physical BC layouts
    and across multi-tile grids in both directions (interpret mode runs the
    identical kernel code on CPU)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(256, 16, 0.0, 4.0, 0.0, 1.0)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 8.0 * 7.14471), jnp.full_like(x, -8.0 * 4.125),
         jnp.full_like(x, 8.0),
         jnp.full_like(x, 116.5 / (euler.GAMMA - 1.0)
                       + 0.5 * 8.0 * (7.14471**2 + 4.125**2))])
    per = BoundarySide(euler.BC_PERIODIC)
    cases = {
        "dmr": dict(W=BoundarySide(euler.BC_INFLOW, inflow),
                    E=BoundarySide(euler.BC_OUTFLOW),
                    S=BoundarySide(euler.BC_SLIP),
                    N=BoundarySide(euler.BC_FARFIELD, inflow)),
        "periodic": dict(W=per, E=per, S=per, N=per),
        "pery": dict(S=per, N=per, W=BoundarySide(euler.BC_SLIP),
                     E=BoundarySide(euler.BC_SLIP)),
    }

    def dmr_ic(x, y, t=0.0):
        post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
        rho = jnp.where(post, 8.0, 1.4)
        vx = jnp.where(post, 7.14471, 0.0)
        vy = jnp.where(post, -4.125, 0.0)
        p = jnp.where(post, 116.5, 1.0)
        return jnp.stack([rho * vx, rho * vy, rho,
                          p / (euler.GAMMA - 1.0)
                          + 0.5 * rho * (vx**2 + vy**2)])

    u = ic.set_initial_condition(basis, mesh, dmr_ic)
    for name, bcs in cases.items():
        for flx in ("hllc", "lxf"):
            rx = make_rhs(basis, mesh, bcs, flux=flx)(u, 0.1)
            rf = make_rhs(basis, mesh, bcs, flux=flx,
                          volume_kernel="fused")(u, 0.1)
            # 1e-10: the positivity floor in the wave-speed guards puts
            # Gibbs-overshoot points exactly on `where` thresholds, where
            # f64 associativity differences between the XLA and in-kernel
            # contractions can flip a branch
            rel = (float(jnp.abs(rx - rf).max())
                   / float(jnp.abs(rx).max()))
            assert rel < 1e-10, (name, flx, rel)


def test_fused_post_matches_xla_chain():
    """The fused stabilization kernel (ops/pallas_kernels.make_fused_post:
    averages + KXRCF indicator + TVB limiter + Zhang-Shu positivity in one
    VMEM pass) equals the XLA chain {make_shock_indicator -> make_tvb_limiter
    -> make_positivity_limiter} to roundoff across indicator kinds,
    characteristic limiting, positivity on/off, and BC layouts."""
    from dflo_tpu.ops.contract import basis_reduce
    from dflo_tpu.ops.pallas_kernels import make_fused_post
    from dflo_tpu.stab.indicator import make_shock_indicator
    from dflo_tpu.stab.limiter import make_tvb_limiter
    from dflo_tpu.stab.positivity import make_positivity_limiter

    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(256, 16, 0.0, 4.0, 0.0, 1.0)

    def dmr_ic(x, y, t=0.0):
        post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
        rho = jnp.where(post, 8.0, 1.4)
        vx = jnp.where(post, 7.14471, 0.0)
        vy = jnp.where(post, -4.125, 0.0)
        p = jnp.where(post, 116.5, 1.0)
        return jnp.stack([rho * vx, rho * vy, rho,
                          p / (euler.GAMMA - 1.0)
                          + 0.5 * rho * (vx**2 + vy**2)])

    u = ic.set_initial_condition(basis, mesh, dmr_ic)
    avg_op = jnp.asarray(basis.wq2 @ basis.V)

    for ind_kind in ("density", "energy", "limiter"):
        for char_lim in (False, True):
            for pos_lim in (True, False):
                for per in ((False, False), (True, True)):
                    per_x, per_y = per
                    ubar = basis_reduce(avg_op, u)
                    indicator = make_shock_indicator(
                        basis, mesh, ind_kind, per_x, per_y)
                    shock, _ = indicator(u, ubar, 0.0)
                    limit = make_tvb_limiter(
                        basis, mesh, M=10.0, char_lim=char_lim,
                        per_x=per_x, per_y=per_y)
                    ux = limit(u, ubar, shock)
                    if pos_lim:
                        ux = make_positivity_limiter(basis, mesh)(ux, ubar)
                    uf = make_fused_post(
                        basis, mesh, indicator=ind_kind, M=10.0,
                        char_lim=char_lim, pos_lim=pos_lim,
                        per_x=per_x, per_y=per_y)(u)
                    rel = (float(jnp.abs(ux - uf).max())
                           / float(jnp.abs(ux).max()))
                    assert rel < 1e-12, (ind_kind, char_lim, pos_lim,
                                         per, rel)


def test_solver_with_fused_kernels_matches_xla_steps():
    """Solver(post_kernel='fused', volume_kernel='fused') steps bit-match
    the XLA solver on the shocked double-mach hot path."""
    from dflo_tpu.driver import LimiterConfig, Solver

    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(128, 16, 0.0, 4.0, 0.0, 1.0)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 8.0 * 7.14471), jnp.full_like(x, -8.0 * 4.125),
         jnp.full_like(x, 8.0),
         jnp.full_like(x, 116.5 / (euler.GAMMA - 1.0)
                       + 0.5 * 8.0 * (7.14471**2 + 4.125**2))])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_FARFIELD, inflow))
    lim = LimiterConfig(type="TVB", shock_indicator="density", beta=2.0,
                        char_lim=True, pos_lim=True)

    def dmr_ic(x, y, t=0.0):
        post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
        rho = jnp.where(post, 8.0, 1.4)
        vx = jnp.where(post, 7.14471, 0.0)
        vy = jnp.where(post, -4.125, 0.0)
        p = jnp.where(post, 116.5, 1.0)
        return jnp.stack([rho * vx, rho * vy, rho,
                          p / (euler.GAMMA - 1.0)
                          + 0.5 * rho * (vx**2 + vy**2)])

    u0 = ic.set_initial_condition(basis, mesh, dmr_ic)
    sx = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.5)
    sf = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.5,
                volume_kernel="fused", post_kernel="fused")
    ux, uf = sx.post_stage(u0), sf.post_stage(u0)
    tx = tf = 0.0
    for _ in range(5):
        ux, dtx, _, _ = sx._step(ux, tx, 1.0)
        uf, dtf, _, _ = sf._step(uf, tf, 1.0)
        tx, tf = tx + float(dtx), tf + float(dtf)
    assert abs(tx - tf) < 1e-13 * max(tx, 1.0)
    rel = float(jnp.abs(ux - uf).max()) / float(jnp.abs(ux).max())
    assert rel < 1e-11, rel


def test_fused_conservation():
    """One-flux-per-interface-side with identical operands: the fused
    kernel's residual must conserve mass/momentum/energy exactly on a
    periodic box."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(128, 16, -5.0, 5.0, -1.0, 1.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())
    rf = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused")(u, 0.0)
    w = jnp.asarray(basis.wq2 @ basis.V)
    tot = jnp.einsum("k,ckyx->c", w, rf) * mesh.dx * mesh.dy
    np.testing.assert_allclose(np.array(tot), 0.0, atol=1e-11)


def test_fused_diag_matches_xla():
    """make_fused_diag (one-pass dt wave-speed max + negativity min) equals
    compute_dt / negative_average_flag inputs."""
    from dflo_tpu.ops.contract import basis_reduce
    from dflo_tpu.ops.pallas_kernels import make_fused_diag

    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(256, 16, 0.0, 4.0, 0.0, 1.0)
    u = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex(3.0, 1.0, 0.2))
    lam, minq = make_fused_diag(basis, mesh)(u)
    ubar = basis_reduce(jnp.asarray(basis.wq2 @ basis.V), u)
    h = mesh.diameter_h
    c = euler.sound_speed(ubar)
    vx = jnp.abs(ubar[euler.MX] / ubar[euler.RHO])
    vy = jnp.abs(ubar[euler.MY] / ubar[euler.RHO])
    lam_ref = jnp.max((c + vx) / h + (c + vy) / h)
    minq_ref = jnp.minimum(jnp.min(ubar[euler.RHO]),
                           jnp.min(euler.pressure(ubar)))
    assert abs(float(lam - lam_ref)) < 1e-12 * float(lam_ref)
    assert abs(float(minq - minq_ref)) < 1e-12 * abs(float(minq_ref))


def test_fused_residual_masked_matches_xla():
    """volume_kernel='fused' with a solid-cell mask (forward-step domain):
    slip-wall mirror fluxes at fluid-solid interfaces and frozen solid
    cells match the XLA masked path to roundoff."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(96, 32, 0.0, 3.0, 0.0, 1.0)
    mask = np.ones((32, 96), bool)
    mask[:8, 20:] = False          # the forward step
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 3.0 * 1.4), jnp.zeros_like(x),
         jnp.full_like(x, 1.4),
         jnp.full_like(x, 1.0 / (euler.GAMMA - 1.0) + 0.5 * 1.4 * 9.0)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))

    def ic_fn(x, y, t=0.0):
        return inflow(x, y, t)

    u = ic.set_initial_condition(basis, mesh, ic_fn)
    # perturb so interfaces carry real jumps
    rng = np.random.RandomState(0)
    u = u * (1.0 + 0.01 * jnp.asarray(rng.rand(*u.shape)))
    for flx in ("hllc", "lxf"):
        rx = make_rhs(basis, mesh, bcs, flux=flx, mask=mask)(u, 0.1)
        rf = make_rhs(basis, mesh, bcs, flux=flx, mask=mask,
                      volume_kernel="fused")(u, 0.1)
        rel = float(jnp.abs(rx - rf).max()) / float(jnp.abs(rx).max())
        assert rel < 1e-10, (flx, rel)
        # solid cells frozen
        assert float(jnp.abs(rf[:, :, ~mask]).max()) == 0.0


def test_fused_residual_pk_and_kfvs_match_xla():
    """Modal-Pk (the MOOD basis) and kfvs (A&S-erf variant) ride the fused
    kernel: Pk uses the in-kernel V contraction to quadrature-point values
    (src/main.cc:46 FE_DGP path); kfvs agrees to the 1.5e-7 erf-approx
    tolerance (src/equation.h:686-782)."""
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    mesh = CartesianMesh(256, 16, 0.0, 4.0, 0.0, 1.0)

    def smooth(x, y, t=0.0):
        rho = 1.0 + 0.2 * jnp.sin(2 * jnp.pi * x / 4) * jnp.cos(2 * jnp.pi * y)
        vx = 0.3 + 0.05 * jnp.cos(2 * jnp.pi * x / 4)
        vy = -0.2 + 0.05 * jnp.sin(2 * jnp.pi * y)
        p = 1.0 + 0.1 * jnp.cos(2 * jnp.pi * y)
        return jnp.stack([rho * vx, rho * vy, rho,
                          p / (euler.GAMMA - 1.0) + 0.5 * rho * (vx**2 + vy**2)])

    for fam in ("Pk", "Qk"):
        basis = make_basis(fam, 2)
        u = ic.set_initial_condition(basis, mesh, smooth)
        for flx, tol in (("hllc", 1e-11), ("kfvs", 1e-7), ("lxf", 1e-11)):
            rx = make_rhs(basis, mesh, bcs, flux=flx)(u, 0.1)
            rf = make_rhs(basis, mesh, bcs, flux=flx,
                          volume_kernel="fused")(u, 0.1)
            rel = float(jnp.abs(rx - rf).max()) / float(jnp.abs(rx).max())
            assert rel < tol, (fam, flx, rel)


def test_mood_stage_rides_fused_kernel():
    """A single MOOD cascade stage with the fused Pk residual matches the
    XLA residual to roundoff — identical degree maps, counters, and
    candidate states (the BASELINE config-4 hot path; full-trajectory
    comparison is meaningless because the DMP thresholds of src/mood.cc:
    314-317 flip on last-bit rounding, which even XLA's own jit-vs-eager
    fusion differences trigger)."""
    from dflo_tpu.driver import LimiterConfig, Solver

    basis = make_basis("Pk", 2)
    mesh = CartesianMesh(128, 16, 0.0, 4.0, 0.0, 1.0)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 8.0 * 7.14471), jnp.full_like(x, -8.0 * 4.125),
         jnp.full_like(x, 8.0),
         jnp.full_like(x, 116.5 / (euler.GAMMA - 1.0)
                       + 0.5 * 8.0 * (7.14471**2 + 4.125**2))])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_FARFIELD, inflow))

    def dmr_ic(x, y, t=0.0):
        post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
        rho = jnp.where(post, 8.0, 1.4)
        vx = jnp.where(post, 7.14471, 0.0)
        vy = jnp.where(post, -4.125, 0.0)
        p = jnp.where(post, 116.5, 1.0)
        return jnp.stack([rho * vx, rho * vy, rho,
                          p / (euler.GAMMA - 1.0)
                          + 0.5 * rho * (vx**2 + vy**2)])

    lim = LimiterConfig(type="TVB", shock_indicator="density", beta=2.0,
                        char_lim=True, pos_lim=True)
    ss = {vk: Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.5,
                     method="mood", volume_kernel=vk)
          for vk in ("xla", "fused")}
    u = ss["xla"].post_stage(ic.set_initial_condition(basis, mesh, dmr_ic))
    dt = 2.4e-4
    cx, mx, sx = ss["xla"]._mood_stage(u, 0.0, dt)
    cf, mf, sf = ss["fused"]._mood_stage(u, 0.0, dt)
    assert int(jnp.sum(mx != mf)) == 0
    assert int(sx.n_reduce) == int(sf.n_reduce) and int(sx.n_reduce) > 0
    assert int(sx.iters) == int(sf.iters)
    rel = float(jnp.abs(cx - cf).max()) / float(jnp.abs(cx).max())
    assert rel < 1e-12, rel


def test_fused_residual_with_source_matches_xla():
    """Body forces ride the fused kernel: the in-kernel quadrature-point
    source (gravity src/equation.h:829-850; general f(x,y,t) external force
    src_mpi/equation.h:1186-1202) equals the XLA path's `area * Vw.T S`
    projection to roundoff — for the collocated Qk basis (where the baked
    projection operator is the identity) AND the modal Pk basis (dense
    minv.Vw^T), on periodic and physical BCs."""
    mesh = CartesianMesh(32, 16, 0.0, 2.0, 0.0, 1.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs_per = dict(W=per, E=per, S=per, N=per)
    bcs_phys = dict(W=BoundarySide(euler.BC_SLIP),
                    E=BoundarySide(euler.BC_SLIP),
                    S=BoundarySide(euler.BC_SLIP),
                    N=BoundarySide(euler.BC_SLIP))

    def grav(x, y, t, W):     # constant gravity, state-dependent
        return euler.forcing_gravity(W, (0.0, -0.1))

    def extf(x, y, t, W):     # space/time-dependent external force
        fx = 0.3 * jnp.sin(2.0 * jnp.pi * x) * jnp.cos(t)
        fy = -0.2 * y
        return euler.forcing_external(W, fx, fy)

    def smooth_ic(x, y, t=0.0):
        rho = 1.0 + 0.2 * jnp.exp(-((x - 1.0) ** 2 + (y - 0.5) ** 2) / 0.05)
        p = 1.0 + 0.1 * rho
        return jnp.stack([0.3 * rho, -0.1 * rho, rho,
                          p / (euler.GAMMA - 1.0)
                          + 0.5 * rho * (0.3**2 + 0.1**2)])

    for fam, deg in (("Qk", 2), ("Pk", 2)):
        basis = make_basis(fam, deg)
        u = ic.set_initial_condition(basis, mesh, smooth_ic)
        for bcs in (bcs_per, bcs_phys):
            for src in (grav, extf):
                rx = make_rhs(basis, mesh, bcs, flux="hllc",
                              source=src)(u, 0.37)
                rf = make_rhs(basis, mesh, bcs, flux="hllc", source=src,
                              volume_kernel="fused")(u, 0.37)
                rel = (float(jnp.abs(rx - rf).max())
                       / float(jnp.abs(rx).max()))
                assert rel < 1e-12, (fam, src.__name__, rel)


def test_solver_with_fused_kernel_and_gravity_matches_xla_steps():
    """Solver(volume_kernel='fused') with a body force (rayleigh_taylor's
    constant gravity, examples/rayleigh_taylor/input.prm) steps match the
    XLA solver: the in-kernel source keeps gravity runs on the production
    path instead of falling back."""
    from dflo_tpu.driver import LimiterConfig, Solver

    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(32, 96, -0.25, 0.25, -0.75, 0.75)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", shock_indicator="limiter", beta=1.0,
                        char_lim=False, pos_lim=True)

    def grav(x, y, t, W):
        return euler.forcing_gravity(W, (0.0, -0.1))

    def rt_ic(x, y, t=0.0):  # heavy-over-light with a velocity perturbation
        rho = jnp.where(y > 0.0, 2.0, 1.0)
        p = 2.5 - 0.1 * rho * y
        vy = 0.01 * (1.0 + jnp.cos(4.0 * jnp.pi * x)) \
            * (1.0 + jnp.cos(3.0 * jnp.pi * y)) / 4.0
        return jnp.stack([jnp.zeros_like(x), rho * vy, rho,
                          p / (euler.GAMMA - 1.0) + 0.5 * rho * vy**2])

    u0 = ic.set_initial_condition(basis, mesh, rt_ic)
    sx = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.4,
                source=grav)
    sf = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.4,
                source=grav, volume_kernel="fused")
    ux, uf = sx.post_stage(u0), sf.post_stage(u0)
    t = 0.0
    for _ in range(3):
        ux, dtx, _, _ = sx._step(ux, t, 1.0)
        uf, _, _, _ = sf._step(uf, t, 1.0)
        t += float(dtx)
    rel = float(jnp.abs(ux - uf).max()) / float(jnp.abs(ux).max())
    assert rel < 1e-11, rel


def test_fused_residual_well_balanced_isothermal():
    """Isothermal well-balanced gravity rides the fused kernel: matches the
    XLA scheme (src_gll/assemble_explicit.cc:30-135) on a perturbed state
    and preserves the hydrostatic equilibrium rho = e^{-phi/RT} to machine
    epsilon over RK steps."""
    from dflo_tpu.driver import Solver

    basis = make_basis("Qk_gll", 2)
    mesh = CartesianMesh(16, 16, 0.0, 1.0, 0.0, 1.0)
    pot = lambda x, y: x + y  # noqa: E731
    out = BoundarySide(euler.BC_OUTFLOW)
    bcs = dict(W=out, E=out, S=out, N=out)
    u0 = ic.set_initial_condition(basis, mesh, ic.isothermal_hydrostatic())

    # rhs equality on a perturbed (non-equilibrium) state
    upert = u0 * (1.0 + 1e-3 * jnp.sin(jnp.arange(u0.size)
                                       .reshape(u0.shape)))
    rx = make_rhs(basis, mesh, bcs, flux="lxf", well_balanced="isothermal",
                  potential=pot)(upert, 0.0)
    rf = make_rhs(basis, mesh, bcs, flux="lxf", well_balanced="isothermal",
                  potential=pot, volume_kernel="fused")(upert, 0.0)
    rel = float(jnp.abs(rx - rf).max()) / float(jnp.abs(rx).max())
    assert rel < 1e-12, rel

    # machine-eps preservation through the fused production step
    s = Solver(basis, mesh, bcs, flux="lxf", cfl=0.5,
               well_balanced="isothermal", potential=pot,
               volume_kernel="fused")
    u, t = u0, 0.0
    for _ in range(10):
        u, dt, bad, _ = s._step(u, t, 1e9)
        assert not bool(bad)
        t += float(dt)
    drift = float(jnp.abs(u - u0).max())
    assert drift < 5e-13, drift


def test_fused_pk_post_matches_xla_chain():
    """The fused Pk per-stage post (make_fused_pk_post, r5) matches the XLA
    chain it replaces in driver._mood_rk_step — mode-0 averages + modal TVB
    on marked cells (src/limiter.cc:376-516) + modal Zhang-Shu positivity —
    including the diag variant's (lam, minq), on a shocked state with
    characteristic limiting and both periodicity settings."""
    from dflo_tpu.ops.pallas_kernels import (make_fused_modal_pos,
                                             make_fused_pk_post)
    from dflo_tpu.stab.limiter import make_tvb_limiter

    basis = make_basis("Pk", 2)
    mesh = CartesianMesh(128, 16, 0.0, 4.0, 0.0, 1.0)
    dtype = jnp.zeros(0).dtype

    def dmr_ic(x, y, t=0.0):
        post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
        rho = jnp.where(post, 8.0, 1.4)
        vx = jnp.where(post, 7.14471, 0.0)
        vy = jnp.where(post, -4.125, 0.0)
        p = jnp.where(post, 116.5, 1.0)
        return jnp.stack([rho * vx, rho * vy, rho,
                          p / (euler.GAMMA - 1.0)
                          + 0.5 * rho * (vx**2 + vy**2)])

    u = ic.set_initial_condition(basis, mesh, dmr_ic)
    rng = np.random.default_rng(3)
    marked = jnp.asarray(rng.random((mesh.ny, mesh.nx)) < 0.3)

    for per_x, per_y, char_lim in ((False, False, True),
                                   (True, True, False)):
        limit = make_tvb_limiter(basis, mesh, M=0.0, beta=2.0,
                                 char_lim=char_lim, per_x=per_x, per_y=per_y,
                                 dtype=dtype)
        fmp = make_fused_modal_pos(basis, dtype, with_trunc=False)
        avg0 = float((basis.wq2 @ basis.V)[0])
        ubar = avg0 * u[:, 0]
        shock_x = jnp.where(marked, 1e20, 0.0)
        ref = fmp(limit(u, ubar, shock_x))

        post = make_fused_pk_post(basis, mesh, M=0.0, beta=2.0,
                                  char_lim=char_lim, per_x=per_x,
                                  per_y=per_y, dtype=dtype)
        shock_f = jnp.where(marked, 2.0, 0.0).astype(dtype)
        got = post(u, shock_f)
        np.testing.assert_allclose(np.array(got), np.array(ref),
                                   rtol=1e-12, atol=1e-13)

        post_d = make_fused_pk_post(basis, mesh, M=0.0, beta=2.0,
                                    char_lim=char_lim, per_x=per_x,
                                    per_y=per_y, dtype=dtype, with_diag=True)
        got_d, lam, minq = post_d(u, shock_f)
        np.testing.assert_allclose(np.array(got_d), np.array(ref),
                                   rtol=1e-12, atol=1e-13)
        # diag parity vs the standalone modal-pos diag kernel
        fmp_d = make_fused_modal_pos(basis, dtype, with_trunc=False,
                                     with_diag=True, mesh=mesh)
        _, lam_ref, minq_ref = fmp_d(ref)
        np.testing.assert_allclose(float(lam), float(lam_ref), rtol=1e-12)
        np.testing.assert_allclose(float(minq), float(minq_ref), rtol=1e-12)


def test_fused_modal_pos_diag_matches_composition():
    """ADVICE r4: the with_diag=True variant of make_fused_modal_pos must
    equal the composition {make_fused_modal_pos -> make_fused_diag} — same
    limited state, same (lam_max, minq) scalars."""
    from dflo_tpu.ops.pallas_kernels import (make_fused_diag,
                                             make_fused_modal_pos)

    basis = make_basis("Pk", 2)
    mesh = CartesianMesh(128, 16, 0.0, 4.0, 0.0, 1.0)
    dtype = jnp.zeros(0).dtype

    def dmr_ic(x, y, t=0.0):
        post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
        rho = jnp.where(post, 8.0, 1.4)
        p = jnp.where(post, 116.5, 1.0)
        return jnp.stack([rho * jnp.where(post, 7.14471, 0.0),
                          rho * jnp.where(post, -4.125, 0.0), rho,
                          p / (euler.GAMMA - 1.0)
                          + 0.5 * rho * jnp.where(post, 68.3, 0.0)])

    u = ic.set_initial_condition(basis, mesh, dmr_ic)
    f_plain = make_fused_modal_pos(basis, dtype, with_trunc=False)
    f_diag = make_fused_modal_pos(basis, dtype, with_trunc=False,
                                  with_diag=True, mesh=mesh)
    f_d = make_fused_diag(basis, mesh, dtype)

    ref = f_plain(u)
    got, lam, minq = f_diag(u)
    np.testing.assert_array_equal(np.array(got), np.array(ref))
    lam_ref, minq_ref = f_d(ref)
    np.testing.assert_allclose(float(lam), float(lam_ref), rtol=1e-12)
    np.testing.assert_allclose(float(minq), float(minq_ref), rtol=1e-12)

    # with_trunc=True variant against its composition too
    deg = jnp.asarray((np.arange(mesh.ny * mesh.nx).reshape(
        mesh.ny, mesh.nx) % 3), jnp.int32).clip(1, 2)
    f_t = make_fused_modal_pos(basis, dtype, with_trunc=True)
    f_td = make_fused_modal_pos(basis, dtype, with_trunc=True,
                                with_diag=True, mesh=mesh)
    ref_t = f_t(u, deg)
    got_t, lam_t, minq_t = f_td(u, deg)
    np.testing.assert_array_equal(np.array(got_t), np.array(ref_t))
    lam_tr, minq_tr = f_d(ref_t)
    np.testing.assert_allclose(float(lam_t), float(lam_tr), rtol=1e-12)
    np.testing.assert_allclose(float(minq_t), float(minq_tr), rtol=1e-12)


def test_fused_mood_check_matches_xla_bookkeeping():
    """make_fused_mood_check (r5) == the XLA DMP/u2/spread bookkeeping of
    stab.mood.check_update (apply_mood, src/mood.cc:290-491) on adversarial
    plane data, both periodic and non-periodic, over several chained
    passes."""
    from dflo_tpu.ops.pallas_kernels import make_fused_mood_check
    from dflo_tpu.stab import mood as mood_mod
    from dflo_tpu.stab.limiter import neighbor_valid

    basis = make_basis("Pk", 2)
    p = basis.degree
    mesh = CartesianMesh(256, 16, 0.0, 4.0, 0.0, 1.0)
    ny, nx = mesh.ny, mesh.nx
    avg0 = float((basis.wq2 @ basis.V)[0])
    rng = np.random.default_rng(7)

    for per in (False, True):
        valid = tuple(jnp.asarray(v) for v in
                      neighbor_valid((ny, nx), per, per, None))
        if per:
            nb_min = lambda a: mood_mod.neighborhood_min(a, valid)  # noqa
            nb_max = lambda a: mood_mod.neighborhood_max(a, valid)  # noqa
            dil = mood_mod.dilate4
        else:
            nb_min, nb_max = mood_mod.plus_min, mood_mod.plus_max
            dil = mood_mod.dilate4_window

        def xla_check(cand3, dmn, dmx, deg, lim):
            rho = avg0 * cand3[0]
            dmp = (rho - dmn > -mood_mod.DMP_EPS) & \
                  (rho - dmx < mood_mod.DMP_EPS)
            ok = jnp.ones((ny, nx), bool)
            for pi in (1, 2):
                D2 = cand3[pi]
                mn, mx = nb_min(D2), nb_max(D2)
                amn, amx = jnp.abs(mn), jnp.abs(mx)
                flat = jnp.maximum(amn, amx) < mood_mod.U2_TINY
                ok = ok & (flat | ((mn * mx >= 0)
                                   & (amn >= amx * (1.0 - mood_mod.U2_EPS))))
            fail = ~(dmp | ok)
            red_self = fail & (deg > 1)
            mark_self = fail & (deg == 1) & ~lim
            spread = fail & (deg == 1) & lim
            nb = dil(spread)
            red_nb = nb & (deg > 1) & ~red_self
            mark_nb = nb & (deg == 1) & ~lim & ~mark_self
            deg_new = deg - (red_self | red_nb).astype(deg.dtype)
            lim_new = lim | mark_self | mark_nb
            return deg_new, lim_new, red_self | red_nb

        fused = make_fused_mood_check(basis, mesh, per_x=per, per_y=per,
                                      dtype=jnp.zeros(0).dtype)

        # adversarial planes: smooth base + discontinuities + exact zeros
        # (flat-curvature guard) + sign flips near boundaries
        x = np.linspace(0, 4, nx)[None, :] * np.ones((ny, 1))
        y = np.linspace(0, 1, ny)[:, None] * np.ones((1, nx))
        rho0 = 1.0 + 0.5 * np.sin(3 * x) + (x + y < 2.0) * 2.0
        D2a = 0.02 * np.sin(9 * x * y) * (rng.random((ny, nx)) < 0.8)
        D2b = 0.02 * np.cos(7 * (x - y)) * (rng.random((ny, nx)) < 0.8)
        cand3 = jnp.asarray(np.stack([rho0 / avg0, D2a, D2b]))
        rho_pl = avg0 * cand3[0]
        dmn = nb_min(rho_pl) * (1 + 1e-7)     # tight bounds -> many fails
        dmx = nb_max(rho_pl) * (1 - 1e-7)
        deg = jnp.asarray(rng.integers(1, p + 1, (ny, nx)), jnp.int32)
        lim = jnp.asarray(rng.random((ny, nx)) < 0.4)

        for it in range(3):     # chain passes so spread/marks interact
            ref = xla_check(cand3, dmn, dmx, deg, lim)
            got = fused(cand3, dmn, dmx, deg, lim)
            for g, r, name in zip(got, ref, ("deg", "lim", "chg")):
                np.testing.assert_array_equal(
                    np.array(g), np.array(r),
                    err_msg=f"per={per} it={it} field={name}")
            deg, lim = got[0], got[1]
            cand3 = cand3 * (1.0 + 0.01 * it)     # perturb for next pass
