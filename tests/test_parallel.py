"""Multi-device equality tests — the TPU analog of the reference's
serial-vs-MPI cross-check (SURVEY.md §4e): the same problem on 1 device and
on an 8-device mesh must agree to roundoff.  Runs on the virtual CPU device
mesh (conftest forces 8 CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflo_tpu import ic
from dflo_tpu.driver import LimiterConfig, Solver
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.parallel import device_mesh, shard_state
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide

# interpret-mode/virtual-device emulation dominates CPU wall time: the
# quick dev tier skips this file (pytest.ini 'heavy'); the full suite runs it
pytestmark = pytest.mark.heavy


def sod_ic(x, y, t=0.0):
    rho = jnp.where(x <= 0.5, 1.0, 0.125)
    E = jnp.where(x <= 0.5, 2.5, 0.25)
    z = jnp.zeros_like(x)
    return jnp.stack([z, z, rho, E])


def test_device_mesh_factorization():
    m = device_mesh()
    assert m.devices.size == len(jax.devices())
    assert m.axis_names == ("dy", "dx")


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_vortex_1_vs_8_devices(shape):
    """Smooth periodic run: single-device vs sharded results identical."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(32, 32, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u0 = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())

    s1 = Solver(basis, mesh, bcs, flux="roe", cfl=0.5)
    u1, t1, _ = s1.run(u0, 0.1)

    dm = device_mesh(shape)
    sN = Solver(basis, mesh, bcs, flux="roe", cfl=0.5, device_mesh=dm)
    uN, tN, _ = sN.run(shard_state(u0, dm), 0.1)
    assert len(uN.sharding.device_set) == 8

    np.testing.assert_allclose(np.array(uN), np.array(u1),
                               rtol=1e-12, atol=1e-12)
    assert t1 == tN


def dmr_ic(x, y, t=0.0):
    """Double-Mach-reflection Mach-10 oblique shock
    (examples/double_mach_reflection/input.prm)."""
    post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
    rho = jnp.where(post, 8.0, 1.4)
    vx = jnp.where(post, 7.14471, 0.0)
    vy = jnp.where(post, -4.125, 0.0)
    p = jnp.where(post, 116.5, 1.0)
    return jnp.stack([rho * vx, rho * vy, rho,
                      p / (euler.GAMMA - 1.0) + 0.5 * rho * (vx**2 + vy**2)])


def _dmr_solver(device_mesh=None):
    """double_mach Q2 Pk + MOOD cascade, the sharded BASELINE config 4."""
    basis = make_basis("Pk", 2)
    mesh = CartesianMesh(48, 16, 0.0, 3.0, 0.0, 1.0)
    inflow = lambda x, y, t: dmr_ic(x, y, t)  # noqa: E731
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_FARFIELD, inflow))
    lim = LimiterConfig(type="TVB", shock_indicator="limiter", beta=2.0,
                        char_lim=True, pos_lim=True)
    return basis, mesh, Solver(basis, mesh, bcs, flux="hllc", limiter=lim,
                               cfl=0.5, method="mood",
                               device_mesh=device_mesh)


def test_double_mach_mood_stage_partition_invariant():
    """The MOOD cascade (while_loop + DMP neighborhood rolls + u2 exemption
    + positivity-relimited candidates) evaluated on a sharded state must give
    the 1-device result to roundoff — the TPU analog of the reference's
    per-cell determinism under MPI partitioning (src_mpi/claw.cc:59-76)."""
    basis, mesh, s1 = _dmr_solver()
    dm = device_mesh((2, 4))
    _, _, sN = _dmr_solver(device_mesh=dm)
    u0 = s1.post_stage(ic.set_initial_condition(basis, mesh, dmr_ic))
    c1, m1, _ = s1._mood_stage(u0, 0.0, 3.0e-4)
    cN, mN, _ = sN._mood_stage(shard_state(u0, dm), 0.0, 3.0e-4)
    assert int((m1 != mN).sum()) == 0
    np.testing.assert_allclose(np.array(cN), np.array(c1),
                               rtol=1e-12, atol=1e-12)


def test_double_mach_mood_1_vs_8_devices():
    """BASELINE config 4: double_mach Q2 with the MOOD cascade, elements
    sharded over a (2,4) device mesh, run end-to-end.

    Bitwise cross-partition parity is NOT attainable for the full run: the
    1- and 8-device jitted steps are different XLA programs whose fusion
    differences perturb values at ~1e-15, and the cascade's discrete
    accept/reduce decisions amplify any perturbation through the chaotic
    Mach-10 flow (the reference's serial-vs-MPI check is bitwise only
    because deal.II executes the identical per-cell FP stream on every
    partitioning).  The stage-level test above pins the strict invariance;
    here we assert the physically meaningful agreement: identical step
    count/time (dt decisions match), positivity everywhere, and
    cell-average density agreement to ~0.1% in L1."""
    basis, mesh, s1 = _dmr_solver()
    u0 = ic.set_initial_condition(basis, mesh, dmr_ic)
    u1, t1, it1 = s1.run(u0, 0.01)
    assert it1 > 1

    dm = device_mesh((2, 4))
    _, _, sN = _dmr_solver(device_mesh=dm)
    uN, tN, itN = sN.run(shard_state(u0, dm), 0.01)
    assert len(uN.sharding.device_set) == 8
    assert (t1, it1) == (tN, itN)

    a1 = np.array(s1.cell_averages(u1))
    aN = np.array(sN.cell_averages(uN))
    assert np.isfinite(aN).all()
    assert aN[euler.RHO].min() > 0.0
    rho_scale = np.abs(a1[euler.RHO]).mean()
    assert np.abs(a1 - aN)[euler.RHO].mean() < 0.005 * rho_scale


def test_sod_limited_1_vs_8_devices():
    """Shock-limited run (indicator + TVB + positivity all active): the full
    stabilization chain must also be partition-invariant."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(64, 8, 0.0, 1.0, 0.0, 0.125)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", shock_indicator="density", beta=2.0,
                        char_lim=True, pos_lim=True)
    u0 = ic.set_initial_condition(basis, mesh, sod_ic)

    s1 = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.9)
    u1, _, _ = s1.run(u0, 0.1)

    dm = device_mesh((2, 4))
    sN = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.9,
                device_mesh=dm)
    uN, _, _ = sN.run(shard_state(u0, dm), 0.1)

    np.testing.assert_allclose(np.array(uN), np.array(u1),
                               rtol=1e-11, atol=1e-11)


def test_fused_rhs_sharded_matches_xla_periodic():
    """shard_map'd fused residual (ppermute halo strips) == global XLA rhs
    on a fully periodic vortex: every device seam correction must degenerate
    to the true wrap flux (SURVEY §5.8 comms design, VERDICT r2 item 2)."""
    from dflo_tpu.solver.spatial import make_rhs

    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(32, 16, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u0 = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())

    rhs_x = make_rhs(basis, mesh, bcs, flux="hllc")
    dm = device_mesh((2, 4))
    rhs_s = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused",
                     device_mesh=dm)
    r_ref = np.array(rhs_x(u0, 0.0))
    r_shd = np.array(rhs_s(shard_state(u0, dm), 0.0))
    np.testing.assert_allclose(r_shd, r_ref, rtol=1e-11, atol=1e-11)


def test_fused_stage_sharded_matches_xla_bcs():
    """Sharded fused SSP stage with non-periodic segmented boundaries: the
    per-device delta strips select BC flux at global edges (dynamic-sliced
    face coordinates) and ppermuted neighbor traces at interior seams."""
    from dflo_tpu.solver.spatial import make_rhs

    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(48, 16, 0.0, 3.0, 0.0, 1.0)
    inflow = lambda x, y, t: dmr_ic(x, y, t)  # noqa: E731
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_FARFIELD, inflow))
    u0 = ic.set_initial_condition(basis, mesh, dmr_ic)

    rhs_x = make_rhs(basis, mesh, bcs, flux="hllc")
    rhs_f1 = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused")
    dm = device_mesh((2, 4))
    rhs_s = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused",
                     device_mesh=dm)
    r_ref = np.array(rhs_x(u0, 0.1))
    r_f1 = np.array(rhs_f1(u0, 0.1))
    r_shd = np.array(rhs_s(shard_state(u0, dm), 0.1))
    scale = np.abs(r_ref).max()          # DMR fluxes reach ~2e5; the fused
    # path's reassociated contractions sit ~1e-10 relative to that scale
    # (same deviation the single-device fused kernel shows vs XLA)
    assert np.abs(r_shd - r_ref).max() / scale < 1e-9
    assert np.abs(r_shd - r_f1).max() / scale < 1e-9
    # the fused blend stage a*u_old + (1-a)*(u + dt*R)
    dt, a = 1e-4, 0.75
    ref = np.array(a * u0 + (1.0 - a) * (u0 + dt * rhs_x(u0, 0.0)))
    got = np.array(rhs_s.stage(shard_state(u0, dm), shard_state(u0, dm),
                               0.0, a, dt))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-9


def test_fused_sharded_solver_end_to_end():
    """Solver(volume_kernel='fused', device_mesh=...) runs a limited shock
    problem end-to-end and matches the single-device FUSED solver.

    The comparison is fused-vs-fused: per-evaluation seam handling agrees
    to ~1e-16 (pinned at 1e-11 by the rhs-level tests above), but a shock
    trajectory amplifies roundoff through discrete limiter/indicator
    thresholds, so the end-to-end tolerance is the amplified one.  The
    step count and final time must match exactly (same dt sequence)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(128, 16, 0.0, 1.0, 0.0, 0.125)
    bcs = dict(W=BoundarySide(euler.BC_OUTFLOW), E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP), N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", shock_indicator="density", beta=2.0,
                        char_lim=True, pos_lim=True)
    u0 = ic.set_initial_condition(basis, mesh, sod_ic)

    s1 = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.5,
                volume_kernel="fused")
    u1, t1, it1 = s1.run(u0, 0.02)

    dm = device_mesh((2, 4))
    sN = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.5,
                device_mesh=dm, volume_kernel="fused")
    uN, tN, itN = sN.run(shard_state(u0, dm), 0.02)
    assert (t1, it1) == (tN, itN)
    a1, aN = np.array(u1), np.array(uN)
    # pointwise-roundoff equality is unattainable BY DESIGN here: the
    # sharded kernel's seam arithmetic (block-wrap flux + ppermuted delta)
    # reassociates f64 operations, and one flipped indicator/minmod
    # threshold at the shock turns ~1e-16 into an O(1e-3) local difference
    # over the ~50-step trajectory.  Assert physical closeness (small L1,
    # bounded max) — the strict per-evaluation equality is pinned at 1e-11
    # by the rhs-level tests above, and the short-horizon check below
    # catches any systematic seam error before a threshold can flip.
    l1 = np.abs(aN - a1).mean() / np.abs(a1).mean()
    assert l1 < 2e-5, l1
    assert np.abs(aN - a1).max() < 0.05
    # --- short horizon: strict ------------------------------------------
    us, uss = u0, shard_state(u0, dm)
    t = jnp.zeros(())
    for _ in range(5):
        us, dt1, _, _ = s1._step(us, t, jnp.asarray(1.0))
        uss, dtN, _, _ = sN._step(uss, t, jnp.asarray(1.0))
        assert float(dt1) == float(dtN)
        t = t + dt1
    np.testing.assert_allclose(np.array(uss), np.array(us),
                               rtol=1e-10, atol=1e-10)


# ---------------------------------------------------------------------------
# Multi-slice (DCN) meshes: the ('slice', 'dy', 'dx') 3-D device mesh folds
# the slice axis into the y decomposition, so the only cross-slice traffic
# is the adjacent-band halo row (parallel/sharding.py).  Real DCN wiring is
# untestable here; these validate the collective pattern on the virtual
# mesh: the 3-axis program must equal single-device results exactly.
# ---------------------------------------------------------------------------


def test_multislice_mesh_layout():
    from dflo_tpu.parallel import (device_mesh_multislice, mesh_grid_shape,
                                   mesh_y_axes)
    dm = device_mesh_multislice(2)
    assert dm.axis_names == ("slice", "dy", "dx")
    assert dm.devices.shape == (2, 2, 2)
    assert mesh_grid_shape(dm) == (4, 2)
    assert mesh_y_axes(dm) == ("slice", "dy")
    with pytest.raises(ValueError):
        device_mesh_multislice(3)
    dm2 = device_mesh_multislice(4, shape=(1, 2))
    assert dm2.devices.shape == (4, 1, 2)
    assert mesh_grid_shape(dm2) == (4, 2)


def test_vortex_1_vs_multislice_gspmd():
    """GSPMD (XLA) path on a 2-slice x 2x2 mesh == single device."""
    from dflo_tpu.parallel import device_mesh_multislice
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(32, 32, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u0 = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())

    s1 = Solver(basis, mesh, bcs, flux="roe", cfl=0.5)
    u1, t1, _ = s1.run(u0, 0.1)

    dm = device_mesh_multislice(2)
    sN = Solver(basis, mesh, bcs, flux="roe", cfl=0.5, device_mesh=dm)
    uN, tN, _ = sN.run(shard_state(u0, dm), 0.1)
    assert len(uN.sharding.device_set) == 8
    np.testing.assert_allclose(np.array(uN), np.array(u1),
                               rtol=1e-12, atol=1e-12)
    assert t1 == tN


def test_fused_rhs_multislice_matches_xla():
    """shard_map'd fused residual over ('slice','dy','dx'): the y halo
    ppermute addresses the FOLDED ('slice','dy') axis — one face-trace row
    between adjacent bands is the only cross-slice transfer."""
    from dflo_tpu.parallel import device_mesh_multislice
    from dflo_tpu.solver.spatial import make_rhs

    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(32, 16, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u0 = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())

    rhs_x = make_rhs(basis, mesh, bcs, flux="hllc")
    dm = device_mesh_multislice(2, shape=(2, 2))      # (DY, DX) = (4, 2)
    rhs_s = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused",
                     device_mesh=dm)
    r_ref = np.array(rhs_x(u0, 0.0))
    r_shd = np.array(rhs_s(shard_state(u0, dm), 0.0))
    np.testing.assert_allclose(r_shd, r_ref, rtol=1e-11, atol=1e-11)


def test_fused_solver_multislice_end_to_end():
    """Fused Solver over the 3-axis mesh: identical dt sequence and
    roundoff-level state agreement with the single-device fused solver on
    a short Sod horizon (strict window, before thresholds can flip)."""
    from dflo_tpu.parallel import device_mesh_multislice
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(128, 16, 0.0, 1.0, 0.0, 0.125)
    bcs = dict(W=BoundarySide(euler.BC_OUTFLOW),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP), N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", shock_indicator="density", beta=2.0,
                        char_lim=True, pos_lim=True)
    u0 = ic.set_initial_condition(basis, mesh, sod_ic)

    s1 = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.5,
                volume_kernel="fused")
    dm = device_mesh_multislice(2, shape=(2, 2))
    sN = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.5,
                device_mesh=dm, volume_kernel="fused")
    us, uss = u0, shard_state(u0, dm)
    t = jnp.zeros(())
    for _ in range(5):
        us, dt1, _, _ = s1._step(us, t, jnp.asarray(1.0))
        uss, dtN, _, _ = sN._step(uss, t, jnp.asarray(1.0))
        assert float(dt1) == float(dtN)
        t = t + dt1
    assert len(uss.sharding.device_set) == 8
    np.testing.assert_allclose(np.array(uss), np.array(us),
                               rtol=1e-10, atol=1e-10)


def test_mood_fused_sharded_end_to_end():
    """Sharded MOOD with volume_kernel='fused': the shard_map'd fused rhs
    AND the shard_map-wrapped fused modal trunc+positivity kernel — must
    match the single-device fused MOOD solver.

    The IC is a tanh-SMOOTHED Mach-10 shock, not the sharp DMR jump: with
    piecewise-constant data the u2 exemption's flat test compares exact-zero
    curvatures against U2_TINY, and the fused seam arithmetic's 1e-13
    reassociation noise flips those ties (a decision difference, not a seam
    error).  Smoothed data keeps every cascade decision O(1) away from its
    threshold, so 3 steps must agree to roundoff while the cascade fires."""
    basis, mesh, s1 = _dmr_mood_solver(volume_kernel="fused")
    dm = device_mesh((2, 4))
    _, _, sN = _dmr_mood_solver(device_mesh=dm, volume_kernel="fused")
    assert sN._fused_modal_pos is not None
    u0 = ic.set_initial_condition(basis, mesh, _smooth_mach10_ic)
    us, uss = u0, shard_state(u0, dm)
    t = jnp.zeros(())
    fired = 0
    for _ in range(3):
        us, dt1, _, st1 = s1._step(us, t, jnp.asarray(1.0))
        uss, dtN, _, stN = sN._step(uss, t, jnp.asarray(1.0))
        np.testing.assert_allclose(float(dtN), float(dt1), rtol=1e-12)
        assert int(st1.n_reduce) == int(stN.n_reduce)
        fired += int(st1.n_reduce)
        t = t + dt1
    assert fired > 0                       # the cascade actually fired
    assert len(uss.sharding.device_set) == 8
    np.testing.assert_allclose(np.array(uss), np.array(us),
                               rtol=1e-9, atol=1e-11)


def _smooth_mach10_ic(x, y, t=0.0):
    """Mach-10 oblique front smoothed over ~2 cells: steep enough to drive
    the MOOD cascade, smooth enough that no cascade decision sits at a
    roundoff tie."""
    s = 0.5 * (1.0 - jnp.tanh((x - 1.0 / 6.0 - y / jnp.sqrt(3.0)) / 0.1))
    rho = 1.4 + (8.0 - 1.4) * s
    vx = 7.14471 * s
    vy = -4.125 * s
    p = 1.0 + (116.5 - 1.0) * s
    return jnp.stack([rho * vx, rho * vy, rho,
                      p / (euler.GAMMA - 1.0) + 0.5 * rho * (vx**2 + vy**2)])
def _dmr_mood_solver(device_mesh=None, **kw):
    """DMR Q2 Pk MOOD on tile-size-free shapes (fused kernels use full-array
    blocks on CPU interpret mode)."""
    basis = make_basis("Pk", 2)
    mesh = CartesianMesh(64, 16, 0.0, 3.0, 0.0, 1.0)
    inflow = lambda x, y, t: dmr_ic(x, y, t)  # noqa: E731
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_FARFIELD, inflow))
    lim = LimiterConfig(type="TVB", shock_indicator="limiter", beta=2.0,
                        char_lim=True, pos_lim=True)
    return basis, mesh, Solver(basis, mesh, bcs, flux="hllc", limiter=lim,
                               cfl=0.5, method="mood",
                               device_mesh=device_mesh, **kw)


def test_fused_rhs_sharded_with_body_force_matches_xla():
    """Sharded fused residual with a body force: the device-local coordinate
    slices feed the in-kernel source (gravity + a space/time-dependent
    external force, src_mpi/equation.h:1186-1202) and match the global XLA
    rhs on a (2, 4) mesh."""
    from dflo_tpu.solver.spatial import make_rhs

    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(32, 16, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u0 = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())

    def src(x, y, t, W):
        fx = 0.05 * jnp.sin(0.4 * x) * jnp.cos(t)
        fy = -0.03 * y + 0.1
        return euler.forcing_external(W, fx, fy)

    rhs_x = make_rhs(basis, mesh, bcs, flux="hllc", source=src)
    dm = device_mesh((2, 4))
    rhs_s = make_rhs(basis, mesh, bcs, flux="hllc", source=src,
                     volume_kernel="fused", device_mesh=dm)
    r_ref = np.array(rhs_x(u0, 0.7))
    r_shd = np.array(rhs_s(shard_state(u0, dm), 0.7))
    np.testing.assert_allclose(r_shd, r_ref, rtol=1e-11, atol=1e-11)


# ---------------------------------------------------------------------------
# Sharded fused stabilization chain (make_fused_post_sharded): per-device
# VMEM post kernel + ppermuted neighbor face-trace/average packs over the
# mesh — the stabilization counterpart of the sharded fused residual
# (replaces update_ghost_values before the limiter sweep,
# src_mpi/claw.cc:793, src_mpi/limiter.cc:397-555).
# ---------------------------------------------------------------------------


def _smooth_sod_ic(x, y, t=0.0):
    """Tanh-smoothed Sod profile: steep enough to mark cells and engage the
    limiter decisively, smooth enough that no minmod/indicator decision sits
    at a roundoff tie (the sharded packs reassociate f64 sums ~1e-16)."""
    s = 0.5 * (1.0 - jnp.tanh((x - 0.5) / 0.004))
    rho = 0.125 + (1.0 - 0.125) * s
    p = 0.1 + (1.0 - 0.1) * s
    vx = 0.4 * jnp.sin(6.0 * x) * (1.0 - s)
    return jnp.stack([rho * vx, jnp.zeros_like(x), rho,
                      p / (euler.GAMMA - 1.0) + 0.5 * rho * vx**2])


@pytest.mark.parametrize("shape", [(2, 4), (1, 8)])
def test_fused_post_sharded_matches_single(shape):
    """Sharded fused post == single-chip fused post (and the XLA chain) on
    a non-periodic shock profile: every device-edge neighbor average/trace
    must arrive bit-consistently through the ppermuted packs."""
    from dflo_tpu.ops.pallas_kernels import (make_fused_post,
                                             make_fused_post_sharded)
    basis = make_basis("Qk", 2)
    # per-device blocks must be (8, 128)-tile aligned (the r4 envelope the
    # sharded kernel enforces): 1024x16 gives lx=256/ly=8 on (2,4) and
    # lx=128/ly=16 on (1,8)
    # domain stretched with the cell count so dx (and the tanh-front
    # steepness in cells) matches the original 256-cell configuration
    mesh = CartesianMesh(1024, 16, 0.0, 4.0, 0.0, 0.125)
    u0 = ic.set_initial_condition(basis, mesh, _smooth_sod_ic)
    kw = dict(indicator="density", M=0.0, beta=2.0, char_lim=True,
              pos_lim=True, dtype=u0.dtype, with_diag=True)
    f1 = make_fused_post(basis, mesh, per_x=False, per_y=False, **kw)
    dm = device_mesh(shape)
    fN = make_fused_post_sharded(basis, mesh, dm, per_x=False, per_y=False,
                                 **kw)
    u1, lam1, mq1 = f1(u0)
    uN, lamN, mqN = fN(shard_state(u0, dm))
    assert len(uN.sharding.device_set) == 8
    # the chain must actually do work on this state
    assert np.abs(np.array(u1) - np.array(u0)).max() > 1e-8
    np.testing.assert_allclose(np.array(uN), np.array(u1),
                               rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(float(lamN), float(lam1), rtol=1e-12)
    np.testing.assert_allclose(float(mqN), float(mq1), rtol=1e-12)


def test_fused_post_sharded_periodic_and_multislice():
    """Fully periodic seams ride the wrap ppermutes (a 1-device axis
    degenerates to a self-send); the 3-axis multi-slice mesh addresses the
    folded ('slice','dy') axis in its y ppermute."""
    from dflo_tpu.ops.pallas_kernels import (make_fused_post,
                                             make_fused_post_sharded)
    from dflo_tpu.parallel import device_mesh_multislice

    def bumpy_vortex(x, y, t=0.0):
        u = ic.isentropic_vortex()(x, y, t)
        s = 0.5 * (1.0 - jnp.tanh((x + y) / 0.2))
        return u.at[euler.RHO].mul(1.0 + 0.5 * s).at[euler.ENE].mul(
            1.0 + 0.8 * s)

    basis = make_basis("Qk", 2)
    # tile-aligned per-device blocks: (2,4) -> 16x128, multislice 2x(2,2)
    # -> 8x256 (the envelope the sharded kernel enforces)
    mesh = CartesianMesh(512, 32, -5.0, 5.0, -5.0, 5.0)
    u0 = ic.set_initial_condition(basis, mesh, bumpy_vortex)
    # mark-all indicator: the TVB minmod consumes neighbor averages in
    # EVERY cell, so every seam pack is load-bearing
    kw = dict(indicator="limiter", M=0.0, beta=2.0, char_lim=True,
              pos_lim=True, dtype=u0.dtype, with_diag=False)
    f1 = make_fused_post(basis, mesh, per_x=True, per_y=True, **kw)
    u1 = np.array(f1(u0))
    assert np.abs(u1 - np.array(u0)).max() > 1e-8
    for dm in (device_mesh((2, 4)),
               device_mesh_multislice(2, shape=(2, 2))):
        fN = make_fused_post_sharded(basis, mesh, dm, per_x=True,
                                     per_y=True, **kw)
        uN = fN(shard_state(u0, dm))
        np.testing.assert_allclose(np.array(uN), u1,
                                   rtol=1e-11, atol=1e-12)


def test_fused_post_sharded_solver_end_to_end():
    """Solver(volume_kernel='fused', post_kernel='fused', device_mesh=...):
    the FULL sharded fused production step {residual + blend kernel, post
    chain kernel, sharded diag} matches the single-device fused solver over
    a strict short Sod window (same dt sequence, roundoff state equality)."""
    from dflo_tpu.ops.pallas_kernels import make_fused_diag_sharded
    basis = make_basis("Qk", 2)
    # (2,4) device mesh -> 8x128 per-device blocks (tile-aligned envelope)
    mesh = CartesianMesh(512, 16, 0.0, 1.0, 0.0, 0.125)
    bcs = dict(W=BoundarySide(euler.BC_OUTFLOW),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP), N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", shock_indicator="density", beta=2.0,
                        char_lim=True, pos_lim=True)
    u0 = ic.set_initial_condition(basis, mesh, _smooth_sod_ic)

    s1 = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.5,
                volume_kernel="fused", post_kernel="fused")
    dm = device_mesh((2, 4))
    sN = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.5,
                device_mesh=dm, volume_kernel="fused", post_kernel="fused")
    assert sN._fused_post is not None and sN._post_diag
    # the sharded diag pairs with the sharded post for the carry-lam loop
    sN._fused_diag = make_fused_diag_sharded(basis, mesh, dm, u0.dtype)
    us, uss = u0, shard_state(u0, dm)
    t = jnp.zeros(())
    for _ in range(5):
        us, dt1, bad1, _ = s1._step(us, t, jnp.asarray(1.0))
        uss, dtN, badN, _ = sN._step(uss, t, jnp.asarray(1.0))
        assert float(dt1) == float(dtN)
        assert not bool(bad1) and not bool(badN)
        t = t + dt1
    assert len(uss.sharding.device_set) == 8
    np.testing.assert_allclose(np.array(uss), np.array(us),
                               rtol=1e-10, atol=1e-11)
    # sharded fused diag: lam matches the XLA CFL formula on the same state
    lamN, mqN = sN._fused_diag(uss)
    from dflo_tpu.solver import rk as rk_mod
    dt_x = rk_mod.compute_dt(s1.cell_averages(us), mesh, basis.degree, 0.5)
    dt_f = 0.5 / lamN / (2.0 * basis.degree + 1.0)
    np.testing.assert_allclose(float(dt_f), float(dt_x), rtol=1e-11)
    assert float(mqN) > 0.0
