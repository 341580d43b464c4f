"""Fused kernels on ragged (non-tile-aligned) shapes and masked domains.

The shipped reference configs are NOT tile-aligned — sod is 100x10 cells
(examples/sod_shock_tube/tube.geo), double_mach is 401x100
(examples/double_mach_reflection/grid.geo) — so the production kernels must
ride arbitrary shapes: a ragged nx becomes one full-width lane tile and a
ragged ny gains internal solid pad rows (ops/pallas_kernels._pad_y), with
the true boundary/periodic fluxes arriving as delta strips targeted by
GLOBAL row index.  Interpret mode on CPU exercises the identical kernel
code; scripts/tpu_selfcheck.py re-checks the Mosaic-compiled lowering.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dflo_tpu import ic
from dflo_tpu.driver import LimiterConfig, Solver
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, make_rhs

# interpret-mode/virtual-device emulation dominates CPU wall time: the
# quick dev tier skips this file (pytest.ini 'heavy'); the full suite runs it
pytestmark = pytest.mark.heavy


def dmr_ic(x, y, t=0.0):
    post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
    rho = jnp.where(post, 8.0, 1.4)
    vx = jnp.where(post, 7.14471, 0.0)
    vy = jnp.where(post, -4.125, 0.0)
    p = jnp.where(post, 116.5, 1.0)
    return jnp.stack([rho * vx, rho * vy, rho,
                      p / (euler.GAMMA - 1.0) + 0.5 * rho * (vx**2 + vy**2)])


def _dmr_bcs():
    return dict(W=BoundarySide(euler.BC_INFLOW, dmr_ic),
                E=BoundarySide(euler.BC_OUTFLOW),
                S=BoundarySide(euler.BC_SLIP),
                N=BoundarySide(euler.BC_FARFIELD, dmr_ic))


def _rel(a, b):
    return (float(jnp.abs(a - b).max())
            / (float(jnp.abs(b).max()) + 1e-300))


@pytest.mark.parametrize("nx,ny", [(100, 10),   # sod's shipped resolution
                                   (97, 20),    # ragged in both directions
                                   (130, 12)])  # >128 ragged lanes
@pytest.mark.parametrize("fam", ["Qk", "Pk"])
def test_fused_residual_ragged_matches_xla(nx, ny, fam):
    basis = make_basis(fam, 2)
    mesh = CartesianMesh(nx, ny, 0.0, 4.0, 0.0, 1.0)
    bcs = _dmr_bcs()
    u = ic.set_initial_condition(basis, mesh, dmr_ic)
    rx = make_rhs(basis, mesh, bcs, flux="hllc")(u, 0.1)
    rf = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused")(u, 0.1)
    assert _rel(rf, rx) < 1e-10


def test_fused_residual_ragged_periodic_y():
    """Ragged ny + periodic y: the pad rows force wall-mirror wrap fluxes
    in-kernel, corrected to the TRUE periodic flux by always-on y strips."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(64, 12, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u = ic.set_initial_condition(basis, mesh,
                                 ic.isentropic_vortex(5.0, 0.0, 0.0))
    rx = make_rhs(basis, mesh, bcs, flux="hllc")(u, 0.0)
    rf = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused")(u, 0.0)
    assert _rel(rf, rx) < 1e-10


def test_fused_stage_ragged_matches_xla():
    """The in-kernel SSP blend on a padded state (pad rows ride along and
    are sliced off)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(100, 10, 0.0, 4.0, 0.0, 1.0)
    bcs = _dmr_bcs()
    u = ic.set_initial_condition(basis, mesh, dmr_ic)
    rx = make_rhs(basis, mesh, bcs, flux="hllc")
    rf = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused")
    a, dt = 0.3, 1e-4
    got = rf.stage(u, u, 0.1, a, dt)
    ref = a * u + (1 - a) * (u + dt * rx(u, 0.1))
    assert _rel(got, ref) < 1e-10


def _step_mask(nx, ny):
    """forward_step-style solid block in the lower-right quadrant."""
    m = np.ones((ny, nx), bool)
    m[: ny // 2, 3 * nx // 5:] = False
    return m


def test_fused_residual_masked_ragged_matches_xla():
    basis = make_basis("Qk", 2)
    nx, ny = 100, 20
    mesh = CartesianMesh(nx, ny, 0.0, 3.0, 0.0, 1.0)
    mask = _step_mask(nx, ny)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 1.4 * 3.0), jnp.zeros_like(x),
         jnp.full_like(x, 1.4),
         jnp.full_like(x, 1.0 / (euler.GAMMA - 1.0) + 0.5 * 1.4 * 9.0)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    u = ic.set_initial_condition(basis, mesh, inflow)
    rx = make_rhs(basis, mesh, bcs, flux="hllc", mask=mask)(u, 0.0)
    rf = make_rhs(basis, mesh, bcs, flux="hllc", mask=mask,
                  volume_kernel="fused")(u, 0.0)
    assert _rel(rf, rx) < 1e-10


def test_fused_post_ragged_and_masked_matches_xla_chain():
    """Fused post chain with the static neighbor-valid flag plane: masked
    domain + ragged ny vs the XLA {indicator -> TVB -> positivity} chain."""
    from dflo_tpu.ops.contract import basis_reduce
    from dflo_tpu.ops.pallas_kernels import make_fused_post
    from dflo_tpu.stab.indicator import make_shock_indicator
    from dflo_tpu.stab.limiter import make_tvb_limiter
    from dflo_tpu.stab.positivity import make_positivity_limiter

    basis = make_basis("Qk", 2)
    nx, ny = 100, 20
    mesh = CartesianMesh(nx, ny, 0.0, 4.0, 0.0, 1.0)
    for mask in (None, _step_mask(nx, ny)):
        u = ic.set_initial_condition(basis, mesh, dmr_ic)
        if mask is not None:
            u = jnp.where(jnp.asarray(mask)[None, None], u,
                          jnp.asarray([0.0, 0.0, 1.0, 2.5],
                                      u.dtype)[:, None, None, None])
        ubar = basis_reduce(jnp.asarray(basis.wq2 @ basis.V, u.dtype), u)
        shock, _ = make_shock_indicator(basis, mesh, "density", False, False,
                                        u.dtype, mask=mask)(u, ubar, 0.0)
        ux = make_tvb_limiter(basis, mesh, M=10.0, char_lim=True,
                              dtype=u.dtype, mask=mask)(u, ubar, shock)
        ux = make_positivity_limiter(basis, mesh, u.dtype)(ux, ubar)
        fp = make_fused_post(basis, mesh, indicator="density", M=10.0,
                             char_lim=True, pos_lim=True, dtype=u.dtype,
                             mask=mask)
        got = fp(u)
        if mask is not None:
            # solid cells are physically irrelevant (the XLA chain rebuilds
            # them from their own constant state, which is a no-op anyway)
            got = jnp.where(jnp.asarray(mask)[None, None], got, ux)
        assert _rel(got, ux) < 1e-11, ("mask" if mask is not None else "plain")


def test_fused_post_diag_masked_matches_xla():
    """with_diag under a mask: lam/minq exclude solid cells, matching
    rk.compute_dt(mask=...) / negative_average_flag(mask=...)."""
    from dflo_tpu.ops.contract import basis_reduce
    from dflo_tpu.ops.pallas_kernels import make_fused_diag, make_fused_post
    from dflo_tpu.solver import rk as rk_mod

    basis = make_basis("Qk", 2)
    nx, ny = 100, 20
    mesh = CartesianMesh(nx, ny, 0.0, 4.0, 0.0, 1.0)
    mask = _step_mask(nx, ny)
    u = ic.set_initial_condition(basis, mesh, dmr_ic)
    # make the global-max wave speed live in a SOLID cell so the masked
    # reduction provably differs from the unmasked one
    hot = jnp.asarray([50.0, 0.0, 0.1, 1e4], u.dtype)
    u = jnp.where(jnp.asarray(mask)[None, None], u,
                  hot[:, None, None, None])
    ubar = basis_reduce(jnp.asarray(basis.wq2 @ basis.V, u.dtype), u)
    fm = jnp.asarray(mask)
    dt_ref = rk_mod.compute_dt(ubar, mesh, basis.degree, 1.0, mask=fm)

    lam, minq = make_fused_diag(basis, mesh, u.dtype, mask=mask)(u)
    dt_got = 1.0 / lam / (2.0 * basis.degree + 1.0)
    assert abs(float(dt_got) - float(dt_ref)) / float(dt_ref) < 1e-6

    fp = make_fused_post(basis, mesh, indicator="density", M=10.0,
                         char_lim=True, pos_lim=True, dtype=u.dtype,
                         mask=mask, with_diag=True)
    _, lam2, minq2 = fp(u)
    assert abs(float(lam2) - float(lam)) / float(lam) < 1e-6
    # the solid 'hot' state has rho=0.1 but enormous pressure; fluid minima
    # must come from the fluid region only
    cs_ref = jnp.where(fm, ubar[euler.RHO], jnp.inf).min()
    pr_ref = jnp.where(fm, euler.pressure(ubar), jnp.inf).min()
    ref_min = float(jnp.minimum(cs_ref, pr_ref))
    assert abs(float(minq2) - ref_min) / abs(ref_min) < 1e-6
    assert abs(float(minq) - ref_min) / abs(ref_min) < 1e-6


def test_solver_fused_ragged_end_to_end():
    """Full Solver steps (residual + SSP + fused post + diag) on sod's
    shipped 100x10 resolution: fused == XLA trajectories."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(100, 10, 0.0, 1.0, 0.0, 0.1)
    sod = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x),
         jnp.where(x <= 0.5, 1.0, 0.125),
         jnp.where(x <= 0.5, 1.0, 0.1) / (euler.GAMMA - 1.0)])
    bcs = dict(W=BoundarySide(euler.BC_SLIP), E=BoundarySide(euler.BC_SLIP),
               S=BoundarySide(euler.BC_PERIODIC),
               N=BoundarySide(euler.BC_PERIODIC))
    lim = LimiterConfig(type="TVB", shock_indicator="density", M=0.0,
                        char_lim=True, pos_lim=True)
    u0 = ic.set_initial_condition(basis, mesh, sod)

    def run(volume_kernel, post_kernel):
        s = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.4,
                   volume_kernel=volume_kernel, post_kernel=post_kernel)
        u, t, it = s.run(u0, 0.02)
        return u, t, it

    # per_y periodic + ragged ny excludes the fused POST (pad rows cannot
    # model a periodic stencil) but not the fused residual
    ux, tx_, nx_ = run("xla", "xla")
    uf, tf_, nf_ = run("fused", "xla")
    assert nx_ == nf_
    assert abs(tx_ - tf_) < 1e-12
    assert _rel(uf, ux) < 1e-9


def test_solver_fused_post_ragged_end_to_end():
    """Fused post on a ragged-ny NON-periodic config (DMR-style BCs)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(100, 20, 0.0, 4.0, 0.0, 1.0)
    bcs = _dmr_bcs()
    lim = LimiterConfig(type="TVB", shock_indicator="density", M=0.0,
                        char_lim=True, pos_lim=True)
    u0 = ic.set_initial_condition(basis, mesh, dmr_ic)

    def run(volume_kernel, post_kernel):
        s = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.3,
                   volume_kernel=volume_kernel, post_kernel=post_kernel)
        u, t, it = s.run(u0, 2e-3)
        return u, t, it

    ux, tx_, nx_ = run("xla", "xla")
    uf, tf_, nf_ = run("fused", "fused")
    assert nx_ == nf_
    assert abs(tx_ - tf_) < 1e-12
    assert _rel(uf, ux) < 1e-9


def test_fused_shape_ok_envelope():
    from dflo_tpu.ops.pallas_kernels import fused_shape_ok
    assert fused_shape_ok(10, 100)      # sod
    assert fused_shape_ok(100, 401)     # double_mach shipped
    assert fused_shape_ok(288, 1152)    # bench shapes
    assert fused_shape_ok(100, 100)     # isentropic vortex
    assert not fused_shape_ok(64, 4001)  # huge ragged lane width: VMEM


@pytest.mark.parametrize("nx,ny", [(100, 10),    # sod shipped
                                   (401, 100),   # double_mach shipped
                                   (100, 100)])  # isentropic vortex
def test_auto_select_fused_on_shipped_resolutions(monkeypatch, nx, ny):
    """On a TPU, Solver(volume_kernel='auto') must pick the fused kernels
    for the shipped (non-tile-aligned) reference resolutions.  The platform
    probe is monkeypatched; kernel CONSTRUCTION is lazy, so nothing actually
    compiles for TPU here."""
    import types

    import dflo_tpu.driver as driver_mod

    monkeypatch.setattr(
        driver_mod.jax, "devices",
        lambda *a, **k: [types.SimpleNamespace(platform="tpu")])
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(nx, ny, 0.0, 4.0, 0.0, 1.0)
    lim = LimiterConfig(type="TVB", shock_indicator="density", M=0.0,
                        char_lim=True, pos_lim=True)
    s = Solver(basis, mesh, _dmr_bcs(), flux="hllc", limiter=lim)
    assert hasattr(s.rhs, "stage"), "fused residual not auto-selected"
    assert s._fused_post is not None, "fused post not auto-selected"
    # too-wide ragged lane dim must fall back (VMEM envelope)
    mesh_bad = CartesianMesh(4001, 64, 0.0, 4.0, 0.0, 1.0)
    s2 = Solver(basis, mesh_bad, _dmr_bcs(), flux="hllc", limiter=lim)
    assert not hasattr(s2.rhs, "stage")


def test_auto_select_fused_with_body_force_and_wb(monkeypatch):
    """Gravity / external-force / isothermal well-balanced configs ride the
    fused production kernel on TPU (round-3 envelope widening): auto
    selection must pick it, and polytropic must still fall back."""
    import types

    import dflo_tpu.driver as driver_mod
    from dflo_tpu.physics import euler as _euler

    monkeypatch.setattr(
        driver_mod.jax, "devices",
        lambda *a, **k: [types.SimpleNamespace(platform="tpu")])
    lim = LimiterConfig(type="TVB", shock_indicator="density", M=0.0,
                        char_lim=True, pos_lim=True)

    def grav(x, y, t, W):
        return _euler.forcing_gravity(W, (0.0, -0.1))

    mesh = CartesianMesh(64, 32, 0.0, 1.0, 0.0, 1.0)
    s = Solver(make_basis("Qk", 2), mesh, _dmr_bcs(), flux="hllc",
               limiter=lim, source=grav)
    assert hasattr(s.rhs, "stage"), "fused not auto-selected with gravity"

    pot = lambda x, y: x + y  # noqa: E731
    s2 = Solver(make_basis("Qk_gll", 2), mesh, _dmr_bcs(), flux="lxf",
                well_balanced="isothermal", potential=pot)
    assert hasattr(s2.rhs, "stage"), \
        "fused not auto-selected for isothermal well-balanced"

    s3 = Solver(make_basis("Qk_gll", 2), mesh, _dmr_bcs(), flux="lxf",
                well_balanced="polytropic", potential=pot)
    assert not hasattr(s3.rhs, "stage"), "polytropic must fall back to XLA"
