"""Runtime AMR (dflo_tpu.amr_pool): sparse tile pools, mortar fluxes,
adaptation events, conservation — the reference's refine_grid machinery
(src/refine.cc:40-133, src/claw.cc:985-994, 1112-1128) under XLA static
shapes."""

import jax.numpy as jnp
import numpy as np

from dflo_tpu import ic
from dflo_tpu.amr_pool import AMRConfig, AMRSolver
from dflo_tpu.driver import LimiterConfig, Solver
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide
import pytest

# integration/e2e tier: minutes of CPU emulation; the quick dev tier
# skips this file (pytest.ini 'heavy'); the full suite runs it
pytestmark = pytest.mark.heavy


def _const(x, y, t=0.0):
    return jnp.stack([jnp.full_like(x, 0.3), jnp.full_like(x, -0.2),
                      jnp.ones_like(x), jnp.full_like(x, 2.6)])


def _bump(x, y, t=0.0):
    r2 = (x - 0.45) ** 2 + (y - 0.55) ** 2
    rho = 1.0 + 0.5 * jnp.exp(-60 * r2)
    p = rho ** euler.GAMMA
    z = jnp.zeros_like(x)
    return jnp.stack([z, z, rho, p / (euler.GAMMA - 1.0)])


def _pools_to_dense0(s, pools):
    """Reassemble the level-0 pool into [4, K, ny, nx] (level-0-only runs)."""
    T, nty, ntx = s.T, s.nty, s.ntx
    U = np.array(pools[0]).reshape(4, s.basis.K, nty, ntx, T, T)
    return U.transpose(0, 1, 2, 4, 3, 5).reshape(
        4, s.basis.K, nty * T, ntx * T)


def test_level0_only_matches_plain_solver():
    """With no refinement the tile-pool residual must equal the plain
    Cartesian solver to roundoff (same scheme, tiled assembly)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(16, 16, -5.0, 5.0, -5.0, 5.0)
    ff = ic.isentropic_vortex()
    bff = BoundarySide(euler.BC_FARFIELD, ff)
    bcs = dict(W=bff, E=bff, S=bff, N=bff)
    amr = AMRConfig(shock_value=1e9, shock_levels=1, iter_step=0, tile=4)
    s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, cfl=0.5)
    pools = s.set_ic(ff, adapt_iters=0)
    Ra = _pools_to_dense0(s, s.rhs_all(pools, s._tables, 0.0))
    s_ref = Solver(basis, mesh, bcs, flux="hllc", cfl=0.5)
    u0 = ic.set_initial_condition(basis, mesh, ff)
    R_ref = np.array(s_ref.rhs(u0, 0.0))
    np.testing.assert_allclose(Ra, R_ref, rtol=1e-11, atol=1e-11)


def _mixed_solver(shock_levels=2):
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(16, 16, 0.0, 1.0, 0.0, 1.0)
    ff = BoundarySide(euler.BC_FARFIELD, _const)
    bcs = dict(W=ff, E=ff, S=ff, N=ff)
    amr = AMRConfig(shock_value=1e9, shock_levels=shock_levels,
                    iter_step=0, tile=4)
    s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, cfl=0.4)
    newL = s.topo.Lmap.copy()
    newL[1:3, 1:3] = 1
    newL[1, 1] = 2
    s.topo.Lmap = s.topo.balance(newL)
    s.topo._assign_slots()
    s._tables = s._build_tables()
    return s


def test_free_stream_across_levels():
    """Constant state => zero residual including every coarse-fine mortar
    interface at shock_levels = 2 (three live levels)."""
    s = _mixed_solver()
    pools = s._ic_pools(_const)
    R = s.rhs_all(pools, s._tables, 0.0)
    assert max(float(jnp.abs(r).max()) for r in R) < 1e-11


def test_conservation_across_levels():
    """Slip-wall box with a smooth bump spanning a 3-level tile hierarchy:
    total mass and energy conserved to machine eps (the gather+canonical-
    recompute assembly makes both sides of every interface use the
    identical flux)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(16, 16, 0.0, 1.0, 0.0, 1.0)
    wall = BoundarySide(euler.BC_SLIP)
    bcs = dict(W=wall, E=wall, S=wall, N=wall)
    amr = AMRConfig(shock_value=1e9, shock_levels=2, iter_step=0, tile=4)
    s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, cfl=0.4)
    newL = s.topo.Lmap.copy()
    newL[1:3, 1:3] = 1
    newL[1, 1] = 2
    s.topo.Lmap = s.topo.balance(newL)
    s.topo._assign_slots()
    s._tables = s._build_tables()
    pools = s._ic_pools(_bump)
    tot0 = np.array(s.totals(pools))
    t = 0.0
    for _ in range(15):
        pools, dt, bad = s._step(pools, s._tables, t, 1.0)
        t += float(dt)
    tot1 = np.array(s.totals(pools))
    assert abs(tot1[euler.RHO] - tot0[euler.RHO]) < 1e-12
    assert abs(tot1[euler.ENE] - tot0[euler.ENE]) < 1e-12
    assert all(bool(jnp.isfinite(p).all()) for p in pools)


def test_adapt_transfer_preserves_means():
    """Refine + coarsen round trip: prolongation is exact for polynomials
    and restriction preserves cell means (SolutionTransfer,
    src/refine.cc:75-104)."""
    s = _mixed_solver()
    pools = s._ic_pools(_bump)
    tot0 = np.array(s.totals(pools))
    # force full coarsening (scores tiny vs huge shock_value); one level
    # per event (src/refine.cc flags one level at a time)
    pools2, changed = s.adapt(pools)
    assert changed
    assert int(s.topo.Lmap.max()) == 1
    pools2, changed = s.adapt(pools2)
    assert changed
    assert int(s.topo.Lmap.max()) == 0
    tot1 = np.array(s.totals(pools2))
    np.testing.assert_allclose(tot1, tot0, rtol=1e-13, atol=1e-13)


def test_adaptive_sod_profile_and_savings():
    """Sod with 2 refinement levels driven by the gradient indicator: the
    composite profile matches the exact Riemann solution, mass/energy are
    conserved, refinement actually engages, and the active cell count stays
    below the uniformly-refined equivalent (the point of AMR)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import riemann_exact
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(64, 8, 0.0, 1.0, 0.0, 0.125)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", beta=2.0, char_lim=True, pos_lim=True)
    amr = AMRConfig(shock_value=0.25, shock_levels=2, iter_step=4, tile=4,
                    max_elements=20000)
    s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, limiter=lim,
                  cfl=0.45)

    def sod(x, y, t=0.0):
        rho = jnp.where(x <= 0.5, 1.0, 0.125)
        E = jnp.where(x <= 0.5, 2.5, 0.25)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, E])

    pools = s.set_ic(sod)
    tot0 = np.array(s.totals(pools))
    pools, t, it = s.run(pools, 0.1)
    tot1 = np.array(s.totals(pools))
    assert abs(tot1[euler.RHO] - tot0[euler.RHO]) < 1e-12
    assert int(s.topo.Lmap.max()) == 2            # deep refinement engaged
    assert s.n_active_cells() < 64 * 8 * 16       # sparser than uniform L2

    # composite level-0 means
    avg0 = np.zeros((4, 8, 64))
    for lv in range(s.max_level + 1):
        ub = np.array(s.averages(pools[lv]))
        T = s.T
        for i, (ty, tx) in enumerate(s.topo.slots[lv]):
            if s.topo.Lmap[ty, tx] != lv:
                continue
            blk = ub[:, i].reshape(4, T, 2**lv, T, 2**lv).mean(axis=(2, 4))
            avg0[:, ty * T:(ty + 1) * T, tx * T:(tx + 1) * T] = blk
    rho = avg0[euler.RHO].mean(axis=0)
    xc = (np.arange(64) + 0.5) / 64
    rex, _, _ = riemann_exact.sample((xc - 0.5) / t, 1.0, 0.0, 1.0,
                                     0.125, 0.0, 0.1)
    assert np.abs(rho - rex).mean() < 0.012


def test_forward_step_amr_with_corner_pin():
    """Mach-3 forward step with a tile-aligned solid mask: runs finite and
    positive with AMR; the reentrant corner stays pinned at max level
    (src/refine.cc:110-133) and the run is sparser than uniform."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(60, 20, 0.0, 3.0, 0.0, 1.0)
    xc, yc = mesh.cell_centers()
    mask = ~((xc >= 0.6) & (yc <= 0.2))
    RHO, MXV, P0 = 1.4, 4.2, 1.0
    E0 = P0 / (euler.GAMMA - 1.0) + 0.5 * MXV**2 / RHO
    inflow = lambda x, y, t=0.0: jnp.stack(  # noqa: E731
        [jnp.full_like(x, MXV), jnp.zeros_like(x),
         jnp.full_like(x, RHO), jnp.full_like(x, E0)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", beta=2.0, char_lim=True, pos_lim=True)
    amr = AMRConfig(shock_value=1.0, shock_levels=2, iter_step=5, tile=2,
                    max_elements=6000)
    s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, limiter=lim,
                  cfl=0.4, mask=mask, pins=[(0.6, 0.2)],
                  solid_state=(MXV, 0.0, RHO, E0))
    pools = s.set_ic(inflow)
    # corner tiles pinned to the max level by the initial adaptation loop
    assert s.topo.Lmap[1, 5] == 2
    pools, t, it = s.run(pools, 0.12)
    assert it > 10
    assert all(bool(jnp.isfinite(p).all()) for p in pools)
    assert s.n_active_cells() < np.count_nonzero(mask) * 16
    # density stays positive on every active patch
    for lv in range(s.max_level + 1):
        ub = np.array(s.averages(pools[lv]))
        act = np.asarray(s._tables[lv]["active"])
        assert ub[euler.RHO, act].min() > 0.0


def test_vtu_amr_output(tmp_path):
    from dflo_tpu.io.vtk import write_vtu_amr
    s = _mixed_solver()
    pools = s._ic_pools(_bump)
    path = str(tmp_path / "amr.vtu")
    write_vtu_amr(path, s, pools, t=0.0)
    data = open(path, "rb").read()
    assert b"UnstructuredGrid" in data and b"level" in data


def test_amr_pools_1_vs_8_devices():
    """Parallel AMR (src_mpi/refine.cc:81-96 analog): the tile pools are
    sharded over their slot axis across the 8-device mesh; stepping +
    adaptation give the same composite solution as the single-device run.
    Validates that the pool operators are sharding-transparent (GSPMD
    partitions the slot-indexed gathers)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(64, 8, 0.0, 1.0, 0.0, 0.125)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", beta=2.0, char_lim=True, pos_lim=True)
    amr = AMRConfig(shock_value=0.25, shock_levels=2, iter_step=3, tile=4,
                    max_elements=20000)

    def sod(x, y, t=0.0):
        rho = jnp.where(x <= 0.5, 1.0, 0.125)
        E = jnp.where(x <= 0.5, 2.5, 0.25)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, E])

    def drive(shard):
        s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, limiter=lim,
                      cfl=0.45)
        dmesh = Mesh(np.array(jax.devices()).reshape(8), ("slots",))
        place = (lambda pools: [
            jax.device_put(p, NamedSharding(
                dmesh, P(None, None, "slots", None, None)))
            for p in pools]) if shard else (lambda pools: pools)
        pools = place(s.set_ic(sod))
        t, it = 0.0, 0
        pools = s.post_stage(pools, s._tables, 0.0)
        while t < 0.03 - 1e-12:
            pools, dt, bad = s._step(pools, s._tables, t, 0.03)
            assert not bool(bad)
            t += float(dt)
            it += 1
            if it % amr.iter_step == 0:
                pools, _ = s.adapt(pools)
                pools = place(pools)
        return s, pools

    s1, p1 = drive(False)
    s8, p8 = drive(True)
    assert (s1.topo.Lmap == s8.topo.Lmap).all()
    for lv in range(s1.max_level + 1):
        d = float(jnp.abs(p1[lv] - p8[lv]).max())
        assert d < 1e-11, (lv, d)


def test_amr_periodic_vortex_conserves():
    """`refinement = true` + periodic BCs (VERDICT r2 item 7): the
    isentropic vortex on a fully periodic box with live adaptation
    conserves mass/momentum/energy to 1e-12 and stays accurate.  The
    periodic tile neighbor tables mirror the reference's recursing periodic
    cell map (src_mpi/DealiiExtensions.h:40-119)."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(32, 32, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    lim = LimiterConfig(type="none", pos_lim=False)
    amr = AMRConfig(shock_value=0.04, shock_levels=1, iter_step=4, tile=4,
                    max_elements=50000)
    s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, limiter=lim,
                  cfl=0.45)
    vort = ic.isentropic_vortex()
    pools = s.set_ic(vort)
    assert int(s.topo.Lmap.max()) == 1            # vortex core refined
    tot0 = np.array(s.totals(pools))
    pools, t, it = s.run(pools, 0.3)
    tot1 = np.array(s.totals(pools))
    assert np.abs(tot1 - tot0).max() < 1e-12 * max(1.0, np.abs(tot0).max())
    # wrap tiles: refine a seam-adjacent region by construction? the core
    # sits mid-domain; instead check the periodic tables exist and are used
    assert s.per_x and s.per_y
    # composite density stays near the exact advected vortex
    avg0 = np.zeros((4, 32, 32))
    for lv in range(s.max_level + 1):
        ub = np.array(s.averages(pools[lv]))
        T = s.T
        for i, (ty, tx) in enumerate(s.topo.slots[lv]):
            if s.topo.Lmap[ty, tx] != lv:
                continue
            blk = ub[:, i].reshape(4, T, 2**lv, T, 2**lv).mean(axis=(2, 4))
            avg0[:, ty * T:(ty + 1) * T, tx * T:(tx + 1) * T] = blk
    assert np.isfinite(avg0).all()
    # the vortex is STATIONARY (src/ic.cc:44-61 has no advection): the
    # exact solution equals the IC, so the composite averages must stay
    # near the exact cell averages (16-point subsampled); pointwise center
    # density is (1 - a2*e)^2.5 ~ 0.348, so a fixed floor would be wrong
    xe = np.linspace(-5.0, 5.0, 32 * 4 + 1)
    xm = 0.5 * (xe[:-1] + xe[1:])
    X, Y = np.meshgrid(xm, xm)
    rho_ex = np.asarray(ic.isentropic_vortex()(X, Y)[euler.RHO])
    rho_ex = rho_ex.reshape(32, 4, 32, 4).mean(axis=(1, 3))
    # ~0.022 observed: Q1 nodal interpolation + scheme error at the tightly
    # curved vortex core (dx = 0.3125); conservation above is the 1e-12 check
    assert np.abs(avg0[euler.RHO] - rho_ex).max() < 0.03


def test_amr_periodic_seam_refinement_consistency():
    """A vortex centered ON the periodic seam refines tiles on BOTH sides
    of the wrap (the 2:1 balance and neighbor tables cross the seam)."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(32, 32, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    lim = LimiterConfig(type="none", pos_lim=False)
    amr = AMRConfig(shock_value=0.04, shock_levels=1, iter_step=4, tile=4,
                    max_elements=50000)
    s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, limiter=lim,
                  cfl=0.45)

    def seam_bump(x, y, t=0.0):
        """Periodic density bump centered ON the W/E seam (x = +-5): the
        wrap-aware distance makes the IC genuinely periodic."""
        dx = jnp.mod(x + 5.0 + 5.0, 10.0) - 5.0     # distance to the seam
        rho = 1.0 + 0.8 * jnp.exp(-2.0 * (dx**2 + y**2))
        p = rho ** euler.GAMMA
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, p / (euler.GAMMA - 1.0)])

    pools = s.set_ic(seam_bump)
    L = s.topo.Lmap
    assert L[:, 0].max() == 1 and L[:, -1].max() == 1   # both seam sides
    tot0 = np.array(s.totals(pools))
    pools, t, it = s.run(pools, 0.15)
    tot1 = np.array(s.totals(pools))
    assert np.abs(tot1 - tot0).max() < 1e-12 * max(1.0, np.abs(tot0).max())


def test_amr_chunked_run_matches_per_step():
    """run(chunked=True) (device-side while_loop between adaptation events)
    is bit-identical to the per-step host loop, including the adaptation
    sequence and tile-accounting stats."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(32, 8, 0.0, 1.0, 0.0, 0.25)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", beta=2.0, char_lim=True, pos_lim=True)

    def sod(x, y, t=0.0):
        rho = jnp.where(x <= 0.5, 1.0, 0.125)
        E = jnp.where(x <= 0.5, 2.5, 0.25)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, E])

    def one(chunked):
        amr = AMRConfig(shock_value=0.25, shock_levels=1, iter_step=4,
                        tile=4, max_elements=20000)
        s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, limiter=lim,
                      cfl=0.45)
        pools = s.set_ic(sod)
        pools, t, it = s.run(pools, 0.05, chunked=chunked)
        return s, pools, t, it

    s1, p1, t1, it1 = one(False)
    s2, p2, t2, it2 = one(True)
    assert it1 == it2
    assert (s1.topo.Lmap == s2.topo.Lmap).all()
    assert abs(t1 - t2) < 5e-15
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   rtol=0, atol=2e-14)


def test_refinement_tile_config_knob(tmp_path):
    """`set tile = 1` in the refinement subsection requests exact per-cell
    refinement flags (src/refine.cc:48-60 parity); the default prefers
    T=2."""
    from dflo_tpu.cli import build_solver
    from dflo_tpu.config.params import AllParameters

    prm = tmp_path / "amr.prm"
    base = """
set mesh type = cartesian
set degree = 1
subsection cartesian mesh
   set nx = 16
   set ny = 8
end
subsection boundary_1
   set type = slip
end
subsection boundary_2
   set type = outflow
end
subsection boundary_3
   set type = slip
end
subsection boundary_4
   set type = outflow
end
subsection initial condition
   set w_2 value = 1.0
   set w_3 value = 2.5
end
subsection time stepping
   set cfl = 0.5
   set final time = 0.1
end
subsection refinement
   set refinement = true
   set shock value = 1.0
   set iter step = 5
{tile}end
"""
    prm.write_text(base.format(tile=""))
    params = AllParameters.from_prm_file(str(prm))
    solver, _ = build_solver(params, str(tmp_path))
    assert solver.T == 2                    # default preference

    prm.write_text(base.format(tile="   set tile = 1\n"))
    params = AllParameters.from_prm_file(str(prm))
    solver, _ = build_solver(params, str(tmp_path))
    assert solver.T == 1                    # per-cell parity
