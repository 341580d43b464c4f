"""AMR performance measurement (VERDICT r3 item 3): DoF-updates/s of the
sparse tile-pool AMR stepping path on the real TPU, and the active-vs-uniform
comparison that justifies AMR as a PERFORMANCE feature.

Problem: the bench DMR-style Mach-10 oblique shock (same IC/BCs as bench.py)
with the shock band refined to max_level so the FINE-EQUIVALENT resolution is
the bench grid (1152 x 288 at Q2).  Three numbers:

  amr_active_rate    — active-DoF-updates/s of the AMR chunked loop
                       (cost basis: DoFs the pools actually carry)
  amr_effective_rate — fine-equivalent DoF-updates/s (credit basis: the
                       uniform 1152x288 run it replaces)
  uniform_rate       — the fused production solver AT 1152x288 (bench.py's
                       metric) measured in the same session

The AMR WIN criterion is wall-clock per step: effective_rate > uniform_rate
iff stepping the sparse pools is cheaper than stepping the uniform fine grid
(the reference's motivation for refinement, src/refine.cc:40-133).

Usage: python scripts/amr_bench.py   (runs on the default platform; pass
JAX_PLATFORMS=cpu for a host smoke run at reduced sizes)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__ as ge  # noqa: E402
from dflo_tpu import ic  # noqa: E402
from dflo_tpu.amr_pool import AMRConfig, AMRSolver  # noqa: E402
from dflo_tpu.driver import LimiterConfig  # noqa: E402
from dflo_tpu.mesh import CartesianMesh  # noqa: E402
from dflo_tpu.ops.basis import make_basis  # noqa: E402
from dflo_tpu.physics import euler  # noqa: E402
from dflo_tpu.solver.spatial import BoundarySide  # noqa: E402


def dmr_ic(x, y, t=0.0):
    post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
    rho = jnp.where(post, 8.0, 1.4)
    vx = jnp.where(post, 7.14471, 0.0)
    vy = jnp.where(post, -4.125, 0.0)
    p = jnp.where(post, 116.5, 1.0)
    return jnp.stack([rho * vx, rho * vy, rho,
                      p / (euler.GAMMA - 1.0) + 0.5 * rho * (vx**2 + vy**2)])


def build_amr(nx0, ny0, max_level=2, tile=2):
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(nx0, ny0, 0.0, 4.0, 0.0, 1.0)
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
    # capacity: the shock band is an O(1)-width diagonal stripe.  Pool
    # stepping cost is CAPACITY-proportional (static shapes), so the budget
    # must track the expected active set, not the tile count: 10% of the
    # fine-equivalent cells per refined level (~1.3x the measured DMR band,
    # 7.4% active).  The r4 script budgeted 35% of TILES at top-level size,
    # which let every L1 slot allocate (83k cells stepped for a ring of a
    # few hundred active) — half the measured 140 ms/step was capacity
    # waste (PERF.md r5 AMR table).
    nty, ntx = ny0 // tile, nx0 // tile
    fine_cells = (ny0 * 2**max_level) * (nx0 * 2**max_level)
    amr = AMRConfig(shock_value=1.0, shock_levels=max_level,
                    iter_step=10, tile=tile,
                    max_elements=int(0.10 * fine_cells))
    s = AMRSolver(basis, mesh, bcs, flux="hllc", amr=amr, limiter=lim,
                  cfl=0.5)
    pools = s.set_ic(dmr_ic, adapt_iters=max_level + 1)
    return s, pools


def measure_amr(s, pools, n_steps):
    multi = s._multi_step(n_steps)
    pools = s.post_stage(pools, s._tables, 0.0)
    zero = jnp.zeros((), s.dtype)
    t_end = jnp.asarray(1e9, s.dtype)
    out = multi(pools, s._tables, zero, t_end)      # compile + warmup
    jax.block_until_ready(out[0][0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = multi(pools, s._tables, zero, t_end)
        jax.block_until_ready(out[0][0])
        best = min(best, time.perf_counter() - t0)
    assert int(out[2]) == n_steps and not bool(out[3])
    return best / n_steps


def main():
    on_tpu = jax.default_backend() == "tpu"
    # coarse 288x72 Q2, 2 levels -> fine-equivalent 1152x288 = bench grid
    nx0, ny0, L = (288, 72, 2) if on_tpu else (96, 24, 1)
    n_steps = 20 if on_tpu else 3

    # tile-granularity decision (VERDICT r4 item 8): T=1 refines per CELL
    # (the reference's granularity, src/refine.cc:48-60), T=2 per 2x2 tile.
    # T=1 tracks the shock band tighter (fewer active DoFs) but quadruples
    # the pool-table entries; the measured rates decide the default.
    tile_rows = {}
    for tile in (1, 2):
        s_t, pools_t = build_amr(nx0, ny0, max_level=L, tile=tile)
        a_dofs = 4 * s_t.K * s_t.n_active_cells()
        sec_t = measure_amr(s_t, pools_t, n_steps)
        tile_rows[tile] = (a_dofs, sec_t)
        print(f"tile={tile}: active {s_t.n_active_cells()} cells, "
              f"{sec_t * 1e3:.2f} ms/step")

    s, pools = build_amr(nx0, ny0, max_level=L)
    K = s.K
    active_dofs = 4 * K * s.n_active_cells()
    fine_dofs = 4 * K * (nx0 * 2**L) * (ny0 * 2**L)
    sec_amr = measure_amr(s, pools, n_steps)
    amr_active = active_dofs / sec_amr
    amr_effective = fine_dofs / sec_amr

    # uniform-fine fused production solver at the fine-equivalent grid
    solver, u0 = ge._build(nx0 * 2**L, ny0 * 2**L)
    u0 = solver.post_stage(u0)
    multi = solver._multi_step(n_steps)
    zero = jnp.zeros((), u0.dtype)
    t_end = jnp.asarray(1e9, u0.dtype)
    out = multi(u0, zero, t_end)
    jax.block_until_ready(out[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = multi(u0, zero, t_end)
        jax.block_until_ready(out[0])
        best = min(best, time.perf_counter() - t0)
    sec_uni = best / int(out[2])
    uniform_rate = fine_dofs / sec_uni

    print(f"AMR  active cells {s.n_active_cells()} "
          f"({100.0 * active_dofs / fine_dofs:.1f}% of fine), "
          f"{sec_amr * 1e3:.2f} ms/step")
    print(f"AMR  active-DoF rate    {amr_active:.3e} DoF-updates/s")
    print(f"AMR  effective rate     {amr_effective:.3e} (fine-equiv DoFs)")
    print(f"UNIFORM fine rate       {uniform_rate:.3e} "
          f"({sec_uni * 1e3:.2f} ms/step)")
    print(f"AMR vs uniform wall-clock: {sec_uni / sec_amr:.2f}x "
          f"{'WIN' if sec_amr < sec_uni else 'LOSS'}")
    print(json.dumps({
        "metric": "amr_dmr_q2_rates",
        "active_frac": active_dofs / fine_dofs,
        "amr_active_rate": amr_active,
        "amr_effective_rate": amr_effective,
        "uniform_rate": uniform_rate,
        "speedup_vs_uniform": sec_uni / sec_amr,
        "tile1_active_dofs": tile_rows[1][0],
        "tile1_ms_per_step": tile_rows[1][1] * 1e3,
        "tile2_active_dofs": tile_rows[2][0],
        "tile2_ms_per_step": tile_rows[2][1] * 1e3,
    }))


if __name__ == "__main__":
    main()
