"""Headline benchmark: double-Mach-reflection-style Q2 DG Euler step
throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline normalization: the reference publishes no numbers
(/root/reference/README.md); BASELINE.json's north star is >= 10x a
single-socket CPU dflo on double Mach reflection at Q2.  A serial deal.II DG
code on this class of problem sustains ~1e6 DoF-updates/s/socket (MeshWorker
assembly, AoS), so the 10x target is 1e7 DoF-updates/s; vs_baseline reports
the measured rate against that 1e7 target value.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    # persistent compile cache: the axon remote-compile service pays a
    # multi-minute warmup on the first sizable module per session; cache what
    # we can across runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import __graft_entry__ as ge

    on_tpu = jax.devices()[0].platform != "cpu"
    nx, ny = (1152, 288) if on_tpu else (192, 48)
    solver, u0 = ge._build(nx, ny)
    n_dofs = 4 * solver.basis.K * nx * ny

    ubar = solver.cell_averages(u0)
    from dflo_tpu.solver.rk import compute_dt, ssp_rk_step
    dt = compute_dt(ubar, solver.mesh, 2, solver.cfl)

    @jax.jit
    def multi_step(u, n):
        def body(i, u):
            return ssp_rk_step(solver.rhs, u, 0.0, dt, solver.ark,
                               solver.stage_times, post_stage=solver.post_stage)
        return jax.lax.fori_loop(0, n, body, u)

    # warmup/compile (first compile on the axon tunnel can take minutes)
    u = multi_step(u0, 2)
    u.block_until_ready()

    n_steps = 50 if on_tpu else 10
    t0 = time.perf_counter()
    u = multi_step(u0, n_steps)
    u.block_until_ready()
    wall = time.perf_counter() - t0

    rate = n_dofs * n_steps / wall
    baseline = 1.0e7  # 10x the ~1e6 DoF-updates/s single-socket CPU estimate
    print(json.dumps({
        "metric": "dmr_q2_dof_updates_per_sec",
        "value": rate,
        "unit": "DoF-updates/s",
        "vs_baseline": rate / baseline,
    }))


if __name__ == "__main__":
    main()
