"""Measured CPU anchor for the bench baseline (VERDICT r3 item 7).

`bench.py` normalizes against an ESTIMATED ~1e6 DoF-updates/s/socket for
serial deal.II dflo on double Mach reflection at Q2 (no deal.II toolchain is
available in this image to measure the real thing).  This script bounds that
estimate from below with a MEASUREMENT: the repo's own XLA path — whole-domain
einsum contractions, no Pallas — run on the host CPU at the exact bench
problem (DMR-style Q2, HLLC + KXRCF + characteristic TVB + positivity,
SSP-RK3, chunked device loop), at the TPU bench resolution (1152 x 288) and
at the CPU bench resolution (192 x 48).

The XLA-CPU path is vectorized SoA f64 — a FASTER execution model than
deal.II's per-cell MeshWorker AoS assembly — so its rate is an upper bound
on what dflo itself would sustain per core; conversely, any rate >= 1e6/core
confirms the 1e6/socket estimate is not unfairly low.

Usage: python scripts/cpu_anchor.py   (run on the CPU host; pins JAX to cpu)
Prints one JSON line and a human summary; paste into PERF.md / BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as ge  # noqa: E402


def measure(nx, ny, n_steps):
    solver, u0 = ge._build(nx, ny)          # XLA path: auto != fused on CPU
    n_dofs = 4 * solver.basis.K * nx * ny
    u0 = solver.post_stage(u0)
    multi = solver._multi_step(n_steps)
    zero = jnp.zeros((), u0.dtype)
    t_end = jnp.asarray(1e9, u0.dtype)
    out = multi(u0, zero, t_end)            # warmup + compile
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = multi(u0, zero, t_end)
    jax.block_until_ready(out[0])
    wall = time.perf_counter() - t0
    assert int(out[2]) == n_steps and not bool(out[3])
    return n_dofs, n_steps * n_dofs / wall


def main():
    ncores = os.cpu_count()
    rows = {}
    for (nx, ny, steps) in ((192, 48, 10), (1152, 288, 3)):
        n_dofs, rate = measure(nx, ny, steps)
        rows[f"{nx}x{ny}"] = {"dofs": n_dofs, "dof_updates_per_sec": rate,
                              "per_core": rate / ncores}
        print(f"XLA-CPU {nx}x{ny}: {rate:.3e} DoF-updates/s "
              f"({rate / ncores:.3e}/core, {ncores} cores)")
    print(json.dumps({"metric": "cpu_anchor_xla_dof_updates_per_sec",
                      "cores": ncores, "resolutions": rows}))


if __name__ == "__main__":
    main()
