"""One-VMEM-pass-per-stage experiment (VERDICT r3 item 2 / r4 item 4).

Question: should the fused {residual + SSP blend} and {post chain + diag}
kernels merge into ONE pallas call per RK stage?

The hazard: the post chain (KXRCF + TVB) consumes NEIGHBOR data of the
post-blend state — the quantity the residual kernel is in the middle of
producing.  A merged kernel must therefore RECOMPUTE the blended state for
a one-cell halo ring around each tile, which means evaluating the ring
cells' full residuals (their own 4-side Riemann fluxes + lifts), i.e. for
TY=8-row tiles: 2 extra rows + 2 extra columns + corners of flux work
= ~27% more VPU work — in a kernel PERF.md shows is VPU-COMPUTE-bound
(28% of HBM peak, 3.5x bandwidth headroom).  What it saves is the
second kernel's input traffic: the XLA row-gather (R+W) and the state
re-read.

This script MEASURES both sides on the real kernels at bench shapes:
  t_res          fused residual+blend per call
  t_res_aug      same kernel on a (ny * 1.28) grid, normalized back to
                 bench rows -> the marginal VPU cost of the halo-ring
                 recompute a merged kernel must absorb
  t_post         fused post+diag per call
  t_gather       the XLA row-gather feeding the post kernel, alone
  t_chain        the real per-stage chain (stage -> gather -> post)

Merged-kernel projection (lower bound, generous to the merge):
  t_merged >= t_res_aug + (t_post - t_gather - t_read_share)
where t_read_share (the saved state re-read, ~1.0 S of post's ~3 S) is
bounded by S/BW.  Verdict = sign of t_merged - t_chain.
"""

import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__ as ge  # noqa: E402

REPS = 50


def bench_loop(fn, u0, reps=REPS, n_best=3):
    loop = jax.jit(lambda u: jax.lax.fori_loop(
        0, reps, lambda i, v: fn(v), u))
    out = loop(u0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n_best):
        t0 = time.perf_counter()
        out = loop(u0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / reps


def main():
    nx, ny = 1152, 288
    ny_aug = 368                      # 288 * 1.278 ~ the +2/8 halo-ring work
    t = jnp.zeros(())
    dt = jnp.full((), 1e-5)
    a = 0.3

    rows = {}
    for label, nyy in (("bench", ny), ("aug", ny_aug)):
        solver, u0 = ge._build(nx, nyy)
        u0 = solver.post_stage(u0)
        stage = solver.rhs.stage
        rows[label] = dict(
            res=bench_loop(lambda u: stage(u, u, t, a, dt), u0),
            post=bench_loop(lambda u: solver._fused_post(u)[0], u0),
        )

        K = solver.basis.K
        TY = 8

        def gather(u):
            c, k, nyv, nxv = u.shape
            ni = nyv // TY
            u5 = u.reshape(c, k, ni, TY, nxv)
            rf = jnp.transpose(u5[:, :, :, 0, :], (2, 0, 1, 3))[:, :, None]
            rl = jnp.transpose(u5[:, :, :, TY - 1, :],
                               (2, 0, 1, 3))[:, :, None]
            # fold back so the loop carry keeps u's shape/dtype
            return u + 1e-30 * (rf.sum() + rl.sum())

        rows[label]["gather"] = bench_loop(gather, u0)

        def chain(u):
            v = stage(u, u, t, a, dt)
            return solver._fused_post(v)[0]

        rows[label]["chain"] = bench_loop(chain, u0)
        del solver, u0

    r = rows["bench"]
    res_aug_norm = rows["aug"]["res"] * ny / ny_aug
    S = 4 * 9 * nx * ny * 4 / 1e9          # state GB
    t_read = S / 819.0 * 1e3               # ms for one state read at peak BW
    merged_lb = res_aug_norm + max(r["post"] - r["gather"] - t_read, 0.0)

    print(f"t_res   (residual+blend)        {r['res']:8.3f} ms")
    print(f"t_res_aug (+28% rows, norm.)    {res_aug_norm:8.3f} ms  "
          f"(marginal halo-ring VPU cost {res_aug_norm - r['res']:+.3f})")
    print(f"t_post  (post+diag)             {r['post']:8.3f} ms")
    print(f"t_gather (XLA row-gather alone) {r['gather']:8.3f} ms")
    print(f"t_chain (stage->gather->post)   {r['chain']:8.3f} ms")
    print(f"state read at peak BW           {t_read:8.3f} ms")
    print(f"merged one-pass LOWER BOUND     {merged_lb:8.3f} ms  "
          f"vs chain {r['chain']:8.3f} ms -> "
          f"{'LOSS' if merged_lb > r['chain'] else 'WIN'} "
          f"({(merged_lb / r['chain'] - 1.0) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
