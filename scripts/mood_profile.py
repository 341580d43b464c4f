"""Component-level timing of the MOOD bench path (BASELINE config 4) on the
real TPU: where do the ~12 ms/step go?

The axon tunnel costs ~24 ms per host dispatch, so every component is timed
as a jitted lax.fori_loop of REPS iterations (one dispatch, REPS executions)
and the per-iteration time is (loop_wall - dispatch_floor) / REPS.  The
dispatch floor itself is measured with an empty loop.

Components:
  step        — solver._multi_step(REPS) (the real chunked production loop)
  candidate   — fused {trunc+pos} + fused rhs/FE-blend pass
  rhs         — the fused Pk residual alone
  trunc_pos   — the fused modal truncation+positivity kernel alone
  checks      — DMP + u2 + dilate bookkeeping on a candidate
  post_chain  — per-stage TVB-on-marked + modal positivity
  averages    — mode-0 cell averages
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__ as ge  # noqa: E402

REPS = 50


def bench_loop(fn, u0, reps=REPS, n_best=3):
    """Time jit(fori_loop(reps, fn)) — fn: u -> u (same shape/dtype)."""
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
    return best * 1e3 / reps  # ms per iteration


def main():
    nx, ny = 1152, 288
    solver, u0 = ge._build(nx, ny, method="mood")
    u0 = solver.post_stage(u0)
    t = jnp.zeros(())
    dt = jnp.full((), 1e-5)

    n_dofs = 4 * solver.basis.K * nx * ny
    p = solver.basis.degree

    # dispatch floor: an empty loop body (one add keeps it un-DCE-able)
    floor = bench_loop(lambda u: u + 0.0, u0, reps=REPS)
    print(f"(floor: trivial axpy loop {floor:8.3f} ms/iter)")

    # the real chunked production loop
    multi = solver._multi_step(REPS)
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
    ms_step = best * 1e3 / int(out[2])
    print(f"step           {ms_step:8.3f} ms   "
          f"({n_dofs / ms_step * 1e3 / 1e9:.3f} GDoF/s)")
    st = out[4]
    print(f"  last-step cascade: passes={int(st.iters)} "
          f"n_reduce={int(st.n_reduce)} n_marked={int(st.n_marked)}")

    from dflo_tpu.ops.pallas_kernels import make_fused_modal_pos
    ftp_t = make_fused_modal_pos(solver.basis, u0.dtype, with_trunc=True)
    deg = jnp.full(u0.shape[-2:], p, jnp.int32)
    stage_fn = getattr(solver.rhs, "stage", None)

    def cand(u):
        u_t = ftp_t(u, deg)
        if stage_fn is not None:
            return stage_fn(u_t, u_t, t, 0.0, dt)
        return u_t + dt * solver.rhs(u_t, t)

    print(f"candidate      {bench_loop(cand, u0):8.3f} ms")
    print(f"rhs            {bench_loop(lambda u: solver.rhs(u, t), u0):8.3f}"
          " ms")
    print(f"trunc_pos      {bench_loop(lambda u: ftp_t(u, deg), u0):8.3f} ms")

    # DMP/u2/dilate bookkeeping on a candidate state: thread u through
    # unchanged, fold the check results in at epsilon weight so the loop
    # body cannot be DCE'd
    from dflo_tpu.stab import mood as mood_mod
    from dflo_tpu.stab.limiter import neighbor_valid
    valid = tuple(jnp.asarray(v) for v in
                  neighbor_valid((ny, nx), False, False, None))
    avg0 = float((solver.basis.wq2 @ solver.basis.V)[0])
    lim0 = jnp.zeros(u0.shape[-2:], bool)

    def make_checks(window: bool):
        if window:   # the production (non-periodic, unmasked) forms
            mn_f = lambda a: mood_mod.plus_min(a)            # noqa: E731
            mx_f = lambda a: mood_mod.plus_max(a)            # noqa: E731
            dil = mood_mod.dilate4_window
        else:
            mn_f = lambda a: mood_mod.neighborhood_min(a, valid)  # noqa: E731
            mx_f = lambda a: mood_mod.neighborhood_max(a, valid)  # noqa: E731
            dil = mood_mod.dilate4

        def checks(u):
            rho0 = avg0 * u[2, 0]
            dmp_min = mn_f(rho0)
            dmp_max = mx_f(rho0)
            rho = avg0 * u[2, 0]
            ok = (rho - dmp_min > -1e-6) & (rho - dmp_max < 1e-6)
            for ix in (2, 2 * p + 1):
                D2 = u[2, ix]
                mn = mn_f(D2)
                mx = mx_f(D2)
                amn, amx = jnp.abs(mn), jnp.abs(mx)
                flat = jnp.maximum(amn, amx) < 1e-12
                ok = ok & (flat | ((mn * mx >= 0) & (amn >= amx * 0.5)))
            fail = ~ok
            spread = fail & lim0
            nb = dil(spread)
            return u + 1e-30 * (fail | nb).astype(u.dtype)[None, None]

        return checks

    print(f"checks(window) {bench_loop(make_checks(True), u0):8.3f} ms")
    print(f"checks(roll)   {bench_loop(make_checks(False), u0):8.3f} ms")

    marked = jnp.zeros(u0.shape[-2:], bool)

    def post(u):
        ubar = solver.cell_averages(u)
        shock = jnp.where(marked, 1e20, 0.0)
        u = solver._limit(u, ubar, shock)
        return solver._fused_modal_pos(u)

    print(f"post_chain     {bench_loop(post, u0):8.3f} ms")
    print(f"averages       "
          f"{bench_loop(lambda u: u + 1e-30 * solver.cell_averages(u)[:, None], u0):8.3f} ms")


if __name__ == "__main__":
    main()
