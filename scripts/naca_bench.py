"""naca0012 / curvilinear performance measurement (VERDICT r3 item 4).

Times on the real TPU:
  1. naca 40x160 O-mesh (examples/naca0012/naca.struct), Q1, explicit RK —
     ms/step of the chunked device loop (the mesh is tiny: 6.4k cells,
     102k DoF, so this measures dispatch+latency floor, not throughput).
  2. Same mesh, implicit backward-Euler pseudo-transient step (1 Newton
     iteration, GMRES + lagged block-Jacobi) — ms/step (the m063 workflow,
     src/claw.cc:876-933, examples/naca0012/m063.prm).
  3. Saturation-scale curvilinear block (annulus 320x1536, Q2 = the bench
     DoF class) on the XLA path — the number that decides whether a fused
     curvilinear Pallas kernel is worth building, against
  4. the SAME resolution Cartesian block on the XLA path and on the fused
     production kernels (bench.py's path), isolating metric-term overhead
     vs fused-kernel gain.

Usage: python scripts/naca_bench.py   (JAX_PLATFORMS=cpu for a host smoke
run at reduced sizes)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dflo_tpu import ic  # noqa: E402
from dflo_tpu.driver import LimiterConfig, Solver  # noqa: E402
from dflo_tpu.mesh import CartesianMesh  # noqa: E402
from dflo_tpu.mesh.curvilinear import annulus_mesh, load_struct  # noqa: E402
from dflo_tpu.ops.basis import make_basis  # noqa: E402
from dflo_tpu.physics import euler  # noqa: E402
from dflo_tpu.solver.spatial import BoundarySide  # noqa: E402

STRUCT = "/root/reference/examples/naca0012/naca.struct"
MACH, ALPHA = 0.63, np.deg2rad(2.0)
U0, V0 = MACH * np.cos(ALPHA), MACH * np.sin(ALPHA)
P0 = 1.0 / euler.GAMMA
E0 = P0 / (euler.GAMMA - 1.0) + 0.5 * MACH**2


def freestream(x, y, t=0.0):
    o = jnp.ones_like(x)
    return jnp.stack([U0 * o, V0 * o, o, E0 * o])


def measure(solver, u0, n_steps, n_best=3):
    u0 = solver.post_stage(u0)
    multi = solver._multi_step(n_steps)
    zero = jnp.zeros((), u0.dtype)
    t_end = jnp.asarray(1e9, u0.dtype)
    out = multi(u0, zero, t_end)            # compile + warmup
    jax.block_until_ready(out[0])
    best = float("inf")
    for _ in range(n_best):
        t0 = time.perf_counter()
        out = multi(u0, zero, t_end)
        jax.block_until_ready(out[0])
        best = min(best, time.perf_counter() - t0)
    n_done = int(out[2])
    assert n_done == n_steps and not bool(out[3]), (n_done, bool(out[3]))
    return best / n_steps


def main():
    on_tpu = jax.default_backend() == "tpu"
    results = {}

    # ---- 1+2: the real naca O-mesh ------------------------------------
    basis = make_basis("Qk", 1)
    mesh = load_struct(STRUCT)
    bcs = dict(W=BoundarySide(euler.BC_PERIODIC),
               E=BoundarySide(euler.BC_PERIODIC),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_FARFIELD, freestream))
    n_dofs = 4 * basis.K * mesh.ny * mesh.nx
    u = ic.set_initial_condition(basis, mesh, freestream)

    s_exp = Solver(basis, mesh, bcs, flux="roe", cfl=0.5)
    n = 200 if on_tpu else 20
    sec = measure(s_exp, u, n)
    results["naca_q1_explicit_ms_per_step"] = sec * 1e3
    results["naca_q1_explicit_rate"] = n_dofs / sec
    print(f"naca 40x160 Q1 explicit RK   {sec * 1e3:8.3f} ms/step "
          f"({n_dofs / sec:.3e} DoF-updates/s)")

    s_imp = Solver(basis, mesh, bcs, flux="roe", cfl=2.0, method="implicit",
                   max_nonlin_iter=1, linear_residual=1e-2,
                   gmres_restart=20, gmres_maxiter=1,
                   precondition="block_jacobi", time_step_type="local")
    n = 20 if on_tpu else 3
    sec = measure(s_imp, u, n)
    results["naca_q1_implicit_ms_per_step"] = sec * 1e3
    print(f"naca 40x160 Q1 implicit PTC  {sec * 1e3:8.3f} ms/step "
          f"(1 Newton it, GMRES(20) + lagged block-Jacobi)")

    # ---- 3: saturation-scale curvilinear (XLA path) -------------------
    ny, nx = (320, 1536) if on_tpu else (48, 192)
    basis2 = make_basis("Qk", 2)
    ann = annulus_mesh(1.0, 3.0, ny, nx)
    bcs_a = dict(W=BoundarySide(euler.BC_PERIODIC),
                 E=BoundarySide(euler.BC_PERIODIC),
                 S=BoundarySide(euler.BC_SLIP),
                 N=BoundarySide(euler.BC_FARFIELD, freestream))
    lim = LimiterConfig(type="TVB", shock_indicator="density", beta=2.0,
                        char_lim=True, pos_lim=True)
    # q1 mappings use the mapping-general minmax limiter (TVB is
    # cartesian-only, src/parameters.cc:545-546)
    lim_c = LimiterConfig(type="minmax", shock_indicator="density",
                          char_lim=True, pos_lim=True)
    n_dofs2 = 4 * basis2.K * ny * nx
    ua = ic.set_initial_condition(basis2, ann, freestream)
    s_ann = Solver(basis2, ann, bcs_a, flux="hllc", limiter=lim_c, cfl=0.4)
    n = 20 if on_tpu else 3
    sec = measure(s_ann, ua, n)
    results["curvi_q2_xla_rate"] = n_dofs2 / sec
    print(f"annulus {ny}x{nx} Q2 XLA curvilinear  {sec * 1e3:8.3f} ms/step "
          f"({n_dofs2 / sec:.3e} DoF-updates/s)")

    # ---- 4: same-size Cartesian, XLA vs fused -------------------------
    cart = CartesianMesh(nx, ny, 0.0, 4.0, 0.0, 1.0)
    bcs_c = dict(W=BoundarySide(euler.BC_PERIODIC),
                 E=BoundarySide(euler.BC_PERIODIC),
                 S=BoundarySide(euler.BC_SLIP),
                 N=BoundarySide(euler.BC_FARFIELD, freestream))
    uc = ic.set_initial_condition(basis2, cart, freestream)
    # 'fused' is passed EXPLICITLY (not 'auto'): auto resolves to xla off-TPU,
    # which would silently mislabel a host smoke run (ADVICE r4); fused
    # raises outside its envelope, so a wrong-platform run fails loudly
    for label, kern in (("xla", "xla"), ("fused", "fused")):
        s_c = Solver(basis2, cart, bcs_c, flux="hllc", limiter=lim, cfl=0.4,
                     volume_kernel=kern, post_kernel=kern)
        sec = measure(s_c, uc, n)
        results[f"cart_q2_{label}_rate"] = n_dofs2 / sec
        print(f"cartesian {ny}x{nx} Q2 {label:5s}          "
              f"{sec * 1e3:8.3f} ms/step ({n_dofs2 / sec:.3e} DoF-updates/s)")

    print(json.dumps({"metric": "naca_curvi_perf", **results}))


if __name__ == "__main__":
    main()
