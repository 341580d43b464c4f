"""Command-line driver: ``python -m dflo_tpu input.prm``.

Re-implements the reference's main() + run() orchestration
(src/main.cc:13-81, src/claw.cc:953-1130): parse the .prm config, build the
mesh (from the Gmsh .geo/.msh referenced by `mesh file`, or the native
`cartesian mesh` subsection), wire boundary ids to domain sides, set the IC,
time-march with the configured flux/limiter chain, write VTU output and
physics monitors on cadence, and report wall time (src/main.cc:50-54).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from dflo_tpu import ic as ic_mod
from dflo_tpu.config.params import AllParameters
from dflo_tpu.diagnostics import angular_momentum
from dflo_tpu.driver import LimiterConfig, Solver
from dflo_tpu.io.vtk import write_tecplot, write_vtu
from dflo_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, SegmentedSide


def build_domain(params: AllParameters, prm_dir: str = "."):
    """Mesh + mask + per-side boundary ids from the config."""
    cm = params.cartesian_mesh
    if params.mesh_type == "cartesian" or cm.nx > 0:
        mesh = CartesianMesh(cm.nx, cm.ny, cm.x0, cm.x1, cm.y0, cm.y1)
        side_bids = {"W": np.full(cm.ny, 4), "E": np.full(cm.ny, 2),
                     "S": np.full(cm.nx, 1), "N": np.full(cm.nx, 3)}
        # native meshes use the Gmsh-free convention S=1,E=2,N=3,W=4
        mask = None
        if cm.solid is not None:
            xc, yc = mesh.cell_centers()
            import jax.numpy as jnp
            mask = ~np.asarray(cm.solid(jnp.asarray(xc), jnp.asarray(yc)),
                               bool)
        return mesh, mask, side_bids
    path = os.path.join(prm_dir, params.mesh_filename)
    if not os.path.exists(path):
        # the reference ships .geo generators (and naca0012 a .struct grid
        # its makefile converts via struct2gmsh.f), not .msh files; fall back
        stem = os.path.splitext(path)[0]
        candidates = [path, stem + ".geo", stem + ".struct"] + [
            os.path.join(prm_dir, f) for f in sorted(os.listdir(prm_dir))
            if f.endswith((".geo", ".struct"))]
        path = next((c for c in candidates if os.path.exists(c)), None)
        if path is None:
            raise FileNotFoundError(
                f"mesh file {params.mesh_filename!r} not found "
                f"(src/claw.cc:961 fatal)")
    if path.endswith(".struct"):
        # structured O-mesh (naca.struct): wrap-periodic in xi, airfoil at
        # eta=0 (boundary id 0), farfield at eta=max (boundary id 1)
        from dflo_tpu.mesh.curvilinear import load_struct
        cmesh = load_struct(path)
        side_bids = {"W": np.full(cmesh.ny, -2), "E": np.full(cmesh.ny, -2),
                     "S": np.full(cmesh.nx, 0), "N": np.full(cmesh.nx, 1)}
        return cmesh, None, side_bids
    if path.endswith(".geo"):
        from dflo_tpu.mesh.geo import UnstructuredDomain, load_geo
        dom = load_geo(path)
        if isinstance(dom, UnstructuredDomain):
            return dom.mesh, None, None    # general-quad path, bids per face
        return dom.mesh, dom.mask, dom.side_bids
    from dflo_tpu.mesh.msh import load_msh
    try:
        dom = load_msh(path)
    except ValueError:
        # not a uniform raster: general unstructured quad mesh
        from dflo_tpu.mesh.unstructured import from_msh
        return from_msh(path), None, None
    return dom.mesh, dom.mask, dom.side_bids


def build_bcs(params: AllParameters, side_bids: dict):
    """Map the boundary_N config table onto the four domain sides."""
    wall = BoundarySide(euler.BC_SLIP)
    sides = {}
    for name, bids in side_bids.items():
        uniq = sorted(set(int(b) for b in bids))
        segs, seg_of = [], {}
        for b in uniq:
            spec = params.boundary_conditions.get(b)
            if b == -2:
                segs.append(BoundarySide(euler.BC_PERIODIC))  # O-mesh wrap
            elif b < 0 or spec is None:
                segs.append(wall)          # bbox edge behind solid region
            else:
                segs.append(BoundarySide(spec.kind, spec.values))
            seg_of[b] = len(segs) - 1
        seg_id = np.array([seg_of[int(b)] for b in bids], np.int32)
        if len(segs) == 1:
            sides[name] = segs[0]
        else:
            sides[name] = SegmentedSide(seg_id, tuple(segs))
    return sides


def build_ic(params: AllParameters):
    if params.ic_function in ic_mod.IC_FUNCTIONS:
        return ic_mod.IC_FUNCTIONS[params.ic_function](params)
    return params.initial_conditions


def set_ic(params: AllParameters, solver):
    """Initial state incl. the cell-centered setter family
    (src_gll/ic.cc:226-345)."""
    from dflo_tpu.driver_unstruct import (UnstructuredSolver,
                                          set_initial_condition_unstructured)
    if isinstance(solver, UnstructuredSolver):
        return set_initial_condition_unstructured(
            solver.basis, solver.mesh, build_ic(params))
    if params.ic_function in ic_mod.IC_CELLWISE:
        fn = ic_mod.IC_CELLWISE[params.ic_function](params)
        return solver.apply_mask(ic_mod.set_initial_condition_cellcentered(
            solver.basis, solver.mesh, fn))
    fn = build_ic(params)
    return solver.apply_mask(ic_mod.set_initial_condition(
        solver.basis, solver.mesh, fn))


def _build_source(params: AllParameters, unstructured: bool = False):
    """Body-force callable from the config (gravity / external force /
    potential-gradient on general meshes)."""
    source = None
    if params.gravity != 0.0:
        g = params.gravity

        def source(x, y, t, W):  # (src/equation.h:829-850)
            return euler.forcing_gravity(W, (0.0, -g))

    elif params.external_force is not None:
        ef = params.external_force

        def source(x, y, t, W):  # (src_mpi/equation.h:1186-1202)
            fx, fy = ef(x, y, t)
            return euler.forcing_external(W, fx, fy)

    return source


def _reentrant_corners(mesh, mask):
    """Solid-region corner points poking into the fluid (3 fluid cells in a
    2x2 node neighborhood) — the forward-step corner the reference
    prerefines (src/refine.cc:110-133), found generically from the mask."""
    m = np.asarray(mask, bool)
    pins = []
    for iy in range(1, mesh.ny):
        for ix in range(1, mesh.nx):
            if m[iy - 1:iy + 1, ix - 1:ix + 1].sum() == 3:
                pins.append((mesh.x0 + ix * mesh.dx, mesh.y0 + iy * mesh.dy))
    return pins



def _maybe_trace(args):
    """jax.profiler device-trace context for --profile DIR (SURVEY 5.1:
    the TPU analog of the reference's TimerOutput phase scopes)."""
    import contextlib
    if getattr(args, "profile", None):
        from dflo_tpu.utils.profiling import device_trace
        return device_trace(args.profile)
    return contextlib.nullcontext()


def build_solver(params: AllParameters, prm_dir: str = ".", device_mesh=None,
                 domain=None):
    mesh, mask, side_bids = (domain if domain is not None
                             else build_domain(params, prm_dir))

    from dflo_tpu.ops.basis import make_basis
    family = {"Qk": "Qk", "Pk": "Pk", "GLL": "Qk_gll"}[params.basis]
    basis = make_basis(family, params.degree)

    if side_bids is None:
        # general unstructured quad mesh: per-face boundary-id table
        from dflo_tpu.driver_unstruct import UnstructuredSolver
        bc_table = {bid: BoundarySide(spec.kind, spec.values)
                    for bid, spec in params.boundary_conditions.items()}
        lim = LimiterConfig(
            type=params.limiter.type,
            shock_indicator=params.limiter.shock_indicator,
            M=params.limiter.M, beta=params.limiter.beta,
            char_lim=params.limiter.char_lim,
            pos_lim=params.limiter.pos_lim)
        fixed_dt = params.time_step if (params.cfl <= 0
                                        and params.time_step > 0) else None
        well_balanced = None
        if (params.potential is not None and params.gravity == 0.0
                and params.external_force is None):
            # gravity-potential runs belong to the src_gll tree: GLL
            # collocation + the well-balanced source
            basis = make_basis("Qk_gll", params.degree)
            well_balanced = params.well_balanced
        method_u = "implicit" if params.solver.implicit else "rk"
        if device_mesh is not None:
            # flat-cell decomposition: 1-D ('cells',) mesh over the same
            # devices (the 2-D grid mesh is a structured-path concept)
            from jax.sharding import Mesh as _Mesh
            device_mesh = _Mesh(device_mesh.devices.reshape(-1), ("cells",))
        solver = UnstructuredSolver(
            basis, mesh, bc_table, flux=params.flux.flux, limiter=lim,
            source=_build_source(params, unstructured=True), cfl=params.cfl,
            fixed_time_step=fixed_dt, well_balanced=well_balanced,
            potential=params.potential, method=method_u, theta=params.theta,
            max_nonlin_iter=params.max_nonlin_iter,
            linear_residual=params.solver.linear_residual,
            time_step_type=params.time_step_type, device_mesh=device_mesh)
        return solver, None

    bcs = build_bcs(params, side_bids)

    lim = LimiterConfig(
        type=params.limiter.type,
        shock_indicator=params.limiter.shock_indicator,
        M=params.limiter.M, beta=params.limiter.beta,
        char_lim=params.limiter.char_lim, pos_lim=params.limiter.pos_lim,
        conserve_angular_momentum=params.limiter.conserve_angular_momentum)

    source = _build_source(params)

    well_balanced = None
    if (params.potential is not None and params.gravity == 0.0
            and params.external_force is None):
        # the potential IS the force description (src_gll tree semantics,
        # src_gll/parameters.cc:358).  With a plain `gravity` constant (src
        # tree semantics) the potential entry is documentation only — the
        # reference trees never consume both, and passing both would
        # double-apply the force (make_rhs rejects the combination).
        well_balanced = params.well_balanced

    if params.solver.method == "mood":
        method = "mood"
    elif params.solver.implicit:
        method = "implicit"
    else:
        method = "rk"

    if params.refinement.do_refine:
        # runtime AMR (src/refine.cc + src/claw.cc:1112-1128)
        from dflo_tpu.amr_pool import AMRConfig, AMRSolver
        if method != "rk":
            raise ValueError("`refinement = true` supports the explicit RK "
                             "path (the reference's AMR cases are explicit)")
        if not isinstance(mesh, CartesianMesh):
            raise ValueError("`refinement = true` needs a Cartesian(-raster) "
                             "mesh; curvilinear AMR is not supported")
        # prefer T=2: at T=4 a tile refines up to 16x more cells than exact
        # per-cell flags would (src/refine.cc:48-60); T=2 caps the waste at
        # 4x for the same pool capacity (the accounting is printed per
        # adaptation event).  `set tile = 1` requests exact per-cell flags.
        cands = ((params.refinement.tile,) if params.refinement.tile
                 else (2, 4, 1))
        for T in cands:
            if mesh.nx % T == 0 and mesh.ny % T == 0:
                if mask is None:
                    break
                tiles = np.asarray(mask, bool).reshape(
                    mesh.ny // T, T, mesh.nx // T, T)
                if (tiles.all(axis=(1, 3)) == tiles.any(axis=(1, 3))).all():
                    break
        else:
            raise ValueError(
                f"refinement tile {cands} incompatible with the "
                f"{mesh.ny}x{mesh.nx} grid/mask")
        amr_cfg = AMRConfig(shock_value=params.refinement.shock_value,
                            shock_levels=max(params.refinement.shock_levels, 1),
                            iter_step=params.refinement.iter_step,
                            max_elements=params.refinement.max_elements,
                            tile=T)
        pins = _reentrant_corners(mesh, mask) if mask is not None else ()
        solver = AMRSolver(basis, mesh, bcs, flux=params.flux.flux,
                           amr=amr_cfg, limiter=lim,
                           cfl=params.cfl if params.cfl > 0 else 0.9,
                           mask=mask, pins=pins)
        return solver, mask

    fixed_dt = params.time_step if (params.cfl <= 0 and params.time_step > 0
                                    and not params.is_stationary) else None
    solver = Solver(basis, mesh, bcs, flux=params.flux.flux, limiter=lim,
                    source=source, cfl=params.cfl, mask=mask,
                    device_mesh=device_mesh, method=method,
                    well_balanced=well_balanced, potential=params.potential,
                    mass_matrix=params.mass_matrix, theta=params.theta,
                    max_nonlin_iter=params.max_nonlin_iter,
                    linear_residual=params.solver.linear_residual,
                    fixed_time_step=fixed_dt,
                    time_step_type=params.time_step_type)

    if (params.is_stationary and method == "implicit" and mask is None
            and device_mesh is None
            and mesh.ny % 2 == 0 and mesh.nx % 2 == 0):
        # steady solves get a 2x-coarsened companion for grid sequencing
        # (run_steady_sequenced): plain PTC limit-cycles on fine meshes
        # with strong local features (the naca TE); see solver/implicit.py
        from dflo_tpu.mesh.curvilinear import CurvilinearMesh
        cmesh = None
        if isinstance(mesh, CartesianMesh):
            cmesh = CartesianMesh(mesh.nx // 2, mesh.ny // 2,
                                  mesh.x0, mesh.x1, mesh.y0, mesh.y1)
        elif isinstance(mesh, CurvilinearMesh):
            X = np.asarray(mesh.X)
            Y = np.asarray(mesh.Y)
            cmesh = CurvilinearMesh(X[::2, ::2].copy(), Y[::2, ::2].copy())
        if cmesh is not None:
            solver.steady_coarse = Solver(
                basis, cmesh, bcs, flux=params.flux.flux, limiter=lim,
                source=source, cfl=params.cfl, method=method,
                well_balanced=well_balanced, potential=params.potential,
                mass_matrix=params.mass_matrix, theta=params.theta,
                max_nonlin_iter=params.max_nonlin_iter,
                linear_residual=params.solver.linear_residual,
                time_step_type=params.time_step_type)
    return solver, mask


def _main_amr(args, params, solver, timer, t_wall):
    """Run loop for the adaptive (tile-pool) solver: initial adaptation,
    adaptation cadence inside run(), VTU snapshots with a level field."""
    from dflo_tpu.io.vtk import write_vtu_amr
    if params.ic_function in ic_mod.IC_CELLWISE:
        raise ValueError("cell-centered ICs are not supported with "
                         "`refinement = true` yet")
    fn = build_ic(params)
    pools = solver.set_ic(fn)
    print(f"dflo_tpu AMR: {solver.basis.family}{solver.basis.degree}, "
          f"tiles {solver.nty}x{solver.ntx} (T={solver.T}), "
          f"levels<={solver.max_level}, "
          f"{solver.n_active_cells()} active cells")
    t_end = args.final_time if args.final_time is not None \
        else params.final_time
    out_iter = params.output.output_iter_step
    snap = [0]

    def write_snapshot(pools, t):
        with timer("Output"):
            path = os.path.join(args.output_dir,
                                f"solution-{snap[0]:03d}.vtu")
            write_vtu_amr(path, solver, pools, t=t)
        snap[0] += 1

    write_snapshot(pools, 0.0)

    def callback(pools, t, it):
        if it % 50 == 0 or t >= t_end - 1e-12:
            line = (f"  it={it:6d}  t={t:.6f}  "
                    f"cells={solver.n_active_cells()}")
            st = solver.last_adapt_stats
            if st is not None:
                # tile-granularity overhead vs exact per-cell flags
                # (src/refine.cc:48-60 baseline)
                line += (f"  [tile T={solver.T}: active="
                         f"{st.get('cells_active_after', st['cells_active'])}"
                         f" vs per-cell={st['cells_percell_scheme']}]")
            print(line)
        if out_iter and it % out_iter == 0:
            write_snapshot(pools, t)

    with timer("Time loop"), _maybe_trace(args):
        pools, t, it = solver.run(pools, t_end, callback=callback,
                                  max_steps=args.max_steps)
    write_snapshot(pools, t)
    print(timer.summary())
    print(f"steps={it}  final t={t:.6f}  wall={time.time() - t_wall:.1f}s")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="dflo_tpu", description="TPU-native DG Euler solver")
    ap.add_argument("prm", help="deal.II-style .prm configuration file")
    ap.add_argument("--output-dir", default="output")
    ap.add_argument("--final-time", type=float, default=None,
                    help="override the config's final time")
    ap.add_argument("--max-steps", type=int, default=10**7,
                    help="stop after N time steps (smoke tests)")
    ap.add_argument("--resume", default=None, help="checkpoint to resume from")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="save a checkpoint every N outputs")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu)")
    ap.add_argument("--x64", action="store_true",
                    help="run in float64 (parity studies)")
    ap.add_argument("--chunk", type=int, default=1,
                    help="steps per device-side loop between host syncs "
                         "(production throughput; cadences are then chunk-"
                         "granular)")
    ap.add_argument("--devices", type=int, default=0,
                    help="shard the domain over N devices (domain "
                         "decomposition, the mpirun -np N analog; "
                         "0 = single device)")
    ap.add_argument("--slices", type=int, default=0,
                    help="with --devices: arrange them as S DCN-connected "
                         "slices x (devices/S) per slice — the slice axis "
                         "carries only the adjacent-band halo row")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of the time "
                         "loop into DIR (TensorBoard/XProf; the named "
                         "scopes of utils/profiling appear in the trace)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    try:
        # persistent compile cache: repeated CLI runs (and the examples
        # matrix) skip the multi-minute first-compile on the TPU tunnel
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    t_wall = time.time()
    from dflo_tpu.utils.profiling import Timer
    timer = Timer()
    params = AllParameters.from_prm_file(args.prm)
    prm_dir = os.path.dirname(os.path.abspath(args.prm))
    with timer("Setup"):
        domain = build_domain(params, prm_dir)
        dm = None
        if args.devices:
            from dflo_tpu.parallel.sharding import (compatible_shape,
                                                    device_mesh,
                                                    device_mesh_multislice)
            devs = jax.devices()[:args.devices]
            # pick the most-square device layout whose row/column splits
            # divide the cell grid (cell_sharding needs no padding)
            shape = None
            dmesh = domain[0]
            if hasattr(dmesh, "nx"):
                shape = compatible_shape(len(devs), dmesh.ny, dmesh.nx,
                                         n_slices=args.slices or 1)
                if shape is None:
                    raise SystemExit(
                        f"no {len(devs)}-device layout divides the "
                        f"{dmesh.ny}x{dmesh.nx} cell grid"
                        + (f" with {args.slices} slices" if args.slices
                           else ""))
            dm = (device_mesh_multislice(args.slices, shape=shape,
                                         devices=devs)
                  if args.slices else device_mesh(shape, devices=devs))
            print(f"domain decomposition: {dm.devices.shape} device mesh "
                  f"{dm.axis_names}")
        solver, mask = build_solver(params, prm_dir, device_mesh=dm,
                                    domain=domain)
    basis, mesh = solver.basis, solver.mesh
    mesh_desc = (f"{mesh.nx}x{mesh.ny}" if hasattr(mesh, "nx")
                 else f"{mesh.n_cells} cells (unstructured)")
    print(f"dflo_tpu: {basis.family}{basis.degree}, mesh {mesh_desc}, "
          f"flux={params.flux.flux}, limiter={params.limiter.type}")

    from dflo_tpu.amr_pool import AMRSolver
    if isinstance(solver, AMRSolver):
        return _main_amr(args, params, solver, timer, t_wall)

    u = set_ic(params, solver)
    if dm is not None:
        u = solver.shard(u)
    t0, it0 = 0.0, 0
    if args.resume:
        u, t0, it0, _ = load_checkpoint(args.resume, basis=basis, mesh=mesh)

    t_end = args.final_time if args.final_time is not None \
        else params.final_time
    out_iter = params.output.output_iter_step
    out_tstep = params.output.output_time_step
    next_out_t = [out_tstep]          # src/claw.cc:1093-1099 time cadence
    ang_iter = params.output.ang_mom_step
    snap = [0]

    from dflo_tpu.driver_unstruct import UnstructuredSolver
    unstructured = isinstance(solver, UnstructuredSolver)
    solver_method = getattr(solver, "method", "rk")

    # mu_shock diagnostic field (src/mu_shock.cc:288-374, written with the
    # solution in src/output.cc:95-105); ghost-state boundary jumps
    mu_fn = None
    if (params.diffusion_coef != 0.0 and not unstructured
            and not getattr(solver, "curvilinear", False)):
        from dflo_tpu.physics import euler as _euler
        from dflo_tpu.stab.mushock import make_mu_shock
        per_x = getattr(solver.bcs["W"], "kind", None) == _euler.BC_PERIODIC
        per_y = getattr(solver.bcs["S"], "kind", None) == _euler.BC_PERIODIC
        mu_fn = jax.jit(make_mu_shock(basis, mesh, params.diffusion_coef,
                                      per_x, per_y, bcs=solver.bcs))

    def write_snapshot(u, t):
        with timer("Output"):
            if dm is not None and not unstructured \
                    and params.output.format != "tecplot":
                # per-device pieces + master record (src_mpi/output.cc:51-84)
                from dflo_tpu.io.vtk import write_vtu_parallel
                write_vtu_parallel(args.output_dir, snap[0], basis, mesh, u,
                                   t=t, schlieren=params.output.schlieren_plot,
                                   mask=mask)
                snap[0] += 1
                return
            if unstructured:
                from dflo_tpu.io.vtk import write_vtu_unstructured
                path = os.path.join(args.output_dir,
                                    f"solution-{snap[0]:03d}.vtu")
                write_vtu_unstructured(
                    path, basis, mesh, np.asarray(u), t=t,
                    schlieren=params.output.schlieren_plot)
            elif params.output.format == "tecplot":
                path = os.path.join(args.output_dir,
                                    f"solution-{snap[0]:03d}.plt")
                write_tecplot(path, basis, mesh, np.asarray(u), t=t, mask=mask)
            else:
                path = os.path.join(args.output_dir,
                                    f"solution-{snap[0]:03d}.vtu")
                extra = None
                if mu_fn is not None:
                    extra = {"mu_shock": np.asarray(
                        mu_fn(u, solver.cell_averages(u), t))}
                write_vtu(path, basis, mesh, np.asarray(u), t=t,
                          schlieren=params.output.schlieren_plot, mask=mask,
                          extra_cell_fields=extra)
        if args.checkpoint_every and snap[0] % args.checkpoint_every == 0:
            save_checkpoint(os.path.join(args.output_dir,
                                         f"checkpoint-{snap[0]:03d}.npz"),
                            u, t, snap[0], basis=basis, mesh=mesh)
        snap[0] += 1

    write_snapshot(u, t0)

    verbose = params.solver.output == "verbose"
    residual_history = []

    def callback(u, t, it):
        if it % 50 == 0 or t >= t_end - 1e-12 or verbose:
            line = f"  it={it0 + it:6d}  t={t:.6f}"
            stats = getattr(solver, "last_stats", None)
            if solver_method == "mood" and stats is not None:
                # cascade counters (src/claw.cc:851 printout)
                line += (f"  mood: reduce={int(stats.n_reduce)}"
                         f" limit={int(stats.n_marked)}"
                         f" passes={int(stats.iters)}")
            elif solver_method == "implicit" and stats is not None:
                # Newton residual history + linear-solver stats
                # (src/claw.cc:913-914, 1090)
                res = float(stats.res)
                residual_history.append(res)
                line += (f"  newton: res={res:.3e} iters={int(stats.iters)}"
                         f" lin_res={float(stats.lin_res):.1e}")
                if float(stats.lin_res) > solver.linear_residual * 1.001:
                    # tolerated non-convergence: warn and continue
                    # (src/claw.cc:677-687)
                    line += "  WARNING: linear solver did not converge"
            elif verbose:
                # explicit per-step rhs norm (src/claw.cc:749,768-769)
                import jax.numpy as _jnp
                res = float(_jnp.sqrt(_jnp.sum(solver.rhs(u, t) ** 2)))
                residual_history.append(res)
                line += f"  res={res:.3e}"
            print(line)
        if out_iter and it % out_iter == 0:
            write_snapshot(u, t)
        elif t + 1e-12 >= next_out_t[0]:
            write_snapshot(u, t)
            next_out_t[0] += out_tstep
        if ang_iter and it % ang_iter == 0 and not unstructured:
            am = float(angular_momentum(basis, mesh, u, mask))
            print(f"Total angular momentum: {t:18.8e} {am:24.14e}")

    with timer("Time loop"), _maybe_trace(args):
        if params.is_stationary and solver.method == "implicit":
            # pseudo-transient steady solve (naca0012 m063.prm workflow),
            # grid-sequenced when a coarse companion exists
            from dflo_tpu.solver.implicit import (run_steady,
                                                  run_steady_sequenced)
            coarse = getattr(solver, "steady_coarse", None)
            if coarse is not None:
                u, hist = run_steady_sequenced(
                    solver, coarse, u, cfl0=params.cfl,
                    min_residual=params.min_residual or 1e-10,
                    max_steps=min(100000, args.max_steps), verbose=True)
            else:
                u, hist = run_steady(
                    solver, u, cfl0=params.cfl,
                    min_residual=params.min_residual or 1e-10,
                    max_steps=min(100000, args.max_steps), verbose=True)
            t, it = t0, len(hist)
        else:
            u, t, it = solver.run(u, t_end, t0=t0, callback=callback,
                                  chunk=max(args.chunk, 1),
                                  max_steps=args.max_steps)
        import jax as _jax
        _jax.block_until_ready(u)
    write_snapshot(u, t)
    print(timer.summary())
    print(f"steps={it}  final t={t:.6f}  wall={time.time() - t_wall:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
