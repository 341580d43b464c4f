"""General unstructured-quad path: mesh construction, gather-based DG
residual (solver/spatial_unstruct), minmax limiter, well-balanced gravity,
and the delquad-disk ingestion (mesh/geo.to_disk + mesh/unstructured) —
the reference's arbitrary-Gmsh-mesh capability (src/claw.cc:956-967,
src_mpi/limiter.cc:397-555, src_gll/assemble_explicit.cc:30-135)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dflo_tpu import ic
from dflo_tpu.driver import LimiterConfig
from dflo_tpu.driver_unstruct import (UnstructuredSolver,
                                      set_initial_condition_unstructured)
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.mesh.unstructured import (UnstructuredQuadMesh, disk_butterfly,
                                        from_curvilinear, from_msh)
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.ops.contract import basis_apply
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, make_rhs
from dflo_tpu.solver.spatial_unstruct import make_rhs_unstructured

# integration/e2e tier: minutes of CPU emulation; the quick dev tier
# skips this file (pytest.ini 'heavy'); the full suite runs it
pytestmark = pytest.mark.heavy


def _pot(x, y, t=0.0):
    return jnp.sqrt(x * x + y * y)


def iso_eq(x, y, t=0.0):
    r = jnp.sqrt(x * x + y * y)
    z = jnp.zeros_like(x)
    return jnp.stack([z, z, jnp.exp(-r), jnp.exp(-r) / (euler.GAMMA - 1.0)])


# ---------------------------------------------------------------------------
# mesh construction
# ---------------------------------------------------------------------------

def test_disk_butterfly_geometry():
    mesh = disk_butterfly(1.0, 2 * np.pi / 60)
    # conforming (constructor raises otherwise), positive areas; area -> pi
    # at the straight-edge (Q1 geometry) rate ~ 2pi^3/(3 n_rim^2)
    assert mesh.cell_measure().min() > 0
    n_rim = len(mesh.faces.bcell)
    deficit = np.pi - mesh.cell_measure().sum()
    assert 0 < deficit < 4.0 * np.pi**3 / (3.0 * n_rim**2)
    # every boundary face carries the physical id
    assert (mesh.faces.bid == 1).all()
    # Euler characteristic of a disk: V - E + F = 1
    nf = len(mesh.faces.cell_l) + len(mesh.faces.bcell)
    assert len(mesh.nodes) - nf + mesh.n_cells == 1


def test_face_trace_continuity_exact():
    """A globally linear field is exactly representable; its traces must
    agree across every face (validates gather tables + orientation flips)."""
    basis = make_basis("Qk", 1)
    mesh = disk_butterfly(1.0, 2 * np.pi / 40)
    N = mesh.n_cells
    f = mesh.faces
    xn, yn = mesh.point_coords(np.asarray(basis.nodes))
    u = jnp.asarray(0.3 + 1.7 * xn - 0.9 * yn)[None]
    nq = basis.nq
    T = basis_apply(jnp.asarray(basis.faceV.reshape(-1, basis.K)), u)
    T4 = jnp.moveaxis(T.reshape(1, 4, nq, N), 1, 2).reshape(1, nq, 4 * N)
    UL = np.array(T4[:, :, f.side_l * N + f.cell_l])
    URr = np.array(T4[:, :, f.side_r * N + f.cell_r])
    UR = np.where(f.flip_r[None, None, :], URr[:, ::-1, :], URr)
    assert np.abs(UL - UR).max() < 1e-13


def test_from_msh_roundtrip(tmp_path):
    """Gmsh 2.2 ASCII reader: quads + boundary lines with physical ids."""
    msh = tmp_path / "two.msh"
    msh.write_text("""$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
6
1 0 0 0
2 1 0 0
3 2 0 0
4 0 1 0
5 1 1 0
6 2 1 0
$EndNodes
$Elements
4
1 3 2 100 1 1 2 5 4
2 3 2 100 1 2 3 6 5
3 1 2 7 1 1 2
4 1 2 8 1 4 5
$EndElements
""")
    mesh = from_msh(str(msh))
    assert mesh.n_cells == 2
    assert len(mesh.faces.cell_l) == 1          # one shared interior face
    assert set(mesh.faces.bid.tolist()) == {-1, 7, 8}


# ---------------------------------------------------------------------------
# residual correctness
# ---------------------------------------------------------------------------

def test_rhs_matches_cartesian_path():
    """A Cartesian grid viewed as an unstructured mesh must reproduce the
    structured residual to roundoff (same scheme, different assembly)."""
    basis = make_basis("Qk", 2)
    cm = CartesianMesh(12, 8, -5.0, 5.0, -2.0, 2.0)
    um = from_curvilinear(cm, side_bids={"W": 1, "E": 2, "S": 3, "N": 4})
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 0.5), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.625)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_FARFIELD, inflow))
    bct = {1: bcs["W"], 2: bcs["E"], 3: bcs["S"], 4: bcs["N"]}
    u = ic.set_initial_condition(basis, cm, ic.isentropic_vortex())
    R_s = np.array(make_rhs(basis, cm, bcs, flux="hllc")(u, 0.0))
    uf = jnp.asarray(np.array(u).reshape(4, basis.K, -1))
    R_u = np.array(make_rhs_unstructured(basis, um, bct, flux="hllc")(uf, 0.0))
    np.testing.assert_allclose(R_u.reshape(R_s.shape), R_s,
                               rtol=1e-12, atol=1e-12)


def test_free_stream_on_disk():
    """Constant state => zero residual on the skewed butterfly mesh
    (metric identities + boundary machinery)."""
    basis = make_basis("Qk", 2)
    mesh = disk_butterfly(1.0, 2 * np.pi / 40)
    const = lambda x, y, t=0.0: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 0.3), jnp.full_like(x, -0.2), jnp.ones_like(x),
         jnp.full_like(x, 2.6)])
    rhs = make_rhs_unstructured(
        basis, mesh, {1: BoundarySide(euler.BC_FARFIELD, const)}, flux="roe")
    u = set_initial_condition_unstructured(basis, mesh, const)
    assert float(jnp.abs(rhs(u, 0.0)).max()) < 1e-12


def test_conservation_interior():
    """Interior face contributions telescope: with far-away boundaries the
    total conserved-state change equals the boundary flux only; verify the
    volume-weighted residual integral is reproducible against a direct
    boundary-flux quadrature for a symmetric state (mass component)."""
    basis = make_basis("Qk", 1)
    mesh = disk_butterfly(1.0, 2 * np.pi / 40)
    rhs = make_rhs_unstructured(basis, mesh,
                                {1: BoundarySide(euler.BC_SLIP)}, flux="hllc")
    u = set_initial_condition_unstructured(basis, mesh, iso_eq)
    R = rhs(u, 0.0)
    # mass integral of du/dt: slip walls admit no mass flux => exactly 0
    QX, QY = np.meshgrid(basis.xq, basis.xq, indexing="xy")
    qpts = np.stack([QX.ravel(), QY.ravel()], axis=1)
    detJ = mesh.metric(qpts)[4]
    w2 = basis.wq2
    dmass = float(np.sum((w2[:, None] * detJ) * np.array(R[euler.RHO])))
    assert abs(dmass) < 1e-13


# ---------------------------------------------------------------------------
# well-balanced gravity on q1 meshes
# ---------------------------------------------------------------------------

def test_well_balanced_on_disk():
    """Isothermal hydrostatic equilibrium preserved to machine eps on the
    fully unstructured butterfly disk — the src_gll well-balanced property
    (src_gll/assemble_explicit.cc:30-135) extended to q1 mappings via the
    discrete-operator source (the reference's quadrature form is exact only
    on Cartesian cells)."""
    basis = make_basis("Qk_gll", 1)
    mesh = disk_butterfly(1.0, 2 * np.pi / 60)
    s = UnstructuredSolver(basis, mesh, {1: BoundarySide(euler.BC_OUTFLOW)},
                           flux="hllc", cfl=0.9,
                           well_balanced="isothermal", potential=_pot)
    u0 = set_initial_condition_unstructured(basis, mesh, iso_eq)
    u, t, it = s.run(u0, 0.1)
    assert it >= 5
    assert float(jnp.abs(u - u0).max()) < 1e-12


def test_radial_rayleigh_taylor_reference_config():
    """The radial_gravity grid_uns case (examples/gravity/radial_gravity/
    input_uns.prm): butterfly disk + minmax/characteristic limiter + the
    well-balanced potential source, run from the shipped prm."""
    from dflo_tpu.cli import build_solver, set_ic
    from dflo_tpu.config.params import AllParameters
    params = AllParameters.from_prm_file(
        "/root/reference/examples/gravity/radial_gravity/input_uns.prm")
    # shrink for test runtime: the .geo requests n=700 rim points
    params.cartesian_mesh.nx = 0
    import dflo_tpu.mesh.geo as geo_mod
    orig = geo_mod.to_disk
    geo_mod.to_disk = lambda model, tol=1e-9: disk_butterfly(1.0, 2*np.pi/80)
    try:
        solver, _ = build_solver(
            params, "/root/reference/examples/gravity/radial_gravity")
    finally:
        geo_mod.to_disk = orig
    assert isinstance(solver, UnstructuredSolver)
    assert solver.basis.family == "Qk_gll"      # src_gll tree
    u = set_ic(params, solver)
    u, t, it = solver.run(u, 0.05)
    assert it >= 5 and bool(jnp.isfinite(u).all())
    ubar = solver.cell_averages(u)
    assert float(ubar[euler.RHO].min()) > 0.0


# ---------------------------------------------------------------------------
# minmax limiter (unstructured)
# ---------------------------------------------------------------------------

def test_minmax_unstructured_inactive_on_linear():
    """An exactly-linear field reconstructs within neighbor bounds =>
    theta = 1 and the limiter must not touch it (src_mpi/limiter.cc:519)."""
    from dflo_tpu.stab.limiter_unstruct import make_minmax_limiter_unstructured
    basis = make_basis("Qk", 1)
    mesh = disk_butterfly(1.0, 2 * np.pi / 40)

    def lin(x, y, t=0.0):
        rho = 2.0 + 0.1 * x - 0.05 * y
        return jnp.stack([0.3 * rho, -0.1 * rho, rho, 4.0 + 0.2 * x])

    u = set_initial_condition_unstructured(basis, mesh, lin)
    rhs = make_rhs_unstructured(basis, mesh,
                                {-1: BoundarySide(euler.BC_SLIP)}, flux="lxf")
    lim = make_minmax_limiter_unstructured(basis, mesh)
    out = lim(u, rhs.cell_averages(u), jnp.full((mesh.n_cells,), 2.0))
    # interior cells (all 4 neighbors exist) must pass through untouched;
    # rim cells may clip because the reference's theta loop includes
    # boundary faces while the bounds skip them (src_mpi/limiter.cc:457,505)
    interior = (mesh.neighbor_table() >= 0).all(axis=0)
    np.testing.assert_allclose(np.array(out)[..., interior],
                               np.array(u)[..., interior],
                               rtol=1e-10, atol=1e-10)


def test_minmax_unstructured_clips_overshoot():
    """A cell whose reconstruction overshoots its neighbors' averages gets
    its gradient clipped (Barth-Jespersen bound)."""
    from dflo_tpu.stab.limiter_unstruct import make_minmax_limiter_unstructured
    basis = make_basis("Qk", 1)
    cm = CartesianMesh(8, 8, 0.0, 1.0, 0.0, 1.0)
    mesh = from_curvilinear(cm)
    rng = np.random.default_rng(7)
    rho = 1.0 + 0.01 * rng.standard_normal((basis.K, mesh.n_cells))
    rho[:, 27] = [0.2, 1.9, 0.1, 2.1]     # wild oscillation in one cell
    z = np.zeros_like(rho)
    u = jnp.asarray(np.stack([z, z, rho, np.full_like(rho, 2.5)]))
    rhs = make_rhs_unstructured(basis, mesh,
                                {-1: BoundarySide(euler.BC_SLIP)}, flux="lxf")
    ubar = rhs.cell_averages(u)
    lim = make_minmax_limiter_unstructured(basis, mesh)
    out = np.array(lim(u, ubar, jnp.full((mesh.n_cells,), 2.0)))
    spread0 = rho[:, 27].max() - rho[:, 27].min()
    spread1 = out[euler.RHO, :, 27].max() - out[euler.RHO, :, 27].min()
    assert spread1 < 0.2 * spread0
    # cell mean preserved by the linear rebuild
    ubar1 = rhs.cell_averages(jnp.asarray(out))
    np.testing.assert_allclose(np.array(ubar1[:, 27]), np.array(ubar[:, 27]),
                               rtol=1e-12)


# ---------------------------------------------------------------------------
# shocked end-to-end on an unstructured mesh
# ---------------------------------------------------------------------------

def test_sod_on_unstructured_strip():
    """Sod on a Cartesian strip converted to the unstructured representation:
    the gather-based assembly + minmax + positivity must reproduce the exact
    Riemann profile (the serial-vs-general-mesh cross-check)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import riemann_exact
    basis = make_basis("Qk", 1)
    cm = CartesianMesh(100, 4, 0.0, 1.0, 0.0, 0.04)
    mesh = from_curvilinear(cm, side_bids={"W": 1, "E": 2, "S": 3, "N": 4})
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    bct = {1: BoundarySide(euler.BC_INFLOW, inflow),
           2: BoundarySide(euler.BC_OUTFLOW),
           3: BoundarySide(euler.BC_SLIP), 4: BoundarySide(euler.BC_SLIP)}
    lim = LimiterConfig(type="minmax", char_lim=True, pos_lim=True)
    s = UnstructuredSolver(basis, mesh, bct, flux="hllc", limiter=lim, cfl=0.9)

    def sod(x, y, t=0.0):
        rho = jnp.where(x <= 0.5, 1.0, 0.125)
        E = jnp.where(x <= 0.5, 2.5, 0.25)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, E])

    u = set_initial_condition_unstructured(basis, mesh, sod)
    u, t, it = s.run(u, 0.2)
    rho = np.array(s.cell_averages(u))[euler.RHO].reshape(4, 100).mean(axis=0)
    xc = (np.arange(100) + 0.5) / 100
    rex, _, _ = riemann_exact.sample((xc - 0.5) / t, 1.0, 0.0, 1.0,
                                     0.125, 0.0, 0.1)
    assert np.abs(rho - rex).mean() < 0.015
    assert rho.min() > 0.11


def test_vtu_output_unstructured(tmp_path):
    from dflo_tpu.io.vtk import write_vtu_unstructured
    basis = make_basis("Qk", 1)
    mesh = disk_butterfly(1.0, 2 * np.pi / 30)
    u = np.asarray(set_initial_condition_unstructured(basis, mesh, iso_eq))
    path = str(tmp_path / "disk.vtu")
    write_vtu_unstructured(path, basis, mesh, u, t=0.1)
    data = open(path, "rb").read()
    assert b"UnstructuredGrid" in data and b"Density" in data


# ---------------------------------------------------------------------------
# structured-parity features (VERDICT r2 item 4): KXRCF, implicit, sharding,
# chunked run, checkpointing
# ---------------------------------------------------------------------------

def _shock_state(basis, cm):
    """Oblique moving shock (nonzero velocity so KXRCF inflow faces exist)."""
    def fn(x, y, t=0.0):
        L = x + 0.3 * y <= 0.5
        rho = jnp.where(L, 1.0, 0.125)
        vx = jnp.where(L, 0.7, 0.0)
        vy = jnp.where(L, 0.2, 0.0)
        p = jnp.where(L, 1.0, 0.1)
        return jnp.stack([rho * vx, rho * vy, rho,
                          p / (euler.GAMMA - 1.0) + 0.5 * rho * (vx**2 + vy**2)])
    return ic.set_initial_condition(basis, cm, fn)


def test_kxrcf_unstructured_matches_structured():
    """Density/energy KXRCF through the face-gather tables reproduces the
    structured sweep (src/indicator.cc:48-198) on a Cartesian grid viewed as
    an unstructured mesh."""
    from dflo_tpu.ops.contract import basis_reduce
    from dflo_tpu.stab.indicator import make_shock_indicator
    from dflo_tpu.stab.indicator_unstruct import \
        make_shock_indicator_unstructured

    basis = make_basis("Qk", 2)
    cm = CartesianMesh(24, 8, 0.0, 1.0, 0.0, 0.25)
    um = from_curvilinear(cm)
    u = _shock_state(basis, cm)
    avg_op = jnp.asarray(basis.wq2 @ basis.V)
    ubar = basis_reduce(avg_op, u)
    uf = jnp.asarray(np.array(u).reshape(4, basis.K, -1))
    ubf = jnp.asarray(np.array(ubar).reshape(4, -1))
    for kind in ("density", "energy"):
        ind_s = make_shock_indicator(basis, cm, kind)
        ind_u = make_shock_indicator_unstructured(basis, um, kind)
        s_s, _ = ind_s(u, ubar, 0.0)
        s_u, _ = ind_u(uf, ubf, 0.0)
        np.testing.assert_allclose(np.array(s_u).reshape(8, 24),
                                   np.array(s_s), rtol=1e-9, atol=1e-11)
        assert np.array(s_u).max() > 1.0     # the shock IS detected


def test_kxrcf_drives_unstructured_limiter():
    """shock indicator = density on the unstructured driver limits ONLY
    near the discontinuity: smooth-region DoFs are untouched while the
    mark-all variant would clip them."""
    basis = make_basis("Qk", 2)
    cm = CartesianMesh(24, 8, 0.0, 1.0, 0.0, 0.25)
    um = from_curvilinear(cm, side_bids={"W": 1, "E": 2, "S": 3, "N": 4})
    bct = {1: BoundarySide(euler.BC_OUTFLOW), 2: BoundarySide(euler.BC_OUTFLOW),
           3: BoundarySide(euler.BC_SLIP), 4: BoundarySide(euler.BC_SLIP)}
    lim = LimiterConfig(type="minmax", shock_indicator="density",
                        char_lim=True, pos_lim=False)
    s = UnstructuredSolver(basis, um, bct, flux="hllc", limiter=lim, cfl=0.5)
    u = _shock_state(basis, cm)
    uf = jnp.asarray(np.array(u).reshape(4, basis.K, -1))
    out = s.post_stage(uf, 0.0)
    marked, _ = s._indicator(uf, s.cell_averages(uf), 0.0)
    marked = np.array(marked) > 1.0
    assert marked.any() and not marked.all()
    # unmarked smooth cells keep their exact polynomial
    diff = np.abs(np.array(out) - np.array(uf)).max(axis=(0, 1))
    assert diff[~marked].max() < 1e-14


def test_implicit_unstructured_matches_structured():
    """One backward-Euler Newton step on the flat-cell layout == the
    structured implicit path (solver.implicit is layout-agnostic;
    src/assemble_implicit.cc runs on any quad mesh)."""
    from dflo_tpu.driver import Solver

    basis = make_basis("Qk", 1)
    cm = CartesianMesh(12, 8, -5.0, 5.0, -2.0, 2.0)
    um = from_curvilinear(cm, side_bids={"W": 1, "E": 2, "S": 3, "N": 4})
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 0.5), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.625)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_FARFIELD, inflow))
    bct = {1: bcs["W"], 2: bcs["E"], 3: bcs["S"], 4: bcs["N"]}
    lim = LimiterConfig(type="none", pos_lim=False)
    dt = 2e-3
    s_s = Solver(basis, cm, bcs, flux="hllc", limiter=lim, method="implicit",
                 theta=1.0, max_nonlin_iter=3, linear_residual=1e-10,
                 fixed_time_step=dt, precondition="block_jacobi")
    s_u = UnstructuredSolver(basis, um, bct, flux="hllc", limiter=lim,
                             method="implicit", theta=1.0, max_nonlin_iter=3,
                             linear_residual=1e-10, fixed_time_step=dt,
                             precondition="block_jacobi")
    u = ic.set_initial_condition(basis, cm, ic.isentropic_vortex())
    uf = jnp.asarray(np.array(u).reshape(4, basis.K, -1))
    # structured implicit global stepping carries the Newton predictor
    # (5-tuple step, src/claw.cc:1104-1108); the unstructured driver does not
    u1, _, bad1, st1, _pred = s_s._step(u, jnp.zeros(()), jnp.full((), 1.0),
                                        None, u)
    u2, _, bad2, st2 = s_u._step(uf, jnp.zeros(()), jnp.full((), 1.0))
    assert not bool(bad1) and not bool(bad2)
    assert not bool(st1.diverged) and not bool(st2.diverged)
    np.testing.assert_allclose(np.array(u2).reshape(np.array(u1).shape),
                               np.array(u1), rtol=1e-7, atol=1e-9)


def test_implicit_on_gravity_disk():
    """The radial-gravity disk runs IMPLICIT (VERDICT r2 item 4 'done'
    criterion): one Newton step on the well-balanced hydrostatic disk stays
    at equilibrium and the Newton loop converges."""
    basis = make_basis("Qk_gll", 1)
    mesh = disk_butterfly(1.0, 2 * np.pi / 24)
    bct = {1: BoundarySide(euler.BC_SLIP)}
    lim = LimiterConfig(type="none", pos_lim=False)
    s = UnstructuredSolver(basis, mesh, bct, flux="hllc", limiter=lim,
                           method="implicit", theta=1.0, max_nonlin_iter=2,
                           linear_residual=1e-8, fixed_time_step=1e-3,
                           well_balanced="isothermal", potential=_pot)
    u0 = set_initial_condition_unstructured(basis, mesh, iso_eq)
    u1, dt, bad, st = s._step(u0, jnp.zeros(()), jnp.full((), 1.0))
    assert not bool(bad) and not bool(st.diverged)
    # hydrostatic equilibrium is preserved through the implicit update
    assert float(jnp.abs(u1 - u0).max()) < 1e-10


def test_unstructured_1_vs_8_devices():
    """Flat-cell GSPMD sharding: the disk shock run gives the same answer on
    1 and 8 virtual devices (parallel.flat_sharding)."""
    import jax
    from dflo_tpu.parallel.sharding import device_mesh_1d, shard_state_flat

    basis = make_basis("Qk", 1)
    cm = CartesianMesh(32, 8, 0.0, 1.0, 0.0, 0.25)
    um = from_curvilinear(cm, side_bids={"W": 1, "E": 2, "S": 3, "N": 4})
    bct = {1: BoundarySide(euler.BC_OUTFLOW), 2: BoundarySide(euler.BC_OUTFLOW),
           3: BoundarySide(euler.BC_SLIP), 4: BoundarySide(euler.BC_SLIP)}
    lim = LimiterConfig(type="minmax", shock_indicator="density",
                        char_lim=True, pos_lim=True)
    u0 = _shock_state(basis, cm)
    uf = jnp.asarray(np.array(u0).reshape(4, basis.K, -1))

    s1 = UnstructuredSolver(basis, um, bct, flux="hllc", limiter=lim, cfl=0.5)
    u1, t1, it1 = s1.run(uf, 0.05)

    dm = device_mesh_1d(jax.devices()[:8])
    s8 = UnstructuredSolver(basis, um, bct, flux="hllc", limiter=lim, cfl=0.5,
                            device_mesh=dm)
    u8, t8, it8 = s8.run(shard_state_flat(uf, dm), 0.05)
    assert (t1, it1) == (t8, it8)
    np.testing.assert_allclose(np.array(u8), np.array(u1),
                               rtol=1e-11, atol=1e-11)


def test_unstructured_chunked_run_matches_per_step():
    """run(chunk=N) on the unstructured driver == the per-step host loop."""
    basis = make_basis("Qk", 1)
    cm = CartesianMesh(24, 8, 0.0, 1.0, 0.0, 0.25)
    um = from_curvilinear(cm, side_bids={"W": 1, "E": 2, "S": 3, "N": 4})
    bct = {1: BoundarySide(euler.BC_OUTFLOW), 2: BoundarySide(euler.BC_OUTFLOW),
           3: BoundarySide(euler.BC_SLIP), 4: BoundarySide(euler.BC_SLIP)}
    lim = LimiterConfig(type="minmax", shock_indicator="density",
                        char_lim=True, pos_lim=True)
    u0 = _shock_state(basis, cm)
    uf = jnp.asarray(np.array(u0).reshape(4, basis.K, -1))
    s = UnstructuredSolver(basis, um, bct, flux="hllc", limiter=lim, cfl=0.5)
    u1, t1, it1 = s.run(uf, 0.04, chunk=1)
    u2, t2, it2 = s.run(uf, 0.04, chunk=16)
    assert it1 == it2
    assert abs(t1 - t2) < 1e-14
    # the two loops are different XLA programs (while_loop body vs
    # standalone jit), so fusion reassociates at ~1 ulp
    np.testing.assert_allclose(np.array(u2), np.array(u1),
                               rtol=1e-12, atol=1e-13)


def test_unstructured_checkpoint_roundtrip(tmp_path):
    """save/load_checkpoint on the flat-cell layout, incl. the n_cells
    signature validation."""
    from dflo_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    basis = make_basis("Qk", 1)
    mesh = disk_butterfly(1.0, 2 * np.pi / 24)
    u = np.asarray(set_initial_condition_unstructured(basis, mesh, iso_eq))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, u, 0.25, 7, basis=basis, mesh=mesh)
    u2, t2, it2, _ = load_checkpoint(path, basis=basis, mesh=mesh)
    assert (t2, it2) == (0.25, 7)
    np.testing.assert_array_equal(u2, u)
    other = disk_butterfly(1.0, 2 * np.pi / 30)
    with pytest.raises(ValueError):
        load_checkpoint(path, basis=basis, mesh=other)


def test_morton_reorder_preserves_solution():
    """UnstructuredQuadMesh.morton_order/reorder (the p4est Morton-partition
    analog, src_mpi/claw.cc:59-76): solving on the Z-order-permuted mesh
    gives exactly the permuted solution of the original ordering — the
    rebuilt face tables are consistent and boundary ids survive."""
    basis = make_basis("Qk", 1)
    cm = CartesianMesh(16, 8, 0.0, 1.0, 0.0, 0.5)
    um = from_curvilinear(cm, side_bids={"W": 1, "E": 2, "S": 3, "N": 4})
    bct = {1: BoundarySide(euler.BC_OUTFLOW), 2: BoundarySide(euler.BC_OUTFLOW),
           3: BoundarySide(euler.BC_SLIP), 4: BoundarySide(euler.BC_SLIP)}
    lim = LimiterConfig(type="minmax", shock_indicator="density",
                        char_lim=True, pos_lim=True)
    perm = um.morton_order()
    assert not np.array_equal(perm, np.arange(um.n_cells))   # really reorders
    um_z = um.reorder(perm)

    u0 = _shock_state(basis, cm)
    uf = jnp.asarray(np.array(u0).reshape(4, basis.K, -1))
    s0 = UnstructuredSolver(basis, um, bct, flux="hllc", limiter=lim, cfl=0.5)
    sz = UnstructuredSolver(basis, um_z, bct, flux="hllc", limiter=lim,
                            cfl=0.5)
    ua, ta, ia = s0.run(uf, 0.03)
    ub, tb, ib = sz.run(uf[..., perm], 0.03)
    assert (ta, ia) == (tb, ib)
    np.testing.assert_allclose(np.array(ub), np.array(ua)[..., perm],
                               rtol=1e-11, atol=1e-12)


def test_unstructured_two_axis_sharding_1_vs_8():
    """Two-axis flat-cell sharding (VERDICT r4 item 7): the Morton-ordered
    disk run gives the same answer on 1 device and on a 2-D ('dy','dx')
    4x2 device mesh, where flat_sharding folds the cell axis over BOTH
    axes."""
    import jax
    from dflo_tpu.parallel.sharding import (device_mesh, flat_sharding,
                                            shard_state_flat)

    basis = make_basis("Qk", 1)
    mesh0 = disk_butterfly(1.0, 2 * np.pi / 24)
    um = mesh0.reorder(mesh0.morton_order())
    bct = {1: BoundarySide(euler.BC_SLIP)}
    lim = LimiterConfig(type="minmax", shock_indicator="density",
                        char_lim=True, pos_lim=True)

    def blast(x, y):
        p = jnp.where(x * x + y * y < 0.1, 10.0, 1.0)
        return jnp.stack([jnp.zeros_like(x), jnp.zeros_like(x),
                          jnp.ones_like(x), p / (euler.GAMMA - 1.0)])

    u0 = set_initial_condition_unstructured(basis, um, blast)
    s1 = UnstructuredSolver(basis, um, bct, flux="hllc", limiter=lim, cfl=0.5)
    u1, t1, it1 = s1.run(u0, 0.03)

    dm = device_mesh(shape=(4, 2), devices=jax.devices()[:8])
    assert flat_sharding(dm).spec == (None, None, ("dy", "dx"))
    s8 = UnstructuredSolver(basis, um, bct, flux="hllc", limiter=lim, cfl=0.5,
                            device_mesh=dm)
    u8, t8, it8 = s8.run(shard_state_flat(u0, dm), 0.03)
    assert (t1, it1) == (t8, it8)
    np.testing.assert_allclose(np.array(u8), np.array(u1),
                               rtol=1e-11, atol=1e-11)
