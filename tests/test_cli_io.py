"""CLI + I/O integration: run real reference configs end-to-end through
``dflo_tpu.cli`` (geo ingestion, BC wiring, output), VTU/checkpoint round
trips, .msh round trip, diagnostics."""

import os

import jax.numpy as jnp
import numpy as np

from dflo_tpu import ic
from dflo_tpu.cli import build_solver, main
from dflo_tpu.config.params import AllParameters
from dflo_tpu.diagnostics import angular_momentum, totals
from dflo_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from dflo_tpu.io.vtk import write_vtu
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.mesh.geo import load_geo
from dflo_tpu.mesh.msh import load_msh, write_msh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
import pytest

# integration/e2e tier: minutes of CPU emulation; the quick dev tier
# skips this file (pytest.ini 'heavy'); the full suite runs it
pytestmark = pytest.mark.heavy

REF = "/root/reference/examples"


def test_cli_sod_reference_config(tmp_path):
    """examples/sod_shock_tube/input.prm runs unchanged end-to-end."""
    rc = main([f"{REF}/sod_shock_tube/input.prm", "--final-time", "0.05",
               "--output-dir", str(tmp_path), "--checkpoint-every", "1"])
    assert rc == 0
    vtus = sorted(p for p in os.listdir(tmp_path) if p.endswith(".vtu"))
    assert len(vtus) >= 2
    raw = (tmp_path / vtus[-1]).read_bytes()   # native writer emits binary
    assert b"Density" in raw and b"Pressure" in raw \
        and b"schlieren_plot" in raw


def test_cli_forward_step_masked_geo(tmp_path):
    """forward_step's 3-block step.geo ingests to a masked domain and runs."""
    params = AllParameters.from_prm_file(f"{REF}/forward_step/input.prm")
    solver, mask = build_solver(params, f"{REF}/forward_step")
    assert mask is not None and mask.shape == (100, 300)
    assert not mask[0, -1] and mask[-1, -1]      # step solid, top fluid
    fn = params.initial_conditions
    u = solver.apply_mask(ic.set_initial_condition(solver.basis, solver.mesh, fn))
    u, t, it = solver.run(u, 0.02)
    assert it > 0 and np.isfinite(np.array(u)).all()


def test_cli_dmr_segmented_bottom():
    """double_mach_reflection grid.geo maps its split bottom boundary."""
    dom = load_geo(f"{REF}/double_mach_reflection/grid.geo")
    s = dom.side_bids["S"]
    assert set(s.tolist()) == {0, 1}
    xc = dom.mesh.cell_centers()[0][0]
    assert (np.asarray(s)[xc < 0.16] == 0).all()
    assert (np.asarray(s)[xc > 0.17] == 1).all()


def test_msh_roundtrip(tmp_path):
    mesh = CartesianMesh(8, 4, 0.0, 2.0, -1.0, 0.0)
    path = str(tmp_path / "grid.msh")
    write_msh(path, mesh)
    dom = load_msh(path)
    assert dom.mesh.nx == 8 and dom.mesh.ny == 4
    assert dom.mask is None
    np.testing.assert_allclose(
        [dom.mesh.x0, dom.mesh.x1, dom.mesh.y0, dom.mesh.y1],
        [0.0, 2.0, -1.0, 0.0])
    assert (dom.side_bids["S"] == 1).all() and (dom.side_bids["W"] == 4).all()


def test_msh_roundtrip_masked(tmp_path):
    mesh = CartesianMesh(6, 6, 0.0, 1.0, 0.0, 1.0)
    mask = np.ones((6, 6), bool)
    mask[:3, 3:] = False
    path = str(tmp_path / "l.msh")
    write_msh(path, mesh, mask=mask)
    dom = load_msh(path)
    np.testing.assert_array_equal(dom.mask, mask)


def test_checkpoint_roundtrip(tmp_path):
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(4, 4, 0.0, 1.0, 0.0, 1.0)
    u = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex(5.0, 0.5, 0.5))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, u, 1.25, 42, basis=basis, mesh=mesh)
    u2, t, it, meta = load_checkpoint(path, basis=basis, mesh=mesh)
    np.testing.assert_array_equal(u2, np.asarray(u))
    assert t == 1.25 and it == 42
    # mismatched discretization rejected
    import pytest
    with pytest.raises(ValueError):
        load_checkpoint(path, basis=make_basis("Pk", 1), mesh=mesh)


def test_angular_momentum_matches_quadrature():
    """Rigid-rotation field m = rho*(-y, x): total AM = int rho (x^2+y^2)."""
    basis = make_basis("Qk", 3)
    mesh = CartesianMesh(8, 8, -1.0, 1.0, -1.0, 1.0)

    def rot(x, y, t=0.0):
        return jnp.stack([-y, x, jnp.ones_like(x), jnp.full_like(x, 10.0)])

    u = ic.set_initial_condition(basis, mesh, rot)
    am = float(angular_momentum(basis, mesh, u))
    # int (x^2+y^2) over [-1,1]^2 = 8/3
    assert abs(am - 8.0 / 3.0) < 1e-10
    tot = np.array(totals(basis, mesh, u))
    assert abs(tot[euler.RHO] - 4.0) < 1e-10


def test_cli_multislice_devices(tmp_path):
    """--devices 8 --slices 2 drives a reference config on the 3-axis
    ('slice', 'dy', 'dx') mesh (parallel/sharding.device_mesh_multislice)."""
    from dflo_tpu.cli import main
    rc = main([f"{REF}/sod_shock_tube/input.prm",
               "--final-time", "0.02",
               "--devices", "8", "--slices", "2",
               "--output-dir", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "master_file.visit").exists()
