"""Domain-decomposed output: per-device VTU pieces + VisIt master record,
the analog of the MPI tree's per-rank solution-NNN.RRRR.vtu + master_file
(src_mpi/output.cc:51-84).  Runs on the 8-virtual-device CPU mesh."""

import os

import numpy as np

from dflo_tpu import ic
from dflo_tpu.driver import Solver
from dflo_tpu.io.vtk import write_vtu, write_vtu_parallel
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.parallel.sharding import device_mesh, shard_state
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide

PER = BoundarySide(euler.BC_PERIODIC)
BCS = dict(W=PER, E=PER, S=PER, N=PER)


def test_parallel_vtu_pieces_and_master(tmp_path):
    dm = device_mesh()
    n_dev = dm.devices.size
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(16, 16, -5.0, 5.0, -5.0, 5.0)
    s = Solver(basis, mesh, BCS, flux="roe", cfl=0.5, device_mesh=dm)
    u = shard_state(
        ic.set_initial_condition(basis, mesh, ic.isentropic_vortex_steady()),
        dm)
    u, t, it = s.run(u, 0.01)

    names = write_vtu_parallel(str(tmp_path), 0, basis, mesh, u, t=t,
                               _history={})
    assert len(names) == n_dev
    # every piece exists, is well-formed, and carries the subdomain field
    for n in names:
        raw = (tmp_path / n).read_bytes()
        assert b"Density" in raw and b"subdomain" in raw
    # master record groups the pieces per snapshot
    rec = (tmp_path / "master_file.visit").read_text().splitlines()
    assert rec[0] == f"!NBLOCKS {n_dev}"
    assert rec[1:n_dev + 1] == names

    # the union of piece extents tiles the full domain: total point count
    # across pieces equals the single-file write's
    write_vtu(str(tmp_path / "single.vtu"), basis, mesh, np.asarray(u), t=t)
    import re

    def n_points(path):
        raw = (tmp_path / path).read_bytes()
        m = re.search(rb'NumberOfPoints="(\d+)"', raw)
        return int(m.group(1))

    assert sum(n_points(n) for n in names) == n_points("single.vtu")


def test_parallel_vtu_second_snapshot_appends(tmp_path):
    dm = device_mesh()
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(8, 8, 0.0, 1.0, 0.0, 1.0)
    s = Solver(basis, mesh, BCS, flux="lxf", cfl=0.5, device_mesh=dm)
    u = shard_state(ic.set_initial_condition(
        basis, mesh, lambda x, y, t=0.0: np.broadcast_to(
            np.array([0.0, 0.0, 1.0, 2.5])[:, None, None],
            (4,) + x.shape).copy() * np.ones_like(x)), dm)
    hist = {}
    write_vtu_parallel(str(tmp_path), 0, basis, mesh, u, _history=hist)
    write_vtu_parallel(str(tmp_path), 1, basis, mesh, u, _history=hist)
    rec = (tmp_path / "master_file.visit").read_text()
    assert rec.count("!NBLOCKS") == 2
    assert "solution-0001.000.vtu" in rec
