"""Native (C++) runtime components: Gmsh parser + binary VTU writer
(native/dflo_native.cc via ctypes)."""

import os

import numpy as np
import pytest

from dflo_tpu import native
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.mesh.msh import load_msh, parse_msh, write_msh

needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native toolchain unavailable")


@needs_native
def test_native_msh_matches_python_parser(tmp_path):
    mesh = CartesianMesh(6, 4, 0.0, 3.0, -1.0, 1.0)
    mask = np.ones((4, 6), bool)
    mask[0, 5] = False
    path = str(tmp_path / "g.msh")
    write_msh(path, mesh, mask=mask)

    nodes_n, quads_n, lines_n = native.msh_parse(path)
    with open(path) as f:
        nodes_p, quads_p, lines_p = parse_msh(f.read())
    assert nodes_n == nodes_p
    assert sorted(quads_n) == sorted(quads_p)
    assert sorted(lines_n) == sorted(lines_p)

    dom = load_msh(path)                  # goes through the native path
    np.testing.assert_array_equal(dom.mask, mask)


@needs_native
def test_native_msh_error_on_missing_file():
    with pytest.raises(ValueError, match="cannot open"):
        native.msh_parse("/nonexistent/x.msh")


@needs_native
def test_native_vtu_writer_roundtrip(tmp_path):
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [2, 0, 0], [2, 1, 0]], float)
    conn = np.array([[0, 1, 2, 3], [1, 4, 5, 2]], np.int32)
    path = str(tmp_path / "o.vtu")
    ok = native.vtu_write(path, pts, conn,
                          {"Density": np.arange(6.0)},
                          {"mu": np.array([0.5, 1.5])}, time=2.5)
    assert ok
    raw = open(path, "rb").read()
    assert b"appended" in raw and b"Density" in raw and b"mu" in raw
    assert b"2.5" in raw
    # the appended block contains the exact float64 bytes
    assert np.arange(6.0).tobytes() in raw
    assert np.array([0.5, 1.5]).tobytes() in raw


@needs_native
def test_cli_output_uses_native_writer(tmp_path):
    """End-to-end: CLI snapshots come out as binary VTU (small + parseable
    header)."""
    from dflo_tpu.cli import main
    rc = main(["/root/reference/examples/sod_shock_tube/input.prm",
               "--final-time", "0.01", "--output-dir", str(tmp_path)])
    assert rc == 0
    vtus = [p for p in os.listdir(tmp_path) if p.endswith(".vtu")]
    assert vtus
    raw = open(tmp_path / vtus[0], "rb").read()
    assert b"AppendedData" in raw
