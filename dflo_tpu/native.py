"""ctypes bindings for the native runtime library (native/dflo_native.cc).

The library is built on demand (`make -C native`) and cached; every consumer
degrades gracefully to the pure-Python implementation when a toolchain is
unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdflo_native.so")

_lib = None
_tried = False


class _MshData(ctypes.Structure):
    _fields_ = [
        ("n_nodes", ctypes.c_int64),
        ("node_ids", ctypes.POINTER(ctypes.c_int64)),
        ("xy", ctypes.POINTER(ctypes.c_double)),
        ("n_quads", ctypes.c_int64),
        ("quads", ctypes.POINTER(ctypes.c_int64)),
        ("n_lines", ctypes.c_int64),
        ("lines", ctypes.POINTER(ctypes.c_int64)),
        ("error", ctypes.c_char * 256),
    ]


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.msh_parse.restype = ctypes.POINTER(_MshData)
    lib.msh_parse.argtypes = [ctypes.c_char_p]
    lib.msh_free.argtypes = [ctypes.POINTER(_MshData)]
    lib.vtu_write.restype = ctypes.c_int
    _lib = lib
    return _lib


def msh_parse(path: str):
    """Parse a Gmsh 2.x ASCII mesh with the native reader.

    Returns (nodes{id: (x, y)}, quads[(n1..n4, phys)], lines[(n1, n2, phys)])
    — the same structures as dflo_tpu.mesh.msh.parse_msh — or None when the
    native library is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    d = lib.msh_parse(path.encode())
    if not d:
        raise MemoryError("msh_parse allocation failed")
    try:
        err = d.contents.error
        if err and err[0:1] != b"\x00":
            raise ValueError(f"native msh_parse: {err.decode()}")
        n = d.contents.n_nodes
        ids = np.ctypeslib.as_array(d.contents.node_ids, shape=(n,)).copy()
        xy = np.ctypeslib.as_array(d.contents.xy, shape=(n, 2)).copy()
        nq = d.contents.n_quads
        quads = np.ctypeslib.as_array(d.contents.quads, shape=(nq, 5)).copy() \
            if nq else np.zeros((0, 5), np.int64)
        nl = d.contents.n_lines
        lines = np.ctypeslib.as_array(d.contents.lines, shape=(nl, 3)).copy() \
            if nl else np.zeros((0, 3), np.int64)
    finally:
        lib.msh_free(d)
    nodes = {int(i): (float(x), float(y)) for i, (x, y) in zip(ids, xy)}
    return (nodes, [tuple(int(v) for v in q) for q in quads],
            [tuple(int(v) for v in l) for l in lines])


def vtu_write(path: str, points, conn, point_fields: dict,
              cell_fields: dict, time: float = 0.0) -> bool:
    """Write a VTU snapshot with the native appended-binary writer.
    Returns False when the native library is unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return False
    points = np.ascontiguousarray(points, np.float64)
    conn = np.ascontiguousarray(conn, np.int32)
    npts, ncells = len(points), len(conn)
    pf = [np.ascontiguousarray(v, np.float64) for v in point_fields.values()]
    cf = [np.ascontiguousarray(v, np.float64) for v in cell_fields.values()]
    PF = (ctypes.POINTER(ctypes.c_double) * max(len(pf), 1))(
        *[p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for p in pf])
    CF = (ctypes.POINTER(ctypes.c_double) * max(len(cf), 1))(
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for c in cf])
    rc = lib.vtu_write(
        path.encode(), ctypes.c_int64(npts),
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(ncells),
        conn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(len(pf)), "\n".join(point_fields).encode(), PF,
        ctypes.c_int(len(cf)), "\n".join(cell_fields).encode(), CF,
        ctypes.c_double(time))
    return rc == 0
