"""Solution output: derived quantities + VTU writer.

Re-implements the reference's output layer (src/output.cc:32-107 +
EulerEquations::Postprocessor, src/equation.h:1186-1213 / src/equation.cc:
35-187): conserved fields plus XVelocity/YVelocity/Pressure and the
schlieren field |grad rho|^2 (src/equation.cc:122-124), written as one VTU
file per snapshot (output/solution-NNN.vtu naming like src/output.cc:95-105).

Each DG cell is written as its own bilinear-subdivided patch (p x p quad
subcells with values at the (p+1)^2 uniform nodes), so discontinuities at
cell interfaces render faithfully — the deal.II DataOut::build_patches
behavior.  Pure numpy; runs on host at output cadence.
"""

from __future__ import annotations

import os

import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.contract import basis_apply
from dflo_tpu.physics import euler


def derived_fields(W):
    """(XVelocity, YVelocity, Pressure) from conserved values W[4, ...]
    (src/equation.cc:113-120)."""
    vx = W[euler.MX] / W[euler.RHO]
    vy = W[euler.MY] / W[euler.RHO]
    p = (euler.GAMMA - 1.0) * (W[euler.ENE]
                               - 0.5 * (W[euler.MX]**2 + W[euler.MY]**2)
                               / W[euler.RHO])
    return vx, vy, p


def _patch_nodes(p: int) -> np.ndarray:
    """(p+1)^2 uniform reference nodes, x fastest."""
    s = np.linspace(0.0, 1.0, p + 1)
    return np.array([(a, b) for b in s for a in s])


def _physical_gradient(basis, mesh, rho, ref_pts):
    """d(rho)/dx, d(rho)/dy at reference points in every cell, on any mesh:
    Cartesian meshes divide by dx/dy; meshes with per-cell metric terms
    (CurvilinearMesh / UnstructuredQuadMesh) invert the bilinear Jacobian
    (fixes the schlieren postprocessor on general mappings,
    src/equation.cc:122-124)."""
    Gx, Gy = basis.grad_at(ref_pts)
    d_xi = np.asarray(basis_apply(Gx, rho[None]))[0]
    d_eta = np.asarray(basis_apply(Gy, rho[None]))[0]
    if hasattr(mesh, "metric"):
        x_xi, x_eta, y_xi, y_eta, detJ = mesh.metric(ref_pts)
        drdx = (y_eta * d_xi - y_xi * d_eta) / detJ
        drdy = (-x_eta * d_xi + x_xi * d_eta) / detJ
        return drdx, drdy
    return d_xi / mesh.dx, d_eta / mesh.dy


def write_vtu_unstructured(path: str, basis: basis_mod.Basis, mesh, u,
                           t: float = 0.0, schlieren: bool = True,
                           extra_cell_fields=None):
    """VTU output for the flat-cell unstructured path: u[4, K, N] on an
    UnstructuredQuadMesh (the same per-cell patch decomposition as
    write_vtu; parallels src/output.cc:32-107)."""
    import numpy as _np
    u = _np.asarray(u)
    p = basis.degree
    N = u.shape[-1]
    nodes = _patch_nodes(p)
    M = len(nodes)

    E = basis.eval_at(nodes)
    vals = np.asarray(basis_apply(E, u))             # [4, M, N]
    xn, yn = mesh.point_coords(nodes)                # [M, N]
    pts = np.zeros((N * M, 3))
    pts[:, 0] = xn.T.ravel()
    pts[:, 1] = yn.T.ravel()

    def gather(field):                               # [M, N] -> flat
        return field.T.ravel()

    fields = {
        "Density": gather(vals[euler.RHO]),
        "XMomentum": gather(vals[euler.MX]),
        "YMomentum": gather(vals[euler.MY]),
        "Energy": gather(vals[euler.ENE]),
    }
    vx, vy, pr = derived_fields(vals)
    fields["XVelocity"] = gather(vx)
    fields["YVelocity"] = gather(vy)
    fields["Pressure"] = gather(pr)
    if schlieren:
        drdx, drdy = _physical_gradient(basis, mesh, u[euler.RHO], nodes)
        fields["schlieren_plot"] = gather(drdx**2 + drdy**2)

    n1 = p + 1
    sub = []
    for j in range(p):
        for i in range(p):
            a = j * n1 + i
            sub.append([a, a + 1, a + n1 + 1, a + n1])
    sub = np.array(sub)
    conn = (np.arange(N)[:, None, None] * M + sub[None]).reshape(-1, 4)

    cell_fields = {}
    for name, arr in (extra_cell_fields or {}).items():
        cell_fields[name] = np.repeat(np.asarray(arr), p * p)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from dflo_tpu import native as native_mod
    if native_mod.vtu_write(path, pts, conn, fields, cell_fields, t):
        return
    _write_vtu_file(path, pts, conn, fields, cell_fields, t)


def write_vtu_amr(path: str, solver, pools, t: float = 0.0,
                  schlieren: bool = False):
    """VTU output for the AMR tile pools (dflo_tpu.amr_pool.AMRSolver):
    every active patch at every level contributes its per-cell sub-quads,
    plus a piecewise-constant `level` field (the reference writes the
    refined triangulation directly, src/output.cc:32-107)."""
    import numpy as _np
    basis = solver.basis
    nodes = _patch_nodes(basis.degree)
    M = len(nodes)
    E = basis.eval_at(nodes)

    pts_all, conn_all, vals_all, lvl_all = [], [], [], []
    off = 0
    n1 = basis.degree + 1
    sub = []
    for j in range(basis.degree):
        for i in range(basis.degree):
            a = j * n1 + i
            sub.append([a, a + 1, a + n1 + 1, a + n1])
    if not sub:                      # degree 0: one quad per cell
        sub = [[0, 0, 0, 0]]
    sub = np.array(sub)
    for lv in range(solver.max_level + 1):
        U = _np.asarray(pools[lv])               # [4, K, P, m, m]
        act = _np.asarray(solver._tables[lv]["active"])
        if not act.any():
            continue
        vals = np.asarray(basis_apply(E, U.reshape(
            4, basis.K, -1))).reshape(4, M, *U.shape[2:])
        sel = _np.nonzero(act)[0]
        m = solver.m[lv]
        T = solver.T
        mesh = solver.mesh
        oy = _np.asarray(solver._tables[lv]["oy"])[sel]
        ox = _np.asarray(solver._tables[lv]["ox"])[sel]
        cx = (np.arange(m))[None, None, :]
        cy = (np.arange(m))[None, :, None]
        x0 = mesh.x0 + ox[:, None, None] * (T * mesh.dx)
        y0 = mesh.y0 + oy[:, None, None] * (T * mesh.dy)
        px = x0[None] + (cx[None] + nodes[:, 0][:, None, None, None]) \
            * solver.dx[lv]
        py = y0[None] + (cy[None] + nodes[:, 1][:, None, None, None]) \
            * solver.dy[lv]
        px = _np.broadcast_to(px, (M, len(sel), m, m))
        py = _np.broadcast_to(py, (M, len(sel), m, m))
        ncell = len(sel) * m * m
        pts = np.zeros((ncell * M, 3))
        pts[:, 0] = px.reshape(M, -1).T.ravel()
        pts[:, 1] = py.reshape(M, -1).T.ravel()
        v = vals[:, :, sel].reshape(4, M, -1)    # [4, M, ncell]
        vals_all.append(np.moveaxis(v, 1, 2).reshape(4, -1))
        conn = (off + np.arange(ncell)[:, None, None] * M
                + sub[None]).reshape(-1, 4)
        pts_all.append(pts)
        conn_all.append(conn)
        lvl_all.append(np.full(ncell * len(sub), lv))
        off += ncell * M

    pts = np.concatenate(pts_all, 0)
    conn = np.concatenate(conn_all, 0)
    vals = np.concatenate(vals_all, 1)
    fields = {"Density": vals[euler.RHO], "XMomentum": vals[euler.MX],
              "YMomentum": vals[euler.MY], "Energy": vals[euler.ENE]}
    vx, vy, pr = derived_fields(vals)
    fields["XVelocity"] = vx
    fields["YVelocity"] = vy
    fields["Pressure"] = pr
    cell_fields = {"level": np.concatenate(lvl_all, 0).astype(float)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    from dflo_tpu import native as native_mod
    if native_mod.vtu_write(path, pts, conn, fields, cell_fields, t):
        return
    _write_vtu_file(path, pts, conn, fields, cell_fields, t)


def write_vtu(path: str, basis: basis_mod.Basis, mesh, u, t: float = 0.0,
              schlieren: bool = True, mask=None, extra_cell_fields=None):
    """Write the DG solution as a VTU file of per-cell patches.

    u    : [4, K, ny, nx] (host or device array; converted to numpy)
    mask : optional [ny, nx] fluid flags; solid cells are dropped entirely
    extra_cell_fields : dict name -> [ny, nx] piecewise-constant fields
             (shock indicator, mu_shock, MOOD degrees ... as in the per-cell
              .gpl outputs of src/output.cc:43-70)
    """
    import numpy as _np
    u = _np.asarray(u)
    p = basis.degree
    ny, nx = u.shape[-2:]
    nodes = _patch_nodes(p)
    m = _np.ones((ny, nx), bool) if mask is None else _np.asarray(mask, bool)

    # values at patch nodes: [4, M, ny, nx]
    E = basis.eval_at(nodes)
    vals = np.asarray(basis_apply(E, u))
    # gradients for schlieren
    if schlieren:
        drdx, drdy = _physical_gradient(basis, mesh, u[euler.RHO], nodes)
        schl = drdx**2 + drdy**2                     # src/equation.cc:122-124

    xn, yn = mesh.point_coords(nodes)                # [M, ny, nx]

    iy, ix = np.nonzero(m)
    ncell = len(iy)
    M = len(nodes)
    # points, duplicated per cell (discontinuous fields)
    pts = np.zeros((ncell * M, 3))
    pts[:, 0] = xn[:, iy, ix].T.ravel()
    pts[:, 1] = yn[:, iy, ix].T.ravel()

    def gather(field):                               # [M, ny, nx] -> flat
        return field[:, iy, ix].T.ravel()

    fields = {
        "Density": gather(vals[euler.RHO]),
        "XMomentum": gather(vals[euler.MX]),
        "YMomentum": gather(vals[euler.MY]),
        "Energy": gather(vals[euler.ENE]),
    }
    vx, vy, pr = derived_fields(vals)
    fields["XVelocity"] = gather(vx)
    fields["YVelocity"] = gather(vy)
    fields["Pressure"] = gather(pr)
    if schlieren:
        fields["schlieren_plot"] = gather(schl)

    # connectivity: p*p quad subcells per cell
    n1 = p + 1
    sub = []
    for j in range(p):
        for i in range(p):
            a = j * n1 + i
            sub.append([a, a + 1, a + n1 + 1, a + n1])
    sub = np.array(sub)                              # [p*p, 4]
    conn = (np.arange(ncell)[:, None, None] * M + sub[None]).reshape(-1, 4)

    cell_fields = {}
    for name, arr in (extra_cell_fields or {}).items():
        a = np.asarray(arr)[iy, ix]
        cell_fields[name] = np.repeat(a, p * p)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # fast path: native appended-binary writer (native/dflo_native.cc)
    from dflo_tpu import native as native_mod
    if native_mod.vtu_write(path, pts, conn, fields, cell_fields, t):
        return
    _write_vtu_file(path, pts, conn, fields, cell_fields, t)


def write_vtu_parallel(output_dir: str, file_number: int,
                       basis: basis_mod.Basis, mesh, u, t: float = 0.0,
                       schlieren: bool = True, mask=None,
                       master: str = "master_file.visit",
                       _history: dict = {}):
    """Per-shard VTU pieces + VisIt master record — the domain-decomposed
    output of the MPI tree (src_mpi/output.cc:51-84): each device's owned
    block of the sharded state is written as ``solution-NNNN.RRR.vtu`` with
    a ``subdomain`` cell field, and ``master_file.visit`` accumulates an
    ``!NBLOCKS``-grouped record of every snapshot so VisIt/ParaView loads
    the pieces as one time series.

    u must be a sharded jax.Array [4, K, ny, nx]; on a single device this
    degrades to one piece per snapshot.  Returns the piece filenames."""
    shards = sorted(u.addressable_shards, key=lambda s: s.device.id)
    names = []
    for rank, sh in enumerate(shards):
        ys, xs = sh.index[-2], sh.index[-1]
        ys = slice(*ys.indices(u.shape[-2]))
        xs = slice(*xs.indices(u.shape[-1]))
        from dflo_tpu.mesh.cartesian import CartesianMesh
        sub = CartesianMesh(xs.stop - xs.start, ys.stop - ys.start,
                            mesh.x0 + xs.start * mesh.dx,
                            mesh.x0 + xs.stop * mesh.dx,
                            mesh.y0 + ys.start * mesh.dy,
                            mesh.y0 + ys.stop * mesh.dy)
        name = f"solution-{file_number:04d}.{rank:03d}.vtu"
        sub_u = np.asarray(sh.data)
        sub_mask = None if mask is None else np.asarray(mask)[ys, xs]
        subdom = np.full(sub_u.shape[-2:], float(rank))
        write_vtu(os.path.join(output_dir, name), basis, sub, sub_u, t=t,
                  schlieren=schlieren, mask=sub_mask,
                  extra_cell_fields={"subdomain": subdom})
        names.append(name)
    # master record, regenerated with the full history like
    # DataOutBase::write_visit_record (src_mpi/output.cc:70-84)
    hist = _history.setdefault(output_dir, [])
    hist.append(names)
    with open(os.path.join(output_dir, master), "w") as f:
        for group in hist:
            f.write(f"!NBLOCKS {len(group)}\n")
            for n in group:
                f.write(n + "\n")
    return names


def write_tecplot(path: str, basis: basis_mod.Basis, mesh, u, t: float = 0.0,
                  mask=None):
    """ASCII Tecplot FEQUADRILATERAL zone (`format = tecplot`,
    src/parameters.cc:273-275): same per-cell patch layout as the VTU path."""
    import numpy as _np
    u = _np.asarray(u)
    p = basis.degree
    ny, nx = u.shape[-2:]
    nodes = _patch_nodes(p)
    m = _np.ones((ny, nx), bool) if mask is None else _np.asarray(mask, bool)
    E = basis.eval_at(nodes)
    vals = np.asarray(basis_apply(E, u))
    xn, yn = mesh.point_coords(nodes)
    iy, ix = np.nonzero(m)
    ncell = len(iy)
    M = len(nodes)
    vx, vy, pr = derived_fields(vals)

    def gather(field):
        return field[:, iy, ix].T.ravel()

    cols = [gather(np.broadcast_to(xn, vals.shape[1:])),
            gather(np.broadcast_to(yn, vals.shape[1:])),
            gather(vals[euler.RHO]), gather(vx), gather(vy), gather(pr),
            gather(vals[euler.ENE])]
    n1 = p + 1
    sub = np.array([[j * n1 + i, j * n1 + i + 1,
                     (j + 1) * n1 + i + 1, (j + 1) * n1 + i]
                    for j in range(p) for i in range(p)])
    conn = (np.arange(ncell)[:, None, None] * M + sub[None]).reshape(-1, 4) + 1

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write('TITLE = "dflo_tpu solution"\n')
        f.write('VARIABLES = "x" "y" "Density" "XVelocity" "YVelocity" '
                '"Pressure" "Energy"\n')
        f.write(f'ZONE T="t={t}", N={ncell * M}, E={len(conn)}, '
                f'DATAPACKING=POINT, ZONETYPE=FEQUADRILATERAL, '
                f'SOLUTIONTIME={t}\n')
        np.savetxt(f, np.stack(cols, axis=1), fmt="%.10g")
        np.savetxt(f, conn, fmt="%d")


def _write_vtu_file(path, pts, conn, point_fields, cell_fields, t):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ncells = len(conn)
    npts = len(pts)
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n')
        f.write(f'<UnstructuredGrid>\n'
                f'<FieldData><DataArray type="Float64" Name="TimeValue" '
                f'NumberOfTuples="1" format="ascii">{t}</DataArray>'
                f'</FieldData>\n')
        f.write(f'<Piece NumberOfPoints="{npts}" NumberOfCells="{ncells}">\n')
        f.write('<Points><DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        np.savetxt(f, pts, fmt="%.10g")
        f.write('</DataArray></Points>\n<Cells>\n')
        f.write('<DataArray type="Int32" Name="connectivity" format="ascii">\n')
        np.savetxt(f, conn, fmt="%d")
        f.write('</DataArray>\n')
        f.write('<DataArray type="Int32" Name="offsets" format="ascii">\n')
        np.savetxt(f, np.arange(4, 4 * ncells + 1, 4)[:, None], fmt="%d")
        f.write('</DataArray>\n')
        f.write('<DataArray type="UInt8" Name="types" format="ascii">\n')
        np.savetxt(f, np.full((ncells, 1), 9), fmt="%d")   # VTK_QUAD
        f.write('</DataArray>\n</Cells>\n')
        f.write('<PointData>\n')
        for name, arr in point_fields.items():
            f.write(f'<DataArray type="Float64" Name="{name}" format="ascii">\n')
            np.savetxt(f, np.asarray(arr)[:, None], fmt="%.10g")
            f.write('</DataArray>\n')
        f.write('</PointData>\n<CellData>\n')
        for name, arr in cell_fields.items():
            f.write(f'<DataArray type="Float64" Name="{name}" format="ascii">\n')
            np.savetxt(f, np.asarray(arr)[:, None], fmt="%.10g")
            f.write('</DataArray>\n')
        f.write('</CellData>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n')
