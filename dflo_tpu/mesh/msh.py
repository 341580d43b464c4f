"""Gmsh .msh reader (format 2.2 ASCII) -> rasterized Cartesian domain.

The reference ingests Gmsh meshes through deal.II GridIn::read_msh
(src/claw.cc:956-967).  The TPU build reads the same files and recovers the
dense block structure: quads must form a uniform axis-aligned grid (the
`mapping = cartesian` fast path the reference validates in
compute_cartesian_mesh_size, src/claw.cc:196-221); boundary line elements
carry the physical ids that map onto the side segments.  Irregular meshes
raise and are handled by the curvilinear path.

A C++ fast-path parser (native/mshparse.cc) is used automatically for large
files when the shared library has been built; this module is the reference
implementation and fallback.
"""

from __future__ import annotations

import numpy as np

from dflo_tpu.mesh.cartesian import CartesianMesh
from dflo_tpu.mesh.geo import RasterizedDomain


def parse_msh(text: str):
    """Returns (nodes[id] = (x, y), quads [(n1..n4, phys)], lines [(n1, n2, phys)])."""
    lines_iter = iter(text.splitlines())
    nodes, quads, blines = {}, [], []
    for line in lines_iter:
        tag = line.strip()
        if tag == "$MeshFormat":
            ver = next(lines_iter).split()[0]
            if not ver.startswith("2"):
                raise ValueError(f"unsupported .msh version {ver}; need 2.x")
            next(lines_iter)  # $EndMeshFormat
        elif tag == "$Nodes":
            n = int(next(lines_iter))
            for _ in range(n):
                parts = next(lines_iter).split()
                nodes[int(parts[0])] = (float(parts[1]), float(parts[2]))
            next(lines_iter)
        elif tag == "$Elements":
            n = int(next(lines_iter))
            for _ in range(n):
                parts = next(lines_iter).split()
                etype = int(parts[1])
                ntags = int(parts[2])
                phys = int(parts[3]) if ntags else 0
                conn = [int(v) for v in parts[3 + ntags:]]
                if etype == 1:      # 2-node line
                    blines.append((*conn, phys))
                elif etype == 3:    # 4-node quad
                    quads.append((*conn, phys))
            next(lines_iter)
    return nodes, quads, blines


def rasterize_msh(nodes, quads, blines, tol=1e-9) -> RasterizedDomain:
    if not quads:
        raise ValueError("no quad elements in mesh")
    xs = np.array([nodes[i][0] for q in quads for i in q[:4]])
    ys = np.array([nodes[i][1] for q in quads for i in q[:4]])
    x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()

    # uniform spacing from the first quad
    qx = np.array([nodes[i][0] for i in quads[0][:4]])
    qy = np.array([nodes[i][1] for i in quads[0][:4]])
    hx = np.ptp(qx)
    hy = np.ptp(qy)
    if hx <= 0 or hy <= 0:
        raise ValueError("degenerate quad")
    nx = int(round((x1 - x0) / hx))
    ny = int(round((y1 - y0) / hy))
    mesh = CartesianMesh(nx, ny, x0, x1, y0, y1)

    mask = np.zeros((ny, nx), bool)
    for q in quads:
        cx = np.mean([nodes[i][0] for i in q[:4]])
        cy = np.mean([nodes[i][1] for i in q[:4]])
        ix = int((cx - x0) / hx)
        iy = int((cy - y0) / hy)
        # verify the quad is the axis-aligned cell it claims to be
        ex = x0 + ix * hx
        ey = y0 + iy * hy
        pxs = sorted(nodes[i][0] for i in q[:4])
        pys = sorted(nodes[i][1] for i in q[:4])
        if (abs(pxs[0] - ex) > tol * max(1, abs(ex)) + tol
                or abs(pxs[-1] - ex - hx) > tol * max(1, abs(ex)) + tol
                or abs(pys[0] - ey) > tol * max(1, abs(ey)) + tol
                or abs(pys[-1] - ey - hy) > tol * max(1, abs(ey)) + tol):
            raise ValueError("non-uniform or non-axis-aligned quads; "
                             "use the curvilinear mesh path")
        mask[iy, ix] = True
    full = bool(mask.all())

    side_bids = {"W": np.full(ny, -1, np.int64), "E": np.full(ny, -1, np.int64),
                 "S": np.full(nx, -1, np.int64), "N": np.full(nx, -1, np.int64)}
    xc = x0 + (np.arange(nx) + 0.5) * hx
    yc = y0 + (np.arange(ny) + 0.5) * hy
    for (a, b, phys) in blines:
        (ax, ay), (bx, by) = nodes[a], nodes[b]
        if abs(ay - by) < tol:                  # horizontal
            lo, hi = min(ax, bx), max(ax, bx)
            sel = (xc > lo - tol) & (xc < hi + tol)
            if abs(ay - y0) < tol:
                side_bids["S"][sel] = phys
            elif abs(ay - y1) < tol:
                side_bids["N"][sel] = phys
        elif abs(ax - bx) < tol:                # vertical
            lo, hi = min(ay, by), max(ay, by)
            sel = (yc > lo - tol) & (yc < hi + tol)
            if abs(ax - x0) < tol:
                side_bids["W"][sel] = phys
            elif abs(ax - x1) < tol:
                side_bids["E"][sel] = phys

    return RasterizedDomain(mesh=mesh, mask=None if full else mask,
                            side_bids=side_bids)


def load_msh(path: str) -> RasterizedDomain:
    from dflo_tpu import native
    parsed = native.msh_parse(path)
    if parsed is not None:
        return rasterize_msh(*parsed)
    with open(path) as f:
        return rasterize_msh(*parse_msh(f.read()))


def write_msh(path: str, mesh: CartesianMesh, side_bids=None, mask=None):
    """Emit a v2.2 .msh of a Cartesian grid (round-trip testing + tooling)."""
    nx, ny = mesh.nx, mesh.ny
    side_bids = side_bids or {"W": np.full(ny, 4), "E": np.full(ny, 2),
                              "S": np.full(nx, 1), "N": np.full(nx, 3)}

    def nid(i, j):
        return j * (nx + 1) + i + 1

    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n$Nodes\n")
        f.write(f"{(nx + 1) * (ny + 1)}\n")
        for j in range(ny + 1):
            for i in range(nx + 1):
                f.write(f"{nid(i, j)} {mesh.x0 + i * mesh.dx:.12g} "
                        f"{mesh.y0 + j * mesh.dy:.12g} 0\n")
        f.write("$EndNodes\n$Elements\n")
        elems = []
        for i in range(nx):
            elems.append(f"1 2 {int(side_bids['S'][i])} 0 "
                         f"{nid(i, 0)} {nid(i + 1, 0)}")
            elems.append(f"1 2 {int(side_bids['N'][i])} 0 "
                         f"{nid(i, ny)} {nid(i + 1, ny)}")
        for j in range(ny):
            elems.append(f"1 2 {int(side_bids['W'][j])} 0 "
                         f"{nid(0, j)} {nid(0, j + 1)}")
            elems.append(f"1 2 {int(side_bids['E'][j])} 0 "
                         f"{nid(nx, j)} {nid(nx, j + 1)}")
        for j in range(ny):
            for i in range(nx):
                if mask is not None and not mask[j, i]:
                    continue
                elems.append(f"3 2 100 0 {nid(i, j)} {nid(i + 1, j)} "
                             f"{nid(i + 1, j + 1)} {nid(i, j + 1)}")
        f.write(f"{len(elems)}\n")
        for k, e in enumerate(elems, 1):
            f.write(f"{k} {e}\n")
        f.write("$EndElements\n")
