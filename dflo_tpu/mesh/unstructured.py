"""General unstructured quadrilateral meshes.

Covers the reference's arbitrary-Gmsh-quad-mesh capability
(GridIn::read_msh, src/claw.cc:956-967): any conforming all-quad mesh —
including the fully unstructured delquad disk meshes of
examples/gravity/*/grid_uns.geo — becomes a flat cell list with
precomputed face-gather tables, the TPU-native replacement for deal.II's
cell/face iterators.  The solution layout is ``u[4, K, N]`` (component,
local DoF, cell); neighbor access is an index gather instead of the
structured path's array shift.

Cell storage: ``quads[N, 4]`` node ids in CCW ring order (v0, v1, v2, v3).
The bilinear (Q1/MappingQ1) reference map uses corners
x00=v0, x10=v1, x01=v3, x11=v2 with (xi, eta) on [0, 1]^2.
Local sides follow dflo_tpu.ops.basis face ids:

    W (xi=0): v0 -> v3   E (xi=1): v1 -> v2     (s = eta, increasing)
    S (eta=0): v0 -> v1  N (eta=1): v3 -> v2    (s = xi, increasing)

All straight-edge geometric quantities (side normals, lengths, face
tables, orientation flips) are precomputed once in numpy at setup.
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np

# local side ids, matching dflo_tpu.ops.basis WEST/EAST/SOUTH/NORTH
WEST, EAST, SOUTH, NORTH = 0, 1, 2, 3

# (start corner, end corner) in the CCW ring for each side, s-increasing
_SIDE_NODES = {WEST: (0, 3), EAST: (1, 2), SOUTH: (0, 1), NORTH: (3, 2)}


@dataclasses.dataclass(frozen=True)
class FaceTables:
    """Interior-face and boundary-face gather tables (built once)."""
    # interior faces, Nf entries
    cell_l: np.ndarray      # [Nf] cell owning the L side
    side_l: np.ndarray      # [Nf] local side id on L
    cell_r: np.ndarray      # [Nf]
    side_r: np.ndarray      # [Nf]
    flip_r: np.ndarray      # [Nf] bool: R's s-parameterization runs opposite
    # boundary faces, Nb entries
    bcell: np.ndarray       # [Nb]
    bside: np.ndarray       # [Nb]
    bid: np.ndarray         # [Nb] physical boundary id (-1 if untagged)


class UnstructuredQuadMesh:
    """Conforming all-quad mesh; cells on one flat axis."""

    def __init__(self, nodes: np.ndarray, quads: np.ndarray,
                 boundary_ids: dict | None = None):
        """nodes [Nn, 2] float; quads [N, 4] CCW node ids;
        boundary_ids: {(na, nb) sorted-node-pair: physical id}."""
        self.nodes = np.asarray(nodes, float)
        self.quads = np.asarray(quads, np.int64)
        if self.quads.ndim != 2 or self.quads.shape[1] != 4:
            raise ValueError("quads must be [N, 4]")
        self._boundary_ids = dict(boundary_ids or {})
        self._orient_ccw()
        self.faces = self._build_faces(self._boundary_ids)
        self._check_conforming()

    # ------------------------------------------------------------------
    @property
    def n_cells(self) -> int:
        return len(self.quads)

    def corner_xy(self):
        """Corner coordinate arrays ((x00,y00),(x10,y10),(x01,y01),(x11,y11)),
        each pair of [N] arrays (bilinear-map corners)."""
        q = self.quads
        P = self.nodes
        v0, v1, v2, v3 = P[q[:, 0]], P[q[:, 1]], P[q[:, 2]], P[q[:, 3]]
        return ((v0[:, 0], v0[:, 1]), (v1[:, 0], v1[:, 1]),
                (v3[:, 0], v3[:, 1]), (v2[:, 0], v2[:, 1]))

    def _orient_ccw(self):
        """Flip any clockwise cell (signed shoelace area < 0)."""
        P = self.nodes
        q = self.quads
        x = P[q, 0]
        y = P[q, 1]
        area2 = np.zeros(len(q))
        for i in range(4):
            j = (i + 1) % 4
            area2 += x[:, i] * y[:, j] - x[:, j] * y[:, i]
        cw = area2 < 0
        if np.any(cw):
            self.quads[cw] = self.quads[cw][:, ::-1]

    def _build_faces(self, boundary_ids: dict) -> FaceTables:
        edges: dict = {}
        for c in range(self.n_cells):
            for s, (a, b) in _SIDE_NODES.items():
                na, nb = int(self.quads[c, a]), int(self.quads[c, b])
                edges.setdefault((min(na, nb), max(na, nb)),
                                 []).append((c, s, na, nb))
        cl, sl, cr, sr, fl = [], [], [], [], []
        bc, bs, bi = [], [], []
        for key, owners in edges.items():
            if len(owners) == 2:
                (c1, s1, a1, _b1), (c2, s2, a2, _b2) = owners
                cl.append(c1)
                sl.append(s1)
                cr.append(c2)
                sr.append(s2)
                fl.append(a1 != a2)  # different start nodes => opposite s
                                     # parameterization directions
            elif len(owners) == 1:
                c1, s1, _, _ = owners[0]
                bc.append(c1)
                bs.append(s1)
                bi.append(boundary_ids.get(key, -1))
            else:
                raise ValueError(f"edge {key} shared by {len(owners)} cells "
                                 "(non-conforming mesh)")
        ii = np.int64
        return FaceTables(np.array(cl, ii), np.array(sl, ii),
                          np.array(cr, ii), np.array(sr, ii),
                          np.array(fl, bool),
                          np.array(bc, ii), np.array(bs, ii),
                          np.array(bi, ii))

    def _check_conforming(self):
        detJ = self.metric(np.array([[0.5, 0.5]]))[4]
        if float(detJ.min()) <= 0.0:
            raise ValueError("mesh has inverted/degenerate cells (detJ <= 0)")

    # ---- geometry (same bilinear-map formulas as CurvilinearMesh) ------
    def point_coords(self, ref_pts: np.ndarray):
        """[M, 2] reference points -> (x[M, N], y[M, N])."""
        (x00, y00), (x10, y10), (x01, y01), (x11, y11) = self.corner_xy()
        xi = np.asarray(ref_pts)[:, 0][:, None]
        eta = np.asarray(ref_pts)[:, 1][:, None]
        x = ((1 - xi) * (1 - eta) * x00 + xi * (1 - eta) * x10
             + (1 - xi) * eta * x01 + xi * eta * x11)
        y = ((1 - xi) * (1 - eta) * y00 + xi * (1 - eta) * y10
             + (1 - xi) * eta * y01 + xi * eta * y11)
        return x, y

    def metric(self, ref_pts: np.ndarray):
        """(x_xi, x_eta, y_xi, y_eta, detJ) at reference points, each [M, N]."""
        (x00, y00), (x10, y10), (x01, y01), (x11, y11) = self.corner_xy()
        xi = np.asarray(ref_pts)[:, 0][:, None]
        eta = np.asarray(ref_pts)[:, 1][:, None]
        x_xi = (1 - eta) * (x10 - x00) + eta * (x11 - x01)
        x_eta = (1 - xi) * (x01 - x00) + xi * (x11 - x10)
        y_xi = (1 - eta) * (y10 - y00) + eta * (y11 - y01)
        y_eta = (1 - xi) * (y01 - y00) + xi * (y11 - y10)
        return x_xi, x_eta, y_xi, y_eta, x_xi * y_eta - x_eta * y_xi

    def side_geometry(self):
        """Per-cell-side outward unit normals and lengths:
        (snx[4, N], sny[4, N], slen[4, N]).  Straight edges: constant/side."""
        P = self.nodes
        q = self.quads
        snx = np.zeros((4, self.n_cells))
        sny = np.zeros((4, self.n_cells))
        slen = np.zeros((4, self.n_cells))
        # CCW ring edges: outward normal of CCW edge (dx,dy) is (dy,-dx)/L
        ccw = {SOUTH: (0, 1), EAST: (1, 2), NORTH: (2, 3), WEST: (3, 0)}
        for s, (a, b) in ccw.items():
            d = P[q[:, b]] - P[q[:, a]]
            L = np.hypot(d[:, 0], d[:, 1])
            snx[s] = d[:, 1] / L
            sny[s] = -d[:, 0] / L
            slen[s] = L
        return snx, sny, slen

    def side_midpoints(self):
        """(mx[4, N], my[4, N]) physical side midpoints (face centers)."""
        P = self.nodes
        q = self.quads
        mx = np.zeros((4, self.n_cells))
        my = np.zeros((4, self.n_cells))
        for s, (a, b) in _SIDE_NODES.items():
            m = 0.5 * (P[q[:, a]] + P[q[:, b]])
            mx[s], my[s] = m[:, 0], m[:, 1]
        return mx, my

    def side_coords(self, side: int, s: np.ndarray):
        """Physical coordinates along every cell's given side:
        (x[nq, N], y[nq, N]), s-increasing parameterization."""
        a, b = _SIDE_NODES[side]
        P = self.nodes
        q = self.quads
        pa, pb = P[q[:, a]], P[q[:, b]]
        s = np.asarray(s)[:, None]
        x = pa[:, 0][None, :] + s * (pb[:, 0] - pa[:, 0])[None, :]
        y = pa[:, 1][None, :] + s * (pb[:, 1] - pa[:, 1])[None, :]
        return x, y

    def cell_measure(self) -> np.ndarray:
        """Exact bilinear cell areas [N] (shoelace)."""
        P = self.nodes
        q = self.quads
        x = P[q, 0]
        y = P[q, 1]
        a2 = np.zeros(self.n_cells)
        for i in range(4):
            j = (i + 1) % 4
            a2 += x[:, i] * y[:, j] - x[:, j] * y[:, i]
        return 0.5 * a2

    def cell_h(self) -> np.ndarray:
        """diameter/sqrt(dim) per cell (compute_time_step_q,
        src/claw.cc:544-546)."""
        (x00, y00), (x10, y10), (x01, y01), (x11, y11) = self.corner_xy()
        d1 = np.hypot(x11 - x00, y11 - y00)
        d2 = np.hypot(x10 - x01, y10 - y01)
        return np.maximum(d1, d2) / np.sqrt(2.0)

    def reorder(self, perm: np.ndarray) -> "UnstructuredQuadMesh":
        """New mesh with cells permuted (new cell i = old cell perm[i]).

        All face/gather tables are rebuilt from the permuted connectivity,
        so solver state built on the reordered mesh is self-consistent;
        a state on the OLD ordering maps over as u_new = u_old[..., perm]."""
        perm = np.asarray(perm, np.int64)
        if sorted(perm.tolist()) != list(range(self.n_cells)):
            raise ValueError("perm must be a permutation of all cells")
        return UnstructuredQuadMesh(self.nodes, self.quads[perm],
                                    self._boundary_ids)

    def morton_order(self) -> np.ndarray:
        """Permutation sorting cells along a Morton (Z-order) space-filling
        curve of their centroids — the same locality heuristic p4est uses to
        partition the reference's distributed Triangulation
        (src_mpi/claw.cc:59-76: p4est forests are Morton-ordered).  Cells
        that are geometric neighbors land close on the flat axis, so an
        equal-split sharding of the cell axis yields compact per-device
        blocks with O(boundary) cross-device face gathers instead of the
        scattered halos a raw file ordering produces."""
        cx, cy = self.cell_centers()
        B = 16    # bits per axis
        scale = (1 << B) - 1

        def norm(a):
            lo, hi = float(a.min()), float(a.max())
            span = hi - lo if hi > lo else 1.0
            return np.minimum((
                (a - lo) / span * scale).astype(np.uint64), scale)

        def spread(v):
            # interleave zeros between bits (16 -> 32 bit spread)
            v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
            v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
            v = (v | (v << 2)) & np.uint64(0x3333333333333333)
            v = (v | (v << 1)) & np.uint64(0x5555555555555555)
            return v

        code = spread(norm(cx)) | (spread(norm(cy)) << np.uint64(1))
        return np.argsort(code, kind="stable")

    def cell_centers(self):
        x, y = self.point_coords(np.array([[0.5, 0.5]]))
        return x[0], y[0]

    def neighbor_table(self) -> np.ndarray:
        """nbr[4, N]: adjacent cell id across each local side, -1 at
        boundaries (the reference's L/R/B/T tables, src/claw.cc:336-380,
        generalized to arbitrary connectivity)."""
        nbr = np.full((4, self.n_cells), -1, np.int64)
        f = self.faces
        nbr[f.side_l, f.cell_l] = f.cell_r
        nbr[f.side_r, f.cell_r] = f.cell_l
        return nbr


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------

def from_curvilinear(mesh, side_bids: dict | None = None,
                     merge_coincident: bool = False,
                     tol: float = 1e-9) -> UnstructuredQuadMesh:
    """Convert a structured (Cartesian or curvilinear) block into the
    unstructured representation.  side_bids: {'W'|'E'|'S'|'N': id or [ids]}
    physical ids for the block's outer boundary edges.
    merge_coincident: unify duplicated nodes (O-mesh wrap seams become real
    interior faces)."""
    if hasattr(mesh, "X"):
        X, Y = np.asarray(mesh.X), np.asarray(mesh.Y)
    else:  # CartesianMesh
        xs = mesh.x0 + np.arange(mesh.nx + 1) * mesh.dx
        ys = mesh.y0 + np.arange(mesh.ny + 1) * mesh.dy
        X, Y = np.meshgrid(xs, ys)
    ny, nx = X.shape[0] - 1, X.shape[1] - 1
    nid = np.arange(X.size).reshape(X.shape)
    nodes = np.stack([X.ravel(), Y.ravel()], axis=1)
    if merge_coincident:
        key = np.round(nodes / tol).astype(np.int64)
        _, first, inv = np.unique(key, axis=0, return_index=True,
                                  return_inverse=True)
        nodes = nodes[first]
        nid = inv[nid]
    # CCW ring: (i,j), (i,j+1), (i+1,j+1), (i+1,j)
    quads = np.stack([nid[:-1, :-1].ravel(), nid[:-1, 1:].ravel(),
                      nid[1:, 1:].ravel(), nid[1:, :-1].ravel()], axis=1)
    bids = {}
    if side_bids:
        def tag(pairs, bid_seq):
            bid_seq = np.broadcast_to(np.asarray(bid_seq), (len(pairs),))
            for (na, nb), b in zip(pairs, bid_seq):
                bids[(min(na, nb), max(na, nb))] = int(b)
        tag(list(zip(nid[:-1, 0], nid[1:, 0])), side_bids.get("W", -1))
        tag(list(zip(nid[:-1, -1], nid[1:, -1])), side_bids.get("E", -1))
        tag(list(zip(nid[0, :-1], nid[0, 1:])), side_bids.get("S", -1))
        tag(list(zip(nid[-1, :-1], nid[-1, 1:])), side_bids.get("N", -1))
    return UnstructuredQuadMesh(nodes, quads, bids)


def merge_blocks(blocks: list, tol: float = 1e-9) -> UnstructuredQuadMesh:
    """Glue multiple UnstructuredQuadMesh blocks by coincident-node merge.
    Boundary tags survive where the tagged edge stays on the outer boundary."""
    all_nodes = np.concatenate([b.nodes for b in blocks], axis=0)
    key = np.round(all_nodes / tol).astype(np.int64)
    _, first, inv = np.unique(key, axis=0, return_index=True,
                              return_inverse=True)
    nodes = all_nodes[first]
    quads, bids = [], {}
    off = 0
    for b in blocks:
        quads.append(inv[b.quads + off])
        f = b.faces
        for c, s, bid in zip(f.bcell, f.bside, f.bid):
            if bid < 0:
                continue
            a, bb = _SIDE_NODES[int(s)]
            na = int(inv[b.quads[c, a] + off])
            nb = int(inv[b.quads[c, bb] + off])
            bids[(min(na, nb), max(na, nb))] = int(bid)
        off += len(b.nodes)
    return UnstructuredQuadMesh(nodes, np.concatenate(quads, axis=0), bids)


def disk_butterfly(radius: float, lc: float, boundary_id: int = 1,
                   center=(0.0, 0.0), inner_frac: float = 0.5
                   ) -> UnstructuredQuadMesh:
    """All-quad butterfly O-grid of a full disk: one central square block +
    four blocks blending the square's edges onto the circle quarters.

    Replaces the gmsh delquad meshes of examples/gravity/*/grid_uns.geo
    (full disk, Mesh.Algorithm=8) that cannot be generated without the gmsh
    binary; resolution follows the .geo characteristic length lc
    (lc = 2*pi*r/n, grid_uns.geo).  Cell sizes match lc at the rim and grade
    smoothly inward; the center has NO singular point (the delquad mesher's
    point-1 singularity is exactly what the butterfly topology avoids)."""
    a = inner_frac * radius
    # central square corners at radius a, angles 45/135/225/315 deg
    th0 = np.pi / 4.0
    corners = np.array([[a * np.cos(th0 + k * np.pi / 2),
                         a * np.sin(th0 + k * np.pi / 2)] for k in range(4)])
    side = float(np.hypot(*(corners[1] - corners[0])))
    quarter = np.pi * radius / 2.0
    n_c = max(2, int(round(0.5 * (side + quarter) / lc)))
    n_r = max(2, int(round((radius - a) / lc)))
    cx, cy = center

    def block(X, Y):
        return from_curvilinear(
            type("M", (), {"X": X + cx, "Y": Y + cy})())

    blocks = []
    # central block: bilinear square between the four corners
    s = np.linspace(0.0, 1.0, n_c + 1)
    S, T = np.meshgrid(s, s)
    c0, c1, c2, c3 = corners  # at 45, 135, 225, 315 deg
    # map: xi from c2->c3 edge ... use corners (x00=c2(225), x10=c3(315),
    # x01=c1(135), x11=c0(45)) so the square is axis-aligned-ish
    X = ((1 - S) * (1 - T) * c2[0] + S * (1 - T) * c3[0]
         + (1 - S) * T * c1[0] + S * T * c0[0])
    Y = ((1 - S) * (1 - T) * c2[1] + S * (1 - T) * c3[1]
         + (1 - S) * T * c1[1] + S * T * c0[1])
    blocks.append(block(X, Y))

    # four outer blocks: inner chord -> quarter arc, eta = radial
    t = np.linspace(0.0, 1.0, n_c + 1)
    e = np.linspace(0.0, 1.0, n_r + 1)
    TT, EE = np.meshgrid(t, e)
    for k in range(4):
        th_a = th0 + (k - 1) * np.pi / 2.0   # start angle of the quarter
        thq = th_a + TT * (np.pi / 2.0)
        pa, pb = corners[(k - 1) % 4], corners[k]
        xi_in = pa[0] + TT * (pb[0] - pa[0])
        yi_in = pa[1] + TT * (pb[1] - pa[1])
        xo = radius * np.cos(thq)
        yo = radius * np.sin(thq)
        X = (1 - EE) * xi_in + EE * xo
        Y = (1 - EE) * yi_in + EE * yo
        b = from_curvilinear(type("M", (), {"X": X + cx, "Y": Y + cy})(),
                             side_bids={"N": boundary_id})
        blocks.append(b)
    return merge_blocks(blocks)


# ---------------------------------------------------------------------------
# Gmsh 2.x reader (general quads)
# ---------------------------------------------------------------------------

def from_msh(path: str) -> UnstructuredQuadMesh:
    """Read any conforming all-quad Gmsh 2.x ASCII mesh: $Nodes + $Elements
    with type-3 quads and type-1 boundary lines carrying physical ids
    (the GridIn::read_msh capability, src/claw.cc:956-967)."""
    with open(path) as f:
        text = f.read()

    def section(name):
        m = re.search(rf"\${name}\n(.*?)\$End{name}", text, re.S)
        if m is None:
            raise ValueError(f"missing ${name} section in {path}")
        return m.group(1).strip().splitlines()

    nl = section("Nodes")
    n_nodes = int(nl[0])
    idmap = {}
    coords = np.zeros((n_nodes, 2))
    for i, line in enumerate(nl[1:1 + n_nodes]):
        parts = line.split()
        idmap[int(parts[0])] = i
        coords[i] = (float(parts[1]), float(parts[2]))

    el = section("Elements")
    n_elem = int(el[0])
    quads, bids = [], {}
    for line in el[1:1 + n_elem]:
        parts = [int(v) for v in line.split()]
        etype, ntags = parts[1], parts[2]
        tags = parts[3:3 + ntags]
        conn = parts[3 + ntags:]
        if etype == 3:      # 4-node quad
            quads.append([idmap[v] for v in conn])
        elif etype == 1:    # 2-node line
            na, nb = idmap[conn[0]], idmap[conn[1]]
            bids[(min(na, nb), max(na, nb))] = tags[0] if tags else -1
        # points (15) and other types: ignored
    if not quads:
        raise ValueError(f"{path} contains no quad elements")
    return UnstructuredQuadMesh(coords, np.array(quads, np.int64), bids)
