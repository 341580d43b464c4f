"""Sparse runtime AMR: fixed-capacity refined-tile pools, static shapes.

The production AMR path (the reference's refine_grid + run-loop cadence,
src/refine.cc:40-133, src/claw.cc:985-994, 1112-1128), re-designed for XLA's
static-shape world:

- The domain is a grid of FIXED PHYSICAL TILES (T x T coarse cells each).
  Every tile lives at exactly one refinement level l in {0..L}; a level-l
  tile holds an (m x m) patch of cells, m = T * 2^l.  Because tiles have
  identical physical size, cross-tile interfaces are always full-edge to
  full-edge with resolution ratio 1, 1/2 or 2, and 2:1 balance at tile
  granularity removes all hanging-offset bookkeeping.
- Level l > 0 lives in a fixed-capacity POOL ``u[4, K, P_l, m, m]`` with an
  active mask and slot->tile tables; level 0's "pool" is simply all tiles.
  Compute cost scales with POOL CAPACITY, not with the uniformly refined
  grid — the sparsity the reference gets from its quadtree.
- Cross-tile fluxes are assembled by GATHER + CANONICAL RECOMPUTE: both
  sides of an interface gather the identical pair of traces and evaluate
  the identical numerical-flux expression (west/south trace first, +axis
  normal), so no scatter-add exists and conservation holds to roundoff.
  Coarse-fine interfaces evaluate the flux at the FINE subface points (the
  mortar rule of deal.II's subface integration, src/indicator.cc:132-172):
  the fine side lifts it directly, the coarse side lifts the same values
  through precomputed subface lift matrices.
- Adaptation is a host-side EVENT at the reference's cadence: per-tile
  log(1+|grad rho|) scores (src/equation.h:1085-1116), refine above
  `shock value`, coarsen below 0.75x (src/refine.cc:48-60), 2:1 balance,
  capacity caps (`max elements`), pinned always-max tiles (the forward_step
  corner prerefine, src/refine.cc:110-133), then polynomial
  prolongation / L2 restriction as SolutionTransfer (src/refine.cc:75-104)
  and a rebuild of the gather tables.  Tables are traced inputs, so
  adaptation never recompiles the step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.basis import WEST, EAST, SOUTH, NORTH
from dflo_tpu.ops.contract import PRECISION, basis_apply
from dflo_tpu.physics import euler
from dflo_tpu.physics.fluxes import get_flux
from dflo_tpu.solver.spatial import BoundarySide, _as_segmented
from dflo_tpu.stab.limiter import minmod
from dflo_tpu.stab.positivity import make_positivity_limiter

# side kinds in the gather tables
SAME, COARSE, FINE, DOMAIN, WALL, NONE = 0, 1, 2, 3, 4, 5
_OPP = {WEST: EAST, EAST: WEST, SOUTH: NORTH, NORTH: SOUTH}
_DY = {WEST: 0, EAST: 0, SOUTH: -1, NORTH: 1}
_DX = {WEST: -1, EAST: 1, SOUTH: 0, NORTH: 0}


def _trace_prolong_1d(basis) -> tuple[np.ndarray, np.ndarray]:
    """PrH[nq, nq]: face-trace values at the nq Gauss points of each half
    interval from the nq parent-face Gauss values (exact: the face trace of
    a Qk solution is a degree-p polynomial)."""
    from dflo_tpu.ops.basis import lagrange_values
    xq = basis.xq
    A = lagrange_values(xq, xq / 2.0)
    B = lagrange_values(xq, 0.5 + xq / 2.0)
    return A, B


def _subface_lift(basis, face: int) -> list[np.ndarray]:
    """L_h[nq, K] with sum_h L_h^T @ F_h = int_face F phi ds in reference
    units: phi evaluated at the parent-face points of subface h, weighted
    w_q / 2 (subface length fraction)."""
    out = []
    for h in range(2):
        s = (h + basis.xq) / 2.0
        if face == WEST:
            pts = np.stack([np.zeros_like(s), s], axis=1)
        elif face == EAST:
            pts = np.stack([np.ones_like(s), s], axis=1)
        elif face == SOUTH:
            pts = np.stack([s, np.zeros_like(s)], axis=1)
        else:
            pts = np.stack([s, np.ones_like(s)], axis=1)
        out.append(0.5 * basis.wq[:, None] * basis.eval_at(pts))
    return out


def _interleave(A, B, axis=-1):
    """[..., n], [..., n] -> [..., 2n] alternating A0 B0 A1 B1..."""
    st = jnp.stack([A, B], axis=-1 if axis == -1 else axis + 1)
    if axis == -1:
        return st.reshape(A.shape[:-1] + (2 * A.shape[-1],))
    raise ValueError("interleave on last axis only")


def _pairmean(A):
    """[..., 2n] -> [..., n] mean of consecutive pairs."""
    return 0.5 * (A[..., 0::2] + A[..., 1::2])


# ---------------------------------------------------------------------------
# topology (host side)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TileTopology:
    """Host-side AMR state: per-tile levels + slot assignments."""
    nty: int
    ntx: int
    max_level: int
    capacities: list            # capacities[l] for l >= 1
    fluid: np.ndarray           # [nty, ntx] bool, False = solid tile
    Lmap: np.ndarray            # [nty, ntx] current level per tile
    slots: list                 # slots[l] = [(ty, tx), ...] active tiles
    per_x: bool = False         # periodic wrap along tile columns
    per_y: bool = False

    @classmethod
    def create(cls, nty, ntx, max_level, capacities, fluid=None,
               per_x=False, per_y=False):
        fluid = np.ones((nty, ntx), bool) if fluid is None \
            else np.asarray(fluid, bool)
        Lmap = np.zeros((nty, ntx), np.int64)
        Lmap[~fluid] = 0
        topo = cls(nty, ntx, max_level, list(capacities), fluid, Lmap,
                   [None] * (max_level + 1), per_x, per_y)
        topo._assign_slots()
        return topo

    def _assign_slots(self):
        self.slots[0] = [(ty, tx) for ty in range(self.nty)
                         for tx in range(self.ntx)]
        for lv in range(1, self.max_level + 1):
            tiles = [tuple(t) for t in np.argwhere(self.Lmap == lv)]
            if len(tiles) > self.capacities[lv - 1]:
                raise ValueError(f"level {lv} over capacity")
            self.slots[lv] = tiles

    def slot_map(self, lv: int) -> np.ndarray:
        """[nty, ntx] -> slot id at level lv (or -1)."""
        m = np.full((self.nty, self.ntx), -1, np.int64)
        for i, (ty, tx) in enumerate(self.slots[lv]):
            m[ty, tx] = i
        return m

    def balance(self, newL: np.ndarray) -> np.ndarray:
        """Enforce 2:1 balance: each tile's level >= max(neighbor) - 1
        is NOT required, but <= min(neighbor) + 1 is — clamp from above
        iteratively (raising neighbors, the deal.II convention)."""
        L = newL.copy()
        L[~self.fluid] = 0
        for _ in range(self.max_level + 2):
            changed = False
            for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                wrap = self.per_x if dy == 0 else self.per_y
                if wrap:
                    # periodic neighbor levels wrap around the domain
                    # (DoFHandler periodicity, src_mpi/DealiiExtensions.h:
                    # 40-119: the constraint graph crosses the seam)
                    nb = np.roll(L, (-dy, -dx), axis=(0, 1))
                    fl_nb = np.roll(self.fluid, (-dy, -dx), axis=(0, 1))
                else:
                    nb = np.full_like(L, -1)
                    src = L
                    if dy == 0 and dx == 1:
                        nb[:, :-1] = src[:, 1:]
                    elif dy == 0:
                        nb[:, 1:] = src[:, :-1]
                    elif dy == 1:
                        nb[:-1, :] = src[1:, :]
                    else:
                        nb[1:, :] = src[:-1, :]
                    fl_nb = None
                    if not self.fluid.all():
                        fl = np.full_like(self.fluid, False)
                        if dy == 0 and dx == 1:
                            fl[:, :-1] = self.fluid[:, 1:]
                        elif dy == 0:
                            fl[:, 1:] = self.fluid[:, :-1]
                        elif dy == 1:
                            fl[:-1, :] = self.fluid[1:, :]
                        else:
                            fl[1:, :] = self.fluid[:-1, :]
                        fl_nb = fl
                # fluid tiles only: solid neighbors impose nothing
                if fl_nb is not None:
                    nb = np.where(fl_nb, nb, -1)
                need = np.maximum(nb - 1, 0)
                up = self.fluid & (L < need)
                if up.any():
                    L = np.maximum(L, np.where(up, need, 0))
                    changed = True
            if not changed:
                break
        return L


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AMRConfig:
    """subsection 'refinement' (src/parameters.cc:96-142)."""
    shock_value: float = 1.0
    shock_levels: int = 1
    iter_step: int = 5
    max_elements: int = 10**6
    coarsen_factor: float = 0.75        # src/refine.cc:56
    tile: int = 4


class AMRSolver:
    """Adaptive explicit DG solver on tile pools (Cartesian base mesh)."""

    def __init__(self, basis: basis_mod.Basis, mesh, bcs, flux: str = "lxf",
                 amr: AMRConfig | None = None, limiter=None,
                 cfl: float = 0.9, mask=None, dtype=None,
                 solid_state=(0.0, 0.0, 1.0, 2.5), pins=()):
        from dflo_tpu.driver import LimiterConfig
        from dflo_tpu.solver import rk as rk_mod
        self.basis = basis
        self.mesh = mesh
        self.cfl = cfl
        self.amr = amr or AMRConfig()
        self.limiter_cfg = limiter or LimiterConfig()
        dtype = dtype or jnp.zeros(0).dtype
        self.dtype = dtype
        T = self.amr.tile
        if mesh.nx % T or mesh.ny % T:
            raise ValueError(f"tile size {T} must divide ({mesh.ny},{mesh.nx})")
        self.nty, self.ntx = mesh.ny // T, mesh.nx // T
        self.T = T
        L = self.amr.shock_levels
        self.max_level = L
        self.pins = [(float(px), float(py)) for (px, py) in pins]

        # tile-aligned solid mask
        fluid = None
        if mask is not None:
            mask = np.asarray(mask, bool)
            tiles = mask.reshape(self.nty, T, self.ntx, T)
            all_f = tiles.all(axis=(1, 3))
            any_f = tiles.any(axis=(1, 3))
            if (all_f != any_f).any():
                raise ValueError("solid mask must be tile-aligned "
                                 "(choose a smaller `tile`)")
            fluid = all_f
        self._u_solid = jnp.asarray(solid_state, dtype)

        # capacities per refined level from `max elements`
        caps = []
        for lv in range(1, L + 1):
            m = T * 2**lv
            cap = min(self.nty * self.ntx,
                      max(4, self.amr.max_elements // (m * m)))
            caps.append(cap)
        # periodic wrap (pair symmetry validated by the config layer; the
        # reference's periodic cell map recurses refinement levels,
        # src_mpi/DealiiExtensions.h:40-119 + src_mpi/claw.cc:155-205 —
        # here the wrap lives in the tile neighbor tables)
        self.per_x = bcs["W"].kind == euler.BC_PERIODIC
        self.per_y = bcs["S"].kind == euler.BC_PERIODIC
        self.capacities = caps
        self.topo = TileTopology.create(self.nty, self.ntx, L, caps, fluid,
                                        per_x=self.per_x, per_y=self.per_y)

        # per-level cell sizes and constants
        self.m = [T * 2**lv for lv in range(L + 1)]
        self.dx = [mesh.dx / 2**lv for lv in range(L + 1)]
        self.dy = [mesh.dy / 2**lv for lv in range(L + 1)]

        cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731
        b = basis
        self.K, self.nq = b.K, b.nq
        self.V = cast(b.V)
        self._collocated = b.is_nodal_collocated and b.nq == b.degree + 1
        self.trace_stack = cast(np.concatenate(
            [np.asarray(b.faceV).reshape(-1, b.K), (b.wq2 @ b.V)[None]], 0))
        self.faceVw = [cast(b.wq[:, None] * b.faceV[f]) for f in range(4)]
        self.GxW = cast(b.wq2[:, None] * b.Gx)
        self.GyW = cast(b.wq2[:, None] * b.Gy)
        self.minv = cast(1.0 / b.mass)
        self.PrA, self.PrB = (cast(a) for a in _trace_prolong_1d(b))
        self.Lsub = {f: [cast(a) for a in _subface_lift(b, f)]
                     for f in range(4)}
        self.num_flux = get_flux(flux)
        self.avg_op = cast(b.wq2 @ b.V)
        self._positivity = (make_positivity_limiter(b, mesh, dtype)
                            if self.limiter_cfg.pos_lim else None)
        if self.limiter_cfg.type not in ("none", "TVB"):
            raise ValueError("AMR supports limiter type none|TVB")

        # boundary machinery per level/side
        self.bcs = {"W": _as_segmented(bcs["W"], mesh.ny),
                    "E": _as_segmented(bcs["E"], mesh.ny),
                    "S": _as_segmented(bcs["S"], mesh.nx),
                    "N": _as_segmented(bcs["N"], mesh.nx)}
        if (self.bcs["W"].kind == euler.BC_PERIODIC) != \
                (self.bcs["E"].kind == euler.BC_PERIODIC) or \
                (self.bcs["S"].kind == euler.BC_PERIODIC) != \
                (self.bcs["N"].kind == euler.BC_PERIODIC):
            raise ValueError("periodic BCs must be set in W/E or S/N pairs")
        self._bc_xy, self._bc_seg = [], []
        for lv in range(L + 1):
            d, dseg = {}, {}
            for name, side in (("W", WEST), ("E", EAST),
                               ("S", SOUTH), ("N", NORTH)):
                xb, yb = mesh.face_coords(side, b.xq)     # [nq, n]
                # refine along the face to level lv
                n = xb.shape[1]
                s_sub = np.concatenate(
                    [(h + b.xq[:, None]) / 2.0 for h in range(1)], 1)
                # rebuild from scratch at the refined resolution
                nn = n * 2**lv
                if side in (WEST, EAST):
                    ytmp = mesh.y0 + ((np.arange(nn)[None, :]
                                       + b.xq[:, None]) * (mesh.dy / 2**lv))
                    xtmp = np.full_like(ytmp, mesh.x0 if side == WEST
                                        else mesh.x1)
                else:
                    xtmp = mesh.x0 + ((np.arange(nn)[None, :]
                                       + b.xq[:, None]) * (mesh.dx / 2**lv))
                    ytmp = np.full_like(xtmp, mesh.y0 if side == SOUTH
                                        else mesh.y1)
                d[name] = (cast(xtmp), cast(ytmp))
                dseg[name] = jnp.asarray(
                    np.repeat(self.bcs[name].seg_id, 2**lv))
            self._bc_xy.append(d)
            self._bc_seg.append(dseg)

        self._tables = self._build_tables()
        self._step = jax.jit(self._make_step())
        self._multi_cache = {}
        self.last_adapt_stats = None
        import dflo_tpu.solver.rk as _rk
        self.ark, self.stage_times = _rk.rk_coeffs(
            _rk.default_scheme(b.degree))

    # ------------------------------------------------------------------
    # tables
    # ------------------------------------------------------------------
    def _pool_size(self, lv: int) -> int:
        return self.nty * self.ntx if lv == 0 else self.capacities[lv - 1]

    def _build_tables(self):
        topo = self.topo
        smaps = [topo.slot_map(lv) for lv in range(self.max_level + 1)]
        tables = []
        for lv in range(self.max_level + 1):
            P = self._pool_size(lv)
            n_act = len(topo.slots[lv])
            active = np.zeros(P, bool)
            active[:n_act] = True
            oy = np.zeros(P, np.int64)
            ox = np.zeros(P, np.int64)
            kind = np.full((4, P), NONE, np.int64)
            # per-kind neighbor slots, each valid (0) in its own pool so
            # unselected gathers never go out of range
            nbr_same = np.zeros((4, P), np.int64)
            nbr_co = np.zeros((4, P), np.int64)
            nbr_fi = np.zeros((4, P), np.int64)
            for i, (ty, tx) in enumerate(topo.slots[lv]):
                oy[i], ox[i] = ty, tx
                if lv == 0 and (not topo.fluid[ty, tx]
                                or topo.Lmap[ty, tx] != 0):
                    # solid tile, or a tile living at a refined level: its
                    # level-0 slot is a placeholder only
                    active[i] = False
                    kind[:, i] = NONE
                    continue
                for s in range(4):
                    ny_, nx_ = ty + _DY[s], tx + _DX[s]
                    # periodic wrap of the tile neighbor index; otherwise
                    # out-of-range means the physical domain boundary
                    if not (0 <= nx_ < topo.ntx):
                        if topo.per_x:
                            nx_ %= topo.ntx
                        else:
                            kind[s, i] = DOMAIN
                            continue
                    if not (0 <= ny_ < topo.nty):
                        if topo.per_y:
                            ny_ %= topo.nty
                        else:
                            kind[s, i] = DOMAIN
                            continue
                    if not topo.fluid[ny_, nx_]:
                        kind[s, i] = WALL
                        continue
                    nl = topo.Lmap[ny_, nx_]
                    if nl == lv:
                        kind[s, i] = SAME
                        nbr_same[s, i] = smaps[lv][ny_, nx_]
                    elif nl == lv - 1:
                        kind[s, i] = COARSE
                        nbr_co[s, i] = smaps[lv - 1][ny_, nx_]
                    elif nl == lv + 1:
                        kind[s, i] = FINE
                        nbr_fi[s, i] = smaps[lv + 1][ny_, nx_]
                    else:
                        raise AssertionError("2:1 balance violated")
            tables.append(dict(
                active=jnp.asarray(active),
                oy=jnp.asarray(oy), ox=jnp.asarray(ox),
                kind=jnp.asarray(kind), nbr_same=jnp.asarray(nbr_same),
                nbr_co=jnp.asarray(nbr_co), nbr_fi=jnp.asarray(nbr_fi)))
        return tables

    # ------------------------------------------------------------------
    # state construction
    # ------------------------------------------------------------------
    def node_coords(self, lv: int):
        """Physical basis-node coords of every slot at level lv:
        (x[K, P, m, m], y[K, P, m, m]) from the slot origins."""
        t = self._tables[lv]
        m = self.m[lv]
        T = self.T
        mesh = self.mesh
        oy = np.asarray(t["oy"])
        ox = np.asarray(t["ox"])
        nod = np.asarray(self.basis.nodes)
        cx = (np.arange(m) + 0.0)[None, None, :]         # cell col in patch
        cy = (np.arange(m) + 0.0)[None, :, None]
        x0 = mesh.x0 + ox[:, None, None] * (T * mesh.dx)
        y0 = mesh.y0 + oy[:, None, None] * (T * mesh.dy)
        xs = x0[None] + (cx[None] + nod[:, 0][:, None, None, None]) \
            * self.dx[lv]
        ys = y0[None] + (cy[None] + nod[:, 1][:, None, None, None]) \
            * self.dy[lv]
        full = (len(nod), len(oy), m, m)
        return (np.broadcast_to(xs, full).copy(),
                np.broadcast_to(ys, full).copy())

    def set_ic(self, fn: Callable, adapt_iters: int | None = None):
        """IC + initial adaptation loop (src/claw.cc:985-994): set, score,
        refine, re-set the IC exactly at the new resolution."""
        iters = self.max_level if adapt_iters is None else adapt_iters
        pools = self._ic_pools(fn)
        for _ in range(iters):
            pools, changed = self.adapt(pools, force_pins=True)
            pools = self._ic_pools(fn)
            if not changed:
                break
        return pools

    def _ic_pools(self, fn):
        pools = []
        for lv in range(self.max_level + 1):
            xs, ys = self.node_coords(lv)
            vals = jnp.asarray(
                fn(jnp.asarray(xs, self.dtype), jnp.asarray(ys, self.dtype)),
                self.dtype)                              # [4, K, P, m, m]
            act = self._tables[lv]["active"]
            vals = jnp.where(act[None, None, :, None, None], vals,
                             self._u_solid[:, None, None, None, None])
            pools.append(vals)
        return pools

    # ------------------------------------------------------------------
    # spatial residual
    # ------------------------------------------------------------------
    def _edges(self, TR):
        """Per-slot edge traces from the stacked trace array."""
        nq = self.nq
        uW = TR[:, 0 * nq:1 * nq]
        uE = TR[:, 1 * nq:2 * nq]
        uS = TR[:, 2 * nq:3 * nq]
        uN = TR[:, 3 * nq:4 * nq]
        ub = TR[:, 4 * nq]
        return dict(
            W=uW[..., :, 0], E=uE[..., :, -1],
            S=uS[..., 0, :], N=uN[..., -1, :],
            aW=ub[..., :, 0], aE=ub[..., :, -1],
            aS=ub[..., 0, :], aN=ub[..., -1, :]), (uW, uE, uS, uN, ub)

    def _mirror(self, U, s):
        if s in (WEST, EAST):
            return jnp.stack([-U[euler.MX], U[euler.MY],
                              U[euler.RHO], U[euler.ENE]])
        return jnp.stack([U[euler.MX], -U[euler.MY],
                          U[euler.RHO], U[euler.ENE]])

    def _ghost(self, lv, s, my_tr, t, ox, oy):
        """Domain-boundary ghost states for every slot's side s at level lv
        (valid only where kind == DOMAIN)."""
        name = {WEST: "W", EAST: "E", SOUTH: "S", NORTH: "N"}[s]
        sseg = self.bcs[name]
        xb, yb = self._bc_xy[lv][name]
        seg_full = self._bc_seg[lv][name]
        m = self.m[lv]
        # tile index * m cells along its edge at this level
        orig = oy if s in (WEST, EAST) else ox
        idx = orig[:, None] * m + jnp.arange(m)[None, :]   # [P, m]
        xs = xb[:, idx]                                    # [nq, P, m]
        ys = yb[:, idx]
        seg = seg_full[idx]                                # [P, m]
        nx_, ny_ = {WEST: (-1.0, 0.0), EAST: (1.0, 0.0),
                    SOUTH: (0.0, -1.0), NORTH: (0.0, 1.0)}[s]
        ghost = None
        for si, segm in enumerate(sseg.segments):
            if segm.values is not None:
                bv = jnp.asarray(segm.values(xs, ys, t), self.dtype)
                bv = jnp.broadcast_to(bv, my_tr.shape)     # [4, nq, P, m]
            else:
                bv = my_tr
            g = euler.compute_wminus(segm.kind, nx_, ny_, my_tr, bv)
            ghost = g if ghost is None else jnp.where(
                seg[None, None] == si, g, ghost)
        return ghost

    def rhs_all(self, pools, tables, t):
        """DG residual du/dt for every level's pool."""
        L = self.max_level
        edges, traces, R = [], [], []
        for lv in range(L + 1):
            U = pools[lv]
            TR = basis_apply(self.trace_stack, U.reshape(
                4, self.K, -1)).reshape(4, 4 * self.nq + 1, *U.shape[2:])
            e, tr = self._edges(TR)
            edges.append(e)
            traces.append(tr)

        for lv in range(L + 1):
            U = pools[lv]
            tb = tables[lv]
            m = self.m[lv]
            dx, dy = self.dx[lv], self.dy[lv]
            uW, uE, uS, uN, ub = traces[lv]
            W = U if self._collocated else basis_apply(
                self.V, U.reshape(4, self.K, -1)).reshape(
                    4, self.nq**2, *U.shape[2:])
            Fx = euler.flux_x(W)
            Fy = euler.flux_y(W)
            lift_stack = jnp.concatenate(
                [dy * self.GxW.T, dx * self.GyW.T], axis=1)
            FF = jnp.concatenate([Fx, Fy], axis=1)
            Rl = basis_apply(lift_stack, FF.reshape(
                4, FF.shape[1], -1)).reshape(4, self.K, *U.shape[2:])

            # interior faces inside the patch (spatial.py structure)
            FL, FR = uE[..., :, :-1], uW[..., :, 1:]
            AL = jnp.broadcast_to(ub[:, None, :, :, :-1], FL.shape)
            AR = jnp.broadcast_to(ub[:, None, :, :, 1:], FR.shape)
            Fi = self.num_flux(FL, FR, 1.0, 0.0, AL=AL, AR=AR)
            FLj, FRj = uN[..., :-1, :], uS[..., 1:, :]
            ALj = jnp.broadcast_to(ub[:, None, :, :-1, :], FLj.shape)
            ARj = jnp.broadcast_to(ub[:, None, :, 1:, :], FRj.shape)
            Fj = self.num_flux(FLj, FRj, 0.0, 1.0, AL=ALj, AR=ARj)

            def liftF(f, F):
                return basis_apply(self.faceVw[f].T, F.reshape(
                    4, self.nq, -1)).reshape(4, self.K, *F.shape[2:])

            # east faces of cells 0..m-2 / west faces of cells 1..m-1
            Rl = Rl.at[..., :, :-1].add(-dy * liftF(EAST, Fi))
            Rl = Rl.at[..., :, 1:].add(dy * liftF(WEST, Fi))
            Rl = Rl.at[..., :-1, :].add(-dx * liftF(NORTH, Fj))
            Rl = Rl.at[..., 1:, :].add(dx * liftF(SOUTH, Fj))

            # ---- patch-edge faces -----------------------------------------
            for s in range(4):
                my_tr = edges[lv][{WEST: "W", EAST: "E",
                                   SOUTH: "S", NORTH: "N"}[s]]  # [4, nq, P, m]
                my_av = edges[lv][{WEST: "aW", EAST: "aE",
                                   SOUTH: "aS", NORTH: "aN"}[s]]
                kind = tb["kind"][s]
                opp = _OPP[s]
                okey = {WEST: "W", EAST: "E", SOUTH: "S", NORTH: "N"}[opp]
                oakey = "a" + okey

                # same-level neighbor trace
                sm_tr = edges[lv][okey][:, :, tb["nbr_same"][s]]
                sm_av = edges[lv][oakey][:, tb["nbr_same"][s]]
                # coarse neighbor trace, prolonged to my m faces
                if lv > 0:
                    co = edges[lv - 1][okey][:, :, tb["nbr_co"][s]]
                    coA = jnp.einsum("qr,crpj->cqpj", self.PrA, co, precision=PRECISION)
                    coB = jnp.einsum("qr,crpj->cqpj", self.PrB, co, precision=PRECISION)
                    co_tr = _interleave(coA, coB)
                    co_av = jnp.repeat(
                        edges[lv - 1][oakey][:, tb["nbr_co"][s]], 2, axis=-1)
                else:
                    co_tr, co_av = sm_tr, sm_av
                ghost = self._ghost(lv, s, my_tr, t, tb["ox"], tb["oy"])
                mirror = self._mirror(my_tr, s)

                kindb = kind[None, None, :, None]
                nb_tr = jnp.where(kindb == SAME, sm_tr,
                                  jnp.where(kindb == COARSE, co_tr,
                                            jnp.where(kindb == DOMAIN, ghost,
                                                      mirror)))
                kinda = kind[None, :, None]
                nb_av = jnp.where(kinda == SAME, sm_av,
                                  jnp.where(kinda == COARSE, co_av,
                                            jnp.where(
                                                kinda == DOMAIN, my_av,
                                                self._mirror(my_av, s))))

                myA = jnp.broadcast_to(my_av[:, None], my_tr.shape)
                nbA = jnp.broadcast_to(nb_av[:, None], my_tr.shape)
                if s == WEST:
                    F = self.num_flux(nb_tr, my_tr, 1.0, 0.0, AL=nbA, AR=myA)
                elif s == EAST:
                    F = self.num_flux(my_tr, nb_tr, 1.0, 0.0, AL=myA, AR=nbA)
                elif s == SOUTH:
                    F = self.num_flux(nb_tr, my_tr, 0.0, 1.0, AL=nbA, AR=myA)
                else:
                    F = self.num_flux(my_tr, nb_tr, 0.0, 1.0, AL=myA, AR=nbA)

                def lift_edge(f, F):
                    return basis_apply(self.faceVw[f].T, F.reshape(
                        4, self.nq, -1)).reshape(4, self.K, *F.shape[2:])

                contrib = lift_edge(s, F)                  # [4, K, P, m]

                # FINE neighbor: mortar flux at subface points
                if lv < self.max_level:
                    fn_tr = edges[lv + 1][okey][:, :, tb["nbr_fi"][s]]
                    # my trace prolonged to the 2m subfaces
                    myA_tr = jnp.einsum("qr,crpj->cqpj", self.PrA, my_tr, precision=PRECISION)
                    myB_tr = jnp.einsum("qr,crpj->cqpj", self.PrB, my_tr, precision=PRECISION)
                    my_sub = _interleave(myA_tr, myB_tr)   # [4, nq, P, 2m]
                    fn_av = edges[lv + 1][oakey][:, tb["nbr_fi"][s]]
                    my_av2 = jnp.repeat(my_av, 2, axis=-1)
                    mA = jnp.broadcast_to(my_av2[:, None], my_sub.shape)
                    fA = jnp.broadcast_to(fn_av[:, None], my_sub.shape)
                    if s == WEST:
                        Fs = self.num_flux(fn_tr, my_sub, 1.0, 0.0,
                                           AL=fA, AR=mA)
                    elif s == EAST:
                        Fs = self.num_flux(my_sub, fn_tr, 1.0, 0.0,
                                           AL=mA, AR=fA)
                    elif s == SOUTH:
                        Fs = self.num_flux(fn_tr, my_sub, 0.0, 1.0,
                                           AL=fA, AR=mA)
                    else:
                        Fs = self.num_flux(my_sub, fn_tr, 0.0, 1.0,
                                           AL=mA, AR=fA)
                    LA, LB = self.Lsub[s]
                    cf = (jnp.einsum("qk,cqpj->ckpj", LA, Fs[..., 0::2], precision=PRECISION)
                          + jnp.einsum("qk,cqpj->ckpj", LB, Fs[..., 1::2], precision=PRECISION))
                    contrib = jnp.where(kind[None, None, :, None] == FINE,
                                        cf, contrib)

                scale = dy if s in (WEST, EAST) else dx
                sign = 1.0 if s in (WEST, SOUTH) else -1.0
                if s == WEST:
                    Rl = Rl.at[..., :, 0].add(sign * scale * contrib)
                elif s == EAST:
                    Rl = Rl.at[..., :, -1].add(sign * scale * contrib)
                elif s == SOUTH:
                    Rl = Rl.at[..., 0, :].add(sign * scale * contrib)
                else:
                    Rl = Rl.at[..., -1, :].add(sign * scale * contrib)

            Rl = Rl * (self.minv[None, :, None, None, None] / (dx * dy))
            Rl = Rl * tb["active"][None, None, :, None, None]
            R.append(Rl)
        return R

    # ------------------------------------------------------------------
    # per-stage stabilization
    # ------------------------------------------------------------------
    def averages(self, U):
        return basis_apply(self.avg_op[None], U.reshape(
            4, self.K, -1))[:, 0].reshape(4, *U.shape[2:])

    def _tvb_pool(self, pools, tables):
        """TVB limiter per pool with halo cell averages gathered across tile
        edges (the neighbor tables of src/claw.cc:336-380 at AMR levels;
        coarse halos repeat, fine halos agglomerate as get_cell_average,
        src/claw.h:338-363)."""
        cfg = self.limiter_cfg
        if cfg.type != "TVB":
            return pools
        out = []
        avgs = [self.averages(U) for U in pools]
        edgeavg = []
        for lv in range(self.max_level + 1):
            a = avgs[lv]
            edgeavg.append(dict(W=a[..., :, 0], E=a[..., :, -1],
                                S=a[..., 0, :], N=a[..., -1, :]))
        for lv in range(self.max_level + 1):
            U = pools[lv]
            tb = tables[lv]
            a = avgs[lv]                                  # [4, P, m, m]
            halos = {}
            for s in range(4):
                okey = {WEST: "W", EAST: "E", SOUTH: "S",
                        NORTH: "N"}[_OPP[s]]
                kind = tb["kind"][s]
                sm = edgeavg[lv][okey][:, tb["nbr_same"][s]]
                if lv > 0:
                    co = jnp.repeat(
                        edgeavg[lv - 1][okey][:, tb["nbr_co"][s]], 2, -1)
                else:
                    co = sm
                if lv < self.max_level:
                    fn = _pairmean(edgeavg[lv + 1][okey][:, tb["nbr_fi"][s]])
                else:
                    fn = sm
                mykey = {WEST: "W", EAST: "E", SOUTH: "S", NORTH: "N"}[s]
                my = edgeavg[lv][mykey]
                kb = kind[None, :, None]
                h = jnp.where(kb == SAME, sm,
                              jnp.where(kb == COARSE, co,
                                        jnp.where(kb == FINE, fn, my)))
                halos[s] = h                               # [4, P, m]
            out.append(self._tvb_patch(U, a, halos, lv))
        return out

    def _tvb_patch(self, U, ubar, halos, lv):
        """Whole-pool TVB minmod update (apply_limiter_TVB_Qk/Pk,
        src/limiter.cc:224-516) with halo neighbor averages."""
        cfg = self.limiter_cfg
        b = self.basis
        h = float(np.sqrt((self.dx[lv]**2 + self.dy[lv]**2) / 2.0))
        Mdx2 = cfg.M * h * h
        modal = b.family == "Pk"
        sqrt3 = float(np.sqrt(3.0))
        if modal:
            ix_x, ix_y = 1, b.degree + 1
            beta_eff = 0.5 * cfg.beta
            Dx = sqrt3 * U[:, ix_x]
            Dy = sqrt3 * U[:, ix_y]
        else:
            beta_eff = cfg.beta
            gx_op = jnp.asarray(b.wq2 @ b.Gx, self.dtype)
            gy_op = jnp.asarray(b.wq2 @ b.Gy, self.dtype)
            Dx = (h / self.dx[lv]) * basis_apply(gx_op[None], U.reshape(
                4, self.K, -1))[:, 0].reshape(ubar.shape)
            Dy = (h / self.dy[lv]) * basis_apply(gy_op[None], U.reshape(
                4, self.K, -1))[:, 0].reshape(ubar.shape)

        nW = jnp.concatenate([halos[WEST][..., None], ubar[..., :-1]], -1)
        nE = jnp.concatenate([ubar[..., 1:], halos[EAST][..., None]], -1)
        nS = jnp.concatenate([halos[SOUTH][..., None, :], ubar[..., :-1, :]],
                             -2)
        nN = jnp.concatenate([ubar[..., 1:, :], halos[NORTH][..., None, :]],
                             -2)
        dbx, dfx = ubar - nW, nE - ubar
        dby, dfy = ubar - nS, nN - ubar

        if cfg.char_lim:
            Rx, Lx, Ry, Ly = euler.eigen_matrices(ubar)
            cDx = euler.to_characteristic(Lx, Dx)
            cDy = euler.to_characteristic(Ly, Dy)
            cdbx = euler.to_characteristic(Lx, dbx)
            cdfx = euler.to_characteristic(Lx, dfx)
            cdby = euler.to_characteristic(Ly, dby)
            cdfy = euler.to_characteristic(Ly, dfy)
        else:
            cDx, cDy, cdbx, cdfx, cdby, cdfy = Dx, Dy, dbx, dfx, dby, dfy

        Dxn = minmod(cDx, beta_eff * cdbx, beta_eff * cdfx, Mdx2)
        Dyn = minmod(cDy, beta_eff * cdby, beta_eff * cdfy, Mdx2)
        change = (jnp.mean(jnp.abs(Dxn - cDx), axis=0)
                  + jnp.mean(jnp.abs(Dyn - cDy), axis=0))
        if cfg.char_lim:
            Dxn = euler.to_conserved(Rx, Dxn)
            Dyn = euler.to_conserved(Ry, Dyn)

        if modal:
            keep = np.zeros(b.K)
            keep[0] = 1.0
            keep = jnp.asarray(keep, self.dtype)[None, :, None, None, None]
            ex = jnp.asarray(np.eye(b.K)[ix_x],
                             self.dtype)[None, :, None, None, None]
            ey = jnp.asarray(np.eye(b.K)[ix_y],
                             self.dtype)[None, :, None, None, None]
            u_lim = (ubar[:, None] * keep + (Dxn / sqrt3)[:, None] * ex
                     + (Dyn / sqrt3)[:, None] * ey)
        else:
            drx = jnp.asarray((b.nodes[:, 0] - 0.5) * self.dx[lv],
                              self.dtype)[None, :, None, None, None]
            dry = jnp.asarray((b.nodes[:, 1] - 0.5) * self.dy[lv],
                              self.dtype)[None, :, None, None, None]
            u_lim = (ubar[:, None] + drx * (Dxn / h)[:, None]
                     + dry * (Dyn / h)[:, None])
        active = change > 1.0e-10
        return jnp.where(active[None, None], u_lim, U)

    def post_stage(self, pools, tables, t=0.0):
        pools = self._tvb_pool(pools, tables)
        if self._positivity is not None:
            pools = [self._positivity(U, self.averages(U)) for U in pools]
        # keep inactive slots at the benign state
        pools = [jnp.where(tb["active"][None, None, :, None, None], U,
                           self._u_solid[:, None, None, None, None])
                 for U, tb in zip(pools, tables)]
        return pools

    # ------------------------------------------------------------------
    # time stepping
    # ------------------------------------------------------------------
    def _make_step(self):
        from dflo_tpu.solver import rk as rk_mod

        def step(pools, tables, t, t_end):
            dts = []
            for lv in range(self.max_level + 1):
                ub = self.averages(pools[lv])
                c = euler.sound_speed(ub)
                vx = jnp.abs(ub[euler.MX] / ub[euler.RHO])
                vy = jnp.abs(ub[euler.MY] / ub[euler.RHO])
                hh = float(np.sqrt((self.dx[lv]**2 + self.dy[lv]**2) / 2.0))
                eig = (c + vx) / hh + (c + vy) / hh
                dtc = self.cfl / eig / (2.0 * self.basis.degree + 1.0)
                dtc = jnp.where(
                    tables[lv]["active"][:, None, None], dtc, jnp.inf)
                dts.append(jnp.min(dtc))
            dt = jnp.minimum(jnp.min(jnp.stack(dts)), t_end - t)

            old = pools
            cur = pools
            for a, ctime in zip(self.ark, self.stage_times):
                R = self.rhs_all(cur, tables, t + ctime * dt)
                cur = [a * o + (1.0 - a) * (u + dt * r)
                       for o, u, r in zip(old, cur, R)]
                cur = self.post_stage(cur, tables, t + ctime * dt)
            bad = jnp.zeros((), bool)
            for lv in range(self.max_level + 1):
                ub = self.averages(cur[lv])
                neg = jnp.minimum(ub[euler.RHO], euler.pressure(ub)) < 1e-13
                neg = neg & tables[lv]["active"][:, None, None]
                bad = bad | jnp.any(neg)
            return cur, dt, bad

        return step

    # ------------------------------------------------------------------
    # adaptation event (host)
    # ------------------------------------------------------------------
    def _tile_scores(self, pools):
        """max log(1+|grad rho|) per tile at its current level
        (compute_refinement_indicators, src/equation.h:1085-1116).

        Also counts the CELLS whose indicator exceeds the threshold — what
        the reference's per-cell flagging (src/refine.cc:48-60) would
        refine — so the T x T tile granularity overhead is measurable
        (VERDICT r2 item 9).  Returns (scores[nty, ntx], n_cells_flagged)."""
        from dflo_tpu.ops.contract import basis_apply1
        b = self.basis
        Gx, Gy = b.grad_at(np.array([[0.5, 0.5]]))
        Gx = jnp.asarray(Gx, self.dtype)
        Gy = jnp.asarray(Gy, self.dtype)
        scores = np.zeros((self.nty, self.ntx))
        n_flagged = 0
        for lv in range(self.max_level + 1):
            rho = pools[lv][euler.RHO]                      # [K, P, m, m]
            dxr = basis_apply1(Gx, rho)[0] / self.dx[lv]
            dyr = basis_apply1(Gy, rho)[0] / self.dy[lv]
            ind = np.asarray(jnp.log1p(jnp.sqrt(dxr**2 + dyr**2)))
            sc = ind.max(axis=(1, 2))
            over = ind > self.amr.shock_value               # [P, m, m]
            for i, (ty, tx) in enumerate(self.topo.slots[lv]):
                if self.topo.fluid[ty, tx] and self.topo.Lmap[ty, tx] == lv:
                    scores[ty, tx] = sc[i]
                    if lv < self.max_level:
                        n_flagged += int(over[i].sum())
        return scores, n_flagged

    def adapt(self, pools, force_pins: bool = False):
        """Re-level tiles by the indicator and transfer the solution.
        Returns (new_pools, changed)."""
        amr = self.amr
        topo = self.topo
        scores, n_cells_flagged = self._tile_scores(pools)
        L = topo.Lmap
        up = (scores > amr.shock_value) & (L < self.max_level)
        down = scores < amr.coarsen_factor * amr.shock_value
        newL = np.where(up, L + 1, np.where(down, np.maximum(L - 1, 0), L))
        # pinned tiles (forward-step corner prerefine, src/refine.cc:110-133)
        for (px, py) in self.pins:
            tx = int((px - self.mesh.x0) / (self.T * self.mesh.dx))
            ty = int((py - self.mesh.y0) / (self.T * self.mesh.dy))
            for dy in (-1, 0):
                for dx in (-1, 0):
                    yy, xx = ty + dy, tx + dx
                    if 0 <= yy < self.nty and 0 <= xx < self.ntx \
                            and topo.fluid[yy, xx]:
                        newL[yy, xx] = self.max_level
        # one level per event (refine_grid flags one level at a time,
        # src/refine.cc:48-60); pins reach max over successive events
        newL = np.clip(newL, L - 1, L + 1)
        newL = topo.balance(newL)
        # capacity: keep the highest-score tiles per level
        for lv in range(self.max_level, 0, -1):
            sel = np.argwhere(newL == lv)
            cap = topo.capacities[lv - 1]
            if len(sel) > cap:
                sc = scores[sel[:, 0], sel[:, 1]]
                drop = sel[np.argsort(sc)[:len(sel) - cap]]
                newL[drop[:, 0], drop[:, 1]] = lv - 1
                newL = topo.balance(newL)
        # tile-granularity accounting (VERDICT r2 item 9): active cells
        # under the T x T scheme vs what exact per-cell flags would
        # activate (each flagged cell -> 4 children, src/refine.cc:48-60)
        n_before = self.n_active_cells()
        self.last_adapt_stats = {
            "cells_active": n_before,
            "cells_flagged": n_cells_flagged,
            "cells_percell_scheme": n_before + 3 * n_cells_flagged,
        }
        changed = bool((newL != topo.Lmap).any())
        if not changed:
            return pools, False

        oldL = topo.Lmap.copy()
        old_smaps = [topo.slot_map(lv) for lv in range(self.max_level + 1)]
        topo.Lmap = newL
        topo._assign_slots()
        self._tables = self._build_tables()

        # solution transfer (src/refine.cc:75-104)
        new_pools = []
        for lv in range(self.max_level + 1):
            P = self._pool_size(lv)
            m = self.m[lv]
            U = jnp.broadcast_to(
                self._u_solid[:, None, None, None, None],
                (4, self.K, P, m, m)).astype(self.dtype)
            cols = {"copy": [], "up": [], "down": []}
            for i, (ty, tx) in enumerate(topo.slots[lv]):
                if lv == 0 and (topo.Lmap[ty, tx] != 0
                                or not topo.fluid[ty, tx]):
                    continue    # placeholder level-0 slot of a refined tile
                was = oldL[ty, tx]
                if was == lv:
                    cols["copy"].append((i, old_smaps[lv][ty, tx]))
                elif was == lv - 1:
                    cols["up"].append((i, old_smaps[lv - 1][ty, tx]))
                elif was == lv + 1:
                    cols["down"].append((i, old_smaps[lv + 1][ty, tx]))
                else:
                    raise AssertionError("level jumped by more than one")
            if cols["copy"]:
                dst, src = map(np.array, zip(*cols["copy"]))
                U = U.at[:, :, dst].set(pools[lv][:, :, src])
            if cols["up"]:
                dst, src = map(np.array, zip(*cols["up"]))
                coarse = pools[lv - 1][:, :, src]          # [4,K,n,m/2,m/2]
                fine = self._patch_prolong(coarse)
                U = U.at[:, :, dst].set(fine)
            if cols["down"]:
                dst, src = map(np.array, zip(*cols["down"]))
                fine = pools[lv + 1][:, :, src]            # [4,K,n,2m,2m]
                U = U.at[:, :, dst].set(self._patch_restrict(fine))
            new_pools.append(U)
        self.last_adapt_stats["cells_active_after"] = self.n_active_cells()
        return new_pools, True

    def _patch_prolong(self, Uc):
        """[4, K, n, m, m] -> [4, K, n, 2m, 2m] exact polynomial subdivision
        (SolutionTransfer interpolation, src/refine.cc:100-104)."""
        from dflo_tpu.amr import prolong_matrices
        P = prolong_matrices(self.basis)
        c, K, n, m, _ = Uc.shape
        out = jnp.zeros((c, K, n, 2 * m, 2 * m), Uc.dtype)
        for bnd in range(2):
            for a in range(2):
                M = jnp.asarray(P[bnd][a], Uc.dtype)
                v = basis_apply(M, Uc.reshape(c, K, -1)).reshape(
                    c, K, n, m, m)
                out = out.at[:, :, :, bnd::2, a::2].set(v)
        return out

    def _patch_restrict(self, Uf):
        from dflo_tpu.amr import restrict_matrices
        R = restrict_matrices(self.basis)
        c, K, n, mm, _ = Uf.shape
        acc = None
        for bnd in range(2):
            for a in range(2):
                M = jnp.asarray(R[bnd][a], Uf.dtype)
                v = basis_apply(M, Uf[:, :, :, bnd::2, a::2].reshape(
                    c, K, -1)).reshape(c, K, n, mm // 2, mm // 2)
                acc = v if acc is None else acc + v
        return acc

    # ------------------------------------------------------------------
    # diagnostics / run loop
    # ------------------------------------------------------------------
    def totals(self, pools):
        """Conserved totals over all active cells (conservation oracle)."""
        tot = jnp.zeros((4,), self.dtype)
        for lv in range(self.max_level + 1):
            ub = self.averages(pools[lv])
            area = self.dx[lv] * self.dy[lv]
            act = self._tables[lv]["active"][None, :, None, None]
            tot = tot + area * jnp.sum(ub * act, axis=(1, 2, 3))
        return tot

    def n_active_cells(self) -> int:
        n = 0
        for lv in range(self.max_level + 1):
            n += len([1 for (ty, tx) in self.topo.slots[lv]
                      if self.topo.fluid[ty, tx]
                      and self.topo.Lmap[ty, tx] == lv]) * self.m[lv]**2
        return n

    def _multi_step(self, chunk: int):
        """Device-side while_loop of up to `chunk` steps between host syncs
        (adaptation events): the tables ride as ARGUMENTS so one compiled
        program serves every topology of the run — no retrace per event."""
        if chunk not in self._multi_cache:
            step = self._make_step()

            def multi(pools, tables, t, t_end):
                zero = jnp.zeros((), t.dtype)

                def body(carry):
                    pools, t, comp, it, _bad = carry
                    p2, dt, bad = step(list(pools), tables, t, t_end)
                    y = dt - comp
                    t2 = t + y
                    comp = (t2 - t) - y
                    return tuple(p2), t2, comp, it + 1, bad

                def cond(carry):
                    _p, t, _c, it, bad = carry
                    return (t < t_end - 1e-12) & (it < chunk) & ~bad

                pools, t, _c, it, bad = jax.lax.while_loop(
                    cond, body, (tuple(pools), t, zero, jnp.asarray(0),
                                 jnp.asarray(False)))
                return pools, t, it, bad

            self._multi_cache[chunk] = jax.jit(multi)
        return self._multi_cache[chunk]

    def run(self, pools, t_end: float, t0: float = 0.0,
            callback: Callable | None = None, max_steps: int = 10**7,
            chunked: bool = True):
        """Time loop with the adaptation cadence (src/claw.cc:1112-1128).

        chunked=True runs the steps BETWEEN adaptation events inside one
        device-side while_loop (one host sync per event instead of per
        step); callbacks then fire at event granularity."""
        t, it = t0, 0
        pools = self.post_stage(pools, self._tables, t0)
        cadence = self.amr.iter_step
        if chunked and cadence:
            multi = self._multi_step(cadence)
            tdev = jnp.asarray(t, self.dtype)
            while t < t_end - 1e-12 and it < max_steps:
                pools, tdev, n, bad = multi(pools, self._tables, tdev,
                                            jnp.asarray(t_end, self.dtype))
                pools = list(pools)
                if bool(bad):
                    raise FloatingPointError(
                        "negative density/pressure cell average "
                        "(src/positivity.cc:26-39)")
                t = float(tdev)
                it += int(n)
                if it % cadence == 0:
                    pools, _ = self.adapt(pools)
                if callback is not None:
                    callback(pools, t, it)
                if int(n) == 0:
                    break   # device loop done at solver precision
            return pools, t, it
        while t < t_end - 1e-12 and it < max_steps:
            pools, dt, bad = self._step(pools, self._tables, t, t_end)
            if bool(bad):
                raise FloatingPointError(
                    "negative density/pressure cell average "
                    "(src/positivity.cc:26-39)")
            t += float(dt)
            it += 1
            if cadence and it % cadence == 0:
                pools, _ = self.adapt(pools)
            if callback is not None:
                callback(pools, t, it)
            if float(dt) <= 0.0:
                # solver-dtype t_end clamp hit exactly 0 (f32(t) ==
                # f32(t_end) half-ulp window): final time reached at solver
                # precision — terminate instead of spinning (see
                # driver.Solver.run)
                break
        return pools, t, it
