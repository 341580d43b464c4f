"""DG spatial residual as fused tensor contractions.

TPU-first re-design of the reference's explicit assembly
(src/assemble_explicit.cc:29-452).  The reference runs a MeshWorker loop with
three per-cell/per-face integrand callbacks; here the same three integrals are
whole-domain tensor contractions over the state array ``u[4, K, ny, nx]``
(component, local DoF, cell row, cell column):

- volume term  : einsum of the weighted reference-gradient operators with the
  physical flux at all quadrature points of all cells at once
  (replaces integrate_cell_term_explicit, src/assemble_explicit.cc:29-120)
- interior faces: static-slice the per-cell face traces into left/right
  interface states, evaluate the Riemann flux once per interface, and lift to
  both neighbors (replaces integrate_face_term_explicit,
  src/assemble_explicit.cc:255-427); the scatter-add of the reference becomes
  two shifted dense adds
- boundary faces: ghost states via compute_wminus + the same numerical flux
  (replaces integrate_boundary_term_explicit, src/assemble_explicit.cc:126-248)

Everything is shape-static and branch-free, so the whole residual jits into
one fused XLA computation; under pjit the (ny, nx) axes shard over the device
mesh and the interface slices become halo exchanges over ICI.

The returned function computes du/dt = M^{-1} R(u, t) directly (the diagonal
mass solve of src/claw.cc:694-713 is folded in).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops.contract import (PRECISION, basis_apply, basis_apply1,
                                   basis_reduce)
from dflo_tpu.ops.basis import WEST, EAST, SOUTH, NORTH
from dflo_tpu.physics import euler
from dflo_tpu.physics.fluxes import get_flux

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BoundarySide:
    """BC for one side of a Cartesian domain.

    kind   : euler.BC_* code (src/equation.h:862-869).
    values : callable (x, y, t) -> [4, ...] boundary expression values in the
             conserved layout (pressure BC reads p from the energy slot,
             src/equation.h:992); None for kinds that need no data.
    """

    kind: int
    values: Callable | None = None


@dataclasses.dataclass(frozen=True)
class SegmentedSide:
    """One domain side split into boundary-id segments along its length —
    e.g. double_mach_reflection's bottom: post-shock Dirichlet for x < 1/6,
    slip wall after (examples/double_mach_reflection/grid.geo Physical Lines
    0/1).  `seg_id[i]` picks segments[seg_id[i]] for cell column/row i."""

    seg_id: np.ndarray
    segments: tuple

    @property
    def kind(self) -> int:
        # a segmented side is periodic only if its single segment is
        return (self.segments[0].kind
                if len(self.segments) == 1 else -999)


def _as_segmented(side, n_along: int) -> SegmentedSide:
    if isinstance(side, SegmentedSide):
        if len(side.seg_id) != n_along:
            raise ValueError("seg_id length must equal the side's cell count")
        return side
    return SegmentedSide(np.zeros(n_along, np.int32), (side,))


FREE = BoundarySide(euler.BC_PERIODIC, None)


def _lift(faceVw_f: Array, F: Array) -> Array:
    """Face-quadrature lift: [nq,K] x [4,nq,...] -> [4,K,...]."""
    return basis_apply(faceVw_f.T, F)


def _mirror_x(U):
    """Slip-wall ghost for an x-normal face: reflect normal momentum."""
    return jnp.stack([-U[euler.MX], U[euler.MY], U[euler.RHO], U[euler.ENE]])


def _mirror_y(U):
    return jnp.stack([U[euler.MX], -U[euler.MY], U[euler.RHO], U[euler.ENE]])


def make_rhs(basis: basis_mod.Basis, mesh, bcs: dict[str, BoundarySide],
             flux: str = "lxf", source: Callable | None = None,
             mask: np.ndarray | None = None, dtype=None,
             well_balanced: str | None = None,
             potential: Callable | None = None, polytropic_nu: float = 1.2,
             mass_matrix: str = "diagonal", volume_kernel: str = "xla",
             device_mesh=None):
    """Build du/dt = rhs(u, t) for a Cartesian mesh.

    bcs    : {'W','E','S','N'} -> BoundarySide | SegmentedSide.  Periodic
             sides must come in opposite pairs (W+E or S+N), mirroring the
             pair/direction checks of src_mpi/parameters.cc:524-558.
    source : optional (x, y, t, W) -> [4, Q, ny, nx] body-force term evaluated
             at the volume quadrature points (src/equation.h:829-850 gravity /
             src_mpi/equation.h:1186-1202 external force).
    mask   : optional bool [ny, nx], True = fluid cell.  Solid cells model
             axis-aligned obstacles (forward_step's step) inside the dense
             block: fluid-solid interfaces get slip-wall mirror fluxes and
             solid cells receive zero residual — the TPU-native form of the
             reference's multiblock step.geo domain.
    well_balanced : None | 'isothermal' | 'polytropic' — the src_gll
             gravity schemes that preserve hydrostatic equilibria to machine
             precision: the source is p/E * grad_h(E) with E the nodal
             interpolant of the equilibrium profile (isothermal
             E = exp(-phi/RT), src_gll/assemble_explicit.cc:30-135;
             polytropic src_gll/assemble_explicit.cc:138-230).  Requires a
             nodal-collocated basis (Qk_gll) and `potential` phi(x, y)
             (src_gll/parameters.cc:358).
    mass_matrix : 'diagonal' (lumped, src_gll/claw.cc:233-262) or 'full'
             (consistent, exact per-cell tensor-product inverse replacing the
             PreconditionBlockJacobi solve of src_gll/claw.cc:754-770).
    volume_kernel : 'xla' (default) or 'pallas' — hand-fused VMEM-resident
             volume term (dflo_tpu.ops.pallas_kernels); collocated bases only.
    """
    dtype = dtype or jnp.zeros(0).dtype
    num_flux = get_flux(flux)

    bcs = {"W": _as_segmented(bcs["W"], mesh.ny),
           "E": _as_segmented(bcs["E"], mesh.ny),
           "S": _as_segmented(bcs["S"], mesh.nx),
           "N": _as_segmented(bcs["N"], mesh.nx)}
    per_x = bcs["W"].kind == euler.BC_PERIODIC
    per_y = bcs["S"].kind == euler.BC_PERIODIC
    if per_x != (bcs["E"].kind == euler.BC_PERIODIC):
        raise ValueError("periodic BC must pair W with E")
    if per_y != (bcs["N"].kind == euler.BC_PERIODIC):
        raise ValueError("periodic BC must pair S with N")

    if mask is not None:
        mask = np.asarray(mask, bool)
        if mask.shape != (mesh.ny, mesh.nx):
            raise ValueError(f"mask shape {mask.shape} != (ny, nx)")
        fmask = jnp.asarray(mask, dtype)                 # fluid mask
        # interior-interface wall flags (True where a mirror flux is needed)
        wallx_L = jnp.asarray(~mask[:, :-1] & mask[:, 1:])   # solid|fluid
        wallx_R = jnp.asarray(mask[:, :-1] & ~mask[:, 1:])   # fluid|solid
        wally_L = jnp.asarray(~mask[:-1, :] & mask[1:, :])
        wally_R = jnp.asarray(mask[:-1, :] & ~mask[1:, :])

    dx, dy = mesh.dx, mesh.dy
    area = dx * dy

    # reference-cell operators as device constants
    cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731
    V = cast(basis.V)
    Vw = cast(basis.wq2[:, None] * basis.V)
    GxW = cast(basis.wq2[:, None] * basis.Gx)
    GyW = cast(basis.wq2[:, None] * basis.Gy)
    faceV = [cast(basis.faceV[f]) for f in range(4)]
    faceVw = [cast(basis.wq[:, None] * basis.faceV[f]) for f in range(4)]
    avg_op = cast(basis.wq2 @ basis.V)
    nq = basis.nq
    # stacked trace+average operator [4*nq+1, K] and dual-direction volume
    # lift [K, 2Q] (single-pass contractions; see rhs body)
    trace_stack = jnp.concatenate(
        [faceV[WEST], faceV[EAST], faceV[SOUTH], faceV[NORTH],
         avg_op[None, :]], axis=0)
    lift_stack = jnp.concatenate(
        [mesh.dy * GxW.T, mesh.dx * GyW.T], axis=1)
    minv = cast(1.0 / basis.mass)
    if mass_matrix == "full":
        minv_full = cast(np.linalg.inv(basis.mass_full))
    elif mass_matrix != "diagonal":
        raise ValueError(f"unknown mass matrix option {mass_matrix!r}")
    collocated = basis.is_nodal_collocated and basis.nq == basis.degree + 1
    if volume_kernel == "pallas" and not collocated:
        raise ValueError("volume_kernel='pallas' needs a collocated basis "
                         "(the fully-fused kernel handles modal bases)")
    if volume_kernel == "fused" and (mass_matrix != "diagonal"
                                     or well_balanced == "polytropic"):
        raise ValueError("volume_kernel='fused' covers the diagonal-mass "
                         "hot path (no polytropic well-balanced/full-mass); "
                         "use 'xla' or 'pallas' for those")
    if volume_kernel == "fused" and device_mesh is not None \
            and well_balanced is not None:
        raise ValueError("the sharded fused path does not take a "
                         "well-balanced source (the reference's gravity "
                         "tree is serial-only, src_gll); use "
                         "volume_kernel='xla'")

    if well_balanced is not None:
        if well_balanced not in ("isothermal", "polytropic"):
            raise ValueError(f"unknown well-balanced form {well_balanced!r}")
        if source is not None:
            # defense in depth (the fused kernel already refuses): applying
            # a plain body force AND a potential-form source would
            # double-count gravity — no reference tree consumes both
            # (src/equation.h:829-850 vs src_gll/assemble_explicit.cc:30-135)
            raise ValueError("source and well_balanced are mutually "
                             "exclusive (the force would be applied twice)")
        if not collocated:
            raise ValueError("well-balanced gravity needs a nodal-collocated "
                             "basis (GLL, src_gll/assemble_explicit.cc:66-72)")
        if potential is None:
            raise ValueError("well-balanced gravity needs a potential phi(x,y)")
        QXp, QYp = np.meshgrid(basis.xq, basis.xq, indexing="xy")
        ppts = np.stack([QXp.ravel(), QYp.ravel()], axis=1)
        xphi, yphi = mesh.point_coords(ppts)
        phi = cast(potential(jnp.asarray(xphi, dtype), jnp.asarray(yphi, dtype)))
        Gxn = cast(basis.Gx)          # nodal derivative matrices (V = I)
        Gyn = cast(basis.Gy)

    # boundary face quadrature coordinates (for BC expressions)
    face_xy = {}
    for name, side in (("W", WEST), ("E", EAST), ("S", SOUTH), ("N", NORTH)):
        xb, yb = mesh.face_coords(side, basis.xq)
        face_xy[name] = (cast(xb), cast(yb))

    # volume quadrature coordinates (only materialized when a source needs them)
    if source is not None:
        QX, QY = np.meshgrid(basis.xq, basis.xq, indexing="xy")
        ref_pts = np.stack([QX.ravel(), QY.ravel()], axis=1)
        xq2, yq2 = mesh.point_coords(ref_pts)
        xq2, yq2 = cast(xq2), cast(yq2)

    # outward normals per side
    NORMALS = {"W": (-1.0, 0.0), "E": (1.0, 0.0), "S": (0.0, -1.0), "N": (0.0, 1.0)}

    def boundary_flux(name: str, trace: Array, ubar_b: Array, t) -> Array:
        """Outward numerical flux on one domain side.

        trace  : [4, nq, n_along] inside trace
        ubar_b : [4, n_along] boundary-cell averages
        Returns [4, nq, n_along] flux w.r.t. the OUTWARD normal
        (reference orientation, src/assemble_explicit.cc:195-205).
        Segmented sides evaluate each segment's ghost state and select by
        the per-column boundary id."""
        sseg = bcs[name]
        nx_, ny_ = NORMALS[name]
        xb, yb = face_xy[name]
        ghost = None
        seg_id = jnp.asarray(sseg.seg_id)
        for si, seg in enumerate(sseg.segments):
            if seg.values is not None:
                bvals = jnp.broadcast_to(
                    jnp.asarray(seg.values(xb, yb, t), dtype), trace.shape)
            else:
                bvals = trace
            g = euler.compute_wminus(seg.kind, nx_, ny_, trace, bvals)
            ghost = g if ghost is None else jnp.where(
                seg_id[None, None, :] == si, g, ghost)
        A = jnp.broadcast_to(ubar_b[:, None, :], trace.shape)
        return num_flux(trace, ghost, nx_, ny_, AL=A, AR=A)

    if volume_kernel == "fused" and device_mesh is not None:
        # --------------------------------------------------------------
        # Multi-chip fused path (SURVEY §5.8): the WHOLE residual runs
        # inside one shard_map over the ('dy','dx') device mesh.  Each
        # device calls the single-chip fused VMEM kernel on its local
        # block; the kernel computes the block-periodic residual (its
        # halo BlockSpecs wrap within the block), and the cross-device
        # truth arrives as delta-flux strips whose neighbor face traces
        # are exchanged by ppermute over ICI — the TPU-native
        # `update_ghost_values` (src_mpi/claw.cc:793): O(boundary) bytes
        # per step, zero full-state halos.
        # --------------------------------------------------------------
        if mask is not None:
            raise ValueError("sharded fused kernels do not support masked "
                             "domains; use volume_kernel='xla'")
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from dflo_tpu.ops.pallas_kernels import make_fused_residual
        # the kernel ALWAYS applies edge strips (per_x=per_y=False):
        # under sharding even globally-periodic seams need the correction
        # from block-wrap flux to true neighbor flux — with one device
        # along an axis the ppermute is a self-send and the delta
        # degenerates to exactly zero
        modal_tp = basis.family == "Pk" and source is None
        fused_res = make_fused_residual(basis, mesh, flux, False, False,
                                        dtype, mask=None, source=source,
                                        modal_tp=modal_tp)
        avg_vec = cast(basis.wq2 @ basis.V)
        from dflo_tpu.parallel.sharding import mesh_grid_shape, mesh_y_axes
        # y may be split over several mesh axes — ('slice', 'dy') on a
        # multi-slice pod: the collectives below address the folded axis by
        # the tuple name, so the adjacent-band ppermute between slices is
        # the ONLY cross-DCN transfer (one face-trace row per stage)
        YAX = mesh_y_axes(device_mesh)
        XAX = device_mesh.axis_names[-1]
        DY, DX = mesh_grid_shape(device_mesh)
        ly, lx = mesh.ny // DY, mesh.nx // DX
        if mesh.ny % DY or mesh.nx % DX:
            raise ValueError(f"mesh {mesh.ny}x{mesh.nx} not divisible by "
                             f"device mesh {DY}x{DX}")

        def _bflux_local(name, trace, ubar_b, t, off):
            """boundary_flux on a device-local edge: slice the global face
            coordinates / segment ids at the block offset."""
            sseg = bcs[name]
            nrm_x, nrm_y = NORMALS[name]
            xb_g, yb_g = face_xy[name]
            n_loc = trace.shape[-1]
            xb = jax.lax.dynamic_slice_in_dim(xb_g, off, n_loc, axis=1)
            yb = jax.lax.dynamic_slice_in_dim(yb_g, off, n_loc, axis=1)
            seg_id = jax.lax.dynamic_slice_in_dim(
                jnp.asarray(sseg.seg_id), off, n_loc)
            ghost = None
            for si, seg in enumerate(sseg.segments):
                if seg.values is not None:
                    bvals = jnp.broadcast_to(
                        jnp.asarray(seg.values(xb, yb, t), dtype), trace.shape)
                else:
                    bvals = trace
                g = euler.compute_wminus(seg.kind, nrm_x, nrm_y, trace, bvals)
                ghost = g if ghost is None else jnp.where(
                    seg_id[None, None, :] == si, g, ghost)
            A = jnp.broadcast_to(ubar_b[:, None, :], trace.shape)
            return num_flux(trace, ghost, nrm_x, nrm_y, AL=A, AR=A)

        def _local_strips(u_loc, t, deg_loc=None):
            """Per-device delta-flux strips: true edge flux minus the
            block-wrap flux the kernel will use, neighbor traces via
            ppermute.  deg_loc (one-pass MOOD candidate): tp the edge DoF
            lines BEFORE tracing/permuting, so both this device's strips
            and its neighbors' received traces see the same u_t the
            kernel computes in VMEM."""
            iy = jax.lax.axis_index(YAX)
            ix = jax.lax.axis_index(XAX)
            tp = fused_res.tp_line if deg_loc is not None else None
            # ---- x edges -------------------------------------------------
            c0, cl = u_loc[:, :, :, 0], u_loc[:, :, :, -1]
            if tp is not None:
                c0 = tp(c0, deg_loc[:, 0])
                cl = tp(cl, deg_loc[:, -1])
            uW0 = jnp.einsum("qk,cky->cqy", faceV[WEST], c0,
                             precision=PRECISION)
            uEl = jnp.einsum("qk,cky->cqy", faceV[EAST], cl,
                             precision=PRECISION)
            ub0 = jnp.einsum("k,cky->cy", avg_vec, c0, precision=PRECISION)
            ubl = jnp.einsum("k,cky->cy", avg_vec, cl, precision=PRECISION)
            A0 = jnp.broadcast_to(ub0[:, None], uW0.shape)
            Al = jnp.broadcast_to(ubl[:, None], uEl.shape)
            Fwrap_x = num_flux(uEl, uW0, 1.0, 0.0, AL=Al, AR=A0)
            east = [(i, (i + 1) % DX) for i in range(DX)]
            west = [(i, (i - 1) % DX) for i in range(DX)]
            # my west neighbor's east-face trace / avg, and vice versa
            uEl_W = jax.lax.ppermute(uEl, XAX, east)
            ubl_W = jax.lax.ppermute(ubl, XAX, east)
            uW0_E = jax.lax.ppermute(uW0, XAX, west)
            ub0_E = jax.lax.ppermute(ub0, XAX, west)
            FsW = num_flux(uEl_W, uW0, 1.0, 0.0,
                           AL=jnp.broadcast_to(ubl_W[:, None], uW0.shape),
                           AR=A0)
            FsE = num_flux(uEl, uW0_E, 1.0, 0.0, AL=Al,
                           AR=jnp.broadcast_to(ub0_E[:, None], uEl.shape))
            if per_x:
                FtW, FtE = FsW, FsE
            else:
                off_y = iy * ly
                FbW = -_bflux_local("W", uW0, ub0, t, off_y)
                FbE = _bflux_local("E", uEl, ubl, t, off_y)
                FtW = jnp.where(ix == 0, FbW, FsW)
                FtE = jnp.where(ix == DX - 1, FbE, FsE)
            dfw = FtW - Fwrap_x
            dfe = FtE - Fwrap_x
            # ---- y edges -------------------------------------------------
            r0, rl = u_loc[:, :, 0], u_loc[:, :, -1]
            if tp is not None:
                r0 = tp(r0, deg_loc[0])
                rl = tp(rl, deg_loc[-1])
            uS0 = jnp.einsum("qk,ckx->cqx", faceV[SOUTH], r0,
                             precision=PRECISION)
            uNl = jnp.einsum("qk,ckx->cqx", faceV[NORTH], rl,
                             precision=PRECISION)
            vb0 = jnp.einsum("k,ckx->cx", avg_vec, r0, precision=PRECISION)
            vbl = jnp.einsum("k,ckx->cx", avg_vec, rl, precision=PRECISION)
            B0 = jnp.broadcast_to(vb0[:, None], uS0.shape)
            Bl = jnp.broadcast_to(vbl[:, None], uNl.shape)
            Fwrap_y = num_flux(uNl, uS0, 0.0, 1.0, AL=Bl, AR=B0)
            north = [(i, (i + 1) % DY) for i in range(DY)]
            south = [(i, (i - 1) % DY) for i in range(DY)]
            uNl_S = jax.lax.ppermute(uNl, YAX, north)
            vbl_S = jax.lax.ppermute(vbl, YAX, north)
            uS0_N = jax.lax.ppermute(uS0, YAX, south)
            vb0_N = jax.lax.ppermute(vb0, YAX, south)
            FsS = num_flux(uNl_S, uS0, 0.0, 1.0,
                           AL=jnp.broadcast_to(vbl_S[:, None], uS0.shape),
                           AR=B0)
            FsN = num_flux(uNl, uS0_N, 0.0, 1.0, AL=Bl,
                           AR=jnp.broadcast_to(vb0_N[:, None], uNl.shape))
            if per_y:
                FtS, FtN = FsS, FsN
            else:
                off_x = ix * lx
                FbS = -_bflux_local("S", uS0, vb0, t, off_x)
                FbN = _bflux_local("N", uNl, vbl, t, off_x)
                FtS = jnp.where(iy == 0, FbS, FsS)
                FtN = jnp.where(iy == DY - 1, FbN, FsN)
            dfs = FtS - Fwrap_y
            dfn = FtN - Fwrap_y
            return dfw, dfe, dfs, dfn

        spec_u = P(None, None, YAX, XAX)

        if source is not None:
            # device-local quadrature-coordinate slices for the in-kernel
            # body force (the builder's planes are global-shaped)
            QXs, QYs = np.meshgrid(basis.xq, basis.xq, indexing="xy")
            _ref_pts = np.stack([QXs.ravel(), QYs.ravel()], axis=1)
            _xq_g, _yq_g = mesh.point_coords(_ref_pts)
            xq_g, yq_g = cast(_xq_g), cast(_yq_g)       # [Q, ny, nx]
            Qn = xq_g.shape[0]

            def _local_xy():
                iy = jax.lax.axis_index(YAX)
                ix = jax.lax.axis_index(XAX)
                zero = jnp.zeros((), iy.dtype)
                xq_l = jax.lax.dynamic_slice(
                    xq_g, (zero, iy * ly, ix * lx), (Qn, ly, lx))
                yq_l = jax.lax.dynamic_slice(
                    yq_g, (zero, iy * ly, ix * lx), (Qn, ly, lx))
                return xq_l, yq_l
        else:
            _local_xy = lambda: (None, None)  # noqa: E731

        def _local_rhs(u_loc, t):
            xq_l, yq_l = _local_xy()
            return fused_res(u_loc, *_local_strips(u_loc, t),
                             t=jnp.asarray(t, dtype), xq=xq_l, yq=yq_l)

        def _local_stage(u_loc, uo_loc, t, a, dt):
            xq_l, yq_l = _local_xy()
            return fused_res(u_loc, *_local_strips(u_loc, t),
                             u_old=uo_loc, a=a, dt=dt,
                             t=jnp.asarray(t, dtype), xq=xq_l, yq=yq_l)

        rhs_sharded = shard_map(_local_rhs, mesh=device_mesh,
                                in_specs=(spec_u, P()), out_specs=spec_u,
                                check_vma=False)
        stage_sharded = shard_map(_local_stage, mesh=device_mesh,
                                  in_specs=(spec_u, spec_u, P(), P(), P()),
                                  out_specs=spec_u, check_vma=False)

        def rhs_fused(u: Array, t) -> Array:
            """du/dt: shard_map'd fused VMEM kernel + ppermute halos."""
            return rhs_sharded(u, jnp.asarray(t, dtype))

        def stage_fused(u: Array, u_old: Array, t, a, dt) -> Array:
            return stage_sharded(u, u_old, jnp.asarray(t, dtype),
                                 jnp.asarray(a, dtype),
                                 jnp.asarray(dt, dtype))

        rhs_fused.stage = stage_fused

        if modal_tp:
            def _local_cand(u_loc, deg_loc, t, dt):
                return fused_res(u_loc, *_local_strips(u_loc, t, deg_loc),
                                 deg=deg_loc, dt=dt,
                                 t=jnp.asarray(t, dtype))

            cand_sharded = shard_map(
                _local_cand, mesh=device_mesh,
                in_specs=(spec_u, P(YAX, XAX), P(), P()),
                out_specs=spec_u, check_vma=False)

            def mood_candidate(u: Array, t, dt, deg) -> Array:
                """Sharded one-VMEM-pass MOOD candidate u_t + dt*R(u_t):
                per-device fused kernel with in-kernel {truncation ->
                positivity}, cross-device edge traces tp'd locally then
                ppermuted (the neighbor receives u_t's trace, exactly what
                the reference's ghost exchange would carry after its
                re-update, src/claw.cc:806-852)."""
                return cand_sharded(u, deg, jnp.asarray(t, dtype),
                                    jnp.asarray(dt, dtype))

            rhs_fused.mood_candidate = mood_candidate
        return rhs_fused

    if volume_kernel == "fused":
        from dflo_tpu.ops.pallas_kernels import make_fused_residual
        # modal Pk builders additionally carry the in-kernel {truncation ->
        # positivity} constants so the MOOD cascade's candidate is ONE
        # VMEM pass (mood_candidate below); plain rhs/stage calls on the
        # same builder are unaffected
        modal_tp = (basis.family == "Pk" and source is None
                    and well_balanced is None)
        fused_res = make_fused_residual(basis, mesh, flux, per_x, per_y,
                                        dtype, mask=mask, source=source,
                                        well_balanced=well_balanced,
                                        potential=potential,
                                        modal_tp=modal_tp)
        # ragged ny: the kernel carries internal solid pad rows, so its
        # wrap flux at BOTH true y edges is the slip-wall mirror flux and
        # the delta strips must correct it — even for globally periodic y
        pad_y = fused_res.pad_y
        avg_vec = cast(basis.wq2 @ basis.V)     # [K] mean weights
        if mask is not None:
            # wrap-interface wall masks: the kernel applies slip-mirror
            # operands at its periodic-wrapped edge fluxes, so the strip
            # corrections must subtract the SAME wrap flux
            mxl = jnp.asarray(mask[:, -1]); mxr = jnp.asarray(mask[:, 0])
            myl = jnp.asarray(mask[-1, :]); myr = jnp.asarray(mask[0, :])

        def _wallfix(FL, FR, AL, AR, mL, mR, mirror):
            wL = ((~mL) & mR)[None, None]
            wR = (mL & (~mR))[None, None]
            return (jnp.where(wL, mirror(FR), FL),
                    jnp.where(wR, mirror(FL), FR),
                    jnp.where(wL, mirror(AR), AL),
                    jnp.where(wR, mirror(AL), AR))

        def _strips(u: Array, t, deg=None):
            """O(boundary)-cost delta-flux strips for non-periodic sides.

            deg (one-pass MOOD candidate): the per-cell degree map; the
            edge DoF lines are {truncated -> positivity-limited} FIRST so
            the strips see the same u_t the kernel traces in VMEM."""
            tp = fused_res.tp_line if deg is not None else None
            ny_, nx_ = u.shape[-2:]
            if per_x:
                dfw = dfe = jnp.zeros((4, nq, ny_), u.dtype)
            else:
                c0, cl = u[:, :, :, 0], u[:, :, :, -1]
                if tp is not None:
                    c0 = tp(c0, deg[:, 0])
                    cl = tp(cl, deg[:, -1])
                uW0 = jnp.einsum("qk,cky->cqy", faceV[WEST], c0, precision=PRECISION)
                uEl = jnp.einsum("qk,cky->cqy", faceV[EAST], cl, precision=PRECISION)
                ub0 = jnp.einsum("k,cky->cy", avg_vec, c0, precision=PRECISION)
                ubl = jnp.einsum("k,cky->cy", avg_vec, cl, precision=PRECISION)
                A0 = jnp.broadcast_to(ub0[:, None], uW0.shape)
                Al = jnp.broadcast_to(ubl[:, None], uEl.shape)
                FL, FR, AL_, AR_ = uEl, uW0, Al, A0
                if mask is not None:
                    FL, FR, AL_, AR_ = _wallfix(FL, FR, AL_, AR_,
                                                mxl, mxr, _mirror_x)
                Fwrap = num_flux(FL, FR, 1.0, 0.0, AL=AL_, AR=AR_)
                dfw = -boundary_flux("W", uW0, ub0, t) - Fwrap
                dfe = boundary_flux("E", uEl, ubl, t) - Fwrap
            if per_y and not pad_y:
                dfs = dfn = jnp.zeros((4, nq, nx_), u.dtype)
            else:
                r0, rl = u[:, :, 0], u[:, :, -1]
                if tp is not None:
                    r0 = tp(r0, deg[0])
                    rl = tp(rl, deg[-1])
                uS0 = jnp.einsum("qk,ckx->cqx", faceV[SOUTH], r0, precision=PRECISION)
                uNl = jnp.einsum("qk,ckx->cqx", faceV[NORTH], rl, precision=PRECISION)
                ub0 = jnp.einsum("k,ckx->cx", avg_vec, r0, precision=PRECISION)
                ubl = jnp.einsum("k,ckx->cx", avg_vec, rl, precision=PRECISION)
                A0 = jnp.broadcast_to(ub0[:, None], uS0.shape)
                Al = jnp.broadcast_to(ubl[:, None], uNl.shape)
                if pad_y:
                    # kernel-side wrap = slip-wall mirror against the solid
                    # pad rows, independently at each true edge
                    Fwrap_s = num_flux(_mirror_y(uS0), uS0, 0.0, 1.0,
                                       AL=_mirror_y(A0), AR=A0)
                    Fwrap_n = num_flux(uNl, _mirror_y(uNl), 0.0, 1.0,
                                       AL=Al, AR=_mirror_y(Al))
                else:
                    FL, FR, AL_, AR_ = uNl, uS0, Al, A0
                    if mask is not None:
                        FL, FR, AL_, AR_ = _wallfix(FL, FR, AL_, AR_,
                                                    myl, myr, _mirror_y)
                    Fwrap_s = Fwrap_n = num_flux(FL, FR, 0.0, 1.0,
                                                 AL=AL_, AR=AR_)
                if per_y:
                    # true periodic wrap flux between the true edge rows
                    FL, FR, AL_, AR_ = uNl, uS0, Al, A0
                    if mask is not None:
                        FL, FR, AL_, AR_ = _wallfix(FL, FR, AL_, AR_,
                                                    myl, myr, _mirror_y)
                    Ftrue = num_flux(FL, FR, 0.0, 1.0, AL=AL_, AR=AR_)
                    dfs = Ftrue - Fwrap_s
                    dfn = Ftrue - Fwrap_n
                else:
                    dfs = -boundary_flux("S", uS0, ub0, t) - Fwrap_s
                    dfn = boundary_flux("N", uNl, ubl, t) - Fwrap_n
            return dfw, dfe, dfs, dfn

        def rhs_fused(u: Array, t) -> Array:
            """du/dt via the single fused VMEM kernel."""
            return fused_res(u, *_strips(u, t), t=jnp.asarray(t, u.dtype))

        def stage_fused(u: Array, u_old: Array, t, a, dt) -> Array:
            """Full SSP stage a*u_old + (1-a)*(u + dt*du/dt) in one kernel
            pass (the blend axpy of src/claw.cc:757-760 costs no extra HBM
            round trip)."""
            return fused_res(u, *_strips(u, t), u_old=u_old, a=a, dt=dt,
                             t=jnp.asarray(t, u.dtype))

        rhs_fused.stage = stage_fused

        if modal_tp:
            def mood_candidate(u: Array, t, dt, deg) -> Array:
                """One-VMEM-pass forward-Euler MOOD candidate
                u_t + dt*R(u_t), u_t = {Pk truncation -> positivity}(u)
                applied in-kernel — the cascade's hot op
                (src/claw.cc:806-852's re-update + src/mood.cc:174-191's
                truncation) with no materialized u_t and no separate
                blend pass."""
                return fused_res(u, *_strips(u, t, deg), deg=deg, dt=dt,
                                 t=jnp.asarray(t, u.dtype))

            rhs_fused.mood_candidate = mood_candidate

            if hasattr(fused_res, "sparse"):
                def sparse_candidate(u: Array, u_prev: Array, deg, t, dt,
                                     iy, ix, cnt) -> Array:
                    """Sparse MOOD re-update (src/claw.cc:806-852): the
                    one-pass candidate recomputed ONLY on the first cnt of
                    the listed 8x128 tiles (dynamic pallas grid);
                    everywhere else the returned array keeps u_prev's
                    accepted values.  Boundary delta strips are
                    O(boundary) XLA on the CURRENT degree map, so edge
                    tiles in the list see the right BC fluxes."""
                    dfw, dfe, dfs, dfn = _strips(u, t, deg)
                    return fused_res.sparse(u, u_prev, deg, iy, ix, cnt,
                                            dfw, dfe, dfs, dfn, dt)

                rhs_fused.sparse_candidate = sparse_candidate
        return rhs_fused

    def rhs(u: Array, t) -> Array:
        """du/dt for u[4, K, ny, nx] at time t."""
        # ---- states at volume quadrature points --------------------------
        W = u if collocated else basis_apply(V, u)
        Fx = euler.flux_x(W)
        Fy = euler.flux_y(W)

        # ---- traces + cell averages in ONE contraction -------------------
        # the four face-trace operators and the averaging row are stacked so
        # the state array streams from HBM once instead of five times
        TR = basis_apply(trace_stack, u)     # [4, 4*nq+1, ny, nx]
        uW = TR[:, 0 * nq:1 * nq]
        uE = TR[:, 1 * nq:2 * nq]
        uS = TR[:, 2 * nq:3 * nq]
        uN = TR[:, 3 * nq:4 * nq]
        ub = TR[:, 4 * nq]

        # ---- volume term: + int F . grad(phi) dV -------------------------
        # both direction lifts as one matmul over the stacked flux array
        if volume_kernel == "pallas":
            from dflo_tpu.ops.pallas_kernels import volume_residual
            R = volume_residual(lift_stack, u)
        else:
            R = basis_apply(lift_stack, jnp.concatenate([Fx, Fy], axis=1))

        # ---- source terms ------------------------------------------------
        if source is not None:
            S = source(xq2, yq2, t, W)
            R = R + area * basis_apply(Vw.T, S)
        if well_balanced == "isothermal":
            # src_gll/assemble_explicit.cc:30-135: S_m = (rho RT / E) grad_h E
            # with E = exp(-phi/RT), RT from the cell average
            RT = euler.pressure(ub) / ub[euler.RHO]          # [ny, nx]
            E = jnp.exp(-phi / RT[None])                     # [Q, ny, nx]
            dEx = basis_apply1(Gxn, E) / dx
            dEy = basis_apply1(Gyn, E) / dy
            fac = W[euler.RHO] * RT[None] / E
            Sx = fac * dEx
            Sy = fac * dEy
            SE = (W[euler.MX] * Sx + W[euler.MY] * Sy) / W[euler.RHO]
            S = jnp.stack([Sx, Sy, jnp.zeros_like(Sx), SE])
            R = R + area * basis_apply(Vw.T, S)
        elif well_balanced == "polytropic":
            # src_gll/assemble_explicit.cc:138-230
            nu = polytropic_nu
            pq = euler.pressure(W)
            ff = nu / (nu - 1.0) * pq / W[euler.RHO] + phi   # [Q, ny, nx]
            qstar = jnp.argmax(ff, axis=0)
            beta = jnp.max(ff, axis=0)                       # [ny, nx]
            alpha_q = pq / W[euler.RHO] ** nu
            alpha = jnp.take_along_axis(alpha_q, qstar[None], axis=0)[0]
            E = ((nu - 1.0) * (beta[None] - phi)
                 / (nu * alpha[None])) ** (nu / (nu - 1.0))
            dEx = basis_apply1(Gxn, E) / dx
            dEy = basis_apply1(Gyn, E) / dy
            fac = (nu - 1.0) / nu * W[euler.RHO] * (beta[None] - phi) / E
            Sx = fac * dEx
            Sy = fac * dEy
            SE = (W[euler.MX] * Sx + W[euler.MY] * Sy) / W[euler.RHO]
            S = jnp.stack([Sx, Sy, jnp.zeros_like(Sx), SE])
            R = R + area * basis_apply(Vw.T, S)

        # ---- x-direction interfaces (normal +x), nx+1 slots ---------------
        FL, FR = uE[..., :-1], uW[..., 1:]
        AL = jnp.broadcast_to(ub[:, None, :, :-1], FL.shape)
        AR = jnp.broadcast_to(ub[:, None, :, 1:], FR.shape)
        if mask is not None:
            # slip-wall mirror states at fluid-solid interfaces
            w = wallx_L[None, None]
            FL, AL = (jnp.where(w, _mirror_x(FR), FL),
                      jnp.where(w, _mirror_x(AR), AL))
            w = wallx_R[None, None]
            FR, AR = (jnp.where(w, _mirror_x(uE[..., :-1]), FR),
                      jnp.where(w, _mirror_x(
                          jnp.broadcast_to(ub[:, None, :, :-1], FL.shape)), AR))
        Fi = num_flux(FL, FR, 1.0, 0.0, AL=AL, AR=AR)
        if per_x:
            Aw = jnp.broadcast_to(ub[:, None, :, -1], uE[..., -1].shape)
            Ae = jnp.broadcast_to(ub[:, None, :, 0], uW[..., 0].shape)
            Fwrap = num_flux(uE[..., -1], uW[..., 0], 1.0, 0.0, AL=Aw, AR=Ae)
            Fx_all = jnp.concatenate(
                [Fwrap[..., None], Fi, Fwrap[..., None]], axis=-1)
        else:
            # boundary fluxes are computed with the outward normal and
            # sign-flipped into the +x interface orientation (conservative
            # fluxes satisfy F(a,b,n) = -F(b,a,-n))
            Fw = -boundary_flux("W", uW[..., 0], ub[..., 0], t)
            Fe = boundary_flux("E", uE[..., -1], ub[..., -1], t)
            Fx_all = jnp.concatenate([Fw[..., None], Fi, Fe[..., None]], axis=-1)
        R = R - dy * _lift(faceVw[EAST], Fx_all[..., 1:])
        R = R + dy * _lift(faceVw[WEST], Fx_all[..., :-1])

        # ---- y-direction interfaces (normal +y), ny+1 slots ---------------
        FL, FR = uN[..., :-1, :], uS[..., 1:, :]
        AL = jnp.broadcast_to(ub[:, None, :-1, :], FL.shape)
        AR = jnp.broadcast_to(ub[:, None, 1:, :], FR.shape)
        if mask is not None:
            w = wally_L[None, None]
            FL, AL = (jnp.where(w, _mirror_y(FR), FL),
                      jnp.where(w, _mirror_y(AR), AL))
            w = wally_R[None, None]
            FR, AR = (jnp.where(w, _mirror_y(uN[..., :-1, :]), FR),
                      jnp.where(w, _mirror_y(
                          jnp.broadcast_to(ub[:, None, :-1, :], FL.shape)), AR))
        Fj = num_flux(FL, FR, 0.0, 1.0, AL=AL, AR=AR)
        if per_y:
            As = jnp.broadcast_to(ub[:, None, -1, :], uN[..., -1, :].shape)
            An = jnp.broadcast_to(ub[:, None, 0, :], uS[..., 0, :].shape)
            Fwrap = num_flux(uN[..., -1, :], uS[..., 0, :], 0.0, 1.0, AL=As, AR=An)
            Fy_all = jnp.concatenate(
                [Fwrap[..., None, :], Fj, Fwrap[..., None, :]], axis=-2)
        else:
            Fs = -boundary_flux("S", uS[..., 0, :], ub[..., 0, :], t)
            Fn = boundary_flux("N", uN[..., -1, :], ub[..., -1, :], t)
            Fy_all = jnp.concatenate(
                [Fs[..., None, :], Fj, Fn[..., None, :]], axis=-2)
        R = R - dx * _lift(faceVw[NORTH], Fy_all[..., 1:, :])
        R = R + dx * _lift(faceVw[SOUTH], Fy_all[..., :-1, :])

        # ---- mass solve (src/claw.cc:694-713; full: src_gll/claw.cc:754) --
        if mass_matrix == "full":
            R = basis_apply(minv_full, R) / area
        else:
            R = R * (minv[None, :, None, None] / area)
        if mask is not None:
            R = R * fmask[None, None]       # solid cells are frozen
        return R

    return rhs


def cell_averages(basis: basis_mod.Basis, u: Array) -> Array:
    """Mean conserved state per cell: [4, K, ny, nx] -> [4, ny, nx]
    (src/claw.cc:562-597)."""
    avg_op = jnp.asarray(basis.wq2 @ basis.V, u.dtype)
    return basis_reduce(avg_op, u)
