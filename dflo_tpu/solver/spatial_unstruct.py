"""DG residual on general unstructured quad meshes (gather/scatter form).

The third spatial backend next to solver.spatial (Cartesian shifts) and
solver.spatial_curvi (structured curvilinear): cells live on ONE flat axis,
``u[4, K, N]``, and neighbor access is an index gather through the
precomputed face tables of mesh.unstructured.UnstructuredQuadMesh — the
TPU-native replacement for the reference's MeshWorker cell/face iteration
over an arbitrary Gmsh triangulation (src/assemble_explicit.cc:432-452,
src/claw.cc:956-967).

Design:
- volume term: identical metric-contravariant contraction as the structured
  curvilinear path, with [Q, N] metric fields;
- interior faces: ALL cell-side traces are evaluated in one stacked
  contraction, the two sides of each face are GATHERED (XLA dynamic-gather,
  one pass), the Riemann flux is computed ONCE per face, and the lifted
  contributions are SCATTER-ADDED back to both cells.  The per-face lift
  matrix (which of the 4 reference-face lift operators applies) is itself a
  gather over a stacked [4, nq, K] operator;
- boundary faces: ghost states via euler.compute_wminus keyed by the
  per-face physical boundary id (the boundary_N config table), then the same
  numerical flux.

Everything is shape-static; the gathers/scatters are the price of full
generality (the structured paths stay shift-based and faster).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.physics import euler
from dflo_tpu.physics.fluxes import get_flux
from dflo_tpu.solver.spatial import BoundarySide


def _stacked_traces(basis, dtype):
    """[4*nq + 1, K]: the four face-trace operators + averaging row."""
    avg_op = basis.wq2 @ basis.V
    return jnp.asarray(np.concatenate([basis.faceV.reshape(-1, basis.K),
                                       avg_op[None, :]], axis=0), dtype)


def make_rhs_unstructured(basis: basis_mod.Basis, mesh,
                          bc_table: dict[int, BoundarySide],
                          flux: str = "lxf",
                          source: Callable | None = None, dtype=None,
                          well_balanced: str | None = None,
                          potential: Callable | None = None):
    """Build du/dt = rhs(u, t) for u[4, K, N].

    bc_table: {physical boundary id: BoundarySide}; faces with untagged or
    unknown ids default to slip walls (the reference's behavior for
    unnumbered boundaries is a config error; we mirror build_bcs' wall
    default for robustness).

    well_balanced='isothermal' + potential phi(x, y): the src_gll
    equilibrium-preserving gravity source S_m = (rho RT / E) grad_h E with
    E = exp(-phi/RT) interpolated nodally (src_gll/assemble_explicit.cc:
    30-135), generalized to q1 mappings by taking the physical nodal
    gradient through the per-cell metric.  Needs a GLL-collocated basis so
    the E interpolant is continuous across faces (shared edge nodes)."""
    dtype = dtype or jnp.zeros(0).dtype
    num_flux = get_flux(flux)
    if not basis.is_nodal_collocated:
        raise ValueError("unstructured blocks need the collocated Qk basis "
                         "(diagonal collocation mass, src/claw.cc:228-258)")

    N = mesh.n_cells
    K, nq = basis.K, basis.nq
    cast = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    # quadrature points must be reversal-symmetric for orientation flips
    assert np.allclose(basis.xq, 1.0 - basis.xq[::-1]), \
        "face quadrature must be symmetric for trace flips"

    # ---- reference operators -------------------------------------------
    GxW = cast(basis.wq2[:, None] * basis.Gx)
    GyW = cast(basis.wq2[:, None] * basis.Gy)
    Vw = cast(basis.wq2[:, None] * basis.V)
    trace_stack = _stacked_traces(basis, dtype)
    # stacked weighted lift operators [4, nq, K] (per-side gather source)
    liftV = cast(basis.wq[None, :, None] * np.asarray(basis.faceV))

    # ---- volume metric --------------------------------------------------
    QX, QY = np.meshgrid(basis.xq, basis.xq, indexing="xy")
    qpts = np.stack([QX.ravel(), QY.ravel()], axis=1)
    x_xi, x_eta, y_xi, y_eta, detJ = mesh.metric(qpts)
    x_xi, x_eta, y_xi, y_eta = (cast(a) for a in (x_xi, x_eta, y_xi, y_eta))
    detJc = cast(detJ)
    minv_field = 1.0 / (cast(basis.wq2)[:, None] * detJc)   # [K, N]
    w2 = cast(basis.wq2)

    # ---- face geometry & tables ----------------------------------------
    snx, sny, slen = mesh.side_geometry()                    # [4, N]
    f = mesh.faces
    fcl, fsl = jnp.asarray(f.cell_l), f.side_l
    fcr, fsr = jnp.asarray(f.cell_r), f.side_r
    flip = jnp.asarray(f.flip_r)[None, None, :]
    # interface normal: L side's outward normal (constant per straight edge)
    nxL = cast(snx[f.side_l, f.cell_l])[None, :]
    nyL = cast(sny[f.side_l, f.cell_l])[None, :]
    lenF = cast(slen[f.side_l, f.cell_l])
    # flat side-gather indices into [.., 4*N] trace arrays
    gl = jnp.asarray(f.side_l * N) + fcl
    gr = jnp.asarray(f.side_r * N) + fcr
    liftL = liftV[jnp.asarray(f.side_l)]                     # [Nf, nq, K]
    liftR = liftV[jnp.asarray(f.side_r)]

    bcell, bside = jnp.asarray(f.bcell), f.bside
    gb = jnp.asarray(f.bside * N) + bcell
    nxB = cast(snx[f.bside, f.bcell])[None, :]
    nyB = cast(sny[f.bside, f.bcell])[None, :]
    lenB = cast(slen[f.bside, f.bcell])
    liftB = liftV[jnp.asarray(f.bside)]
    # boundary quadrature coordinates (s-increasing param of each side)
    xq_all, yq_all = {}, {}
    for s in range(4):
        xq_all[s], yq_all[s] = mesh.side_coords(s, basis.xq)
    xB = cast(np.stack([xq_all[s][:, c]
                        for s, c in zip(f.bside, f.bcell)], axis=1))
    yB = cast(np.stack([yq_all[s][:, c]
                        for s, c in zip(f.bside, f.bcell)], axis=1))
    # segment id per boundary face from the bc table
    wall = BoundarySide(euler.BC_SLIP)
    segs: list[BoundarySide] = []
    seg_of: dict[int, int] = {}
    for bid in sorted(set(int(b) for b in f.bid)):
        side = bc_table.get(bid, wall) if bid >= 0 else wall
        if side.kind == euler.BC_PERIODIC:
            raise ValueError("periodic BCs are not supported on unstructured "
                             "meshes (use the structured paths)")
        segs.append(side)
        seg_of[bid] = len(segs) - 1
    seg_id = jnp.asarray(np.array([seg_of[int(b)] for b in f.bid]))

    if source is not None:
        xq2, yq2 = mesh.point_coords(qpts)
        xq2, yq2 = cast(xq2), cast(yq2)

    if well_balanced is not None:
        if well_balanced != "isothermal":
            raise ValueError("unstructured well-balanced gravity supports "
                             "the isothermal form")
        if potential is None:
            raise ValueError("well-balanced gravity needs a potential")
        import jax.numpy as _jnp
        xph, yph = mesh.point_coords(np.asarray(basis.nodes))
        phi = cast(potential(_jnp.asarray(xph, dtype),
                             _jnp.asarray(yph, dtype)))       # [K, N]
        Gxn = cast(basis.Gx)       # nodal derivative matrices (V = I)
        Gyn = cast(basis.Gy)

    from dflo_tpu.ops.contract import PRECISION, basis_apply

    def averages(u):
        num = jnp.sum((w2[:, None] * detJc)[None] * u, axis=1)
        den = jnp.sum(w2[:, None] * detJc, axis=0)
        return num / den[None]

    def rhs(u, t):
        W = u  # collocated: quadrature values ARE the DoFs
        Fx = euler.flux_x(W)
        Fy = euler.flux_y(W)

        # volume: int F . grad(phi) dV via contravariant metric
        C1 = Fx * y_eta[None] - Fy * x_eta[None]
        C2 = -Fx * y_xi[None] + Fy * x_xi[None]
        R = basis_apply(GxW.T, C1) + basis_apply(GyW.T, C2)

        if source is not None:
            S = source(xq2, yq2, t, W)
            R = R + basis_apply(Vw.T, S * detJc[None])

        if well_balanced == "isothermal":
            # src_gll/assemble_explicit.cc:30-135 generalized to q1 mappings.
            # On curvilinear cells the GLL quadrature is NOT exact for the
            # bilinear metric factors, so the textbook source
            # (rho RT / E) grad I(E) leaves an O(quadrature-error) imbalance.
            # Instead the source is built from the SAME discrete operator the
            # momentum flux uses: P_op(w) = volume contraction + central face
            # lift of the scalar w = RT*I(E) (the equilibrium pressure), and
            # S_m = -(rho/E) * P_op(w).  At equilibrium p = RT*E nodally,
            # rho/E = 1, the Riemann flux at the (continuous, GLL) equal
            # traces reduces to the central pressure flux, and the
            # cancellation is EXACT by construction — machine-eps hydrostatic
            # preservation on arbitrary q1 meshes.
            ubw = averages(u)
            RT = euler.pressure(ubw) / ubw[euler.RHO]          # [N]
            E = jnp.exp(-phi / RT[None])                       # [K, N]
            w = RT[None] * E
            # volume part of the pressure-only momentum operator
            Pm = jnp.stack([
                basis_apply(GxW.T, (w * y_eta)[None])[0]
                + basis_apply(GyW.T, (-w * y_xi)[None])[0],
                basis_apply(GxW.T, (-w * x_eta)[None])[0]
                + basis_apply(GyW.T, (w * x_xi)[None])[0]])    # [2, K, N]
            # central face terms through the same gather/lift tables
            Tw = basis_apply(trace_stack[:4 * nq], w[None])    # [1, 4nq, N]
            Tw4 = jnp.moveaxis(Tw.reshape(1, 4, nq, N), 1, 2).reshape(
                1, nq, 4 * N)[0]
            wL = Tw4[:, gl]
            wRr = Tw4[:, gr]
            wR = jnp.where(flip[0], wRr[::-1, :], wRr)
            what = 0.5 * (wL + wR)                             # [nq, Nf]
            Fw_f = jnp.stack([what * nxL * lenF[None],
                              what * nyL * lenF[None]])        # [2, nq, Nf]
            dL = jnp.einsum("cqf,fqk->ckf", Fw_f, liftL, precision=PRECISION)
            FwR = jnp.where(flip, Fw_f[:, ::-1, :], Fw_f)
            dR = jnp.einsum("cqf,fqk->ckf", FwR, liftR, precision=PRECISION)
            Pm = Pm.at[:, :, fcl].add(-dL)
            Pm = Pm.at[:, :, fcr].add(dR)
            # boundary faces: one-sided w-hat (equals the Riemann pressure
            # flux at equilibrium outflow/slip boundaries)
            wB = Tw4[:, gb]
            FwB = jnp.stack([wB * nxB * lenB[None],
                             wB * nyB * lenB[None]])
            dB = jnp.einsum("cqf,fqk->ckf", FwB, liftB, precision=PRECISION)
            Pm = Pm.at[:, :, bcell].add(-dB)
            # S_m = -(rho/E) . M^{-1} Pm, applied pre-mass-solve (diagonal
            # mass commutes with the nodal scaling)
            fac = W[euler.RHO] / E
            Sx = -fac * Pm[0]
            Sy = -fac * Pm[1]
            SE = (W[euler.MX] * Sx + W[euler.MY] * Sy) / W[euler.RHO]
            R = R + jnp.stack([Sx, Sy, jnp.zeros_like(Sx), SE])

        # all traces + averages in one contraction: [4, 4nq+1, N]
        TR = basis_apply(trace_stack, u)
        ub = TR[:, 4 * nq]
        # side-major layout [4comp, nq, 4side*N] for flat gathers
        T4 = TR[:, :4 * nq].reshape(4, 4, nq, N)
        T4 = jnp.moveaxis(T4, 1, 2).reshape(4, nq, 4 * N)

        # ---- interior faces ---------------------------------------------
        UL = T4[:, :, gl]                                    # [4, nq, Nf]
        URr = T4[:, :, gr]
        UR = jnp.where(flip, URr[:, ::-1, :], URr)
        AL = jnp.broadcast_to(ub[:, None, fcl], UL.shape)
        AR = jnp.broadcast_to(ub[:, None, fcr], UR.shape)
        F = num_flux(UL, UR, nxL, nyL, AL=AL, AR=AR)         # [4, nq, Nf]
        Fw = F * lenF[None, None]
        # lift with the per-face operators and scatter-add to both cells
        dL = jnp.einsum("cqf,fqk->ckf", Fw, liftL, precision=PRECISION)
        FwR = jnp.where(flip, Fw[:, ::-1, :], Fw)
        dR = jnp.einsum("cqf,fqk->ckf", FwR, liftR, precision=PRECISION)
        R = R.at[:, :, fcl].add(-dL)
        R = R.at[:, :, fcr].add(dR)

        # ---- boundary faces ----------------------------------------------
        TB = T4[:, :, gb]                                    # [4, nq, Nb]
        ghost = None
        for si, seg in enumerate(segs):
            if seg.values is not None:
                bvals = jnp.broadcast_to(
                    jnp.asarray(seg.values(xB, yB, t), dtype), TB.shape)
            else:
                bvals = TB
            g = euler.compute_wminus(seg.kind, nxB, nyB, TB, bvals)
            ghost = g if ghost is None else jnp.where(
                seg_id[None, None, :] == si, g, ghost)
        Ab = jnp.broadcast_to(ub[:, None, bcell], TB.shape)
        FB = num_flux(TB, ghost, nxB, nyB, AL=Ab, AR=Ab) * lenB[None, None]
        dB = jnp.einsum("cqf,fqk->ckf", FB, liftB, precision=PRECISION)
        R = R.at[:, :, bcell].add(-dB)

        return R * minv_field[None]

    rhs.cell_averages = averages
    return rhs


def compute_dt_unstructured(ubar, mesh, degree: int, cfl: float,
                            h_field=None):
    """Global CFL dt (compute_time_step_q, src/claw.cc:520-557)."""
    h = jnp.asarray(mesh.cell_h(), ubar.dtype) if h_field is None else h_field
    lam = euler.max_eigenvalue(ubar)
    return jnp.min(cfl * h / lam / (2.0 * degree + 1.0))
