"""Adaptive mesh refinement, static-shape TPU formulation.

The reference's AMR (src/refine.cc:40-133) refines flagged quads with
hanging-node constraints and re-builds all data structures — dynamic topology
that XLA's static shapes cannot express.  The TPU-native re-design here is a
dense TWO-GRID scheme:

- a coarse grid [ny, nx] and a x2 fine grid [2ny, 2nx] with a refine mask;
  every location is ACTIVE on exactly one level;
- time steps run the standard Cartesian solver ON THE FINE GRID over the
  composite state (active fine cells + the exact polynomial prolongation of
  unrefined coarse cells).  Child faces inside a prolonged parent carry equal
  traces, so their numerical fluxes telescope and the L2 restriction of the
  children's residuals IS the parent's DG residual with mortar subface
  fluxes at coarse-fine interfaces (the subface handling of
  src/indicator.cc:132-172 / MeshWorker) — conservation is automatic because
  every interface flux is a single fine-grid flux used by both sides;
- adaptation events run on the host at the reference's cadence: the
  log(1 + |grad rho|) center indicator (compute_refinement_indicators,
  src/equation.h:1085-1116), refine above `shock value`, coarsen below
  0.75x (src/refine.cc:48-60), with exact interpolation up / L2 projection
  down as the SolutionTransfer equivalent (src/refine.cc:75-104).

This trades the reference's compute savings for shape stability (dense fine
compute is cheap on TPU; divergence is expensive); a sparse block-pool
variant is the planned extension.  Two levels cover `shock levels = 1`;
deeper hierarchies stack pairwise.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops import basis as basis_mod
from dflo_tpu.ops import quadrature
from dflo_tpu.ops.contract import basis_apply, basis_apply1
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, SegmentedSide, _as_segmented


# ---------------------------------------------------------------------------
# transfer operators
# ---------------------------------------------------------------------------

def child_ref_pts(pts: np.ndarray, a: int, b: int) -> np.ndarray:
    """Map child-(a,b) reference points into the parent cell."""
    return np.stack([(a + pts[:, 0]) / 2.0, (b + pts[:, 1]) / 2.0], axis=1)


def prolong_matrices(basis: basis_mod.Basis) -> list:
    """P[b][a] with u_child = P @ u_parent: exact polynomial evaluation at
    the child's nodes/projection points (SolutionTransfer interpolation,
    src/refine.cc:100-104)."""
    out = [[None, None], [None, None]]
    if basis.family == "Pk":
        # L2 projection of the parent polynomial onto the child basis
        xq, wq = quadrature.gauss(basis.degree + 1)
        QX, QY = np.meshgrid(xq, xq, indexing="xy")
        pts = np.stack([QX.ravel(), QY.ravel()], axis=1)
        w2 = np.outer(wq, wq).ravel()
        Vc = basis.eval_at(pts)
        Minv = np.linalg.inv(basis.mass_full)
        for b in range(2):
            for a in range(2):
                Vp = basis.eval_at(child_ref_pts(pts, a, b))
                out[b][a] = Minv @ (Vc * w2[:, None]).T @ Vp
    else:
        for b in range(2):
            for a in range(2):
                out[b][a] = basis.eval_at(child_ref_pts(basis.nodes, a, b))
    return out


def restrict_matrices(basis: basis_mod.Basis) -> list:
    """R[b][a] with u_parent = sum_children R @ u_child: the L2 projection
    of the four children onto the parent (conservative: parent mean = mean
    of children)."""
    xq, wq = quadrature.gauss(basis.degree + 1)
    QX, QY = np.meshgrid(xq, xq, indexing="xy")
    pts = np.stack([QX.ravel(), QY.ravel()], axis=1)
    w2 = np.outer(wq, wq).ravel()
    Vc = basis.eval_at(pts)                  # child basis at child points
    Minv = np.linalg.inv(basis.mass_full)
    out = [[None, None], [None, None]]
    for b in range(2):
        for a in range(2):
            Vp = basis.eval_at(child_ref_pts(pts, a, b))
            # (1/4): child area fraction of the parent reference cell
            out[b][a] = Minv @ (0.25 * (Vp * w2[:, None]).T @ Vc)
    return out


def make_prolong(basis: basis_mod.Basis, dtype=None):
    dtype = dtype or jnp.zeros(0).dtype
    P = prolong_matrices(basis)
    P = [[jnp.asarray(P[b][a], dtype) for a in range(2)] for b in range(2)]

    def prolong(uc):
        """[4, K, ny, nx] -> [4, K, 2ny, 2nx]."""
        c, K, ny, nx = uc.shape
        uf = jnp.zeros((c, K, 2 * ny, 2 * nx), uc.dtype)
        for b in range(2):
            for a in range(2):
                uf = uf.at[:, :, b::2, a::2].set(basis_apply(P[b][a], uc))
        return uf

    return prolong


def make_restrict(basis: basis_mod.Basis, dtype=None):
    dtype = dtype or jnp.zeros(0).dtype
    R = restrict_matrices(basis)
    R = [[jnp.asarray(R[b][a], dtype) for a in range(2)] for b in range(2)]

    def restrict(uf):
        """[4, K, 2ny, 2nx] -> [4, K, ny, nx]."""
        acc = None
        for b in range(2):
            for a in range(2):
                term = basis_apply(R[b][a], uf[:, :, b::2, a::2])
                acc = term if acc is None else acc + term
        return acc

    return restrict


# ---------------------------------------------------------------------------
# refinement indicator
# ---------------------------------------------------------------------------

def make_refinement_indicator(basis: basis_mod.Basis, mesh, dtype=None):
    """log(1 + |grad rho|) at cell centers
    (compute_refinement_indicators, src/equation.h:1085-1116)."""
    dtype = dtype or jnp.zeros(0).dtype
    Gx, Gy = basis.grad_at(np.array([[0.5, 0.5]]))
    Gx = jnp.asarray(Gx, dtype)
    Gy = jnp.asarray(Gy, dtype)

    def indicator(u):
        rho = u[euler.RHO]
        dx_ = basis_apply1(Gx, rho)[0] / mesh.dx
        dy_ = basis_apply1(Gy, rho)[0] / mesh.dy
        return jnp.log1p(jnp.sqrt(dx_ * dx_ + dy_ * dy_))

    return indicator


# ---------------------------------------------------------------------------
# two-level adaptive driver
# ---------------------------------------------------------------------------

def _refine_side(side, n_along):
    """Double a side spec for the fine grid (each coarse column -> 2)."""
    seg = _as_segmented(side, n_along)
    return SegmentedSide(np.repeat(seg.seg_id, 2), seg.segments)


class TwoLevelAMR:
    """Adaptive two-grid evolution (refine_grid + run-loop cadence,
    src/refine.cc + src/claw.cc:1112-1128)."""

    def __init__(self, basis, coarse_mesh: CartesianMesh, bcs,
                 shock_value: float = 4.0, coarsen_factor: float = 0.75,
                 **solver_kwargs):
        from dflo_tpu.driver import Solver
        self.basis = basis
        self.coarse_mesh = coarse_mesh
        self.fine_mesh = CartesianMesh(2 * coarse_mesh.nx, 2 * coarse_mesh.ny,
                                       coarse_mesh.x0, coarse_mesh.x1,
                                       coarse_mesh.y0, coarse_mesh.y1)
        fine_bcs = {"W": _refine_side(bcs["W"], coarse_mesh.ny),
                    "E": _refine_side(bcs["E"], coarse_mesh.ny),
                    "S": _refine_side(bcs["S"], coarse_mesh.nx),
                    "N": _refine_side(bcs["N"], coarse_mesh.nx)}
        self.solver = Solver(basis, self.fine_mesh, fine_bcs, **solver_kwargs)
        self.prolong = make_prolong(basis)
        self.restrict = make_restrict(basis)
        self.ind_c = make_refinement_indicator(basis, coarse_mesh)
        self.ind_f = make_refinement_indicator(basis, self.fine_mesh)
        self.shock_value = shock_value
        self.coarsen_factor = coarsen_factor
        self._composite = jax.jit(self._make_composite())

    def _make_composite(self):
        def composite(uc, uf, refine_mask):
            mf = jnp.repeat(jnp.repeat(refine_mask, 2, axis=0), 2, axis=1)
            return jnp.where(mf[None, None], uf, self.prolong(uc))
        return composite

    # -- time stepping ----------------------------------------------------
    def step(self, uc, uf, refine_mask, t, t_end):
        """One time step of the composite state; returns updated (uc, uf)."""
        w = self._composite(uc, uf, jnp.asarray(refine_mask))
        w, dt, bad, _ = self.solver._step(w, t, t_end)
        return self.restrict(w), w, dt, bad

    # -- adaptation event -------------------------------------------------
    def adapt(self, uc, uf, refine_mask):
        """Re-flag cells by the indicator and transfer the solution
        (src/refine.cc:48-60 thresholds)."""
        ind_c = np.asarray(self.ind_c(uc))
        ind_f = np.asarray(self.ind_f(uf))
        # parent-level view of the fine indicator: max over children
        ind_f_parent = ind_f.reshape(ind_f.shape[0] // 2, 2,
                                     ind_f.shape[1] // 2, 2).max(axis=(1, 3))
        old = np.asarray(refine_mask)
        refine = (~old) & (np.abs(ind_c) > self.shock_value)
        keep = old & ~(np.abs(ind_f_parent)
                       < self.coarsen_factor * self.shock_value)
        new_mask = refine | keep
        # transfer: newly refined parents are prolonged into the fine grid;
        # (coarse values for newly coarsened cells already live in uc via the
        # per-step restriction)
        newf = jnp.repeat(jnp.repeat(jnp.asarray(refine), 2, 0), 2, 1)
        uf = jnp.where(newf[None, None], self.prolong(uc), uf)
        return uc, uf, new_mask

    # -- driver -----------------------------------------------------------
    def run(self, fn_ic, t_end: float, refine_cadence: int = 5,
            max_steps: int = 10**6):
        from dflo_tpu import ic as ic_mod
        uc = ic_mod.set_initial_condition(self.basis, self.coarse_mesh, fn_ic)
        uf = ic_mod.set_initial_condition(self.basis, self.fine_mesh, fn_ic)
        mask = np.zeros((self.coarse_mesh.ny, self.coarse_mesh.nx), bool)
        uc, uf, mask = self.adapt(uc, uf, mask)
        t, it = 0.0, 0
        while t < t_end - 1e-12 and it < max_steps:
            uc, uf, dt, bad = self.step(uc, uf, mask, t, t_end)
            if bool(bad):
                raise FloatingPointError("negative state in AMR run")
            t += float(dt)
            it += 1
            if it % refine_cadence == 0:
                uc, uf, mask = self.adapt(uc, uf, mask)
            if float(dt) <= 0.0:
                # solver-dtype t_end clamp hit exactly 0 (f32(t) ==
                # f32(t_end) half-ulp window): final time reached at solver
                # precision — terminate instead of spinning (see
                # driver.Solver.run)
                break
        return uc, uf, mask, t, it
