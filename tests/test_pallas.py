"""Pallas volume kernel: identical results to the XLA path (interpret mode
on CPU exercises the same kernel code that runs compiled on TPU)."""

import jax.numpy as jnp
import numpy as np

from dflo_tpu import ic
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, make_rhs


def test_pallas_volume_matches_xla():
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(16, 8, -5.0, 5.0, -2.0, 2.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex(5.0, 0.0, 0.0))
    u = jnp.asarray(u, jnp.float32)
    r_x = make_rhs(basis, mesh, bcs, flux="hllc", dtype=jnp.float32)(u, 0.0)
    r_p = make_rhs(basis, mesh, bcs, flux="hllc", dtype=jnp.float32,
                   volume_kernel="pallas")(u, 0.0)
    np.testing.assert_allclose(np.array(r_p), np.array(r_x),
                               rtol=2e-5, atol=2e-5)


def test_fused_residual_matches_xla_all_bc_combos():
    """The fully-fused VMEM residual kernel (volume + trace + Riemann flux
    + lift + mass solve, ops/pallas_kernels.make_fused_residual) equals the
    XLA path to roundoff on periodic, mixed, and all-physical BC layouts
    and across multi-tile grids in both directions (interpret mode runs the
    identical kernel code on CPU)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(256, 16, 0.0, 4.0, 0.0, 1.0)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 8.0 * 7.14471), jnp.full_like(x, -8.0 * 4.125),
         jnp.full_like(x, 8.0),
         jnp.full_like(x, 116.5 / (euler.GAMMA - 1.0)
                       + 0.5 * 8.0 * (7.14471**2 + 4.125**2))])
    per = BoundarySide(euler.BC_PERIODIC)
    cases = {
        "dmr": dict(W=BoundarySide(euler.BC_INFLOW, inflow),
                    E=BoundarySide(euler.BC_OUTFLOW),
                    S=BoundarySide(euler.BC_SLIP),
                    N=BoundarySide(euler.BC_FARFIELD, inflow)),
        "periodic": dict(W=per, E=per, S=per, N=per),
        "pery": dict(S=per, N=per, W=BoundarySide(euler.BC_SLIP),
                     E=BoundarySide(euler.BC_SLIP)),
    }

    def dmr_ic(x, y, t=0.0):
        post = x < (1.0 / 6.0 + y / jnp.sqrt(3.0))
        rho = jnp.where(post, 8.0, 1.4)
        vx = jnp.where(post, 7.14471, 0.0)
        vy = jnp.where(post, -4.125, 0.0)
        p = jnp.where(post, 116.5, 1.0)
        return jnp.stack([rho * vx, rho * vy, rho,
                          p / (euler.GAMMA - 1.0)
                          + 0.5 * rho * (vx**2 + vy**2)])

    u = ic.set_initial_condition(basis, mesh, dmr_ic)
    for name, bcs in cases.items():
        for flx in ("hllc", "lxf"):
            rx = make_rhs(basis, mesh, bcs, flux=flx)(u, 0.1)
            rf = make_rhs(basis, mesh, bcs, flux=flx,
                          volume_kernel="fused")(u, 0.1)
            rel = (float(jnp.abs(rx - rf).max())
                   / float(jnp.abs(rx).max()))
            assert rel < 1e-12, (name, flx, rel)


def test_fused_conservation():
    """One-flux-per-interface-side with identical operands: the fused
    kernel's residual must conserve mass/momentum/energy exactly on a
    periodic box."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(128, 16, -5.0, 5.0, -1.0, 1.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())
    rf = make_rhs(basis, mesh, bcs, flux="hllc", volume_kernel="fused")(u, 0.0)
    w = jnp.asarray(basis.wq2 @ basis.V)
    tot = jnp.einsum("k,ckyx->c", w, rf) * mesh.dx * mesh.dy
    np.testing.assert_allclose(np.array(tot), 0.0, atol=1e-11)
