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
