"""Multi-device equality tests — the TPU analog of the reference's
serial-vs-MPI cross-check (SURVEY.md §4e): the same problem on 1 device and
on an 8-device mesh must agree to roundoff.  Runs on the virtual CPU device
mesh (conftest forces 8 CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dflo_tpu import ic
from dflo_tpu.driver import LimiterConfig, Solver
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.parallel import device_mesh, shard_state
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide


def sod_ic(x, y, t=0.0):
    rho = jnp.where(x <= 0.5, 1.0, 0.125)
    E = jnp.where(x <= 0.5, 2.5, 0.25)
    z = jnp.zeros_like(x)
    return jnp.stack([z, z, rho, E])


def test_device_mesh_factorization():
    m = device_mesh()
    assert m.devices.size == len(jax.devices())
    assert m.axis_names == ("dy", "dx")


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_vortex_1_vs_8_devices(shape):
    """Smooth periodic run: single-device vs sharded results identical."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(32, 32, -5.0, 5.0, -5.0, 5.0)
    per = BoundarySide(euler.BC_PERIODIC)
    bcs = dict(W=per, E=per, S=per, N=per)
    u0 = ic.set_initial_condition(basis, mesh, ic.isentropic_vortex())

    s1 = Solver(basis, mesh, bcs, flux="roe", cfl=0.5)
    u1, t1, _ = s1.run(u0, 0.1)

    dm = device_mesh(shape)
    sN = Solver(basis, mesh, bcs, flux="roe", cfl=0.5, device_mesh=dm)
    uN, tN, _ = sN.run(shard_state(u0, dm), 0.1)
    assert len(uN.sharding.device_set) == 8

    np.testing.assert_allclose(np.array(uN), np.array(u1),
                               rtol=1e-12, atol=1e-12)
    assert t1 == tN


def test_sod_limited_1_vs_8_devices():
    """Shock-limited run (indicator + TVB + positivity all active): the full
    stabilization chain must also be partition-invariant."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(64, 8, 0.0, 1.0, 0.0, 0.125)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", shock_indicator="density", beta=2.0,
                        char_lim=True, pos_lim=True)
    u0 = ic.set_initial_condition(basis, mesh, sod_ic)

    s1 = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.9)
    u1, _, _ = s1.run(u0, 0.1)

    dm = device_mesh((2, 4))
    sN = Solver(basis, mesh, bcs, flux="hllc", limiter=lim, cfl=0.9,
                device_mesh=dm)
    uN, _, _ = sN.run(shard_state(u0, dm), 0.1)

    np.testing.assert_allclose(np.array(uN), np.array(u1),
                               rtol=1e-11, atol=1e-11)
