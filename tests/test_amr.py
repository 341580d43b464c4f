"""AMR tests (src/refine.cc + src/equation.h:1085-1116): exact transfer
operators, conservative restriction, indicator thresholds, adaptive Sod run
matching the exact solution."""

import jax.numpy as jnp
import numpy as np
import pytest

import riemann_exact
from dflo_tpu import ic
from dflo_tpu.amr import (TwoLevelAMR, make_prolong, make_refinement_indicator,
                          make_restrict)
from dflo_tpu.driver import LimiterConfig
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, cell_averages

# integration/e2e tier: minutes of CPU emulation; the quick dev tier
# skips this file (pytest.ini 'heavy'); the full suite runs it
pytestmark = pytest.mark.heavy


@pytest.mark.parametrize("family", ["Qk", "Pk", "Qk_gll"])
def test_prolong_restrict_roundtrip(family):
    """Restriction o prolongation = identity (both are exact on the
    polynomial space); restriction preserves the mean (conservation)."""
    basis = make_basis(family, 2)
    mesh = CartesianMesh(4, 4, 0.0, 1.0, 0.0, 1.0)
    P = make_prolong(basis)
    R = make_restrict(basis)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(4, basis.K, 4, 4)))
    uf = P(u)
    back = R(uf)
    np.testing.assert_allclose(np.array(back), np.array(u), atol=1e-12)
    # conservation: fine means average to the coarse means
    fine_mesh = CartesianMesh(8, 8, 0.0, 1.0, 0.0, 1.0)
    mc = np.array(cell_averages(basis, u))
    mf = np.array(cell_averages(basis, uf))
    agg = 0.25 * (mf[:, ::2, ::2] + mf[:, 1::2, ::2]
                  + mf[:, ::2, 1::2] + mf[:, 1::2, 1::2])
    np.testing.assert_allclose(agg, mc, atol=1e-12)


def test_restriction_conserves_arbitrary_fine_data():
    basis = make_basis("Qk", 1)
    R = make_restrict(basis)
    rng = np.random.default_rng(1)
    uf = jnp.asarray(rng.normal(size=(4, basis.K, 8, 8)))
    uc = R(uf)
    mf = np.array(cell_averages(basis, uf))
    mc = np.array(cell_averages(basis, uc))
    agg = 0.25 * (mf[:, ::2, ::2] + mf[:, 1::2, ::2]
                  + mf[:, ::2, 1::2] + mf[:, 1::2, 1::2])
    np.testing.assert_allclose(mc, agg, atol=1e-12)


def test_refinement_indicator_tracks_gradient():
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(32, 4, 0.0, 1.0, 0.0, 0.125)

    def steep(x, y, t=0.0):
        rho = 1.0 + jnp.tanh(50 * (x - 0.5))
        return jnp.stack([jnp.zeros_like(x), jnp.zeros_like(x), rho,
                          jnp.full_like(x, 3.0)])

    u = ic.set_initial_condition(basis, mesh, steep)
    ind = np.array(make_refinement_indicator(basis, mesh)(u))
    assert ind[:, 14:18].max() > 2.0        # log(1+50) ~ 3.9 at the front
    assert ind[:, :4].max() < 0.1


def test_amr_sod_adapts_and_matches_exact():
    """Sod on a coarse base grid with two-level AMR: the mask follows the
    waves and the composite solution matches the exact profile better than
    the pure-coarse run."""
    basis = make_basis("Qk", 1)
    mesh = CartesianMesh(50, 2, 0.0, 1.0, 0.0, 0.04)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_OUTFLOW),
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))

    def sod(x, y, t=0.0):
        rho = jnp.where(x <= 0.5, 1.0, 0.125)
        E = jnp.where(x <= 0.5, 2.5, 0.25)
        z = jnp.zeros_like(x)
        return jnp.stack([z, z, rho, E])

    lim = LimiterConfig(type="TVB", shock_indicator="limiter", beta=2.0,
                        char_lim=True)
    amr = TwoLevelAMR(basis, mesh, bcs, shock_value=0.8,
                      flux="hllc", limiter=lim, cfl=0.45)
    uc, uf, mask, t, it = amr.run(sod, 0.2, refine_cadence=5)

    assert mask.any() and not mask.all()     # genuinely adaptive
    # the refined band covers the shock (x ~ 0.85 at t=0.2)
    xc = mesh.cell_centers()[0][0]
    shock_col = np.argmin(np.abs(xc - 0.85))
    assert mask[:, shock_col - 2:shock_col + 3].any()

    # composite fine solution vs exact Riemann
    w = amr._composite(uc, uf, jnp.asarray(mask))
    rho = np.array(cell_averages(basis, w))[euler.RHO].mean(axis=0)
    xf = amr.fine_mesh.cell_centers()[0][0]
    rex, _, _ = riemann_exact.sample((xf - 0.5) / t, 1.0, 0.0, 1.0,
                                     0.125, 0.0, 0.1)
    assert np.abs(rho - rex).mean() < 0.02
