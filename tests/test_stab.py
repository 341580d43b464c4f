"""Stabilization-chain tests: minmod algebra, KXRCF marking, TVB limiting on
Sod vs the exact Riemann solution, Zhang-Shu positivity on a strong blast
(reference oracles per SURVEY.md §4 / BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import riemann_exact
from dflo_tpu import ic
from dflo_tpu.driver import LimiterConfig, Solver
from dflo_tpu.mesh import CartesianMesh
from dflo_tpu.ops.basis import make_basis
from dflo_tpu.physics import euler
from dflo_tpu.solver.spatial import BoundarySide, cell_averages
from dflo_tpu.stab.limiter import minmod
from dflo_tpu.stab.indicator import make_shock_indicator
from dflo_tpu.stab.positivity import make_positivity_limiter


def test_minmod_values():
    """Hand cases of src/limiter.cc:15-30."""
    a = jnp.array([0.5, 1.0, 1.0, -1.0, 2.0])
    b = jnp.array([9.0, 0.5, -0.5, -2.0, 3.0])
    c = jnp.array([9.0, 0.3, 0.5, -3.0, 1.5])
    Mdx2 = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0])
    out = np.array(minmod(a, b, c, Mdx2))
    np.testing.assert_allclose(out, [0.5, 0.3, 0.0, -1.0, 1.5])


def sod_ic(x, y, t=0.0):
    rho = jnp.where(x <= 0.5, 1.0, 0.125)
    E = jnp.where(x <= 0.5, 2.5, 0.25)
    z = jnp.zeros_like(x)
    return jnp.stack([z, z, rho, E])


def sod_bcs():
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    return dict(W=BoundarySide(euler.BC_INFLOW, inflow),
                E=BoundarySide(euler.BC_OUTFLOW),
                S=BoundarySide(euler.BC_SLIP),
                N=BoundarySide(euler.BC_SLIP))


@pytest.mark.parametrize("family,indicator", [
    ("Pk", "limiter"), ("Qk", "limiter"), ("Qk", "density")])
def test_sod_vs_exact(family, indicator):
    """examples/sod_shock_tube: TVB+characteristic limiting, L1 density error
    vs the exact Riemann solution; monotone profile (no over/undershoot)."""
    basis = make_basis(family, 2)
    mesh = CartesianMesh(100, 4, 0.0, 1.0, 0.0, 0.04)
    lim = LimiterConfig(type="TVB", shock_indicator=indicator, beta=2.0,
                        char_lim=True)
    s = Solver(basis, mesh, sod_bcs(), flux="lxf", limiter=lim, cfl=0.9)
    u = ic.set_initial_condition(basis, mesh, sod_ic)
    u, t, it = s.run(u, 0.2)
    rho = np.array(s.cell_averages(u))[euler.RHO].mean(axis=0)
    xc = mesh.cell_centers()[0][0]
    rex, _, _ = riemann_exact.sample((xc - 0.5) / t, 1.0, 0.0, 1.0,
                                     0.125, 0.0, 0.1)
    assert np.abs(rho - rex).mean() < 0.008
    # mark-all limiting is strictly monotone; KXRCF limits fewer cells and
    # tolerates a sub-percent overshoot
    cap = 1.001 if indicator == "limiter" else 1.005
    assert rho.min() > 0.124 and rho.max() < cap


def test_kxrcf_marks_shock_only():
    """KXRCF on a Sod-like state: discontinuity cells marked, smooth cells not
    (src/indicator.cc:48-198)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(64, 4, 0.0, 1.0, 0.0, 0.0625)

    def moving_jump(x, y, t=0.0):
        rho = jnp.where(x <= 0.5, 1.0, 0.125)
        E = jnp.where(x <= 0.5, 2.5, 0.25) + 0.5 * rho * 0.5**2
        return jnp.stack([rho * 0.5, jnp.zeros_like(x), rho, E])

    u = ic.set_initial_condition(basis, mesh, moving_jump)
    ind = make_shock_indicator(basis, mesh, "density")
    shock, jump = ind(u, cell_averages(basis, u))
    shock = np.array(shock)
    ix = np.argmax(shock[0])
    assert shock[0, ix] > 1.0                     # jump cell marked
    assert (shock[:, :16] <= 1.0).all()           # far-field smooth cells not
    assert (shock[:, -16:] <= 1.0).all()


def test_positivity_limiter_restores_admissibility():
    """A cell whose nodes dip to negative pressure is squeezed toward its
    (admissible) average; admissible cells untouched (src/positivity.cc)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(4, 4, 0.0, 1.0, 0.0, 1.0)
    const = lambda x, y, t=0.0: jnp.stack(  # noqa: E731
        [jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
         jnp.full_like(x, 2.5)])
    u = ic.set_initial_condition(basis, mesh, const)
    # inject a violent energy oscillation in one cell (mean preserved)
    osc = 2.6 * jnp.asarray(np.array([1, -1, 1, -1, 1, -1, 1, -1, 1])
                            * (basis.mass / basis.mass), u.dtype)
    osc = osc - jnp.sum(jnp.asarray(basis.wq2 @ basis.V, u.dtype) * osc)
    u = u.at[euler.ENE, :, 1, 1].add(osc)
    ubar = cell_averages(basis, u)
    lim = make_positivity_limiter(basis, mesh)
    v = lim(u, ubar)
    # untouched elsewhere
    np.testing.assert_allclose(np.array(v[:, :, 0, 0]),
                               np.array(u[:, :, 0, 0]), rtol=0, atol=1e-14)
    # cell averages preserved
    np.testing.assert_allclose(np.array(cell_averages(basis, v)),
                               np.array(ubar), rtol=1e-12, atol=1e-12)
    # admissible everywhere on the check points
    P = jnp.asarray(basis.eval_at(basis.nodes), u.dtype)
    W = jnp.einsum("qk,ckyx->cqyx", P, v)
    assert float(euler.pressure(W).min()) > 0.0


def test_forward_step_like_blast_survives():
    """Mach-3 inflow against a wall (forward_step-flavored stress): positivity
    limiter keeps the run alive and states admissible
    (examples/forward_step, src/positivity.cc)."""
    basis = make_basis("Qk", 2)
    mesh = CartesianMesh(40, 8, 0.0, 1.0, 0.0, 0.2)
    inflow = lambda x, y, t: jnp.stack(  # noqa: E731
        [jnp.full_like(x, 1.4 * 3.0), jnp.zeros_like(x),
         jnp.full_like(x, 1.4), jnp.full_like(x, 1.0 / 0.4 + 0.5 * 1.4 * 9.0)])
    bcs = dict(W=BoundarySide(euler.BC_INFLOW, inflow),
               E=BoundarySide(euler.BC_SLIP),   # wall -> strong reflected shock
               S=BoundarySide(euler.BC_SLIP),
               N=BoundarySide(euler.BC_SLIP))
    lim = LimiterConfig(type="TVB", shock_indicator="limiter", beta=2.0,
                        char_lim=True, pos_lim=True)
    s = Solver(basis, mesh, bcs, flux="lxf", limiter=lim, cfl=0.5)
    u = ic.set_initial_condition(basis, mesh, inflow)
    u, t, it = s.run(u, 0.5)
    ub = np.array(s.cell_averages(u))
    pre = np.array(euler.pressure(jnp.asarray(ub)))
    assert np.isfinite(ub).all()
    assert ub[euler.RHO].min() > 0 and pre.min() > 0


def test_positivity_f32_relative_floors():
    """f32 robustness of the Zhang-Shu squeeze (pos_floors): with the
    reference's absolute 1e-13 floor, an f32 squeeze can land point
    densities at -O(ulp * avg), where p = (g-1)(E - m^2/(2 rho)) flips sign
    with huge magnitude and the pressure pass wrongly SKIPS the cell (the
    round-3 TPU MOOD NaN).  The dtype-aware relative floors must keep
    squeezed point densities strictly positive and bound the pressure
    undershoot, in BOTH the XLA limiter and the fused modal kernel."""
    import jax
    from dflo_tpu.ops.contract import basis_apply, basis_reduce
    from dflo_tpu.ops.pallas_kernels import make_fused_modal_pos
    from dflo_tpu.stab.positivity import (REL_F32, _pos_points,
                                          make_positivity_limiter)

    b = make_basis("Pk", 2)
    rng = np.random.default_rng(0)
    ny, nx = 16, 128
    u = np.zeros((4, b.K, ny, nx), np.float32)
    # adversarial DMR-scale modal data: near-vacuum points, wild curvature
    u[2] = (rng.random((b.K, ny, nx)) - 0.5) * 2.0
    u[2, 0] = 1.4 + 6.6 * rng.random((ny, nx))
    u[0] = 40 * (rng.random((b.K, ny, nx)) - 0.5)
    u[0, 0] = 8 * 7.14 * rng.random((ny, nx))
    u[1, 0] = -8 * 4.1 * rng.random((ny, nx))
    u[3, 0] = 116.5 / 0.4 + 0.5 * (u[0, 0]**2 + u[1, 0]**2) / u[2, 0]
    u[3, 1:] = 100 * (rng.random((b.K - 1, ny, nx)) - 0.5)
    u = jnp.asarray(u, jnp.float32)

    avg32 = jnp.asarray(b.wq2 @ b.V, jnp.float32)
    ubar = basis_reduce(avg32, u)
    P32 = jnp.asarray(b.eval_at(_pos_points(2)), jnp.float32)
    p_scale = float(jnp.abs(euler.pressure(basis_apply(P32, u))).max())

    outs = {
        "xla": make_positivity_limiter(b, dtype=jnp.float32)(u, ubar),
        "fused": make_fused_modal_pos(b, jnp.float32, with_trunc=False)(u),
    }
    for name, v in outs.items():
        assert v.dtype == jnp.float32
        W = basis_apply(P32, v)
        rho_min = float(W[euler.RHO].min())
        p_min = float(euler.pressure(W).min())
        # density: strictly positive with a real margin (the floor minus
        # squeeze roundoff), never -O(ulp)
        assert rho_min > 0.1 * REL_F32 * 1.4, (name, rho_min)
        # pressure: undershoot bounded by f32 evaluation noise of the
        # quadratic (relative to the point-pressure scale), not O(1)
        assert p_min > -1e-6 * p_scale, (name, p_min, p_scale)
    # the two implementations agree to f32 accumulation noise
    d = float(jnp.abs(outs["xla"] - outs["fused"]).max())
    assert d < 1e-2, d
