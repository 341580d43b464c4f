import jax.numpy as jnp
import numpy as np
import pytest

from dflo_tpu.physics import euler
from dflo_tpu.physics.euler import MX, MY, RHO, ENE, GAMMA
from dflo_tpu.physics import fluxes


def make_state(rho=1.2, u=0.3, v=-0.5, p=0.9):
    E = p / (GAMMA - 1.0) + 0.5 * rho * (u * u + v * v)
    return jnp.array([rho * u, rho * v, rho, E])


def rand_states(n=64, seed=0):
    rng = np.random.default_rng(seed)
    rho = rng.uniform(0.2, 3.0, n)
    u = rng.uniform(-2.0, 2.0, n)
    v = rng.uniform(-2.0, 2.0, n)
    p = rng.uniform(0.1, 5.0, n)
    E = p / (GAMMA - 1.0) + 0.5 * rho * (u**2 + v**2)
    return jnp.array(np.stack([rho * u, rho * v, rho, E]))


def test_pressure_sound_speed():
    U = make_state(rho=2.0, u=1.0, v=0.0, p=3.0)
    assert np.isclose(euler.pressure(U), 3.0)
    assert np.isclose(euler.sound_speed(U), np.sqrt(GAMMA * 3.0 / 2.0))
    assert np.isclose(euler.max_eigenvalue(U), 1.0 + np.sqrt(GAMMA * 1.5))


def test_flux_columns():
    rho, u, v, p = 1.2, 0.3, -0.5, 0.9
    U = make_state(rho, u, v, p)
    fx = euler.flux_x(U)
    assert np.isclose(fx[MX], rho * u * u + p)
    assert np.isclose(fx[MY], rho * u * v)
    assert np.isclose(fx[RHO], rho * u)
    assert np.isclose(fx[ENE], (float(U[ENE]) + p) * u)
    # normal flux with axis normals reproduces flux columns
    assert np.allclose(euler.normal_flux(U, 1.0, 0.0), fx)
    assert np.allclose(euler.normal_flux(U, 0.0, 1.0), euler.flux_y(U))


def test_char_transform_roundtrip():
    U = rand_states(16)
    Rx, Lx, Ry, Ly = euler.eigen_matrices(U)
    W = rand_states(16, seed=1)
    for L, R in ((Lx, Rx), (Ly, Ry)):
        Wc = euler.to_characteristic(L, W)
        back = euler.to_conserved(R, Wc)
        assert np.allclose(back, W, atol=1e-10)


def test_eigen_matrices_diagonalize_jacobian():
    # R Lambda L = A = dF/dU for the x-split (internal ordering rho,mx,my,E)
    import jax
    U = make_state(1.3, 0.4, -0.2, 1.1)

    def fx_internal(Vint):
        Ucons = jnp.stack([Vint[1], Vint[2], Vint[0], Vint[3]])
        f = euler.flux_x(Ucons)
        return jnp.stack([f[RHO], f[MX], f[MY], f[ENE]])

    Vint = jnp.stack([U[RHO], U[MX], U[MY], U[ENE]])
    A = jax.jacfwd(fx_internal)(Vint)
    Rx, Lx, _, _ = euler.eigen_matrices(U)
    u = float(U[MX] / U[RHO])
    c = float(euler.sound_speed(U))
    lam = np.diag([u, u, u + c, u - c])
    assert np.allclose(Rx @ lam @ Lx, A, atol=1e-8)


def test_wminus_kinds():
    U = make_state(1.0, 0.7, -0.3, 1.0)
    bv = make_state(0.5, 0.1, 0.0, 0.4)
    nx, ny = 0.6, 0.8
    w = euler.compute_wminus(euler.BC_OUTFLOW, nx, ny, U, bv)
    assert np.allclose(w, U)
    w = euler.compute_wminus(euler.BC_INFLOW, nx, ny, U, bv)
    assert np.allclose(w, bv)
    w = euler.compute_wminus(euler.BC_FARFIELD, nx, ny, U, bv)
    assert np.allclose(w, bv)
    # slip: normal velocity flips, tangential preserved, rho/E copied
    w = euler.compute_wminus(euler.BC_SLIP, nx, ny, U, bv)
    vn_in = float(U[MX] * nx + U[MY] * ny)
    vn_out = float(w[MX] * nx + w[MY] * ny)
    assert np.isclose(vn_out, -vn_in)
    tx, ty = -ny, nx
    assert np.isclose(float(w[MX] * tx + w[MY] * ty),
                      float(U[MX] * tx + U[MY] * ty))
    assert np.isclose(w[RHO], U[RHO]) and np.isclose(w[ENE], U[ENE])
    # pressure: energy set from prescribed pressure (stored in ENE slot)
    pset = 0.77
    bvp = jnp.array([0.0, 0.0, 0.0, pset])
    w = euler.compute_wminus(euler.BC_PRESSURE, nx, ny, U, bvp)
    ke = float(euler.kinetic_energy(U))
    assert np.isclose(w[ENE], pset / (GAMMA - 1.0) + ke)
    assert np.isclose(euler.pressure(w), pset)


ALL_FLUXES = sorted(fluxes.FLUX_FUNCTIONS)


@pytest.mark.parametrize("name", ALL_FLUXES)
def test_flux_consistency(name):
    """F(U, U, n) == physical normal flux."""
    f = fluxes.get_flux(name)
    U = rand_states(32)
    for nx, ny in [(1.0, 0.0), (0.0, 1.0), (0.6, 0.8), (-0.8, 0.6)]:
        got = f(U, U, nx, ny, U, U)
        want = euler.normal_flux(U, nx, ny)
        assert np.allclose(got, want, atol=1e-10), name


@pytest.mark.parametrize("name", ALL_FLUXES)
def test_flux_conservation_symmetry(name):
    """F(UL, UR, n) == -F(UR, UL, -n)."""
    f = fluxes.get_flux(name)
    UL = rand_states(32, seed=2)
    UR = rand_states(32, seed=3)
    nx, ny = 0.6, 0.8
    a = f(UL, UR, nx, ny, UL, UR)
    b = f(UR, UL, -nx, -ny, UR, UL)
    assert np.allclose(a, -b, atol=1e-9), name


def test_logavg():
    a, b = jnp.array([2.0, 1.0]), jnp.array([3.0, 1.0 + 1e-9])
    got = fluxes.logavg(a, b)
    exact0 = (3.0 - 2.0) / (np.log(3.0) - np.log(2.0))
    assert np.isclose(got[0], exact0)
    assert np.isclose(got[1], 1.0)


def test_hllc_matches_exact_upwind_supersonic():
    # fully supersonic left-moving/right-moving states pick the upwind flux
    U = make_state(1.0, 5.0, 0.0, 1.0)   # Mach >> 1 to the right
    got = fluxes.hllc(U[:, None], make_state(0.9, 5.0, 0.0, 0.9)[:, None], 1.0, 0.0)
    want = euler.normal_flux(U, 1.0, 0.0)
    assert np.allclose(got[:, 0], want, atol=1e-12)


def test_entropy_stability_sample_kep():
    # entropy dissipation: (V_R - V_L) . F_num <= psi_R - psi_L (normal pot.)
    UL = make_state(1.0, 0.1, 0.0, 1.0)
    UR = make_state(0.7, -0.2, 0.1, 0.6)
    nx, ny = 1.0, 0.0
    F = fluxes.kep(UL[:, None], UR[:, None], nx, ny,
                   UL[:, None], UR[:, None])[:, 0]
    VL, VR = euler.entropy_var(UL), euler.entropy_var(UR)
    # entropy potential psi = rho * v.n
    psiL = float(UL[MX] * nx + UL[MY] * ny)
    psiR = float(UR[MX] * nx + UR[MY] * ny)
    # reorder V to match F components (both conserved order here)
    lhs = float(jnp.sum((VR - VL) * F))
    assert lhs <= psiR - psiL + 1e-12
