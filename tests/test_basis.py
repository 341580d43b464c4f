import numpy as np
import pytest

from dflo_tpu.ops import quadrature
from dflo_tpu.ops.basis import (make_basis, qk_reduction_matrices,
                                WEST, EAST, SOUTH, NORTH)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_gauss_exactness(n):
    x, w = quadrature.gauss(n)
    assert np.isclose(w.sum(), 1.0)
    for d in range(2 * n):
        exact = 1.0 / (d + 1)
        assert np.isclose(np.sum(w * x**d), exact), d


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_gauss_lobatto_exactness(n):
    x, w = quadrature.gauss_lobatto(n)
    assert np.isclose(x[0], 0.0) and np.isclose(x[-1], 1.0)
    for d in range(2 * n - 2):
        assert np.isclose(np.sum(w * x**d), 1.0 / (d + 1)), d


@pytest.mark.parametrize("family", ["Qk", "Qk_gll", "Pk"])
@pytest.mark.parametrize("p", [1, 2, 3])
def test_partition_and_mass(family, p):
    b = make_basis(family, p)
    # constants are exactly representable: find coefficients of u(x,y)=1
    if family in ("Qk", "Qk_gll"):
        coef = np.ones(b.K)
    else:
        coef = np.zeros(b.K)
        coef[0] = 1.0
    assert np.allclose(b.V @ coef, 1.0)
    assert np.allclose(b.Gx @ coef, 0.0)
    assert np.allclose(b.Gy @ coef, 0.0)
    for f in range(4):
        assert np.allclose(b.faceV[f] @ coef, 1.0)
    # mass: integral of u=1 is 1 on unit cell
    assert np.isclose(coef @ (b.mass * coef) if family != "Qk_gll"
                      else coef @ b.mass_full @ coef, 1.0)


@pytest.mark.parametrize("family", ["Qk", "Pk"])
def test_mass_is_diagonal(family):
    b = make_basis(family, 2)
    off = b.mass_full - np.diag(np.diag(b.mass_full))
    assert np.max(np.abs(off)) < 1e-12
    assert np.allclose(np.diag(b.mass_full), b.mass)


@pytest.mark.parametrize("family", ["Qk", "Qk_gll", "Pk"])
def test_gradients_exact_for_linear(family):
    p = 2
    b = make_basis(family, p)
    # project u(x,y) = 2x + 3y onto the basis (interpolation / modal solve)
    f = lambda x, y: 2.0 * x + 3.0 * y
    if family in ("Qk", "Qk_gll"):
        coef = f(b.nodes[:, 0], b.nodes[:, 1])
    else:
        # L2 projection with quadrature: coef_k = sum_q w_q f(q) phi_k(q)
        xq = b.nodes  # Pk nodes attr = volume quad points
        fq = f(xq[:, 0], xq[:, 1])
        coef = (b.V * b.wq2[:, None]).T @ fq / b.mass
    assert np.allclose(b.Gx @ coef, 2.0)
    assert np.allclose(b.Gy @ coef, 3.0)
    assert np.allclose(b.faceV[EAST] @ coef, 2.0 + 3.0 * b.xq)
    assert np.allclose(b.faceV[WEST] @ coef, 3.0 * b.xq)
    assert np.allclose(b.faceV[NORTH] @ coef, 2.0 * b.xq + 3.0)
    assert np.allclose(b.faceV[SOUTH] @ coef, 2.0 * b.xq)


def test_pk_mode_degree_ordering():
    # matches src/claw.cc:104-118 (j outer, i inner)
    b = make_basis("Pk", 2)
    assert b.K == 6
    assert list(b.mode_degree) == [0, 1, 2, 1, 2, 2]


def test_qk_reduction_preserves_lower_degree():
    b = make_basis("Qk", 2)
    R = qk_reduction_matrices(b)
    # a linear function must be invariant under reduction to degree 1
    coef = 1.0 + 2.0 * b.nodes[:, 0] - b.nodes[:, 1]
    assert np.allclose(R[1] @ coef, coef)
    # reduction to degree 0 yields a constant
    red = R[0] @ coef
    assert np.allclose(red, red[0])
