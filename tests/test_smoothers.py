"""Smoother semantics and convergence (test/test_smoothers.jl,
test_regression.jl issue #26) plus host↔device differential checks."""

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.relax import setup_smoother_host
from algebraicmultigrid_tpu.ops.coloring import jp_coloring
from algebraicmultigrid_tpu.utils.symmetry import HermitianSymmetry, NoSymmetry


def _rand_dd(n=50, seed=0):
    """Diagonally dominant mildly non-symmetric matrix (test_smoothers.jl:11-12)."""
    rs = np.random.RandomState(seed)
    A = sp.random(n, n, density=0.05, random_state=rs) + 5 * sp.eye(n)
    return sp.csr_matrix(A)


@pytest.mark.parametrize(
    "config",
    [
        amg.Jacobi(1 / 6, iter=500),
        amg.GaussSeidel(amg.ForwardSweep(), iter=100),
        amg.GaussSeidel(amg.BackwardSweep(), iter=100),
        amg.GaussSeidel(amg.SymmetricSweep(), iter=100),
        amg.SOR(0.5, amg.ForwardSweep(), iter=100),
        amg.SOR(0.5, amg.BackwardSweep(), iter=100),
        amg.SOR(0.5, amg.SymmetricSweep(), iter=100),
        amg.GaussSeidel(amg.SymmetricSweep(), iter=100, ordering="multicolor"),
        amg.SOR(0.9, amg.SymmetricSweep(), iter=200, ordering="multicolor"),
    ],
)
def test_smoother_convergence_nonsymmetric(config):
    A = _rand_dd()
    n = A.shape[0]
    rs = np.random.RandomState(1)
    x = rs.rand(n)
    b = np.ones(n)
    cache = setup_smoother_host(config, A, NoSymmetry())
    cache.smooth(x, b)
    assert np.allclose(A @ x, b, rtol=1e-7)


def _reference_gs_sweep(A, x, b, reverse=False):
    """Scalar natural-order GS — literal reference semantics (smoother.jl:73-90)."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    order = range(n - 1, -1, -1) if reverse else range(n)
    for i in order:
        rsum, d = 0.0, 0.0
        for ptr in range(A.indptr[i], A.indptr[i + 1]):
            j, v = A.indices[ptr], A.data[ptr]
            if j == i:
                d = v
            else:
                rsum += v * x[j]
        if d != 0:
            x[i] = (b[i] - rsum) / d
    return x


def test_natural_gs_matches_scalar_reference():
    A = sp.csr_matrix(amg.poisson(50))
    rs = np.random.RandomState(2)
    x0 = rs.rand(50)
    b = np.ones(50)

    x_ref = x0.copy()
    for _ in range(2):
        _reference_gs_sweep(A, x_ref, b)
        _reference_gs_sweep(A, x_ref, b, reverse=True)

    x_tri = x0.copy()
    cache = setup_smoother_host(amg.GaussSeidel(iter=2), A, HermitianSymmetry())
    cache.smooth(x_tri, b)
    assert np.allclose(x_tri, x_ref, atol=1e-13)


def test_issue_26_symmetric_gs_golden():
    A = amg.poisson(10)
    x = np.ones(10)
    b = np.zeros(10)
    cache = setup_smoother_host(amg.GaussSeidel(iter=4), A, HermitianSymmetry())
    cache.smooth(x, b)
    golden = np.array(
        [0.176765, 0.353529, 0.497517, 0.598914, 0.653311,
         0.659104, 0.615597, 0.52275, 0.382787, 0.203251]
    )
    assert np.sum((x - golden) ** 2) < 1e-6


def test_zero_diag_rows_frozen():
    A = sp.csr_matrix(amg.poisson(6)).tolil()
    A[2, 2] = 0.0
    A = A.tocsr()
    x0 = np.full(6, 0.5)
    b = np.ones(6)
    x = x0.copy()
    cache = setup_smoother_host(amg.GaussSeidel(iter=3), A, HermitianSymmetry())
    cache.smooth(x, b)
    x_ref = x0.copy()
    for _ in range(3):
        _reference_gs_sweep(A, x_ref, b)
        _reference_gs_sweep(A, x_ref, b, reverse=True)
    assert np.allclose(x, x_ref, atol=1e-13)
    assert x[2] == 0.5  # frozen


def test_nosym_zero_diag_raises():
    A = sp.csr_matrix(amg.poisson(6)).tolil()
    A[2, 2] = 0.0
    with pytest.raises(np.linalg.LinAlgError):
        setup_smoother_host(amg.GaussSeidel(), A.tocsr(), NoSymmetry())


def test_coloring_validity():
    A = amg.poisson((13, 17))
    colors = jp_coloring(A)
    G = sp.csr_matrix(A)
    for i in range(G.shape[0]):
        for ptr in range(G.indptr[i], G.indptr[i + 1]):
            j = G.indices[ptr]
            if i != j:
                assert colors[i] != colors[j]


def test_multicolor_is_valid_gauss_seidel():
    """Multicolor GS must equal natural GS applied under the color permutation."""
    A = sp.csr_matrix(amg.poisson(30))
    rs = np.random.RandomState(3)
    x0 = rs.rand(30)
    b = rs.rand(30)

    cache = setup_smoother_host(
        amg.GaussSeidel(amg.ForwardSweep(), ordering="multicolor"), A, HermitianSymmetry()
    )
    x_mc = x0.copy()
    cache.smooth(x_mc, b)

    colors = cache.colors
    perm = np.argsort(colors, kind="stable")
    Ap = A[perm][:, perm].tocsr()
    x_p = x0[perm].copy()
    _reference_gs_sweep(Ap, x_p, b[perm])
    x_ref = np.empty_like(x_p)
    x_ref[perm] = x_p
    assert np.allclose(x_mc, x_ref, atol=1e-13)


def test_device_smoothers_match_host():
    import jax.numpy as jnp

    from algebraicmultigrid_tpu.models.device import (
        _apply_smoother,
        _build_smoother_cache,
    )
    from algebraicmultigrid_tpu.ops.sparse import ell_from_csr

    A = sp.csr_matrix(amg.poisson(40))
    rs = np.random.RandomState(4)
    x0 = rs.rand(40)
    b = rs.rand(40)
    A_ell = ell_from_csr(A, dtype=np.float64)

    for config in [
        amg.Jacobi(0.7, iter=3),
        amg.GaussSeidel(iter=2),
        amg.SOR(0.8, amg.SymmetricSweep(), iter=2),
        amg.GaussSeidel(iter=2, ordering="multicolor"),
        amg.SOR(0.8, iter=2, ordering="multicolor"),
    ]:
        host = setup_smoother_host(config, A, HermitianSymmetry())
        xh = x0.copy()
        host.smooth(xh, b)

        dev_cache = _build_smoother_cache(config, A, A_ell, np.float64)
        xd = _apply_smoother(dev_cache, A_ell, jnp.asarray(x0), jnp.asarray(b))
        assert np.allclose(np.asarray(xd)[:40], xh, atol=1e-12), config
