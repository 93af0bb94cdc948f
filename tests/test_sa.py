"""SA-specific goldens: Jacobi prolongator vs ref_R fixture, spectral radius
vs dense eig (test/sa_tests.jl:271-313,382-388), dtype propagation
(runtests.jl:244-259)."""

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.utils.arnoldi import approximate_spectral_radius


def test_jacobi_prolongator_vs_ref(ref_R):
    A = amg.poisson(100)
    T = amg.poisson(100)
    P = amg.JacobiProlongation(4 / 3)(A, T, None, None)
    assert np.sum(np.abs((P - ref_R).toarray()) ** 2) < 1e-6


@pytest.mark.parametrize("n", [10, 20, 37])
def test_spectral_radius_vs_dense(n):
    rs = np.random.RandomState(n)
    M = rs.rand(n, n)
    A = sp.csr_matrix(M + M.T)
    rho_dense = np.max(np.abs(np.linalg.eigvals(M + M.T)))
    rho = approximate_spectral_radius(A)
    assert np.isclose(rho, rho_dense, rtol=0.02)


def test_diagonal_weighting_prolongation():
    from algebraicmultigrid_tpu.models.prolongation_smooth import DiagonalWeighting

    A = amg.poisson(50)
    T = sp.eye(50, format="csr")
    P = amg.JacobiProlongation(4 / 3)(A, T, None, None, weighting=DiagonalWeighting())
    # (I - ω/ρ · D⁻¹A): ρ(D⁻¹A) for 1-D Poisson ≈ 2
    dense = P.toarray()
    assert dense.shape == (50, 50)
    assert np.all(np.abs(np.diag(dense) - (1 - 4 / 3 / 2 * 1)) < 0.1)


def test_dtype_propagation():
    # runtests.jl:244-259: result eltype = promote(A, b)
    a64 = amg.poisson(100)
    rs = np.random.RandomState(0)
    b = rs.rand(100)
    for Ta, Tb in [
        (np.float64, np.float64),
        (np.float32, np.float32),
        (np.float64, np.float32),
        (np.float32, np.float64),
    ]:
        a = a64.astype(Ta)
        ml = amg.smoothed_aggregation(a)
        x = amg.solve_mg(ml, b.astype(Tb))
        assert x.dtype == np.promote_types(Ta, Tb)


def test_sa_hierarchy_int32_indices():
    a = amg.poisson(100)
    a.indices = a.indices.astype(np.int32)
    a.indptr = a.indptr.astype(np.int32)
    ml = amg.smoothed_aggregation(a)
    assert len(ml) >= 2


def test_sa_verbose(capsys):
    amg.smoothed_aggregation(amg.poisson(100), verbose=True)
    assert "Multilevel" in capsys.readouterr().out
