"""Strength-of-connection golden tests.

Mirrors reference test/runtests.jl:19-34 (classical goldens) and
test/sa_tests.jl:3-61 (symmetric strength vs a naive dense reference
implementation written independently in-test).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.strength import Classical, SymmetricStrength


def test_classical_poisson5_golden():
    A = amg.poisson(5)
    S, T = Classical(0.2)(A)
    expected = np.array(
        [
            [1.0, 0.5, 0.0, 0.0, 0.0],
            [0.5, 1.0, 0.5, 0.0, 0.0],
            [0.0, 0.5, 1.0, 0.5, 0.0],
            [0.0, 0.0, 0.5, 1.0, 0.5],
            [0.0, 0.0, 0.0, 0.5, 1.0],
        ]
    )
    assert np.array_equal(S.toarray(), expected)


def test_classical_graph_vs_ref(graph, ref_S):
    S, T = Classical(0.25)(graph)
    diff = (S - ref_S).toarray()
    assert np.max(np.abs(diff)) < 1e-10


def _naive_symmetric_strength(A_dense, theta):
    """Independent dense re-implementation (cross-check, survey §4.5)."""
    n = A_dense.shape[0]
    d = np.abs(np.diag(A_dense))
    S = np.zeros_like(A_dense)
    for i in range(n):
        for j in range(n):
            if i == j:
                S[i, j] = A_dense[i, j]
            elif A_dense[i, j] ** 2 >= theta * theta * d[i] * d[j]:
                S[i, j] = A_dense[i, j]
    # abs + column scaling by largest entry
    S = np.abs(S)
    for j in range(n):
        m = S[:, j].max(initial=0.0)
        if m != 0:
            S[:, j] /= m
    return S


@pytest.mark.parametrize("theta", [0.0, 0.1, 0.25, 0.5])
def test_symmetric_strength_vs_naive(theta):
    rng = np.random.default_rng(42)
    n = 30
    M = rng.random((n, n))
    A_dense = M + M.T + n * np.eye(n)
    A = sp.csc_matrix(A_dense)
    S, S2 = SymmetricStrength(theta)(A)
    assert S is S2
    naive = _naive_symmetric_strength(A_dense, theta)
    # sparse path only stores A's pattern; A is dense here so identical
    assert np.allclose(S.toarray(), naive, atol=1e-12)


def test_symmetric_strength_bsr_fast_path():
    A = amg.poisson(10)
    S, _ = SymmetricStrength(0.0)(A, bsr_flag=True)
    # pattern preserved, unit values (strength.jl:81-84)
    assert np.array_equal(S.indices, sp.csc_matrix(A).indices)
    assert np.all(S.data == 1.0)


def test_symmetric_strength_complex_raises():
    A = amg.poisson(5).astype(np.complex128)
    with pytest.raises(ValueError):
        SymmetricStrength(0.0)(A)
