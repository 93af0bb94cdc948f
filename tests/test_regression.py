"""Issue-number regressions (test/test_regression.jl)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import algebraicmultigrid_tpu as amg


def test_issue_46_bug_graph(bug_graph):
    # 4×4 JLD2-loaded graph Laplacian: solve + PCG
    a = bug_graph
    n = a.shape[0]
    b = np.zeros(n)
    b[0] = 1
    b[1] = -1
    for setup, alg in [
        (amg.smoothed_aggregation, amg.SmoothedAggregationAMG()),
        (amg.ruge_stuben, amg.RugeStubenAMG()),
    ]:
        x = amg.solve(a, b, alg)
        assert np.sum((a @ x - b) ** 2) < 1e-10
        ml = setup(a)
        p = amg.aspreconditioner(ml)
        xc = amg.cg(a, b, M=p, maxiter=1000)
        assert np.sum((a @ xc - b) ** 2) < 1e-10


@pytest.mark.slow
def test_issue_56_big_shifted_poisson():
    X = (amg.poisson(27_000) + 24.0 * sp.eye(27_000)).tocsc()
    rs = np.random.RandomState(56)
    b = rs.rand(27_000)
    direct = spla.spsolve(X, b)

    ml = amg.ruge_stuben(X)
    x = amg.solve_mg(ml, b, reltol=1e-10)
    assert np.allclose(x, direct, rtol=1e-10, atol=1e-12)

    ml = amg.smoothed_aggregation(X, strength=amg.SymmetricStrength(0.05))
    x = amg.solve_mg(ml, b, reltol=1e-10)
    assert np.allclose(x, direct, rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_issue_95_nonsymmetric():
    N = 10_000
    rs = np.random.RandomState(95)
    A = (sp.random(N, N, density=0.001, random_state=rs) + 5 * sp.eye(N)).tocsc()
    b = np.ones(N)

    xrs = amg.solve(A, b, amg.RugeStubenAMG(), symmetry=amg.NoSymmetry())
    assert np.linalg.norm(A @ xrs - b) <= 1e-8 * np.linalg.norm(b)

    xsa = amg.solve(A, b, amg.SmoothedAggregationAMG(), symmetry=amg.NoSymmetry())
    assert np.linalg.norm(A @ xsa - b) <= 1e-8 * np.linalg.norm(b)


def test_pinv_coarse_solver():
    # runtests.jl:70-74
    A = amg.poisson(10)
    b = A @ np.ones(10)
    x = amg.Pinv(A).apply(b)
    assert np.sum((x - 1) ** 2) < 1e-6


def test_pinv_singular():
    # Graph Laplacian (singular); pinv must produce the least-squares solution
    L = sp.csgraph.laplacian(sp.csr_matrix(np.ones((5, 5)) - np.eye(5)))
    b = np.zeros(5)
    b[0], b[1] = 1, -1
    x = amg.Pinv(L).apply(b)
    assert np.allclose(L @ x, b, atol=1e-12)
