"""Near-null-space / physics integration tests (test/nns_test.jl)."""

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu import fit_candidates


def test_B_argument_forms():
    # nns_test.jl:6-24: B as None / vector / (n,1) matrix must agree
    A = amg.poisson(100)
    rs = np.random.RandomState(0)
    b = rs.rand(100)
    x_none = amg.solve(A, b, amg.SmoothedAggregationAMG(), maxiter=1, abstol=1e-6)
    x_vec = amg.solve(A, b, amg.SmoothedAggregationAMG(), maxiter=1, abstol=1e-6, B=np.ones(100))
    x_mat = amg.solve(A, b, amg.SmoothedAggregationAMG(), maxiter=1, abstol=1e-6, B=np.ones((100, 1)))
    assert np.allclose(x_vec, x_none)
    assert np.allclose(x_mat, x_none)


def _isapprox(x, y, rtol=np.sqrt(np.finfo(np.float64).eps)):
    """Julia isapprox for arrays: norm-wise comparison."""
    return np.linalg.norm(x - y) <= rtol * max(np.linalg.norm(x), np.linalg.norm(y))


def test_linear_elasticity_2d(lin_elastic_2d):
    # nns_test.jl:213-234: converges with rigid-body B, fails without
    A, B, b = lin_elastic_2d
    x_nns, res_nns = amg.solve(
        A, b, amg.SmoothedAggregationAMG(), log=True, reltol=1e-10, B=B
    )
    assert _isapprox(A @ x_nns, b)

    x_wo, res_wo = amg.solve(
        A, b, amg.SmoothedAggregationAMG(), coarse_solver=amg.Pinv, log=True, reltol=1e-10
    )
    assert not _isapprox(A @ x_wo, b)
    assert res_wo[0] > res_wo[-1]

    # fit exactly and via projection on the real elasticity operator
    AggOp = amg.StandardAggregation()(A)
    Q, R = fit_candidates(AggOp, B)
    assert np.allclose(Q @ R, B, atol=1e-8)
    assert np.allclose(Q @ (Q.T @ B), B, atol=1e-8)


# ---- cantilever frame beam (independent FE assembly) -----------------------


def _frame_element_stiffness(EA, EI, le):
    """Standard 2-node Euler-Bernoulli frame element (axial + bending)."""
    Ke = np.zeros((6, 6))
    Ke[np.ix_([0, 3], [0, 3])] = EA / le * np.array([[1, -1], [-1, 1]])
    l2, l3 = le**2, le**3
    Kb = (
        EI
        / l3
        * np.array(
            [
                [12, 6 * le, -12, 6 * le],
                [6 * le, 4 * l2, -6 * le, 2 * l2],
                [-12, -6 * le, 12, -6 * le],
                [6 * le, 2 * l2, -6 * le, 4 * l2],
            ]
        )
    )
    idx = [1, 2, 4, 5]
    Ke[np.ix_(idx, idx)] = Kb
    return Ke


def _cantilever_beam(P, E, Across, I, L, n_elem):
    le = L / n_elem
    n_nodes = n_elem + 1
    n_dofs = 3 * n_nodes
    Ke = _frame_element_stiffness(E * Across, E * I, le)
    rows, cols, vals = [], [], []
    for e in range(n_elem):
        dofmap = np.array(
            [3 * e, 3 * e + 1, 3 * e + 2, 3 * e + 3, 3 * e + 4, 3 * e + 5]
        )
        rows.append(np.repeat(dofmap, 6))
        cols.append(np.tile(dofmap, 6))
        vals.append(Ke.ravel())
    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_dofs, n_dofs),
    ).tocsc()
    b = np.zeros(n_dofs)
    b[3 * (n_nodes - 1) + 1] = P  # transverse load at the tip

    fixed = [0, 1, 2]
    free = np.setdiff1d(np.arange(n_dofs), fixed)
    A_free = A[np.ix_(free, free)].tocsc()
    b_free = b[free]

    x_coords = le * np.arange(n_nodes)
    B = np.zeros((free.size, 3))  # rigid modes: x-transl, y-transl, rotation
    for i, dof in enumerate(free):
        node, off = divmod(dof, 3)
        x = x_coords[node]
        if off == 0:
            B[i, 0] = 1.0
        elif off == 1:
            B[i, 1] = 1.0
            B[i, 2] = x
        else:
            B[i, 2] = 1.0
    return A_free, b_free, B


def test_cantilever_beam_nns():
    P, E, Across, I, L, n_elem = -1000.0, 210e9, 1e-4, 1e-6, 1.0, 10
    A, b, B = _cantilever_beam(P, E, Across, I, L, n_elem)

    # analytic tip deflection
    u = sp.linalg.spsolve(A.tocsr(), b)
    assert np.isclose(u[-2], P * L**3 / (3 * E * I), rtol=1e-8)

    x_nns, res = amg.solve(
        A, b, amg.SmoothedAggregationAMG(),
        coarse_solver=amg.Pinv, log=True, reltol=1e-10, B=B, max_levels=2,
    )
    assert _isapprox(A @ x_nns, b)

    x_wo, _ = amg.solve(
        A, b, amg.SmoothedAggregationAMG(),
        coarse_solver=amg.Pinv, log=True, reltol=1e-10, max_levels=2,
    )
    assert not _isapprox(A @ x_wo, b)

    AggOp = amg.StandardAggregation()(A)
    Q, R = fit_candidates(AggOp, B)
    assert np.allclose(Q @ R, B, atol=1e-8 * np.abs(B).max())
    assert np.allclose(Q @ (Q.T @ B), B, atol=1e-8 * np.abs(B).max())
