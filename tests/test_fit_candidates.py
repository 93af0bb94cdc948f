"""fit_candidates identities: B ≈ Q·R and B ≈ Q·(Qᵀ·B)
(test/nns_test.jl:28-107, test/sa_tests.jl:204-217)."""

import numpy as np
import pytest
import scipy.sparse as sp

from algebraicmultigrid_tpu import fit_candidates


def _agg(rows, cols, n_fine, n_agg):
    """AggOp fine×agg (as in the reference cases) — transposed before the call."""
    return sp.csc_matrix(
        (np.ones(len(rows)), (np.array(rows) - 1, np.array(cols) - 1)),
        shape=(n_fine, n_agg),
    )


CASES = [
    # 1. aggregates include all dofs, one candidate
    (_agg([1, 2, 3, 4, 5], [1, 1, 1, 2, 2], 5, 2), np.ones((5, 1))),
    (_agg([1, 2, 3, 4, 5], [2, 2, 1, 1, 1], 5, 2), np.ones((5, 1))),
    (_agg(list(range(1, 10)), [1, 1, 1, 2, 2, 2, 3, 3, 3], 9, 3), np.ones((9, 1))),
    (
        _agg(list(range(1, 10)), [3, 2, 1, 1, 2, 3, 2, 1, 3], 9, 3),
        np.arange(9, dtype=float).reshape(9, 1),
    ),
    # 2. two candidates
    (
        _agg([1, 2, 3, 4], [1, 1, 2, 2], 4, 2),
        np.stack([np.ones(4), np.arange(4.0)], axis=1),
    ),
    (
        _agg(list(range(1, 10)), [1, 1, 1, 2, 2, 2, 3, 3, 3], 9, 3),
        np.stack([np.ones(9), np.arange(9.0)], axis=1),
    ),
    (
        _agg(list(range(1, 10)), [1, 1, 2, 2, 3, 3, 4, 4, 4], 9, 4),
        np.stack([np.ones(9), np.arange(9.0)], axis=1),
    ),
    # 3. small norms
    (
        _agg([1, 2, 3, 4], [1, 1, 2, 2], 4, 2),
        np.stack([np.ones(4), 1e-20 * np.arange(4.0)], axis=1),
    ),
    (
        _agg([1, 2, 3, 4], [1, 1, 2, 2], 4, 2),
        1e-20 * np.stack([np.ones(4), np.arange(4.0)], axis=1),
    ),
    # 4. isolated nodes
    (
        _agg([1, 2, 4, 5], [1, 1, 2, 2], 5, 2),
        np.stack([np.ones(5), np.arange(1.0, 6.0)], axis=1),
    ),
    (
        _agg([1, 2, 4, 5], [1, 1, 2, 2], 5, 2),
        np.stack([np.ones(5), np.arange(1.0, 6.0), np.arange(5.0, 0.0, -1)], axis=1),
    ),
    (
        _agg([2, 3, 4, 5, 6], [1, 1, 2, 2, 2], 7, 2),
        np.stack([np.ones(7), np.arange(1.0, 8.0)], axis=1),
    ),
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_fit_candidates_identities(case_idx):
    AggOp_fine, fine = CASES[case_idx]
    fine = fine.copy()
    # mask dofs not in any aggregate (nns_test.jl:104-106)
    in_agg = np.asarray(AggOp_fine.sum(axis=1)).ravel() > 0
    fine[~in_agg] = 0.0
    Q, R = fit_candidates(AggOp_fine.T.tocsr(), fine)
    assert np.allclose(Q @ R, fine, atol=1e-10)
    assert np.allclose(Q @ (Q.T @ fine), fine, atol=1e-10)


def test_fit_candidates_vector_path():
    AggOp = sp.csr_matrix(
        (np.ones(6), (np.array([0, 0, 0, 1, 1, 1]), np.arange(6))), shape=(2, 6)
    )
    B = np.arange(1.0, 7.0)
    Q, R = fit_candidates(AggOp, B)
    assert np.allclose(Q @ R, B)
    # columns are unit-norm
    norms = sp.linalg.norm(Q, axis=0)
    assert np.allclose(norms, 1.0)


def test_fit_candidates_vector_matches_matrix_1col():
    AggOp = sp.csr_matrix(
        (np.ones(6), (np.array([0, 0, 1, 1, 1, 0]), np.arange(6))), shape=(2, 6)
    )
    B = np.arange(1.0, 7.0)
    Qv, Rv = fit_candidates(AggOp, B)
    Qm, Rm = fit_candidates(AggOp, B.reshape(-1, 1))
    assert np.allclose(np.abs(Qv.toarray()), np.abs(Qm.toarray()))
