"""Standard-aggregation contracts and corner cases
(test/sa_tests.jl:64-201, 391-396; issue #24)."""

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.aggregate import StandardAggregation
from algebraicmultigrid_tpu.models.strength import SymmetricStrength


def _naive_aggregation(S):
    """Independent set-based re-implementation (cross-check, survey §4.5):
    pass-1 seeds + neighbours, pass-2 strongest join, pass-3 leftovers."""
    S = sp.csc_matrix(S)
    n = S.shape[0]
    agg = -np.ones(n, dtype=np.int64)  # -1 = unassigned
    neighbors = [set(S.indices[S.indptr[i]:S.indptr[i + 1]]) - {i} for i in range(n)]
    isolated = [len(nb) == 0 for nb in neighbors]
    cnt = 0
    for i in range(n):
        if agg[i] != -1 or isolated[i]:
            continue
        if all(agg[j] == -1 for j in neighbors[i]):
            agg[i] = cnt
            for j in neighbors[i]:
                agg[j] = cnt
            cnt += 1
    pending = {}
    for i in range(n):
        if agg[i] != -1 or isolated[i]:
            continue
        best, s_best = -1, 0
        for ptr in range(S.indptr[i], S.indptr[i + 1]):
            j, sval = S.indices[ptr], S.data[ptr]
            # strongest pass-1-assigned neighbour (pending joins invisible)
            if j != i and agg[j] >= 0 and sval > s_best:
                best, s_best = agg[j], sval
        if best >= 0:
            pending[i] = best
    for i, a in pending.items():
        agg[i] = a
    for i in range(n):
        if agg[i] == -1 and not isolated[i]:
            agg[i] = cnt
            for j in neighbors[i]:
                if agg[j] == -1 and not isolated[j]:
                    agg[j] = cnt
            cnt += 1
    mask = agg >= 0
    rows = agg[mask]
    cols = np.flatnonzero(mask)
    return sp.coo_matrix(
        (np.ones(rows.size), (rows, cols)), shape=(cnt, n)
    ).tocsr()


def test_chain_without_diagonal():
    # 4-node chain, no diagonal: 2 aggregates of size 2
    S = sp.csc_matrix(
        (np.ones(6), (np.array([0, 1, 1, 2, 2, 3]), np.array([1, 0, 2, 1, 3, 2]))),
        shape=(4, 4),
    )
    AggOp = StandardAggregation()(S)
    assert AggOp.shape[0] == 2
    assert np.all(np.asarray(AggOp.sum(axis=0)).ravel() == 1)


def test_disconnected_components():
    rows = np.array([0, 1, 1, 2, 3, 4, 4, 5])
    cols = np.array([1, 0, 2, 1, 4, 3, 5, 4])
    S = sp.csc_matrix((np.ones(8), (rows, cols)), shape=(6, 6)) + sp.eye(6)
    calc = StandardAggregation()(S)
    ref = _naive_aggregation(S)
    assert np.sum(np.abs((calc - ref).toarray()) ** 2) < 1e-6


def test_all_isolated():
    S = sp.eye(5, format="csc")
    AggOp = StandardAggregation()(S)
    assert AggOp.nnz == 0


def test_empty_matrix():
    S = sp.csc_matrix((0, 0))
    AggOp = StandardAggregation()(S)
    assert AggOp.shape == (0, 0)


def test_diagonal_matrix_one_level_hierarchy():
    A = sp.diags(2.0 * np.ones(20)).tocsc()
    ml = amg.smoothed_aggregation(A)
    assert len(ml) == 1
    assert ml.final_A.shape == (20, 20)


def test_intermediate_isolated_node():
    A = sp.diags(
        [np.full(4, -0.5), np.array([1.0, 1.0, 100.0, 1.0, 1.0]), np.full(4, -0.5)],
        [-1, 0, 1],
    ).tocsc()
    S, _ = SymmetricStrength(0.25)(A)
    AggOp = StandardAggregation()(S)
    assert AggOp.shape[0] == 2
    assert AggOp[:, 2].nnz == 0  # node 3 isolated → zero column


def test_every_node_exactly_one_aggregate():
    A = amg.poisson((10, 10))
    S, _ = SymmetricStrength(0.0)(A)
    AggOp = StandardAggregation()(S)
    col_sums = np.asarray(AggOp.sum(axis=0)).ravel()
    assert np.all(col_sums == 1)


@pytest.mark.parametrize("theta", [0.0, 0.02, 0.1, 1.0])
def test_aggregation_vs_naive_random(theta):
    rng = np.random.default_rng(7)
    M = sp.random(40, 40, density=0.1, random_state=np.random.RandomState(3))
    A = sp.csc_matrix(M + M.T + 2 * sp.eye(40))
    S, _ = SymmetricStrength(theta)(A)
    calc = StandardAggregation()(S)
    ref = _naive_aggregation(S)
    assert np.sum(np.abs((calc - ref).toarray()) ** 2) < 1e-6


def test_onetoall_star_graph(onetoall):
    # Issue #24 pins (test_regression.jl:7-12)
    ml = amg.smoothed_aggregation(onetoall)
    assert ml.levels[1].A.shape == (11, 11)
    assert ml.final_A.shape == (2, 2)
