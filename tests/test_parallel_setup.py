"""PMIS splitting + label-propagation aggregation (models/parallel_setup.py).

Validated by structural invariants and hierarchy-QUALITY metrics vs the
greedy reference algorithms (operator complexity, PCG iteration counts) —
exact greedy order is not the contract (SURVEY §2.4, §7 hard-part 1).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.splitting import C_NODE, F_NODE, _remove_diag


def _problems():
    out = {}
    out["poisson2d"] = sp.csr_matrix(amg.poisson((40, 40)))
    rng = np.random.default_rng(0)
    n = 500
    M = sp.random(n, n, density=0.01, random_state=np.random.RandomState(4))
    G = sp.csr_matrix(M + M.T)
    out["randlap"] = sp.csr_matrix(sp.csgraph.laplacian(G) + 0.05 * sp.eye(n))
    base = sp.csr_matrix(amg.poisson((20, 20)))
    blk = np.array([[2.0, 0.3], [0.3, 1.5]])
    out["elasticity-ish"] = sp.kron(base, blk).tocsr()
    return out


@pytest.mark.parametrize("name", ["poisson2d", "randlap", "elasticity-ish"])
def test_pmis_structural_invariants(name):
    A = _problems()[name]
    S, _ = amg.Classical(0.25)(sp.csc_matrix(A).T.tocsc())
    S = sp.csc_matrix(S)
    split = amg.PMIS()(S)
    n = A.shape[0]
    assert split.shape == (n,)
    assert set(np.unique(split)) <= {F_NODE, C_NODE}
    S0 = sp.csr_matrix(_remove_diag(sp.csc_matrix(S)))
    G = ((S0 != 0) + (S0 != 0).T).tocsr()
    rows = np.repeat(np.arange(n), np.diff(G.indptr))
    cols = G.indices
    is_C = split == C_NODE
    # independence: no two C points strongly coupled
    assert not (is_C[rows] & is_C[cols]).any()
    # coverage: every non-isolated F has a strong C neighbour
    has_nb = np.zeros(n, dtype=bool)
    has_nb[rows] = True
    cnt = np.zeros(n, dtype=np.int64)
    np.add.at(cnt, rows[is_C[cols]], 1)
    bad = (~is_C) & has_nb & (cnt == 0)
    assert not bad.any(), f"{bad.sum()} F nodes uncovered"


def test_pmis_deterministic():
    A = _problems()["poisson2d"]
    S, _ = amg.Classical(0.25)(sp.csc_matrix(A).T.tocsc())
    a = amg.PMIS()(sp.csc_matrix(S))
    b = amg.PMIS()(sp.csc_matrix(S))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name", ["poisson2d", "randlap"])
def test_pmis_hierarchy_quality(name):
    A = _problems()[name]
    ml_rs = amg.ruge_stuben(A.tocsc())
    ml_pm = amg.ruge_stuben(A.tocsc(), CF=amg.PMIS())
    assert len(ml_pm) >= 2
    # operator complexity within 35% of greedy RS
    assert ml_pm.operator_complexity() <= 1.35 * ml_rs.operator_complexity()
    b = A @ np.ones(A.shape[0])
    it_rs = _pcg_iters(A, b, ml_rs)
    it_pm = _pcg_iters(A, b, ml_pm)
    # PMIS picks a sparser C-set than greedy RS; with DIRECT interpolation
    # that costs iterations (the PMIS papers pair it with distance-two
    # interpolation for parity).  Bound the degradation, don't demand parity.
    assert it_pm <= max(3 * it_rs, it_rs + 10), (it_pm, it_rs)


def _pcg_iters(A, b, ml, tol=1e-8):
    M = amg.aspreconditioner(ml)
    x, residuals = amg.cg(A, b, M=M, maxiter=300, tol=tol, log=True)
    assert np.linalg.norm(A @ x - b) <= 10 * tol * np.linalg.norm(b)
    return len(residuals) - 1


@pytest.mark.parametrize("name", ["poisson2d", "randlap", "elasticity-ish"])
def test_labelprop_partition(name):
    A = _problems()[name]
    S, _ = amg.SymmetricStrength(0.0)(sp.csc_matrix(A))
    agg = amg.LabelPropAggregation()(sp.csc_matrix(S))
    n = A.shape[0]
    assert agg.shape[1] == n
    col_counts = np.asarray((agg != 0).sum(axis=0)).ravel()
    # every non-isolated node in exactly one aggregate; isolated in none
    S0 = sp.csr_matrix(_remove_diag(sp.csc_matrix(S)))
    iso = np.diff(((S0 != 0) + (S0 != 0).T).tocsr().indptr) == 0
    assert np.all(col_counts[~iso] == 1)
    assert np.all(col_counts[iso] == 0)
    # no empty aggregates
    assert np.all(np.asarray((agg != 0).sum(axis=1)).ravel() > 0)


def test_labelprop_sa_quality():
    A = sp.csr_matrix(amg.poisson((40, 40)))
    ml_std = amg.smoothed_aggregation(A.tocsc())
    ml_lp = amg.smoothed_aggregation(A.tocsc(), aggregate=amg.LabelPropAggregation())
    assert len(ml_lp) >= 2
    assert ml_lp.operator_complexity() <= 1.5 * ml_std.operator_complexity()
    b = A @ np.ones(A.shape[0])
    it_std = _pcg_iters(A, b, ml_std)
    it_lp = _pcg_iters(A, b, ml_lp)
    assert it_lp <= max(2 * it_std, it_std + 6), (it_lp, it_std)
