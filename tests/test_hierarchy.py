"""Hierarchy-shape invariants — the reference's pinned level structures
(test/runtests.jl:52-110, BASELINE.md rows 1-4)."""

import numpy as np

import algebraicmultigrid_tpu as amg


def test_direct_interpolation_poisson5():
    # runtests.jl:52-64
    A = amg.poisson(5)
    splitting = np.array([1, 0, 1, 0, 1])
    P, R = amg.direct_interpolation(A.tocsc(), A.tocsc().copy(), splitting)
    expected = np.array(
        [
            [1.0, 0.0, 0.0],
            [0.5, 0.5, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.5, 0.5],
            [0.0, 0.0, 1.0],
        ]
    )
    assert np.array_equal(P.toarray(), expected)


def test_thing_level2_size(thing):
    ml = amg.ruge_stuben(thing)
    assert ml.levels[1].A.shape[0] == 19


def test_poisson1000_hierarchy():
    # runtests.jl:76-89 + README pins
    ml = amg.ruge_stuben(amg.poisson(1000))
    assert len(ml) == 8
    sizes = [1000, 500, 250, 125, 62, 31, 15]
    nnzs = [2998, 1498, 748, 373, 184, 91, 43]
    for lvl, (s, n) in zip(ml.levels, zip(sizes, nnzs)):
        assert lvl.A.shape[0] == s
        assert lvl.A.nnz == n
    assert ml.final_A.shape[0] == 7
    assert ml.final_A.nnz == 19
    assert round(ml.operator_complexity(), 3) == 1.986
    assert round(ml.grid_complexity(), 3) == 1.99


def test_randlap_hierarchy(randlap):
    # runtests.jl:90-102
    ml = amg.ruge_stuben(randlap)
    assert len(ml) == 3
    assert [l.A.shape[0] for l in ml.levels] == [100, 17]
    assert [l.A.nnz for l in ml.levels] == [2066, 289]
    assert ml.final_A.shape[0] == 2
    assert ml.final_A.nnz == 4
    assert round(ml.operator_complexity(), 3) == 1.142
    assert round(ml.grid_complexity(), 3) == 1.190


def test_trivial_hierarchy():
    # test_regression.jl:41-57: tiny problems yield 0-level hierarchies with
    # complexity exactly 1.
    for n in (2, 5, 10):
        for setup in (amg.ruge_stuben, amg.smoothed_aggregation):
            ml = setup(amg.poisson(n))
            assert len(ml.levels) == 0
            assert ml.operator_complexity() == 1.0
            assert ml.grid_complexity() == 1.0


def test_hierarchy_report_format():
    ml = amg.ruge_stuben(amg.poisson(100))
    rep = repr(ml)
    assert "Operator Complexity" in rep and "Coarse Solver: QRSolver" in rep
