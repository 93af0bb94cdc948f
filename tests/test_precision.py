"""Eltype-propagation and index-dtype conformance.

Mirrors the reference's Precision testset (test/runtests.jl:244-259) —
``eltype(_solve(ml, b)) == promote(eltype(A), eltype(b))`` across all four
Float32/Float64 combinations — and the Int32-index testset
(test/sa_tests.jl:424-427).
"""

import math

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg


@pytest.mark.parametrize(
    "T,V",
    [
        (np.float64, np.float64),
        (np.float32, np.float32),
        (np.float64, np.float32),
        (np.float32, np.float64),
    ],
)
def test_mixed_precision_propagation(T, V):
    a = amg.poisson(100).astype(T)
    rng = np.random.default_rng(0)
    b = rng.random(a.shape[0]).astype(V)
    ml = amg.smoothed_aggregation(a)
    x = amg.solve_mg(ml, b)
    assert x.dtype == np.promote_types(T, V)
    # and the solve actually converged to the default reltol (√eps of b's
    # dtype — multilevel.jl:166) in the promoted precision
    tol = math.sqrt(np.finfo(V).eps)
    assert np.linalg.norm((a @ x - b).astype(np.float64)) <= 10 * tol * np.linalg.norm(b)


def test_setup_preserves_f32_eltype():
    a = amg.poisson(100).astype(np.float32)
    for setup in (amg.smoothed_aggregation, amg.ruge_stuben):
        ml = setup(a)
        for lvl in ml.levels:
            assert lvl.A.dtype == np.float32
        assert ml.final_A.dtype == np.float32


@pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
def test_index_dtype_support(idx_dtype):
    # sa_tests.jl:424-427 builds a sparse diagonal with Int32 indices and
    # checks smoothed_aggregation accepts it (type stability is a Julia-only
    # concern; the behavioural contract is "setup works for any index type").
    rng = np.random.default_rng(1)
    d = rng.random(10)
    A = sp.csc_matrix(
        (d, np.arange(10, dtype=idx_dtype), np.arange(11, dtype=idx_dtype)),
        shape=(10, 10),
    )
    ml = amg.smoothed_aggregation(A)
    b = rng.random(10)
    x = amg.solve_mg(ml, b)
    assert np.allclose(A @ x, b, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("idx_dtype", [np.int32, np.int64])
def test_index_dtype_poisson_hierarchy(idx_dtype):
    # a non-trivial hierarchy with explicitly-typed indices for both setups
    A = amg.poisson(200).tocsc()
    A = sp.csc_matrix(
        (A.data, A.indices.astype(idx_dtype), A.indptr.astype(idx_dtype)),
        shape=A.shape,
    )
    for setup in (amg.smoothed_aggregation, amg.ruge_stuben):
        ml = setup(A)
        assert len(ml) > 1
        b = np.ones(200)
        x = amg.solve_mg(ml, b, reltol=1e-8)
        assert np.linalg.norm(A @ x - b) <= 1e-6 * np.linalg.norm(b)
