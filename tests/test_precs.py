"""Coarse-solver wrappers + Krylov preconditioner builders
(reference coarse_solver.jl:24-58, precs.jl:7-38, test/runtests.jl:126,227-240)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import algebraicmultigrid_tpu as amg


def test_linear_solve_wrapper_splu():
    # runtests.jl:126 — LinearSolveWrapper(UMFPACKFactorization()) as the
    # coarse solver; splu is the scipy analogue.
    A = amg.poisson(1000)
    wrapper = amg.LinearSolveWrapper(lambda M: spla.splu(M.tocsc()))
    ml = amg.ruge_stuben(A, coarse_solver=wrapper)
    x = amg.solve_mg(ml, A @ np.ones(1000))
    assert np.sum((x - 1) ** 2) < 1e-8


def test_splu_solver_direct():
    A = amg.poisson(500)
    ml = amg.ruge_stuben(A, coarse_solver=amg.SpluSolver)
    x = amg.solve_mg(ml, A @ np.ones(500))
    assert np.sum((x - 1) ** 2) < 1e-8


def test_linear_solve_wrapper_multi_rhs():
    # per-RHS-column loop (coarse_solver.jl:47-53)
    A = amg.poisson(10)
    cs = amg.LinearSolveWrapper(lambda M: spla.splu(M.tocsc()))(A)
    B = np.stack([A @ np.ones(10), A @ np.arange(10.0)], axis=1)
    X = cs.apply(B)
    assert X.shape == (10, 2)
    assert np.allclose(A @ X[:, 0], B[:, 0])
    assert np.allclose(A @ X[:, 1], B[:, 1])


@pytest.mark.parametrize(
    "builder_cls, kwargs",
    [
        (amg.RugeStubenPreconBuilder, {}),
        (amg.SmoothedAggregationPreconBuilder, {}),
        (amg.RugeStubenPreconBuilder, {"max_levels": 3}),
    ],
)
def test_precon_builders_with_cg(builder_cls, kwargs):
    # precs.jl contract: builder(A, p) -> (preconditioner, I); the left
    # preconditioner drives CG to tolerance (runtests.jl:227-240).
    A = amg.poisson((30, 30))
    n = A.shape[0]
    b = A @ np.ones(n)
    builder = builder_cls(**kwargs)
    M, right = builder(A, None)
    assert right.apply(b) is b  # identity right preconditioner
    x, res = amg.cg(A, b, M=M, tol=1e-8, log=True)
    assert res[-1] < 1e-8 * np.linalg.norm(b)
    assert np.allclose(x, 1.0, atol=1e-6)


def test_precon_builder_blocksize_kwargs_repr():
    b = amg.SmoothedAggregationPreconBuilder(blocksize=2, max_levels=4)
    assert "blocksize=2" in repr(b)
    assert "max_levels=4" in repr(b)
