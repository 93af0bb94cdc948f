"""Geometric multigrid built from public internals (test/gmg.jl used at
runtests.jl:104-109) — proves Level/MultiLevel/setup_smoother_host are a
usable extension API.  Pinned: 10 levels for poisson(10^6)."""

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.multilevel import Level, MultiLevel
from algebraicmultigrid_tpu.models.relax import setup_smoother_host


def _linear_interp_P(size_F):
    # 1-D full-weighting prolongator, even/odd split (gmg.jl:20-42, 0-based)
    size_C = (size_F - 1) // 2 + 1 if size_F % 2 == 0 else (size_F - 1) // 2
    k = np.arange(1, size_C + 1)
    rows1, cols1, vals1 = 2 * k - 1, k - 1, np.ones(size_C)
    k = np.arange(1, size_C)
    rows2 = np.concatenate([2 * k, 2 * k])
    cols2 = np.concatenate([k - 1, k])
    vals2 = np.full(2 * (size_C - 1), 0.5)
    P = sp.coo_matrix(
        (
            np.concatenate([vals1, vals2]),
            (np.concatenate([rows1, rows2]), np.concatenate([cols1, cols2])),
        ),
        shape=(size_F, size_C),
    ).tocsr()
    return P


def geometric_multigrid(A, max_levels=10, max_coarse=10, smoother=None):
    smoother = smoother or amg.GaussSeidel()
    A = sp.csr_matrix(A)
    levels = []
    while len(levels) + 1 < max_levels and A.shape[0] > max_coarse:
        P = _linear_interp_P(A.shape[0])
        R = sp.csr_matrix(P.T)
        pre = setup_smoother_host(smoother, A, amg.HermitianSymmetry())
        post = setup_smoother_host(smoother, A, amg.HermitianSymmetry())
        levels.append(
            Level(A=A, P=P, R=R, presmoother=pre, postsmoother=post,
                  presmoother_config=smoother, postsmoother_config=smoother)
        )
        A = sp.csr_matrix(R @ A @ P)
    return MultiLevel(levels, A, amg.Pinv(A))


@pytest.mark.slow
def test_gmg_poisson_1e6_levels():
    ml = geometric_multigrid(amg.poisson(10**6))
    assert len(ml) == 10


def test_gmg_small_solve():
    A = amg.poisson(2**10)
    ml = geometric_multigrid(A)
    b = A @ np.ones(A.shape[0])
    x = amg.solve_mg(ml, b, reltol=1e-10)
    assert np.allclose(x, 1.0, atol=1e-6)
