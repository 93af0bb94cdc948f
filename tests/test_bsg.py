"""BSG (block-select gather) — builder + kernel cross-checks.

The Pallas kernel (interpret mode on CPU; compiled on TPU) must reproduce
the numpy oracle bit-for-bit, and both must match scipy's SpMV to f32
rounding, on the matrix classes the unstructured tier targets (RCM'd
scrambled meshes, elasticity-like blocks, small random graphs).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.ops.bsg import (
    bsg_from_csr,
    bsg_spmv,
    bsg_spmv_reference,
    rcm_permutation,
)


def _rcm_scrambled(A, seed=0):
    A = sp.csr_matrix(A)
    rng = np.random.default_rng(seed)
    p = rng.permutation(A.shape[0])
    Ap = A[p][:, p].tocsr()
    pi = rcm_permutation(Ap)
    return Ap[pi][:, pi].tocsr()


def _check(A, B, seed=0, atol_scale=1e-5):
    n, nc = A.shape
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(nc).astype(np.float32)
    y_sp = (A.astype(np.float32) @ x).astype(np.float32)
    y_np = bsg_spmv_reference(B, x)[:n]
    np.testing.assert_allclose(
        y_np, y_sp, rtol=2e-5, atol=atol_scale * max(np.abs(y_sp).max(), 1.0)
    )
    xin = jnp.asarray(np.pad(x, (0, max(B.cols_padded, B.rows_padded) - nc)))
    y_k = np.asarray(bsg_spmv(B, xin))[:n]
    # identical gather semantics; XLA may contract mul+add into FMA, so the
    # kernel can differ from the non-FMA numpy oracle by ~1 ulp per term
    np.testing.assert_allclose(
        y_k, y_np, rtol=1e-5, atol=2e-6 * max(np.abs(y_np).max(), 1.0)
    )


@pytest.mark.parametrize("grid", [(48, 48), (13, 11, 9)])
def test_bsg_matches_scipy_meshes(grid):
    A = _rcm_scrambled(amg.poisson(grid), seed=len(grid))
    B = bsg_from_csr(A)
    assert B is not None, "RCM'd mesh must be BSG-viable"
    _check(A, B)


def test_bsg_elasticity_like():
    # 2 dofs per node on a 2-D grid: kron(poisson, 2x2 block) → 10+ nnz/row
    base = sp.csr_matrix(amg.poisson((24, 24)))
    blk = np.array([[2.0, 0.3], [0.3, 1.5]])
    A = _rcm_scrambled(sp.kron(base, blk).tocsr(), seed=9)
    B = bsg_from_csr(A)
    assert B is not None
    _check(A, B)


def test_bsg_small_random_graph():
    # randlap-class fixture: n=100 random sparse Laplacian
    rng = np.random.default_rng(42)
    M = sp.random(100, 100, density=0.06, random_state=np.random.RandomState(2))
    A = sp.csr_matrix(M + M.T)
    L = sp.csgraph.laplacian(A).tocsr()
    B = bsg_from_csr(L)
    assert B is not None
    _check(L, B)


def test_bsg_rectangular_transfer():
    # transfer-operator-like: fine rows, coarse columns, banded slope 1/2
    nf, nco = 3000, 1500
    rng = np.random.default_rng(3)
    rows = np.repeat(np.arange(nf), 3)
    cols = np.clip(rows // 2 + rng.integers(-40, 41, rows.shape[0]), 0, nco - 1)
    P = sp.coo_matrix(
        (rng.standard_normal(rows.shape[0]), (rows, cols)), shape=(nf, nco)
    ).tocsr()
    P.sum_duplicates()
    B = bsg_from_csr(P)
    assert B is not None
    _check(P, B)


def test_bsg_multi_rhs():
    A = _rcm_scrambled(amg.poisson((32, 32)), seed=5)
    B = bsg_from_csr(A)
    X = np.random.default_rng(1).standard_normal((B.rows_padded, 2)).astype(np.float32)
    Y = np.asarray(bsg_spmv(B, jnp.asarray(X)))
    for j in range(2):
        col = np.asarray(bsg_spmv(B, jnp.asarray(X[:, j])))
        np.testing.assert_array_equal(Y[:, j], col)  # same kernel per column


def test_bsg_rejects():
    A = _rcm_scrambled(amg.poisson((32, 32)), seed=2)
    # window cap too small for the span
    assert bsg_from_csr(A, ws_cap=4) is None
    # f64 has no 32-bit gather path
    assert bsg_from_csr(A, dtype=jnp.float64) is None
    # a row denser than the slot cap
    dense_row = sp.lil_matrix((2048, 2048))
    dense_row[0, :100] = 1.0
    M = sp.csr_matrix(dense_row) + sp.eye(2048)
    assert bsg_from_csr(M, K_cap=64) is None
    # storage overhead guard: one dense-ish row inflates K for every tile
    wide = sp.csr_matrix(sp.eye(20000) + sp.diags(np.ones(19000), 1000))
    r = sp.lil_matrix((20000, 20000))
    r[0, :40] = 1.0
    M2 = (wide + sp.csr_matrix(r)).tocsr()
    assert bsg_from_csr(M2, max_overhead=3.0) is None
