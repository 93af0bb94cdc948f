"""N-D lattice fast path (models/lattice_nd.py): spec round-trips, the
proxy-extrapolated 3-D SA driver vs the generic pipeline, periodic
coloring, and the device engine on LatND operators.

Reference scope: the gallery is N-D (gallery.jl:42-61); hierarchy semantics
must match ``smoothed_aggregation(A, aggregate=BoxAggregationND(...))``
exactly on the fast levels.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.lattice_nd import (
    BoxAggregationND,
    LatticeProblemND,
    extract_spec_nd,
    lattice_coloring_nd,
    structured_smoothed_aggregation_nd,
)


def _poisson_stencil(N):
    st = np.zeros((3,) * N)
    centre = (1,) * N
    for d in range(N):
        for off in (-1, 1):
            idx = list(centre)
            idx[d] += off
            st[tuple(idx)] = -1
    st[centre] = 2 * N
    return st


def test_problem_nd_matvec_matches_csr():
    dims = (7, 6, 5)
    P = LatticeProblemND(_poisson_stencil(3), dims)
    A = P.tocsr()
    # structural sanity: symmetric 7-point operator with clipped boundaries
    assert (A != A.T).nnz == 0
    assert A.diagonal().min() == 6.0
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    np.testing.assert_allclose(P @ x, A @ x, rtol=1e-13)
    # row sums: interior rows annihilate constants (stencil sums to 0)
    rs = np.asarray(A.sum(axis=1)).ravel().reshape(dims)
    assert np.all(rs[1:-1, 1:-1, 1:-1] == 0)


def test_extract_spec_nd_roundtrip():
    dims = (13, 11, 9)
    A = LatticeProblemND(_poisson_stencil(3), dims).tocsr()
    spec = extract_spec_nd(A, dims, dims, min_margin=0)
    assert spec is not None
    R = spec.tocsr()
    assert (R != A).nnz == 0
    # nnz bookkeeping is exact
    assert spec.nnz() == A.nnz


def test_coloring_nd_is_proper():
    dims = (12, 12, 12)
    P = LatticeProblemND(_poisson_stencil(3), dims)
    tab, nc = lattice_coloring_nd(P.spec)
    assert nc == 2  # 7-point stencil is red-black colorable
    # propriety on the torus: every nonzero offset changes the color
    periods = tab.shape
    for d in P.spec.offsets:
        if all(v == 0 for v in d):
            continue
        for cell in np.ndindex(*periods):
            nb = tuple((cell[a] + d[a]) % periods[a] for a in range(3))
            assert tab[cell] != tab[nb]


@pytest.fixture(scope="module")
def nd_pair():
    dims = (45, 45, 45)
    prob = amg.poisson(dims, lattice=True)
    ml_fast = structured_smoothed_aggregation_nd(
        prob, proxy=12, cut_rows=2000, min_proxy_dim=9, box=3
    )
    A_csr = prob.tocsr()
    ml_gen = amg.smoothed_aggregation(
        A_csr,
        aggregate=BoxAggregationND(dims, 3),
        improve_candidates=amg.Jacobi(omega=0.5, iter=4),
        presmoother=amg.GaussSeidel(ordering="multicolor"),
        postsmoother=amg.GaussSeidel(ordering="multicolor"),
    )
    return dims, prob, ml_fast, ml_gen


def test_nd_fastpath_matches_generic(nd_pair):
    dims, prob, ml_fast, ml_gen = nd_pair
    assert len(ml_fast) == len(ml_gen)
    from algebraicmultigrid_tpu.models.lattice_nd import LatticeMatrixND

    assert isinstance(ml_fast.levels[0].A, LatticeMatrixND), "fast level expected"
    for lf, lg in zip(ml_fast.levels, ml_gen.levels):
        assert lf.A.shape == lg.A.shape
        D = (sp.csr_matrix(lf.P.tocsr() if hasattr(lf.P, "tocsr") else lf.P)
             - sp.csr_matrix(lg.P)).tocoo()
        assert D.nnz == 0 or np.abs(D.data).max() == 0, "P must match exactly"
        DA = (sp.csr_matrix(lf.A.tocsr() if hasattr(lf.A, "tocsr") else lf.A)
              - sp.csr_matrix(lg.A)).tocoo()
        assert DA.nnz == 0 or np.abs(DA.data).max() == 0, "A must match exactly"
    # complexity metrics carry over (survey §5.5 pinned quantities)
    assert abs(ml_fast.operator_complexity() - ml_gen.operator_complexity()) < 1e-12


def test_nd_host_solve(nd_pair):
    dims, prob, ml_fast, _ = nd_pair
    n = int(np.prod(dims))
    b = prob @ np.ones(n)
    x = amg.solve_mg(ml_fast, b, reltol=1e-8)
    assert np.linalg.norm(prob @ x - b) <= 1e-6 * np.linalg.norm(b)


def test_nd_device_solve(nd_pair):
    dims, prob, ml_fast, _ = nd_pair
    from algebraicmultigrid_tpu.models.device import build_device_hierarchy, cg_device
    from algebraicmultigrid_tpu.ops.lattice_nd_op import LatND

    h = build_device_hierarchy(ml_fast, dtype=jnp.float32)
    assert isinstance(h.levels[0].A, LatND), type(h.levels[0].A)
    n = int(np.prod(dims))
    b = prob @ np.ones(n)
    x, iters, normr = cg_device(ml_fast, b, tol=1e-6, maxiter=60, log=True)
    r = np.linalg.norm(prob @ x.astype(np.float64) - b) / np.linalg.norm(b)
    assert r <= 1e-5, (r, iters)
    assert iters <= 30


def test_latnd_bf16_coefficient_planes(monkeypatch):
    # AMG_COEF_DTYPE=bfloat16 stores the planes narrow; vectors stay f32
    from algebraicmultigrid_tpu.ops.lattice_nd_op import latnd_from_spec, latnd_spmv

    P = LatticeProblemND(_poisson_stencil(3), (12, 10, 8))
    A32 = latnd_from_spec(P.spec, jnp.float32)
    monkeypatch.setenv("AMG_COEF_DTYPE", "bfloat16")
    A16 = latnd_from_spec(P.spec, jnp.float32)
    assert A16.data.dtype == jnp.bfloat16 and A16.dtype == jnp.float32
    x = jnp.asarray(np.random.default_rng(0).standard_normal(P.shape[0]).astype(np.float32))
    y32 = np.asarray(latnd_spmv(A32, x))
    y16 = np.asarray(latnd_spmv(A16, x))
    assert y16.dtype == np.float32
    np.testing.assert_allclose(y16, y32, rtol=1e-2, atol=1e-2 * np.abs(y32).max())


@pytest.mark.parametrize("cycle", ["w", "f"])
def test_nd_device_wf_cycles(nd_pair, cycle):
    # the device engine's W/F recursion applies unchanged to LatND levels
    dims, prob, ml_fast, _ = nd_pair
    from algebraicmultigrid_tpu.models.device import solve_device

    n = int(np.prod(dims))
    b = prob @ np.ones(n)
    cyc = amg.W() if cycle == "w" else amg.F()
    x, res = solve_device(ml_fast, b, cyc, reltol=1e-6, log=True, dtype=jnp.float32)
    assert res[-1] <= 1e-6 * np.linalg.norm(b) * 1.01
    assert np.linalg.norm(prob @ x.astype(np.float64) - b) <= 1e-4 * np.linalg.norm(b)
