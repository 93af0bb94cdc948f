"""Structured (proxy-extrapolated) setup — exactness and fallback contracts.

The fast path must be *invisible* semantically: hierarchies it produces match
the generic StructuredRS path bitwise (level sizes, nnz, and values), and
anything it can't extract falls back to the generic machinery.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.fastsetup import structured_ruge_stuben
from algebraicmultigrid_tpu.models.lattice import (
    LatticeProblem,
    extract_spec,
    lattice_coloring,
)

FIVE_POINT = np.array([[0.0, -1.0, 0.0], [-1.0, 4.0, -1.0], [0.0, -1.0, 0.0]])
NINE_POINT = np.array([[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]])


@pytest.mark.parametrize("dims", [(7, 5), (64, 64), (33, 17), (16, 40)])
@pytest.mark.parametrize("stencil", [FIVE_POINT, NINE_POINT])
def test_lattice_problem_equals_stencil_grid(dims, stencil):
    LP = LatticeProblem(stencil, dims)
    G = amg.stencil_grid(stencil, dims)
    D = (LP.tocsr() - G).tocoo()
    assert D.nnz == 0 or np.abs(D.data).max() == 0
    assert LP.nnz == G.nnz
    x = np.random.default_rng(0).standard_normal(LP.shape[1])
    assert np.allclose(LP @ x, G @ x, atol=1e-13)
    assert np.allclose(LP.diagonal(), G.diagonal())


def test_poisson_lattice_kwarg():
    LP = amg.poisson((32, 32), lattice=True)
    assert isinstance(LP, LatticeProblem)
    D = (LP.tocsr() - amg.poisson((32, 32))).tocoo()
    assert D.nnz == 0 or np.abs(D.data).max() == 0
    LP1 = amg.poisson(50, lattice=True)
    D1 = (LP1.tocsr() - amg.poisson(50)).tocoo()
    assert D1.nnz == 0 or np.abs(D1.data).max() == 0


def test_extract_spec_roundtrip_all_levels():
    P = 64
    gs = amg.GaussSeidel(ordering="multicolor")
    ml = amg.ruge_stuben(
        amg.poisson((P, P)), CF=amg.StructuredRS(), presmoother=gs, postsmoother=gs
    )
    # level 0: extraction reproduces A exactly (verify=True round-trips inside)
    s = extract_spec(sp.csr_matrix(ml.levels[0].A), (P, P), (P, P))
    assert s is not None
    assert s.nnz() == ml.levels[0].A.nnz
    x = np.random.default_rng(1).standard_normal(P * P)
    assert np.allclose(s.matvec(x), ml.levels[0].A @ x, atol=1e-12)


def _hierarchies_equal(ml_f, ml_g, n_levels=None):
    n_levels = len(ml_f.levels) if n_levels is None else n_levels
    assert [l.A.shape[0] for l in ml_f.levels] == [l.A.shape[0] for l in ml_g.levels]
    assert [l.A.nnz for l in ml_f.levels] == [l.A.nnz for l in ml_g.levels]
    for i in range(n_levels):
        Af = ml_f.levels[i].A
        Af = Af.tocsr() if hasattr(Af, "tocsr") else sp.csr_matrix(Af)
        D = (Af - sp.csr_matrix(ml_g.levels[i].A)).tocoo()
        assert D.nnz == 0 or np.abs(D.data).max() == 0, f"A differs at level {i}"
        for attr in ("P", "R"):
            Mf = getattr(ml_f.levels[i], attr)
            Mf = Mf.tocsr() if hasattr(Mf, "tocsr") else sp.csr_matrix(Mf)
            D = (Mf - sp.csr_matrix(getattr(ml_g.levels[i], attr))).tocoo()
            assert D.nnz == 0 or np.abs(D.data).max() == 0, f"{attr} differs at level {i}"


def test_fast_setup_matches_generic_bitwise():
    N = 256
    LP = amg.poisson((N, N), lattice=True)
    ml_f = structured_ruge_stuben(LP, proxy=64, cut_rows=8000)
    gs = amg.GaussSeidel(ordering="multicolor")
    ml_g = amg.ruge_stuben(
        amg.poisson((N, N)), CF=amg.StructuredRS(), presmoother=gs, postsmoother=gs
    )
    assert len(ml_f) == len(ml_g)
    _hierarchies_equal(ml_f, ml_g)
    assert abs(ml_f.operator_complexity() - ml_g.operator_complexity()) < 1e-12
    assert abs(ml_f.grid_complexity() - ml_g.grid_complexity()) < 1e-12


def test_fast_setup_host_solve_converges():
    N = 256
    LP = amg.poisson((N, N), lattice=True)
    ml = structured_ruge_stuben(LP, proxy=64, cut_rows=8000)
    b = LP @ np.ones(N * N)
    x, res = amg.solve_mg(ml, b, reltol=1e-8, log=True)
    assert res[-1] < 1e-8 * res[0]
    assert np.abs(x - 1).max() < 1e-6


def test_fast_setup_small_problem_falls_back():
    # small problems short-circuit to the generic path (no proxy overhead)
    LP = amg.poisson((40, 40), lattice=True)
    ml = structured_ruge_stuben(LP)
    gs = amg.GaussSeidel(ordering="multicolor")
    ml_g = amg.ruge_stuben(
        amg.poisson((40, 40)), CF=amg.StructuredRS(), presmoother=gs, postsmoother=gs
    )
    assert [l.A.shape[0] for l in ml.levels] == [l.A.shape[0] for l in ml_g.levels]


def test_ruge_stuben_dispatches_lattice_input():
    LP = amg.poisson((64, 64), lattice=True)
    gs = amg.GaussSeidel(ordering="multicolor")
    ml = amg.ruge_stuben(LP, CF=amg.StructuredRS(), presmoother=gs, postsmoother=gs)
    ml_g = amg.ruge_stuben(
        amg.poisson((64, 64)), CF=amg.StructuredRS(), presmoother=gs, postsmoother=gs
    )
    assert [l.A.shape[0] for l in ml.levels] == [l.A.shape[0] for l in ml_g.levels]
    # non-structured CF on lattice input assembles and runs the generic path
    ml_rs = amg.ruge_stuben(LP, CF=amg.RS())
    ml_rs_g = amg.ruge_stuben(amg.poisson((64, 64)), CF=amg.RS())
    assert [l.A.shape[0] for l in ml_rs.levels] == [
        l.A.shape[0] for l in ml_rs_g.levels
    ]


def test_lattice_coloring_proper():
    P = 64
    gs = amg.GaussSeidel(ordering="multicolor")
    ml = amg.ruge_stuben(
        amg.poisson((P, P)), CF=amg.StructuredRS(), presmoother=gs, postsmoother=gs
    )
    for lvl in range(2):
        A = sp.csr_matrix(ml.levels[lvl].A)
        dims = [(P, P), (P, P // 2)][lvl]
        s = extract_spec(A, dims, dims)
        assert s is not None
        grid, n_colors = lattice_coloring(s)
        a, b = grid.shape
        Wx, Wy = dims
        colors = grid[
            (np.arange(Wx) % a)[:, None], (np.arange(Wy) % b)[None, :]
        ].ravel()
        # proper coloring: no stored off-diagonal entry connects same colors
        C = A.tocoo()
        off = C.row != C.col
        assert not (colors[C.row[off]] == colors[C.col[off]]).any()
        assert n_colors <= 4


def test_fast_setup_device_solve_small():
    # device engine on a lattice hierarchy (small, CPU-backend-compileable)
    N = 64
    LP = amg.poisson((N, N), lattice=True)
    ml = structured_ruge_stuben(LP, proxy=32, cut_rows=500, min_proxy_dim=8)
    b = LP @ np.ones(N * N)
    x = ml.solve(b, engine="jax", reltol=1e-8, dtype="float64")
    assert np.abs(x - 1).max() < 1e-6
