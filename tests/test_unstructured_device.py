"""Device-engine solves of UNSTRUCTURED matrices (the reference's bread and
butter — multilevel.jl:214-239 works on any SparseMatrixCSC).

The device hierarchy must lower scrambled/mesh-free matrices to the BSG
gather tier (via a folded RCM basis) instead of the slow padded-ELL
fallback, and the solves must agree with the host engine.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.device import build_device_hierarchy, cg_device, solve_device
from algebraicmultigrid_tpu.ops.bsg import BSG


def _scrambled_poisson(nx, ny, seed=0):
    A = sp.csr_matrix(amg.poisson((nx, ny)))
    rng = np.random.default_rng(seed)
    p = rng.permutation(A.shape[0])
    return A[p][:, p].tocsc(), p


@pytest.fixture(scope="module")
def scrambled():
    A, p = _scrambled_poisson(48, 48, seed=1)
    ml = amg.smoothed_aggregation(A)
    return A, ml


def test_bsg_level_selected(scrambled):
    # small scrambled matrices fit a natural-order window — BSG, no perm
    A, ml = scrambled
    h = build_device_hierarchy(ml, dtype=jnp.float32)
    assert isinstance(h.levels[0].A, BSG), type(h.levels[0].A)


def test_rcm_basis_adopted_and_inverted():
    # big enough that the natural-order span exceeds the ws=64 cap: the
    # lowering must adopt the RCM basis and fold it into P/R/entry/exit
    A, _ = _scrambled_poisson(96, 96, seed=2)
    ml = amg.smoothed_aggregation(A)
    h = build_device_hierarchy(ml, dtype=jnp.float32)
    assert isinstance(h.levels[0].A, BSG)
    assert h.perm0 is not None and h.iperm0 is not None
    n = A.shape[0]
    pp, ip = np.asarray(h.perm0)[:n], np.asarray(h.iperm0)[:n]
    np.testing.assert_array_equal(pp[ip], np.arange(n))
    # the solve must come back in the CALLER's ordering: residual check in
    # the original basis catches any entry/exit mix-up
    b = A @ np.ones(n)
    x, iters, normr = cg_device(ml, b, tol=1e-4, maxiter=60, log=True)
    assert np.linalg.norm(A @ x.astype(np.float64) - b) <= 1e-3 * np.linalg.norm(b)


def test_unstructured_device_solve_matches_host(scrambled):
    A, ml = scrambled
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = A @ rng.standard_normal(n)
    x_host = amg.solve_mg(ml, b, reltol=1e-6)
    x_dev = solve_device(ml, b, reltol=1e-6, dtype=jnp.float32)
    r_host = np.linalg.norm(A @ x_host - b)
    r_dev = np.linalg.norm(A @ x_dev.astype(np.float64) - b)
    # device engine runs f32: require the same order of convergence
    assert r_dev <= max(10 * r_host, 5e-4 * np.linalg.norm(b))


def test_unstructured_device_pcg(scrambled):
    A, ml = scrambled
    n = A.shape[0]
    b = np.ones(n)
    x, iters, normr = cg_device(ml, b, tol=1e-5, log=True)
    assert normr <= 1e-5 * np.linalg.norm(b) * 1.01
    assert np.linalg.norm(A @ x.astype(np.float64) - b) <= 2e-4 * np.linalg.norm(b)
    assert iters < 60


def test_unstructured_solve_logged_path(scrambled):
    # the observed (log=True) driver permutes/unpermutes around the loop
    A, ml = scrambled
    n = A.shape[0]
    b = np.ones(n)
    x, residuals = solve_device(ml, b, reltol=1e-5, log=True, dtype=jnp.float32)
    assert residuals[-1] < residuals[0]
    assert np.linalg.norm(A @ x.astype(np.float64) - b) <= 1e-3 * np.linalg.norm(b)


def test_randlap_device_solve(randlap):
    # VERDICT fixture: the n=100 random Laplacian solves on the device
    # engine (dense tier at this size) — singular, so compare via residual
    # against the host's converged iterate
    A = randlap + 1e-8 * sp.eye(randlap.shape[0])
    ml = amg.ruge_stuben(A.tocsc())
    n = A.shape[0]
    # NB: ones spans the Laplacian's null space — use a random target
    b = A @ np.random.default_rng(0).standard_normal(n)
    x, iters, normr = cg_device(ml, b, tol=1e-5, maxiter=100, log=True)
    assert np.linalg.norm(A @ x.astype(np.float64) - b) <= 1e-4 * np.linalg.norm(b)


def test_elasticity_device_solve(lin_elastic_2d):
    # VERDICT fixture: 2-D linear elasticity with rigid-body near-null-space
    A, B, b = lin_elastic_2d
    ml = amg.smoothed_aggregation(A, B=B)
    x, iters, normr = cg_device(ml, b, tol=1e-6, maxiter=400, log=True)
    assert np.linalg.norm(A @ x.astype(np.float64) - b) <= 1e-5 * np.linalg.norm(b)


@pytest.mark.multichip
def test_unstructured_sharded_solve():
    # the row-shard tier must carry the RCM basis through entry/exit
    # (BSG levels ride replicated; transfers/ELL shard) — result must match
    # the single-device engine's convergence on the ORIGINAL ordering
    from algebraicmultigrid_tpu.parallel.dist import make_row_mesh, solve_sharded

    A, _ = _scrambled_poisson(96, 96, seed=2)
    ml = amg.smoothed_aggregation(A)
    n = A.shape[0]
    b = A @ np.ones(n)
    mesh = make_row_mesh(8)
    x_sh, iters, normres = solve_sharded(ml, b, amg.V(), mesh=mesh, reltol=1e-5)
    assert normres <= 1e-5 * np.linalg.norm(b) * 1.01
    r = np.linalg.norm(A @ x_sh.astype(np.float64) - b) / np.linalg.norm(b)
    assert r <= 5e-5, r
