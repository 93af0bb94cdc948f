"""Solver convergence contracts (test/runtests.jl:112-141,
test/cycle_tests.jl:6-30) on both engines."""

import numpy as np
import pytest

import algebraicmultigrid_tpu as amg


def test_rs_vcycle_poisson1000():
    A = amg.poisson(1000)
    ml = amg.ruge_stuben(A)
    x = amg.solve_mg(ml, A @ np.ones(1000))
    assert np.sum((x - 1) ** 2) < 1e-8


def test_rs_forward_sweep_poisson1000():
    fsmoother = amg.GaussSeidel(amg.ForwardSweep())
    A = amg.poisson(1000)
    ml = amg.ruge_stuben(A, presmoother=fsmoother, postsmoother=fsmoother)
    x = amg.solve_mg(ml, A @ np.ones(1000))
    assert np.sum((x - 1) ** 2) < 1e-8


def test_randlap_solves(randlap):
    # b = A·1 = 0 for a Laplacian; solution from zero guess stays ~0
    fsmoother = amg.GaussSeidel(amg.ForwardSweep())
    ml = amg.ruge_stuben(randlap, presmoother=fsmoother, postsmoother=fsmoother)
    x = amg.solve_mg(ml, randlap @ np.ones(100))
    assert np.sum(x**2) < 1e-8
    ml = amg.ruge_stuben(randlap)
    x = amg.solve_mg(ml, randlap @ np.ones(100))
    assert np.sum(x**2) < 1e-6


@pytest.mark.parametrize("setup", [amg.ruge_stuben, amg.smoothed_aggregation])
@pytest.mark.parametrize("cycle", [amg.V(), amg.W(), amg.F()])
def test_cycles_standalone_and_preconditioned(setup, cycle):
    # cycle_tests.jl:6-30 on poisson((50,50))
    A = amg.poisson((50, 50))
    n = A.shape[0]
    b = A @ np.ones(n)
    ml = setup(A)
    x, res = amg.solve_mg(ml, b, cycle, reltol=1e-8, log=True)
    assert res[-1] < 1e-8 * np.linalg.norm(b)

    p = amg.aspreconditioner(ml, cycle)
    xc, rc = amg.cg(A, b, M=p, tol=1e-8, log=True)
    assert rc[-1] < 1e-8 * np.linalg.norm(b)
    assert np.allclose(xc, 1.0, atol=1e-6)


@pytest.mark.parametrize("cycle", [amg.V(), amg.W(), amg.F()])
def test_device_engine_matches_host(cycle):
    A = amg.poisson((20, 20))
    n = A.shape[0]
    b = A @ np.ones(n)
    ml = amg.ruge_stuben(A)
    xh, rh = amg.solve_mg(ml, b, cycle, reltol=1e-8, log=True)
    xd, rd = ml.solve(b, cycle, engine="jax", reltol=1e-8, log=True)
    assert len(rh) == len(rd)  # identical iteration counts
    assert np.allclose(xh, xd, atol=1e-10)


def test_device_fused_loop():
    A = amg.poisson((20, 20))
    b = A @ np.ones(A.shape[0])
    ml = amg.smoothed_aggregation(A)
    xd = ml.solve(b, amg.V(), engine="jax", reltol=1e-8)
    assert np.allclose(xd, 1.0, atol=1e-6)


def test_device_multicolor_converges():
    gs = amg.GaussSeidel(ordering="multicolor")
    A = amg.poisson((20, 20))
    b = A @ np.ones(A.shape[0])
    ml = amg.ruge_stuben(A, presmoother=gs, postsmoother=gs)
    x, res = ml.solve(b, amg.V(), engine="jax", reltol=1e-8, log=True)
    assert res[-1] < 1e-8 * np.linalg.norm(b)
    assert len(res) - 1 <= 20


def test_multi_rhs():
    A = amg.poisson(400)
    X = np.stack([np.ones(400), np.linspace(0, 1, 400)], axis=1)
    B = A @ X
    ml = amg.ruge_stuben(A)
    xh = amg.solve_mg(ml, B, reltol=1e-10)
    assert np.allclose(xh, X, atol=1e-6)
    xd = ml.solve(B, engine="jax", reltol=1e-10)
    assert np.allclose(xd, X, atol=1e-6)


def test_solve_api():
    # CommonSolve-style one-call path (multilevel.jl:252-264)
    A = amg.poisson(1000)
    b = A @ np.ones(1000)
    x = amg.solve(A, b, amg.RugeStubenAMG(), maxiter=100)
    assert np.sum((x - 1) ** 2) < 1e-8
    x = amg.solve(A, b, amg.SmoothedAggregationAMG(), maxiter=100)
    assert np.sum((x - 1) ** 2) < 1e-6


def test_log_and_verbose(capsys):
    A = amg.poisson(100)
    b = A @ np.ones(100)
    ml = amg.ruge_stuben(A)
    x, res = amg.solve_mg(ml, b, log=True, verbose=True)
    assert res[0] == np.linalg.norm(b)
    assert all(np.diff(np.log10(np.array(res[:-1]) + 1e-300)) < 0)
    assert "Norm of residual" in capsys.readouterr().out


def test_3d_poisson_solves():
    """N-D gallery parity (ref gallery.jl:1-63 supports poisson((nx,ny,nz)));
    both setup families must converge on a 3-D operator through the generic
    (non-lattice) pipeline."""
    import numpy as np
    import algebraicmultigrid_tpu as amg

    A = amg.poisson((10, 10, 10))
    n = A.shape[0]
    b = A @ np.ones(n)
    for build in (amg.ruge_stuben, amg.smoothed_aggregation):
        ml = build(A)
        x, res = amg.solve_mg(ml, b, reltol=1e-8, log=True)
        assert np.linalg.norm(b - A @ x) <= 1e-8 * np.linalg.norm(b) * 1.01
        assert np.abs(x - 1).max() < 1e-6


def test_solve_refined_device_outer_loop():
    """Device-resident iterative refinement (scoped x64): matches the host
    outer loop, accepts a device-resident b, and can return the f64 device
    solution without a download — the serving-path contract bench.py times."""
    import jax
    import jax.numpy as jnp

    from algebraicmultigrid_tpu.models.device import _get_fine_f64, solve_refined

    N = 64
    LP = amg.poisson((N, N), lattice=True)
    ml = amg.structured_smoothed_aggregation(
        LP, proxy=32, cut_rows=2000, min_proxy_dim=16,
        aggregate=amg.StructuredAggregation(box=3),
    )
    n = N * N
    b = np.random.default_rng(5).standard_normal(n)
    assert _get_fine_f64(ml) is not None  # device outer loop engages

    x, hist = solve_refined(ml, b, tol=1e-10, log=True)
    A = ml.levels[0].A
    assert np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b) < 1e-10

    with jax.enable_x64(True):
        bd = jnp.asarray(b)
    xd, hist_d = solve_refined(ml, bd, tol=1e-10, log=True, return_device=True)
    assert isinstance(xd, jax.Array) and xd.dtype == jnp.float64
    assert np.allclose(np.asarray(xd), x, rtol=0, atol=0)  # identical loop
    assert hist_d == hist
