"""Whole-coarse-tail Pallas kernel (ops/pallas/tail_kernel.py) vs the
unfused device cycle — same hierarchy, same smoothers, interpret mode on CPU.

The tail kernel replays multilevel.jl:214-239's V-cycle recursion for every
tail level inside one kernel; these tests pin that its output matches the
op-by-op device path to fp tolerance and that solves still converge.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.device import build_device_hierarchy, _one_iteration


def _mk(n=192, dtype="float64"):
    # small grids take the generic (CSR) setup; force the lattice path with
    # a small proxy so levels come out as LatticeMatrix (cf. test_fused_legs)
    A = amg.poisson((n, n), lattice=True)
    ml = amg.structured_smoothed_aggregation(
        A, proxy=64, cut_rows=2000, min_proxy_dim=16,
        aggregate=amg.StructuredAggregation(box=3),
    )
    return A, ml


def _hier(ml, tail, dtype=jnp.float64):
    os.environ["AMG_PALLAS_TAIL"] = "1" if tail else "0"
    try:
        return build_device_hierarchy(ml, dtype=dtype)
    finally:
        os.environ.pop("AMG_PALLAS_TAIL", None)


def test_tail_cache_built():
    _, ml = _mk()
    h = _hier(ml, tail=True)
    assert h.tail is not None, "tail cache should build for box-3 lattice levels"
    # f64 planes for the 192² top level exceed the VMEM budget → start ≤ 1
    assert 0 <= h.tail_start <= 1
    assert len(h.tail.metas) == len(ml.levels) - h.tail_start


def test_tail_cycle_matches_unfused():
    A, ml = _mk()
    h0 = _hier(ml, tail=False)
    h1 = _hier(ml, tail=True)
    assert h1.tail is not None
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(h0.fine_padded))
    x = jnp.zeros_like(b)

    y0 = np.asarray(_one_iteration(h0, amg.V(), x, b))
    y1 = np.asarray(_one_iteration(h1, amg.V(), x, b))
    assert np.allclose(y0[:n], y1[:n], rtol=1e-11, atol=1e-11), (
        np.abs(y0[:n] - y1[:n]).max()
    )


def test_tail_partial_start():
    # force the tail to start below the top by shrinking max_rows
    _, ml = _mk()
    os.environ["AMG_PALLAS_TAIL"] = "1"
    os.environ["AMG_TAIL_MAX_ROWS"] = "5000"
    try:
        h = build_device_hierarchy(ml, dtype=jnp.float64)
    finally:
        os.environ.pop("AMG_PALLAS_TAIL", None)
        os.environ.pop("AMG_TAIL_MAX_ROWS", None)
    assert h.tail is not None and h.tail_start == 1
    h0 = _hier(ml, tail=False)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(h.fine_padded))
    x = jnp.zeros_like(b)
    y0 = np.asarray(_one_iteration(h0, amg.V(), x, b))
    y1 = np.asarray(_one_iteration(h, amg.V(), x, b))
    n = ml.levels[0].A.shape[0]
    assert np.allclose(y0[:n], y1[:n], rtol=1e-11, atol=1e-11)


def test_tail_solve_converges():
    A, ml = _mk()
    h1 = _hier(ml, tail=True)
    ml._device_cache[("hierarchy", "float64")] = h1
    n = A.shape[0]
    x_true = np.ones(n)
    b = A @ x_true
    from algebraicmultigrid_tpu.models.device import solve_device

    x, res = solve_device(ml, b, maxiter=30, reltol=1e-8, log=True)
    assert res[-1] / res[0] < 1e-8
    assert np.allclose(np.asarray(x), x_true, atol=1e-6)


def test_tail_w_cycle_falls_back():
    # W-cycles must bypass the tail kernel (it encodes V recursion) and
    # still match the unfused W-cycle exactly
    A, ml = _mk()
    h0 = _hier(ml, tail=False)
    h1 = _hier(ml, tail=True)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(h0.fine_padded))
    x = jnp.zeros_like(b)
    n = A.shape[0]
    y0 = np.asarray(_one_iteration(h0, amg.W(), x, b))
    y1 = np.asarray(_one_iteration(h1, amg.W(), x, b))
    assert np.allclose(y0[:n], y1[:n], rtol=1e-12, atol=1e-13)


def test_run_fixed_cycles_matches_iterated():
    # cross-cycle updown fusion must produce bit-comparable results to
    # iterating one cycle at a time
    from algebraicmultigrid_tpu.models.device import run_fixed_cycles

    A, ml = _mk()
    os.environ["AMG_PALLAS_FUSED"] = "1"
    os.environ["AMG_TAIL_MAX_ROWS"] = "5000"  # keep L0 out of the tail
    try:
        h = _hier(ml, tail=True)
    finally:
        os.environ.pop("AMG_PALLAS_FUSED", None)
        os.environ.pop("AMG_TAIL_MAX_ROWS", None)
    assert h.levels[0].fused is not None and h.levels[0].fused.factored
    assert h.tail_start != 0
    n = A.shape[0]
    b = jnp.asarray(np.random.default_rng(3).standard_normal(h.fine_padded))
    x0 = jnp.zeros_like(b)
    x_it = x0
    for _ in range(3):
        x_it = _one_iteration(h, amg.V(), x_it, b)
    x_fx = run_fixed_cycles(h, x0, b, 3)
    y0, y1 = np.asarray(x_it), np.asarray(x_fx)
    assert np.allclose(y0[:n], y1[:n], rtol=1e-11, atol=1e-11), (
        np.abs(y0[:n] - y1[:n]).max()
    )


def test_fused_subcycle_matches_unfused():
    # phased whole-subcycle kernel (mid level in slabs + tail + coarse solve
    # in ONE pallas_call) vs the per-level device path
    A, ml = _mk()
    os.environ["AMG_PALLAS_FUSED"] = "1"
    os.environ["AMG_PALLAS_TAIL"] = "1"
    os.environ["AMG_PALLAS_SUB"] = "1"
    os.environ["AMG_TAIL_MAX_ROWS"] = "600"  # tail = the two smallest levels
    try:
        h = build_device_hierarchy(ml, dtype=jnp.float64)
    finally:
        for k in ("AMG_PALLAS_FUSED", "AMG_PALLAS_TAIL", "AMG_PALLAS_SUB", "AMG_TAIL_MAX_ROWS"):
            os.environ.pop(k, None)
    assert h.tail_start == 2 and h.sub_start == 1, (h.tail_start, h.sub_start)
    h0 = _hier(ml, tail=False)
    n = A.shape[0]
    b = jnp.asarray(np.random.default_rng(5).standard_normal(h.fine_padded))
    x = jnp.zeros_like(b)
    y0 = np.asarray(_one_iteration(h0, amg.V(), x, b))
    y1 = np.asarray(_one_iteration(h, amg.V(), x, b))
    assert np.allclose(y0[:n], y1[:n], rtol=1e-11, atol=1e-11), (
        np.abs(y0[:n] - y1[:n]).max()
    )
