"""Fused V-cycle leg kernels: equivalence to the unfused XLA path
(interpret mode on CPU; the compiled path runs on TPU)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import algebraicmultigrid_tpu as amg


_ml_stash = {}


@pytest.fixture(scope="module")
def fused_pair(monkeypatch_module=None):
    os.environ["AMG_PALLAS_FUSED"] = "1"
    try:
        from algebraicmultigrid_tpu.models.device import (
            DeviceHierarchy,
            DeviceLevel,
            build_device_hierarchy,
        )

        N = 192
        LP = amg.poisson((N, N), lattice=True)
        ml = amg.structured_smoothed_aggregation(
            LP, proxy=64, cut_rows=2000, min_proxy_dim=16,
            aggregate=amg.StructuredAggregation(box=3),
        )
        _ml_stash["ml"] = ml
        h = build_device_hierarchy(ml, dtype=jnp.float32)
        h0 = DeviceHierarchy(
            levels=tuple(
                DeviceLevel(A=L.A, P=L.P, R=L.R, pre=L.pre, post=L.post)
                for L in h.levels
            ),
            coarse=h.coarse,
            final_A=h.final_A,
        )
        yield N, h, h0
    finally:
        os.environ.pop("AMG_PALLAS_FUSED", None)


def test_fused_vcycle_matches_unfused(fused_pair):
    from algebraicmultigrid_tpu.models.device import _one_iteration

    N, h, h0 = fused_pair
    assert h.levels[0].fused is not None, "fused legs must build"
    n = N * N
    rng = np.random.default_rng(0)
    b = np.zeros(h.fine_padded, np.float32)
    b[:n] = rng.standard_normal(n)
    x0 = jnp.zeros(h.fine_padded, jnp.float32)
    xa = np.asarray(_one_iteration(h, amg.V(), x0, jnp.asarray(b)))
    xb = np.asarray(_one_iteration(h0, amg.V(), x0, jnp.asarray(b)))
    scale = max(np.abs(xb).max(), 1e-30)
    assert np.abs(xa[:n] - xb[:n]).max() / scale < 1e-5


def test_fused_down_up_roundtrip(fused_pair):
    from algebraicmultigrid_tpu.ops.pallas.vcycle_kernels import fused_down, fused_up
    from algebraicmultigrid_tpu.models.device import _apply_smoother, fit_len
    from algebraicmultigrid_tpu.ops.banded import mat_vec

    N, h, h0 = fused_pair
    L = h.levels[0]
    c = L.fused
    n = N * N
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.pad(rng.standard_normal(n).astype(np.float32), (0, L.A.rows_padded - n)))
    b = jnp.asarray(np.pad(rng.standard_normal(n).astype(np.float32), (0, L.A.rows_padded - n)))

    xd, bc = fused_down(c, x, b)
    # reference: smoother + residual + restrict through the XLA ops
    xs = _apply_smoother(L.pre.fallback if hasattr(L.pre, "fallback") else L.pre, L.A, x, b)
    res = b - fit_len(mat_vec(L.A, xs), b.shape[0])
    bc_ref = np.asarray(mat_vec(L.R, res))[: bc.shape[0]]
    sc = max(np.abs(np.asarray(xs)).max(), 1e-30)
    assert np.abs(np.asarray(xd) - np.asarray(xs)).max() / sc < 1e-5
    sc2 = max(np.abs(bc_ref).max(), 1e-30)
    assert np.abs(np.asarray(bc)[: bc_ref.shape[0]] - bc_ref).max() / sc2 < 1e-5


def test_dma_windows_match_tile_stacks(fused_pair):
    """The DMA-windowed x/b/xc input path (flat padded planes in ANY memory,
    double-buffered in-kernel window fetches) must be bitwise-identical to
    the BlockSpec tile-stack path — same halo over-compute, same sweep ops,
    only the transport differs.  Small tiles force a multi-tile grid so the
    prefetch rotation and edge windows are exercised."""
    import jax.numpy as jnp
    from algebraicmultigrid_tpu.models.device import (
        _one_iteration,
        build_device_hierarchy,
        run_fixed_cycles,
    )

    N, h, h0 = fused_pair
    ml = _ml_stash["ml"]
    os.environ["AMG_LEG_TILE"] = "48,256"
    try:
        outs = {}
        for dma in ("0", "1"):
            os.environ["AMG_DMA_TILE"] = dma
            hh = build_device_hierarchy(ml, dtype=jnp.float32)
            assert hh.levels[0].fused is not None
            assert hh.levels[0].fused.dma == (dma == "1")
            n = N * N
            rng = np.random.default_rng(0)
            b = np.zeros(hh.fine_padded, np.float32)
            b[:n] = rng.standard_normal(n)
            x0 = jnp.zeros(hh.fine_padded, jnp.float32)
            x1 = np.asarray(_one_iteration(hh, amg.V(), x0, jnp.asarray(b)))
            x4 = np.asarray(run_fixed_cycles(hh, x0, jnp.asarray(b), 3))
            outs[dma] = (x1, x4)
    finally:
        os.environ.pop("AMG_LEG_TILE", None)
        os.environ.pop("AMG_DMA_TILE", None)
    assert np.array_equal(outs["0"][0], outs["1"][0])
    assert np.array_equal(outs["0"][1], outs["1"][1])


def test_packed_sweeps_match_masked(fused_pair):
    """Packed color-plane sweeps (cb2 checkerboard halves on 5-point levels,
    h4 row-parity halves on 9-point levels) must be bitwise-identical to the
    masked sweep path: same FLOPs in the same order, computed on half planes
    instead of masked full planes."""
    import jax.numpy as jnp
    from algebraicmultigrid_tpu.models.device import (
        _one_iteration,
        build_device_hierarchy,
        run_fixed_cycles,
    )

    N, h, h0 = fused_pair
    ml = _ml_stash["ml"]
    os.environ["AMG_LEG_TILE"] = "48,256"  # TX/2 sublane-aligned → packing engages
    try:
        outs = {}
        modes = {}
        for pk in ("0", "all"):
            os.environ["AMG_PACKED_SWEEP"] = pk
            hh = build_device_hierarchy(ml, dtype=jnp.float32)
            modes[pk] = [L.fused.packed if L.fused else None for L in hh.levels]
            n = N * N
            rng = np.random.default_rng(0)
            b = np.zeros(hh.fine_padded, np.float32)
            b[:n] = rng.standard_normal(n)
            x0 = jnp.zeros(hh.fine_padded, jnp.float32)
            x1 = np.asarray(_one_iteration(hh, amg.V(), x0, jnp.asarray(b)))
            x3 = np.asarray(run_fixed_cycles(hh, x0, jnp.asarray(b), 3))
            outs[pk] = (x1, x3)
    finally:
        os.environ.pop("AMG_LEG_TILE", None)
        os.environ.pop("AMG_PACKED_SWEEP", None)
    assert all(m in ("", None) for m in modes["0"])
    engaged = [m for m in modes["all"] if m]
    assert "cb2" in engaged, f"L0 should pack cb2, got {modes['all']}"
    import jax

    if jax.default_backend() == "tpu":
        # compiled Mosaic path: verified bitwise on TPU v5e
        assert np.array_equal(outs["0"][0], outs["all"][0])
        assert np.array_equal(outs["0"][1], outs["all"][1])
    else:
        # interpret mode: XLA:CPU contracts mul+add to FMA differently for
        # the masked full-plane vs packed half-plane expression shapes →
        # few-ULP deviations.  The same FLOPs-in-same-order claim holds
        # exactly on the compiled TPU path (asserted above when available).
        for idx in (0, 1):
            a, bb = outs["0"][idx], outs["all"][idx]
            scale = max(np.abs(a).max(), 1e-30)
            assert np.abs(a - bb).max() / scale < 1e-5


def test_bf16_coefficient_storage_converges():
    """bf16 A/P coefficient planes halve VMEM traffic; the perturbed cycle
    is still an effective preconditioner — solve_refined's f64 outer loop
    absorbs the ~1e-2 per-application error (ref: survey §7 mixed-precision
    stance; no reference counterpart — CUDA reference is fp64-only)."""
    from algebraicmultigrid_tpu.models.device import (
        build_device_hierarchy,
        solve_refined,
    )

    os.environ["AMG_PALLAS_FUSED"] = "1"
    os.environ["AMG_COEF_DTYPE"] = "bfloat16"
    try:
        N = 192
        LP = amg.poisson((N, N), lattice=True)
        ml = amg.structured_smoothed_aggregation(
            LP, proxy=64, cut_rows=2000, min_proxy_dim=16,
            aggregate=amg.StructuredAggregation(box=3),
        )
        h = build_device_hierarchy(ml, dtype=jnp.float32)
        c = h.levels[0].fused
        assert c is not None and c.A_tiled.dtype == jnp.bfloat16
        # every coefficient-class array (A planes and, on the factored path,
        # T/s/dinv) stores at the narrow dtype; x/b stay at the working dtype
        assert c.dinv_tiled.dtype == jnp.bfloat16
        assert c.wdtype == "float32"

        n = N * N
        rng = np.random.default_rng(0)
        b = rng.standard_normal(n)
        x, hist = solve_refined(ml, b, tol=1e-10, log=True)
        A = ml.levels[0].A
        relres = np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b)
        assert relres < 1e-9
    finally:
        os.environ.pop("AMG_PALLAS_FUSED", None)
        os.environ.pop("AMG_COEF_DTYPE", None)
