"""Zero-start sweep sparsification (vcycle_kernels._steps_live_offsets).

Coarse-level cycles start from the zero guess (multilevel.jl:225), so the
fused down legs drop sweep-step stencil terms whose source colors are still
zero.  The skip is exact in IEEE semantics but XLA's multiply-add
contraction is graph-shape-dependent, so the sparsified kernel is compared
to the full one at a tight tolerance rather than bitwise (the bitwise
cross-path guarantee holds between equally-sparsified engines —
test_fused_legs.py::test_dma_windows_match_tile_stacks).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.ops.pallas.vcycle_kernels import _steps_live_offsets


def test_live_offsets_progression_9pt_4color():
    # 2×2 grid of 4 distinct colors, 9-point box stencil, deduped symmetric
    # sweep [0,1,2,3,2,1,0]: live counts must be 0/2/6/8 then full.
    grid = ((0, 1), (2, 3))
    offs = tuple((dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    steps = (0, 1, 2, 3, 2, 1, 0)
    live = _steps_live_offsets(steps, grid, offs)
    assert [len(l) for l in live] == [0, 2, 6, 8, 9, 9, 9]
    # step 1 updates color 1 at (0,1): only the lane-neighbour offsets
    # (0,±1) reach the already-updated color 0
    assert tuple(offs[k] for k in live[1]) == ((0, -1), (0, 1))


def test_live_offsets_checkerboard_5pt():
    grid = ((0, 1), (1, 0))
    offs = ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1))
    live = _steps_live_offsets((0, 1, 0), grid, offs)
    # first step: nothing live; second: the 4 off-diagonal (opposite-color)
    # reads; third: everything
    assert len(live[0]) == 0
    assert tuple(offs[k] for k in live[1]) == ((0, -1), (-1, 0), (1, 0), (0, 1))
    assert len(live[2]) == len(offs)


def test_fused_down_zero_start_matches_full(monkeypatch):
    # x_zero=True (fetch-skip + sparsified sweeps) must agree with the full
    # computation on a genuinely-zero x to ~1 ulp/step.
    monkeypatch.setenv("AMG_PALLAS_FUSED", "1")
    monkeypatch.setenv("AMG_PALLAS_TAIL", "0")  # tail-covered levels skip leg caches
    LP = amg.poisson((192, 192), lattice=True)
    ml = amg.structured_smoothed_aggregation(
        LP, proxy=64, cut_rows=2000, min_proxy_dim=16,
        aggregate=amg.StructuredAggregation(box=3),
    )
    from algebraicmultigrid_tpu.models.device import build_device_hierarchy
    from algebraicmultigrid_tpu.ops.pallas.vcycle_kernels import fused_down

    h = build_device_hierarchy(ml, dtype=jnp.float32)
    checked = 0
    for lvl in range(len(h.levels)):
        fused = h.levels[lvl].fused
        if fused is None:
            continue
        npad = h.levels[lvl].A.rows_padded
        rng = np.random.default_rng(lvl)
        b = jnp.asarray(rng.standard_normal(npad).astype(np.float32))
        x0 = jnp.zeros_like(b)
        outs = {}
        for zs in (False, True):
            xt, bc, _ = fused_down(fused, x0, b, tiled=True, x_zero=zs)
            outs[zs] = (np.asarray(xt), np.asarray(bc))
        # bc is fully written; xt planes carry unwritten margins (NaN/garbage)
        # so compare only the finite-in-both region
        bc0, bc1 = outs[False][1], outs[True][1]
        np.testing.assert_allclose(bc0, bc1, rtol=2e-6, atol=1e-6)
        # compare the logical interior of the chained plane (margins and
        # beyond-domain overhang are unwritten/garbage by design)
        Hfx, Hfy = fused.Hf
        Wx, Wy = fused.row_dims
        xi0 = outs[False][0][Hfx : Hfx + Wx, Hfy : Hfy + Wy]
        xi1 = outs[True][0][Hfx : Hfx + Wx, Hfy : Hfy + Wy]
        assert np.isfinite(xi0).all() and np.isfinite(xi1).all()
        np.testing.assert_allclose(xi0, xi1, rtol=2e-6, atol=1e-6)
        checked += 1
    assert checked >= 2, "expected fused caches on multiple levels"
