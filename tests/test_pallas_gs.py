"""Fused Pallas multicolor-GS sweep: bitwise equivalence to the masked
multicolor sweep (interpret mode on CPU; the compiled path runs on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.device import (
    _apply_smoother,
    build_device_hierarchy,
)
from algebraicmultigrid_tpu.models.lattice import lattice_coloring
from algebraicmultigrid_tpu.ops.pallas.gs_kernel import (
    build_pallas_gs_cache,
    smooth_pallas_gs,
)


@pytest.fixture(scope="module")
def lat_level():
    N = 192
    LP = amg.poisson((N, N), lattice=True)
    ml = amg.structured_smoothed_aggregation(
        LP, proxy=64, cut_rows=2000, min_proxy_dim=16,
        aggregate=amg.StructuredAggregation(box=3),
    )
    h = build_device_hierarchy(ml, dtype=jnp.float32)
    return N, ml, h


@pytest.mark.parametrize("tile_target", [(256, 512), (64, 128)])
def test_pallas_sweep_matches_masked(lat_level, tile_target):
    N, ml, h = lat_level
    L = h.levels[0]
    spec = ml.levels[0].A.spec
    grid_tab, nc = lattice_coloring(spec)
    masked = L.pre.fallback if hasattr(L.pre, "fallback") else L.pre
    cache = build_pallas_gs_cache(
        spec, grid_tab, nc, np.float32, 1.0, 1, True, True,
        interpret=True, fallback=masked, tile_target=tile_target,
    )
    n = N * N
    rng = np.random.default_rng(0)
    x0 = np.zeros(L.A.rows_padded, np.float32)
    x0[:n] = rng.standard_normal(n)
    bb = np.zeros_like(x0)
    bb[:n] = rng.standard_normal(n)
    xp = np.asarray(smooth_pallas_gs(cache, jnp.asarray(x0), jnp.asarray(bb)))
    xm = np.asarray(_apply_smoother(masked, L.A, jnp.asarray(x0), jnp.asarray(bb)))
    assert np.abs(xp[:n] - xm[:n]).max() == 0.0


def test_pallas_multi_rhs_falls_back(lat_level):
    # Build the Pallas cache explicitly (interpret mode) so this runs on
    # every backend — the device hierarchy only attaches one on TPU.
    N, ml, h = lat_level
    L = h.levels[0]
    spec = ml.levels[0].A.spec
    grid_tab, nc = lattice_coloring(spec)
    masked = L.pre.fallback if hasattr(L.pre, "fallback") else L.pre
    cache = build_pallas_gs_cache(
        spec, grid_tab, nc, np.float32, 1.0, 1, True, True,
        interpret=True, fallback=masked,
    )
    assert cache is not masked, "pallas cache should build for this stencil"
    n = N * N
    X = np.zeros((L.A.rows_padded, 2), np.float32)
    X[:n] = np.random.default_rng(1).standard_normal((n, 2))
    B = np.zeros_like(X)
    out = _apply_smoother(cache, L.A, jnp.asarray(X), jnp.asarray(B))
    assert out.shape == X.shape
    # and the fallback result must agree with smoothing each column alone
    col = _apply_smoother(cache.fallback, L.A, jnp.asarray(X[:, 0]), jnp.asarray(B[:, 0]))
    np.testing.assert_array_equal(np.asarray(out)[:, 0], np.asarray(col))


def test_wide_stencil_returns_fallback():
    """Stencils too wide for scoped VMEM even at minimum tiles (RS coarse
    operators reach ~30 offsets) must yield the masked fallback rather
    than a kernel that OOMs at Mosaic compile time."""
    from algebraicmultigrid_tpu.models.lattice import LatticeSpec

    R = 5
    offsets = tuple((dx, dy) for dx in range(-R, R + 1) for dy in range(-R, R + 1))
    spec = LatticeSpec(
        offsets=offsets,
        table=np.zeros((len(offsets), 3, 3), np.float64),
        row_dims=(64, 128), col_dims=(64, 128),
        Kx=1, sx=1, Ky=1, sy=1,
    )
    grid_tab = np.zeros((3, 3), np.int32)
    sentinel = object()
    out = build_pallas_gs_cache(
        spec, grid_tab, 25, np.float32, 1.0, 1, True, True,
        interpret=True, fallback=sentinel,
    )
    assert out is sentinel
