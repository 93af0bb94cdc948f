"""Representative-tile compaction of the fused-leg coefficient planes.

The planes are expanded from translation-invariant boundary-class tables
(models/lattice.py), so every tile whose halo block lies inside the periodic
interior carries an identical coefficient block.  The cache stores one
representative per interior run and the kernels' BlockSpec index maps send
all interior tiles to it — Pallas skips the HBM copy on consecutive equal
block indices, so the coefficient stream shrinks to O(edge tiles) per leg.

No reference counterpart (the reference streams CSC arrays once on a CPU,
/root/reference/src/multilevel.jl:214-239); this is a TPU memory-system
optimisation validated against the uncompacted path.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import algebraicmultigrid_tpu as amg


def _build(N, compact: bool):
    from algebraicmultigrid_tpu.models.device import build_device_hierarchy

    os.environ["AMG_PALLAS_FUSED"] = "1"
    os.environ["AMG_LEG_TILE"] = "48,384"
    if not compact:
        os.environ["AMG_TILE_COMPACT"] = "0"
    try:
        LP = amg.poisson((N, N), lattice=True)
        ml = amg.structured_smoothed_aggregation(
            LP, proxy=96, cut_rows=2000, min_proxy_dim=16,
            aggregate=amg.StructuredAggregation(box=3),
        )
        return ml, build_device_hierarchy(ml, dtype=jnp.float32)
    finally:
        os.environ.pop("AMG_PALLAS_FUSED", None)
        os.environ.pop("AMG_LEG_TILE", None)
        os.environ.pop("AMG_TILE_COMPACT", None)


@pytest.fixture(scope="module")
def pair():
    N = 576
    ml_c, h_c = _build(N, compact=True)
    ml_f, h_f = _build(N, compact=False)
    return N, h_c, h_f


def test_compaction_active_and_smaller(pair):
    N, h_c, h_f = pair
    f_c, f_f = h_c.levels[0].fused, h_f.levels[0].fused
    assert f_c is not None and f_f is not None
    assert f_c.cA is not None, "interior run must be detected at 12x2 tiles"
    assert f_c.A_tiled.shape[0] < f_f.A_tiled.shape[0]
    # stored representative + edge blocks must equal the full array's blocks
    # under the index map (spot-check the A planes along the compacted axis)
    (lo, hi) = f_c.cA[0]
    full = np.asarray(h_f.levels[0].fused.A_tiled)
    comp = np.asarray(f_c.A_tiled)
    for i in range(full.shape[0]):
        ci = i if i < lo else (i - (hi - lo) if i > hi else lo)
        np.testing.assert_array_equal(full[i], comp[ci])


def test_compacted_cycle_matches_uncompacted(pair):
    from algebraicmultigrid_tpu.models.device import _one_iteration

    N, h_c, h_f = pair
    n = N * N
    rng = np.random.default_rng(3)
    b = np.zeros(h_c.fine_padded, np.float32)
    b[:n] = rng.standard_normal(n)
    x0 = jnp.zeros(h_c.fine_padded, jnp.float32)
    xa = np.asarray(_one_iteration(h_c, amg.V(), x0, jnp.asarray(b)))
    xb = np.asarray(_one_iteration(h_f, amg.V(), x0, jnp.asarray(b)))
    assert np.abs(xa[:n] - xb[:n]).max() == 0.0


def test_compacted_updown_matches(pair):
    from algebraicmultigrid_tpu.models.device import run_fixed_cycles

    N, h_c, h_f = pair
    n = N * N
    rng = np.random.default_rng(4)
    b = jnp.asarray(
        np.pad(rng.standard_normal(n).astype(np.float32), (0, h_c.fine_padded - n))
    )
    x0 = jnp.zeros(h_c.fine_padded, jnp.float32)
    xa = np.asarray(run_fixed_cycles(h_c, x0, b, 2))
    xb = np.asarray(run_fixed_cycles(h_f, x0, b, 2))
    assert np.abs(xa[:n] - xb[:n]).max() == 0.0
