"""Distributed Galerkin RAP (parallel/sharded_rap.py): the coarse-level
planes computed ON the 8-device virtual mesh must match the host
fastsetup's child operator exactly (up to f32 summation) — a sharded
structured-SA setup step with no global operator on any host."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.parallel.lattice_cycle import AXIS, build_slab_hierarchy
from algebraicmultigrid_tpu.parallel.sharded_rap import rap_planes_sharded

pytestmark = pytest.mark.multichip

N = 216


@pytest.fixture(scope="module")
def setup():
    LP = amg.poisson((N, N), lattice=True)
    ml = amg.structured_smoothed_aggregation(
        LP, proxy=72, cut_rows=2000, min_proxy_dim=16,
        aggregate=amg.StructuredAggregation(box=3),
    )
    h = build_slab_hierarchy(ml, 8)
    mesh = Mesh(np.array(jax.devices()[:8]), (AXIS,))
    return ml, h, mesh


def test_sharded_rap_matches_host_child(setup):
    ml, h, mesh = setup
    assert h.levels[0].sharded
    child_spec = ml.levels[1].A.spec
    offsets_c = child_spec.offsets

    planes = np.asarray(rap_planes_sharded(h, 0, mesh, offsets_c), dtype=np.float64)

    Wxc_t, Wyc_t = child_spec.row_dims
    host = child_spec.expand_all(dtype=np.float64)  # [n_off, Wxc_t, Wyc_t]
    got = planes[:, :Wxc_t, :Wyc_t]
    scale = np.abs(host).max()
    err = np.abs(got - host).max() / scale
    assert err < 5e-6, err
    # padded region beyond the true coarse grid must have produced zeros
    # for couplings INTO the real grid... (only check the logical region —
    # pad rows are never read by the cycle)


def test_sharded_rap_replicated_level(setup):
    # the same probing runs on a replicated (agglomerated) level
    ml, h, mesh = setup
    li = next(i for i, lv in enumerate(h.levels) if not lv.sharded)
    if li + 1 >= len(ml.levels):
        pytest.skip("no child level below the first replicated level")
    child_spec = ml.levels[li + 1].A.spec
    planes = np.asarray(
        rap_planes_sharded(h, li, mesh, child_spec.offsets), dtype=np.float64
    )
    Wxc_t, Wyc_t = child_spec.row_dims
    host = child_spec.expand_all(dtype=np.float64)
    err = np.abs(planes[:, :Wxc_t, :Wyc_t] - host).max() / np.abs(host).max()
    assert err < 5e-6, err
