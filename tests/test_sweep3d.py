"""Fused 3-D multicolor sweep kernel (ops/pallas/sweep3d_kernel.py) vs the
masked multicolor sweep — identical color steps and update formula, so the
results agree to FMA-contraction tolerance (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.device import (
    MaskedMulticolorCache,
    _apply_smoother,
)
from algebraicmultigrid_tpu.models.lattice_nd import LatticeProblemND
from algebraicmultigrid_tpu.ops.lattice_nd_op import latnd_from_spec
from algebraicmultigrid_tpu.ops.pallas.sweep3d_kernel import (
    Sweep3DCache,
    build_sweep3d_cache,
    smooth_sweep3d,
)


def _stencil3():
    st = np.zeros((3, 3, 3))
    for d in range(3):
        for off in (-1, 1):
            idx = [1, 1, 1]
            idx[d] += off
            st[tuple(idx)] = -1.0
    st[1, 1, 1] = 6.0
    return st


def _masked_cache(spec, rows_padded, omega=1.0, iters=1):
    from algebraicmultigrid_tpu.models.lattice_nd import lattice_coloring_nd

    tab, nc = lattice_coloring_nd(spec)
    reps = [-(-W // p) for W, p in zip(spec.row_dims, tab.shape)]
    colors = np.tile(tab, reps)[tuple(slice(0, W) for W in spec.row_dims)].ravel()
    diag = spec.diagonal()
    n = diag.shape[0]
    color_of = np.full(rows_padded, nc, np.int32)
    color_of[:n] = colors
    dinv = np.zeros(rows_padded, np.float32)
    dinv[:n] = 1.0 / diag
    return MaskedMulticolorCache(
        color_of=jnp.asarray(color_of), dinv=jnp.asarray(dinv),
        n_colors=nc, omega=omega, iter=iters, forward=True, backward=True,
    )


@pytest.mark.parametrize("dims", [(20, 12, 128), (13, 9, 128)])
def test_sweep3d_matches_masked(dims):
    P = LatticeProblemND(_stencil3(), dims)
    A_dev = latnd_from_spec(P.spec, jnp.float32)
    rows_padded = A_dev.rows_padded
    masked = _masked_cache(P.spec, rows_padded)
    cache = build_sweep3d_cache(
        P.spec, rows_padded, jnp.float32, 1.0, 1, True, True,
        interpret=True, fallback=masked,
    )
    assert isinstance(cache, Sweep3DCache), "kernel must build for 7-pt 3-D"
    n = int(np.prod(dims))
    rng = np.random.default_rng(0)
    x = np.zeros(rows_padded, np.float32)
    x[:n] = rng.standard_normal(n)
    b = np.zeros_like(x)
    b[:n] = rng.standard_normal(n)
    y_k = np.asarray(smooth_sweep3d(cache, jnp.asarray(x), jnp.asarray(b)))
    y_m = np.asarray(_apply_smoother(masked, A_dev, jnp.asarray(x), jnp.asarray(b)))
    scale = np.abs(y_m[:n]).max()
    assert np.abs(y_k[:n] - y_m[:n]).max() <= 2e-6 * scale


def test_sweep3d_fallback_conditions():
    # nz not a lane multiple → masked fallback
    P = LatticeProblemND(_stencil3(), (12, 10, 16))
    sentinel = object()
    out = build_sweep3d_cache(
        P.spec, 2048, jnp.float32, 1.0, 1, True, True,
        interpret=True, fallback=sentinel,
    )
    assert out is sentinel


def test_sweep3d_multi_rhs_falls_back():
    dims = (16, 10, 128)
    P = LatticeProblemND(_stencil3(), dims)
    A_dev = latnd_from_spec(P.spec, jnp.float32)
    masked = _masked_cache(P.spec, A_dev.rows_padded)
    cache = build_sweep3d_cache(
        P.spec, A_dev.rows_padded, jnp.float32, 1.0, 1, True, True,
        interpret=True, fallback=masked,
    )
    X = np.random.default_rng(1).standard_normal((A_dev.rows_padded, 2)).astype(np.float32)
    B = np.zeros_like(X)
    out = _apply_smoother(cache, A_dev, jnp.asarray(X), jnp.asarray(B))
    assert out.shape == X.shape
