"""Lat2D — gather-free device operator for lattice-structured levels.

The structured fast path (models/lattice.py) describes every level operator
by a small (offset × boundary-class) coefficient table on a 2-D grid.  On
device that becomes:

    y[ix, iy] = Σ_k  data_k[ix, iy] · X[base_x(ix) + dxₖ, base_y(iy) + dyₖ]

with ``base(i) = (i·W_col)//W_row`` per axis.  Because the per-axis ratio is
1, 2, or 1/2 for every operator StructuredRS produces, each offset k is ONE
static (possibly strided) 2-D slice of the padded input grid — multiply-add
on the VPU, no gathers anywhere, fully fusible by XLA.  This generalises the
1-D SDIA format to per-axis strides, covering the x-halved transfer operators
SDIA cannot express.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .sparse import round_up

__all__ = ["Lat2D", "lat2d_from_spec"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Lat2D:
    data: jax.Array  # [n_off, WxR, WyR]
    offsets: Tuple[Tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))
    row_dims: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    col_dims: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    base_x: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    base_y: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    rows_padded: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.data.dtype


def lat2d_from_spec(spec, dtype, row_pad: int = 8) -> Lat2D:
    """Instantiate a device Lat2D from a host LatticeSpec (O(n) block fills,
    no graph analysis)."""
    WxR, WyR = spec.row_dims
    n_r = WxR * WyR
    data = spec.expand_all(dtype=dtype)  # fill directly at device dtype
    return Lat2D(
        data=jnp.asarray(data),
        offsets=spec.offsets,
        row_dims=(WxR, WyR),
        col_dims=tuple(spec.col_dims),
        base_x=tuple(spec.base_x),
        base_y=tuple(spec.base_y),
        shape=(n_r, spec.col_dims[0] * spec.col_dims[1]),
        nnz=spec.nnz(),
        rows_padded=round_up(max(n_r, 1), row_pad),
    )


def _axis_take(Xp, axis: int, d: int, m: int, W_row: int, base: Tuple[int, int]):
    """Static slice of the padded grid realising ``(i*p)//q + d`` along one
    axis.  ``Xp`` is padded by ``m`` on each side of ``axis``; returns an
    array of extent ``W_row`` along that axis.
    """
    p, q = base
    start = d + m
    if p == 1 and q == 1:
        return jax.lax.slice_in_dim(Xp, start, start + W_row, axis=axis)
    if p == 1:  # fine rows (prolongation): base = i//q — q rows share a source
        src = (W_row - 1) // q + 1
        s = jax.lax.slice_in_dim(Xp, start, start + src, axis=axis)
        s = jnp.repeat(s, q, axis=axis)
        if src * q != W_row:
            s = jax.lax.slice_in_dim(s, 0, W_row, axis=axis)
        return s
    if q == 1:  # coarse rows (restriction): base = p·i — strided read
        return jax.lax.slice_in_dim(
            Xp, start, start + (W_row - 1) * p + 1, stride=p, axis=axis
        )
    raise ValueError(f"unsupported rational base {base}")


def lat2d_spmv(A: Lat2D, x: jax.Array) -> jax.Array:
    WxR, WyR = A.row_dims
    WxC, WyC = A.col_dims
    n_c = WxC * WyC
    tail = x.shape[1:]

    x_log = x[:n_c] if x.shape[0] >= n_c else jnp.pad(
        x, [(0, n_c - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    )
    X = x_log.reshape((WxC, WyC) + tail)
    mx = max((abs(dx) for dx, _ in A.offsets), default=0)
    my = max((abs(dy) for _, dy in A.offsets), default=0)
    Xp = jnp.pad(X, [(mx, mx), (my, my)] + [(0, 0)] * len(tail))

    y = jnp.zeros((WxR, WyR) + tail, dtype=jnp.result_type(A.data.dtype, x.dtype))
    for k, (dx, dy) in enumerate(A.offsets):
        g = _axis_take(Xp, 0, dx, mx, WxR, A.base_x)
        g = _axis_take(g, 1, dy, my, WyR, A.base_y)
        dk = A.data[k]
        if tail:
            dk = dk[(...,) + (None,) * len(tail)]
        y = y + dk * g

    y = y.reshape((WxR * WyR,) + tail)
    pad = A.rows_padded - WxR * WyR
    if pad > 0:
        y = jnp.pad(y, [(0, pad)] + [(0, 0)] * len(tail))
    return y
