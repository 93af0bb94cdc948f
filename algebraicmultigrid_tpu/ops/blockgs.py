"""Blocked grid-colored Gauss-Seidel/SOR for Lat2D levels.

The masked multicolor sweep (models/device.py) runs one FULL matvec per
color and discards all but that color's rows — 4× redundant A/x traffic for
a 2-color symmetric sweep.  On a lattice level the colors form a periodic
(a × b) pattern, so the sweep can instead run in a *blocked* layout:

    x grid (Wx, Wy)  →  Xb[a, b, nx, ny]   with Xb[u, v] = x[u::a, v::b]

Each color step updates whole contiguous blocks (no strided writes, no
masking): for cells of residue (u, v), the neighbour at geometric offset
(dx, dy) lives in block ((u+dx) mod a, (v+dy) mod b) shifted by
floor((u+dx)/a) block rows — a static slice.  Per sweep the traffic is one
matvec-equivalent (each A entry and each x value read once), the update
order is *identical* to the masked multicolor sweep (same color sequence,
cells within a color independent), so iterates match bitwise up to float
reassociation.

The A coefficients and 1/diag are pre-blocked at cache-build time (host
numpy, O(n) block fills).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["BlockGSCache", "build_blockgs_cache", "smooth_blockgs"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockGSCache:
    A_blk: jax.Array  # [n_off, a, b, nx, ny] blocked row coefficients
    dinv_blk: jax.Array  # [a, b, nx, ny]
    b_scale: jax.Array  # unused placeholder for pytree stability
    offsets: Tuple[Tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))
    a: int = dataclasses.field(metadata=dict(static=True))
    b: int = dataclasses.field(metadata=dict(static=True))
    order: Tuple[Tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))  # cells grouped by ascending color
    color_starts: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))  # start index of each color in `order`
    row_dims: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    pad_dims: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))  # grid padded to multiples of (a, b)
    margins: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))  # block-axis halo (mx, my)
    omega: float = dataclasses.field(metadata=dict(static=True))
    iter: int = dataclasses.field(metadata=dict(static=True))
    forward: bool = dataclasses.field(metadata=dict(static=True))
    backward: bool = dataclasses.field(metadata=dict(static=True))


def _block_host(G: np.ndarray, a: int, b: int, Wxp: int, Wyp: int) -> np.ndarray:
    """(Wx, Wy) grid → [a, b, Wxp/a, Wyp/b] blocked (zero-padded)."""
    Wx, Wy = G.shape
    P = np.zeros((Wxp, Wyp), dtype=G.dtype)
    P[:Wx, :Wy] = G
    nx, ny = Wxp // a, Wyp // b
    return P.reshape(nx, a, ny, b).transpose(1, 3, 0, 2).copy()


def build_blockgs_cache(
    spec, color_grid: np.ndarray, n_colors: int, dtype, omega, iters, fwd, bwd
):
    """Pre-block the level's coefficients for the grid-colored sweep."""
    Wx, Wy = spec.row_dims
    a, b = color_grid.shape
    Wxp = -(-Wx // a) * a
    Wyp = -(-Wy // b) * b
    mx = max((-(-abs(dx) // a) for dx, _ in spec.offsets), default=0)
    my = max((-(-abs(dy) // b) for _, dy in spec.offsets), default=0)

    n_off = len(spec.offsets)
    nx, ny = Wxp // a, Wyp // b
    A_blk = np.zeros((n_off, a, b, nx, ny), dtype=dtype)
    for k in range(n_off):
        A_blk[k] = _block_host(spec.expand(k, dtype=dtype), a, b, Wxp, Wyp)

    diag = spec.diagonal().reshape(Wx, Wy)
    dinv = np.zeros((Wx, Wy), dtype=dtype)
    nzd = diag != 0
    dinv[nzd] = 1.0 / diag[nzd]
    dinv_blk = _block_host(dinv.astype(dtype), a, b, Wxp, Wyp)
    # zero-diag rows frozen: dinv 0 there already (update adds 0)
    # padded cells also have dinv 0 → never move

    # cells grouped by ascending color id — the masked multicolor order
    order = []
    starts = []
    for c in range(n_colors):
        starts.append(len(order))
        for u in range(a):
            for v in range(b):
                if color_grid[u, v] == c:
                    order.append((u, v))
    return BlockGSCache(
        A_blk=jnp.asarray(A_blk),
        dinv_blk=jnp.asarray(dinv_blk),
        b_scale=jnp.zeros((), dtype=dtype),
        offsets=spec.offsets,
        a=a,
        b=b,
        order=tuple(order),
        color_starts=tuple(starts),
        row_dims=(Wx, Wy),
        pad_dims=(Wxp, Wyp),
        margins=(mx, my),
        omega=omega,
        iter=iters,
        forward=fwd,
        backward=bwd,
    )


def _to_blocked(x2, a, b, mx, my):
    """(Wxp, Wyp[,k]) grid → [a, b, nx+2mx, ny+2my, ...] blocked + margins."""
    Wxp, Wyp = x2.shape[0], x2.shape[1]
    tail = x2.shape[2:]
    nx, ny = Wxp // a, Wyp // b
    xb = x2.reshape((nx, a, ny, b) + tail)
    perm = (1, 3, 0, 2) + tuple(range(4, 4 + len(tail)))
    xb = jnp.transpose(xb, perm)
    return jnp.pad(xb, [(0, 0), (0, 0), (mx, mx), (my, my)] + [(0, 0)] * len(tail))


def _from_blocked(xb, a, b, mx, my, tail_ndim):
    if mx or my:
        xb = xb[:, :, mx : xb.shape[2] - mx, my : xb.shape[3] - my]
    perm = (2, 0, 3, 1) + tuple(range(4, 4 + tail_ndim))
    x2 = jnp.transpose(xb, perm)
    s = x2.shape
    return x2.reshape((s[0] * s[1], s[2] * s[3]) + s[4:])


def _color_cell_update(cache: BlockGSCache, Xb, Bb, u: int, v: int):
    """GS update of the (u, v) residue block, reading current Xb."""
    a, b = cache.a, cache.b
    mx, my = cache.margins
    nx = Xb.shape[2] - 2 * mx
    ny = Xb.shape[3] - 2 * my
    tail_ndim = Xb.ndim - 4

    rsum = None
    for k, (dx, dy) in enumerate(cache.offsets):
        su, sv = (u + dx) % a, (v + dy) % b
        shx = (u + dx) // a
        shy = (v + dy) // b
        src = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(Xb[su, sv], mx + shx, mx + shx + nx, axis=0),
            my + shy,
            my + shy + ny,
            axis=1,
        )
        coef = cache.A_blk[k, u, v]
        if tail_ndim:
            coef = coef[(...,) + (None,) * tail_ndim]
        term = coef * src
        rsum = term if rsum is None else rsum + term

    x_old = jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(Xb[u, v], mx, mx + nx, axis=0), my, my + ny, axis=1
    )
    dinv = cache.dinv_blk[u, v]
    if tail_ndim:
        dinv = dinv[(...,) + (None,) * tail_ndim]
    upd = x_old + cache.omega * dinv * (Bb[u, v] - rsum)
    return Xb.at[u, v, mx : mx + nx, my : my + ny].set(upd)


def smooth_blockgs(cache: BlockGSCache, A, x, b):
    """Apply the blocked grid-colored GS/SOR sweeps; x, b are padded flat
    level vectors (device layout)."""
    Wx, Wy = cache.row_dims
    Wxp, Wyp = cache.pad_dims
    n = Wx * Wy
    tail = x.shape[1:]
    mx, my = cache.margins

    def to_grid(v):
        g = v[:n].reshape((Wx, Wy) + tail)
        if Wxp != Wx or Wyp != Wy:
            g = jnp.pad(g, [(0, Wxp - Wx), (0, Wyp - Wy)] + [(0, 0)] * len(tail))
        return g

    Xb = _to_blocked(to_grid(x), cache.a, cache.b, mx, my)
    Bb = _to_blocked(to_grid(b), cache.a, cache.b, 0, 0)

    n_colors = len(cache.color_starts)
    bounds = list(cache.color_starts) + [len(cache.order)]

    def color_step(Xb, c):
        for idx in range(bounds[c], bounds[c + 1]):
            u, v = cache.order[idx]
            Xb = _color_cell_update(cache, Xb, Bb, u, v)
        return Xb

    for _ in range(cache.iter):
        if cache.forward:
            for c in range(n_colors):
                Xb = color_step(Xb, c)
        if cache.backward:
            for c in range(n_colors - 1, -1, -1):
                Xb = color_step(Xb, c)

    out = _from_blocked(Xb, cache.a, cache.b, mx, my, len(tail))
    out = out[:Wx, :Wy].reshape((n,) + tail)
    padlen = x.shape[0] - n
    if padlen > 0:
        out = jnp.pad(out, [(0, padlen)] + [(0, 0)] * len(tail))
    return out
