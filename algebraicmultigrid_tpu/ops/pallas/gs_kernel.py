"""Pallas TPU kernel: fused multicolor Gauss-Seidel sweep on Lat2D levels.

The XLA masked multicolor sweep costs one full matvec of HBM traffic per
color step (4 per symmetric 2-color sweep), because every color step
re-reads A, x and b from HBM.  This kernel runs the WHOLE symmetric sweep in
one ``pallas_call``:

* the domain is tiled; each tile loads x, b, 1/diag and the A coefficient
  planes into VMEM once, with a halo of width ``H = n_steps · reach``;
* color steps execute sequentially **in VMEM** — neighbour access is
  ``pltpu.roll`` (registers, free), color masks are iota arithmetic on the
  VPU;
* cross-tile dependencies are handled by halo over-compute: updates run on
  the whole loaded block, the valid region shrinks by ``reach`` per step,
  and only the central tile (distance ≥ H from the block edge, hence always
  valid) is written back.

Per symmetric 5-point sweep the HBM traffic is ~8 planes instead of ~50 —
and ONE kernel launch instead of 4+ fused XLA segments (launch/dispatch
overhead dominates mid-sized levels on this part).

Update order is identical to the masked multicolor sweep (same color
sequence, same formula), so iterates agree to float reassociation.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["PallasGSCache", "build_pallas_gs_cache", "smooth_pallas_gs"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PallasGSCache:
    A_tiled: jax.Array  # [gx, gy, n_off, BX, BY] halo-duplicated tiles
    dinv_tiled: jax.Array  # [gx, gy, BX, BY]
    fallback: object  # MaskedMulticolorCache pytree — used for multi-RHS x
    offsets: Tuple[Tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))
    color_grid: Tuple[Tuple[int, ...], ...] = dataclasses.field(metadata=dict(static=True))
    n_colors: int = dataclasses.field(metadata=dict(static=True))
    row_dims: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    tiled_dims: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))  # (WxT, WyT)
    tile: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    H: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))  # (Hx, Hy) halo, aligned to (8, 128) blocks
    omega: float = dataclasses.field(metadata=dict(static=True))
    iter: int = dataclasses.field(metadata=dict(static=True))
    forward: bool = dataclasses.field(metadata=dict(static=True))
    backward: bool = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))


def _pick_tile(W: int, target: int, quantum: int) -> int:
    t = min(target, -(-W // quantum) * quantum)
    return max(t, quantum)


@functools.partial(
    jax.jit,
    static_argnames=("gx", "gy", "TX", "TY", "Hx", "Hy", "diag_idx", "dtype_name"),
)
def _build_gs_tiles_jit(T, cx, cy, *, gx, gy, TX, TY, Hx, Hy, diag_idx, dtype_name):
    """Expand the class table to planes ON DEVICE and pre-tile with
    duplicated halos, in one compiled program (exact one-hot selection)."""
    from .vcycle_kernels import _tile_plane

    dt = jnp.dtype(dtype_name)
    Ex = (cx[:, None] == jnp.arange(T.shape[1], dtype=cx.dtype)).astype(T.dtype)
    Ey = (cy[:, None] == jnp.arange(T.shape[2], dtype=cy.dtype)).astype(T.dtype)
    planes = jnp.einsum(
        "xc,kcd,yd->kxy", Ex, T, Ey, precision=jax.lax.Precision.HIGHEST
    )
    tile_f = lambda p: _tile_plane(p, gx, gy, TX, TY, Hx, Hy)
    A_tiled = jnp.moveaxis(jax.vmap(tile_f)(planes), 0, 2).astype(dt)
    diag = planes[diag_idx] if diag_idx >= 0 else jnp.zeros(planes.shape[1:], planes.dtype)
    dv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0).astype(dt)
    dinv_tiled = tile_f(dv)
    return A_tiled, dinv_tiled


def build_pallas_gs_cache(
    spec, color_grid: np.ndarray, n_colors: int, dtype, omega, iters, fwd, bwd,
    interpret: bool = False, fallback=None, tile_target=(256, 512),
):
    Wx, Wy = spec.row_dims
    reach = max(
        max((abs(dx) for dx, _ in spec.offsets), default=0),
        max((abs(dy) for _, dy in spec.offsets), default=0),
    )
    from ..coloring import color_steps

    n_steps = len(color_steps(n_colors, iters, fwd, bwd, omega))
    H = max(n_steps * reach, 1)
    # halo rounded up so block dims stay (8, 128)-aligned (TPU lowering
    # requires the last two block dims divisible by the f32 tile)
    Hx = -(-H // 4) * 4
    Hy = 64 * (-(-H // 64))
    # lane quantum 128, sublane 8 (f32)
    TY = _pick_tile(Wy, tile_target[1], 128)
    TX = _pick_tile(Wx, tile_target[0], 8)
    # VMEM budget: (x + b + dinv + n_off A planes) double-buffered by the
    # pipeline, + double-buffered output, must fit the 16 MB scoped limit
    n_planes = len(spec.offsets) + 3
    itemsize = np.dtype(dtype).itemsize

    def vmem_need(tx, ty):
        blk = (tx + 2 * Hx) * (ty + 2 * Hy) * itemsize
        return 2 * n_planes * blk + 2 * tx * ty * itemsize

    while vmem_need(TX, TY) > 13 * 2**20:
        if TX > 64:
            TX //= 2
        elif TY > 128:
            TY //= 2
        else:
            break
    if vmem_need(TX, TY) > 13 * 2**20:
        # wide stencils (RS coarse operators reach ~30 offsets) cannot fit
        # the scoped VMEM even at minimum tiles — use the masked-multicolor
        # fallback instead of emitting a kernel that OOMs at compile time
        return fallback
    WxT = -(-Wx // TX) * TX
    WyT = -(-Wy // TY) * TY

    n_off = len(spec.offsets)
    BX, BY = TX + 2 * Hx, TY + 2 * Hy
    gx, gy = WxT // TX, WyT // TY
    # pre-tile with duplicated halos: tiles become NON-overlapping blocks of
    # the tiled arrays, so the standard pipelined BlockSpec path applies
    # (index maps are block-units in this JAX; overlapping windows can't be
    # expressed, and manual per-tile DMA forfeits Mosaic's double buffering)
    host_expand = (
        np.dtype(spec.table.dtype).kind != "f"
        or os.environ.get("AMG_HOST_EXPAND") == "1"
    )
    if host_expand:
        A_pad = np.zeros((n_off, WxT + 2 * Hx, WyT + 2 * Hy), dtype=dtype)
        for k in range(n_off):
            A_pad[k, Hx : Hx + Wx, Hy : Hy + Wy] = spec.expand(k, dtype=dtype)
        diag = spec.diagonal().reshape(Wx, Wy)
        dinv = np.zeros((WxT + 2 * Hx, WyT + 2 * Hy), dtype=dtype)
        nzd = diag != 0
        dinv[Hx : Hx + Wx, Hy : Hy + Wy] = np.where(nzd, 1.0 / np.where(nzd, diag, 1), 0.0)
        winA = np.lib.stride_tricks.sliding_window_view(A_pad, (BX, BY), axis=(1, 2))
        A_tiled = jnp.asarray(
            np.ascontiguousarray(winA[:, ::TX, ::TY].transpose(1, 2, 0, 3, 4))
        )
        winD = np.lib.stride_tricks.sliding_window_view(dinv, (BX, BY))
        dinv_tiled = jnp.asarray(np.ascontiguousarray(winD[::TX, ::TY]))
    else:
        # device-side expansion + tiling: O(W) uploads instead of O(n)
        # (see ops/lattice_op.expand_planes_device for the one-hot scheme)
        try:
            diag_idx = spec.offsets.index((0, 0))
        except ValueError:
            diag_idx = -1
        comp = np.float32 if jnp.dtype(dtype).itemsize <= 4 else np.dtype(dtype)
        cx, cy = spec.row_class_arrays()
        A_tiled, dinv_tiled = _build_gs_tiles_jit(
            jnp.asarray(np.asarray(spec.table, dtype=comp)),
            jnp.asarray(cx.astype(np.int32)),
            jnp.asarray(cy.astype(np.int32)),
            gx=gx, gy=gy, TX=TX, TY=TY, Hx=Hx, Hy=Hy,
            diag_idx=diag_idx,
            dtype_name=jnp.dtype(dtype).name,
        )

    return PallasGSCache(
        A_tiled=A_tiled,
        dinv_tiled=dinv_tiled,
        fallback=fallback,
        offsets=spec.offsets,
        color_grid=tuple(tuple(int(c) for c in row) for row in np.asarray(color_grid)),
        n_colors=n_colors,
        row_dims=(Wx, Wy),
        tiled_dims=(WxT, WyT),
        tile=(TX, TY),
        H=(Hx, Hy),
        omega=omega,
        iter=iters,
        forward=fwd,
        backward=bwd,
        interpret=interpret,
    )


def _sweep_kernel(
    x_ref, b_ref, dinv_ref, a_ref, out_ref,
    *, offsets, color_grid, steps, omega, Hx, Hy, TX, TY,
):
    # All inputs arrive as pipelined VMEM blocks of the PRE-TILED arrays
    # (halos duplicated at tiling time): x/b/dinv blocks (BX, BY), A block
    # (n_off, BX, BY); Mosaic double-buffers the HBM→VMEM streams.
    a_tab = np.asarray(color_grid)
    a, b = a_tab.shape
    BX, BY = TX + 2 * Hx, TY + 2 * Hy

    i = pl.program_id(0)
    j = pl.program_id(1)
    gx0 = i * TX
    gy0 = j * TY

    px = jax.lax.broadcasted_iota(jnp.int32, (BX, BY), 0)
    py = jax.lax.broadcasted_iota(jnp.int32, (BX, BY), 1)
    # + large multiple of the period to keep mod arguments non-negative
    cx = (gx0 + px - Hx + 16384 * a) % a
    cy = (gy0 + py - Hy + 16384 * b) % b
    color_of = jnp.zeros((BX, BY), jnp.int32)
    for u in range(a):
        for v in range(b):
            color_of = jnp.where((cx == u) & (cy == v), a_tab[u, v], color_of)

    L = x_ref[0, 0]
    B = b_ref[0, 0]
    D = dinv_ref[0, 0]

    for c in steps:
        rsum = None
        for k, (dx, dy) in enumerate(offsets):
            src = L
            if dx:
                src = pltpu.roll(src, (-dx) % BX, axis=0)
            if dy:
                src = pltpu.roll(src, (-dy) % BY, axis=1)
            term = a_ref[0, 0, k] * src
            rsum = term if rsum is None else rsum + term
        upd = L + omega * D * (B - rsum)
        L = jnp.where(color_of == c, upd, L)

    out_ref[:] = L[Hx : Hx + TX, Hy : Hy + TY]


def smooth_pallas_gs(cache: PallasGSCache, x, b):
    """x, b: padded flat level vectors → one fused symmetric sweep."""
    Wx, Wy = cache.row_dims
    WxT, WyT = cache.tiled_dims
    TX, TY = cache.tile
    Hx, Hy = cache.H
    n = Wx * Wy
    dtype = cache.A_tiled.dtype
    gx, gy = WxT // TX, WyT // TY
    BX, BY = TX + 2 * Hx, TY + 2 * Hy

    def to_tiles(v):
        g = v[:n].reshape(Wx, Wy).astype(dtype)
        g = jnp.pad(g, ((Hx, Hx + WxT - Wx), (Hy, Hy + WyT - Wy)))
        # static-slice stacking (NOT lax.map: a sequential loop of dynamic
        # slices costs one dispatch-floor per tile); XLA fuses these stacks
        gx_slabs = jnp.stack(
            [jax.lax.slice_in_dim(g, i * TX, i * TX + BX, axis=0) for i in range(gx)]
        )  # [gx, BX, WyT+2Hy]
        tiles = jnp.stack(
            [
                jax.lax.slice_in_dim(gx_slabs, j * TY, j * TY + BY, axis=2)
                for j in range(gy)
            ],
            axis=1,
        )  # [gx, gy, BX, BY]
        return tiles

    Xt = to_tiles(x)
    Bt = to_tiles(b)

    from ..coloring import color_steps

    steps = color_steps(
        cache.n_colors, cache.iter, cache.forward, cache.backward, cache.omega
    )

    kernel = functools.partial(
        _sweep_kernel,
        offsets=cache.offsets,
        color_grid=cache.color_grid,
        steps=steps,
        omega=cache.omega,
        Hx=Hx,
        Hy=Hy,
        TX=TX,
        TY=TY,
    )
    n_off = len(cache.offsets)
    tile_spec = pl.BlockSpec(
        (1, 1, BX, BY), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    a_spec = pl.BlockSpec(
        (1, 1, n_off, BX, BY), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(gx, gy),
        in_specs=[tile_spec, tile_spec, tile_spec, a_spec],
        out_specs=pl.BlockSpec(
            (TX, TY), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        # logical-size output: edge blocks overhang, Mosaic masks the OOB
        # stores — saves the post-slice pass
        out_shape=jax.ShapeDtypeStruct((Wx, Wy), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=cache.interpret,
    )(Xt, Bt, cache.dinv_tiled, cache.A_tiled)

    out = out.reshape(n).astype(x.dtype)
    padlen = x.shape[0] - n
    if padlen > 0:
        out = jnp.pad(out, (0, padlen))
    return out
