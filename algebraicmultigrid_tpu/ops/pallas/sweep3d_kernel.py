"""Fused multicolor sweep for 3-D lattice levels (LatND).

The masked XLA sweep costs one full stencil pass per color step — x and
the coefficient planes stream from HBM every step.  This kernel runs ALL
steps of a (possibly symmetric, deduped) multicolor GS/SOR sweep in one
``pallas_call`` over x-slabs: per tile, the planes/b/dinv load into VMEM
once and are reused across every step, and updates erode a ``steps·reach``
halo exactly like the 2-D leg kernels (ops/pallas/vcycle_kernels.py).

Shift trick: with slabs kept 3-D ([TX+2H, ny, nz]; sublane = y, lane =
z), a stencil offset (dx, dy, dz) becomes a FREE leading-dim slice of the
x-padded value (dx), one ±1 sublane roll (dy) and one ±1 lane roll (dz).
Roll wrap-around is harmless by the boundary-clipping invariant: an entry
that would cross the y or z domain edge has an exactly-zero coefficient
plane there.  (An earlier folded 2-D formulation used sublane rolls by
``dx·ny + dy`` — the remote Mosaic compiler crashes on such multi-thousand-
sublane roll graphs once buffers exceed ~2000 rows; see
scratch/real_mimic.py.)  Inputs live in ANY memory and each tile DMAs its
windows into per-operand VMEM scratch (the repo's 2-D leg-kernel pattern).

Colors are precomputed as an int32 field (periodic table tiled over the
grid, like the masked cache's ``color_of``) and windowed alongside x.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..coloring import color_steps

__all__ = ["Sweep3DCache", "build_sweep3d_cache", "smooth_sweep3d"]

VMEM_BUDGET = 100 * 1024 * 1024  # conservative per-kernel cap (of ~128 MB)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Sweep3DCache:
    planes: Tuple[jax.Array, ...]  # one [nxp+2H, ny, nz] plane per offset
    dinv: jax.Array    # [nxp+2H, ny, nz]
    colf: jax.Array    # [nxp+2H, ny, nz] int32 color field
    offsets: Tuple[Tuple[int, int, int], ...] = dataclasses.field(metadata=dict(static=True))
    steps: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    omega: float = dataclasses.field(metadata=dict(static=True))
    dims: Tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))
    nxp: int = dataclasses.field(metadata=dict(static=True))
    tx: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))
    rows_padded: int = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))
    fallback: object = None  # masked cache — multi-RHS fallback


def build_sweep3d_cache(
    spec,
    rows_padded: int,
    dtype,
    omega: float,
    iters: int,
    fwd: bool,
    bwd: bool,
    interpret: bool = False,
    fallback=None,
    coef_dtype=None,
) -> Optional["Sweep3DCache"]:
    """Build the fused sweep for a 3-D LatticeSpecND level, or return
    ``fallback`` when the level doesn't qualify (non-3-D, zero diagonals,
    lane-incompatible nz, or VMEM pressure at minimum tiles)."""
    from ...models.lattice_nd import lattice_coloring_nd

    if spec.ndim != 3:
        return fallback
    nx, ny, nz = spec.row_dims
    if nz % 128 or ny < 2 or nx < 2:
        return fallback
    got = lattice_coloring_nd(spec)
    if got is None:
        return fallback
    tab, n_colors = got
    steps = color_steps(n_colors, iters, fwd, bwd, omega)
    reach = max(max(abs(v) for v in d) for d in spec.offsets)
    H = len(steps) * reach
    if H >= nx:
        return fallback

    dt = jnp.dtype(dtype)
    cdt = jnp.dtype(coef_dtype) if coef_dtype is not None else dt
    n_off = len(spec.offsets)

    per_row = ny * nz * (n_off * cdt.itemsize + 3 * dt.itemsize + 4)
    tx = 8
    while (tx * 2 + 2 * H) * per_row * 2 < VMEM_BUDGET and tx * 2 <= 512 and tx < nx:
        tx *= 2
    if (tx + 2 * H) * per_row * 2 > VMEM_BUDGET:
        return fallback
    nxp = -(-nx // tx) * tx

    diag = spec.diagonal().reshape(nx, ny, nz)
    if (diag == 0).any():
        return fallback

    planes = spec.expand_all(dtype=np.float32)  # [n_off, nx, ny, nz]
    planes = np.pad(planes, ((0, 0), (H, H + nxp - nx), (0, 0), (0, 0)))
    chunks = [planes[k] for k in range(n_off)]

    dv = 1.0 / diag
    dv = np.pad(dv.astype(np.float32), ((H, H + nxp - nx), (0, 0), (0, 0)))

    reps = [-(-W // p) for W, p in zip((nx, ny, nz), tab.shape)]
    col3 = np.tile(tab, reps)[:nx, :ny, :nz].astype(np.int32)
    # halo/pad rows get color -1 (never updated — matches the masked
    # cache's frozen padding semantics for out-of-domain rows)
    colf = np.pad(col3, ((H, H + nxp - nx), (0, 0), (0, 0)), constant_values=-1)

    return Sweep3DCache(
        planes=tuple(jnp.asarray(np.ascontiguousarray(ch).astype(cdt)) for ch in chunks),
        dinv=jnp.asarray(dv.astype(dt)),
        colf=jnp.asarray(colf),
        offsets=tuple(tuple(int(v) for v in d) for d in spec.offsets),
        steps=tuple(int(c) for c in steps),
        omega=float(omega),
        dims=(nx, ny, nz),
        nxp=nxp,
        tx=tx,
        halo=H,
        rows_padded=rows_padded,
        interpret=bool(interpret),
        fallback=fallback,
    )


def _sweep3d_kernel(*refs, offsets, steps, omega, ny, nz, tx, H, n_chunks):
    # refs: n_chunks plane HBM refs, dv, colf, x, b (all ANY/HBM), out
    # (VMEM block), then scratch: planes, dv, colf, x, b, sems
    n_in = n_chunks + 4
    hbm = refs[:n_in]
    o_ref = refs[n_in]
    scr = refs[n_in + 1 : n_in + 1 + n_in]
    sems = refs[n_in + 1 + n_in]
    t = pl.program_id(0)
    TXH = tx + 2 * H
    row0 = t * tx

    copies = [
        pltpu.make_async_copy(
            hbm[i].at[pl.ds(row0, TXH), :, :], scr[i], sems.at[i]
        )
        for i in range(n_in)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    pl_refs = scr[:n_chunks]
    dv_ref, cf_ref, x_ref, b_ref = scr[n_chunks:]
    X = x_ref[...]
    B = b_ref[...]
    D = dv_ref[...]
    col = cf_ref[...]
    planes = [pl_refs[k][...].astype(X.dtype) for k in range(len(offsets))]
    mx = max(abs(d[0]) for d in offsets)
    # fori_loop over the color steps: one step's graph (a handful of
    # slices/rolls) compiles fine, while fully unrolling all steps hangs
    # this environment's remote Mosaic compiler (scratch/mimic3d_full.py)
    def step(i, X):
        # steps are static ints; select without capturing a constant array
        c = jnp.int32(steps[0])
        for j in range(1, len(steps)):
            c = jnp.where(i == j, jnp.int32(steps[j]), c)
        Xp = jnp.pad(X, ((mx, mx), (0, 0), (0, 0)))
        rsum = None
        for k, (dx, dy, dz) in enumerate(offsets):
            g = jax.lax.slice_in_dim(Xp, mx + dx, mx + dx + TXH, axis=0)
            if dy:
                g = pltpu.roll(g, (-dy) % ny, 1)
            if dz:
                g = pltpu.roll(g, (-dz) % nz, 2)
            term = planes[k] * g
            rsum = term if rsum is None else rsum + term
        upd = X + omega * D * (B - rsum)
        return jnp.where(col == c, upd, X)

    X = jax.lax.fori_loop(0, len(steps), step, X)
    o_ref[...] = X[H : H + tx]


@jax.jit
def _sweep3d_call(cache: Sweep3DCache, xf, bf):
    nx, ny, nz = cache.dims
    tx, H, nxp = cache.tx, cache.halo, cache.nxp
    n_off = len(cache.offsets)
    gx = nxp // tx
    TXH = tx + 2 * H

    dts = [ch.dtype for ch in cache.planes] + [
        cache.dinv.dtype, cache.colf.dtype, xf.dtype, bf.dtype
    ]
    n_in = len(dts)
    return pl.pallas_call(
        functools.partial(
            _sweep3d_kernel,
            offsets=cache.offsets,
            steps=cache.steps,
            omega=cache.omega,
            ny=ny,
            nz=nz,
            tx=tx,
            H=H,
            n_chunks=len(cache.planes),
        ),
        grid=(gx,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=pl.BlockSpec((tx, ny, nz), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nxp, ny, nz), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((TXH, ny, nz), d) for d in dts
        ]
        + [pltpu.SemaphoreType.DMA((n_in,))],
        interpret=cache.interpret,
    )(*cache.planes, cache.dinv, cache.colf, xf, bf)


def smooth_sweep3d(cache: Sweep3DCache, x, b):
    """One smoother application on flat padded vectors (engine contract)."""
    nx, ny, nz = cache.dims
    n = nx * ny * nz
    H, nxp = cache.halo, cache.nxp

    def gridpad(v):
        g = v[:n].reshape(nx, ny, nz)
        return jnp.pad(g, ((H, H + nxp - nx), (0, 0), (0, 0)))

    out = _sweep3d_call(cache, gridpad(x), gridpad(b))
    y = out[:nx].reshape(n)
    if cache.rows_padded > n:
        y = jnp.pad(y, (0, cache.rows_padded - n))
    return y
