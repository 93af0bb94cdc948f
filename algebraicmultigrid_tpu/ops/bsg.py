"""BSG — block-select-gather: the TPU fast path for UNSTRUCTURED matrices.

The reference solves arbitrary ``SparseMatrixCSC`` in every code path
(``/root/reference/src/multilevel.jl:214-239``, random Laplacians at
``test/runtests.jl:90-102``, elasticity at ``test/nns_test.jl:213-234``);
this framework's lattice/SDIA/dense tiers only cover structured or small
operators, and the padded-ELL fallback runs at ~0.13 Gnnz/s because XLA
lowers arbitrary gathers to scalar DMA loops.

BSG maps sparse row evaluation onto the one fast dynamic-indexing
primitive the TPU has: ``tpu.dynamic_gather``, a *vreg-local* lane shuffle
(``jnp.take_along_axis(v, idx, axis=1)`` with ``idx.shape == v.shape`` and
lane width exactly 128 — probed in ``scratch/probe_gather3.py``).  An
arbitrary gather from a banded window decomposes into (block, lane):

* rows are grouped into tiles of 1024 (one f32 vreg: 8 sublanes × 128
  lanes); the device hierarchy RCM-permutes unstructured levels so each
  tile's columns fit a window of ``ws ≤ 128`` consecutive 128-blocks of x;
* per ELL slot k the kernel loops window blocks ``u``, lane-gathers from a
  broadcast of block row ``u`` and keeps lanes whose offset's block equals
  ``u``::

      q, m = off >> 7, off & 127
      gth  = Σ_u (q == u) · take_along_axis(bcast(xw[u]), m, axis=1)
      y   += data_k ⊙ gth

Cost ≈ K·ws·5.5 vreg-ops per 1024-row tile, independent of the sparsity
pattern — no plane packing, no failure modes beyond "window too wide".
Measured on v5e (scratch/probe_bsg2.py): 22.9 Gnnz/s at (ws=8, K=5) —
RCM'd 2-D Poisson class — 14.4 at (ws=32, K=16) — elasticity class —
7-8 at ws=64.  That is ~60-180× the ELL gather fallback.

The window enters the kernel as a scalar-prefetch-indexed ``pl.Element``
block (auto double-buffered); setup is one vectorised numpy pass.
``tests/test_bsg.py`` pins the kernel (interpret mode on CPU) bitwise
against a numpy oracle and to f32 tolerance against scipy.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

from .sparse import as_csr, round_up

__all__ = ["BSG", "bsg_from_csr", "bsg_spmv", "bsg_spmv_reference", "rcm_permutation"]

LANES = 128
TILE_ROWS = 1024  # 8 sublanes × 128 lanes
_WS_CHOICES = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512)


def rcm_permutation(A) -> np.ndarray:
    """Reverse-Cuthill-McKee ordering of the symmetrised pattern — the
    row/column order that minimises BSG window spans on mesh-like graphs."""
    M = as_csr(A)
    G = (M + M.T).tocsr() if M.shape[0] == M.shape[1] else M
    return np.asarray(
        sp.csgraph.reverse_cuthill_mckee(G, symmetric_mode=True), dtype=np.int64
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSG:
    """Block-select-gather operator: y = A·x in tiled windowed-ELL form."""

    data: jax.Array  # [T, K, 8, 128] slot coefficients (0 on padding)
    off: jax.Array   # [T, K, 8, 128] int32 window offsets (0 on padding)
    m0: jax.Array    # [T] int32 first x-block of each tile's window
    qlo: jax.Array   # [T, K] int32 first window block each slot touches
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    ws: int = dataclasses.field(metadata=dict(static=True))
    qb: int = dataclasses.field(metadata=dict(static=True))  # blocks/slot sweep
    rows_padded: int = dataclasses.field(metadata=dict(static=True))
    cols_padded: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def n_tiles(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]


def bsg_from_csr(
    A,
    dtype=jnp.float32,
    ws_cap: int = 512,
    K_cap: int = 64,
    max_overhead: float = 24.0,
    row_pad: int = 8,
) -> Optional[BSG]:
    """Build a BSG operator from a (pre-permuted) host sparse matrix.

    Returns ``None`` when a 1024-row tile's column span exceeds the
    ``ws_cap·128`` window, a row is denser than ``K_cap``, the dtype has no
    32-bit gather path, or padded storage exceeds ``max_overhead × nnz`` —
    callers fall back to the padded-ELL tier.
    """
    dt = jnp.dtype(dtype)
    if dt.kind != "f" or dt.itemsize > 4:
        return None  # dynamic_gather is 32-bit; f64 solves stay on SDIA/host
    M = as_csr(A)
    n_rows, n_cols = M.shape
    if n_rows == 0 or M.nnz == 0:
        return None
    counts = np.diff(M.indptr)
    K = int(counts.max(initial=1))
    if K > K_cap:
        return None
    T = -(-n_rows // TILE_ROWS)
    if T * K * TILE_ROWS > max_overhead * max(M.nnz, 1):
        return None

    rows = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    cols = M.indices.astype(np.int64)
    tile_of = rows // TILE_ROWS
    u_of = (rows % TILE_ROWS) // LANES
    j_of = rows % LANES
    slot = np.arange(M.nnz, dtype=np.int64) - M.indptr[:-1].astype(np.int64)[rows]

    lo = np.full(T, np.iinfo(np.int64).max, dtype=np.int64)
    hi = np.zeros(T, dtype=np.int64)
    np.minimum.at(lo, tile_of, cols)
    np.maximum.at(hi, tile_of, cols)
    mask_empty = lo > hi
    lo[mask_empty], hi[mask_empty] = 0, 0
    # align window starts to 8 blocks: Mosaic must prove the window's
    # sublane offset divides the f32 tiling (pl.multiple_of hint below)
    m0 = (lo // LANES) // 8 * 8
    span = int((hi // LANES - m0 + 1).max(initial=1))
    ws = next((w for w in _WS_CHOICES if w >= span and w <= ws_cap), None)
    if ws is None:
        return None

    data = np.zeros((T, K, 8, LANES), dtype=np.dtype(dt.name))
    off = np.zeros((T, K, 8, LANES), dtype=np.int32)
    data[tile_of, slot, u_of, j_of] = M.data.astype(data.dtype)
    off[tile_of, slot, u_of, j_of] = cols - m0[tile_of] * LANES

    # per-(tile, slot) block range: CSR keeps row entries column-sorted, so
    # a slot's columns cluster tightly across a tile's rows — the kernel
    # sweeps only [qlo, qlo+qb) blocks per slot instead of the whole window
    ts_key = tile_of * K + slot
    qmin = np.full(T * K, np.iinfo(np.int64).max, dtype=np.int64)
    qmax = np.full(T * K, -1, dtype=np.int64)
    s_blk = cols // LANES - m0[tile_of]
    np.minimum.at(qmin, ts_key, s_blk)
    np.maximum.at(qmax, ts_key, s_blk)
    empty_ts = qmax < 0
    qmin[empty_ts], qmax[empty_ts] = 0, 0
    qb = int((qmax - qmin + 1).max(initial=1))
    qlo = np.minimum(qmin, ws - qb).astype(np.int32).reshape(T, K)

    return BSG(
        data=jnp.asarray(data),
        off=jnp.asarray(off),
        m0=jnp.asarray(m0.astype(np.int32)),
        qlo=jnp.asarray(qlo),
        shape=(n_rows, n_cols),
        nnz=int(M.nnz),
        ws=ws,
        qb=qb,
        rows_padded=max(round_up(n_rows, max(row_pad, 1)), row_pad),
        cols_padded=round_up(max(n_cols, 1), LANES),
    )


# --------------------------------------------------------------------------
# evaluation
# --------------------------------------------------------------------------


def _bsg_kernel(m0_ref, qlo_ref, off_ref, dat_ref, win_ref, o_ref, *, ws, K, qb):
    del m0_ref  # consumed by the window index map
    t = pl.program_id(0)
    y = jnp.zeros((8, LANES), dtype=o_ref.dtype)
    if qb * K <= 768:
        # fully unrolled: per slot, sweep only its [qlo, qlo+qb) blocks
        for k in range(K):
            ok = off_ref[0, k]
            q = jax.lax.shift_right_logical(ok, jnp.int32(7))
            m = jax.lax.bitwise_and(ok, jnp.int32(127))
            ql = qlo_ref[t, k]
            gth = jnp.zeros((8, LANES), dtype=o_ref.dtype)
            for u in range(qb):
                row = jnp.broadcast_to(win_ref[pl.ds(ql + u, 1), :], (8, LANES))
                gu = jnp.take_along_axis(row, m, axis=1)
                gth = jnp.where(q == ql + u, gu, gth)
            y = y + dat_ref[0, k] * gth
        o_ref[0] = y
    else:
        # very wide slot ranges: bound compile size with a fori sweep
        for k in range(K):
            ok = off_ref[0, k]
            q = jax.lax.shift_right_logical(ok, jnp.int32(7))
            m = jax.lax.bitwise_and(ok, jnp.int32(127))
            ql = qlo_ref[t, k]
            dat = dat_ref[0, k]

            def body(u, acc, q=q, m=m, ql=ql, dat=dat):
                row = jnp.broadcast_to(win_ref[pl.ds(ql + u, 1), :], (8, LANES))
                gu = jnp.take_along_axis(row, m, axis=1)
                return acc + jnp.where(q == ql + u, dat * gu, jnp.zeros_like(gu))

            y = jax.lax.fori_loop(0, qb, body, y)
        o_ref[0] = y


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bsg_spmv_call(B: BSG, x2d, *, interpret=False):
    from jax.experimental.pallas import tpu as pltpu

    T, K, ws = B.n_tiles, B.width, B.ws
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, 8, LANES), lambda t, m0, ql: (t, 0, 0, 0)),
            pl.BlockSpec((1, K, 8, LANES), lambda t, m0, ql: (t, 0, 0, 0)),
            # the x window: element-offset block indexed by the prefetched m0
            # (always a multiple of 8 blocks — the builder aligns it)
            pl.BlockSpec(
                (pl.Element(ws), pl.Element(LANES)),
                lambda t, m0, ql: (pl.multiple_of(m0[t], 8), 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda t, m0, ql: (t, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_bsg_kernel, ws=ws, K=K, qb=B.qb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, LANES), B.data.dtype),
        interpret=interpret,
    )(B.m0, B.qlo, B.off, B.data, x2d)


def bsg_spmv(B: BSG, x: jax.Array, interpret: Optional[bool] = None) -> jax.Array:
    """y = B·x (flat padded vectors, like the other device formats)."""
    if x.ndim != 1:
        return jnp.stack(
            [bsg_spmv(B, x[:, j], interpret) for j in range(x.shape[1])], axis=1
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc = B.cols_padded
    xc = x[:nc] if x.shape[0] >= nc else jnp.pad(x, (0, nc - x.shape[0]))
    xc = xc.astype(B.data.dtype)
    # trailing guard blocks keep the last window's read in bounds
    x2d = jnp.pad(xc.reshape(-1, LANES), ((0, B.ws), (0, 0)))
    y = _bsg_spmv_call(B, x2d, interpret=bool(interpret)).reshape(-1)
    n_rows = B.shape[0]
    y = y[:n_rows]
    if B.rows_padded > n_rows:
        y = jnp.pad(y, (0, B.rows_padded - n_rows))
    return y.astype(x.dtype) if y.dtype != x.dtype else y


def bsg_spmv_reference(B: BSG, x: np.ndarray) -> np.ndarray:
    """Pure-numpy evaluation of the exact BSG semantics (test oracle)."""
    nc = B.cols_padded
    dt = np.asarray(B.data).dtype
    xp = np.zeros(nc + B.ws * LANES, dtype=dt)
    xp[: min(nc, len(x))] = np.asarray(x)[:nc].astype(dt)
    x2d = xp.reshape(-1, LANES)
    off, dat, m0 = (np.asarray(a) for a in (B.off, B.data, B.m0))
    T, K = B.n_tiles, B.width
    out = np.zeros((T, 8, LANES), dtype=dt)
    for t in range(T):
        xw = x2d[m0[t] : m0[t] + B.ws]
        for k in range(K):
            q, m = off[t, k] >> 7, off[t, k] & 127
            gth = np.zeros((8, LANES), dtype=dt)
            for u in range(B.ws):
                gu = np.take_along_axis(np.broadcast_to(xw[u : u + 1, :], (8, LANES)), m, axis=1)
                gth = np.where(q == u, gu, gth)
            out[t] += dat[t, k] * gth
    y = out.reshape(-1)[: B.shape[0]]
    return np.pad(y, (0, B.rows_padded - B.shape[0]))
