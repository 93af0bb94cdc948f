"""Gather-free device operator formats: strided-diagonal (SDIA) and dense.

Why this exists — measured on the target TPU (v5e):

* XLA lowers 1-D gathers to scalar DMA loops: the padded-ELL SpMV runs at
  ~0.13 Gnnz/s regardless of size (memo: ops/pallas notes).
* A diagonal-format SpMV (shift + multiply + add, zero gathers) runs at
  8+ Gnnz/s — a ~60× difference.

AMG hierarchies on grid-like problems are banded exactly where the work is:
2-D Poisson RS levels 0-1 have 5/11 diagonals and hold ~97% of the nnz;
the transfer operators P (n_f×n_c) and R (n_c×n_f) are *rationally-strided*
banded: col ≈ (row·p)/q + offset with a handful of offsets.

:class:`SDIA` represents  y[i] = Σ_k data[k, i] · x[(i·p)//q + off_k]
with static (p, q, offsets).  Evaluation decomposes the row space by
residue r = i mod q: (i·p)//q = m·p + (r·p)//q, so each (offset, residue)
pair is ONE static strided slice of x — pure VPU work, fully fusible, no
gather anywhere.  Square banded matrices are the p=q=1 special case.

Small levels fall back to :class:`DenseOp` (one MXU matmul); anything
irregular falls back to gather-ELL (ops/sparse.ELL).
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from .sparse import ELL, as_csr, round_up

__all__ = ["SDIA", "DenseOp", "sdia_from_csr", "dense_from_csr", "mat_vec", "op_nnz"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SDIA:
    """Rationally-strided diagonal matrix (see module docstring)."""

    data: jax.Array  # [n_offsets, rows_padded]
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    p: int = dataclasses.field(metadata=dict(static=True))
    q: int = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    rows_padded: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.data.dtype


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseOp:
    """Dense operator for small levels — one MXU matmul per apply."""

    mat: jax.Array  # [rows_padded, cols] (zero rows beyond shape[0])
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    rows_padded: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.mat.dtype


def _candidate_strides(nr: int, nc: int, max_q: int = 8):
    """Candidate rational slopes p/q ≈ nc/nr to probe during detection."""
    seen = []
    ratio = nc / nr
    for q in range(1, max_q + 1):
        p = max(1, round(ratio * q))
        f = Fraction(p, q)
        if (f.numerator, f.denominator) not in seen:
            seen.append((f.numerator, f.denominator))
    return seen


def sdia_from_csr(
    M,
    dtype=None,
    row_pad: int = 8,
    max_offsets: int = 40,
    max_overhead: float = 6.0,
) -> Optional[SDIA]:
    """Try to represent ``M`` as SDIA; None if no candidate stride yields
    ≤ ``max_offsets`` distinct offsets with padding overhead
    (n_offsets·rows/nnz) ≤ ``max_overhead``."""
    M = as_csr(M)
    nr, nc = M.shape
    if nr == 0 or nc == 0 or M.nnz == 0:
        return None
    if dtype is None:
        dtype = M.dtype
    rows = np.repeat(np.arange(nr), np.diff(M.indptr))
    cols = M.indices

    best = None
    for p, q in _candidate_strides(nr, nc):
        base = (rows * p) // q
        offs = cols - base
        uniq = np.unique(offs)
        if len(uniq) > max_offsets:
            continue
        overhead = len(uniq) * nr / M.nnz
        if overhead > max_overhead:
            continue
        if best is None or len(uniq) < best[2]:
            best = (p, q, len(uniq), uniq, offs)
    if best is None:
        return None

    p, q, n_off, uniq, offs = best
    rows_padded = round_up(nr, int(np.lcm(max(row_pad, 1), q)))
    data = np.zeros((n_off, rows_padded), dtype=dtype)
    k_of = {o: k for k, o in enumerate(uniq.tolist())}
    kidx = np.array([k_of[o] for o in offs.tolist()], dtype=np.int64)
    data[kidx, rows] = M.data.astype(dtype)
    return SDIA(
        data=jnp.asarray(data),
        offsets=tuple(int(o) for o in uniq.tolist()),
        p=int(p),
        q=int(q),
        shape=(nr, nc),
        nnz=int(M.nnz),
        rows_padded=int(rows_padded),
    )


def dense_from_csr(M, dtype=None, row_pad: int = 8) -> DenseOp:
    M = as_csr(M)
    nr, nc = M.shape
    if dtype is None:
        dtype = M.dtype
    rows_padded = round_up(max(nr, 1), row_pad)
    mat = np.zeros((rows_padded, nc), dtype=dtype)
    mat[:nr] = M.toarray().astype(dtype)
    return DenseOp(mat=jnp.asarray(mat), shape=(nr, nc), nnz=int(M.nnz), rows_padded=rows_padded)


def _sdia_spmv(A: SDIA, x: jax.Array) -> jax.Array:
    """Σ_k data[k] · x[(i·p)//q + off_k] via static strided slices."""
    p, q = A.p, A.q
    n_rows, n_cols = A.shape
    Mq = A.rows_padded // q  # rows_padded is a multiple of q by construction
    xlen = x.shape[0]

    # Per (offset k, residue r): source index m·p + (r·p)//q + off_k.
    consts = [
        [(r * p) // q + off for r in range(q)] for off in A.offsets
    ]
    flat = [c for row in consts for c in row]
    min_c = min(flat)
    max_src = (Mq - 1) * p + max(flat)
    lo = max(0, -min_c)
    hi = max(0, max_src + 1 - xlen)
    if lo or hi:
        pad = [(lo, hi)] + [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pad)
    else:
        xp = x

    tail = x.shape[1:]
    y = jnp.zeros((A.rows_padded,) + tail, dtype=jnp.result_type(A.data.dtype, x.dtype))
    for k, off in enumerate(A.offsets):
        dk = A.data[k]
        if x.ndim > 1:
            dk = dk[(...,) + (None,) * (x.ndim - 1)]
        if q == 1:
            c = consts[k][0] + lo
            limit = c + (Mq - 1) * p + 1
            xs = jax.lax.slice(xp, (c,) + (0,) * (x.ndim - 1),
                               (limit,) + tail, (p,) + (1,) * (x.ndim - 1))
            y = y + dk * xs
        else:
            parts = []
            for r in range(q):
                c = consts[k][r] + lo
                limit = c + (Mq - 1) * p + 1
                xs = jax.lax.slice(xp, (c,) + (0,) * (x.ndim - 1),
                                   (limit,) + tail, (p,) + (1,) * (x.ndim - 1))
                parts.append(xs)
            # interleave residues: y_k[m·q + r] = parts[r][m]
            xk = jnp.stack(parts, axis=1).reshape((Mq * q,) + tail)
            y = y + dk * xk
    return y


def _dense_spmv(A: DenseOp, x: jax.Array) -> jax.Array:
    n_cols = A.shape[1]
    return jnp.matmul(A.mat, x[:n_cols], preferred_element_type=A.mat.dtype)


def mat_vec(A, x: jax.Array) -> jax.Array:
    """Polymorphic SpMV over the device operator formats."""
    if isinstance(A, SDIA):
        return _sdia_spmv(A, x)
    if isinstance(A, DenseOp):
        return _dense_spmv(A, x)
    if isinstance(A, ELL):
        from .spmv import ell_spmv

        return ell_spmv(A, x)
    raise TypeError(f"unknown operator format {type(A)}")


def op_nnz(A) -> int:
    return A.nnz
