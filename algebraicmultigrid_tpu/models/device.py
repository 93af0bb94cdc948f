"""Device (JAX) solve engine — the TPU-native hot path.

The reference's solve phase is scalar Julia loops over CSC
(``/root/reference/src/multilevel.jl:214-239``, ``src/smoother.jl:73-90``).
Here the entire cycle is a single jitted computation over a static pytree
hierarchy:

* every level's A/P/R is a padded :class:`~..ops.sparse.ELL` matrix — all
  SpMVs are dense-regular gather+reduce ops, shapes static under ``jit``;
* level vectors stay padded end-to-end (no dynamic slicing inside the cycle);
* smoothers are (a) weighted Jacobi, (b) **multicolor** GS/SOR — color-by-
  color batched row updates, a true Gauss-Seidel for the color-permuted
  ordering with no sequential recurrence (the TPU answer to survey §2.8's
  "hardest to vectorise" note), or (c) an exact natural-order ``lax.scan``
  recurrence for conformance with the reference's sweep semantics;
* the V/W/F recursion (multilevel.jl:200-212) unrolls at trace time over the
  static level list; the iteration loop is a ``lax.while_loop`` carrying the
  on-device residual norm — zero host↔device sync until convergence;
* the coarse solve is a replicated dense pinv-matmul / QR triangular solve
  (coarse_solver.jl:9-16,66-81 semantics, incl. the singular path).
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import (
    BackwardSweep,
    Cycle,
    F,
    ForwardSweep,
    GaussSeidel,
    Jacobi,
    SOR,
    SymmetricSweep,
    V,
    W,
)
from ..ops.banded import BTOp, DenseOp, SDIA, bt_from_csr, dense_from_csr, mat_vec, sdia_from_csr
from ..ops.coloring import graph_coloring
from ..ops.sparse import ELL, ell_from_csr, round_up
from ..ops.spmv import ell_spmv
from .coarse import Pinv, QRSolver
from .multilevel import MultiLevel

def as_csr_cached(M):
    import scipy.sparse as _sp

    return M.tocsr() if _sp.issparse(M) else M


__all__ = [
    "DeviceLevel",
    "DeviceHierarchy",
    "build_device_hierarchy",
    "device_cycle_fn",
    "run_fixed_cycles",
    "solve_device",
    "cg_device",
    "solve_refined",
]


# --------------------------------------------------------------------------
# smoother caches
# --------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JacobiCache:
    """x ← x + ω·D⁻¹(b − Ax); zero-diag rows frozen (smoother.jl:101-171)."""

    dinv: jax.Array  # [rows_padded], 0 where diag == 0 (freeze)
    omega: float = dataclasses.field(metadata=dict(static=True))
    iter: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MulticolorCache:
    """Stacked per-color row blocks for parallel GS/SOR sweeps.

    Zero-diagonal rows are excluded from every color (frozen — the
    reference's ``ifelse(d == 0, x[i], …)`` skip).  ``rows`` is padded with
    an out-of-range sentinel; scatters use ``mode='drop'``.
    """

    rows: jax.Array  # i32[n_colors, cmax]
    data: jax.Array  # [n_colors, cmax, width] with diagonal slot zeroed
    cols: jax.Array  # i32[n_colors, cmax, width]
    dinv: jax.Array  # [n_colors, cmax]
    omega: float = dataclasses.field(metadata=dict(static=True))
    iter: int = dataclasses.field(metadata=dict(static=True))
    forward: bool = dataclasses.field(metadata=dict(static=True))
    backward: bool = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScanGSCache:
    """Exact natural-order GS/SOR recurrence via ``lax.scan`` (conformance
    path; sequential — not the TPU hot path)."""

    diag: jax.Array  # [rows_padded]
    omega: float = dataclasses.field(metadata=dict(static=True))
    iter: int = dataclasses.field(metadata=dict(static=True))
    forward: bool = dataclasses.field(metadata=dict(static=True))
    backward: bool = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaskedMulticolorCache:
    """Gather-free multicolor GS/SOR: per color, one full SpMV + masked
    blend.  Identical updates to the gather variant (same coloring), but
    every op is dense-regular — the pairing for SDIA/Dense operator formats
    where SpMV is 60× faster than gathers on TPU.  Frozen (zero-diag) and
    padding rows carry color id = n_colors and are never selected."""

    color_of: jax.Array  # i32[rows_padded]
    dinv: jax.Array  # [rows_padded]
    n_colors: int = dataclasses.field(metadata=dict(static=True))
    omega: float = dataclasses.field(metadata=dict(static=True))
    iter: int = dataclasses.field(metadata=dict(static=True))
    forward: bool = dataclasses.field(metadata=dict(static=True))
    backward: bool = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceLevel:
    A: Any  # Lat2D | SDIA | DenseOp | ELL
    P: Any
    R: Any
    pre: Any
    post: Any
    fused: Any = None  # FusedLegCache — whole-leg Pallas kernels (Lat2D levels)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CoarseCache:
    """Dense replicated coarse solve operand(s)."""

    mat: jax.Array  # pinv matrix, or stacked QR as (Q, R) below
    qr_q: jax.Array
    qr_r: jax.Array
    kind: str = dataclasses.field(metadata=dict(static=True))  # 'pinv' | 'qr'
    n: int = dataclasses.field(metadata=dict(static=True))
    rows_padded: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceHierarchy:
    levels: Tuple[DeviceLevel, ...]
    coarse: CoarseCache
    final_A: ELL  # for the outer residual when the hierarchy is trivial
    # whole-coarse-tail Pallas kernel (ops/pallas/tail_kernel.py): one
    # pallas_call executing every level ≥ tail_start plus the dense coarse
    # solve — kills the ~0.3 ms/op dispatch overhead of the small levels
    tail: Any = None
    tail_start: int = dataclasses.field(default=-1, metadata=dict(static=True))
    # phased whole-subcycle kernel (ops/pallas/subcycle_kernel.py): the mid
    # level in slab phases + the tail recursion, one pallas_call for the
    # ENTIRE sub-hierarchy below sub_start−1
    sub: Any = None
    sub_start: int = dataclasses.field(default=-1, metadata=dict(static=True))
    # fine-level RCM basis (BSG levels): the cycle runs in the permuted
    # basis; solve entry applies perm0 to b and exit iperm0 to x (both are
    # padded-identity-extended int32 index vectors; None = natural order)
    perm0: Any = None
    iperm0: Any = None

    @property
    def n_fine(self) -> int:
        return self.levels[0].A.shape[0] if self.levels else self.coarse.n

    @property
    def fine_padded(self) -> int:
        return self.levels[0].A.rows_padded if self.levels else self.coarse.rows_padded


# --------------------------------------------------------------------------
# smoother application
# --------------------------------------------------------------------------


def fit_len(v: jax.Array, n: int) -> jax.Array:
    """Pad-or-slice the leading axis to exactly n (operator formats may
    produce different internal paddings)."""
    m = v.shape[0]
    if m == n:
        return v
    if m > n:
        return v[:n]
    pad = [(0, n - m)] + [(0, 0)] * (v.ndim - 1)
    return jnp.pad(v, pad)


def _smooth_jacobi(cache: JacobiCache, A, x, b):
    n = x.shape[0]
    for _ in range(cache.iter):
        r = b - fit_len(mat_vec(A, x), n)
        dinv = cache.dinv if x.ndim == 1 else cache.dinv[:, None]
        x = x + cache.omega * dinv * r
    return x


def _smooth_masked_multicolor(cache: MaskedMulticolorCache, A, x, b):
    n = x.shape[0]
    dinv = cache.dinv if x.ndim == 1 else cache.dinv[:, None]

    def color_step(c, x):
        r = b - fit_len(mat_vec(A, x), n)
        upd = x + cache.omega * dinv * r
        sel = cache.color_of == c
        if x.ndim > 1:
            sel = sel[:, None]
        return jnp.where(sel, upd, x)

    from ..ops.coloring import color_steps

    for c in color_steps(
        cache.n_colors, cache.iter, cache.forward, cache.backward, cache.omega
    ):
        x = color_step(c, x)
    return x


def _color_step(cache: MulticolorCache, c, x, b):
    rows = cache.rows[c]
    data = cache.data[c]
    cols = cache.cols[c]
    dinv = cache.dinv[c]
    xg = jnp.take(x, cols, axis=0)  # [cmax, width, ...]
    if x.ndim == 1:
        rsum = jnp.einsum("cw,cw->c", data, xg)
        bc = jnp.take(b, rows, mode="clip", axis=0)
        xc = jnp.take(x, rows, mode="clip", axis=0)
        upd = (1 - cache.omega) * xc + cache.omega * dinv * (bc - rsum)
    else:
        rsum = jnp.einsum("cw,cwk->ck", data, xg)
        bc = jnp.take(b, rows, mode="clip", axis=0)
        xc = jnp.take(x, rows, mode="clip", axis=0)
        upd = (1 - cache.omega) * xc + cache.omega * dinv[:, None] * (bc - rsum)
    return x.at[rows].set(upd, mode="drop")


def _smooth_multicolor(cache: MulticolorCache, A: ELL, x, b):
    n_colors = cache.rows.shape[0]
    for _ in range(cache.iter):
        if cache.forward:
            x = jax.lax.fori_loop(
                0, n_colors, lambda c, xx: _color_step(cache, c, xx, b), x
            )
        if cache.backward:
            x = jax.lax.fori_loop(
                0,
                n_colors,
                lambda c, xx: _color_step(cache, n_colors - 1 - c, xx, b),
                x,
            )
    return x


def _scan_sweep(cache: ScanGSCache, A: ELL, x, b, reverse: bool):
    rows_padded = A.rows_padded
    w = cache.omega

    def body(x, i):
        data = A.data[i]
        cols = A.cols[i]
        d = cache.diag[i]
        xg = jnp.take(x, cols, axis=0)
        if x.ndim == 1:
            rsum = jnp.sum(data * xg) - d * x[i]
            cand = (1 - w) * x[i] + w * (b[i] - rsum) / jnp.where(d == 0, 1, d)
        else:
            rsum = jnp.einsum("w,wk->k", data, xg) - d * x[i]
            cand = (1 - w) * x[i] + w * (b[i] - rsum) / jnp.where(d == 0, 1, d)
        newval = jnp.where(d == 0, x[i], cand)
        return x.at[i].set(newval), None

    idx = jnp.arange(rows_padded)
    x, _ = jax.lax.scan(body, x, idx, reverse=reverse)
    return x


def _smooth_scan_gs(cache: ScanGSCache, A: ELL, x, b):
    for _ in range(cache.iter):
        if cache.forward:
            x = _scan_sweep(cache, A, x, b, reverse=False)
        if cache.backward:
            x = _scan_sweep(cache, A, x, b, reverse=True)
    return x


def _apply_smoother(cache, A, x, b):
    from ..ops.blockgs import BlockGSCache, smooth_blockgs
    from ..ops.pallas.gs_kernel import PallasGSCache, smooth_pallas_gs
    from ..ops.pallas.sweep3d_kernel import Sweep3DCache, smooth_sweep3d

    if isinstance(cache, PallasGSCache):
        if x.ndim == 1:
            return smooth_pallas_gs(cache, x, b)
        cache = cache.fallback  # multi-RHS → masked sweep
    if isinstance(cache, Sweep3DCache):
        if x.ndim == 1:
            return smooth_sweep3d(cache, x, b)
        cache = cache.fallback  # multi-RHS → masked sweep
    if isinstance(cache, JacobiCache):
        return _smooth_jacobi(cache, A, x, b)
    if isinstance(cache, BlockGSCache):
        return smooth_blockgs(cache, A, x, b)
    if isinstance(cache, MaskedMulticolorCache):
        return _smooth_masked_multicolor(cache, A, x, b)
    if isinstance(cache, MulticolorCache):
        return _smooth_multicolor(cache, A, x, b)
    if isinstance(cache, ScanGSCache):
        return _smooth_scan_gs(cache, A, x, b)
    raise TypeError(f"unknown device smoother cache {type(cache)}")


# --------------------------------------------------------------------------
# building the device hierarchy
# --------------------------------------------------------------------------


def _build_smoother_cache(config, A_csr, A_dev, dtype, colors=None, sym=False):
    from .lattice import LatticeMatrix
    from .lattice_nd import LatticeMatrixND

    if isinstance(A_csr, LatticeMatrixND):
        cache = _build_lattice_nd_smoother_cache(config, A_csr, A_dev, dtype)
        if cache is not None:
            return cache
        A_csr = A_csr.tocsr()  # rare fallback: materialise
    if isinstance(A_csr, LatticeMatrix):
        cache = _build_lattice_smoother_cache(config, A_csr, A_dev, dtype)
        if cache is not None:
            return cache
        A_csr = A_csr.tocsr()  # rare fallback: materialise

    rows_padded = A_dev.rows_padded
    d = np.zeros(rows_padded, dtype=dtype)
    d[: A_csr.shape[0]] = A_csr.diagonal().astype(dtype)

    if isinstance(config, Jacobi):
        dinv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0).astype(dtype)
        return JacobiCache(dinv=jnp.asarray(dinv), omega=float(config.omega), iter=config.iter)

    if isinstance(config, (GaussSeidel, SOR)):
        omega = float(config.omega) if isinstance(config, SOR) else 1.0
        fwd = isinstance(config.sweep, (ForwardSweep, SymmetricSweep))
        bwd = isinstance(config.sweep, (BackwardSweep, SymmetricSweep))
        if config.ordering == "multicolor":
            if isinstance(A_dev, ELL):
                return _build_multicolor_cache(A_csr, A_dev, dtype, omega, config.iter, fwd, bwd, sym=sym)
            return _build_masked_multicolor_cache(
                A_csr, rows_padded, dtype, omega, config.iter, fwd, bwd, colors, sym=sym
            )
        if not isinstance(A_dev, ELL):
            raise TypeError("natural-order GS requires the ELL device format")
        return ScanGSCache(
            diag=jnp.asarray(d), omega=omega, iter=config.iter, forward=fwd, backward=bwd
        )
    raise TypeError(f"unknown smoother config {config!r}")


def _build_lattice_nd_smoother_cache(config, A_lnd, A_dev, dtype):
    """O(boundary)-metadata smoother caches for N-D lattice levels:
    periodic torus coloring + host diagonal expansion (the N-D counterpart
    of :func:`_build_lattice_smoother_cache`; device-side expansion can
    follow if the O(n) upload shows up in profiles)."""
    from .lattice_nd import lattice_coloring_nd

    spec = A_lnd.spec
    rows_padded = A_dev.rows_padded
    n = A_lnd.shape[0]
    diag = spec.diagonal()
    active = diag != 0

    if isinstance(config, Jacobi):
        dv = np.zeros(rows_padded, dtype=dtype)
        dv[:n] = np.where(active, 1.0 / np.where(active, diag, 1), 0.0)
        return JacobiCache(dinv=jnp.asarray(dv), omega=float(config.omega), iter=config.iter)

    if isinstance(config, (GaussSeidel, SOR)) and config.ordering == "multicolor":
        got = lattice_coloring_nd(spec)
        if got is None:
            return None
        tab, n_colors = got
        reps = [-(-W // p) for W, p in zip(spec.row_dims, tab.shape)]
        colors = np.tile(tab, reps)[tuple(slice(0, W) for W in spec.row_dims)].ravel()
        omega = float(config.omega) if isinstance(config, SOR) else 1.0
        fwd = isinstance(config.sweep, (ForwardSweep, SymmetricSweep))
        bwd = isinstance(config.sweep, (BackwardSweep, SymmetricSweep))
        color_of = np.full(rows_padded, n_colors, dtype=np.int32)
        color_of[:n] = np.where(active, colors, n_colors)
        dinv = np.zeros(rows_padded, dtype=dtype)
        dinv[:n] = np.where(active, 1.0 / np.where(active, diag, 1), 0.0)
        masked = MaskedMulticolorCache(
            color_of=jnp.asarray(color_of),
            dinv=jnp.asarray(dinv),
            n_colors=n_colors,
            omega=omega,
            iter=config.iter,
            forward=fwd,
            backward=bwd,
        )
        # fused Pallas sweep: all color steps in one pallas_call with the
        # planes VMEM-resident across steps (ops/pallas/sweep3d_kernel.py).
        # OPT-IN (AMG_SWEEP3D=1): semantics are pinned vs the masked sweep
        # under the interpreter, but this environment's remote Mosaic
        # compile helper crashes (subprocess exit 1, no diagnostics) on the
        # kernel's 3-D scratch forms — probes in scratch/real_mimic.py,
        # scratch/roll_combo2.py narrow it to large-buffer roll/3-D-op
        # graphs.  The masked multicolor sweep stays the TPU default.
        if os.environ.get("AMG_SWEEP3D") == "1" and not (diag == 0).any():
            on_tpu = jax.default_backend() == "tpu"
            from ..ops.pallas.sweep3d_kernel import build_sweep3d_cache

            coef = (
                jnp.bfloat16
                if os.environ.get("AMG_COEF_DTYPE", "") == "bfloat16"
                and jnp.dtype(dtype) == jnp.float32
                else None
            )
            return build_sweep3d_cache(
                spec, rows_padded, dtype, omega, config.iter, fwd, bwd,
                interpret=not on_tpu, fallback=masked, coef_dtype=coef,
            )
        return masked
    return None


def _lattice_diag_plane(Td, cx, cy):
    """[Wx, Wy] diagonal plane from the diag-offset class table — one-hot MXU
    matmuls, exact selection (see ops/lattice_op.expand_planes_device)."""
    Ex = (cx[:, None] == jnp.arange(Td.shape[0], dtype=cx.dtype)).astype(Td.dtype)
    Ey = (cy[:, None] == jnp.arange(Td.shape[1], dtype=cy.dtype)).astype(Td.dtype)
    return jnp.einsum(
        "xc,cd,yd->xy", Ex, Td, Ey, precision=jax.lax.Precision.HIGHEST
    )


@partial(jax.jit, static_argnames=("rows_padded", "dtype_name"))
def _lattice_jacobi_dinv_jit(Td, cx, cy, *, rows_padded, dtype_name):
    dt = jnp.dtype(dtype_name)
    diag = _lattice_diag_plane(Td, cx, cy)
    dv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
    dv = dv.astype(dt).ravel()
    return jnp.pad(dv, (0, rows_padded - dv.shape[0]))


@partial(jax.jit, static_argnames=("rows_padded", "n_colors", "dtype_name"))
def _lattice_masked_arrays_jit(Td, cx, cy, grid, *, rows_padded, n_colors, dtype_name):
    """color_of + dinv for a lattice level built ON DEVICE: uploads the tiny
    diag table, two O(W) class vectors and the (a, b) color tile instead of
    two O(n) arrays (a tunnel POST each on axon)."""
    dt = jnp.dtype(dtype_name)
    Wx, Wy = cx.shape[0], cy.shape[0]
    diag = _lattice_diag_plane(Td, cx, cy)
    a, b = grid.shape
    colors = jnp.tile(grid, (-(-Wx // a), -(-Wy // b)))[:Wx, :Wy]
    active = diag != 0
    dinv = jnp.where(active, 1.0 / jnp.where(active, diag, 1.0), 0.0).astype(dt).ravel()
    col = jnp.where(active, colors, n_colors).astype(jnp.int32).ravel()
    nn = Wx * Wy
    return (
        jnp.pad(col, (0, rows_padded - nn), constant_values=n_colors),
        jnp.pad(dinv, (0, rows_padded - nn)),
    )


def _build_lattice_smoother_cache(config, A_lat, A_dev, dtype):
    """O(boundary) smoother caches for lattice levels: periodic torus
    coloring + diagonal expansion, no O(nnz) graph analysis."""
    from .lattice import lattice_coloring

    spec = A_lat.spec
    rows_padded = A_dev.rows_padded
    n = A_lat.shape[0]
    host_expand = (
        np.dtype(spec.table.dtype).kind != "f"
        or os.environ.get("AMG_HOST_EXPAND") == "1"
    )

    def _diag_table():
        try:
            di = spec.offsets.index((0, 0))
        except ValueError:
            di = -1
        comp = np.float32 if jnp.dtype(dtype).itemsize <= 4 else np.dtype(dtype)
        if di >= 0:
            return di, np.asarray(spec.table[di], dtype=comp)
        return di, np.zeros(spec.table.shape[1:], dtype=comp)

    if isinstance(config, Jacobi):
        if host_expand:
            diag = spec.diagonal().astype(dtype)
            dv = np.zeros(rows_padded, dtype=dtype)
            dv[:n] = np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1), 0.0)
            dinv = jnp.asarray(dv)
        else:
            cx, cy = spec.row_class_arrays()
            _, Td = _diag_table()
            dinv = _lattice_jacobi_dinv_jit(
                jnp.asarray(Td),
                jnp.asarray(cx.astype(np.int32)),
                jnp.asarray(cy.astype(np.int32)),
                rows_padded=rows_padded,
                dtype_name=jnp.dtype(dtype).name,
            )
        return JacobiCache(dinv=dinv, omega=float(config.omega), iter=config.iter)

    if isinstance(config, (GaussSeidel, SOR)) and config.ordering == "multicolor":
        got = lattice_coloring(spec)
        if got is None:
            return None
        grid, n_colors = got
        omega = float(config.omega) if isinstance(config, SOR) else 1.0
        fwd = isinstance(config.sweep, (ForwardSweep, SymmetricSweep))
        bwd = isinstance(config.sweep, (BackwardSweep, SymmetricSweep))

        if os.environ.get("AMG_BLOCK_GS") == "1":
            # Blocked grid-colored sweep: one matvec-equivalent of HBM
            # traffic per sweep in theory — but MEASURED 20× slower than the
            # masked sweep on TPU v5e: the de-interleave transposes are
            # stride-2/3 lane relayouts, which XLA executes as slow
            # gather-like copies.  Kept behind a flag as the reference
            # implementation for the Pallas in-VMEM variant.
            from ..ops.blockgs import build_blockgs_cache

            return build_blockgs_cache(
                spec, grid, n_colors, dtype, omega, config.iter, fwd, bwd
            )

        a, b = grid.shape
        Wx, Wy = spec.row_dims
        if host_expand:
            diag = spec.diagonal().astype(dtype)
            colors = grid[(np.arange(Wx) % a)[:, None], (np.arange(Wy) % b)[None, :]].ravel()
            color_of = np.full(rows_padded, n_colors, dtype=np.int32)
            active = diag != 0
            color_of[:n] = np.where(active, colors, n_colors)
            dinv = np.zeros(rows_padded, dtype=dtype)
            dinv[:n] = np.where(active, 1.0 / np.where(active, diag, 1), 0.0)
            col_dev, dinv_dev = jnp.asarray(color_of), jnp.asarray(dinv)
            active_all = bool(active.all())
        else:
            from .lattice import class_populations

            cx, cy = spec.row_class_arrays()
            diag_idx, Td = _diag_table()
            col_dev, dinv_dev = _lattice_masked_arrays_jit(
                jnp.asarray(Td),
                jnp.asarray(cx.astype(np.int32)),
                jnp.asarray(cy.astype(np.int32)),
                jnp.asarray(np.asarray(grid, dtype=np.int32)),
                rows_padded=rows_padded,
                n_colors=n_colors,
                dtype_name=jnp.dtype(dtype).name,
            )
            # table-level activity check (a zero diag entry only deactivates
            # rows if its boundary class is populated at this size)
            px = class_populations(Wx, spec.Kx, spec.sx)
            py = class_populations(Wy, spec.Ky, spec.sy)
            if diag_idx >= 0:
                dtab = np.asarray(spec.table[diag_idx])
                active_all = bool(
                    np.all((dtab != 0) | (px[:, None] == 0) | (py[None, :] == 0))
                )
            else:
                active_all = n == 0
        masked = MaskedMulticolorCache(
            color_of=col_dev,
            dinv=dinv_dev,
            n_colors=n_colors,
            omega=omega,
            iter=config.iter,
            forward=fwd,
            backward=bwd,
        )
        flag = os.environ.get("AMG_PALLAS_GS", "")
        on_tpu = jax.default_backend() == "tpu"
        # default: fused Pallas sweep on real TPUs; interpret-mode only when
        # explicitly requested (AMG_PALLAS_GS=1 on CPU — far too slow as a
        # test-suite default)
        use_pallas = (
            active_all
            and (flag == "1" or (flag != "0" and on_tpu))
            and os.environ.get("_AMG_SKIP_PALLAS_GS") != "1"
        )
        if use_pallas:
            from ..ops.pallas.gs_kernel import build_pallas_gs_cache

            return build_pallas_gs_cache(
                spec, grid, n_colors, dtype, omega, config.iter, fwd, bwd,
                interpret=not on_tpu, fallback=masked,
            )
        return masked
    return None  # natural-order GS etc. → materialise + generic cache


def _build_masked_multicolor_cache(A_csr, rows_padded, dtype, omega, iters, fwd, bwd, colors=None, sym=False):
    n = A_csr.shape[0]
    if colors is None:
        colors = graph_coloring(A_csr, assume_symmetric=sym)
    diag = A_csr.diagonal()
    n_colors = int(colors.max()) + 1 if n else 1
    color_of = np.full(rows_padded, n_colors, dtype=np.int32)
    active = diag != 0
    color_of[:n] = np.where(active, colors, n_colors)
    dinv = np.zeros(rows_padded, dtype=dtype)
    dinv[:n] = np.where(active, 1.0 / np.where(active, diag, 1), 0.0)
    return MaskedMulticolorCache(
        color_of=jnp.asarray(color_of),
        dinv=jnp.asarray(dinv),
        n_colors=n_colors,
        omega=omega,
        iter=iters,
        forward=fwd,
        backward=bwd,
    )


def _build_multicolor_cache(A_csr, A_ell: ELL, dtype, omega, iters, fwd, bwd, sym=False):
    n = A_csr.shape[0]
    colors = graph_coloring(A_csr, assume_symmetric=sym)
    diag = A_csr.diagonal()
    active = diag != 0  # zero-diag rows frozen
    n_colors = int(colors.max()) + 1 if n else 1

    groups = [np.flatnonzero((colors == c) & active) for c in range(n_colors)]
    groups = [g for g in groups if g.size > 0] or [np.zeros(0, dtype=np.int64)]
    n_colors = len(groups)
    cmax = max(max(g.size for g in groups), 1)
    width = A_ell.width
    sentinel = A_ell.rows_padded  # out of range → dropped scatters

    rows = np.full((n_colors, cmax), sentinel, dtype=np.int32)
    data = np.zeros((n_colors, cmax, width), dtype=dtype)
    cols = np.zeros((n_colors, cmax, width), dtype=np.int32)
    dinv = np.zeros((n_colors, cmax), dtype=dtype)

    h_data = np.asarray(A_ell.data)
    h_cols = np.asarray(A_ell.cols)
    for c, g in enumerate(groups):
        rows[c, : g.size] = g
        dd = h_data[g].astype(dtype).copy()
        cc = h_cols[g]
        dd[cc == g[:, None]] = 0  # zero the diagonal slots → rsum is off-diag
        data[c, : g.size] = dd
        cols[c, : g.size] = cc
        dinv[c, : g.size] = 1.0 / diag[g]

    return MulticolorCache(
        rows=jnp.asarray(rows),
        data=jnp.asarray(data),
        cols=jnp.asarray(cols),
        dinv=jnp.asarray(dinv),
        omega=omega,
        iter=iters,
        forward=fwd,
        backward=bwd,
    )


def _maybe_build_fused_legs(level, dtype):
    """Fused down/up Pallas legs for a lattice level: requires Lat2D A/P/R
    with box-k ratios, equal symmetric multicolor GS pre/post configs, and a
    periodic coloring.  None → the unfused path runs."""
    from .lattice import LatticeMatrix, lattice_coloring

    flag = os.environ.get("AMG_PALLAS_FUSED", "")
    on_tpu = jax.default_backend() == "tpu"
    if not (flag == "1" or (flag != "0" and on_tpu)):
        return None
    if not all(isinstance(M, LatticeMatrix) for M in (level.A, level.P, level.R)):
        return None
    cfg = level.presmoother_config
    if cfg != level.postsmoother_config:
        return None
    if not (isinstance(cfg, (GaussSeidel, SOR)) and cfg.ordering == "multicolor"):
        return None
    if not isinstance(cfg.sweep, SymmetricSweep):
        return None
    got = lattice_coloring(level.A.spec)
    if got is None:
        return None
    grid, n_colors = got
    from ..ops.pallas.vcycle_kernels import build_fused_leg_cache

    omega = float(cfg.omega) if isinstance(cfg, SOR) else 1.0

    # factored-prolongator extras, when the SA setup stashed them: T as a
    # LatticeMatrix and the ω·D̃⁻¹ scale as a class table or raw vector
    factored_T = None
    if os.environ.get("AMG_FACTORED_P", "") != "0":
        T_t = getattr(level, "T_tent", None)
        s_t = getattr(level, "psmooth_scale", None)
        if isinstance(T_t, LatticeMatrix) and s_t is not None:
            if isinstance(s_t, tuple) and s_t and s_t[0] == "table":
                factored_T = (T_t.spec, s_t)
            else:
                factored_T = (T_t.spec, ("vector", np.asarray(s_t)))

    return build_fused_leg_cache(
        level.A.spec,
        level.R.spec,
        level.P.spec,
        grid,
        n_colors,
        dtype,
        omega,
        cfg.iter,
        True,
        True,
        interpret=not on_tpu,
        factored_T=factored_T,
    )


def _build_coarse_cache(ml: MultiLevel, dtype, rows_padded: int) -> CoarseCache:
    cs = ml.coarse_solver
    n = ml.final_A.shape[0]
    zero = jnp.zeros((0, 0), dtype=dtype)
    if isinstance(cs, QRSolver) and not cs._singular and cs.Q is not None:
        return CoarseCache(
            mat=zero,
            qr_q=jnp.asarray(cs.Q.astype(dtype)),
            qr_r=jnp.asarray(cs.R.astype(dtype)),
            kind="qr",
            n=n,
            rows_padded=rows_padded,
        )
    pinvA = cs.pinvA if getattr(cs, "pinvA", None) is not None else np.linalg.pinv(
        ml.final_A.toarray()
    )
    return CoarseCache(
        mat=jnp.asarray(pinvA.astype(dtype)),
        qr_q=zero,
        qr_r=zero,
        kind="pinv",
        n=n,
        rows_padded=rows_padded,
    )


def build_device_hierarchy(
    ml: MultiLevel, dtype=None, row_pad: int = 8, dense_threshold: int = 2048
) -> DeviceHierarchy:
    """Lower a host hierarchy to the static-shape device pytree.

    ``row_pad`` pads every level's row space (8 = f32 sublane; the parallel
    tier passes ``8·n_shards`` so row-sharding divides evenly)."""
    if dtype is None:
        dtype = jnp.asarray(np.zeros(0, dtype=ml.dtype)).dtype
    dtype = jnp.dtype(dtype)

    def device_cfg(cfg, n):
        """The smoother config the DEVICE engine runs.  Natural-order GS/SOR
        means the exact lax.scan recurrence over ELL rows — O(n) sequential,
        only sensible for small levels.  On large levels the TPU engine
        promotes to multicolor ordering (same smoother family; the
        reference contract is convergence, not sweep order — SURVEY §2.8 /
        test/test_smoothers.jl:15-45).  ``AMG_DEVICE_NATURAL_GS=1`` opts
        out and keeps the exact sequential semantics everywhere."""
        if (
            isinstance(cfg, (GaussSeidel, SOR))
            and cfg.ordering == "natural"
            and n > dense_threshold
            and os.environ.get("AMG_DEVICE_NATURAL_GS") != "1"
        ):
            import dataclasses as _dc

            return _dc.replace(cfg, ordering="multicolor")
        return cfg

    def needs_ell(level):
        # natural-order GS/SOR runs the exact lax.scan recurrence over ELL rows
        n = level.A.shape[0]
        for cfg in (level.presmoother_config, level.postsmoother_config):
            if isinstance(device_cfg(cfg, n), (GaussSeidel, SOR)) and device_cfg(cfg, n).ordering == "natural":
                return True
        return False

    def lower(M, target_pad, force_ell=False, square=False):
        """Pick the fastest representation: Lat2D (lattice levels) → SDIA
        (gather-free strided bands) → Dense (small, one MXU matmul) → BSG
        (windowed block-select gather, unstructured-banded) → ELL (gather
        fallback)."""
        from .lattice import LatticeMatrix
        from .lattice_nd import LatticeMatrixND
        from ..ops.lattice_op import lat2d_from_spec
        from ..ops.lattice_nd_op import latnd_from_spec
        from ..ops.bsg import bsg_from_csr

        if isinstance(M, LatticeMatrixND):
            if force_ell:
                M = M.tocsr()
            else:
                return latnd_from_spec(M.spec, dtype=dtype, row_pad=target_pad)
        if isinstance(M, LatticeMatrix):
            if force_ell:
                M = M.tocsr()
            else:
                return lat2d_from_spec(M.spec, dtype=dtype, row_pad=target_pad)
        if not force_ell:
            # smaller levels tolerate wider diagonal sets (padding overhead
            # is bounded separately by max_overhead)
            mo = 40 if max(M.shape) > 100_000 else 96
            S = sdia_from_csr(M, dtype=dtype, row_pad=target_pad, max_offsets=mo, max_overhead=8.0)
            if S is not None:
                return S
            B = bt_from_csr(M, dtype=dtype, row_pad=target_pad)
            if B is not None:
                return B
            if max(M.shape) <= dense_threshold:
                return dense_from_csr(M, dtype=dtype, row_pad=target_pad)
            # natural-order BSG only for modest windows — beyond ws=64 the
            # q-sweep cost dominates and the RCM-permuted basis (narrow
            # windows) is the right lowering; lower_square tries it next
            G = bsg_from_csr(M, dtype=dtype, row_pad=target_pad, ws_cap=64)
            if G is not None:
                return G
        return ell_from_csr(M, dtype=dtype, row_pad=target_pad)

    def lower_square(level):
        """Lower a level's A, possibly adopting an RCM-permuted basis for
        the whole level: unstructured matrices whose natural order is not
        BSG-viable get ``A[π][:,π]``; the caller folds π into P/R and the
        smoother caches so the cycle runs entirely in the permuted basis
        (solve entry/exit applies π once per solve)."""
        from .lattice import LatticeMatrix
        from .lattice_nd import LatticeMatrixND
        from ..ops.bsg import bsg_from_csr, rcm_permutation

        M = level.A
        force = needs_ell(level)
        if isinstance(M, (LatticeMatrix, LatticeMatrixND)) or force:
            return lower(M, row_pad, force_ell=force, square=True), None, None
        A_dev = lower(M, row_pad, square=True)
        if not isinstance(A_dev, ELL):
            return A_dev, None, None
        # natural order fell through to the gather tier — try the RCM basis
        A_csr = as_csr_cached(M)
        pi = rcm_permutation(A_csr)
        if np.array_equal(pi, np.arange(A_csr.shape[0])):
            return A_dev, None, None
        Ap = A_csr[pi][:, pi].tocsr()
        G = bsg_from_csr(Ap, dtype=dtype, row_pad=row_pad)
        if G is None:
            return A_dev, None, None
        return G, pi, Ap

    dev_levels = []
    pad_of_level = []  # canonical padded length of each level's row space
    perm_of_level = []  # RCM basis per level (None = natural order)
    for level in ml.levels:
        A_dev, pi, Ap = lower_square(level)
        pad_of_level.append(A_dev.rows_padded)
        perm_of_level.append(pi)
        dev_levels.append((level, A_dev, Ap))
    perm_of_level.append(None)  # the final (dense-solve) level stays natural

    final_pad = round_up(max(ml.final_A.shape[0], 1), row_pad)
    pad_of_level.append(final_pad)

    # whole-coarse-tail kernel: longest trailing run of small fused-capable
    # levels collapses to ONE pallas_call per cycle (V-cycles only).  Built
    # BEFORE the per-level loop so covered levels skip their (expensive —
    # one device-expansion compile each) fused-leg and Pallas-smoother
    # caches; V-cycles never touch them, and W/F cycles fall back to the
    # masked multicolor path on those (small) levels.
    tail, tail_start = None, -1
    flag = os.environ.get("AMG_PALLAS_TAIL", "")
    on_tpu = jax.default_backend() == "tpu"
    if (flag == "1" or (flag != "0" and on_tpu)) and ml.levels:
        from ..ops.pallas.tail_kernel import build_fused_tail_cache

        for start in range(len(ml.levels)):
            tail = build_fused_tail_cache(
                ml.levels, ml, start, dtype, interpret=not on_tpu
            )
            if tail is not None:
                tail_start = start
                break

    def permute_rect(M, prow, pcol):
        """Fold level bases into a transfer operator: rows by this level's
        permutation, columns by the neighbour level's."""
        if prow is None and pcol is None:
            return M
        C = M.tocsr() if hasattr(M, "tocsr") else as_csr_cached(M)
        import scipy.sparse as _sp

        if not _sp.issparse(C):
            C = _sp.csr_matrix(C)
        if prow is not None:
            C = C[prow]
        if pcol is not None:
            C = C[:, pcol]
        return C.tocsr()

    out = []
    for i, (level, A_dev, Ap) in enumerate(dev_levels):
        # P maps coarse → this level's rows; R maps this level → coarse rows.
        pf, pc = perm_of_level[i], perm_of_level[i + 1]
        P_dev = lower(permute_rect(level.P, pf, pc), pad_of_level[i])
        R_dev = lower(permute_rect(level.R, pc, pf), pad_of_level[i + 1])
        sym_hint = type(ml.symmetry).__name__ == "HermitianSymmetry"
        covered = tail is not None and i >= tail_start
        # the sub-kernel (AMG_PALLAS_SUB) needs the level just above the
        # tail to keep its fused legs
        fused = None if covered else _maybe_build_fused_legs(level, dtype)
        if fused is not None or covered:
            # the cycle runs the fused legs / whole-tail kernel; pre/post
            # only serve the multi-RHS and W/F fallbacks — build the cheap
            # masked caches, not the (heavyweight, pre-tiled) Pallas
            # smoother caches
            os.environ["_AMG_SKIP_PALLAS_GS"] = "1"
        A_host = Ap if Ap is not None else level.A
        n_lvl = level.A.shape[0]
        try:
            pre = _build_smoother_cache(device_cfg(level.presmoother_config, n_lvl), A_host, A_dev, dtype, sym=sym_hint)
            post = _build_smoother_cache(device_cfg(level.postsmoother_config, n_lvl), A_host, A_dev, dtype, sym=sym_hint)
        finally:
            os.environ.pop("_AMG_SKIP_PALLAS_GS", None)
        out.append(DeviceLevel(A=A_dev, P=P_dev, R=R_dev, pre=pre, post=post, fused=fused))

    coarse = _build_coarse_cache(ml, dtype, final_pad)
    final_dev = lower(as_csr_cached(ml.final_A), row_pad)

    # phased whole-subcycle kernel: one call for [sub_start, end] — covers
    # the level just above the tail when it qualifies (bigger than the tail
    # budget but slab-tileable)
    # measured on TPU v5e at 4096²: the phased one-call subcycle is ~1.1 ms
    # SLOWER per cycle than the mid-level leg pair + tail it replaces (its
    # sequential phase grid loses more to per-step stalls than the two saved
    # ~0.6 ms launches) — opt-in until that is understood
    sub, sub_start = None, -1
    subflag = os.environ.get("AMG_PALLAS_SUB", "")
    if (
        subflag == "1"
        and tail is not None
        # sub_start must be a coarse level (zero initial guess baked in);
        # level 0 receives real iterates and keeps its own kernels
        and tail_start >= 2
    ):
        from ..ops.pallas.subcycle_kernel import build_fused_subcycle_cache

        sub = build_fused_subcycle_cache(
            ml.levels, ml, tail_start - 1, dtype, interpret=not on_tpu
        )
        if sub is not None:
            sub_start = tail_start - 1

    perm0 = iperm0 = None
    if perm_of_level and perm_of_level[0] is not None:
        pi0 = perm_of_level[0]
        fine_pad = pad_of_level[0]
        pp = np.concatenate([pi0, np.arange(len(pi0), fine_pad)]).astype(np.int32)
        ip = np.concatenate([np.argsort(pi0), np.arange(len(pi0), fine_pad)]).astype(np.int32)
        perm0, iperm0 = jnp.asarray(pp), jnp.asarray(ip)

    return DeviceHierarchy(
        levels=tuple(out), coarse=coarse, final_A=final_dev,
        tail=tail, tail_start=tail_start,
        sub=sub, sub_start=sub_start,
        perm0=perm0, iperm0=iperm0,
    )


# --------------------------------------------------------------------------
# cycling
# --------------------------------------------------------------------------


def _coarse_solve(coarse: CoarseCache, b):
    b_log = b[: coarse.n]
    if coarse.kind == "qr":
        y = jnp.matmul(coarse.qr_q.T.conj(), b_log, precision=jax.lax.Precision.HIGHEST)
        x = jax.scipy.linalg.solve_triangular(coarse.qr_r, y, lower=False)
    else:
        x = jnp.matmul(coarse.mat, b_log, precision=jax.lax.Precision.HIGHEST)
    pad = coarse.rows_padded - coarse.n
    if pad:
        padding = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, padding)
    return x


def _cycle(h: DeviceHierarchy, cycle: Cycle, x, b, lvl: int, x_zero: bool = False):
    """One cycle at level lvl — structure of multilevel.jl:214-239.

    ``x_zero`` marks x as the zero vector (coarse-level recursion always
    starts from the zero guess, multilevel.jl:225): the fused down leg then
    skips its x fetch and sparsifies the early sweep steps (exact up to
    graph-shape-dependent XLA multiply-add contraction —
    vcycle_kernels._steps_live_offsets).

    Phases carry ``jax.named_scope`` annotations (the TPU equivalent of the
    reference's @timeit_debug phase timers, survey §5.1) so xprof/profiler
    traces attribute time to Presmoother/Residual/Restriction/Coarse-solve/
    Prolongation/Postsmoother per level."""
    level = h.levels[lvl]
    n_here = x.shape[0]
    n_next = (
        h.levels[lvl + 1].A.rows_padded
        if lvl + 1 < len(h.levels)
        else h.coarse.rows_padded
    )

    if h.sub is not None and lvl == h.sub_start and isinstance(cycle, V) and x.ndim == 1:
        # phased whole-subcycle: this level in slabs + the entire tail, one
        # pallas_call.  Coarse-level cycles always start from the zero guess
        # (multilevel.jl:225), which the kernel bakes in — callers reach here
        # only through the parent's zero-initialised recursion.
        from ..ops.pallas.subcycle_kernel import fused_subcycle

        with jax.named_scope(f"L{lvl}/fused_subcycle"):
            return fit_len(fused_subcycle(h.sub, b), n_here)

    if h.tail is not None and lvl == h.tail_start and isinstance(cycle, V) and x.ndim == 1:
        # whole remaining tail (every level ≥ lvl + coarse solve) in ONE
        # pallas_call — V-cycles only (W/F revisit levels individually)
        from ..ops.pallas.tail_kernel import fused_tail

        with jax.named_scope(f"L{lvl}/fused_tail"):
            return fused_tail(h.tail, x, b, x_zero=x_zero)

    if level.fused is not None and x.ndim == 1:
        # fused Pallas legs: (presmooth + residual + restrict) down, then
        # (prolong-correct + postsmooth) up — one kernel each.  DMA caches
        # hand x down→up as the flat plane (the up leg re-reads fresh halos
        # by in-kernel DMA) and reuse the padded rhs plane; BlockSpec caches
        # hand off in tiled halo-block form with the tiled rhs reused.
        from ..ops.pallas.vcycle_kernels import fused_down, fused_up, fused_up_t

        with jax.named_scope(f"L{lvl}/down"):
            # DMA caches chain x down→up as a padded PLANE written by
            # in-kernel output DMA (no XLA pad/reshape between the legs);
            # BlockSpec caches hand off in tiled halo-block form
            xt, coarse_b, bt = fused_down(
                level.fused, x, b, tiled=True, x_zero=x_zero
            )
            coarse_b = fit_len(coarse_b, n_next)
        if lvl == len(h.levels) - 1:
            with jax.named_scope("coarse_solve"):
                coarse_x = _coarse_solve(h.coarse, coarse_b)
        else:
            coarse_x = jnp.zeros_like(coarse_b)
            coarse_x = _next(h, cycle, coarse_x, coarse_b, lvl + 1, x_zero=True)
        with jax.named_scope(f"L{lvl}/up"):
            if getattr(level.fused, "dma", False):
                x = fused_up(level.fused, xt, bt, coarse_x, out_len=x.shape[0])
            else:
                x = fused_up_t(level.fused, xt, bt, coarse_x, x.dtype, x.shape[0])
        return x

    with jax.named_scope(f"L{lvl}/presmooth"):
        x = _apply_smoother(level.pre, level.A, x, b)

    with jax.named_scope(f"L{lvl}/residual"):
        res = b - fit_len(mat_vec(level.A, x), n_here)
    with jax.named_scope(f"L{lvl}/restrict"):
        coarse_b = fit_len(mat_vec(level.R, res), n_next)

    if lvl == len(h.levels) - 1:
        with jax.named_scope("coarse_solve"):
            coarse_x = _coarse_solve(h.coarse, coarse_b)
    else:
        coarse_x = jnp.zeros_like(coarse_b)
        coarse_x = _next(h, cycle, coarse_x, coarse_b, lvl + 1, x_zero=True)

    with jax.named_scope(f"L{lvl}/prolong"):
        x = x + fit_len(mat_vec(level.P, coarse_x), n_here)
    with jax.named_scope(f"L{lvl}/postsmooth"):
        x = _apply_smoother(level.post, level.A, x, b)
    return x


def _next(h, cycle, x, b, lvl, x_zero: bool = False):
    if isinstance(cycle, V):
        return _cycle(h, cycle, x, b, lvl, x_zero=x_zero)
    if isinstance(cycle, W):
        x = _cycle(h, cycle, x, b, lvl, x_zero=x_zero)
        return _cycle(h, cycle, x, b, lvl)
    if isinstance(cycle, F):
        x = _cycle(h, cycle, x, b, lvl, x_zero=x_zero)
        return _cycle(h, V(), x, b, lvl)
    raise TypeError(f"unknown cycle {cycle!r}")


def _one_iteration(h: DeviceHierarchy, cycle: Cycle, x, b):
    if h.levels:
        return _cycle(h, cycle, x, b, 0)
    return _coarse_solve(h.coarse, b)


def _subsolve(h: DeviceHierarchy, coarse_b, lvl: int):
    """One V-cycle from zero on the sub-hierarchy below ``lvl−1``."""
    if lvl >= len(h.levels):
        return _coarse_solve(h.coarse, coarse_b)
    return _cycle(h, V(), jnp.zeros_like(coarse_b), coarse_b, lvl, x_zero=True)


def run_fixed_cycles(h: DeviceHierarchy, x, b, n_cycles: int):
    """``n_cycles`` V-cycles — identical math to iterating
    :func:`_one_iteration`, but when the top level has a factored fused-leg
    cache the loop body uses the cross-cycle ``fused_updown`` kernel
    (postsmooth(i) + presmooth(i+1) + residual + restrict in ONE top-level
    pallas_call per cycle, coefficient planes read once).  On this stack a
    pallas_call carries ~0.6 ms fixed launch cost, so halving the top level's
    calls is the single biggest cycle-time lever."""
    fused = h.levels[0].fused if h.levels else None
    usable = (
        n_cycles >= 1
        and fused is not None
        and getattr(fused, "factored", False)
        and x.ndim == 1
        and not (h.tail is not None and h.tail_start == 0)
    )
    if not usable:
        return jax.lax.fori_loop(
            0, n_cycles, lambda i, xx: _one_iteration(h, V(), xx, b), x
        )

    from ..ops.pallas.vcycle_kernels import (
        _pad_plane,
        _xla_tile,
        fused_down,
        fused_up,
        fused_updown,
    )

    n_next = (
        h.levels[1].A.rows_padded if len(h.levels) > 1 else h.coarse.rows_padded
    )
    Wx, Wy = fused.row_dims
    TX, TY = fused.tile
    Hfx, Hfy = fused.Hf
    gx, gy = fused.grid
    if getattr(fused, "dma", False):
        # padded rhs plane built once, reused by every down/updown/up; x
        # chains through the loop as a padded plane (in-kernel output DMA,
        # domain-masked window loads) — no XLA glue passes per cycle
        bt = _pad_plane(
            b, Wx * Wy, Wx, Wy, gx, gy, TX, TY, Hfx, Hfy, jnp.dtype(fused.wdtype)
        )
        with jax.named_scope("L0/down"):
            xf, bc, _ = fused_down(fused, x, b, tiled=True, bpad=bt)
        b_up = bt
    else:
        with jax.named_scope("L0/down"):
            xf, bc = fused_down(fused, x, b)
        # BlockSpec tiles carry the kernels' LOAD halo (Hly ≤ Hf[1])
        bt = _xla_tile(
            b, Wx * Wy, Wx, Wy, gx, gy, TX, TY, Hfx,
            getattr(fused, "Hly", 0) or Hfy, fused.dinv_tiled.dtype
        )
        b_up = b
    bc = fit_len(bc, n_next)

    plane = getattr(fused, "dma", False)

    def body(carry, _):
        xf, bc = carry
        xc = _subsolve(h, bc, 1)
        with jax.named_scope("L0/updown"):
            xf, bc2 = fused_updown(fused, xf, bt, xc, plane_out=plane)
        return (xf, fit_len(bc2, n_next)), None

    # scan unroll trades the while-loop boundary's carry copy (the ~74 MB
    # x plane re-written into its fixed slot every iteration — measured
    # ~0.15 ms/cycle) against one-time program-load cost: every unrolled
    # copy duplicates the fused kernels' machine code in the executable
    # (~53 MB/cycle of Mosaic binary), and program load is catastrophically
    # superlinear in executable size on this stack (59 MB loads in ~5 s,
    # 112 MB in ~220 s, 217 MB in ~750 s — measured, see PERF.md).  Default
    # unroll=1: first execution ~5 s at a ~4.5% cycle-time cost.
    (xf, bc), _ = jax.lax.scan(
        body, (xf, bc), None, length=n_cycles - 1,
        unroll=int(os.environ.get("AMG_SCAN_UNROLL", "1")),
    )
    xc = _subsolve(h, bc, 1)
    with jax.named_scope("L0/up"):
        return fused_up(fused, xf, b_up, xc, out_len=x.shape[0])


def device_cycle_fn(ml: MultiLevel, cycle: Cycle = V(), dtype=None):
    """Return a jitted ``b -> x`` applying exactly one cycle from zero — the
    preconditioner contract (preconditioner.jl:12-19)."""
    h = _get_device_hierarchy(ml, dtype)

    @partial(jax.jit, static_argnames=("cycle",))
    def apply_fn(h, b, cycle):
        # h is a traced pytree argument: keeps level arrays out of the HLO
        # (closed-over arrays become giant baked-in constants)
        wdtype = h.final_A.dtype if not h.levels else h.levels[0].A.dtype
        bp = _pad_to(jnp.asarray(b, dtype=wdtype), h.fine_padded)
        x = jnp.zeros_like(bp)
        x = _one_iteration(h, cycle, x, bp)
        return x[: h.n_fine]

    return lambda b: apply_fn(h, b, cycle)


def _pad_to(v, rows_padded):
    n = v.shape[0]
    if n == rows_padded:
        return v
    pad = [(0, rows_padded - n)] + [(0, 0)] * (v.ndim - 1)
    return jnp.pad(v, pad)


def _get_device_hierarchy(ml: MultiLevel, dtype=None) -> DeviceHierarchy:
    if dtype is None:
        dtype = jnp.asarray(np.zeros(0, dtype=ml.dtype)).dtype
    key = ("hierarchy", jnp.dtype(dtype).name)
    if key not in ml._device_cache:
        ml._device_cache[key] = build_device_hierarchy(ml, dtype)
    return ml._device_cache[key]


# --------------------------------------------------------------------------
# solve driver
# --------------------------------------------------------------------------


def _enter_basis(h: DeviceHierarchy, v):
    """b → the hierarchy's fine-level basis (RCM for BSG levels)."""
    return v if h.perm0 is None else jnp.take(v, h.perm0, axis=0)


def _exit_basis(h: DeviceHierarchy, v):
    """x back to the caller's natural ordering."""
    return v if h.iperm0 is None else jnp.take(v, h.iperm0, axis=0)


@partial(jax.jit, static_argnames=("cycle", "calculate_residual"))
def _solve_fused(h: DeviceHierarchy, b, maxiter, abstol, cycle, calculate_residual):
    """Fully fused iteration loop: lax.while_loop with the residual norm
    carried on device (multilevel.jl:158-198 semantics)."""
    b = _enter_basis(h, b)
    A = h.levels[0].A if h.levels else h.final_A
    x0 = jnp.zeros_like(b)
    normb = jnp.linalg.norm(b)

    def cond(state):
        x, itr, normres = state
        ok = itr <= maxiter
        if calculate_residual:
            ok = ok & (normres > abstol)
        return ok

    def body(state):
        x, itr, normres = state
        x = _one_iteration(h, cycle, x, b)
        if calculate_residual:
            res = b - fit_len(mat_vec(A, x), b.shape[0])
            normres = jnp.linalg.norm(res)
        return (x, itr + 1, normres)

    x, itr, normres = jax.lax.while_loop(cond, body, (x0, 1, normb))
    return _exit_basis(h, x), itr - 1, normres


# --------------------------------------------------------------------------
# device Krylov + mixed-precision refinement
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cycle",))
def _pcg_fused(h: DeviceHierarchy, b, maxiter, abstol, cycle):
    """Fully jitted preconditioned CG with one AMG cycle (zero initial
    guess, fixed, linear — preconditioner.jl:12-19 contract) per iteration.
    State stays on device; the loop carries ⟨r,z⟩ and the residual norm."""
    b = _enter_basis(h, b)
    A = h.levels[0].A if h.levels else h.final_A
    n_pad = b.shape[0]

    def M(r):
        z = jnp.zeros_like(r)
        return _one_iteration(h, cycle, z, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def cond(state):
        x, r, p, rz, itr, normr = state
        return (itr < maxiter) & (normr > abstol)

    def body(state):
        x, r, p, rz, itr, normr = state
        Ap = fit_len(mat_vec(A, p), n_pad)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, p, rz_new, itr + 1, jnp.linalg.norm(r))

    state = (x0, r0, p0, rz0, 0, jnp.linalg.norm(r0))
    x, r, p, rz, itr, normr = jax.lax.while_loop(cond, body, state)
    return _exit_basis(h, x), itr, normr


def cg_device(
    ml: MultiLevel,
    b,
    cycle: Cycle = V(),
    *,
    tol: float = 1e-8,
    abstol: float = 0.0,
    maxiter: int = 100,
    dtype=None,
    log: bool = False,
):
    """AMG-preconditioned conjugate gradients, fully on device."""
    h = _get_device_hierarchy(ml, dtype)
    wdtype = h.levels[0].A.dtype if h.levels else h.final_A.dtype
    b_arr = jnp.asarray(np.asarray(b), dtype=wdtype)
    n = b_arr.shape[0]
    bp = _pad_to(b_arr, h.fine_padded)
    normb = float(jnp.linalg.norm(b_arr))
    thresh = max(tol * normb, abstol)
    x, itr, normr = _pcg_fused(h, bp, maxiter, thresh, cycle)
    xout = np.asarray(x)[:n]
    return (xout, int(itr), float(normr)) if log else xout


def _get_fine_f64(ml: MultiLevel):
    """f64 device operator for the fine level — the outer-residual carrier of
    :func:`solve_refined`.  Built (and cached) inside a scoped
    ``jax.enable_x64`` so the global x64 flag stays off.  Returns None when
    no gather-free f64 lowering exists (caller falls back to the host loop).
    """
    key = ("fine64",)
    if key in ml._device_cache:
        return ml._device_cache[key]
    from .lattice import LatticeMatrix
    from .lattice_nd import LatticeMatrixND
    from ..ops.lattice_op import lat2d_from_spec
    from ..ops.lattice_nd_op import latnd_from_spec

    A = ml.levels[0].A if ml.levels else ml.final_A
    op = None
    with jax.enable_x64(True):
        if isinstance(A, LatticeMatrix):
            op = lat2d_from_spec(A.spec, dtype=jnp.float64)
        elif isinstance(A, LatticeMatrixND):
            op = latnd_from_spec(A.spec, dtype=jnp.float64)
        else:
            A_csr = as_csr_cached(A)
            op = sdia_from_csr(A_csr, dtype=jnp.float64, max_offsets=40, max_overhead=8.0)
            if op is None and max(A_csr.shape) <= 4096:
                op = dense_from_csr(A_csr, dtype=jnp.float64)
        if op is not None:
            jax.block_until_ready(jax.tree_util.tree_leaves(op))
    ml._device_cache[key] = op
    return op


@jax.jit
def _refine_prep(r64, scale):
    """rhs32 = (r64/scale) as f32 — traced under x64 (callers hold the ctx)."""
    return (r64 / scale).astype(jnp.float32)


@jax.jit
def _refine_update(x64, e32, b64, A64, scale):
    """x64 += scale·e; r64 = b64 − A·x64 (f64); returns (x64, r64, ‖r64‖)."""
    x64 = x64 + scale * e32.astype(jnp.float64)
    r64 = b64 - fit_len(mat_vec(A64, x64), b64.shape[0])
    return x64, r64, jnp.linalg.norm(r64)


def solve_refined(
    ml: MultiLevel,
    b,
    cycle: Cycle = V(),
    *,
    tol: float = 1e-8,
    inner: str = "cg",
    inner_tol: float = 1e-5,
    inner_maxiter: int = 40,
    max_rounds: int = 4,
    dtype="float32",
    log: bool = False,
    return_device: bool = False,
):
    """Mixed-precision iterative refinement: float32 AMG inner solves under
    a float64 outer residual loop.

    A single-precision V-cycle stalls at relative residual ~1e-6 (f32
    rounding floor); refinement reaches f64-grade tolerances while keeping
    every inner FLOP in f32 on the MXU/VPU fast path:

        r = b − A·x            (f64, one SpMV per round)
        solve A·e ≈ r in f32   (AMG-PCG or V-cycles to ``inner_tol``)
        x ← x + e              (f64)

    The outer loop runs **entirely on device** when the fine operator has a
    gather-free f64 lowering (Lat2D/SDIA/dense — scoped ``jax.enable_x64``,
    the global flag stays off): per round the host sees one scalar norm, no
    O(n) transfers.  ``b`` may be a device array (skips the upload);
    ``return_device=True`` skips the final download and returns the f64
    device solution.  Falls back to a host outer loop (scipy f64 SpMV)
    otherwise.
    """
    h = _get_device_hierarchy(ml, dtype)
    A64 = _get_fine_f64(ml)
    if A64 is not None:
        return _solve_refined_device(
            ml, h, A64, b, cycle, tol=tol, inner=inner, inner_tol=inner_tol,
            inner_maxiter=inner_maxiter, max_rounds=max_rounds, log=log,
            return_device=return_device,
        )
    A_host = ml.levels[0].A if ml.levels else ml.final_A
    b64 = np.asarray(b, dtype=np.float64)
    n = b64.shape[0]
    normb = float(np.linalg.norm(b64))
    if normb == 0:
        out = np.zeros_like(b64)
        return (out, [0.0]) if log else out

    x64 = np.zeros_like(b64)
    r64 = b64.copy()
    history = [normb]
    for _ in range(max_rounds):
        if history[-1] <= tol * normb:
            break
        scale = float(np.linalg.norm(r64))
        bp = _pad_to(jnp.asarray((r64 / scale), dtype=h.levels[0].A.dtype if h.levels else h.final_A.dtype), h.fine_padded)
        if inner == "cg":
            e, _, _ = _pcg_fused(h, bp, inner_maxiter, inner_tol, cycle)
        else:
            e, _, _ = _solve_fused(h, bp, inner_maxiter, inner_tol, cycle, True)
        x64 += scale * np.asarray(e, dtype=np.float64)[:n]
        r64 = b64 - A_host @ x64  # f64 residual on host (exact carrier)
        history.append(float(np.linalg.norm(r64)))
    return (x64, history) if log else x64


def _solve_refined_device(
    ml, h, A64, b, cycle, *, tol, inner, inner_tol, inner_maxiter,
    max_rounds, log, return_device,
):
    """Device-resident refinement loop (see :func:`solve_refined`).

    The f32 inner PCG/V-cycle jits are invoked OUTSIDE the x64 scope so they
    hit the same compilation-cache entries as every other f32 call; only the
    O(n) f64 prep/update steps trace under ``jax.enable_x64``."""
    n = ml.levels[0].A.shape[0] if ml.levels else ml.final_A.shape[0]
    with jax.enable_x64(True):
        if isinstance(b, jax.Array) and b.dtype == jnp.float64:
            b64 = b
        else:
            b64 = jnp.asarray(np.asarray(b, dtype=np.float64))
        b64 = _pad_to(b64, h.fine_padded)
        normb = float(jnp.linalg.norm(b64))
        if normb == 0:
            out = jnp.zeros_like(b64)[:n]
            out = out if return_device else np.zeros(n, dtype=np.float64)
            return (out, [0.0]) if log else out
        x64 = jnp.zeros_like(b64)
    r64 = b64
    history = [normb]
    for _ in range(max_rounds):
        if history[-1] <= tol * normb:
            break
        scale = history[-1]
        with jax.enable_x64(True):
            bp = _refine_prep(r64, scale)
        if inner == "cg":
            e, _, _ = _pcg_fused(h, bp, inner_maxiter, inner_tol, cycle)
        else:
            e, _, _ = _solve_fused(h, bp, inner_maxiter, inner_tol, cycle, True)
        with jax.enable_x64(True):
            x64, r64, nr = _refine_update(x64, e, b64, A64, scale)
        history.append(float(nr))
    xout = x64[:n] if return_device else np.asarray(x64)[:n]
    return (xout, history) if log else xout


def solve_device(
    ml: MultiLevel,
    b,
    cycle: Cycle = V(),
    *,
    x=None,
    maxiter: int = 100,
    abstol: float = 0.0,
    reltol: Optional[float] = None,
    verbose: bool = False,
    log: bool = False,
    calculate_residual: bool = True,
    dtype=None,
):
    """Device-engine solve (mirrors solve_mg / multilevel.jl:158-198)."""
    h = _get_device_hierarchy(ml, dtype)
    wdtype = h.levels[0].A.dtype if h.levels else h.final_A.dtype
    b_arr = jnp.asarray(np.asarray(b), dtype=wdtype)
    n = b_arr.shape[0]
    bp = _pad_to(b_arr, h.fine_padded)

    if reltol is None:
        reltol = math.sqrt(float(jnp.finfo(wdtype).eps))
    normb = float(jnp.linalg.norm(b_arr))
    if normb != 0:
        abstol = max(reltol * normb, abstol)

    if not (log or verbose):
        xq, iters, normres = _solve_fused(
            h, bp, maxiter, abstol, cycle, calculate_residual
        )
        return np.asarray(xq)[:n]

    # Observed path: one jitted cycle per outer iteration, host-side logging.
    # State lives in the hierarchy's (possibly RCM-permuted) basis.
    bq = _enter_basis(h, bp)

    @partial(jax.jit, static_argnames=("cyc",))
    def _step(h, xx, bb, cyc):
        A = h.levels[0].A if h.levels else h.final_A
        xx = _one_iteration(h, cyc, xx, bb)
        res = bb - fit_len(mat_vec(A, xx), bb.shape[0])
        return xx, jnp.linalg.norm(res)

    def step(xx):
        return _step(h, xx, bq, cycle)

    xq = _pad_to(jnp.zeros_like(b_arr), h.fine_padded) if x is None else _enter_basis(
        h, _pad_to(jnp.asarray(np.asarray(x), dtype=wdtype), h.fine_padded)
    )
    residuals = [normb]
    normres = normb
    itr = 1
    while itr <= maxiter and ((not calculate_residual) or normres > abstol):
        if verbose:
            print(f"Norm of residual at iteration {itr:6d} is {normres:.4e}")
        xq, nr = step(xq)
        normres = float(nr)
        residuals.append(normres)
        itr += 1

    xout = np.asarray(_exit_basis(h, xq))[:n]
    return (xout, residuals) if log else xout
