"""Whole-coarse-tail V-cycle kernel (Pallas TPU).

The fused leg kernels (vcycle_kernels.py) cut each level to two
``pallas_call``s, but on the axon tunnel every dispatched op costs ~0.3 ms —
so the five smallest levels of a deep hierarchy (< 25k rows each, microseconds
of real work) still burn ~3 ms of a ~9 ms cycle in launch overhead.  This
kernel executes the ENTIRE trailing run of small lattice levels — presmooth,
residual, restrict, recurse, dense coarse solve, prolong-correct, postsmooth,
for every tail level — as ONE ``pallas_call`` with all operands VMEM-resident.

Reference semantics covered (citations into /root/reference): the per-level
cycle structure ``src/multilevel.jl:214-239`` (V-cycle recursion arm), the
multicolor GS/SOR sweeps standing in for ``src/smoother.jl:73-90``, and the
dense QR/pinv coarse solve ``src/coarse_solver.jl:9-16,66-81`` (folded into a
precomputed solve-operator matmul).

Mosaic-safety: every cross-grid data movement is either a ``pltpu.roll`` on a
lane-width-multiple-of-128 plane (stencil offsets) or an exact one-hot
selection matmul at HIGHEST precision (stride-k restriction subsampling and
prolongation upsampling) — no lane-strided slices, no lane-split reshapes.
Each level's plane carries an H-cell zero halo; boundary-class coefficients
are exactly zero beyond the domain (models/lattice.py extraction invariant),
so rolled-in wraparound values never contribute.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vcycle_kernels import _steps_list, _steps_live_offsets, _sweep

__all__ = ["FusedTailCache", "build_fused_tail_cache", "fused_tail"]

_H = 8  # per-level halo: ≥ 3k−2 for the restriction reads (k ≤ 3)


@dataclasses.dataclass(frozen=True)
class TailLevelMeta:
    """Static per-level description (python-side only, hashed via the cache's
    static field)."""

    offsA: Tuple[Tuple[int, int], ...]
    offsR: Tuple[Tuple[int, int], ...]
    offsP: Tuple[Tuple[int, int], ...]
    idxRx: Tuple[int, ...]  # offset → index into the distinct-dx SRx stack
    idxRy: Tuple[int, ...]
    idxPx: Tuple[int, ...]
    idxPy: Tuple[int, ...]
    color_grid: Tuple[Tuple[int, ...], ...]
    steps: Tuple[int, ...]
    omega: float
    k: int
    dims: Tuple[int, int]      # logical fine (Wx, Wy)
    box: Tuple[int, int]       # padded fine (Bx, By)
    cdims: Tuple[int, int]     # logical coarse
    cbox: Tuple[int, int]      # padded coarse
    factored: bool = False     # P = (I − diag(s)A)T form: stream T+s planes


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedTailCache:
    # per tail level, in fine→coarse order
    A: Tuple[jax.Array, ...]      # [nA, Bx, By]   coefficient dtype
    dinv: Tuple[jax.Array, ...]   # [Bx, By]       working dtype
    Rp: Tuple[jax.Array, ...]     # [nR, Bcx, Bcy] restriction coefficient planes
    SRx: Tuple[jax.Array, ...]    # [nRdx, Bcx, Bx] one-hot subsample selectors
    SRy: Tuple[jax.Array, ...]    # [nRdy, Bcy, By]
    Pp: Tuple[jax.Array, ...]     # [nP, Bx, By]
    UPx: Tuple[jax.Array, ...]    # [nPdx, Bx, Bcx] one-hot upsample selectors
    UPy: Tuple[jax.Array, ...]    # [nPdy, By, Bcy]
    Tp: Tuple[jax.Array, ...]     # factored: [Bx, By] tentative-P plane (else dummy)
    Sp: Tuple[jax.Array, ...]     # factored: [Bx, By] ω·D̃⁻¹ plane (else dummy)
    G: jax.Array                  # [n7, B7x, B7y] coarse solve-operator planes
    metas: Tuple[TailLevelMeta, ...] = dataclasses.field(metadata=dict(static=True))
    dims7: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))
    vmem_bytes: int = dataclasses.field(metadata=dict(static=True))


def _round_box(Wx: int, Wy: int) -> Tuple[int, int]:
    Bx = -(-(Wx + 2 * _H) // 8) * 8
    By = -(-(Wy + 2 * _H) // 128) * 128
    return Bx, By


def _pad_planes(planes: jax.Array, box: Tuple[int, int]) -> jax.Array:
    """[n, Wx, Wy] → [n, Bx, By] zero-embedded at offset (H, H)."""
    n, Wx, Wy = planes.shape
    Bx, By = box
    return jnp.pad(planes, ((0, 0), (_H, Bx - Wx - _H), (_H, By - Wy - _H)))


def _sel_stack(pairs, fine_B, coarse_B, coarse_W, k, kind, dtype):
    """One-hot selector matrices for the distinct per-axis offsets.

    kind='R': rows are padded-coarse, cols padded-fine; row c' selects fine
    j = H + k·(c'−H) + d (the stride-k subsample read of the residual).
    kind='P': rows are padded-fine, cols padded-coarse; row i selects coarse
    j = H + (i−H)//k + d (the piecewise-constant upsample read).
    Entries are 0/1 → a HIGHEST-precision matmul is an exact copy.
    """
    uniq = sorted(set(pairs))
    out = np.zeros((len(uniq), coarse_B if kind == "R" else fine_B,
                    fine_B if kind == "R" else coarse_B), dtype=dtype)
    for m, d in enumerate(uniq):
        if kind == "R":
            for cp in range(coarse_B):
                c = cp - _H
                if 0 <= c < coarse_W:
                    j = _H + k * c + d
                    if 0 <= j < fine_B:
                        out[m, cp, j] = 1.0
        else:
            for i in range(fine_B):
                f = i - _H
                j = _H + (f // k if f >= 0 else -((-f - 1) // k + 1)) + d
                if 0 <= f and 0 <= j < coarse_B:
                    out[m, i, j] = 1.0
    index = {d: m for m, d in enumerate(uniq)}
    return out, tuple(index[d] for d in pairs)


def _pad_np(plane: np.ndarray, box: Tuple[int, int]) -> np.ndarray:
    Wx, Wy = plane.shape
    Bx, By = box
    return np.pad(plane, ((_H, Bx - Wx - _H), (_H, By - Wy - _H)))


def _factored_spec(level, k, dims, cdims):
    """T spec for the factored P = (I − diag(s)A)T form, or None."""
    from ...models.lattice import LatticeMatrix

    T_t = getattr(level, "T_tent", None)
    if not isinstance(T_t, LatticeMatrix):
        return None
    sT = T_t.spec
    if (
        sT.base_x != (1, k)
        or sT.base_y != (1, k)
        or tuple(sT.row_dims) != dims
        or tuple(sT.col_dims) != cdims
        or not any(o == (0, 0) for o in sT.offsets)
        or not all(
            o == (0, 0) or not np.any(sT.table[i])
            for i, o in enumerate(sT.offsets)
        )
    ):
        return None
    return sT


def _scale_plane(level, dims, npdt):
    """[Wx, Wy] ω·D̃⁻¹ plane from a class table or raw vector, or None."""
    from ...models.lattice import axis_classes

    s = getattr(level, "psmooth_scale", None)
    if s is None:
        return None
    Wx, Wy = dims
    if isinstance(s, tuple) and s and s[0] == "table":
        _, tbl, (Kx, sx_, Ky, sy_) = s
        cx = axis_classes(np.arange(Wx), Wx, Kx, sx_)
        cy = axis_classes(np.arange(Wy), Wy, Ky, sy_)
        return np.asarray(tbl, dtype=npdt)[cx[:, None], cy[None, :]]
    v = np.asarray(s, dtype=npdt).ravel()
    if v.shape[0] != Wx * Wy:
        return None
    return v.reshape(Wx, Wy)


def _level_ok(level) -> Tuple[Any, Any, Any] | None:
    """Mirror of vcycle_kernels.build_fused_leg_cache's shape gate."""
    from ...models.lattice import LatticeMatrix

    if not all(isinstance(M, LatticeMatrix) for M in (level.A, level.P, level.R)):
        return None
    sA, sR, sP = level.A.spec, level.R.spec, level.P.spec
    if sA.base_x != (1, 1) or sA.base_y != (1, 1):
        return None
    kx, ky = sR.base_x, sR.base_y
    if kx != ky or kx[1] != 1 or kx[0] not in (2, 3):
        return None
    k = kx[0]
    if sP.base_x != (1, k) or sP.base_y != (1, k):
        return None
    if sP.row_dims != sA.row_dims or sP.col_dims != sR.row_dims:
        return None
    for dx, dy in sR.offsets:
        if not (-k <= dx < 2 * k and -k <= dy < 2 * k):
            return None
    reachP = max(
        (max(abs(dx), abs(dy)) for dx, dy in sP.offsets), default=0
    )
    if reachP > _H // 2:
        return None
    reachA = max(
        (max(abs(dx), abs(dy)) for dx, dy in sA.offsets), default=0
    )
    if reachA >= _H:
        return None
    return sA, sR, sP


def build_fused_tail_cache(
    levels,
    ml,
    start: int,
    dtype,
    coef_dtype=None,
    interpret: bool = False,
    max_rows: int | None = None,
    vmem_budget: int | None = None,
):
    """Build the whole-tail cache for ``ml.levels[start:]`` + the coarse
    solve, or None if any tail level fails the lattice/box-k/smoother gate
    or the VMEM budget."""
    from ...config import GaussSeidel, SOR, SymmetricSweep
    from ...models.lattice import lattice_coloring

    if max_rows is None:
        max_rows = int(os.environ.get("AMG_TAIL_MAX_ROWS", 250_000))
    if vmem_budget is None:
        vmem_budget = int(os.environ.get("AMG_TAIL_VMEM_MB", 30)) * 2**20
    tail = levels[start:]
    if not tail:
        return None
    if tail[0].A.shape[0] > max_rows:
        return None

    if coef_dtype is None:
        coef_dtype = (
            jnp.bfloat16
            if os.environ.get("AMG_COEF_DTYPE", "") == "bfloat16"
            else dtype
        )
    npdt = np.float32 if jnp.dtype(dtype).itemsize <= 4 else np.dtype(dtype)

    # ---- cheap validation pass over the whole tail before any array work
    checked = []
    prev_cdims = None
    for level in tail:
        got = _level_ok(level)
        if got is None:
            return None
        sA, sR, sP = got
        cfg = level.presmoother_config
        if cfg != level.postsmoother_config:
            return None
        if not (isinstance(cfg, (GaussSeidel, SOR)) and cfg.ordering == "multicolor"):
            return None
        if not isinstance(cfg.sweep, SymmetricSweep):
            return None
        colored = lattice_coloring(sA)
        if colored is None:
            return None
        dims = tuple(sA.row_dims)
        if prev_cdims is not None and dims != prev_cdims:
            return None
        prev_cdims = tuple(sR.row_dims)  # R rows live on the coarse grid
        checked.append((sA, sR, sP, cfg, colored))
    W7x, W7y = prev_cdims
    if ml.final_A.shape[0] != W7x * W7y or W7x * W7y > 4096:
        return None

    metas = []
    arrs = dict(A=[], dinv=[], Rp=[], SRx=[], SRy=[], Pp=[], UPx=[], UPy=[], Tp=[], Sp=[])
    vmem = 0
    for lvl_i, (sA, sR, sP, cfg, colored) in enumerate(checked):
        level = tail[lvl_i]
        grid, n_colors = colored
        k = sR.base_x[0]
        dims = tuple(sA.row_dims)
        cdims = tuple(sR.row_dims)
        box = _round_box(*dims)
        cbox = _round_box(*cdims)

        omega = float(cfg.omega) if isinstance(cfg, SOR) else 1.0
        steps = _steps_list(n_colors, cfg.iter, True, True, omega)

        # factored form when the SA setup stashed a single-offset T + scale
        specT = _factored_spec(level, k, dims, cdims)
        pS = _scale_plane(level, dims, npdt) if specT is not None else None
        factored = specT is not None and pS is not None

        # Tail levels are small (≤ max_rows), so all plane assembly runs in
        # numpy with ONE device upload per array — eager jnp pads/casts here
        # previously dispatched ~8 tiny unpersisted XLA compiles per level
        # (~20 s per process at 4096², measured).
        np_coef = np.dtype(jnp.dtype(coef_dtype).name) if jnp.dtype(coef_dtype) != jnp.bfloat16 else jnp.bfloat16
        np_comp = np.float64 if jnp.dtype(dtype).itemsize == 8 else np.float32

        def pad_np_planes(planes, bx):
            n_p, Wx_, Wy_ = planes.shape
            Bx_, By_ = bx
            return np.pad(planes, ((0, 0), (_H, Bx_ - Wx_ - _H), (_H, By_ - Wy_ - _H)))

        dummy = jnp.zeros((1, 1), dtype=jnp.dtype(coef_dtype))
        if factored:
            # residue subsamples: x/y selectors for δ ∈ [0, k) (index = δ)
            SRx, idxRx = _sel_stack(list(range(k)), box[0], cbox[0], cdims[0], k, "R", npdt)
            SRy, idxRy = _sel_stack(list(range(k)), box[1], cbox[1], cdims[1], k, "R", npdt)
            UPx, idxPx = _sel_stack([0], box[0], cbox[0], cdims[0], k, "P", npdt)
            UPy, idxPy = _sel_stack([0], box[1], cbox[1], cdims[1], k, "P", npdt)
            idxT = specT.offsets.index((0, 0))
            pT = specT.expand(idxT, dtype=npdt)
            Tp = jnp.asarray(np.asarray(_pad_np(pT, box), dtype=np_coef))
            Sp = jnp.asarray(np.asarray(_pad_np(pS, box), dtype=np_coef))
            Rp = Pp = dummy
        else:
            SRx, idxRx = _sel_stack([d for d, _ in sR.offsets], box[0], cbox[0], cdims[0], k, "R", npdt)
            SRy, idxRy = _sel_stack([d for _, d in sR.offsets], box[1], cbox[1], cdims[1], k, "R", npdt)
            UPx, idxPx = _sel_stack([d for d, _ in sP.offsets], box[0], cbox[0], cdims[0], k, "P", npdt)
            UPy, idxPy = _sel_stack([d for _, d in sP.offsets], box[1], cbox[1], cdims[1], k, "P", npdt)
            Rp = jnp.asarray(
                pad_np_planes(sR.expand_all(dtype=np.dtype(jnp.dtype(dtype).name)), cbox)
            )
            Pp = jnp.asarray(
                pad_np_planes(sP.expand_all(dtype=np_comp), box).astype(np_coef)
            )
            Tp = Sp = dummy

        A_np = pad_np_planes(sA.expand_all(dtype=np_comp), box)
        diag = None
        for kk, (dx, dy) in enumerate(sA.offsets):
            if (dx, dy) == (0, 0):
                diag = A_np[kk]
        if diag is None:
            diag = np.zeros(box, np_comp)
        dinv = np.where(diag != 0, 1.0 / np.where(diag != 0, diag, 1.0), 0.0)

        arrs["A"].append(jnp.asarray(A_np.astype(np_coef)))
        arrs["dinv"].append(jnp.asarray(dinv.astype(np.dtype(jnp.dtype(dtype).name))))
        arrs["Rp"].append(Rp)
        arrs["SRx"].append(jnp.asarray(SRx))
        arrs["SRy"].append(jnp.asarray(SRy))
        arrs["Pp"].append(Pp)
        arrs["UPx"].append(jnp.asarray(UPx))
        arrs["UPy"].append(jnp.asarray(UPy))
        arrs["Tp"].append(Tp)
        arrs["Sp"].append(Sp)

        metas.append(
            TailLevelMeta(
                offsA=sA.offsets,
                offsR=sR.offsets,
                offsP=sP.offsets,
                idxRx=idxRx,
                idxRy=idxRy,
                idxPx=idxPx,
                idxPy=idxPy,
                color_grid=tuple(tuple(int(c) for c in row) for row in np.asarray(grid)),
                steps=steps,
                omega=omega,
                k=k,
                dims=dims,
                box=box,
                cdims=cdims,
                cbox=cbox,
                factored=factored,
            )
        )

    # coarse solve operator: x = Mc·b — QR (R⁻¹Qᵀ) or pinv, matching
    # models/device._build_coarse_cache (coarse_solver.jl:9-16,66-81)
    from ...models.coarse import QRSolver

    n7 = W7x * W7y
    cs = ml.coarse_solver
    if isinstance(cs, QRSolver) and not cs._singular:
        import scipy.linalg as sla

        Mc = sla.solve_triangular(np.asarray(cs.R), np.asarray(cs.Q).conj().T, lower=False)
    elif getattr(cs, "pinvA", None) is not None:
        Mc = np.asarray(cs.pinvA)
    else:
        Mc = np.linalg.pinv(np.asarray(ml.final_A.toarray()))
    B7 = _round_box(W7x, W7y)
    G_np = np.ascontiguousarray(Mc.T.reshape(n7, W7x, W7y).astype(npdt))
    G_np = np.pad(
        G_np, ((0, 0), (_H, B7[0] - W7x - _H), (_H, B7[1] - W7y - _H))
    )
    G = jnp.asarray(G_np)

    # VMEM audit: operands once + ~6 fine-plane temporaries per live level;
    # grid=() runs a single step so there is no double-buffering multiplier.
    for key, lst in arrs.items():
        for a in lst:
            vmem += a.size * a.dtype.itemsize
    vmem += G.size * G.dtype.itemsize
    item = jnp.dtype(dtype).itemsize
    vmem += 8 * metas[0].box[0] * metas[0].box[1] * item
    if vmem > vmem_budget:
        return None

    return FusedTailCache(
        A=tuple(arrs["A"]),
        dinv=tuple(arrs["dinv"]),
        Rp=tuple(arrs["Rp"]),
        SRx=tuple(arrs["SRx"]),
        SRy=tuple(arrs["SRy"]),
        Pp=tuple(arrs["Pp"]),
        UPx=tuple(arrs["UPx"]),
        UPy=tuple(arrs["UPy"]),
        Tp=tuple(arrs["Tp"]),
        Sp=tuple(arrs["Sp"]),
        G=G,
        metas=tuple(metas),
        dims7=(W7x, W7y),
        interpret=interpret,
        vmem_bytes=vmem,
    )


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _color_plane(meta):
    Bx, By = meta.box
    tab = np.asarray(meta.color_grid)
    a, b = tab.shape
    px = jax.lax.broadcasted_iota(jnp.int32, (Bx, By), 0)
    py = jax.lax.broadcasted_iota(jnp.int32, (Bx, By), 1)
    cx = (px - _H + 16384 * a) % a
    cy = (py - _H + 16384 * b) % b
    out = jnp.zeros((Bx, By), jnp.int32)
    for u in range(a):
        for v in range(b):
            out = jnp.where((cx == u) & (cy == v), tab[u, v], out)
    return out


def _sel(m, A, B):  # exact one-hot copy matmul
    return jax.lax.dot_general(
        A, B, (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    ).astype(m)


def _tail_kernel(*refs, metas, dims7, x_zero=False):
    n_lvl = len(metas)
    x_ref, b_ref = refs[0], refs[1]
    per = refs[2 : 2 + 10 * n_lvl]
    g_ref = refs[2 + 10 * n_lvl]
    out_ref = refs[2 + 10 * n_lvl + 1]
    out_ref[...] = _tail_go(
        per, g_ref, metas, dims7, x_ref[...], b_ref[...], x_zero=x_zero
    )


def _tail_go(per, g_ref, metas, dims7, X0, B0, x_zero=False):
    """The whole-tail V-cycle recursion on VMEM values — shared by the
    standalone tail kernel and the phased subcycle kernel's mid phase.

    Every level below the entry starts from the zero guess
    (multilevel.jl:225), so its presmooth runs with zero-start live-offset
    sparsification (exact up to graph-shape-dependent XLA multiply-add
    contraction — vcycle_kernels._steps_live_offsets); ``x_zero`` extends
    that to the entry level when the caller passes x=0."""
    n_lvl = len(metas)

    def lvl_refs(l):
        return per[10 * l : 10 * (l + 1)]

    def residual(X, B, A, offs, Bx, By):
        rsum = None
        for kk, (dx, dy) in enumerate(offs):
            src = X
            if dx:
                src = pltpu.roll(src, (-dx) % Bx, axis=0)
            if dy:
                src = pltpu.roll(src, (-dy) % By, axis=1)
            term = A[kk] * src
            rsum = term if rsum is None else rsum + term
        return B - rsum

    dbg = os.environ.get("AMG_DBG_TAIL", "")  # anatomy probes (scratch only)

    def go(l, X, B, zs=False):
        m = metas[l]
        Bx, By = m.box
        A_r, d_r, Rp_r, SRx_r, SRy_r, Pp_r, UPx_r, UPy_r, Tp_r, Sp_r = lvl_refs(l)
        A = A_r[...].astype(X.dtype)
        D = d_r[...]
        col = _color_plane(m)

        live = _steps_live_offsets(m.steps, m.color_grid, m.offsA) if zs else None
        if "nosweep" not in dbg:
            X = _sweep(X, B, D, A, col, m.steps, m.omega, m.offsA, Bx, By, live=live)
        r = B if "nores" in dbg else residual(X, B, A, m.offsA, Bx, By)

        if "norestrict" in dbg:
            bc = jnp.zeros(m.cbox, X.dtype)
        elif m.factored:
            # R = Tᵀ(I − A·diag(s)): b_c = Σ_{ρ∈[0,k)²} subsample_ρ(T⊙s̃)
            # with s̃ = r − A(s⊙r); selector index = residue δ directly.
            # residual(·, 0) = −A·(·), so Ag = −residual(g, 0).
            Sv = Sp_r[...].astype(X.dtype)
            Tv = Tp_r[...].astype(X.dtype)
            g = Sv * r
            Ag = -residual(g, jnp.zeros_like(r), A, m.offsA, Bx, By)
            ts = Tv * (r - Ag)
            bc = None
            for rx in range(m.k):
                for ry in range(m.k):
                    sub = _sel(X.dtype, _sel(X.dtype, SRx_r[rx], ts), SRy_r[ry].T)
                    bc = sub if bc is None else bc + sub
        else:
            # restrict: b_c = Σ_k Rp_k ⊙ (SRx_k · r · SRyᵀ_k) — written
            # directly at the coarse level's padded layout (halo rows of Rp
            # are zero)
            bc = None
            for kk in range(len(m.offsR)):
                sx = SRx_r[m.idxRx[kk]]
                sy = SRy_r[m.idxRy[kk]]
                sub = _sel(X.dtype, _sel(X.dtype, sx, r), sy.T)
                term = Rp_r[kk] * sub
                bc = term if bc is None else bc + term

        if l == n_lvl - 1:
            xc = _coarse_apply(bc, g_ref, metas[l].cbox, dims7)
        else:
            xc = go(l + 1, jnp.zeros_like(bc), bc, zs=True)

        if "noprolong" in dbg:
            ups = None
            corr = jnp.zeros_like(X)
        elif m.factored:
            # P = (I − diag(s)A)T, single offset: corr = Tup − s⊙(A·Tup)
            ups = _sel(X.dtype, _sel(X.dtype, UPx_r[0], xc), UPy_r[0].T)
            Tup = Tp_r[...].astype(X.dtype) * ups
            ATup = -residual(Tup, jnp.zeros_like(Tup), A, m.offsA, Bx, By)
            corr = Tup - Sp_r[...].astype(X.dtype) * ATup
        else:
            # prolong-correct: x += Σ_k Pp_k ⊙ (UPx_k · x_c · UPyᵀ_k)
            corr = None
            for kk in range(len(m.offsP)):
                ux = UPx_r[m.idxPx[kk]]
                uy = UPy_r[m.idxPy[kk]]
                ups = _sel(X.dtype, _sel(X.dtype, ux, xc), uy.T)
                term = Pp_r[kk].astype(X.dtype) * ups
                corr = term if corr is None else corr + term
        X = X + corr

        if "nosweep" not in dbg:
            X = _sweep(X, B, D, A, col, m.steps, m.omega, m.offsA, Bx, By)
        return X

    return go(0, X0, B0, zs=x_zero)


def _coarse_apply(bc, g_ref, cbox, dims7):
    """Dense coarse solve: x = Mc·b as Σ_t b[t]·G_t (G planes pre-padded;
    scalar b[t] extracted by a one-cell masked reduction)."""
    W7x, W7y = dims7
    B7x, B7y = cbox
    px = jax.lax.broadcasted_iota(jnp.int32, (B7x, B7y), 0)
    py = jax.lax.broadcasted_iota(jnp.int32, (B7x, B7y), 1)
    x = jnp.zeros_like(bc)
    G = g_ref[...].astype(bc.dtype)
    for t in range(W7x * W7y):
        it, jt = divmod(t, W7y)
        coef = jnp.sum(
            jnp.where((px == it + _H) & (py == jt + _H), bc, jnp.zeros_like(bc))
        )
        x = x + coef * G[t]
    return x


def fused_tail(cache: FusedTailCache, x, b, x_zero: bool = False):
    """x ← one V-cycle over the whole tail — a single pallas_call.

    ``x_zero=True`` asserts x is the zero vector (coarse-level entry): the
    entry level's presmooth is live-offset sparsified too."""
    m0 = cache.metas[0]
    Wx, Wy = m0.dims
    Bx, By = m0.box
    n = Wx * Wy
    dtype = cache.dinv[0].dtype

    def to_plane(v):
        g = v[:n].reshape(Wx, Wy).astype(dtype)
        return jnp.pad(g, ((_H, Bx - Wx - _H), (_H, By - Wy - _H)))

    ops = [to_plane(x), to_plane(b)]
    for l in range(len(cache.metas)):
        ops += [
            cache.A[l], cache.dinv[l], cache.Rp[l], cache.SRx[l],
            cache.SRy[l], cache.Pp[l], cache.UPx[l], cache.UPy[l],
            cache.Tp[l], cache.Sp[l],
        ]
    ops.append(cache.G)

    kern = functools.partial(
        _tail_kernel, metas=cache.metas, dims7=cache.dims7, x_zero=x_zero
    )
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        in_specs=[spec] * len(ops),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bx, By), dtype),
        compiler_params=pltpu.CompilerParams(
            # Mosaic's stack need includes relayout temporaries that depend
            # on the operand layouts XLA picks (observed 2.15× the operand
            # estimate at 4096² once upstream producers changed) — grant 3×
            # plus a floor so scheduling shifts can't trip the scoped limit
            vmem_limit_bytes=min(112 * 2**20, max(48 * 2**20, 3 * cache.vmem_bytes))
        ),
        interpret=cache.interpret,
    )(*ops)

    xo = out[_H : _H + Wx, _H : _H + Wy].reshape(n).astype(x.dtype)
    pad = x.shape[0] - n
    if pad > 0:
        xo = jnp.pad(xo, (0, pad))
    return xo
