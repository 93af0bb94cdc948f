"""Fused V-cycle leg kernels for Lat2D levels (Pallas TPU).

The XLA cycle executes presmooth / residual / restrict / prolong / postsmooth
as separate passes; the transfer operators' stride-k lane access patterns
lower to slow relayouts, and every pass re-streams x through HBM.  These
kernels fuse each *leg* of the cycle per level into one ``pallas_call``:

* **down**: color-sweep presmoothing, residual ``r = b − A·x`` and the
  stride-k restriction ``b_c = R·r`` — all on a VMEM-resident fine tile; two
  outputs (presmoothed x and the coarse rhs tile).
* **up**: prolongation ``x += P·x_c`` (``jnp.repeat`` upsampling in VMEM) and
  color-sweep postsmoothing; one output.

Stride-k subsampling inside VMEM uses the exact transpose-pick sequence
(sublane split by reshape → transpose → sublane split → transpose): Mosaic
has no lane-strided slice, lane-split reshapes crash, and selector matmuls
run at bf16 by default (default TPU matmul precision truncates f32 inputs).

Cross-tile dependencies use the same halo over-compute scheme as the fused
smoother (ops/pallas/gs_kernel.py); all inputs are pre-tiled with duplicated
halos so the pipelined BlockSpec path applies (index maps are block-units).

Supported level shape: A base (1,1), R base (k,1), P base (1,k) on both axes
with the same k ∈ {2, 3} — the structured-SA box-k levels.  Anything else
falls back to the unfused XLA ops.
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

__all__ = [
    "FusedLegCache", "build_fused_leg_cache", "fused_down", "fused_up",
    "fused_up_t",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedLegCache:
    A_tiled: jax.Array      # [gx, gy, n_offA, BX, BY]
    dinv_tiled: jax.Array   # [gx, gy, BX, BY]
    R_tiled: jax.Array      # [gx, gy, n_offR, TXc, TYc]
    P_tiled: jax.Array      # [gx, gy, n_offP, BX, BY]
    offsA: Tuple[Tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))
    offsR: Tuple[Tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))
    offsP: Tuple[Tuple[int, int], ...] = dataclasses.field(metadata=dict(static=True))
    color_grid: Tuple[Tuple[int, ...], ...] = dataclasses.field(metadata=dict(static=True))
    n_colors: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    row_dims: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))   # fine (Wx, Wy)
    col_dims: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))   # coarse (Wxc, Wyc)
    tile: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))       # (TX, TY) fine
    Hf: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))         # fine halo (Hfx, Hfy)
    Hc: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))         # coarse halo for up
    omega: float = dataclasses.field(metadata=dict(static=True))
    iter: int = dataclasses.field(metadata=dict(static=True))
    forward: bool = dataclasses.field(metadata=dict(static=True))
    backward: bool = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))
    # factored-prolongator form (SA LocalWeighting degree-1 Jacobi):
    # P = (I − diag(s)·A)·T with T single-offset box-k — the legs stream
    # T_tiled + S_tiled (2 planes) instead of P (nP planes) and R (nR coarse
    # planes), reusing the resident A stencil for the smoothing applies
    T_tiled: Any = None           # [gx, gy, BX, BY] coefficient dtype
    S_tiled: Any = None           # [gx, gy, BX, BY] ω·D̃⁻¹, coefficient dtype
    factored: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # in-kernel table expansion: instead of streaming ANY coefficient plane
    # from HBM (A/dinv/T/s ≈ 60% of a leg's traffic at practical ~250 GB/s),
    # ship only the O(K²) class tables and expand per tile inside the kernel
    # with one-hot MXU matmuls; out-of-domain rows produce out-of-range class
    # ids, whose one-hot rows are all-zero — exactly the zero padding the
    # streamed planes carried.  dinv is derived from A's diagonal plane.
    tabA: Any = None              # [nA, ncxA, ncyA] f32
    tabT: Any = None              # [ncxT, ncyT] f32
    tabS: Any = None              # [ncxS, ncyS] f32
    clsA: Any = dataclasses.field(default=None, metadata=dict(static=True))  # (Kx, sx, Ky, sy, Wx, Wy)
    clsT: Any = dataclasses.field(default=None, metadata=dict(static=True))
    clsS: Any = dataclasses.field(default=None, metadata=dict(static=True))
    diag_idx: int = dataclasses.field(default=-1, metadata=dict(static=True))
    expand_in_kernel: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # working dtype of x/b/outputs — dinv_tiled may be stored narrower
    wdtype: str = dataclasses.field(default="float32", metadata=dict(static=True))
    # in-kernel compute dtype for the sweeps/stencils (AMG_SWEEP_DTYPE):
    # bfloat16 runs the VPU ~1.8× faster (measured) and halves VMEM traffic;
    # the cycle is a preconditioner, so the ~3-digit arithmetic shows up
    # only as a (measured, small) iteration-count effect — outputs are cast
    # back to wdtype.  Default: compute at wdtype.
    sweep_dtype: str = dataclasses.field(default="", metadata=dict(static=True))
    # representative-tile compaction: the coefficient planes are expanded
    # from translation-invariant class tables, so every tile whose halo
    # block lies inside the periodic interior carries an IDENTICAL block.
    # Storage keeps one representative interior tile per axis run and the
    # BlockSpec index map sends all interior tiles to it; Pallas skips the
    # HBM→VMEM copy when consecutive grid steps map to the same block, so
    # with the tile axis iterated fastest the coefficient stream shrinks
    # from O(n_tiles) to O(n_edge_tiles) per leg.  Each field is
    # ((xlo, xhi) | None, (ylo, yhi) | None) — the inclusive interior run
    # of tile indices along each axis — or None for identity mapping.
    cA: Any = dataclasses.field(default=None, metadata=dict(static=True))
    cT: Any = dataclasses.field(default=None, metadata=dict(static=True))
    cS: Any = dataclasses.field(default=None, metadata=dict(static=True))
    cP: Any = dataclasses.field(default=None, metadata=dict(static=True))
    cR: Any = dataclasses.field(default=None, metadata=dict(static=True))
    # DMA-windowed x/b/xc: instead of materialising [gx, gy, BX, BY]
    # halo-duplicated tile stacks in HBM (`_xla_tile` — an extra full
    # read+write pass over x per leg, and a slice-stack XLA lowers poorly),
    # the vectors stay as flat padded planes in ANY memory and each grid
    # step DMAs its (BX, BY) window into a double-buffered VMEM scratch
    # (prefetching the next step's window during compute).  The up leg then
    # reads FRESH neighbour halos from the down leg's flat output — bitwise
    # identical to the tiled stale-band handoff (the halo over-compute
    # produces exactly the neighbour's interior values).
    dma: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # packed 2-color sweeps: for 5-point-cross stencils with a checkerboard
    # coloring, every masked color step wastes half the VPU lanes (the full
    # stencil is evaluated everywhere, then half the updates are discarded).
    # Instead the block is split into same-color half planes along sublanes
    # (R[pp, q] = L[2pp + q%2, q], K[pp, q] = L[2pp + 1 + q%2 ... wrapped]) —
    # a parity shift + sublane-split reshape, NO transposes — and each color
    # step runs the 5 stencil FMAs on ONE (BX/2, BY) plane with small
    # parity-selected neighbour shifts.  Same FLOPs per updated point in the
    # same order → bitwise identical to the masked sweep on the undiscarded
    # region; coefficient planes are pre-packed at build time (concatenated
    # [red; black] along the sublane axis, storage shape unchanged).
    packed: str = dataclasses.field(default="", metadata=dict(static=True))
    # pre-upsampled coarse correction (DMA + factored only).  The in-kernel
    # prolongation upsample needs a LANE-axis k-repeat, which Mosaic can only
    # express as transpose → sublane-repeat → transpose — two full-block VMEM
    # transposes per tile (~0.3 ms/cycle at 4096², the single most expensive
    # compute in the updown kernel).  Modes:
    #   "y"    — the wrapper lane-repeats x_c to fine y geometry (one cheap
    #            XLA minor-dim repeat, ~3× coarse bytes of extra DMA — hidden
    #            under compute); the kernel does only the cheap sublane
    #            repeat.  Value-identical to "" (pure copies; out-of-domain
    #            lanes are annihilated by the zero-padded T plane).  Default.
    #   "full" — both axes pre-upsampled (AMG_XC_UP=1): measured 0.6 ms/call
    #            LOSS — the fine-geometry window streams ~9× the coarse
    #            window's bytes, and unlike "y" that stream is NOT hidden.
    #   ""     — in-kernel repeat + transposes (AMG_XC_UP=0).
    xcup: str = dataclasses.field(default="", metadata=dict(static=True))
    # lane LOAD halo (≤ Hf[1]): kernels compute on (TX+2·Hf[0], TY+2·Hly)
    # blocks; Hf[1] is only the flat planes' (128-aligned) store margin —
    # window loads sit at lane offset (Hf[1] − Hly) + j·TY.  0 → = Hf[1].
    Hly: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def grid(self):
        TX, TY = self.tile
        Wx, Wy = self.row_dims
        return (-(-Wx // TX), -(-Wy // TY))


def _tile_with_halo(plane: np.ndarray, gx, gy, TX, TY, Hx, Hy):
    """[W..] plane (already origin-aligned) → [gx, gy, TX+2Hx, TY+2Hy]
    via a sliding-window view (one vectorised copy, no python tile loops)."""
    BX, BY = TX + 2 * Hx, TY + 2 * Hy
    pad = np.zeros((gx * TX + 2 * Hx, gy * TY + 2 * Hy), dtype=plane.dtype)
    pad[Hx : Hx + plane.shape[0], Hy : Hy + plane.shape[1]] = plane
    win = np.lib.stride_tricks.sliding_window_view(pad, (BX, BY))
    return np.ascontiguousarray(win[::TX, ::TY])


def _tile_plane(p, gx, gy, TX, TY, Hx, Hy):
    """Device-side _tile_with_halo: static slice stacks, fused by XLA."""
    BX, BY = TX + 2 * Hx, TY + 2 * Hy
    g = jnp.pad(p, ((Hx, Hx + gx * TX - p.shape[0]), (Hy, Hy + gy * TY - p.shape[1])))
    slabs = jnp.stack(
        [jax.lax.slice_in_dim(g, i * TX, i * TX + BX, axis=0) for i in range(gx)]
    )
    return jnp.stack(
        [jax.lax.slice_in_dim(slabs, j * TY, j * TY + BY, axis=2) for j in range(gy)],
        axis=1,
    )


def _compact_axis(g, T, H, W, K, s):
    """Inclusive (lo, hi) run of tile indices whose halo block
    [i·T − H, (i+1)·T + H) lies inside the periodic class region [K, W−K)
    with phase alignment (T % s == 0 → all interior tiles share the same
    class pattern, hence identical expanded blocks).  None when fewer than
    two tiles qualify (nothing to compact)."""
    if s < 1 or T % s:
        return None
    lo = hi = None
    for i in range(g):
        if i * T - H >= K and (i + 1) * T + H <= W - K:
            if lo is None:
                lo = i
            hi = i
        elif lo is not None:
            break  # interior run is contiguous by construction
    if lo is None or hi <= lo:
        return None
    return (lo, hi)


def _compact_pair(spec, TX, TY, Hx, Hy, gx, gy, Wx=None, Wy=None):
    """Per-axis compaction runs for an operand with class params on ``spec``
    (needs .Kx/.sx/.Ky/.sy); W defaults to the spec's row_dims."""
    if spec is None:
        return None
    Wx = spec.row_dims[0] if Wx is None else Wx
    Wy = spec.row_dims[1] if Wy is None else Wy
    ax = _compact_axis(gx, TX, Hx, Wx, spec.Kx, spec.sx)
    ay = _compact_axis(gy, TY, Hy, Wy, spec.Ky, spec.sy)
    if ax is None and ay is None:
        return None
    return (ax, ay)


def _axmap(pair):
    """Tile index → compact storage index along one axis."""
    if pair is None:
        return lambda t: t
    lo, hi = pair

    def f(t):
        return jnp.where(t < lo, t, jnp.where(t > hi, t - (hi - lo), lo))

    return f


def _compact_len(pair, g):
    if pair is None:
        return g
    lo, hi = pair
    return g - (hi - lo)


def _compact_take(arr, c, gx, gy):
    """Slice a [gx, gy, ...] tiled array down to its compact form (edge
    tiles + one representative per interior run)."""
    if c is None:
        return arr
    ax, ay = c
    if ax is not None:
        lo, hi = ax
        idx = list(range(lo + 1)) + list(range(hi + 1, gx))
        arr = arr[np.asarray(idx)]
    if ay is not None:
        lo, hi = ay
        idx = list(range(lo + 1)) + list(range(hi + 1, gy))
        arr = arr[:, np.asarray(idx)]
    return arr


def _compact_take_traced(arr, c):
    """Traced :func:`_compact_take`: the interior-run drop is two contiguous
    slices + concat per axis (no gathers; runs inside the builder jits so the
    whole build is ONE persisted compile instead of per-run eager dispatches)."""
    if c is None:
        return arr
    ax, ay = c
    if ax is not None:
        lo, hi = ax
        arr = jnp.concatenate([arr[: lo + 1], arr[hi + 1 :]], axis=0)
    if ay is not None:
        lo, hi = ay
        arr = jnp.concatenate([arr[:, : lo + 1], arr[:, hi + 1 :]], axis=1)
    return arr


@functools.partial(
    jax.jit,
    static_argnames=(
        "gx", "gy", "TX", "TY", "Hfx", "Hfy", "TXc", "TYc",
        "diag_idx", "dtype_name", "coef_name", "cA", "cP", "cR",
    ),
)
def _build_tiles_jit(
    TA, cxA, cyA, TR, cxR, cyR, TP, cxP, cyP, *,
    gx, gy, TX, TY, Hfx, Hfy, TXc, TYc, diag_idx, dtype_name, coef_name,
    cA=None, cP=None, cR=None,
):
    """Expand the class tables to planes ON DEVICE (one-hot MXU matmuls —
    exact selection, see ops/lattice_op.expand_planes_device), pre-tile them
    for the leg kernels, and apply representative-tile compaction — all in
    one compiled (and disk-persisted) program."""
    dt = jnp.dtype(dtype_name)
    ct = jnp.dtype(coef_name)

    def planes(T, cx, cy):
        Ex = (cx[:, None] == jnp.arange(T.shape[1], dtype=cx.dtype)).astype(T.dtype)
        Ey = (cy[:, None] == jnp.arange(T.shape[2], dtype=cy.dtype)).astype(T.dtype)
        return jnp.einsum(
            "xc,kcd,yd->kxy", Ex, T, Ey, precision=jax.lax.Precision.HIGHEST
        )

    tile_f = lambda p: _tile_plane(p, gx, gy, TX, TY, Hfx, Hfy)

    pA = planes(TA, cxA, cyA)
    A_tiled = jnp.moveaxis(jax.vmap(tile_f)(pA), 0, 2).astype(ct)
    diag = pA[diag_idx] if diag_idx >= 0 else jnp.zeros(pA.shape[1:], pA.dtype)
    # dinv at the coefficient dtype: it is a smoother weight, same accuracy
    # class as the A planes; x/b stay at the working dtype
    dv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0).astype(ct)
    dinv_tiled = tile_f(dv)
    del dt

    # R has the most offsets of the three operators (Pᵀ of a box-k smoothed
    # prolongator spreads to ~(3k)² geometric offsets) — coefficient-dtype
    # storage matters as much as for A/P
    pR = planes(TR, cxR, cyR)
    R_tiled = jnp.moveaxis(
        jax.vmap(lambda p: _tile_plane(p, gx, gy, TXc, TYc, 0, 0))(pR), 0, 2
    ).astype(ct)
    pP = planes(TP, cxP, cyP)
    P_tiled = jnp.moveaxis(jax.vmap(tile_f)(pP), 0, 2).astype(ct)
    A_tiled = _compact_take_traced(A_tiled, cA)
    dinv_tiled = _compact_take_traced(dinv_tiled, cA)
    P_tiled = _compact_take_traced(P_tiled, cP)
    R_tiled = _compact_take_traced(R_tiled, cR)
    return A_tiled, dinv_tiled, R_tiled, P_tiled


def build_fused_leg_cache(
    specA, specR, specP, color_grid: np.ndarray, n_colors: int, dtype,
    omega, iters, fwd, bwd, interpret: bool = False, coef_dtype=None,
    factored_T=None,
):
    """Pre-tile A/dinv/R/P for the fused leg kernels; None if the level's
    shape isn't supported (ratios, sizes, VMEM)."""
    if specA.base_x != (1, 1) or specA.base_y != (1, 1):
        return None
    kx, ky = specR.base_x, specR.base_y
    if kx != ky or kx[1] != 1 or kx[0] not in (2, 3):
        return None
    k = kx[0]
    if specP.base_x != (1, k) or specP.base_y != (1, k):
        return None
    Wx, Wy = specA.row_dims
    Wxc, Wyc = specR.row_dims
    if specP.row_dims != (Wx, Wy) or specP.col_dims != (Wxc, Wyc):
        return None
    # restriction offsets must fit the ±1 coarse-cell subsample margin
    for dx, dy in specR.offsets:
        if not (-k <= dx < 2 * k and -k <= dy < 2 * k):
            return None

    # fine tile: TX/k multiple of 8, TY/k multiple of 128.  Wider TY
    # amortises the 64-lane-aligned y-halo (the dominant duplication cost);
    # the VMEM loop below shrinks TX to fit.  AMG_LEG_TILE="tx,ty" overrides
    # the targets (tests use small tiles to exercise multi-tile grids and
    # the representative-tile compaction on small problems).
    # measured on TPU v5e at 4096² (AMG_LEG_TILE sweeps): (240, 1536) beats
    # (240, 768) 153.6 vs 150.0 Gnnz/s — the y-halo is lane-alignment-fixed,
    # so a wider tile halves its share of the VPU work.  Round-4 re-sweep on
    # the xcup-y/zero-start kernels: TX 384 best (updown 2.101 ms vs 2.146
    # at 360, 2.223 at 456; 11×384 = 4224 also carries less x-overhang than
    # 12×360 = 4320); needs the 72 MB budget below.
    tx_t, ty_t = 384, 1536
    _tt = os.environ.get("AMG_LEG_TILE")
    if _tt:
        tx_t, ty_t = (int(v) for v in _tt.split(","))
    TX = 8 * k * max(1, min(tx_t // (8 * k), -(-Wx // (8 * k))))
    TY = 128 * k * max(1, min(ty_t // (128 * k), -(-Wy // (128 * k))))
    # halos: fine (sweep steps + residual + restrict reach), (4/64)-aligned
    reachA = max(max(abs(d) for d, _ in specA.offsets), max(abs(d) for _, d in specA.offsets))
    n_steps = len(_steps_list(n_colors, iters, fwd, bwd, omega))
    n_steps2 = len(_steps2_list(n_colors, iters, fwd, bwd, omega))
    reachR = max(
        max((abs(d) for d, _ in specR.offsets), default=0),
        max((abs(d) for _, d in specR.offsets), default=0),
    )
    reachP = max(
        max((abs(d) for d, _ in specP.offsets), default=0),
        max((abs(d) for _, d in specP.offsets), default=0),
    )
    # halo must cover the down leg's consumption (sweeps + residual +
    # restrict reach) AND leave a still-valid band ≥ the up leg's postsmooth
    # consumption, so the down output can hand off to up in tiled form
    # (fused_down(..., tiled=True) → fused_up_t) without re-tiling; the
    # cross-cycle updown kernel (corr + post + pre sweeps + residual +
    # restrict in one call) consumes the most
    need = max(
        n_steps * reachA + reachA + max(reachR, k),  # down: sweeps+res+restrict
        2 * n_steps * reachA,                         # tiled handoff: up sweeps
        n_steps * reachA + 2 * reachA + k,            # factored restriction
        n_steps2 * reachA + 2 * reachA + k,           # updown (deduped pair)
    )
    # packed color-plane sweeps: "cb2" (5-point cross + checkerboard halves,
    # whose pack/unpack wraps cost 2 extra contaminated halo layers) or "h4"
    # (±1-box stencil + 2×2 4-coloring, row-parity halves, no extra halo);
    # both need 8-aligned Hfx so the half planes stay sublane-aligned
    packed_ok = (
        os.environ.get("AMG_PACKED_SWEEP", "1") != "0"
        and os.environ.get("AMG_SWEEP_DTYPE", "") == ""
        and jnp.dtype(dtype).itemsize == 4
    )
    packed_cand = ""
    # cb2 measured on TPU v5e at 4096²: a net LOSS (updown 3.58 vs 2.27 ms
    # masked) — the diagonal pack/unpack wraps and parity-selected neighbour
    # planes cost more than the masked half-waste they remove.  Kept behind
    # AMG_PACKED_SWEEP=all (bitwise-validated) for future revisits; h4 (pure
    # reshape packing, uniform shifts) measured a 24% leg win and is the
    # default.
    if (
        os.environ.get("AMG_PACKED_SWEEP", "") == "all"
        and packed_ok
        and _packed2_ok(specA.offsets, color_grid, n_colors)
    ):
        packed_cand = "cb2"
    elif packed_ok and _packed4h_ok(specA.offsets, color_grid, n_colors):
        packed_cand = "h4"
    if packed_cand == "cb2":
        # +2 per leg (pack + unpack wraps); the tiled down→up handoff chains
        # two legs' contamination, so its line doubles the allowance
        need = max(need + 2, 2 * n_steps * reachA + 4)
    # Hfx is 8-aligned unconditionally: the chained-plane output DMA
    # (_plane_store) slices the HBM plane at sublane offset Hfx + i·TX,
    # which Mosaic requires provably divisible by the (8,·) tiling; packed
    # sweeps additionally need it for half-plane splits.  Costs ≤ 4 halo
    # rows over the old 4-alignment.
    Hfx = -(-need // 8) * 8
    # Hly is the lane halo the kernels COMPUTE with; Hfy is the flat planes'
    # margin — 128-aligned for DMA caches because the chained-plane output
    # DMA (_plane_store) writes at lane offset Hfy + j·TY, which Mosaic
    # requires divisible by the (·,128) tiling.  Decoupling them (64-lane
    # load halo windows at offset (Hfy − Hly) + j·TY) is MEASURED-DEAD:
    # Mosaic also requires HBM memref-slice LANE OFFSETS provably divisible
    # by 128 ("Failed to prove that a tile index in dimension 1 is divisible
    # by the tiling (128)"), so unaligned window loads cannot compile and
    # Hly must equal the plane margin for DMA caches.  The Hly/Hpy plumbing
    # in the kernels is kept (a no-op at Hly == Hfy) in case Mosaic gains
    # sub-tile HBM slicing.
    Hly = 64 * (-(-need // 64))
    Hfy = Hly
    if os.environ.get("AMG_DMA_TILE", "1") != "0":
        Hfy = 128 * (-(-need // 128))
        Hly = Hfy
    Hcx, Hcy = max(-(-Hfx // k) + reachP, 4), 64
    Hcx = -(-Hcx // 4) * 4
    if k * Hcx < Hfx + k * reachP or k * Hcy < Hly + k * reachP:
        return None

    # VMEM estimate (double-buffered inputs + outputs); shrink TX to fit.
    # Coefficient planes may be stored at a narrower dtype (bf16): AMG
    # coefficients carry ~3 significant digits of information content —
    # the cycle is a preconditioner, and solve_refined's f64 outer loop
    # absorbs the perturbation.  x/b/dinv stay at the working dtype.
    import jax.numpy as _jnp

    if coef_dtype is None:
        import os as _os

        coef_dtype = (
            _jnp.bfloat16
            if _os.environ.get("AMG_COEF_DTYPE", "") == "bfloat16"
            else dtype
        )
    nA, nR, nP = len(specA.offsets), len(specR.offsets), len(specP.offsets)
    item = np.dtype(dtype).itemsize
    item_c = np.dtype(coef_dtype).itemsize

    # ---- factored-prolongator validation (before the VMEM estimate — the
    # factored legs stream T+s (2 fine planes) instead of nP fine P planes
    # and nR coarse R planes).  Requires T single-offset (0,0) box-k.
    specT = scale_info = None
    if factored_T is not None:
        specT_c, scale_c = factored_T
        if (
            specT_c is not None
            and scale_c is not None
            and specT_c.base_x == (1, k)
            and specT_c.base_y == (1, k)
            and tuple(specT_c.row_dims) == (Wx, Wy)
            and tuple(specT_c.col_dims) == (Wxc, Wyc)
            and any(o == (0, 0) for o in specT_c.offsets)
            and all(
                o == (0, 0) or not np.any(specT_c.table[i])
                for i, o in enumerate(specT_c.offsets)
            )
        ):
            specT, scale_info = specT_c, scale_c
    factored = specT is not None
    # measured on TPU v5e: in-kernel expansion LOSES to streamed bf16 planes
    # (74 vs 94 Gnnz/s at 4096²) — the per-tile one-hot matmuls have a tiny
    # contraction dim (~20) and poor MXU utilisation, costing more than the
    # ~550 MB/cycle of plane streaming they save at ~250 GB/s practical HBM
    # bandwidth.  Off unless explicitly requested.
    expand_ik = (
        factored
        and os.environ.get("AMG_KERNEL_EXPAND", "") == "1"
        and isinstance(scale_info, tuple)
        and scale_info
        and scale_info[0] == "table"
        and np.dtype(specA.table.dtype).kind == "f"
        and (0, 0) in specA.offsets
    )

    def vmem_need(tx):
        bx, by = tx + 2 * Hfx, TY + 2 * Hly
        txc, tyc = tx // k, TY // k
        if expand_ik:
            # streamed: x, b, xc in; x, bc out (double-buffered).  All
            # coefficient planes are kernel locals expanded from the tables.
            ops = 2 * (
                item * 2 * bx * by
                + item * (txc + 2 * Hcx) * (tyc + 2 * Hcy)
                + item * bx * by
                + item * txc * tyc
            )
            tmp = item * (
                (nA + 3) * bx * by
                + (k * (txc + 2 * Hcx)) * (k * (tyc + 2 * Hcy))
                + 3 * bx * by
            )
            return ops + tmp
        n_fine_coef = (nA + 2 + 1) if factored else (nA + nP + 1)
        n_coarse_coef = 0 if factored else nR
        # double-buffered operands
        ops = 2 * (
            item * 2 * bx * by
            + item_c * n_fine_coef * bx * by
            + item_c * n_coarse_coef * txc * tyc
            + item * (txc + 2 * Hcx) * (tyc + 2 * Hcy)
            + item * bx * by
            + item * txc * tyc
        )
        # scoped-stack temporaries (single-buffered): the up kernel's
        # repeated coarse block (k²·(TXc+2Hc)²) plus ~3 live fine planes
        tmp = item * (
            (k * (txc + 2 * Hcx)) * (k * (tyc + 2 * Hcy)) + 3 * bx * by
        )
        return ops + tmp

    # 72 MB default (compiler cap is ~107): fits the TX=360 default tile.
    # The vmem_need estimate runs ~10% under Mosaic's actual near the cap
    # (measured OOMs at estimated 96/84 MB budgets) — keep ≥30% headroom.
    budget = int(os.environ.get("AMG_LEG_VMEM_MB", 72)) * 2**20
    # packed candidates shrink at the packing granularity (TX/2 must stay a
    # sublane multiple) so the VMEM fit can't silently strand the tile on a
    # non-packable size
    step = 8 * k if not packed_cand or (8 * k) % 16 == 0 else 16 * k
    if packed_cand and TX % step:
        TX = max(step, TX - TX % step)
    while vmem_need(TX) > budget and TX > step:
        TX -= step
    if vmem_need(TX) > budget:
        return None
    if not _tt:
        # per-level TX: among VMEM-fitting candidates ≤ the target WITH NO
        # MORE GRID STEPS than the target tile, minimise the covered window
        # area ceil(Wx/tx)·(tx + 2·Hfx) — the target is tuned for the finest
        # level, but a coarser level's Wx can shed x-overhang with a smaller
        # tile at the same grid (4096² L1 h4: Wx=1366 was 336×5 = 1920
        # covered sublanes under the old shrink; 384×4 = 1728 here).  Ties
        # go to the LARGER tx.  Larger-than-target candidates are excluded
        # (VMEM-pressure slowdowns are invisible to the area proxy: TX=456
        # fits but measured 6% slower at L0), and so are finer-grid ones
        # (per-step DMA/sync costs are invisible too).  Explicit
        # AMG_LEG_TILE overrides bypass this.
        gx_t = -(-Wx // TX)
        cands = [
            t for t in range(step, TX + 1, step)
            if vmem_need(t) <= budget and -(-Wx // t) <= gx_t
        ]
        # cands can be empty when TX is not a step multiple (non-packed
        # caches never snap TX to step): keep the shrunk TX so the TXc%8
        # guard below degrades to the unfused path instead of crashing.
        if cands:
            TX = min(cands, key=lambda t: ((-(-Wx // t)) * (t + 2 * Hfx), -t))
    BX, BY = TX + 2 * Hfx, TY + 2 * Hly
    TXc, TYc = TX // k, TY // k
    if TXc % 8 or TYc % 128:
        return None

    gx = -(-Wx // TX)
    gy = -(-Wy // TY)

    cnp = np.float32 if coef_dtype == _jnp.bfloat16 else np.dtype(coef_dtype)
    host_expand = (
        np.dtype(specA.table.dtype).kind != "f"
        or os.environ.get("AMG_HOST_EXPAND") == "1"
    )

    # packed-sweep + representative-tile-compaction decisions are pure
    # functions of the specs and the final tile shape — computed BEFORE the
    # expansion so the device builders apply them inside their (persisted)
    # jits; the host/debug paths apply the same transforms eagerly below
    packed = (
        packed_cand
        if (
            factored
            and not expand_ik
            and TX % 2 == 0
            and (TX // 2) % 8 == 0
            and Hfx % 8 == 0
        )
        else ""
    )
    cA = cT = cS = cP = cR = None
    if not expand_ik and os.environ.get("AMG_TILE_COMPACT", "") != "0":
        class _C:
            def __init__(self, K_x, s_x, K_y, s_y, dims):
                self.Kx, self.sx, self.Ky, self.sy = K_x, s_x, K_y, s_y
                self.row_dims = dims

        cA = _compact_pair(specA, TX, TY, Hfx, Hly, gx, gy)
        if factored:
            cT = _compact_pair(specT, TX, TY, Hfx, Hly, gx, gy, Wx, Wy)
            if isinstance(scale_info, tuple) and scale_info[0] == "table":
                KxS, sxS, KyS, syS = scale_info[2]
                cS = _compact_pair(
                    _C(KxS, sxS, KyS, syS, (Wx, Wy)), TX, TY, Hfx, Hly, gx, gy
                )
        else:
            cP = _compact_pair(specP, TX, TY, Hfx, Hly, gx, gy, Wx, Wy)
            cR = _compact_pair(specR, TXc, TYc, 0, 0, gx, gy, Wxc, Wyc)

    # scale plane inputs: either a boundary-classed table (extrapolated) or a
    # full-size vector (latticified tail levels) — both become (tbl, cx, cy)
    # selector inputs for the one-hot device expansion
    def _scale_inputs():
        from ...models.lattice import axis_classes

        kind = scale_info[0]
        if kind == "table":
            _, tbl, (Kx, sx, Ky, sy) = scale_info
            cxs = axis_classes(np.arange(Wx), Wx, Kx, sx)
            cys = axis_classes(np.arange(Wy), Wy, Ky, sy)
            return np.asarray(tbl, dtype=cnp), cxs, cys
        v = np.asarray(scale_info[1], dtype=cnp).reshape(Wx, Wy)
        return v, np.arange(Wx), np.arange(Wy)

    T_tiled = S_tiled = None
    tabA = tabT = tabS = None
    clsA = clsT = clsS = None
    diag_idx_f = -1
    if expand_ik:
        # ship only the O(K²) class tables; everything expands in-kernel
        diag_idx_f = specA.offsets.index((0, 0))
        idxT = specT.offsets.index((0, 0))
        _, tblS, (KxS, sxS, KyS, syS) = scale_info
        tab_np = np.float32 if jnp.dtype(dtype).itemsize <= 4 else np.dtype(dtype)
        tabA = jnp.asarray(np.asarray(specA.table, dtype=tab_np))
        tabT = jnp.asarray(np.asarray(specT.table[idxT], dtype=tab_np))
        tabS = jnp.asarray(np.asarray(tblS, dtype=tab_np))
        clsA = (specA.Kx, specA.sx, specA.Ky, specA.sy, Wx, Wy)
        clsT = (specT.Kx, specT.sx, specT.Ky, specT.sy, Wx, Wy)
        clsS = (KxS, sxS, KyS, syS, Wx, Wy)
        dummy = jnp.zeros((1, 1), dtype=jnp.dtype(dtype))
        dummy_c = jnp.zeros((1, 1), dtype=jnp.dtype(coef_dtype))
        A_tiled = R_tiled = P_tiled = T_tiled = S_tiled = dummy_c
        dinv_tiled = dummy
    elif host_expand:
        # host fallback: O(n) expand + full-plane upload (exotic dtypes, debug)
        A_tiled = np.zeros((gx, gy, nA, BX, BY), dtype=cnp)
        for kk in range(nA):
            A_tiled[:, :, kk] = _tile_with_halo(specA.expand(kk, dtype=cnp), gx, gy, TX, TY, Hfx, Hly)
        diag = specA.diagonal().reshape(Wx, Wy)
        dv = np.zeros((Wx, Wy), dtype=cnp)
        nz = diag != 0
        dv[nz] = 1.0 / diag[nz]
        dinv_tiled = jnp.asarray(
            _tile_with_halo(dv, gx, gy, TX, TY, Hfx, Hly), dtype=coef_dtype
        )
        A_tiled = jnp.asarray(A_tiled, dtype=coef_dtype)
        if factored:
            idxT = specT.offsets.index((0, 0))
            pT = specT.expand(idxT, dtype=cnp)
            tbl, cxs, cys = _scale_inputs()
            pS = tbl[cxs[:, None], cys[None, :]].astype(cnp)
            T_tiled = jnp.asarray(
                _tile_with_halo(pT, gx, gy, TX, TY, Hfx, Hly), dtype=coef_dtype
            )
            S_tiled = jnp.asarray(
                _tile_with_halo(pS, gx, gy, TX, TY, Hfx, Hly), dtype=coef_dtype
            )
            R_tiled = P_tiled = jnp.zeros((0,), dtype=coef_dtype)
            if packed:
                _pk = _pack_concat_dev if packed == "cb2" else _pack_concat_h_dev
                A_tiled, dinv_tiled = _pk(A_tiled), _pk(dinv_tiled)
                T_tiled, S_tiled = _pk(T_tiled), _pk(S_tiled)
            A_tiled = _compact_take(A_tiled, cA, gx, gy)
            dinv_tiled = _compact_take(dinv_tiled, cA, gx, gy)
            T_tiled = _compact_take(T_tiled, cT, gx, gy)
            S_tiled = _compact_take(S_tiled, cS, gx, gy)
        else:
            R_tiled = np.zeros((gx, gy, nR, TXc, TYc), dtype=cnp)
            for kk in range(nR):
                R_tiled[:, :, kk] = _tile_with_halo(specR.expand(kk, dtype=cnp), gx, gy, TXc, TYc, 0, 0)
            P_tiled = np.zeros((gx, gy, nP, BX, BY), dtype=cnp)
            for kk in range(nP):
                P_tiled[:, :, kk] = _tile_with_halo(specP.expand(kk, dtype=cnp), gx, gy, TX, TY, Hfx, Hly)
            R_tiled = jnp.asarray(R_tiled, dtype=coef_dtype)
            P_tiled = jnp.asarray(P_tiled, dtype=coef_dtype)
            A_tiled = _compact_take(A_tiled, cA, gx, gy)
            dinv_tiled = _compact_take(dinv_tiled, cA, gx, gy)
            P_tiled = _compact_take(P_tiled, cP, gx, gy)
            R_tiled = _compact_take(R_tiled, cR, gx, gy)
    else:
        # device-side expansion + tiling: upload only the O(K+s) tables and
        # O(W) class vectors — the O(n) host memset and the full-plane
        # host→device transfer (a tunnel POST on axon) both disappear.
        try:
            diag_idx = specA.offsets.index((0, 0))
        except ValueError:
            diag_idx = -1
        cxA, cyA = specA.row_class_arrays()
        if factored:
            idxT = specT.offsets.index((0, 0))
            cxT, cyT = specT.row_class_arrays()
            tblS, cxS, cyS = _scale_inputs()
            A_tiled, dinv_tiled, T_tiled, S_tiled = _build_tiles_factored_jit(
                jnp.asarray(np.asarray(specA.table, dtype=cnp)),
                jnp.asarray(cxA.astype(np.int32)), jnp.asarray(cyA.astype(np.int32)),
                jnp.asarray(np.asarray(specT.table[idxT], dtype=cnp)),
                jnp.asarray(cxT.astype(np.int32)), jnp.asarray(cyT.astype(np.int32)),
                jnp.asarray(tblS),
                jnp.asarray(np.asarray(cxS, dtype=np.int32)),
                jnp.asarray(np.asarray(cyS, dtype=np.int32)),
                gx=gx, gy=gy, TX=TX, TY=TY, Hfx=Hfx, Hfy=Hly,
                diag_idx=diag_idx,
                dtype_name=jnp.dtype(dtype).name,
                coef_name=jnp.dtype(coef_dtype).name,
                pack=packed, cA=cA, cT=cT, cS=cS,
            )
            R_tiled = P_tiled = jnp.zeros((0,), dtype=coef_dtype)
        else:
            cxR, cyR = specR.row_class_arrays()
            cxP, cyP = specP.row_class_arrays()
            A_tiled, dinv_tiled, R_tiled, P_tiled = _build_tiles_jit(
                jnp.asarray(np.asarray(specA.table, dtype=cnp)),
                jnp.asarray(cxA.astype(np.int32)), jnp.asarray(cyA.astype(np.int32)),
                jnp.asarray(np.asarray(specR.table, dtype=cnp)),
                jnp.asarray(cxR.astype(np.int32)), jnp.asarray(cyR.astype(np.int32)),
                jnp.asarray(np.asarray(specP.table, dtype=cnp)),
                jnp.asarray(cxP.astype(np.int32)), jnp.asarray(cyP.astype(np.int32)),
                gx=gx, gy=gy, TX=TX, TY=TY, Hfx=Hfx, Hfy=Hly, TXc=TXc, TYc=TYc,
                diag_idx=diag_idx,
                dtype_name=jnp.dtype(dtype).name,
                coef_name=jnp.dtype(coef_dtype).name,
                cA=cA, cP=cP, cR=cR,
            )

    dma_flag = os.environ.get("AMG_DMA_TILE", "1") != "0" and not expand_ik
    return FusedLegCache(
        A_tiled=A_tiled,
        dinv_tiled=dinv_tiled,
        R_tiled=R_tiled,
        P_tiled=P_tiled,
        offsA=specA.offsets,
        offsR=specR.offsets,
        offsP=specP.offsets,
        color_grid=tuple(tuple(int(c) for c in row) for row in np.asarray(color_grid)),
        n_colors=n_colors,
        k=k,
        row_dims=(Wx, Wy),
        col_dims=(Wxc, Wyc),
        tile=(TX, TY),
        Hf=(Hfx, Hfy),
        Hly=Hly,
        Hc=(Hcx, Hcy),
        omega=omega,
        iter=iters,
        forward=fwd,
        backward=bwd,
        interpret=interpret,
        T_tiled=T_tiled,
        S_tiled=S_tiled,
        factored=factored,
        tabA=tabA,
        tabT=tabT,
        tabS=tabS,
        clsA=clsA,
        clsT=clsT,
        clsS=clsS,
        diag_idx=diag_idx_f,
        expand_in_kernel=expand_ik,
        wdtype=jnp.dtype(dtype).name,
        sweep_dtype=os.environ.get("AMG_SWEEP_DTYPE", ""),
        cA=cA,
        cT=cT,
        cS=cS,
        cP=cP,
        cR=cR,
        # DMA-windowed x/b/xc (default on): measured win — removes the
        # _xla_tile materialisation passes.  AMG_DMA_TILE=0 restores the
        # BlockSpec-pipelined tile-stack path.
        dma=dma_flag,
        packed=packed,
        xcup=(
            {"1": "full", "0": "", "y": "y"}.get(
                os.environ.get("AMG_XC_UP", "y"), "y"
            )
            if (dma_flag and factored and not expand_ik)
            else ""
        ),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "gx", "gy", "TX", "TY", "Hfx", "Hfy", "diag_idx", "dtype_name",
        "coef_name", "pack", "cA", "cT", "cS",
    ),
)
def _build_tiles_factored_jit(
    TA, cxA, cyA, TT, cxT, cyT, TS, cxS, cyS, *,
    gx, gy, TX, TY, Hfx, Hfy, diag_idx, dtype_name, coef_name,
    pack="", cA=None, cT=None, cS=None,
):
    """Device-side expansion for the factored legs: A stencil planes + dinv
    plus the single-offset tentative-prolongator plane T and the ω·D̃⁻¹
    scale plane s (one-hot MXU selection, exact at HIGHEST precision).
    Packed-sweep coefficient packing and representative-tile compaction run
    inside the same jit — the whole per-level build is ONE persisted compile
    (post-passes as eager ops cost ~15 s of tiny unpersisted compiles per
    level per process, measured)."""
    dt = jnp.dtype(dtype_name)
    ct = jnp.dtype(coef_name)

    def planes3(T, cx, cy):
        Ex = (cx[:, None] == jnp.arange(T.shape[1], dtype=cx.dtype)).astype(T.dtype)
        Ey = (cy[:, None] == jnp.arange(T.shape[2], dtype=cy.dtype)).astype(T.dtype)
        return jnp.einsum(
            "xc,kcd,yd->kxy", Ex, T, Ey, precision=jax.lax.Precision.HIGHEST
        )

    def plane2(T, cx, cy):
        Ex = (cx[:, None] == jnp.arange(T.shape[0], dtype=cx.dtype)).astype(T.dtype)
        Ey = (cy[:, None] == jnp.arange(T.shape[1], dtype=cy.dtype)).astype(T.dtype)
        return jnp.einsum(
            "xc,cd,yd->xy", Ex, T, Ey, precision=jax.lax.Precision.HIGHEST
        )

    tile_f = lambda p: _tile_plane(p, gx, gy, TX, TY, Hfx, Hfy)

    pA = planes3(TA, cxA, cyA)
    A_tiled = jnp.moveaxis(jax.vmap(tile_f)(pA), 0, 2).astype(ct)
    diag = pA[diag_idx] if diag_idx >= 0 else jnp.zeros(pA.shape[1:], pA.dtype)
    dv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0).astype(ct)
    dinv_tiled = tile_f(dv)

    T_tiled = tile_f(plane2(TT, cxT, cyT)).astype(ct)
    S_tiled = tile_f(plane2(TS, cxS, cyS)).astype(ct)
    if pack:
        _pk = _pack_concat_dev if pack == "cb2" else _pack_concat_h_dev
        A_tiled, dinv_tiled = _pk(A_tiled), _pk(dinv_tiled)
        T_tiled, S_tiled = _pk(T_tiled), _pk(S_tiled)
    A_tiled = _compact_take_traced(A_tiled, cA)
    dinv_tiled = _compact_take_traced(dinv_tiled, cA)
    T_tiled = _compact_take_traced(T_tiled, cT)
    S_tiled = _compact_take_traced(S_tiled, cS)
    return A_tiled, dinv_tiled, T_tiled, S_tiled


# --------------------------------------------------------------------------
# kernel helpers
# --------------------------------------------------------------------------


def _color_of(i, j, TX, TY, Hx, Hy, BX, BY, color_grid):
    tab = np.asarray(color_grid)
    a, b = tab.shape
    px = jax.lax.broadcasted_iota(jnp.int32, (BX, BY), 0)
    py = jax.lax.broadcasted_iota(jnp.int32, (BX, BY), 1)
    cx = (i * TX + px - Hx + 16384 * a) % a
    cy = (j * TY + py - Hy + 16384 * b) % b
    out = jnp.zeros((BX, BY), jnp.int32)
    for u in range(a):
        for v in range(b):
            out = jnp.where((cx == u) & (cy == v), tab[u, v], out)
    return out


def _roll(src, a, axis, B):
    """jnp.roll on a VMEM block: tpu.dynamic_rotate for 32-bit dtypes;
    narrow dtypes (bf16 sweeps) use the slice+concat decomposition —
    Mosaic has no sub-32-bit lane rotate."""
    if a == 0:
        return src
    if src.dtype.itemsize >= 4:
        return pltpu.roll(src, a, axis=axis)
    if axis == 0:
        return jnp.concatenate([src[B - a :, :], src[: B - a, :]], axis=0)
    return jnp.concatenate([src[:, B - a :], src[:, : B - a]], axis=1)


def _stencil_apply(A, X, offs, BX, BY):
    """Σₖ A_k ⊙ roll(X, offs_k) — the Lat2D SpMV on a VMEM block."""
    acc = None
    for kk, (dx, dy) in enumerate(offs):
        src = X
        if dx:
            src = _roll(src, (-dx) % BX, 0, BX)
        if dy:
            src = _roll(src, (-dy) % BY, 1, BY)
        term = A[kk] * src
        acc = term if acc is None else acc + term
    return acc


def _doth(A, B):
    return jax.lax.dot_general(
        A, B, (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )


def _expand_tab_ik(T, cls, i, j, TX, TY, Hfx, Hfy, BX, BY, dtype):
    """Expand a (…, ncx, ncy) class table to full (…, BX, BY) planes inside
    the kernel: one-hot selection matmuls over the boundary-class ids of the
    tile's global coordinates.  Out-of-domain coordinates produce class ids
    outside [0, ncls) whose one-hot rows are all-zero — reproducing the zero
    halo padding of the streamed planes exactly (HIGHEST precision one-hot
    matmul is an exact copy)."""
    Kx, sx, Ky, sy, Wx, Wy = cls
    ncx, ncy = T.shape[-2], T.shape[-1]
    gxp = jax.lax.broadcasted_iota(jnp.int32, (BX, ncx), 0) + (i * TX - Hfx)
    cx = jnp.where(
        gxp < Kx,
        gxp,
        jnp.where(gxp < Wx - Kx, Kx + gxp % sx, Kx + sx + gxp - (Wx - Kx)),
    )
    Ex = (cx == jax.lax.broadcasted_iota(jnp.int32, (BX, ncx), 1)).astype(dtype)
    # build Ey pre-transposed (ncy, BY) — avoids a per-plane tiny-lane relayout
    gyp = jax.lax.broadcasted_iota(jnp.int32, (ncy, BY), 1) + (j * TY - Hfy)
    cy = jnp.where(
        gyp < Ky,
        gyp,
        jnp.where(gyp < Wy - Ky, Ky + gyp % sy, Ky + sy + gyp - (Wy - Ky)),
    )
    EyT = (cy == jax.lax.broadcasted_iota(jnp.int32, (ncy, BY), 0)).astype(dtype)
    Tv = T.astype(dtype)
    if Tv.ndim == 2:
        return _doth(_doth(Ex, Tv), EyT)
    return [_doth(_doth(Ex, Tv[k]), EyT) for k in range(Tv.shape[0])]


def _expand_ADTS(tA_ref, tT_ref, tS_ref, cache_meta, i, j, dtype):
    """(A planes, dinv, T, s) for one tile from the class tables."""
    clsA, clsT, clsS, diag_idx, TX, TY, Hfx, Hfy, BX, BY = cache_meta
    A = _expand_tab_ik(tA_ref[...], clsA, i, j, TX, TY, Hfx, Hfy, BX, BY, dtype)
    diag = A[diag_idx]
    D = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
    T = _expand_tab_ik(tT_ref[...], clsT, i, j, TX, TY, Hfx, Hfy, BX, BY, dtype)
    S = _expand_tab_ik(tS_ref[...], clsS, i, j, TX, TY, Hfx, Hfy, BX, BY, dtype)
    return A, D, T, S


def _steps_live_offsets(steps, color_grid, offs):
    """Per-step live stencil offsets for a sweep that starts from x = 0
    (coarse-level cycles always do — multilevel.jl:225 zero guess).

    Before step s only the already-updated colors hold nonzero values, so
    any offset whose source cells are ALL still-zero contributes an exact
    ``A_k ⊙ 0`` term.  Dropping those terms (and their rolls) is exact in
    IEEE semantics (adding ±0 is an identity up to zero signs no consumer
    distinguishes) — but NOT bitwise-stable across differently-shaped
    graphs: XLA's multiply-add contraction depends on the expression
    structure, so a sparsified graph can differ from the full one by
    ~1 ulp per step (measured 1e-7 at f32).  Cross-path bitwise tests
    therefore compare equally-sparsified engines; comparisons against
    full-sum engines use tolerances.  The first step needs no stencil at
    all (x ← ω·D⊙b on its color); a 9-point 4-color down-leg drops from
    63 to 43 offset terms across the 7 deduped symmetric steps."""
    tab = np.asarray(color_grid)
    a, b = tab.shape
    touched = set()
    out = []
    for c in steps:
        live = []
        for kk, (dx, dy) in enumerate(offs):
            hit = False
            for u in range(a):
                for v in range(b):
                    if tab[u][v] == c and tab[(u + dx) % a][(v + dy) % b] in touched:
                        hit = True
                        break
                if hit:
                    break
            if hit:
                live.append(kk)
        out.append(tuple(live))
        touched.add(c)
    return tuple(out)


def _sweep_c(L, B, D, A, col, steps, omega, offs, BX, BY, dt, live=None):
    """_sweep at the compute dtype ``dt`` (bf16 sweeps run the VPU ~1.8×
    faster, measured); residual/restriction stay at the working dtype."""
    if not dt or jnp.dtype(dt) == L.dtype:
        return _sweep(L, B, D, A, col, steps, omega, offs, BX, BY, live=live)
    d = jnp.dtype(dt)
    out = _sweep(
        L.astype(d), B.astype(d), D.astype(d), A.astype(d),
        col, steps, omega, offs, BX, BY, live=live,
    )
    return out.astype(L.dtype)


def _sweep(L, B, D, a_planes, color_of, steps, omega, offs, BX, BY, live=None):
    # hoist the per-step color compare: one mask per distinct color instead
    # of a full-block == per step (symmetric sweeps revisit colors)
    masks = {c: color_of == c for c in dict.fromkeys(steps)}
    for s, c in enumerate(steps):
        rsum = None
        for kk, (dx, dy) in enumerate(offs):
            if live is not None and kk not in live[s]:
                continue  # source cells still exactly zero (see _steps_live_offsets)
            src = L
            if dx:
                src = _roll(src, (-dx) % BX, 0, BX)
            if dy:
                src = _roll(src, (-dy) % BY, 1, BY)
            term = a_planes[kk] * src
            rsum = term if rsum is None else rsum + term
        val = B if rsum is None else B - rsum
        L = jnp.where(masks[c], L + omega * D * val, L)
    return L


# --------------------------------------------------------------------------
# packed 2-color (checkerboard) planes — see FusedLegCache.packed
#
# Layout: M[p, q] = L[p + q%2, q] (parity shift along sublanes), then
# R[pp, q] = M[2pp, q] (the (p+q)%2 == 0 set), K[pp, q] = M[2pp+1, q].
# All shifts wrap (pltpu.roll); the wrapped rows live in the outermost halo
# layers, which the builder's halo sizing (+2 when packed) discards.
# --------------------------------------------------------------------------


def _qodd_mask(BX, BY):
    return jax.lax.broadcasted_iota(jnp.int32, (BX, BY), 1) % 2 == 1


def _pack2(L, BX, BY):
    """(BX, BY) block → (R, K) checkerboard half planes (BX//2, BY)."""
    Lup = _roll(L, BX - 1, 0, BX)  # Lup[p] = L[p+1]
    M = jnp.where(_qodd_mask(BX, BY), Lup, L)
    Ms = M.reshape(BX // 2, 2, BY)
    return Ms[:, 0, :], Ms[:, 1, :]


def _unpack2(R, K, BX, BY):
    """Inverse of :func:`_pack2` (one interleave reshape + parity unshift)."""
    M2 = jnp.stack((R, K), axis=1).reshape(BX, BY)
    M2dn = _roll(M2, 1, 0, BX)  # M2dn[p] = M2[p-1]
    return jnp.where(_qodd_mask(BX, BY), M2dn, M2)


def _packed2_srcs(R, K, red, BX2, BY):
    """offset → source half plane for updating the given parity set.

    Derivation (q' denotes the column being READ):
      red    (0,0)→R  (−1,0)→Kn  (1,0)→K   (0,∓1)→roll(U, ±1 lanes) with
             U[·, q'] = Kn if q' odd else K,  Kn[pp] = K[pp−1]
      black  (0,0)→K  (−1,0)→R   (1,0)→Rs  (0,∓1)→roll(U2, ±1 lanes) with
             U2[·, q'] = R if q' odd else Rs, Rs[pp] = R[pp+1]
    """
    qodd = _qodd_mask(BX2, BY)
    if red:
        Kn = _roll(K, 1, 0, BX2)  # Kn[pp] = K[pp-1]
        U = jnp.where(qodd, Kn, K)
        return {
            (0, 0): R,
            (-1, 0): Kn,
            (1, 0): K,
            (0, -1): _roll(U, 1, 1, BY),
            (0, 1): _roll(U, BY - 1, 1, BY),
        }
    Rs = _roll(R, BX2 - 1, 0, BX2)  # Rs[pp] = R[pp+1]
    U2 = jnp.where(qodd, R, Rs)
    return {
        (0, 0): K,
        (-1, 0): R,
        (1, 0): Rs,
        (0, -1): _roll(U2, 1, 1, BY),
        (0, 1): _roll(U2, BY - 1, 1, BY),
    }


def _papply2(Lr, Lk, Ar, Ak, offs, BX2, BY):
    """Packed y = A·x: per-parity stencil sums in the cache's offset order
    (bitwise-identical accumulation to :func:`_stencil_apply`)."""
    sr = _packed2_srcs(Lr, Lk, True, BX2, BY)
    sk = _packed2_srcs(Lr, Lk, False, BX2, BY)
    yr = yk = None
    for kk, off in enumerate(offs):
        tr = Ar[kk] * sr[off]
        tk = Ak[kk] * sk[off]
        yr = tr if yr is None else yr + tr
        yk = tk if yk is None else yk + tk
    return yr, yk


def _psweep2(
    Lr, Lk, Br, Bk, Dr, Dk, Ar, Ak, steps_par, omega, offs, BX2, BY, live=None
):
    """Packed multicolor sweep: steps_par ∈ {0 (red), 1 (black)}*; each step
    updates one half plane with the same expression as :func:`_sweep`."""
    for s, par in enumerate(steps_par):
        if par == 0:
            srcs = _packed2_srcs(Lr, Lk, True, BX2, BY)
            rsum = None
            for kk, off in enumerate(offs):
                if live is not None and kk not in live[s]:
                    continue
                term = Ar[kk] * srcs[off]
                rsum = term if rsum is None else rsum + term
            Lr = Lr + omega * Dr * (Br if rsum is None else Br - rsum)
        else:
            srcs = _packed2_srcs(Lr, Lk, False, BX2, BY)
            rsum = None
            for kk, off in enumerate(offs):
                if live is not None and kk not in live[s]:
                    continue
                term = Ak[kk] * srcs[off]
                rsum = term if rsum is None else rsum + term
            Lk = Lk + omega * Dk * (Bk if rsum is None else Bk - rsum)
    return Lr, Lk


def _steps_parity(steps, color_grid):
    """Color ids → parity sets (0 = the (p+q)%2==0 set) for a checkerboard
    2×2 color grid (valid only when :func:`_packed2_ok` accepted it)."""
    tab00 = int(np.asarray(color_grid)[0][0])
    return tuple(0 if c == tab00 else 1 for c in steps)


def _packed2_ok(offsets, color_grid, n_colors):
    """Stencil/coloring eligibility for the packed 2-color sweeps."""
    if n_colors != 2:
        return False
    tab = np.asarray(color_grid)
    if tab.shape != (2, 2):
        return False
    if not (tab[0, 0] == tab[1, 1] and tab[0, 1] == tab[1, 0] and tab[0, 0] != tab[0, 1]):
        return False
    cross = {(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)}
    return all(o in cross for o in offsets)


def _pack_concat_dev(p):
    """Build-time coefficient packing (jnp): (..., BX, BY) plane →
    [red; black] concatenated along the sublane axis (same shape).  The wrap
    convention matches the kernels' in-block :func:`_pack2` exactly."""
    BX, BY = p.shape[-2], p.shape[-1]
    qodd = jnp.arange(BY) % 2 == 1
    pup = jnp.roll(p, -1, axis=-2)  # pup[p] = p[p+1]
    M = jnp.where(qodd, pup, p)
    Ms = M.reshape(p.shape[:-2] + (BX // 2, 2, BY))
    return jnp.concatenate([Ms[..., 0, :], Ms[..., 1, :]], axis=-2)


def _pack_concat_np(p):
    BX, BY = p.shape[-2], p.shape[-1]
    qodd = np.arange(BY) % 2 == 1
    pup = np.roll(p, -1, axis=-2)
    M = np.where(qodd, pup, p)
    Ms = M.reshape(p.shape[:-2] + (BX // 2, 2, BY))
    return np.concatenate([Ms[..., 0, :], Ms[..., 1, :]], axis=-2)


# --------------------------------------------------------------------------
# packed 4-color (2×2 grid) planes — the 9-point-stencil analogue.
#
# Rows split by p-parity into two half planes Pu[pp, q] = L[2pp + u, q]
# (pure sublane reshape picks — no shifts, no extra halo contamination);
# a color (u, v) lives in plane u at lanes q%2 == v.  Each color step runs
# the 9 stencil FMAs on ONE half plane with uniform (never parity-selected)
# neighbour shifts, then blends on the lane-parity mask — half the masked
# sweep's per-step VPU work.
# --------------------------------------------------------------------------


def _packh(L, BX, BY):
    Ms = L.reshape(BX // 2, 2, BY)
    return Ms[:, 0, :], Ms[:, 1, :]


def _unpackh(P0, P1, BX, BY):
    return jnp.stack((P0, P1), axis=1).reshape(BX, BY)


def _srcs_h(P0, P1, u, offs, BX2, BY):
    """(w, su, dy) → rolled source half plane for updating/applying row
    parity ``u``: offset (dx, dy) reads plane w = (u+dx)%2 at sublane shift
    su = (u+dx-w)//2 and lane shift dy.  Rolled planes shared across
    offsets."""
    subs = {}
    out = {}
    for dx, dy in offs:
        w = (u + dx) % 2
        su = (u + dx - w) // 2
        if (w, su) not in subs:
            base = P0 if w == 0 else P1
            subs[(w, su)] = base if su == 0 else _roll(base, (-su) % BX2, 0, BX2)
        if (w, su, dy) not in out:
            s = subs[(w, su)]
            out[(w, su, dy)] = s if dy == 0 else _roll(s, (-dy) % BY, 1, BY)
    return out


def _src_key_h(u, dx, dy):
    w = (u + dx) % 2
    return (w, (u + dx - w) // 2, dy)


def _papplyh(P0, P1, A0, A1, offs, BX2, BY):
    """Row-parity-split y = A·x (bitwise-identical accumulation order)."""
    ys = []
    for u, Au in ((0, A0), (1, A1)):
        srcs = _srcs_h(P0, P1, u, offs, BX2, BY)
        y = None
        for kk, (dx, dy) in enumerate(offs):
            term = Au[kk] * srcs[_src_key_h(u, dx, dy)]
            y = term if y is None else y + term
        ys.append(y)
    return ys[0], ys[1]


def _psweeph(
    P0, P1, B0, B1, D0, D1, A0, A1, steps_uv, omega, offs, BX2, BY, live=None
):
    qpar = jax.lax.broadcasted_iota(jnp.int32, (BX2, BY), 1) % 2
    qmask = {v: qpar == v for v in (0, 1)}  # hoisted per-step compare
    for s, (u, v) in enumerate(steps_uv):
        Pu = P0 if u == 0 else P1
        Au = A0 if u == 0 else A1
        Bu = B0 if u == 0 else B1
        Du = D0 if u == 0 else D1
        lv = None if live is None else live[s]
        srcs = _srcs_h(
            P0, P1, u,
            offs if lv is None else [offs[kk] for kk in lv],
            BX2, BY,
        )
        rsum = None
        for kk, (dx, dy) in enumerate(offs):
            if lv is not None and kk not in lv:
                continue
            term = Au[kk] * srcs[_src_key_h(u, dx, dy)]
            rsum = term if rsum is None else rsum + term
        upd = Pu + omega * Du * (Bu if rsum is None else Bu - rsum)
        Pu = jnp.where(qmask[v], upd, Pu)
        if u == 0:
            P0 = Pu
        else:
            P1 = Pu
    return P0, P1


def _steps_uv(steps, color_grid):
    tab = np.asarray(color_grid)
    pos = {int(tab[u, v]): (u, v) for u in range(2) for v in range(2)}
    return tuple(pos[c] for c in steps)


def _packed4h_ok(offsets, color_grid, n_colors):
    """Eligibility for the 4-color two-plane packing: 2×2 color grid with 4
    distinct colors and a stencil within the ±1 box."""
    if n_colors != 4:
        return False
    tab = np.asarray(color_grid)
    if tab.shape != (2, 2) or len({int(c) for c in tab.ravel()}) != 4:
        return False
    return all(-1 <= dx <= 1 and -1 <= dy <= 1 for dx, dy in offsets)


def _pack_concat_h_dev(p):
    """Build-time row-parity coefficient packing: [even rows; odd rows]
    concatenated along the sublane axis (same storage shape)."""
    BX = p.shape[-2]
    Ms = p.reshape(p.shape[:-2] + (BX // 2, 2, p.shape[-1]))
    return jnp.concatenate([Ms[..., 0, :], Ms[..., 1, :]], axis=-2)


# unified dispatch for the two packed modes ("cb2" checkerboard halves,
# "h4" row-parity halves); coefficient planes arrive pre-packed either way
# as [first-half; second-half] sublane concats


def _pk_pack(mode, L, BX, BY):
    return _pack2(L, BX, BY) if mode == "cb2" else _packh(L, BX, BY)


def _pk_unpack(mode, a, b, BX, BY):
    return _unpack2(a, b, BX, BY) if mode == "cb2" else _unpackh(a, b, BX, BY)


def _pk_apply(mode, a, b, Aa, Ab, offs, BX2, BY):
    if mode == "cb2":
        return _papply2(a, b, Aa, Ab, offs, BX2, BY)
    return _papplyh(a, b, Aa, Ab, offs, BX2, BY)


def _pk_sweep(
    mode, a, b, Ba, Bb, Da, Db, Aa, Ab, steps, color_grid, omega, offs,
    BX2, BY, live=None,
):
    if mode == "cb2":
        return _psweep2(
            a, b, Ba, Bb, Da, Db, Aa, Ab,
            _steps_parity(steps, color_grid), omega, offs, BX2, BY, live=live,
        )
    return _psweeph(
        a, b, Ba, Bb, Da, Db, Aa, Ab,
        _steps_uv(steps, color_grid), omega, offs, BX2, BY, live=live,
    )


def _subsample(L, s0x, s0y, k, TXc, TYc):
    """Exact stride-k pick: L[s0x::k, s0y::k] → (TXc, TYc), via sublane
    reshapes + transposes (no lane-strided slices in Mosaic)."""
    C = jax.lax.slice(L, (s0x, s0y), (s0x + k * TXc, s0y + k * TYc))
    sx = C.reshape(TXc, k, k * TYc)[:, 0, :]
    t = sx.T
    sy = t.reshape(TYc, k, TXc)[:, 0, :]
    return sy.T


def _all_residue_subsamples(r, Hx, Hy, k, TXc, TYc, M=1):
    """sub[rx][ry][c, d] = r[Hx + rx + k·(c−M), Hy + ry + k·(d−M)] with a
    ±M coarse-cell margin — shares the expensive VMEM transposes across
    residues (1 + k transposes total instead of 2 per restriction offset).
    Requires Hx ≥ k·M + (k−1) − ... i.e. Hx − k·M ≥ 0 and the symmetric
    bound on the high side (guaranteed by the builder's halo sizing)."""
    BX = r.shape[0]
    nxm, nym = TXc + 2 * M, TYc + 2 * M
    rT = r.T  # one big transpose: (BY, BX)
    subs = [[None] * k for _ in range(k)]
    for ry in range(k):
        y0 = Hy + ry - k * M
        cy = jax.lax.slice(rT, (y0, 0), (y0 + k * nym, BX))
        py = cy.reshape(nym, k, BX)[:, 0, :]   # (nym, BX)
        back = py.T                             # (BX, nym) — one transpose per ry
        for rx in range(k):
            x0 = Hx + rx - k * M
            cx = jax.lax.slice(back, (x0, 0), (x0 + k * nxm, nym))
            subs[rx][ry] = cx.reshape(nxm, k, nym)[:, 0, :]
    return subs


def _box_downsample(ts, Hx, Hy, k, TXc, TYc):
    """bc[c, d] = Σ_{rx, ry ∈ [0,k)²} ts[Hx + k·c + rx, Hy + k·d + ry] — the
    factored restriction's unit-weight k×k box sum (Tᵀ of a box-k tentative
    prolongator sums each k×k cell, ref: src/aggregation.jl:161-193 column
    scatter).  Reduce-then-pick replaces the k² margined subsamples of
    :func:`_all_residue_subsamples`: the x axis collapses with a sublane
    reshape-sum and the y axis with (k−1) lane rolls, so the expensive VMEM
    transposes shrink from (1 + k) full (BX, BY) blocks to one
    (k·TYc, TXc) round trip (~k× less relayout traffic per leg)."""
    C = jax.lax.slice(ts, (Hx, Hy), (Hx + k * TXc, Hy + k * TYc))
    g = C.reshape(TXc, k, k * TYc)
    sx = g[:, 0, :]
    for a in range(1, k):
        sx = sx + g[:, a, :]
    # u[j] = Σ_a sx[j + a]; the wrapped last (k−1) lanes are never picked
    # (picked lanes are j = k·d ≤ k·TYc − k)
    u = sx
    for a in range(1, k):
        u = u + _roll(sx, (-a) % (k * TYc), 1, k * TYc)
    t = u.T
    return t.reshape(TYc, k, TXc)[:, 0, :].T


def _steps_list(n_colors, iters, fwd, bwd, omega=1.0):
    from ..coloring import color_steps

    return color_steps(n_colors, iters, fwd, bwd, omega)


def _steps2_list(n_colors, iters, fwd, bwd, omega=1.0):
    """Steps for the cross-cycle double sweep (postsmooth(i) directly
    followed by presmooth(i+1)): the concatenation of two sweeps, with the
    boundary duplicate collapsed at ω == 1 (same idempotence argument as
    within a symmetric sweep)."""
    s = _steps_list(n_colors, iters, fwd, bwd, omega)
    if omega == 1.0 and s and len(s) > 0 and s[0] == s[-1]:
        return s + s[1:]
    return s + s


def _hly(cache):
    """Effective lane load halo (cache.Hly, falling back to the plane
    margin for caches built before the decoupling)."""
    return cache.Hly or cache.Hf[1]


def _emeta(cache):
    if not cache.expand_in_kernel:
        return None
    TX, TY = cache.tile
    Hfx = cache.Hf[0]
    Hfy = _hly(cache)
    return (
        cache.clsA, cache.clsT, cache.clsS, cache.diag_idx,
        TX, TY, Hfx, Hfy, TX + 2 * Hfx, TY + 2 * Hfy,
    )


def _tab_spec(tab):
    nd = tab.ndim
    return pl.BlockSpec(tab.shape, lambda j, i: (0,) * nd, memory_space=pltpu.VMEM)


def _cspec(block_shape, c=None):
    """BlockSpec for a [gx, gy, ...] tiled operand under the (gy, gx) grid
    (tile-x innermost so interior runs are consecutive); ``c`` is the
    compaction descriptor ((xrun, yrun) or None) mapping interior tiles to
    the stored representative block."""
    nd = len(block_shape)
    fx = _axmap(None if c is None else c[0])
    fy = _axmap(None if c is None else c[1])
    tail = (0,) * (nd - 2)
    return pl.BlockSpec(
        block_shape,
        lambda j, i: (fx(i), fy(j)) + tail,
        memory_space=pltpu.VMEM,
    )


# --------------------------------------------------------------------------
# down: presmooth + residual + restrict
# --------------------------------------------------------------------------


def _down_kernel(
    x_ref, b_ref, *rest,
    offsA, offsR, color_grid, steps, omega, k, Hfx, Hfy, TX, TY, tiled_out,
    factored, expand=False, emeta=None, cdt="", dma=False, gxs=0, gys=0,
    packed="", plane_out=False, maskx=False, Wxy=(0, 0), zero_x=False,
    Hpy=0,
):
    # Hfy is the lane LOAD halo the kernel computes with; Hpy (≥ Hfy) is the
    # flat planes' 128-aligned store margin — loads offset by oy, stores by Hpy
    Hpy = Hpy or Hfy
    oy = Hpy - Hfy
    BX, BY = TX + 2 * Hfx, TY + 2 * Hfy
    TXc, TYc = TX // k, TY // k
    i = pl.program_id(1)
    j = pl.program_id(0)

    wdt = x_ref.dtype
    obuf = osem = None
    if dma:
        if plane_out:
            rest, obuf, osem = rest[:-2], rest[-2], rest[-1]
        rest, xbuf, bbuf, sems = rest[:-3], rest[-3], rest[-2], rest[-1]
        t = j * gxs + i
        num = gxs * gys
        if zero_x:
            # coarse-level zero guess: no x window fetch at all
            L = jnp.zeros((BX, BY), wdt)
        else:
            L = _dma_window(x_ref, xbuf, sems, 0, t, num, gxs, TX, TY, oy=oy)
            if maskx:
                L = _domain_mask(L, i, j, TX, TY, Hfx, Hfy, Wxy[0], Wxy[1])
        B = _dma_window(b_ref, bbuf, sems, 1, t, num, gxs, TX, TY, oy=oy)
    else:
        L = jnp.zeros((BX, BY), wdt) if zero_x else x_ref[0, 0]
        B = b_ref[0, 0]
    # zero-start sweeps skip offsets whose source colors are still zero
    live = _steps_live_offsets(steps, color_grid, offsA) if zero_x else None

    def emit_x(Lfull):
        if plane_out:
            _plane_store(
                xo_ref, obuf, osem, j * gxs + i, gxs * gys, gxs, TX, TY,
                Hfx, Hpy, Lfull[Hfx : Hfx + TX, Hfy : Hfy + TY].astype(wdt),
            )
        elif tiled_out:
            xo_ref[0, 0] = Lfull.astype(wdt)
        else:
            xo_ref[:] = Lfull[Hfx : Hfx + TX, Hfy : Hfy + TY].astype(wdt)
    if expand:
        tA_ref, tT_ref, tS_ref, xo_ref, bc_ref = rest
        A, D, Tv, Sv = _expand_ADTS(tA_ref, tT_ref, tS_ref, emeta, i, j, L.dtype)
    elif factored:
        d_ref, a_ref, t_ref, s_ref, xo_ref, bc_ref = rest
        D = d_ref[0, 0].astype(L.dtype)
        A = a_ref[0, 0].astype(L.dtype)
        Tv = t_ref[0, 0].astype(L.dtype)
        Sv = s_ref[0, 0].astype(L.dtype)
    else:
        d_ref, a_ref, r_ref, xo_ref, bc_ref = rest
        D = d_ref[0, 0].astype(L.dtype)
        A = a_ref[0, 0].astype(L.dtype)

    if packed:
        # half the VPU work per color step: sweep + residual + factored
        # restriction all in same-parity half planes (coefficients arrive
        # pre-packed [first; second] along sublanes from the builder)
        BX2 = BX // 2
        Lr, Lk = _pk_pack(packed, L, BX, BY)
        Br, Bk = _pk_pack(packed, B, BX, BY)
        Dr, Dk = D[:BX2], D[BX2:]
        Ar = [A[kk, :BX2] for kk in range(len(offsA))]
        Ak = [A[kk, BX2:] for kk in range(len(offsA))]
        Lr, Lk = _pk_sweep(
            packed, Lr, Lk, Br, Bk, Dr, Dk, Ar, Ak,
            steps, color_grid, omega, offsA, BX2, BY, live=live,
        )
        L = _pk_unpack(packed, Lr, Lk, BX, BY)
        emit_x(L)
        yr, yk = _pk_apply(packed, Lr, Lk, Ar, Ak, offsA, BX2, BY)
        rr, rk = Br - yr, Bk - yk
        gr, gk = Sv[:BX2] * rr, Sv[BX2:] * rk
        ar, ak = _pk_apply(packed, gr, gk, Ar, Ak, offsA, BX2, BY)
        tsr = Tv[:BX2] * (rr - ar)
        tsk = Tv[BX2:] * (rk - ak)
        ts = _pk_unpack(packed, tsr, tsk, BX, BY)
        bc_ref[:] = _box_downsample(ts, Hfx, Hfy, k, TXc, TYc).astype(bc_ref.dtype)
        return

    col = _color_of(i, j, TX, TY, Hfx, Hfy, BX, BY, color_grid)
    L = _sweep_c(L, B, D, A, col, steps, omega, offsA, BX, BY, cdt, live=live)
    # tiled_out hands the whole halo block to the up leg (the outer
    # n_steps·reachA halo layers are stale, but the builder sized Hf so the
    # remaining valid band covers the up leg's sweeps)
    emit_x(L)

    # residual on the (still-valid) halo region
    r = B - _stencil_apply(A, L, offsA, BX, BY)

    M = 1
    if factored or expand:
        # R = Tᵀ(I − A·diag(s)):  b_c = Tᵀ(r − A(s⊙r)); Tᵀ is a box-k sum,
        # i.e. a unit-weight k×k box downsample of T⊙s̃
        g = Sv * r
        ts = Tv * (r - _stencil_apply(A, g, offsA, BX, BY))
        bc_ref[:] = _box_downsample(ts, Hfx, Hfy, k, TXc, TYc).astype(bc_ref.dtype)
        return

    # restriction: coarse local cl reads fine local k·cl + (δ + Hf).
    # Residue-shared subsamples: offset δ uses residue (δ mod k) shifted by
    # the floor quotient — a static slice of the margined subsample.
    subs = _all_residue_subsamples(r, Hfx, Hfy, k, TXc, TYc, M=M)
    acc = None
    for kk, (dx, dy) in enumerate(offsR):
        rx, ry = dx % k, dy % k
        mx, my = dx // k, dy // k
        sub = jax.lax.slice(
            subs[rx][ry], (M + mx, M + my), (M + mx + TXc, M + my + TYc)
        )
        term = r_ref[0, 0, kk].astype(sub.dtype) * sub
        acc = term if acc is None else acc + term
    bc_ref[:] = acc.astype(bc_ref.dtype)


def fused_down(cache: FusedLegCache, x, b, tiled: bool = False, bpad=None,
               x_zero: bool = False):
    """(x', b_c) = (presmooth(x, b), R·(b − A·x')) — one pallas_call.

    ``x_zero=True`` asserts x is the zero vector (coarse-level cycles start
    from the zero guess, multilevel.jl:225): the kernel skips the x window
    fetch and sparsifies the early sweep steps to the offsets whose source
    colors are already nonzero (exact up to graph-shape-dependent XLA
    multiply-add contraction — see :func:`_steps_live_offsets`).

    ``tiled=True`` returns ``(Xt', b_c, Bt)`` with ``Xt'`` the full halo-block
    form (consumed directly by :func:`fused_up_t` — skips one untile and one
    re-tile of x per level per cycle) and ``Bt`` the tiled rhs for reuse.

    DMA caches (``cache.dma``) with ``tiled=True`` return
    ``(Xp', b_c, bpad)`` where ``Xp'`` is the smoothed x as a PADDED PLANE
    (written by in-kernel output DMA; margins unwritten — every consumer
    kernel domain-masks its loaded windows) and ``bpad`` the padded rhs
    plane; both feed :func:`fused_up`/:func:`fused_updown` directly with no
    XLA pad/reshape pass between legs.  ``x`` may itself be a plane (ndim
    2) from a previous chained leg."""
    Wx, Wy = cache.row_dims
    Wxc, Wyc = cache.col_dims
    TX, TY = cache.tile
    Hfx, Hpy = cache.Hf
    Hfy = _hly(cache)  # lane load halo — the kernel block geometry
    k = cache.k
    gx, gy = cache.grid
    BX, BY = TX + 2 * Hfx, TY + 2 * Hfy
    TXc, TYc = TX // k, TY // k
    dtype = jnp.dtype(cache.wdtype)
    n = Wx * Wy

    maskx = False
    plane_out = bool(tiled and cache.dma)
    x_zero = bool(
        x_zero
        and not cache.expand_in_kernel
        and os.environ.get("AMG_ZERO_START", "1") != "0"
    )
    if cache.dma:
        maskx = (not x_zero) and x.ndim == 2
        if x_zero:
            # kernel never fetches x — a dummy operand keeps the signature
            Xt = jnp.zeros((8, 128), dtype)
        elif maskx:
            Xt = x
        else:
            Xt = _pad_plane(x, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hpy, dtype)
        Bt = (
            bpad
            if bpad is not None
            else _pad_plane(b, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hpy, dtype)
        )
    else:
        Xt = (
            jnp.zeros((8, 128), dtype)
            if x_zero
            else _xla_tile(x, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hfy, dtype)
        )
        Bt = _xla_tile(b, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hfy, dtype)

    kern = functools.partial(
        _down_kernel,
        plane_out=plane_out,
        maskx=maskx,
        Wxy=(Wx, Wy),
        offsA=cache.offsA,
        offsR=cache.offsR,
        color_grid=cache.color_grid,
        steps=_steps_list(
            cache.n_colors, cache.iter, cache.forward, cache.backward, cache.omega
        ),
        omega=cache.omega,
        k=k,
        Hfx=Hfx,
        Hfy=Hfy,
        TX=TX,
        TY=TY,
        tiled_out=tiled and not cache.dma,
        factored=cache.factored,
        expand=cache.expand_in_kernel,
        emeta=_emeta(cache),
        cdt=cache.sweep_dtype,
        dma=cache.dma,
        gxs=gx,
        gys=gy,
        packed=cache.packed,
        zero_x=x_zero,
        Hpy=Hpy,
    )
    tile_spec = _any_spec() if cache.dma else _cspec((1, 1, BX, BY))
    # zero_x: the x operand is a dummy the kernel never reads
    x_spec = tile_spec
    if x_zero and not cache.dma:
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    a_blk = (1, 1, len(cache.offsA), BX, BY)
    if cache.expand_in_kernel:
        extra_specs = [_tab_spec(cache.tabA), _tab_spec(cache.tabT), _tab_spec(cache.tabS)]
        extra_ops = [cache.tabA, cache.tabT, cache.tabS]
    elif cache.factored:
        extra_specs = [
            _cspec((1, 1, BX, BY), cache.cA),
            _cspec(a_blk, cache.cA),
            _cspec((1, 1, BX, BY), cache.cT),
            _cspec((1, 1, BX, BY), cache.cS),
        ]
        extra_ops = [cache.dinv_tiled, cache.A_tiled, cache.T_tiled, cache.S_tiled]
    else:
        extra_specs = [
            _cspec((1, 1, BX, BY), cache.cA),
            _cspec(a_blk, cache.cA),
            _cspec((1, 1, len(cache.offsR), TXc, TYc), cache.cR),
        ]
        extra_ops = [cache.dinv_tiled, cache.A_tiled, cache.R_tiled]
    # outputs at logical size: edge blocks overhang and Mosaic masks the
    # out-of-bounds stores — no post-slice pass over the result
    eff_tiled = tiled and not cache.dma
    if plane_out:
        xo_spec = _any_spec()
        xo_shape = jax.ShapeDtypeStruct(
            (2 * Hfx + gx * TX, 2 * Hpy + gy * TY), dtype
        )
    elif eff_tiled:
        xo_spec = tile_spec
        xo_shape = jax.ShapeDtypeStruct((gx, gy, BX, BY), dtype)
    else:
        xo_spec = _cspec((TX, TY))
        xo_shape = jax.ShapeDtypeStruct((Wx, Wy), dtype)
    xo, bc = pl.pallas_call(
        kern,
        grid=(gy, gx),
        in_specs=[x_spec, tile_spec] + extra_specs,
        out_specs=(
            xo_spec,
            _cspec((TXc, TYc)),
        ),
        out_shape=(
            xo_shape,
            jax.ShapeDtypeStruct((Wxc, Wyc), dtype),
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((2, BX, BY), dtype),
                pltpu.VMEM((2, BX, BY), dtype),
                _dma_sems(2),
            ]
            + (
                [pltpu.VMEM((2, TX, TY), dtype), pltpu.SemaphoreType.DMA((2,))]
                if plane_out
                else []
            )
            if cache.dma
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("arbitrary", "arbitrary") if cache.dma else ("parallel", "parallel")
            ),
            vmem_limit_bytes=104 * 2**20,  # v5e VMEM 128M, compiler cap ~107M;
            # TX=384 puts the L1 up kernel at 100.33M scoped stack (measured)
        ),
        interpret=cache.interpret,
    )(Xt, Bt, *extra_ops)

    out_dtype = dtype if x.ndim == 2 else x.dtype
    bc = bc.reshape(Wxc * Wyc).astype(out_dtype)
    if plane_out or eff_tiled:
        return xo, bc, Bt
    xo = xo.reshape(n).astype(out_dtype)
    pad = x.shape[0] - n
    if pad > 0:
        xo = jnp.pad(xo, (0, pad))
    return xo, bc


# --------------------------------------------------------------------------
# up: prolong-correct + postsmooth
# --------------------------------------------------------------------------


def _up_kernel(
    x_ref, b_ref, *rest,
    offsA, offsP, color_grid, steps, omega, k, Hfx, Hfy, Hcx, Hcy, TX, TY,
    factored, expand=False, emeta=None, cdt="", dma=False, gxs=0, gys=0,
    packed="", xcup=False, maskx=False, Wxy=(0, 0), Hpy=0,
):
    Hpy = Hpy or Hfy
    oy = Hpy - Hfy
    BX, BY = TX + 2 * Hfx, TY + 2 * Hfy
    i = pl.program_id(1)
    j = pl.program_id(0)

    wdt = x_ref.dtype
    if dma:
        rest, xbuf, bbuf, cbuf, sems = rest[:-4], rest[-4], rest[-3], rest[-2], rest[-1]
        t = j * gxs + i
        num = gxs * gys
        L = _dma_window(x_ref, xbuf, sems, 0, t, num, gxs, TX, TY, oy=oy)
        B = _dma_window(b_ref, bbuf, sems, 1, t, num, gxs, TX, TY, oy=oy)
        if maskx:
            L = _domain_mask(L, i, j, TX, TY, Hfx, Hfy, Wxy[0], Wxy[1])
    else:
        L = x_ref[0, 0]
        B = b_ref[0, 0]
    if expand:
        tA_ref, tT_ref, tS_ref, xc_ref, xo_ref = rest
        A, D, Tv, Sv = _expand_ADTS(tA_ref, tT_ref, tS_ref, emeta, i, j, L.dtype)
    elif factored:
        d_ref, a_ref, t_ref, s_ref, xc_ref, xo_ref = rest
        D = d_ref[0, 0].astype(L.dtype)
        A = a_ref[0, 0].astype(L.dtype)
        Tv = t_ref[0, 0].astype(L.dtype)
        Sv = s_ref[0, 0].astype(L.dtype)
    else:
        d_ref, a_ref, p_ref, xc_ref, xo_ref = rest
        D = d_ref[0, 0].astype(L.dtype)
        A = a_ref[0, 0].astype(L.dtype)
    if dma:
        TXc, TYc = TX // k, TY // k
        if xcup == "full":
            XC = _dma_window(
                xc_ref, cbuf, sems, 2, j * gxs + i, gxs * gys, gxs, TX, TY, oy=oy
            )
        elif xcup == "y":
            XC = _dma_window(
                xc_ref, cbuf, sems, 2, j * gxs + i, gxs * gys, gxs, TXc, TY, oy=oy
            )
        else:
            XC = _dma_window(xc_ref, cbuf, sems, 2, j * gxs + i, gxs * gys, gxs, TXc, TYc)
    else:
        XC = xc_ref[0, 0]

    # prolong-correct: fine local f reads coarse (f − Hf)//k + δ + Hc
    # (see _corr_src for the xcup-mode geometry)
    if factored or expand:
        src0 = _corr_src(XC, xcup, k, Hcx, Hcy, Hfx, Hfy, BX, BY)
    if packed:
        BX2 = BX // 2
        src = src0
        Lr, Lk = _pk_pack(packed, L, BX, BY)
        Br, Bk = _pk_pack(packed, B, BX, BY)
        sr, sk = _pk_pack(packed, src, BX, BY)
        Dr, Dk = D[:BX2], D[BX2:]
        Ar = [A[kk, :BX2] for kk in range(len(offsA))]
        Ak = [A[kk, BX2:] for kk in range(len(offsA))]
        Tup_r, Tup_k = Tv[:BX2] * sr, Tv[BX2:] * sk
        ar, ak = _pk_apply(packed, Tup_r, Tup_k, Ar, Ak, offsA, BX2, BY)
        Lr = Lr + (Tup_r - Sv[:BX2] * ar)
        Lk = Lk + (Tup_k - Sv[BX2:] * ak)
        Lr, Lk = _pk_sweep(
            packed, Lr, Lk, Br, Bk, Dr, Dk, Ar, Ak,
            steps, color_grid, omega, offsA, BX2, BY,
        )
        L = _pk_unpack(packed, Lr, Lk, BX, BY)
        xo_ref[:] = L[Hfx : Hfx + TX, Hfy : Hfy + TY].astype(xo_ref.dtype)
        return
    if factored or expand:
        # P = (I − diag(s)·A)·T, T single-offset: corr = Tup − s⊙(A·Tup)
        Tup = Tv * src0
        corr = Tup - Sv * _stencil_apply(A, Tup, offsA, BX, BY)
    else:
        # non-factored: per-offset P-plane slices need the fully upsampled
        # block (builder never sets an xcup mode for non-factored caches)
        upx = jnp.repeat(XC, k, axis=0)
        up = jnp.repeat(upx.T, k, axis=0).T
        corr = None
        for kk, (dx, dy) in enumerate(offsP):
            sx = k * (dx + Hcx) - Hfx
            sy = k * (dy + Hcy) - Hfy
            src = jax.lax.slice(up, (sx, sy), (sx + BX, sy + BY))
            term = p_ref[0, 0, kk].astype(L.dtype) * src
            corr = term if corr is None else corr + term
    L = L + corr

    col = _color_of(i, j, TX, TY, Hfx, Hfy, BX, BY, color_grid)
    L = _sweep_c(L, B, D, A, col, steps, omega, offsA, BX, BY, cdt)
    xo_ref[:] = L[Hfx : Hfx + TX, Hfy : Hfy + TY].astype(xo_ref.dtype)


def fused_up(cache: FusedLegCache, x, b, xc, out_len=None):
    """x = postsmooth(x + P·x_c, b) — one pallas_call; returns the flat x.

    DMA caches accept ``x`` as the flat vector or the chained padded plane
    from :func:`fused_down`/:func:`fused_updown` (whose margins are
    unwritten — the kernel domain-masks the loaded windows), and ``b`` as
    the flat rhs or the padded plane (loop-invariant)."""
    Wx, Wy = cache.row_dims
    TX, TY = cache.tile
    Hfx, Hpy = cache.Hf
    Hfy = _hly(cache)
    gx, gy = cache.grid
    dtype = jnp.dtype(cache.wdtype)
    n = Wx * Wy
    maskx = False
    if cache.dma:
        maskx = x.ndim == 2
        Xt = x if maskx else _pad_plane(x, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hpy, dtype)
        Bt = (
            b
            if b.ndim == 2
            else _pad_plane(b, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hpy, dtype)
        )
    else:
        Xt = _xla_tile(x, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hfy, dtype)
        Bt = _xla_tile(b, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hfy, dtype)
    out_dtype = dtype if maskx else x.dtype
    if out_len is None:
        out_len = n if x.ndim == 2 else x.shape[0]
    return _fused_up_tiled(cache, Xt, Bt, xc, out_dtype, out_len, maskx=maskx)


def fused_up_t(cache: FusedLegCache, Xt, Bt, xc, out_dtype, out_len):
    """Tiled-handoff variant: consume fused_down(..., tiled=True)'s halo
    blocks and reused rhs tiles directly."""
    return _fused_up_tiled(cache, Xt, Bt, xc, out_dtype, out_len)


def _fused_up_tiled(cache: FusedLegCache, Xt, Bt, xc, out_dtype, out_len, maskx=False):
    Wx, Wy = cache.row_dims
    Wxc, Wyc = cache.col_dims
    TX, TY = cache.tile
    Hfx, Hpy = cache.Hf
    Hfy = _hly(cache)
    Hcx, Hcy = cache.Hc
    k = cache.k
    gx, gy = cache.grid
    BX, BY = TX + 2 * Hfx, TY + 2 * Hfy
    TXc, TYc = TX // k, TY // k
    dtype = jnp.dtype(cache.wdtype)
    n = Wx * Wy
    nc = Wxc * Wyc

    if cache.xcup == "full":
        XCt = _upsample_plane(cache, xc, dtype)
    elif cache.xcup == "y":
        XCt = _upsample_plane_y(cache, xc, dtype)
    elif cache.dma:
        XCt = _pad_plane(xc, nc, Wxc, Wyc, gx, gy, TXc, TYc, Hcx, Hcy, dtype)
    else:
        XCt = _xla_tile(xc, nc, Wxc, Wyc, gx, gy, TXc, TYc, Hcx, Hcy, dtype)

    kern = functools.partial(
        _up_kernel,
        maskx=maskx,
        Wxy=(Wx, Wy),
        offsA=cache.offsA,
        offsP=cache.offsP,
        color_grid=cache.color_grid,
        steps=_steps_list(
            cache.n_colors, cache.iter, cache.forward, cache.backward, cache.omega
        ),
        omega=cache.omega,
        k=k,
        Hfx=Hfx,
        Hfy=Hfy,
        Hcx=Hcx,
        Hcy=Hcy,
        TX=TX,
        TY=TY,
        factored=cache.factored,
        expand=cache.expand_in_kernel,
        emeta=_emeta(cache),
        cdt=cache.sweep_dtype,
        dma=cache.dma,
        gxs=gx,
        gys=gy,
        packed=cache.packed,
        xcup=cache.xcup,
        Hpy=Hpy,
    )
    tile_spec = _any_spec() if cache.dma else _cspec((1, 1, BX, BY))
    a_blk = (1, 1, len(cache.offsA), BX, BY)
    c_spec = _any_spec() if cache.dma else _cspec((1, 1, TXc + 2 * Hcx, TYc + 2 * Hcy))
    if cache.expand_in_kernel:
        extra_specs = [_tab_spec(cache.tabA), _tab_spec(cache.tabT), _tab_spec(cache.tabS)]
        extra_ops = [cache.tabA, cache.tabT, cache.tabS]
    elif cache.factored:
        extra_specs = [
            _cspec((1, 1, BX, BY), cache.cA),
            _cspec(a_blk, cache.cA),
            _cspec((1, 1, BX, BY), cache.cT),
            _cspec((1, 1, BX, BY), cache.cS),
        ]
        extra_ops = [cache.dinv_tiled, cache.A_tiled, cache.T_tiled, cache.S_tiled]
    else:
        extra_specs = [
            _cspec((1, 1, BX, BY), cache.cA),
            _cspec(a_blk, cache.cA),
            _cspec((1, 1, len(cache.offsP), BX, BY), cache.cP),
        ]
        extra_ops = [cache.dinv_tiled, cache.A_tiled, cache.P_tiled]
    xo = pl.pallas_call(
        kern,
        grid=(gy, gx),
        in_specs=[tile_spec, tile_spec] + extra_specs + [c_spec],
        out_specs=_cspec((TX, TY)),
        out_shape=jax.ShapeDtypeStruct((Wx, Wy), dtype),
        scratch_shapes=(
            [
                pltpu.VMEM((2, BX, BY), dtype),
                pltpu.VMEM((2, BX, BY), dtype),
                pltpu.VMEM(
                    (2, BX, BY)
                    if cache.xcup == "full"
                    else (2, TXc + 2 * Hcx, BY)
                    if cache.xcup == "y"
                    else (2, TXc + 2 * Hcx, TYc + 2 * Hcy),
                    dtype,
                ),
                _dma_sems(3),
            ]
            if cache.dma
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("arbitrary", "arbitrary") if cache.dma else ("parallel", "parallel")
            ),
            vmem_limit_bytes=104 * 2**20,  # v5e VMEM 128M, compiler cap ~107M;
            # TX=384 puts the L1 up kernel at 100.33M scoped stack (measured)
        ),
        interpret=cache.interpret,
    )(Xt, Bt, *extra_ops, XCt)

    xo = xo.reshape(n).astype(out_dtype)
    pad = out_len - n
    if pad > 0:
        xo = jnp.pad(xo, (0, pad))
    return xo


def _corr_src(XC, xcup, k, Hcx, Hcy, Hfx, Hfy, BX, BY):
    """(BX, BY) piecewise-constant upsample of the coarse window ``XC`` at
    the fine window's geometry — the prolongation source plane.

    xcup "full": XC is already fine-geometry.  "y": XC is lane-upsampled by
    the wrapper (rows coarse, lanes fine) — only the cheap sublane repeat
    happens here.  "": both repeats in-kernel; the lane repeat needs the
    transpose trick (Mosaic lane-axis ``jnp.repeat`` crashes), two full-block
    VMEM transposes."""
    if xcup == "full":
        return XC
    upx = jnp.repeat(XC, k, axis=0)
    sx = k * Hcx - Hfx
    if xcup == "y":
        return jax.lax.slice(upx, (sx, 0), (sx + BX, BY))
    up = jnp.repeat(upx.T, k, axis=0).T
    sy = k * Hcy - Hfy
    return jax.lax.slice(up, (sx, sy), (sx + BX, sy + BY))


def _upsample_plane_y(cache, xc, dtype):
    """x_c lane-repeated to fine y geometry (rows stay coarse) for the
    xcup="y" kernels: one XLA minor-dim repeat instead of the in-kernel
    lane-repeat's two VMEM transposes.  Beyond-domain lanes are zero here
    (vs copied coarse values in-kernel) — annihilated by the zero-padded
    T plane, so consumers are value-identical."""
    Wx, Wy = cache.row_dims
    Wxc, Wyc = cache.col_dims
    TX, TY = cache.tile
    Hfx, Hfy = cache.Hf
    Hcx, _ = cache.Hc
    gx, gy = cache.grid
    k = cache.k
    TXc = TX // k
    XC2 = xc[: Wxc * Wyc].reshape(Wxc, Wyc).astype(dtype)
    zy = jnp.repeat(XC2, k, axis=1)[:, :Wy]
    return jnp.pad(zy, ((Hcx, Hcx + gx * TXc - Wxc), (Hfy, Hfy + gy * TY - Wy)))


def _upsample_plane(cache, xc, dtype):
    """x_c → fine-lattice plane for the xcup kernels: one XLA k×k repeat of
    the coarse grid, cropped to the fine domain and zero-margin padded at
    the fine window geometry."""
    Wx, Wy = cache.row_dims
    Wxc, Wyc = cache.col_dims
    TX, TY = cache.tile
    Hfx, Hfy = cache.Hf
    gx, gy = cache.grid
    k = cache.k
    XC2 = xc[: Wxc * Wyc].reshape(Wxc, Wyc).astype(dtype)
    zc = jnp.repeat(jnp.repeat(XC2, k, axis=0), k, axis=1)[:Wx, :Wy]
    return jnp.pad(zc, ((Hfx, Hfx + gx * TX - Wx), (Hfy, Hfy + gy * TY - Wy)))


def _pad_plane(v, n, Wx, Wy, gx, gy, TX, TY, Hx, Hy, dtype):
    """flat padded vector → (2Hx + gx·TX, 2Hy + gy·TY) zero-margin plane —
    the ANY-space input of the DMA-windowed kernels.  One XLA pad (memset +
    copy), ~n elements of traffic vs the ~1.2–1.4n halo-duplicated tile
    stack of :func:`_xla_tile`."""
    g = v[:n].reshape(Wx, Wy).astype(dtype)
    return jnp.pad(g, ((Hx, Hx + gx * TX - Wx), (Hy, Hy + gy * TY - Wy)))


def _dma_window(hbm, buf, sems, kop, t, num, gx, TX, TY, once=False, oy=0):
    """Double-buffered halo-window fetch: at grid step ``t`` return the
    (BX, BY) window starting at (i·TX, j·TY) of the padded plane ``hbm``,
    having prefetched step ``t+1``'s window during step ``t``'s compute.
    Requires sequential grid order (dimension_semantics 'arbitrary').

    When the semaphore array carries a third axis of size P > 1
    (AMG_DMA_SPLIT), the window is fetched as P concurrent row-range copies
    — spreading one logical fetch across DMA engines.

    ``oy`` is the source lane offset — (plane margin − load halo) when the
    plane's margin is wider than the halo the kernel computes with.

    ``once=True`` is a timing probe (AMG_DBG_UPDOWN=nodma): fetch only grid
    step 0's window and reuse it for every step — isolates compute time from
    input-DMA time (results are wrong; scratch use only)."""
    BX, BY = buf.shape[1], buf.shape[2]
    P = sems.shape[2] if len(sems.shape) > 2 else 1

    def cps(tt, slot):
        ii = tt % gx
        jj = tt // gx
        if P == 1:
            return [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(ii * TX, BX), pl.ds(jj * TY + oy, BY)],
                    buf.at[slot],
                    sems.at[kop, slot],
                )
            ]
        step = -(-(-(-BX // P)) // 8) * 8  # ceil(BX/P) ceiled to 8 (sublane tiling)
        out = []
        for p_ in range(P):
            r0 = p_ * step
            r1 = min(BX, r0 + step)
            if r0 >= r1:
                break
            out.append(
                pltpu.make_async_copy(
                    hbm.at[pl.ds(ii * TX + r0, r1 - r0), pl.ds(jj * TY + oy, BY)],
                    buf.at[slot, pl.ds(r0, r1 - r0)],
                    sems.at[kop, slot, p_],
                )
            )
        return out

    if once:
        @pl.when(t == 0)
        def _():
            for c in cps(0, 0):
                c.start()
            for c in cps(0, 0):
                c.wait()

        return buf[0]

    slot = t % 2

    @pl.when(t == 0)
    def _():
        for c in cps(t, slot):
            c.start()

    @pl.when(t + 1 < num)
    def _():
        for c in cps(t + 1, 1 - slot):
            c.start()

    for c in cps(t, slot):
        c.wait()
    return buf[slot]


def _dma_split():
    return max(1, int(os.environ.get("AMG_DMA_SPLIT", "1")))


def _dma_sems(nops):
    P = _dma_split()
    shape = (nops, 2) if P == 1 else (nops, 2, P)
    return pltpu.SemaphoreType.DMA(shape)


def _plane_store(o_hbm, obuf, osem, t, num, gx, TX, TY, Hfx, Hfy, val):
    """Manual double-buffered output DMA: write ``val`` (TX, TY) into the
    padded output plane at (Hfx + i·TX, Hfy + j·TY).  A slot is waited on
    before reuse; both in-flight copies are drained on the last grid step.
    Plane margins (and the beyond-domain overhang of edge blocks) are left
    unwritten — consumers domain-mask their loaded windows."""
    slot = t % 2

    def cp(tt, sl):
        ii = tt % gx
        jj = tt // gx
        return pltpu.make_async_copy(
            obuf.at[sl],
            o_hbm.at[pl.ds(Hfx + ii * TX, TX), pl.ds(Hfy + jj * TY, TY)],
            osem.at[sl],
        )

    @pl.when(t >= 2)
    def _():
        cp(t - 2, slot).wait()

    obuf[slot] = val
    cp(t, slot).start()

    @pl.when(t == num - 1)
    def _():
        cp(t, slot).wait()

    @pl.when((t == num - 1) & (t >= 1))
    def _():
        cp(t - 1, 1 - slot).wait()


def _domain_mask(L, i, j, TX, TY, Hfx, Hfy, Wx, Wy):
    """Make a chained window's out-of-domain values harmless: NaN→0 and
    ±Inf→clamped (4 vreg-ops).  Chained output planes' margins (and the
    beyond-domain overhang of edge tiles) are never written, so they may
    hold ANY bit pattern — but every out-of-domain read is multiplied by an
    exactly-zero boundary-class coefficient (the lattice-extraction
    invariant: coefficients vanish beyond the domain), and 0·finite = 0,
    so all in-domain outputs stay bitwise identical to the zero-margin
    (:func:`_pad_plane`) case.  Only NaN/Inf garbage breaks that
    (0·NaN = NaN, which then spreads through the stencil sums) and must be
    scrubbed.  In-domain values pass through bitwise (any finite f32 is
    below the clamp).  Replaces the previous iota box mask (~11 vreg-ops —
    measured ~8% of the updown kernel's compute at 4096²)."""
    del i, j, TX, TY, Hfx, Hfy, Wx, Wy  # geometry no longer needed
    z = jnp.where(L != L, jnp.zeros_like(L), L)
    # Clamp to a bound finite in the NARROWEST compute dtype the sweep may
    # cast to (bf16 under AMG_SWEEP_DTYPE=bfloat16): clamping garbage to
    # f32 finfo.max would round to bf16 ±Inf and re-introduce 0·Inf = NaN.
    big = jnp.asarray(
        min(float(jnp.finfo(L.dtype).max), float(jnp.finfo(jnp.bfloat16).max)),
        L.dtype,
    )
    return jnp.clip(z, -big, big)


def _any_spec():
    return pl.BlockSpec(memory_space=pl.ANY)


def _xla_tile(v, n, Wx, Wy, gx, gy, TX, TY, Hx, Hy, dtype):
    """flat padded vector → [gx, gy, TX+2Hx, TY+2Hy] halo tiles (static
    slice stacks — fused by XLA, no per-tile dispatch)."""
    BX, BY = TX + 2 * Hx, TY + 2 * Hy
    g = v[:n].reshape(Wx, Wy).astype(dtype)
    g = jnp.pad(g, ((Hx, Hx + gx * TX - Wx), (Hy, Hy + gy * TY - Wy)))
    slabs = jnp.stack(
        [jax.lax.slice_in_dim(g, i * TX, i * TX + BX, axis=0) for i in range(gx)]
    )
    return jnp.stack(
        [jax.lax.slice_in_dim(slabs, j * TY, j * TY + BY, axis=2) for j in range(gy)],
        axis=1,
    )


# --------------------------------------------------------------------------
# updown: cross-cycle fusion — prolong-correct + postsmooth of cycle i, then
# presmooth + residual + restrict of cycle i+1, in ONE pallas_call.  Between
# postsmooth(i) and presmooth(i+1) nothing touches x, so the fused sequence
# is mathematically identical to up(i); down(i+1); it halves this level's
# kernel launches per cycle and reads the coefficient planes once instead of
# twice.  Fixed-cycle-count drivers (bench loops) use it; convergence-checked
# solve loops keep the down/up pair (their residual is defined after the
# cycle, not after the next presmooth).  Factored caches only.
# --------------------------------------------------------------------------


def _updown_kernel(
    x_ref, b_ref, *rest,
    offsA, color_grid, steps, omega, k, Hfx, Hfy, Hcx, Hcy, TX, TY,
    expand=False, emeta=None, cdt="", dma=False, gxs=0, gys=0, packed="",
    xcup=False, dbg="", plane_out=False, maskx=False, Wxy=(0, 0), Hpy=0,
):
    Hpy = Hpy or Hfy
    oy = Hpy - Hfy
    BX, BY = TX + 2 * Hfx, TY + 2 * Hfy
    TXc, TYc = TX // k, TY // k
    i = pl.program_id(1)
    j = pl.program_id(0)

    wdt = x_ref.dtype
    obuf = osem = None
    once = "nodma" in dbg  # timing probe: fetch inputs once, reuse per step
    if dma:
        if plane_out:
            rest, obuf, osem = rest[:-2], rest[-2], rest[-1]
        rest, xbuf, bbuf, cbuf, sems = rest[:-4], rest[-4], rest[-3], rest[-2], rest[-1]
        t = j * gxs + i
        num = gxs * gys
        L = _dma_window(x_ref, xbuf, sems, 0, t, num, gxs, TX, TY, once=once, oy=oy)
        B = _dma_window(b_ref, bbuf, sems, 1, t, num, gxs, TX, TY, once=once, oy=oy)
        if maskx:
            L = _domain_mask(L, i, j, TX, TY, Hfx, Hfy, Wxy[0], Wxy[1])
    else:
        L = x_ref[0, 0]
        B = b_ref[0, 0]

    def emit_x(Lfull):
        if "noout" in dbg:  # timing probe: skip the output plane store
            return
        if plane_out:
            _plane_store(
                xo_ref, obuf, osem, j * gxs + i, gxs * gys, gxs, TX, TY,
                Hfx, Hpy, Lfull[Hfx : Hfx + TX, Hfy : Hfy + TY].astype(wdt),
            )
        else:
            xo_ref[:] = Lfull[Hfx : Hfx + TX, Hfy : Hfy + TY].astype(xo_ref.dtype)

    if expand:
        tA_ref, tT_ref, tS_ref, xc_ref, xo_ref, bc_ref = rest
        A, D, T, S = _expand_ADTS(tA_ref, tT_ref, tS_ref, emeta, i, j, L.dtype)
    else:
        d_ref, a_ref, t_ref, s_ref, xc_ref, xo_ref, bc_ref = rest
        D = d_ref[0, 0].astype(L.dtype)
        A = a_ref[0, 0].astype(L.dtype)
        T = t_ref[0, 0].astype(L.dtype)
        S = s_ref[0, 0].astype(L.dtype)
    if dma:
        if xcup == "full":
            XC = _dma_window(
                xc_ref, cbuf, sems, 2, j * gxs + i, gxs * gys, gxs, TX, TY,
                once=once, oy=oy,
            )
        elif xcup == "y":
            XC = _dma_window(
                xc_ref, cbuf, sems, 2, j * gxs + i, gxs * gys, gxs, TXc, TY,
                once=once, oy=oy,
            )
        else:
            XC = _dma_window(
                xc_ref, cbuf, sems, 2, j * gxs + i, gxs * gys, gxs, TXc, TYc,
                once=once,
            )
    else:
        XC = xc_ref[0, 0]

    if "pass" in dbg:  # anatomy probe: operand streaming only
        emit_x(L)
        bc_ref[:] = jnp.zeros((TXc, TYc), bc_ref.dtype)
        return

    # prolong-correct (factored): corr = Tup − s⊙(A·Tup)
    src = _corr_src(XC, xcup, k, Hcx, Hcy, Hfx, Hfy, BX, BY)

    if packed:
        BX2 = BX // 2
        Lr, Lk = _pk_pack(packed, L, BX, BY)
        Br, Bk = _pk_pack(packed, B, BX, BY)
        sr, sk = _pk_pack(packed, src, BX, BY)
        Dr, Dk = D[:BX2], D[BX2:]
        Ar = [A[kk, :BX2] for kk in range(len(offsA))]
        Ak = [A[kk, BX2:] for kk in range(len(offsA))]
        Tup_r, Tup_k = T[:BX2] * sr, T[BX2:] * sk
        ar, ak = _pk_apply(packed, Tup_r, Tup_k, Ar, Ak, offsA, BX2, BY)
        Lr = Lr + (Tup_r - S[:BX2] * ar)
        Lk = Lk + (Tup_k - S[BX2:] * ak)
        Lr, Lk = _pk_sweep(
            packed, Lr, Lk, Br, Bk, Dr, Dk, Ar, Ak,
            steps, color_grid, omega, offsA, BX2, BY,
        )
        Lf = _pk_unpack(packed, Lr, Lk, BX, BY)
        emit_x(Lf)
        yr, yk = _pk_apply(packed, Lr, Lk, Ar, Ak, offsA, BX2, BY)
        rr, rk = Br - yr, Bk - yk
        gr, gk = S[:BX2] * rr, S[BX2:] * rk
        ar2, ak2 = _pk_apply(packed, gr, gk, Ar, Ak, offsA, BX2, BY)
        tsr = T[:BX2] * (rr - ar2)
        tsk = T[BX2:] * (rk - ak2)
        ts = _pk_unpack(packed, tsr, tsk, BX, BY)
        bc_ref[:] = _box_downsample(ts, Hfx, Hfy, k, TXc, TYc).astype(bc_ref.dtype)
        return

    if "nocorr" not in dbg:  # dbg knobs: kernel-anatomy probes (scratch only)
        Tup = T * src
        corr = Tup - S * _stencil_apply(A, Tup, offsA, BX, BY)
        L = L + corr

    # postsmooth(i) then presmooth(i+1): same config (pre == post enforced);
    # ``steps`` is the concatenated double sweep with the boundary duplicate
    # collapsed at ω == 1 (see _steps2_list)
    col = _color_of(i, j, TX, TY, Hfx, Hfy, BX, BY, color_grid)
    L = _sweep_c(L, B, D, A, col, steps, omega, offsA, BX, BY, cdt)
    emit_x(L)

    if "nores" in dbg:
        bc_ref[:] = _box_downsample(B, Hfx, Hfy, k, TXc, TYc).astype(bc_ref.dtype)
        return
    r = B - _stencil_apply(A, L, offsA, BX, BY)
    if "norestrict" in dbg:
        bc_ref[:] = _box_downsample(r, Hfx, Hfy, k, TXc, TYc).astype(bc_ref.dtype)
        return

    # factored restriction: b_c = box-k downsample of T⊙(r − A(s⊙r))
    g = S * r
    ts = T * (r - _stencil_apply(A, g, offsA, BX, BY))
    bc_ref[:] = _box_downsample(ts, Hfx, Hfy, k, TXc, TYc).astype(bc_ref.dtype)


def fused_updown(cache: FusedLegCache, x, b_or_bt, xc, plane_out=False):
    """(x', b_c') = down(up(x, x_c)) across the cycle boundary — one call.

    ``b_or_bt`` may be the flat rhs or the pre-tiled rhs from a previous
    ``fused_down(..., tiled=True)`` (it is loop-invariant).  Returns the flat
    corrected+resmoothed x and the NEXT cycle's coarse rhs."""
    if not cache.factored:
        raise ValueError("fused_updown requires a factored cache")
    Wx, Wy = cache.row_dims
    Wxc, Wyc = cache.col_dims
    TX, TY = cache.tile
    Hfx, Hpy = cache.Hf
    Hfy = _hly(cache)
    Hcx, Hcy = cache.Hc
    k = cache.k
    gx, gy = cache.grid
    BX, BY = TX + 2 * Hfx, TY + 2 * Hfy
    TXc, TYc = TX // k, TY // k
    dtype = jnp.dtype(cache.wdtype)
    n = Wx * Wy
    nc = Wxc * Wyc

    maskx = False
    plane_out = bool(plane_out and cache.dma)
    if cache.dma:
        maskx = x.ndim == 2
        Xt = x if maskx else _pad_plane(x, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hpy, dtype)
        Bt = (
            b_or_bt
            if b_or_bt.ndim == 2
            else _pad_plane(b_or_bt, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hpy, dtype)
        )
        if cache.xcup == "full":
            XCt = _upsample_plane(cache, xc, dtype)
        elif cache.xcup == "y":
            XCt = _upsample_plane_y(cache, xc, dtype)
        else:
            XCt = _pad_plane(xc, nc, Wxc, Wyc, gx, gy, TXc, TYc, Hcx, Hcy, dtype)
    else:
        Xt = _xla_tile(x, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hfy, dtype)
        Bt = (
            b_or_bt
            if b_or_bt.ndim == 4
            else _xla_tile(b_or_bt, n, Wx, Wy, gx, gy, TX, TY, Hfx, Hfy, dtype)
        )
        XCt = _xla_tile(xc, nc, Wxc, Wyc, gx, gy, TXc, TYc, Hcx, Hcy, dtype)

    kern = functools.partial(
        _updown_kernel,
        dbg=os.environ.get("AMG_DBG_UPDOWN", ""),
        offsA=cache.offsA,
        color_grid=cache.color_grid,
        steps=_steps2_list(
            cache.n_colors, cache.iter, cache.forward, cache.backward, cache.omega
        ),
        omega=cache.omega,
        k=k,
        Hfx=Hfx,
        Hfy=Hfy,
        Hcx=Hcx,
        Hcy=Hcy,
        TX=TX,
        TY=TY,
        expand=cache.expand_in_kernel,
        emeta=_emeta(cache),
        cdt=cache.sweep_dtype,
        dma=cache.dma,
        gxs=gx,
        gys=gy,
        packed=cache.packed,
        xcup=cache.xcup,
        plane_out=plane_out,
        maskx=maskx,
        Wxy=(Wx, Wy),
        Hpy=Hpy,
    )
    tile_spec = _any_spec() if cache.dma else _cspec((1, 1, BX, BY))
    a_blk = (1, 1, len(cache.offsA), BX, BY)
    c_spec = _any_spec() if cache.dma else _cspec((1, 1, TXc + 2 * Hcx, TYc + 2 * Hcy))
    if cache.expand_in_kernel:
        extra_specs = [_tab_spec(cache.tabA), _tab_spec(cache.tabT), _tab_spec(cache.tabS)]
        extra_ops = [cache.tabA, cache.tabT, cache.tabS]
    else:
        extra_specs = [
            _cspec((1, 1, BX, BY), cache.cA),
            _cspec(a_blk, cache.cA),
            _cspec((1, 1, BX, BY), cache.cT),
            _cspec((1, 1, BX, BY), cache.cS),
        ]
        extra_ops = [cache.dinv_tiled, cache.A_tiled, cache.T_tiled, cache.S_tiled]
    if plane_out:
        xo_spec = _any_spec()
        xo_shape = jax.ShapeDtypeStruct(
            (2 * Hfx + gx * TX, 2 * Hpy + gy * TY), dtype
        )
    else:
        xo_spec = _cspec((TX, TY))
        xo_shape = jax.ShapeDtypeStruct((Wx, Wy), dtype)
    xo, bc = pl.pallas_call(
        kern,
        grid=(gy, gx),
        in_specs=[tile_spec, tile_spec] + extra_specs + [c_spec],
        out_specs=(
            xo_spec,
            _cspec((TXc, TYc)),
        ),
        out_shape=(
            xo_shape,
            jax.ShapeDtypeStruct((Wxc, Wyc), dtype),
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((2, BX, BY), dtype),
                pltpu.VMEM((2, BX, BY), dtype),
                pltpu.VMEM(
                    (2, BX, BY)
                    if cache.xcup == "full"
                    else (2, TXc + 2 * Hcx, BY)
                    if cache.xcup == "y"
                    else (2, TXc + 2 * Hcx, TYc + 2 * Hcy),
                    dtype,
                ),
                _dma_sems(3),
            ]
            + (
                [pltpu.VMEM((2, TX, TY), dtype), pltpu.SemaphoreType.DMA((2,))]
                if plane_out
                else []
            )
            if cache.dma
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("arbitrary", "arbitrary") if cache.dma else ("parallel", "parallel")
            ),
            vmem_limit_bytes=104 * 2**20,  # v5e VMEM 128M, compiler cap ~107M;
            # TX=384 puts the L1 up kernel at 100.33M scoped stack (measured)
        ),
        interpret=cache.interpret,
    )(Xt, Bt, *extra_ops, XCt)

    out_dtype = dtype if maskx else x.dtype
    bc = bc.reshape(Wxc * Wyc).astype(out_dtype)
    if plane_out:
        return xo, bc
    xo = xo.reshape(n).astype(out_dtype)
    pad = x.shape[0] - n if x.ndim == 1 else 0
    if pad > 0:
        xo = jnp.pad(xo, (0, pad))
    return xo, bc
