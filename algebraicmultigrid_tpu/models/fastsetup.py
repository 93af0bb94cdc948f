"""Structured (proxy-extrapolated) Ruge-Stüben setup driver.

``structured_ruge_stuben(problem, **kwargs)`` builds the same hierarchy the
generic ``ruge_stuben(A, CF=StructuredRS(), **kwargs)`` would produce on a
lattice problem, at O(boundary) cost instead of O(nnz):

1. run the *generic* setup on a small proxy grid (same stencil, same kwargs
   — so strength thresholds, smoother configs etc. all take effect),
2. extract per level the (offset × boundary-class) coefficient tables of
   A/P/R with an exact round-trip check (models/lattice.py),
3. re-instantiate the tables at full size as :class:`LatticeMatrix` levels
   (block fills; the device engine lowers them to gather-free Lat2D ops),
4. below the cut (small levels / odd dims / extraction failure) assemble the
   coarse operator to scipy and continue with the untouched generic setup.

See models/lattice.py's module docstring for why the extracted coefficients
match the full-size generic ones exactly (translation invariance of every
setup kernel away from the boundary).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

from ..config import GaussSeidel
from ..utils.symmetry import HermitianSymmetry
from .lattice import LatticeMatrix, LatticeProblem, extract_spec
from .multilevel import Level, MultiLevel
from .structured import StructuredRS

__all__ = ["structured_ruge_stuben"]


def _proxy_dims(full: Tuple[int, int], target: int = 128) -> Tuple[int, int]:
    """Proxy grid dims: capped per axis, parity-matched to the full dims."""
    out = []
    for W in full:
        if W <= target:
            out.append(W)
        else:
            p = target + (W % 2 != target % 2)  # match parity
            out.append(p)
    return tuple(out)


def _coarse_dim_candidates(dims: Tuple[int, int], n_c: int):
    Wx, Wy = dims
    cands = []
    for cx, cy in [
        (Wx, Wy // 2),
        (Wx // 2, Wy),
        (Wx // 2, Wy // 2),
        (Wx, (Wy + 1) // 2),
        ((Wx + 1) // 2, Wy),
    ]:
        if cx >= 1 and cy >= 1 and cx * cy == n_c and (cx, cy) not in cands:
            cands.append((cx, cy))
    return cands


def _full_coarse_dims(
    pdims: Tuple[int, int], pdims_c: Tuple[int, int], fdims: Tuple[int, int]
) -> Optional[Tuple[int, int]]:
    """Apply the proxy's per-axis coarsening ratio to the full dims; None if
    the full dims can't follow it exactly (odd axis)."""
    out = []
    for pw, pc, fw in zip(pdims, pdims_c, fdims):
        if pc == pw:
            out.append(fw)
        elif 2 * pc == pw:
            if fw % 2:
                return None
            out.append(fw // 2)
        elif 2 * pc == pw + 1:  # ceil-halving (odd proxy axis)
            if fw % 2 == 0:
                return None
            out.append((fw + 1) // 2)
        else:
            return None
    return tuple(out)


def structured_ruge_stuben(
    problem: LatticeMatrix,
    *,
    proxy: int = 128,
    cut_rows: int = 40_000,
    min_proxy_dim: int = 16,
    presmoother=None,
    postsmoother=None,
    CF=None,
    max_levels: int = 10,
    max_coarse: int = 10,
    **kwargs,
) -> MultiLevel:
    """Build a classical AMG hierarchy for a lattice problem at O(boundary)
    setup cost.  Falls back to the generic path level-by-level: any level
    whose operators fail exact extraction is assembled and handed to
    ``ruge_stuben`` unchanged."""
    from .classical import ruge_stuben  # deferred: circular import

    if presmoother is None:
        presmoother = GaussSeidel(ordering="multicolor")
    if postsmoother is None:
        postsmoother = GaussSeidel(ordering="multicolor")
    if CF is None:
        CF = StructuredRS()

    fdims = tuple(problem.spec.row_dims)
    n_full = fdims[0] * fdims[1]

    def generic_tail(A_like, remaining_levels):
        A_csr = A_like.tocsr() if isinstance(A_like, LatticeMatrix) else A_like
        return ruge_stuben(
            A_csr,
            CF=CF,
            presmoother=presmoother,
            postsmoother=postsmoother,
            max_levels=remaining_levels,
            max_coarse=max_coarse,
            **kwargs,
        )

    pdims = _proxy_dims(fdims, proxy)
    if (
        n_full <= 4 * cut_rows
        or min(fdims) < 2 * max(pdims)
        or min(pdims) < min_proxy_dim
    ):
        return generic_tail(problem, max_levels)

    # 1. generic setup on the proxy — the semantic source of truth
    A_proxy = problem.spec.with_dims(pdims, pdims).tocsr()
    ml_p = ruge_stuben(
        A_proxy,
        CF=CF,
        presmoother=presmoother,
        postsmoother=postsmoother,
        max_levels=max_levels,
        max_coarse=max_coarse,
        **kwargs,
    )

    # 2.+3. extract & re-instantiate level by level
    fast_levels = []
    spec_A = problem.spec  # full-size spec of the current level's A
    cur_pdims, cur_fdims = pdims, fdims
    lvl = 0
    while True:
        n_rows = cur_fdims[0] * cur_fdims[1]
        remaining = max_levels - len(fast_levels)
        if (
            lvl >= len(ml_p.levels)
            or n_rows <= cut_rows
            or n_rows <= max_coarse
            or remaining <= 1
            or min(cur_pdims) < min_proxy_dim
        ):
            break

        P_p = sp.csr_matrix(ml_p.levels[lvl].P)
        R_p = sp.csr_matrix(ml_p.levels[lvl].R)
        A_p = sp.csr_matrix(ml_p.levels[lvl].A)
        n_c = P_p.shape[1]

        found = None
        for cd in _coarse_dim_candidates(cur_pdims, n_c):
            sP = extract_spec(P_p, cur_pdims, cd)
            if sP is None:
                continue
            sR = extract_spec(R_p, cd, cur_pdims)
            if sR is None:
                continue
            found = (cd, sP, sR)
            break
        if found is None:
            break
        cd, sP, sR = found
        sA = spec_A if lvl == 0 else extract_spec(A_p, cur_pdims, cur_pdims)
        if sA is None:
            break
        # next level's A spec (needed as the cut operator or next iteration)
        if lvl + 1 < len(ml_p.levels):
            A_next_p = sp.csr_matrix(ml_p.levels[lvl + 1].A)
        else:
            A_next_p = sp.csr_matrix(ml_p.final_A)
        sA_next = extract_spec(A_next_p, cd, cd)
        if sA_next is None:
            break
        fd_c = _full_coarse_dims(cur_pdims, cd, cur_fdims)
        if fd_c is None:
            break

        A_f = problem if lvl == 0 else LatticeMatrix(spec_A.with_dims(cur_fdims, cur_fdims))
        P_f = LatticeMatrix(sP.with_dims(cur_fdims, fd_c))
        R_f = LatticeMatrix(sR.with_dims(fd_c, cur_fdims))
        fast_levels.append(
            Level(
                A=A_f,
                P=P_f,
                R=R_f,
                presmoother_config=presmoother,
                postsmoother_config=postsmoother,
                symmetry=HermitianSymmetry(),
            )
        )
        spec_A = sA_next
        cur_pdims, cur_fdims = cd, fd_c
        lvl += 1

    if not fast_levels:
        return generic_tail(problem, max_levels)

    # 4. generic tail below the cut
    A_cut = LatticeMatrix(spec_A.with_dims(cur_fdims, cur_fdims))
    tail = generic_tail(A_cut, max_levels - len(fast_levels))

    ml = MultiLevel(
        levels=fast_levels + tail.levels,
        final_A=tail.final_A,
        coarse_solver=tail.coarse_solver,
        symmetry=HermitianSymmetry(),
        dtype=problem.dtype,
    )
    return ml
