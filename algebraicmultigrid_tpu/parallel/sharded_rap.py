"""Distributed Galerkin triple product for slab-sharded lattice levels.

Setup phase 1 of the distributed-setup roadmap (SURVEY §3.1: "RAP = R·A·P
becomes a distributed SpGEMM", classical.jl:46 / aggregation.jl:145): the
coarse operator of a slab-sharded lattice level is computed ON THE MESH,
without materialising any global operator on one host.

Method — stencil probing, the structured analogue of the two-pass SpGEMM:
the coarse operator has bounded reach ``r_c``, so applying ``R·A·P`` to the
``q² (q = 2r_c+1)`` periodic coarse unit-impulse fields recovers every
entry: probe ``(a, b)`` sets 1 on coarse points ≡ (a, b) mod q, and since
no two probe points' stencils overlap, ``(RAP e)[w]`` IS ``A_c[w, c]`` for
the unique in-reach probe point c.  Each probe application reuses the
sharded cycle's own operators — ``P = (I − diag(s)A)T`` prolongation,
halo-exchange stencil, factored restriction with stride-k box subsampling
(parallel/lattice_cycle.py) — so all communication is the O(surface)
ppermute halo, and each shard only ever holds its own slabs.  Probe fields
are built in-kernel from axis indices (no O(n) host arrays).

This yields the FULL coefficient planes (boundary rows included, not just
interior classes), pinned against the host fastsetup child level in
``tests/test_sharded_rap.py`` on the 8-device virtual mesh.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .lattice_cycle import (
    AXIS,
    SlabHierarchy,
    _exch,
    _hier_specs,
    _prolong_corr,
    _restrict,
    _shard_map,
    _subsample,
)

__all__ = ["rap_planes_sharded"]


def rap_planes_sharded(
    h: SlabHierarchy,
    li: int,
    mesh: Mesh,
    offsets_c: Sequence[Tuple[int, int]],
):
    """Coarse-level coefficient planes of level ``li``'s Galerkin product.

    Returns ``[n_off_c, Wxc_p, Wyc_p]`` (slab-sharded when the level is),
    where ``planes[k][w] = A_c[w, w + offsets_c[k]]`` on the padded coarse
    grid ``pdims(li)/k``.  ``offsets_c`` is the structural reach of the
    coarse stencil (over-listing is safe: absent couplings come back 0).
    """
    lv = h.levels[li]
    k = lv.k
    n_sh = h.n_sh if lv.sharded else 1
    Wxc, Wyc = lv.pdims[0] // k, lv.pdims[1] // k
    offsets_c = [tuple(int(v) for v in d) for d in offsets_c]
    r_c = max(max(abs(a), abs(b)) for a, b in offsets_c) if offsets_c else 0
    q = 2 * r_c + 1
    reach = max(
        max(abs(d) for d, _ in lv.offsets), max(abs(d) for _, d in lv.offsets)
    )
    Hc = -(-reach // k) + 1

    def kern(hh):
        lvv = hh.levels[li]
        if lvv.sharded and n_sh > 1:
            loc_c = Wxc // n_sh
            row0 = jax.lax.axis_index(AXIS) * loc_c
        else:
            loc_c = Wxc
            row0 = 0

        # global coarse row/col indices of this shard's extended slab
        gx_ext = jnp.arange(loc_c + 2 * Hc)[:, None] + (row0 - Hc)
        gy = jnp.arange(Wyc)[None, :]

        probes = []
        for a in range(q):
            for b in range(q):
                e_ext = (
                    ((gx_ext % q) == a) & ((gy % q) == b)
                ).astype(lvv.A.dtype)
                # guard: probe points must be real coarse rows
                e_ext = jnp.where(
                    (gx_ext >= 0) & (gx_ext < Wxc), e_ext, 0.0
                )
                # P e  — prolongation through the factored form
                pe = _prolong_corr(lvv, e_ext, n_sh)
                # R (A (P e)) — set b=0, x=−Pe so the factored restriction's
                # residual b − A·x equals A·(P e)
                ts = _restrict(lvv, -pe, jnp.zeros_like(pe), n_sh)
                bc = _subsample(ts, k)
                probes.append(bc)
        BC = jnp.stack(probes)  # [q*q, loc_c, Wyc]

        gx = jnp.arange(loc_c)[:, None] + row0
        planes = []
        for du, dv in offsets_c:
            pa = (gx + du) % q
            pb = (gy + dv) % q
            sel = (pa * q + pb)[None, :, :] == jnp.arange(q * q)[:, None, None]
            planes.append(jnp.sum(jnp.where(sel, BC, 0.0), axis=0))
        return jnp.stack(planes)  # [n_off_c, loc_c, Wyc]

    if not lv.sharded or h.n_sh == 1:
        return jax.jit(kern)(h)
    f = _shard_map(kern, mesh, (_hier_specs(h),), P(None, AXIS, None))
    return f(h)
