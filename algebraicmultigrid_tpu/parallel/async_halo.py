"""Compute-overlapped halo exchange via Pallas inter-chip RDMA.

The ppermute halo (parallel/halo.py) is a separate collective op: XLA runs
the exchange, THEN the stencil.  This module fuses both into one Pallas
kernel per shard using ``pltpu.make_async_remote_copy`` (SURVEY §2.13,
§5.8; SNIPPETS §1 ring pattern):

1. neighbour barrier (everyone's receive buffers are live),
2. START the edge-row RDMAs to both slab neighbours,
3. compute the INTERIOR rows — which need no halo — while the copies fly,
4. wait for the receives, then compute the ``reach`` boundary rows.

The halo transfer costs ``2·reach·Wy`` elements per shard (O(surface)) and
its latency hides behind the interior compute for any slab taller than
~2·reach.  Opt-in next to the ppermute path (``AMG_ASYNC_HALO=1`` routes
``halo.lat2d_spmv_halo`` here); validated against the ppermute op on the
virtual CPU mesh (the Mosaic interpreter emulates the remote copies) in
``tests/test_async_halo.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.lattice_op import Lat2D

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

__all__ = ["lat2d_spmv_halo_async"]


def _stencil_rows(data, Xp, offsets, reach, my, r0, nrows, Wy):
    """y rows [r0, r0+nrows) of the stencil on the halo-padded slab ``Xp``
    ([loc+2·reach, Wy+2·my]); ``data`` is the full [n_off, loc, Wy] slab."""
    acc = None
    for k, (dx, dy) in enumerate(offsets):
        src = jax.lax.slice(
            Xp,
            (r0 + reach + dx, my + dy),
            (r0 + reach + dx + nrows, my + dy + Wy),
        )
        term = jax.lax.slice(data[k], (r0, 0), (r0 + nrows, Wy)) * src
        acc = term if acc is None else acc + term
    return acc


def lat2d_spmv_halo_async(
    A: Lat2D, x, mesh: Mesh, axis: str = "shards", interpret: Optional[bool] = None
):
    """y = A·x with the RDMA-overlapped halo (same contract as
    :func:`~.halo.lat2d_spmv_halo`)."""
    Wx, Wy = A.row_dims
    assert A.base_x == (1, 1) and A.base_y == (1, 1), "square stencils only"
    n_sh = mesh.shape[axis]
    assert Wx % n_sh == 0, "x-slabs must divide the grid"
    reach = max((abs(dx) for dx, _ in A.offsets), default=0)
    my = max((abs(dy) for _, dy in A.offsets), default=0)
    loc = Wx // n_sh
    assert loc >= 2 * reach, "slab thinner than the stencil reach"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True:
        # the HLO interpreter cannot emulate semaphores/remote DMA; the
        # Mosaic interpreter can
        interpret = pltpu.InterpretParams()
    offsets = A.offsets

    def kernel(data_ref, x_ref, o_ref, recv_ref, send_sem, recv_sem):
        idx = jax.lax.axis_index(axis)
        has_up = idx > 0          # neighbour at idx-1 (rows above mine)
        has_dn = idx < n_sh - 1   # neighbour at idx+1 (rows below mine)

        # 1. neighbour barrier: don't RDMA into a buffer that isn't live yet
        barrier = pltpu.get_barrier_semaphore()

        @pl.when(has_up)
        def _():
            pltpu.semaphore_signal(barrier, inc=1, device_id=idx - 1,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_signal(barrier, inc=1, device_id=idx + 1,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)

        pltpu.semaphore_wait(barrier, has_up.astype(jnp.int32) + has_dn.astype(jnp.int32))

        # 2. start the edge-row sends: my top rows → (idx-1).recv[1] (their
        # from_below), my bottom rows → (idx+1).recv[0] (their from_above)
        up = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(0, reach), :],
            dst_ref=recv_ref.at[1],
            send_sem=send_sem.at[0],
            recv_sem=recv_sem.at[1],
            device_id=idx - 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        dn = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(loc - reach, reach), :],
            dst_ref=recv_ref.at[0],
            send_sem=send_sem.at[1],
            recv_sem=recv_sem.at[0],
            device_id=idx + 1,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

        @pl.when(has_up)
        def _():
            up.start()

        @pl.when(has_dn)
        def _():
            dn.start()

        # 3. interior rows while the halo flies (they read only local X)
        X = x_ref[...]
        Xp_local = jnp.pad(X, ((reach, reach), (my, my)))
        data = data_ref[...]
        o_ref[pl.ds(reach, loc - 2 * reach), :] = _stencil_rows(
            data, Xp_local, offsets, reach, my, reach, loc - 2 * reach, Wy
        )

        # 4. wait for the receives (chain ends read zeros)
        @pl.when(jnp.logical_not(has_up))
        def _():
            recv_ref[0] = jnp.zeros_like(recv_ref[0])

        @pl.when(jnp.logical_not(has_dn))
        def _():
            recv_ref[1] = jnp.zeros_like(recv_ref[1])

        # every device runs the same kernel, so MY ``dn`` descriptor names
        # the local recv semaphore the ABOVE neighbour's copy signals (and
        # ``up`` names the one the below neighbour's copy signals) — the
        # symmetric-descriptor wait pattern of the ring-collective guide
        @pl.when(has_up)
        def _():
            dn.wait_recv()

        @pl.when(has_dn)
        def _():
            up.wait_recv()

        # 5. boundary rows with the fresh halo
        Xh = jnp.concatenate([recv_ref[0], X, recv_ref[1]], axis=0)
        Xp = jnp.pad(Xh, ((0, 0), (my, my)))
        o_ref[pl.ds(0, reach), :] = _stencil_rows(
            data, Xp, offsets, reach, my, 0, reach, Wy
        )
        o_ref[pl.ds(loc - reach, reach), :] = _stencil_rows(
            data, Xp, offsets, reach, my, loc - reach, reach, Wy
        )

        # drain the send semaphores so the kernel exits cleanly
        @pl.when(has_up)
        def _():
            up.wait_send()

        @pl.when(has_dn)
        def _():
            dn.wait_send()

    def per_shard(data_slab, x_slab):
        X = x_slab.reshape(loc, Wy)
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((loc, Wy), jnp.result_type(data_slab.dtype, X.dtype)),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, reach, Wy), X.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=7
            ),
            interpret=interpret,
        )(data_slab, X)
        return y.reshape(loc * Wy)

    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            f = shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(None, axis, None), P(axis)),
                out_specs=P(axis),
                **kw,
            )
            break
        except TypeError:
            continue
    return f(A.data, x[: Wx * Wy])
