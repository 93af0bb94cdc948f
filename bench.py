"""Benchmark: SpMV+smoother throughput of the jitted V-cycle on one chip.

Target metric (BASELINE.json): "SpMV+smoother GnnZ/s per chip; Poisson
4096^2 V-cycles to 1e-8 and wall-time".  The reference publishes no
wall-clock numbers (BASELINE.md), so ``vs_baseline`` is reported against the
driver-defined target: 80% of the per-chip HBM roofline for gather-based
sparse row work.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Environment knobs:
  AMG_BENCH_N      grid edge (default 4096 → 16.7M unknowns)
  AMG_BENCH_DTYPE  float32 (default) | float64
  AMG_BENCH_CYCLES timed V-cycles (default 20)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import algebraicmultigrid_tpu as amg
    from algebraicmultigrid_tpu.models.device import (
        _one_iteration,
        build_device_hierarchy,
    )

    N = int(os.environ.get("AMG_BENCH_N", 4096))
    dtype = jnp.dtype(os.environ.get("AMG_BENCH_DTYPE", "float32"))
    n_cycles = int(os.environ.get("AMG_BENCH_CYCLES", 20))

    t0 = time.time()
    # Symbolic lattice problem -> proxy-extrapolated structured setup:
    # O(boundary) instead of O(nnz) host work (models/fastsetup.py), with
    # levels bitwise-equal to the generic StructuredRS path.  Every level
    # lowers to a gather-free Lat2D/banded/dense device format.
    A = amg.poisson((N, N), lattice=True)
    n = A.shape[0]
    gs = amg.GaussSeidel(ordering="multicolor")
    ml = amg.ruge_stuben(A, CF=amg.StructuredRS(), presmoother=gs, postsmoother=gs)
    t_setup = time.time() - t0

    h = build_device_hierarchy(ml, dtype=dtype)
    b = np.zeros(h.fine_padded, dtype=dtype)
    b[:n] = (A @ np.ones(n)).astype(dtype)
    b = jnp.asarray(b)

    # work per V-cycle, in "nnz touched" by SpMV-class ops:
    #   per level: pre-smoother (symmetric GS: 2 sweeps × nnz) + residual
    #   SpMV (nnz) + R (nnz R) + P (nnz P) + post-smoother (2 × nnz)
    work = 0
    for level in ml.levels:
        work += 4 * level.A.nnz  # sym-GS pre + post (2 sweeps each)
        work += level.A.nnz + level.R.nnz + level.P.nnz
    # outer residual SpMV on the fine level
    work += ml.levels[0].A.nnz if ml.levels else ml.final_A.nnz

    from algebraicmultigrid_tpu.models.device import fit_len
    from algebraicmultigrid_tpu.ops.banded import mat_vec

    @jax.jit
    def run_cycles(x, b):
        x = jax.lax.fori_loop(
            0, n_cycles, lambda i, xx: _one_iteration(h, amg.V(), xx, b), x
        )
        res = b - fit_len(mat_vec(h.levels[0].A, x), b.shape[0])
        return x, jnp.linalg.norm(res)

    x = jnp.zeros_like(b)
    # warmup / compile
    x, r = run_cycles(x, b)
    r.block_until_ready()
    norm_b = float(jnp.linalg.norm(b))

    x = jnp.zeros_like(b)
    t1 = time.time()
    x, r = run_cycles(x, b)
    r.block_until_ready()
    dt = time.time() - t1
    relres = float(r) / norm_b

    nnz_per_s = work * n_cycles / dt
    gnnz = nnz_per_s / 1e9

    # Per-chip HBM roofline for gather-based sparse row work:
    # bytes/nnz = value (4) + col index (4) + x gather (4) ≈ 12 B at f32.
    hbm_gb_s = float(os.environ.get("AMG_BENCH_HBM_GBS", 819))  # TPU v5e
    bytes_per_nnz = 12 if dtype == jnp.float32 else 20
    roofline_gnnz = hbm_gb_s * 1e9 / bytes_per_nnz / 1e9
    target = 0.8 * roofline_gnnz

    print(
        json.dumps(
            {
                "metric": f"poisson{N}x{N}_vcycle_spmv_smoother_throughput",
                "value": round(gnnz, 3),
                "unit": "Gnnz/s",
                "vs_baseline": round(gnnz / target, 4),
            }
        )
    )
    print(
        json.dumps(
            {
                "aux": {
                    "n": n,
                    "dtype": str(dtype),
                    "cycles_timed": n_cycles,
                    "sec_per_vcycle": round(dt / n_cycles, 4),
                    "relres_after_cycles": relres,
                    "setup_seconds": round(t_setup, 2),
                    "levels": len(ml),
                    "operator_complexity": round(ml.operator_complexity(), 3),
                    "roofline_gnnz_s": round(roofline_gnnz, 1),
                    "devices": [str(d) for d in jax.devices()][:1],
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
