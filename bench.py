"""Benchmark: SpMV+smoother throughput + time-to-1e-8 on one TPU chip.

Target metric (BASELINE.json): "SpMV+smoother Gnnz/s per chip; Poisson
4096^2 V-cycles to 1e-8 and wall-time".  The reference publishes no
wall-clock numbers (BASELINE.md), so ``vs_baseline`` is reported against the
driver-defined target: 80% of the per-chip HBM roofline for gather-based
sparse row work.

Flagship configuration: structured smoothed aggregation (periodic box-3
aggregates, O(boundary) proxy-extrapolated setup, gather-free Lat2D device
operators) — h-independent at operator complexity 1.22 — solved by
mixed-precision iterative refinement (f32 AMG-PCG inner, f64 outer residual)
to 1e-8.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Environment knobs:
  AMG_BENCH_N        grid edge (default 4096 → 16.7M unknowns)
  AMG_BENCH_DTYPE    float32 (default) | float64
  AMG_BENCH_CYCLES   timed V-cycles per call (default 400; tunnel amortization)
  AMG_BENCH_METHOD   sa (default) | rs
  AMG_COEF_DTYPE     bfloat16 (default) | float32 — fused-leg A/P storage
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    # persistent compilation cache: amortises the one-time XLA compile of the
    # fused cycle across bench runs (same shapes → cache hit)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/amg_jax_cache")
    # flagship config stores A/P coefficient planes in bf16 inside the fused
    # Pallas legs (halves their VMEM footprint/traffic; x, b, dinv stay f32).
    # Convergence is unaffected: the cycle is a preconditioner and the f64
    # outer refinement absorbs the perturbation (tests/test_fused_legs.py).
    # Override with AMG_COEF_DTYPE=float32.
    os.environ.setdefault("AMG_COEF_DTYPE", "bfloat16")
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        # persist even small executables: hierarchy lowering dispatches many
        # ~1-4 s builder/smoother-cache compiles that would otherwise re-run
        # every process
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import algebraicmultigrid_tpu as amg
    from algebraicmultigrid_tpu.models.device import (
        build_device_hierarchy,
        fit_len,
        run_fixed_cycles,
        solve_refined,
    )
    from algebraicmultigrid_tpu.ops.banded import mat_vec

    N = int(os.environ.get("AMG_BENCH_N", 4096))
    dtype = jnp.dtype(os.environ.get("AMG_BENCH_DTYPE", "float32"))
    # 400 cycles per timed call: the axon tunnel adds ~28 ms of fixed
    # dispatch+readback latency per executable call (measured: an empty jit
    # round-trips in 28 ms); at 100 cycles that still inflated the per-cycle
    # time by ~0.28 ms (~10% at a ~2.8 ms cycle — discovered when the tail
    # kernel "cost" halved on moving 100 → 200 reps/call).  Amortising over
    # 400 cycles (~1.1 s device time per call, scan unroll=1 keeps the
    # program size flat) measures the device, not the tunnel.
    n_cycles = int(os.environ.get("AMG_BENCH_CYCLES", 400))
    method = os.environ.get("AMG_BENCH_METHOD", "sa")

    t0 = time.time()
    A = amg.poisson((N, N), lattice=True)
    n = A.shape[0]
    if method == "rs":
        gs = amg.GaussSeidel(ordering="multicolor")
        ml = amg.ruge_stuben(
            A, CF=amg.StructuredRS(), presmoother=gs, postsmoother=gs
        )
    else:
        ml = amg.structured_smoothed_aggregation(
            A, aggregate=amg.StructuredAggregation(box=3)
        )
    t_setup = time.time() - t0

    t0 = time.time()
    h = build_device_hierarchy(ml, dtype=dtype)
    ml._device_cache[("hierarchy", jnp.dtype(dtype).name)] = h
    t_lower = time.time() - t0

    # disable the persistent cache for the BIG programs (the 100-cycle loop
    # and the PCG while-loop): executables deserialized from the cache pay a
    # pathological first-execution load on the axon tunnel (~530 s for the
    # 59 MB cycle program vs ~5 s when compiled in-process — measured,
    # PERF.md); a fresh ~85 s compile is strictly faster, and not writing
    # them keeps later processes off the deserialize path too.  The many
    # small builder/smoother-cache executables above still use the cache.
    try:
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass

    b_host = A @ np.ones(n)
    b = np.zeros(h.fine_padded, dtype=dtype)
    b[:n] = b_host.astype(dtype)
    b = jnp.asarray(b)

    # ---- section 1: raw V-cycle throughput (the BASELINE.json metric) ----
    work = 0
    for level in ml.levels:
        work += 4 * level.A.nnz  # sym-GS pre + post (2 sweeps each)
        work += level.A.nnz + level.R.nnz + level.P.nnz
    work += ml.levels[0].A.nnz if ml.levels else ml.final_A.nnz

    @jax.jit
    def run_cycles(h, x, b):
        # h passed as a pytree argument — NOT closed over — so level arrays
        # are runtime operands, not baked-in HLO constants.  The fixed-count
        # loop uses the cross-cycle updown kernel at the top level.
        x = run_fixed_cycles(h, x, b, n_cycles)
        res = b - fit_len(mat_vec(h.levels[0].A, x), b.shape[0])
        return x, jnp.linalg.norm(res)

    x = jnp.zeros_like(b)
    t0 = time.time()
    x, r = run_cycles(h, x, b)
    r_warm = float(r)  # forces device execution through the tunnel
    t_compile = time.time() - t0

    dt = float("inf")
    for _ in range(3):  # best-of-3: tunnel dispatch jitter is significant
        x = jnp.zeros_like(b)
        t0 = time.time()
        x, r = run_cycles(h, x, b)
        relres_cycles = float(r) / float(np.linalg.norm(np.asarray(b)))
        dt = min(dt, time.time() - t0)
    gnnz = work * n_cycles / dt / 1e9

    # ---- section 2: time-to-1e-8 via mixed-precision refinement ----
    # warm-up call compiles the jitted PCG while_loop (maxiter/abstol are
    # traced operands, so one compile covers every later call); the timed
    # run below then measures the actual solve, not XLA.
    if os.environ.get("AMG_BENCH_SKIP_SOLVE") == "1":  # kernel-tuning runs
        t_solve = t_solve_cold = 0.0
        hist = [1.0, 0.0]
    else:
        # b uploaded once outside the timer (the axon tunnel moves ~28 MB/s —
        # a measurement artifact, not TPU time); the refinement loop itself is
        # device-resident (one scalar per round crosses the host boundary) and
        # return_device skips the final download.
        with jax.enable_x64(True):
            b_dev = jnp.asarray(b_host)
            b_dev.block_until_ready()
        t0 = time.time()
        solve_refined(ml, b_dev, tol=1e-8, dtype=str(dtype), log=True, return_device=True)
        t_solve_cold = time.time() - t0
        t0 = time.time()
        xr, hist = solve_refined(ml, b_dev, tol=1e-8, dtype=str(dtype), log=True, return_device=True)
        jax.block_until_ready(xr)
        t_solve = time.time() - t0
    relres = hist[-1] / hist[0]

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
                    "method": method,
                    "dtype": str(dtype),
                    "cycles_timed": n_cycles,
                    "sec_per_vcycle": round(dt / n_cycles, 5),
                    "relres_after_cycles": relres_cycles,
                    "solve_to_1e8_seconds": round(t_solve, 3),
                    "solve_cold_seconds": round(t_solve_cold, 3),
                    "solve_relres": relres,
                    "refine_rounds": len(hist) - 1,
                    "setup_seconds": round(t_setup, 2),
                    "lowering_seconds": round(t_lower, 2),
                    "compile_seconds": round(t_compile, 2),
                    "levels": len(ml),
                    "operator_complexity": round(ml.operator_complexity(), 3),
                    "roofline_gnnz_s": round(roofline_gnnz, 1),
                    "devices": [str(d) for d in jax.devices()][:1],
                }
            }
        ),
        file=sys.stderr,
    )

    if os.environ.get("AMG_BENCH_EXTRA") == "1":
        _extra_benches(jax, jnp, amg)


def _extra_benches(jax, jnp, amg):
    """Opt-in round-5 capability benches (unstructured BSG tier, 3-D
    lattice tier).  Not part of the driver headline (their cold compiles
    through the tunnel dominate); run with AMG_BENCH_EXTRA=1 and see
    PERF.md §round-5 for recorded numbers."""
    import scipy.sparse as sp

    from algebraicmultigrid_tpu.models.device import cg_device
    from algebraicmultigrid_tpu.ops.bsg import bsg_from_csr, bsg_spmv, rcm_permutation

    # unstructured: scrambled Poisson through the BSG gather tier
    Nu = int(os.environ.get("AMG_BENCH_UNSTRUCT_N", 1024))
    A = sp.csr_matrix(amg.poisson((Nu, Nu)))
    rng = np.random.default_rng(1)
    p = rng.permutation(A.shape[0])
    Ap = A[p][:, p].tocsr()
    pi = rcm_permutation(Ap)
    Ar = Ap[pi][:, pi].tocsr()
    B = bsg_from_csr(Ar)
    x = jnp.asarray(
        rng.standard_normal(max(B.rows_padded, B.cols_padded)).astype(np.float32)
    )
    R = 200

    @jax.jit
    def chain(v):
        return jax.lax.fori_loop(0, R, lambda i, u: bsg_spmv(B, u) * 1e-3, v)

    float(chain(x)[0])
    t0 = time.perf_counter()
    float(chain(x)[0])
    t = (time.perf_counter() - t0 - 0.024) / R
    print(
        json.dumps(
            {
                "aux_extra": {
                    "unstructured_spmv_gnnz_s": round(B.nnz / t / 1e9, 2),
                    "unstructured_n": A.shape[0],
                }
            }
        ),
        file=sys.stderr,
    )

    # 3-D: structured N-D tier on poisson(N3^3)
    N3 = int(os.environ.get("AMG_BENCH_3D_N", 128))
    prob = amg.poisson((N3, N3, N3), lattice=True)
    ml3 = amg.structured_smoothed_aggregation_nd(prob, proxy=47, cut_rows=20000)
    b3 = (prob @ np.ones(N3 ** 3)).astype(np.float32)
    t0 = time.time()
    x3, iters, _ = cg_device(ml3, b3, tol=1e-6, maxiter=60, log=True)
    cold = time.time() - t0
    t0 = time.time()
    x3, iters, _ = cg_device(ml3, b3, tol=1e-6, maxiter=60, log=True)
    warm = time.time() - t0
    relres = float(
        np.linalg.norm(prob @ x3.astype(np.float64) - b3) / np.linalg.norm(b3)
    )
    print(
        json.dumps(
            {
                "aux_extra": {
                    "poisson3d_n": N3 ** 3,
                    "poisson3d_pcg_iters": int(iters),
                    "poisson3d_relres": relres,
                    "poisson3d_solve_warm_s": round(warm, 2),
                    "poisson3d_solve_cold_s": round(cold, 1),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
