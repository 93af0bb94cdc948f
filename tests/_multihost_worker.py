"""Worker for the 2-process multi-host CPU-simulation test (run by
tests/test_multihost.py, one subprocess per simulated host).

Each process owns 4 virtual CPU devices; the global mesh has 8.  The slab-
sharded lattice PCG runs across the process boundary — the agglomeration
all_gather and the halo ppermutes cross what would be the DCN seam on real
multi-host topologies (SURVEY §4 end note).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")
try:  # cross-process CPU collectives need the gloo implementation
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert len(jax.devices()) == 8, jax.devices()
    assert jax.process_count() == 2

    import numpy as np

    import algebraicmultigrid_tpu as amg
    from algebraicmultigrid_tpu.parallel.lattice_cycle import solve_lattice_sharded

    N = 216
    LP = amg.poisson((N, N), lattice=True)
    ml = amg.structured_smoothed_aggregation(
        LP, proxy=72, cut_rows=2000, min_proxy_dim=16,
        aggregate=amg.StructuredAggregation(box=3),
    )
    A = ml.levels[0].A
    b = A @ np.ones(N * N)
    x, iters, relres = solve_lattice_sharded(ml, b, tol=1e-6, maxiter=40, log=True)
    assert relres < 1e-6, (iters, relres)
    err = float(np.linalg.norm(x - 1.0) / np.sqrt(N * N))
    assert err < 1e-4, err
    print(f"MULTIHOST_OK pid={pid} iters={iters} relres={relres:.3e}", flush=True)


if __name__ == "__main__":
    main()
