"""Multi-chip equivalence on the 8-virtual-device CPU mesh (survey §4 end
note): sharded hierarchy solves must match the single-device engine."""

import numpy as np
import pytest

import jax

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.parallel import make_row_mesh, solve_sharded


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_devices
@pytest.mark.multichip
def test_sharded_spmv_matches():
    from algebraicmultigrid_tpu.ops.sparse import ell_from_csr
    from algebraicmultigrid_tpu.ops.spmv import ell_spmv
    from jax.sharding import NamedSharding, PartitionSpec as P
    import dataclasses

    mesh = make_row_mesh(8)
    A = amg.poisson((32, 32))
    E = ell_from_csr(A, dtype=np.float64, row_pad=64)
    rs = np.random.RandomState(0)
    x = rs.rand(A.shape[0])

    y_single = np.asarray(ell_spmv(E, jax.numpy.asarray(x)))[: A.shape[0]]

    s = NamedSharding(mesh, P("shards", None))
    E_sh = dataclasses.replace(
        E, data=jax.device_put(E.data, s), cols=jax.device_put(E.cols, s)
    )
    xs = jax.device_put(
        jax.numpy.asarray(np.pad(x, (0, E.rows_padded - x.size))),
        NamedSharding(mesh, P("shards")),
    )
    y_sh = np.asarray(jax.jit(ell_spmv)(E_sh, xs))[: A.shape[0]]
    assert np.allclose(y_sh, y_single, atol=1e-13)
    assert np.allclose(y_sh, A @ x, atol=1e-12)


@needs_devices
@pytest.mark.multichip
def test_sharded_solve_matches_single_device():
    mesh = make_row_mesh(8)
    A = amg.poisson((48, 48))
    n = A.shape[0]
    b = A @ np.ones(n)
    gs = amg.GaussSeidel(ordering="multicolor")
    ml = amg.ruge_stuben(A, presmoother=gs, postsmoother=gs)

    x_sh, iters, normres = solve_sharded(
        ml, b, amg.V(), mesh=mesh, reltol=1e-8, replicate_below=1024
    )
    assert normres <= 1e-8 * np.linalg.norm(b)

    x_1, res_1 = ml.solve(b, amg.V(), engine="jax", reltol=1e-8, log=True)
    assert iters == len(res_1) - 1
    assert np.allclose(x_sh, x_1, atol=1e-10)


@needs_devices
@pytest.mark.multichip
def test_sharded_sa_w_cycle():
    mesh = make_row_mesh(8)
    A = amg.poisson((32, 32))
    b = A @ np.ones(A.shape[0])
    jac = amg.Jacobi(0.6, iter=2)
    ml = amg.smoothed_aggregation(A, presmoother=jac, postsmoother=jac)
    x_sh, iters, normres = solve_sharded(
        ml, b, amg.W(), mesh=mesh, reltol=1e-8, replicate_below=512
    )
    assert normres <= 1e-8 * np.linalg.norm(b)
    assert np.allclose(x_sh, 1.0, atol=1e-5)


@needs_devices
@pytest.mark.multichip
def test_sharded_lattice_hierarchy_solves():
    """Lat2D levels row-slab sharded over the mesh: the structured SA
    hierarchy solves under solve_sharded and matches the discrete solution."""
    from algebraicmultigrid_tpu.models.lattice import LatticeMatrix

    N = 144
    LP = amg.poisson((N, N), lattice=True)
    ml = amg.structured_smoothed_aggregation(
        LP, proxy=64, cut_rows=2000, min_proxy_dim=16,
        aggregate=amg.StructuredAggregation(box=3),
    )
    assert isinstance(ml.levels[0].A, LatticeMatrix), "fast path must engage"
    mesh = make_row_mesh(8)
    b = LP @ np.ones(N * N)
    x, iters, nr = solve_sharded(
        ml, b, mesh=mesh, reltol=1e-6, dtype="float64", replicate_below=256
    )
    assert nr <= 1e-6 * np.linalg.norm(b)
    assert np.abs(x - 1).max() < 1e-4


@needs_devices
@pytest.mark.multichip
def test_halo_exchange_spmv_matches():
    """Explicit ppermute halo exchange (survey §2.13): slab-sharded Lat2D
    stencil apply equals the single-device apply exactly."""
    from algebraicmultigrid_tpu.parallel import lat2d_spmv_halo
    from algebraicmultigrid_tpu.ops.lattice_op import lat2d_from_spec, lat2d_spmv
    import jax.numpy as jnp

    N = 128
    LP = amg.poisson((N, N), lattice=True)
    A = lat2d_from_spec(LP.spec, jnp.float32)
    mesh = make_row_mesh(8)
    x = np.random.default_rng(0).standard_normal(N * N).astype(np.float32)
    y_ref = np.asarray(lat2d_spmv(A, jnp.asarray(x)))[: N * N]
    y = np.asarray(lat2d_spmv_halo(A, jnp.asarray(x), mesh))
    assert np.abs(y - y_ref).max() == 0.0
