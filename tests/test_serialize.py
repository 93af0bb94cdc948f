"""Hierarchy checkpointing: save/load round-trips solve identically
(survey §5.4 — the hierarchy is a pytree, the lattice levels serialize as
their O(boundary) coefficient tables)."""

import numpy as np

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.lattice import LatticeMatrix


def test_roundtrip_generic(tmp_path):
    A = amg.poisson((40, 40))
    ml = amg.ruge_stuben(A)
    p = str(tmp_path / "h.npz")
    amg.save_hierarchy(ml, p)
    ml2 = amg.load_hierarchy(p)
    assert [l.A.shape[0] for l in ml2.levels] == [l.A.shape[0] for l in ml.levels]
    b = A @ np.ones(1600)
    x1, r1 = amg.solve_mg(ml, b, reltol=1e-8, log=True)
    x2, r2 = amg.solve_mg(ml2, b, reltol=1e-8, log=True)
    assert len(r1) == len(r2)
    assert np.allclose(x1, x2)


def test_roundtrip_lattice(tmp_path):
    LP = amg.poisson((256, 256), lattice=True)
    ml = amg.structured_smoothed_aggregation(LP, proxy=64, cut_rows=8000, min_proxy_dim=12)
    assert isinstance(ml.levels[0].A, LatticeMatrix)
    p = str(tmp_path / "hl.npz")
    amg.save_hierarchy(ml, p)
    import os

    # lattice levels store tables, not assembled matrices: checkpoint stays tiny
    assert os.path.getsize(p) < 2_000_000
    ml2 = amg.load_hierarchy(p)
    assert isinstance(ml2.levels[0].A, LatticeMatrix)
    b = LP @ np.ones(LP.shape[0])
    x1 = amg.solve_mg(ml, b, reltol=1e-8)
    x2 = amg.solve_mg(ml2, b, reltol=1e-8)
    assert np.allclose(x1, x2)
