"""Native (C++) tier ↔ Python tier differential tests.

The C++ kernels in ``native/amg_setup.cpp`` must reproduce the Python
conformance tier bit-for-bit (same greedy orders)."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.aggregate import _aggregate_ids_python, aggregate_ids
from algebraicmultigrid_tpu.models.splitting import RS, rs_cf_splitting
from algebraicmultigrid_tpu.models.strength import Classical, SymmetricStrength
from algebraicmultigrid_tpu.native.build import get_native
from algebraicmultigrid_tpu.ops.coloring import greedy_coloring_native
from algebraicmultigrid_tpu.ops.sparse import as_csc

needs_native = pytest.mark.skipif(get_native() is None, reason="no native lib")


def _cases():
    yield amg.poisson(257).tocsc()
    yield amg.poisson((17, 23)).tocsc()
    rs = np.random.RandomState(11)
    M = sp.random(200, 200, density=0.04, random_state=rs)
    yield sp.csc_matrix(M + M.T + 3 * sp.eye(200))


@needs_native
def test_native_splitting_matches_python():
    for A in _cases():
        S, _ = Classical(0.25)(A)
        native = RS()(S)
        os.environ["AMGTPU_NO_NATIVE"] = "1"
        try:
            python = RS()(S)
        finally:
            del os.environ["AMGTPU_NO_NATIVE"]
        assert np.array_equal(native, python)


@needs_native
def test_native_aggregation_matches_python():
    for A in _cases():
        S, _ = SymmetricStrength(0.0)(A)
        S = as_csc(S)
        x_nat, n_nat = aggregate_ids(S)
        x_py, n_py = _aggregate_ids_python(S.indptr, S.indices, S.data, S.shape[0])
        assert n_nat == n_py
        assert np.array_equal(x_nat, x_py)


@needs_native
def test_native_coloring_valid():
    for A in _cases():
        colors = greedy_coloring_native(A)
        G = sp.csr_matrix(A + A.T)
        rows = np.repeat(np.arange(G.shape[0]), np.diff(G.indptr))
        off = rows != G.indices
        assert np.all(colors[rows[off]] != colors[G.indices[off]])
