"""Complex-valued problems (test/test_complex.jl): RS solves, SA errors."""

import numpy as np
import pytest

import algebraicmultigrid_tpu as amg


def test_complex_rs_solve():
    A = amg.poisson((5, 5))
    Ac = (A * (1 / np.sqrt(2)) + A * (1j / np.sqrt(2))).tocsc()
    rs = np.random.RandomState(1337)
    u = rs.rand(25) + 1j * rs.rand(25)
    b = Ac @ u
    ml = amg.ruge_stuben(Ac)
    x = amg.solve_mg(ml, b)
    assert np.allclose(x, u, rtol=1e-6)


def test_complex_sa_raises():
    A = amg.poisson((5, 5))
    Ac = (A * (1 / np.sqrt(2)) + A * (1j / np.sqrt(2))).tocsc()
    with pytest.raises(ValueError):
        amg.smoothed_aggregation(Ac)
