"""RS splitting golden tests — exact 0/1 outputs pinned by the reference
(test/runtests.jl:36-50)."""

import numpy as np

import algebraicmultigrid_tpu as amg
from algebraicmultigrid_tpu.models.splitting import RS
from algebraicmultigrid_tpu.models.strength import Classical


def test_poisson7_splitting():
    S = amg.poisson(7)
    assert RS()(S).tolist() == [0, 1, 0, 1, 0, 1, 0]


def test_thing_splitting(thing):
    S, T = Classical(0.25)(thing)
    expected = [0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 0, 1, 1, 0, 0, 1, 0,
                0, 0, 1, 0, 1, 0, 1, 0, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0,
                1, 0, 0, 0, 0, 1, 1, 0, 1, 0]
    assert RS()(S).tolist() == expected


def test_ref_split(ref_S, ref_split):
    assert np.array_equal(RS()(ref_S), ref_split)
