"""Gallery matrices (src/gallery.jl parity)."""

import numpy as np

import algebraicmultigrid_tpu as amg


def test_poisson_1d():
    A = amg.poisson(5).toarray()
    expected = (
        2 * np.eye(5) - np.eye(5, k=1) - np.eye(5, k=-1)
    )
    assert np.array_equal(A, expected)


def test_poisson_2d_stencil():
    A = amg.poisson((3, 3))
    assert A.shape == (9, 9)
    d = A.diagonal()
    assert np.all(d == 4)
    # interior point (Julia column-major center of 3×3 = linear index 4)
    row = A.getrow(4).toarray().ravel()
    assert row[4] == 4 and row.sum() == 0


def test_poisson_3d():
    A = amg.poisson((4, 4, 4))
    assert A.shape == (64, 64)
    assert np.all(A.diagonal() == 6)
    assert (A - A.T).nnz == 0


def test_stencil_grid_custom():
    stencil = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
    A = amg.stencil_grid(stencil, (5, 5))
    B = amg.poisson((5, 5))
    assert (A - B).nnz == 0


def test_poisson_dtype():
    assert amg.poisson(10, dtype=np.float32).dtype == np.float32
    assert amg.poisson((4, 4), dtype=np.float32).dtype == np.float32
