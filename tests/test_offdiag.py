"""Exact off-diagonal splits across operator kinds.

``A.offdiag()`` must satisfy ``offdiag.to_dense() == dense(A) - diag(A)``
EXACTLY (structural zeroing, no floating subtract) for the formats that
store their diagonal; the generic wrapper is checked for the documented
matmat-minus-diag behavior. Foundation of the refined-precision residual
(``r = A_off x + ds((d - λ)x)``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fortran_davidson_tpu.models.generators import generate_diagonal_dominant
from fortran_davidson_tpu.ops.operators import (DenseOperator,
                                                DiagonalOperator,
                                                MatrixFreeOperator)
from fortran_davidson_tpu.ops.sparse import (BSROperator, ELLOperator,
                                             generate_banded_bsr,
                                             generate_local_sparse,
                                             generate_sparse_diagonal_dominant,
                                             split_band_remainder)


def check_exact(op):
    dense = np.asarray(op.to_dense())
    off = op.offdiag()
    got = np.asarray(off.to_dense())
    expected = dense - np.diag(np.diag(dense))
    np.testing.assert_array_equal(got, expected)
    np.testing.assert_array_equal(np.asarray(off.diagonal()), 0.0)


def test_ell_offdiag_exact():
    check_exact(generate_sparse_diagonal_dominant(96, 7, seed=3))


def test_bsr_banded_offdiag_exact():
    check_exact(generate_banded_bsr(16, 8, bandwidth=2, seed=1))


def test_bsr_general_offdiag_exact(rng):
    dense = np.asarray(generate_diagonal_dominant(64, 1e-2))
    op = BSROperator.from_dense(dense, bs=8)
    check_exact(op)


def test_hybrid_offdiag_exact():
    rows, cols, vals = generate_local_sparse(256, 8, locality=20.0, seed=2)
    check_exact(split_band_remainder(rows, cols, vals, 256, block_size=64,
                                     bandwidth=1))


def test_dense_offdiag_exact():
    A = generate_diagonal_dominant(40, 1e-3)
    check_exact(DenseOperator(A))


def test_diagonal_offdiag_zero():
    op = DiagonalOperator(jnp.arange(1.0, 11.0))
    X = jnp.ones((10, 3))
    np.testing.assert_array_equal(np.asarray(op.offdiag().matmat(X)), 0.0)


def test_matrix_free_fallback(rng):
    A = np.asarray(generate_diagonal_dominant(32, 1e-3))
    op = MatrixFreeOperator(lambda X: jnp.asarray(A) @ X, 32,
                            dtype=jnp.float64,
                            diag=jnp.asarray(np.diag(A)))
    X = jnp.asarray(rng.standard_normal((32, 4)))
    got = np.asarray(op.offdiag().matmat(X))
    expected = (A - np.diag(np.diag(A))) @ np.asarray(X)
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_matrix_free_exact_offdiag_fn(rng):
    A = np.asarray(generate_diagonal_dominant(32, 1e-3))
    Aoff = A - np.diag(np.diag(A))
    op = MatrixFreeOperator(lambda X: jnp.asarray(A) @ X, 32,
                            dtype=jnp.float64,
                            diag=jnp.asarray(np.diag(A)),
                            offdiag_fn=lambda X: jnp.asarray(Aoff) @ X)
    X = jnp.asarray(rng.standard_normal((32, 4)))
    np.testing.assert_allclose(np.asarray(op.offdiag().matmat(X)),
                               Aoff @ np.asarray(X), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(op.offdiag().diagonal()), 0.0)
