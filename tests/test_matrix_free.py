"""Matrix-free engine coverage (BASELINE configs 3 & 4).

The reference's matrix-free engine is generalized-only and DPR-only
(``src/davidson.f90:277-279,428``); this framework lifts both
restrictions — these tests pin the full matrix (standard/generalized) x
(DPR/GJD) grid on matrix-free operators against scipy on the
densified surrogate.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.models.generators import (surrogate_hamiltonian,
                                                    surrogate_overlap)


def _densify(op):
    return np.asarray(op.matmat(jnp.eye(op.shape[0], dtype=op.dtype)))


@pytest.fixture(scope="module")
def pair():
    A = surrogate_hamiltonian(300)
    B = surrogate_overlap(300)
    return A, B, _densify(A), _densify(B)


@pytest.mark.parametrize("method", ["DPR", "GJD"])
def test_free_standard(pair, method):
    A, _, Ad, _ = pair
    res = fdt.eigensolve(A, 3, method=method, tolerance=1e-8)
    res.block_until_ready()
    assert bool(res.converged)
    expected = scipy.linalg.eigh(Ad, eigvals_only=True)[:3]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), expected,
                               atol=1e-8)


@pytest.mark.parametrize("method", ["DPR", "GJD"])
def test_free_generalized(pair, method):
    """Config 4: CI-surrogate pencil with GJD's iterative correction solve
    — impossible in the reference (free path is DPR-only)."""
    A, B, Ad, Bd = pair
    res = fdt.eigensolve(A, 3, second_matrix=B, method=method,
                         tolerance=1e-8, max_dim_sub=20)
    res.block_until_ready()
    assert bool(res.converged)
    expected = scipy.linalg.eigh(Ad, Bd, eigvals_only=True)[:3]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), expected,
                               atol=1e-8)
    # Residual check in operator form: ||A v - lambda B v||.
    for j in range(3):
        v = res.eigenvectors[:, j]
        lam = float(res.eigenvalues[j])
        err = float(jnp.linalg.norm(A @ v - lam * (B @ v)))
        assert err < 1e-7


def test_free_benchmark_shape(pair):
    """The reference benchmark_free configuration (dim 1000, lowest-3,
    DPR, tol 1e-8, subspace 20; ``src/benchmark_free.f90:101-102``)."""
    A = surrogate_hamiltonian(1000)
    B = surrogate_overlap(1000)
    res = fdt.eigensolve(A, 3, second_matrix=B, method="DPR",
                         tolerance=1e-8, max_dim_sub=20)
    res.block_until_ready()
    assert bool(res.converged)
    assert np.all(np.asarray(res.residual_norms) < 1e-8)


def test_sparse_matrix_free_dpr_lowest10():
    """Config 3 shape (downscaled for CPU): unstructured sparse,
    ~9 nnz/row, lowest-10, DPR."""
    from fortran_davidson_tpu.ops.sparse import \
        generate_sparse_diagonal_dominant
    op = generate_sparse_diagonal_dominant(2000, 9, sparsity=1e-3, seed=42)
    res = fdt.eigensolve(op, 10, method="DPR", tolerance=1e-8)
    res.block_until_ready()
    assert bool(res.converged)
    dense = np.asarray(op.to_dense())
    expected = scipy.linalg.eigh(dense, eigvals_only=True)[:10]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), expected,
                               atol=1e-8)
