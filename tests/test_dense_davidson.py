"""End-to-end dense Davidson tests.

Tier-1 property tests + tier-2 scipy cross-validation, mirroring the
reference's test programs (``src/tests/test_dense_properties.f90``,
``src/tests/test_dense_numpy.f90`` + ``test_davidson.py``) — but in-process
instead of via subprocess text files.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from fortran_davidson_tpu import DavidsonOptions, eigensolve, generalized_eigensolver
from fortran_davidson_tpu.models.generators import generate_diagonal_dominant


def _dense_pair(n, key_a=0, key_b=1):
    A = generate_diagonal_dominant(n, 1e-3, key=jax.random.PRNGKey(key_a))
    B = generate_diagonal_dominant(n, 1e-3, diag_val=1.0,
                                   key=jax.random.PRNGKey(key_b))
    return A, B


@pytest.mark.parametrize("method", ["DPR", "GJD"])
def test_standard_dense_properties(method):
    # Reference: test_dense_properties.f90:21-48 (50x50, lowest-3, tol 1e-8).
    A = generate_diagonal_dominant(50, 1e-3)
    res = eigensolve(A, 3, method=method, tolerance=1e-8, max_iterations=100)
    assert bool(res.converged)
    Anp = np.asarray(A)
    evals = np.asarray(res.eigenvalues)
    evecs = np.asarray(res.eigenvectors)
    # Eigenpair equation.
    for j in range(3):
        r = Anp @ evecs[:, j] - evals[j] * evecs[:, j]
        assert np.linalg.norm(r) < 1e-8
    # Eigenvector orthonormality.
    np.testing.assert_allclose(evecs.T @ evecs, np.eye(3), atol=1e-8)
    # scipy cross-check.
    w_ref = np.linalg.eigvalsh(Anp)[:3]
    np.testing.assert_allclose(evals, w_ref, atol=1e-8)


def test_dpr_gjd_agree():
    # Reference property: DPR and GJD agree to 1e-8 on the same matrix.
    A = generate_diagonal_dominant(50, 1e-3)
    r1 = eigensolve(A, 3, method="DPR", tolerance=1e-8)
    r2 = eigensolve(A, 3, method="GJD", tolerance=1e-8)
    np.testing.assert_allclose(np.asarray(r1.eigenvalues),
                               np.asarray(r2.eigenvalues), atol=1e-8)


@pytest.mark.parametrize("method", ["DPR", "GJD"])
def test_generalized_dense(method):
    # Reference: test_dense_numpy.f90 + test_davidson.py:39-40 (generalized
    # 50x50 vs scipy.linalg.eigh(a, b=b), subspace 10).
    A, B = _dense_pair(50)
    res = eigensolve(A, 3, second_matrix=B, method=method, tolerance=1e-8,
                     max_dim_sub=10, max_iterations=200)
    assert bool(res.converged)
    w_ref = scipy.linalg.eigh(np.asarray(A), np.asarray(B),
                              eigvals_only=True)[:3]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), w_ref, atol=1e-8)
    # Generalized eigenpair residual.
    for j in range(3):
        r = (np.asarray(A) @ np.asarray(res.eigenvectors)[:, j]
             - np.asarray(res.eigenvalues)[j]
             * (np.asarray(B) @ np.asarray(res.eigenvectors)[:, j]))
        assert np.linalg.norm(r) < 1e-8


def test_demo_dim100_generalized_gjd_vs_dpr():
    # Reference demo driver: dim-100 generalized, tol 1e-5, subspace 10,
    # GJD vs DPR eigenvalues agree < 1e-6 (src/main.f90:52-59).
    A, B = _dense_pair(100, key_a=5, key_b=6)
    r_gjd = generalized_eigensolver(A, 3, method="GJD", max_iterations=1000,
                                    tolerance=1e-5, max_dim_sub=10,
                                    second_matrix=B)
    r_dpr = generalized_eigensolver(A, 3, method="DPR", max_iterations=1000,
                                    tolerance=1e-5, max_dim_sub=10,
                                    second_matrix=B)
    assert bool(r_gjd.converged) and bool(r_dpr.converged)
    diff = np.linalg.norm(np.asarray(r_gjd.eigenvalues)
                          - np.asarray(r_dpr.eigenvalues))
    assert diff < 1e-6
    # Residual check as in main.f90:58-72.
    for res in (r_gjd, r_dpr):
        for j in range(3):
            r = (np.asarray(A) @ np.asarray(res.eigenvectors)[:, j]
                 - np.asarray(res.eigenvalues)[j]
                 * (np.asarray(B) @ np.asarray(res.eigenvectors)[:, j]))
            assert np.linalg.norm(r) < 1e-4


def test_subspace_collapse_path():
    # Force collapses: tiny max_dim_sub so the doubling hits the cap.
    A = generate_diagonal_dominant(60, 1e-2, key=jax.random.PRNGKey(9))
    res = eigensolve(A, 2, method="DPR", tolerance=1e-8, max_dim_sub=8,
                     max_iterations=300)
    assert bool(res.converged)
    dims = np.asarray(res.subspace_dims)
    dims = dims[dims > 0]
    # Schedule 4 -> 8 -> 16 -> collapse to 4 ...
    assert dims.max() == 16
    assert 4 in dims
    w_ref = np.linalg.eigvalsh(np.asarray(A))[:2]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), w_ref, atol=1e-8)


def test_history_and_iterations():
    A = generate_diagonal_dominant(50, 1e-3)
    res = eigensolve(A, 3, method="DPR", tolerance=1e-8, max_iterations=100)
    it = int(res.iterations)
    hist = np.asarray(res.residual_history)
    assert np.all(np.isfinite(hist[:it]))
    assert np.all(np.isnan(hist[it:]))
    # Last recorded errors below tolerance.
    assert np.all(hist[it - 1] < 1e-8)


def test_nonconvergence_warning():
    A = generate_diagonal_dominant(50, 1e-3)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        res = generalized_eigensolver(A, 3, method="DPR", max_iterations=2,
                                      tolerance=1e-12)
    assert not bool(res.converged)
    assert int(res.iterations) == 2


def test_invalid_method_raises():
    A = generate_diagonal_dominant(10, 1e-3)
    with pytest.raises(Exception, match="Unknown correction method"):
        eigensolve(A, 2, method="BOGUS")


def test_float32_mode():
    A = generate_diagonal_dominant(50, 1e-3).astype(jnp.float32)
    res = eigensolve(A, 3, method="DPR", tolerance=1e-4, dtype="float32",
                     max_iterations=200)
    assert res.eigenvalues.dtype == jnp.float32
    assert bool(res.converged)
    w_ref = np.linalg.eigvalsh(np.asarray(A, np.float64))[:3]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), w_ref, atol=1e-3)


def test_sticky_vs_nonsticky_convergence():
    """Sticky = dense-engine semantics (src/davidson.f90:173-178: a pair
    that once converged stays converged); non-sticky = free-engine
    semantics (:416: all pairs re-checked every iteration)."""
    from fortran_davidson_tpu.models.generators import \
        generate_diagonal_dominant
    import fortran_davidson_tpu as fdt
    A = generate_diagonal_dominant(60, 1e-3)
    r_sticky = fdt.eigensolve(A, 3, sticky_convergence=True, tolerance=1e-8)
    r_fresh = fdt.eigensolve(A, 3, sticky_convergence=False, tolerance=1e-8)
    assert bool(r_sticky.converged) and bool(r_fresh.converged)
    np.testing.assert_allclose(np.asarray(r_sticky.eigenvalues),
                               np.asarray(r_fresh.eigenvalues), atol=1e-9)
    # Non-sticky can never exit earlier than sticky.
    assert int(r_fresh.iterations) >= int(r_sticky.iterations) - 1


def test_profile_trace_writes_artifacts(tmp_path):
    from fortran_davidson_tpu.models.generators import \
        generate_diagonal_dominant
    from fortran_davidson_tpu.utils.observability import (annotate,
                                                          profile_trace)
    import fortran_davidson_tpu as fdt
    import os
    A = generate_diagonal_dominant(40, 1e-3)
    with profile_trace(str(tmp_path)):
        with annotate("davidson-solve"):
            fdt.eigensolve(A, 2, tolerance=1e-6).block_until_ready()
    # jax.profiler writes a plugins/profile/<ts>/ tree.
    found = [p for p, _, files in os.walk(tmp_path) for f in files]
    assert found, "profiler produced no artifacts"
