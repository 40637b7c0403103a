"""Batched solves (eigensolve_batched): many problems, one program.

No reference analogue (the reference solves one pencil per invocation,
``src/davidson.f90:601-625``); the oracle is scipy per problem plus the
single-problem engine — each batch element must reproduce its standalone
solve's trajectory (same engine, vmapped).
"""

import numpy as np
import pytest
import scipy.linalg

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu import eigensolve, eigensolve_batched
from fortran_davidson_tpu.utils.errors import (InvalidOptionsError,
                                               OperatorError)


def _batch(b, n, seed=0, coupling=2e-3, spread=0.1):
    rng = np.random.default_rng(seed)
    mats = []
    for i in range(b):
        d = np.arange(1, n + 1, dtype=np.float64) * (1.0 + spread * i)
        off = (rng.random((n, n)) - 0.5) * coupling
        mats.append(np.diag(d) + np.triu(off, 1) + np.triu(off, 1).T)
    return np.stack(mats)


class TestBatchedStandard:
    def test_matches_scipy_every_element(self):
        mats = _batch(6, 100)
        res = eigensolve_batched(mats, 3, tolerance=1e-9)
        res.block_until_ready()
        assert np.all(np.asarray(res.converged))
        for i in range(6):
            sci = scipy.linalg.eigh(mats[i], eigvals_only=True)[:3]
            np.testing.assert_allclose(np.asarray(res.eigenvalues[i]), sci,
                                       atol=1e-9)

    def test_matches_single_problem_trajectories(self):
        """Each batch element reproduces its standalone solve exactly —
        same iteration count, same eigenvalues (identical engine math
        under vmap)."""
        mats = _batch(4, 80, seed=3)
        res = eigensolve_batched(mats, 3, tolerance=1e-9)
        for i in range(4):
            one = eigensolve(mats[i], 3, tolerance=1e-9)
            assert int(res.iterations[i]) == int(one.iterations)
            np.testing.assert_allclose(np.asarray(res.eigenvalues[i]),
                                       np.asarray(one.eigenvalues),
                                       atol=1e-12)

    def test_per_problem_iteration_counts_differ(self):
        """Problems of different difficulty keep INDIVIDUAL iteration
        counts — an easy problem's count must not be inflated to the
        slowest element's."""
        rng = np.random.default_rng(9)
        n = 90
        d = np.arange(1, n + 1, dtype=np.float64)
        easy = np.diag(d)  # exact diagonal: converges immediately
        off = (rng.random((n, n)) - 0.5) * 5e-2  # strong coupling: slow
        hard = np.diag(d) + np.triu(off, 1) + np.triu(off, 1).T
        res = eigensolve_batched(np.stack([easy, hard]), 3, tolerance=1e-9)
        res.block_until_ready()
        assert np.all(np.asarray(res.converged))
        its = np.asarray(res.iterations)
        assert its[0] < its[1]
        sci = scipy.linalg.eigh(hard, eigvals_only=True)[:3]
        np.testing.assert_allclose(np.asarray(res.eigenvalues[1]), sci,
                                   atol=1e-9)

    def test_diagonal_batch(self):
        diags = np.stack([np.linspace(1.0, 50.0, 64) + 0.3 * i
                          for i in range(3)])
        res = eigensolve_batched(diags, 2, tolerance=1e-10)
        res.block_until_ready()
        assert np.all(np.asarray(res.converged))
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.sort(diags, axis=1)[:, :2], atol=1e-10)


class TestBatchedGeneralized:
    def test_dense_pencils(self):
        mats = _batch(4, 70, seed=5)
        rng = np.random.default_rng(6)
        bs = []
        for _ in range(4):
            off = (rng.random((70, 70)) - 0.5) * 1e-3
            bs.append(np.eye(70) + np.triu(off, 1) + np.triu(off, 1).T)
        bs = np.stack(bs)
        res = eigensolve_batched(mats, 3, second_matrices=bs,
                                 tolerance=1e-9)
        res.block_until_ready()
        assert np.all(np.asarray(res.converged))
        for i in range(4):
            sci = scipy.linalg.eigh(mats[i], bs[i], eigvals_only=True)[:3]
            np.testing.assert_allclose(np.asarray(res.eigenvalues[i]), sci,
                                       atol=1e-8)

    def test_mixed_kinds_dense_a_diagonal_b(self):
        mats = _batch(3, 60, seed=7)
        diag_b = np.stack([1.0 + 0.05 * np.random.default_rng(i).random(60)
                           for i in range(3)])
        res = eigensolve_batched(mats, 2, second_matrices=diag_b,
                                 tolerance=1e-9)
        res.block_until_ready()
        for i in range(3):
            sci = scipy.linalg.eigh(mats[i], np.diag(diag_b[i]),
                                    eigvals_only=True)[:2]
            np.testing.assert_allclose(np.asarray(res.eigenvalues[i]), sci,
                                       atol=1e-8)


class TestBatchedFeatures:
    def test_gjd_batch(self):
        mats = _batch(3, 60, seed=11)
        res = eigensolve_batched(mats, 2, method="GJD", tolerance=1e-9,
                                 max_dim_sub=10)
        res.block_until_ready()
        assert np.all(np.asarray(res.converged))
        assert res.inner_iterations is not None
        for i in range(3):
            sci = scipy.linalg.eigh(mats[i], eigvals_only=True)[:2]
            np.testing.assert_allclose(np.asarray(res.eigenvalues[i]), sci,
                                       atol=1e-9)

    def test_warm_start_batch(self):
        mats = _batch(3, 60, seed=13)
        cold = eigensolve_batched(mats, 2, tolerance=1e-9)
        warm = eigensolve_batched(mats, 2, tolerance=1e-9,
                                  initial_vectors=np.asarray(
                                      cold.eigenvectors))
        warm.block_until_ready()
        assert np.all(np.asarray(warm.converged))
        # Exact-answer guesses converge (essentially) immediately.
        assert np.all(np.asarray(warm.iterations)
                      <= np.asarray(cold.iterations))
        np.testing.assert_allclose(np.asarray(warm.eigenvalues),
                                   np.asarray(cold.eigenvalues), atol=1e-9)

    def test_refined_f32_batch(self):
        import jax.numpy as jnp
        mats = _batch(3, 64, seed=17).astype(np.float32)
        res = eigensolve_batched(jnp.asarray(mats), 2, dtype="float32",
                                 tolerance=1e-6, refined=True,
                                 final_polish=2)
        res.block_until_ready()
        assert np.all(np.asarray(res.converged))
        for i in range(3):
            sci = scipy.linalg.eigh(np.asarray(mats[i], np.float64),
                                    eigvals_only=True)[:2]
            np.testing.assert_allclose(np.asarray(res.eigenvalues[i]), sci,
                                       atol=1e-5)


class TestBatchedValidation:
    def test_bad_shapes_raise(self):
        with pytest.raises(OperatorError):
            eigensolve_batched(np.ones((4, 5, 6)), 2)
        with pytest.raises(OperatorError):
            eigensolve_batched(np.ones((2, 8, 8)), 2,
                               second_matrices=np.ones((3, 8, 8)))
        with pytest.raises(OperatorError):
            eigensolve_batched(_batch(2, 40), 2,
                               initial_vectors=np.ones((2, 40, 99)))

    def test_chunked_layout_rejected(self):
        with pytest.raises(InvalidOptionsError, match="chunked"):
            eigensolve_batched(_batch(2, 512).astype(np.float32), 2,
                               dtype="float32", refined=True,
                               carry_layout="chunked")

    def test_result_leaves_are_batched(self):
        mats = _batch(5, 40)
        res = eigensolve_batched(mats, 2, tolerance=1e-9)
        assert res.eigenvalues.shape == (5, 2)
        assert res.eigenvectors.shape == (5, 40, 2)
        assert res.iterations.shape == (5,)
        assert res.residual_history.shape[0] == 5
        assert "eigensolve_batched" in fdt.__all__
