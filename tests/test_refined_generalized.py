"""First-class refined generalized pencils (round-2 verdict item 4).

The reference treats the pencil as first-class everywhere (the free
engine is ALWAYS generalized, ``src/davidson.f90:277-279``); the refined
double-single machinery — DS-measured projected pencil, first-order Ritz
refinement against the DS pencil residual, plateau/stall detection, and
the in-solve polish — must give f32 pencils the same honest 1e-8-grade
convergence as standard problems.
"""

import numpy as np
import pytest
import scipy.linalg

import jax
import jax.numpy as jnp

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.models.generators import (
    generate_diagonal_dominant, surrogate_hamiltonian, surrogate_overlap)


@pytest.fixture(scope="module")
def pencil_200():
    A = generate_diagonal_dominant(200, 1e-3)
    B = generate_diagonal_dominant(200, 1e-3, diag_val=1.0,
                                   key=jax.random.PRNGKey(3))
    want = scipy.linalg.eigh(np.asarray(A), np.asarray(B),
                             eigvals_only=True)
    return A, B, want


class TestRefinedPencilSmall:
    def test_f32_pencil_polish_reaches_true_1e7(self, pencil_200):
        A, B, want = pencil_200
        A32 = jnp.asarray(np.asarray(A), jnp.float32)
        B32 = jnp.asarray(np.asarray(B), jnp.float32)
        res = fdt.eigensolve(A32, 3, second_matrix=B32, tolerance=1e-7,
                             dtype="float32", refined=True,
                             final_polish=3, max_iterations=200)
        assert bool(res.converged)
        assert float(np.max(np.asarray(res.residual_norms))) < 1e-7
        # f32 eigenvalue storage rounds at ~eps*λ; the polished values
        # must be at that representation limit, not the old ~1e-4
        # f32-pencil floor.
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want[:3],
                                   atol=5e-7)

    def test_f64_refined_pencil_parity(self, pencil_200):
        A, B, want = pencil_200
        res = fdt.eigensolve(A, 3, second_matrix=B, tolerance=1e-10,
                             refined=True, max_iterations=200)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want[:3],
                                   atol=1e-12)

    def test_refined_pencil_gjd(self, pencil_200):
        A, B, want = pencil_200
        A32 = jnp.asarray(np.asarray(A), jnp.float32)
        B32 = jnp.asarray(np.asarray(B), jnp.float32)
        res = fdt.eigensolve(A32, 2, second_matrix=B32, method="GJD",
                             tolerance=1e-6, dtype="float32",
                             refined=True, final_polish=2,
                             max_iterations=200)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want[:2],
                                   atol=5e-7)

    def test_plateau_stall_surfaces_for_pencils(self, pencil_200):
        # Unattainable tolerance on an f32 pencil: pre-change the
        # plateau/stall machinery gated on `not gen` and the loop ground
        # to max_iterations.
        A, B, _ = pencil_200
        A32 = jnp.asarray(np.asarray(A), jnp.float32)
        B32 = jnp.asarray(np.asarray(B), jnp.float32)
        res = fdt.eigensolve(A32, 3, second_matrix=B32, tolerance=1e-14,
                             dtype="float32", refined=True,
                             final_polish=0, max_iterations=300)
        assert not bool(res.converged)
        assert bool(res.stalled)
        assert int(res.iterations) < 300


class TestRefinedPencilAtScale:
    @pytest.mark.slow
    def test_1m_generalized_converges_at_1e8_absolute(self):
        # The verdict's done-criterion: a 1M-row generalized refined
        # solve with in-solve polish converging with TRUE residuals
        # <= 1e-8, eigenvalues matching the f64 matrix-free oracle.
        n = 1_000_448
        A = surrogate_hamiltonian(n, dtype=jnp.float32)
        B = surrogate_overlap(n, dtype=jnp.float32)
        res = fdt.eigensolve(A, 4, second_matrix=B, method="DPR",
                             tolerance=1e-8, max_iterations=40,
                             dtype="float32", expansion="lowest-k",
                             refined=True, final_polish=3)
        assert bool(res.converged)
        assert float(np.max(np.asarray(res.residual_norms))) < 1e-8

        oracle = fdt.eigensolve(surrogate_hamiltonian(n),
                                4,
                                second_matrix=surrogate_overlap(n),
                                tolerance=1e-10, max_iterations=40)
        assert bool(oracle.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(oracle.eigenvalues),
                                   atol=5e-7)
