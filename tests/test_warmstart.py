"""Warm-started solves (``initial_vectors=``) — the production
repeated-solve pattern. The reference always cold-starts from unit
vectors (``src/array_utils.f90:136-160``); warm starting from a previous
solve's eigenvectors must cut iterations and never break correctness.
"""

import numpy as np
import pytest
import scipy.linalg

import jax
import jax.numpy as jnp

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.models.generators import \
    generate_diagonal_dominant
from fortran_davidson_tpu.utils.errors import OperatorError


@pytest.fixture(scope="module")
def hard_problem():
    # Weakly diagonal-dominant: cold start needs many iterations.
    A = generate_diagonal_dominant(300, 1.0, key=jax.random.PRNGKey(5))
    cold = fdt.eigensolve(A, 4, tolerance=1e-8, max_iterations=400)
    assert bool(cold.converged)
    return A, cold


class TestWarmStart:
    def test_exact_eigenvectors_converge_immediately(self, hard_problem):
        A, cold = hard_problem
        res = fdt.eigensolve(A, 4, tolerance=1e-8, max_iterations=400,
                             initial_vectors=cold.eigenvectors)
        assert bool(res.converged)
        assert int(res.iterations) <= 2
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(cold.eigenvalues),
                                   atol=1e-9)

    def test_perturbed_guess_never_hurts(self, hard_problem):
        # A modest perturbation of the answer: at least as fast as cold
        # (iteration counts are schedule-driven, so the guarantee is
        # "never worse + correct", not a fixed speedup) and converging
        # to scipy's answer.
        A, cold = hard_problem
        rng = np.random.default_rng(0)
        X0 = (np.asarray(cold.eigenvectors)
              + 1e-3 * rng.standard_normal((300, 4)))
        res = fdt.eigensolve(A, 4, tolerance=1e-8, max_iterations=400,
                             initial_vectors=X0)
        assert bool(res.converged)
        assert int(res.iterations) <= int(cold.iterations)
        want = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:4]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                                   atol=1e-8)

    def test_rank_deficient_guess_degrades_gracefully(self, hard_problem):
        A, cold = hard_problem
        v = np.asarray(cold.eigenvectors)[:, :1]
        X0 = np.concatenate([v, v, v], axis=1)  # rank 1, j=3
        res = fdt.eigensolve(A, 4, tolerance=1e-8, max_iterations=400,
                             initial_vectors=X0)
        assert bool(res.converged)
        want = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:4]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                                   atol=1e-8)

    def test_progressive_refinement_pattern(self):
        # The realistic production pattern: a cheap loose solve feeds a
        # tight refined solve — the warm-started refined solve must beat
        # the cold refined solve.
        from fortran_davidson_tpu.models.generators import \
            surrogate_hamiltonian
        op = surrogate_hamiltonian(100_096, dtype=jnp.float32)
        loose = fdt.eigensolve(op, 4, method="DPR", tolerance=1e-4,
                               relative_tolerance=True,
                               max_iterations=40, dtype="float32",
                               expansion="lowest-k")
        assert bool(loose.converged)
        common = dict(method="DPR", tolerance=1e-8, max_iterations=60,
                      dtype="float32", expansion="lowest-k",
                      refined=True, final_polish=2)
        cold = fdt.eigensolve(op, 4, **common)
        warm = fdt.eigensolve(op, 4,
                              initial_vectors=loose.eigenvectors,
                              **common)
        assert bool(warm.converged)
        assert int(warm.iterations) < int(cold.iterations)
        assert float(np.max(np.asarray(warm.residual_norms))) < 1e-8

    def test_validation(self, hard_problem):
        A, cold = hard_problem
        with pytest.raises(OperatorError):
            fdt.eigensolve(A, 4, initial_vectors=np.ones((299, 2)))
        with pytest.raises(OperatorError):
            # j > init_dim (= 8 for lowest=4)
            fdt.eigensolve(A, 4, initial_vectors=np.ones((300, 9)))

    def test_iteration_parity_unaffected_without_guess(self, hard_problem):
        # The cold path must be bit-unchanged by the feature's existence.
        A, cold = hard_problem
        again = fdt.eigensolve(A, 4, tolerance=1e-8, max_iterations=400)
        assert int(again.iterations) == int(cold.iterations)
        np.testing.assert_array_equal(np.asarray(again.eigenvalues),
                                      np.asarray(cold.eigenvalues))


class TestShardedWarmStart:
    def test_sharded_exact_guess(self):
        from fortran_davidson_tpu.parallel import (default_mesh,
                                                   eigensolve_sharded)
        mesh = default_mesh(8)
        A = generate_diagonal_dominant(128, 1e-3)
        cold = eigensolve_sharded(A, 3, mesh, tolerance=1e-8)
        warm = eigensolve_sharded(A, 3, mesh, tolerance=1e-8,
                                  initial_vectors=cold.eigenvectors)
        assert bool(warm.converged)
        assert int(warm.iterations) <= 2
        np.testing.assert_allclose(np.asarray(warm.eigenvalues),
                                   np.asarray(cold.eigenvalues),
                                   atol=1e-10)


class TestCheckpointedWarmStart:
    def test_checkpointed_fresh_solve_warm_starts(self, hard_problem,
                                                  tmp_path):
        from fortran_davidson_tpu.checkpoint import eigensolve_checkpointed
        A, cold = hard_problem
        res = eigensolve_checkpointed(
            A, 4, str(tmp_path), every=5, tolerance=1e-8,
            max_iterations=400, initial_vectors=cold.eigenvectors)
        assert bool(res.converged)
        assert int(res.iterations) <= 2
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(cold.eigenvalues),
                                   atol=1e-10)


class TestReviewRegressions:
    """Code-review regressions: rank-deficient guesses must never
    produce converged=True with garbage, and partial admissions must
    never clamp the expansion write into live basis columns."""

    def test_tiled_guess_is_honest(self, hard_problem):
        # Pre-fix: a single vector tiled to full width left one active
        # basis column; the three missing pairs' identically-zero
        # residuals read as converged and the solve returned garbage
        # eigenvalues with converged=True at iteration 1.
        A, cold = hard_problem
        X0 = np.tile(np.asarray(cold.eigenvectors)[:, :1], (1, 8))
        res = fdt.eigensolve(A, 4, tolerance=1e-8, initial_vectors=X0,
                             max_iterations=400)
        want = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:4]
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                                   atol=1e-8)

    def test_nonaligned_max_dim_with_partial_admissions(self,
                                                        hard_problem):
        # Pre-fix: with max_dim - init_dim not a multiple of k, partial
        # admissions (locking + a 3-vector warm start) walked m into the
        # window where the expansion's dynamic_update_slice clamped its
        # start column and overwrote live basis columns every cycle
        # (frozen at 5.8e-4 for all 400 iterations).
        A, cold = hard_problem
        X3 = np.asarray(cold.eigenvectors)[:, :3]
        res = fdt.eigensolve(A, 4, tolerance=1e-8, expansion="lowest-k",
                             locking=True, init_dim=8, max_dim_sub=10,
                             initial_vectors=X3, max_iterations=400)
        want = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:4]
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                                   atol=1e-8)

    def test_numpy_int_cheb_degree(self):
        # Pre-fix: the 'auto' validation narrowed the int check to
        # isinstance(int), rejecting numpy integers from config files.
        opts = fdt.DavidsonOptions(cheb_degree=np.int64(6))
        assert int(opts.cheb_degree) == 6

    def test_refined_negative_spectrum(self):
        # Pre-fix: the expand-step Rayleigh-quotient gate was one-sided
        # (rq <= cap), silently inert for shifted spectra whose junk
        # columns carry NEGATIVE mean-diagonal-scale quotients.
        from fortran_davidson_tpu.models.generators import \
            surrogate_hamiltonian
        import jax.numpy as jnp
        base = surrogate_hamiltonian(100_096, dtype=jnp.float32)
        shift = jnp.float32(50_000.0)
        d = base.diagonal() - shift

        def apply(X, d, base_cap):
            return base_cap.matmat(X) - shift * X

        from fortran_davidson_tpu.ops.operators import MatrixFreeOperator
        op = MatrixFreeOperator(apply, base.shape[0], dtype=jnp.float32,
                                diag=d, captured=(d, base))
        res = fdt.eigensolve(op, 3, method="DPR", tolerance=1e-6,
                             relative_tolerance=True, max_iterations=40,
                             dtype="float32", expansion="lowest-k",
                             refined=True, final_polish=2)
        assert bool(res.converged)
        np.testing.assert_allclose(
            np.asarray(res.eigenvalues),
            np.asarray([1.0, 2.0, 3.0]) - 50_000.0, atol=1e-3)

    def test_doubling_rank_deficient_guess_no_wraparound(self,
                                                         hard_problem):
        # Pre-fix: a rank-deficient guess in doubling mode put m off the
        # init_dim lattice; m2 = 2*m overran the padded width and the
        # expansion's roll-add WRAPPED correction columns circularly
        # into live basis columns (subspace_dims reached 80 with
        # m_max=64, col_ok entries hit 2.0).
        A, cold = hard_problem
        V = np.asarray(cold.eigenvectors)
        rng = np.random.default_rng(1)
        X0 = np.concatenate(
            [V[:, :4], V[:, :3] @ rng.standard_normal((3, 3)),
             V[:, :1]], axis=1)  # width 8, rank ~5
        res = fdt.eigensolve(A, 4, tolerance=1e-8, initial_vectors=X0,
                             max_iterations=400)
        dims = np.asarray(res.subspace_dims)[:int(res.iterations)]
        assert dims.max() <= 64  # never overruns the padded width
        want = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:4]
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                                   atol=1e-8)
