"""Refined-path robustness at scale: SVQB noise floor, the expand-step
Rayleigh-quotient gate, stall detection, and the in-solve final polish.

Regression context (measured before the fix, 1M rows f32 CPU): strongly
correlated correction columns (structural on separable operators) made
SVQB whiten sub-noise difference directions into unit junk columns with
Rayleigh quotients at the mean-diagonal scale (~3e5); ||H|| inflation
then destroyed the f32 eigh and residuals blew up 5e-6 -> 5e-3 before
the basis froze. The two-layer gate (``core/orthogonal.py`` rank
threshold + ``core/loop.py`` RQ gate) keeps the basis clean; the
``final_polish`` option closes the remaining f32-storage gap so
tolerance=1e-8 solves of million-row f32 problems report
``converged=True`` with TRUE residuals below tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.models.generators import surrogate_hamiltonian
from fortran_davidson_tpu.utils.errors import InvalidOptionsError


@pytest.fixture(scope="module")
def op_1m():
    return surrogate_hamiltonian(1_000_448, dtype=jnp.float32)


class TestNoiseGate:
    @pytest.mark.slow
    def test_refined_1m_no_blowup_and_basis_stays_clean(self, op_1m):
        # The defining regression: residuals must improve monotonically
        # (no junk-column blow-up) and the basis must never carry a
        # mean-diagonal-scale Rayleigh quotient column.
        res = fdt.eigensolve(op_1m, 4, method="DPR", tolerance=1e-6,
                             relative_tolerance=True, max_iterations=20,
                             dtype="float32", expansion="lowest-k",
                             refined=True)
        h = np.asarray(res.residual_history)
        h = h[: int(res.iterations)]
        # After the first real iterations, no 10x regression of the best
        # residual seen so far (pre-fix: 1000x blow-up by iteration 7).
        best = np.minimum.accumulate(h[:, 0])
        assert np.all(h[2:, 0] < 10.0 * best[1:-1] + 1e-12)
        assert h[-1].max() < 2e-5  # pre-fix: 8e-3

    @pytest.mark.slow
    def test_stall_exits_early(self, op_1m):
        # Once every correction is dropped as noise, the lowest-k state
        # is a fixed point — the loop must exit instead of spinning to
        # max_iterations (pre-fix: identical frozen residuals for all
        # remaining iterations).
        res = fdt.eigensolve(op_1m, 4, method="DPR", tolerance=1e-7,
                             relative_tolerance=True, max_iterations=60,
                             dtype="float32", expansion="lowest-k",
                             refined=True)
        assert int(res.iterations) < 40  # stalls long before 60


class TestFinalPolish:
    @pytest.mark.slow
    def test_1m_converges_at_1e8_absolute(self, op_1m):
        res = fdt.eigensolve(op_1m, 4, method="DPR", tolerance=1e-8,
                             max_iterations=40, dtype="float32",
                             expansion="lowest-k", refined=True,
                             final_polish=3)
        assert bool(res.converged)
        assert float(np.max(np.asarray(res.residual_norms))) < 1e-8
        # The surrogate's lowest eigenvalues are 1..4 to ~1e-7.
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   [1.0, 2.0, 3.0, 4.0], atol=1e-6)

    def test_requires_refined(self):
        with pytest.raises(InvalidOptionsError):
            fdt.DavidsonOptions(final_polish=2)

    def test_small_problem_semantics(self):
        # On a small f32 problem the polish must preserve correctness and
        # the convergence flags must reflect the POLISHED residuals.
        from fortran_davidson_tpu.models.generators import \
            generate_diagonal_dominant
        import scipy.linalg
        A32 = jnp.asarray(np.asarray(
            generate_diagonal_dominant(200, 1e-3)), jnp.float32)
        res = fdt.eigensolve(A32, 3, tolerance=1e-7, dtype="float32",
                             refined=True, final_polish=3,
                             max_iterations=200)
        assert bool(res.converged)
        want = scipy.linalg.eigh(np.asarray(A32, np.float64),
                                 eigvals_only=True)[:3]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                                   atol=1e-5)
        assert float(np.max(np.asarray(res.residual_norms))) < 1e-7

    @pytest.mark.slow
    def test_operator_columns_account_polish(self, op_1m):
        base = fdt.eigensolve(op_1m, 4, method="DPR", tolerance=1e-5,
                              relative_tolerance=True, max_iterations=10,
                              dtype="float32", expansion="lowest-k",
                              refined=True)
        pol = fdt.eigensolve(op_1m, 4, method="DPR", tolerance=1e-5,
                             relative_tolerance=True, max_iterations=10,
                             dtype="float32", expansion="lowest-k",
                             refined=True, final_polish=2)
        assert (int(pol.operator_columns)
                >= int(base.operator_columns) + 2 * 2 * 4)


class TestStalledReporting:
    @pytest.mark.slow
    def test_stalled_flag_surfaces(self, op_1m):
        # The stall exit (noise-gate fixed point or plateau) must be
        # visible on the result, distinguishing "floor reached" from
        # running out of iterations.
        res = fdt.eigensolve(op_1m, 4, method="DPR", tolerance=1e-9,
                             relative_tolerance=True, max_iterations=60,
                             dtype="float32", expansion="lowest-k",
                             refined=True)
        assert int(res.iterations) < 60
        assert bool(res.stalled)

    def test_unstalled_f64_has_flag_false(self):
        from fortran_davidson_tpu.models.generators import \
            generate_diagonal_dominant
        A = generate_diagonal_dominant(60, 1e-3)
        res = fdt.eigensolve(A, 3, tolerance=1e-8)
        assert bool(res.converged)
        assert not bool(res.stalled)
