"""Round-2 advisor-finding regressions.

Each test reproduces a reviewed defect and pins the fixed behavior:
NaN-poisoning of the refined path by nonexistent pairs, the structurally
unreachable plateau exit under the doubling schedule, the misleading
non-convergence hint, and the silent multi-host init fallback.
"""

import numpy as np
import pytest
import scipy.linalg

import jax

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.models.generators import \
    generate_diagonal_dominant


@pytest.fixture(scope="module")
def problem():
    A = generate_diagonal_dominant(300, 1.0, key=jax.random.PRNGKey(5))
    cold = fdt.eigensolve(A, 4, tolerance=1e-8, max_iterations=400)
    assert bool(cold.converged)
    return A, cold


class TestRefinedRankDeficientGuess:
    def test_refined_tiled_guess_no_nan(self, problem):
        # Pre-fix: a rank-1 tiled warm start left identically-zero Ritz
        # columns; refined_pairs divided by their zero Rayleigh
        # denominator and the NaN survived the pair-mask MULTIPLY
        # (NaN*0 = NaN), poisoning the correction block and then the
        # basis — all-NaN eigenvalues after max_iterations while the
        # non-refined path converged.
        A, cold = problem
        X0 = np.tile(np.asarray(cold.eigenvectors)[:, :1], (1, 8))
        res = fdt.eigensolve(A, 4, tolerance=1e-8, refined=True,
                             initial_vectors=X0, max_iterations=400)
        assert np.all(np.isfinite(np.asarray(res.eigenvalues)))
        assert bool(res.converged)
        want = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:4]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                                   atol=1e-8)

    def test_refined_pairs_zero_column_is_finite(self):
        # Unit-level: the zero column reports λ=0, error=0, residual=0 —
        # never NaN (the loop's pair-existence guard owns the decision).
        import jax.numpy as jnp
        from fortran_davidson_tpu.core.refine import refined_pairs
        from fortran_davidson_tpu.ops.operators import as_operator
        A = np.diag(np.arange(1.0, 9.0))
        A[0, 1] = A[1, 0] = 0.01
        op = as_operator(jnp.asarray(A, jnp.float32))
        X = jnp.zeros((8, 2), jnp.float32).at[0, 0].set(1.0)
        ref = refined_pairs(op.offdiag(), op.diagonal(), X)
        out = np.concatenate([np.asarray(ref.evals),
                              np.asarray(ref.errors),
                              np.asarray(ref.residual).ravel()])
        assert np.all(np.isfinite(out))
        assert float(ref.evals[1]) == 0.0
        assert float(ref.errors[1]) == 0.0


class TestPlateauUnderDoubling:
    def test_plateau_exit_reachable(self):
        # Pre-fix: the plateau counter RESET on every collapse, and the
        # doubling schedule collapses every ~log2(max_dim/init_dim) < 10
        # iterations — the exit was structurally unreachable and an
        # unattainable tolerance ground noise to max_iterations.
        A = generate_diagonal_dominant(400, 1e-3,
                                       key=jax.random.PRNGKey(7))
        res = fdt.eigensolve(A, 4, tolerance=1e-14, dtype="float32",
                             refined=True, final_polish=0,
                             max_iterations=300)
        assert not bool(res.converged)
        assert bool(res.stalled)
        assert int(res.iterations) < 300


class TestNonConvergenceHint:
    def test_hint_respects_options_object(self, problem):
        # Pre-fix: the hint gated on the raw keyword overrides only, so
        # a solve configured refined via options=DavidsonOptions(...)
        # that failed still suggested 'use refined=True'.
        A, _ = problem
        opts = fdt.DavidsonOptions(refined=True, dtype="float32")
        with pytest.warns(RuntimeWarning, match="did not converge") as rec:
            fdt.generalized_eigensolver(np.asarray(A), 4,
                                        max_iterations=1,
                                        tolerance=1e-12, options=opts)
        msgs = [str(w.message) for w in rec
                if "did not converge" in str(w.message)]
        assert msgs and all("refined=True" not in m for m in msgs)

    def test_hint_still_fires_for_unrefined_f32(self, problem):
        A, _ = problem
        with pytest.warns(RuntimeWarning, match="refined=True"):
            fdt.generalized_eigensolver(np.asarray(A), 4,
                                        max_iterations=1,
                                        tolerance=1e-12, dtype="float32")


class TestMultihostInit:
    def test_hinted_init_failure_raises(self, monkeypatch):
        # Pre-fix: initialize() swallowed ValueError/RuntimeError
        # unconditionally; in a genuine multi-process launch whose
        # coordinator is unreachable every process silently fell back to
        # an inconsistent local mesh (hangs / wrong collectives).
        from fortran_davidson_tpu.parallel import multihost
        monkeypatch.setattr(multihost, "_initialized", False)
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")

        def boom(*a, **k):
            raise RuntimeError("coordinator unreachable")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="multi-process"):
            multihost.initialize()

    def test_hinted_but_already_initialized_is_benign(self, monkeypatch):
        # The standard pattern: the CALLER ran jax.distributed
        # .initialize() itself (SLURM/coordinator launch), then calls
        # the library's initialize(). The inner init raises "already
        # initialized" — with distributed state up, escalating would
        # break a perfectly healthy launch.
        from fortran_davidson_tpu.parallel import multihost
        monkeypatch.setattr(multihost, "_initialized", False)
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")

        def boom(*a, **k):
            raise RuntimeError("already initialized")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        monkeypatch.setattr(jax.distributed, "is_initialized",
                            lambda: True)
        mesh = multihost.initialize()
        assert mesh.devices.size >= 1

    def test_unhinted_failure_falls_through(self, monkeypatch):
        from fortran_davidson_tpu.parallel import multihost
        monkeypatch.setattr(multihost, "_initialized", False)
        for name in ("JAX_COORDINATOR_ADDRESS",
                     "MEGASCALE_COORDINATOR_ADDRESS",
                     "JAX_NUM_PROCESSES", "SLURM_NTASKS",
                     "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
            monkeypatch.delenv(name, raising=False)

        def boom(*a, **k):
            raise RuntimeError("backend already initialized")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        mesh = multihost.initialize()
        assert mesh.devices.size >= 1
