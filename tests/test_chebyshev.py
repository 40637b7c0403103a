"""Chebyshev-filtered restarts (ChASE-style, ``core.chebyshev``).

The reference discards unwanted-spectrum information at every collapse
(``src/davidson.f90:218``); the filter damps it instead. These tests pin
the bound estimator, the filter's spectral action, end-to-end
correctness, and the acceleration claim on a collapse-heavy problem.
"""

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.core.chebyshev import (chebyshev_filter,
                                                 lanczos_upper_bound)
from fortran_davidson_tpu.models.generators import \
    generate_diagonal_dominant


class TestLanczosUpperBound:
    @pytest.mark.parametrize("n", [50, 300])
    def test_bounds_spectrum(self, n):
        A = generate_diagonal_dominant(n, 1e-3)
        lam_max = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[-1]
        ub = float(lanczos_upper_bound(
            lambda X: jnp.asarray(A) @ X, n, jnp.float64))
        assert ub >= lam_max
        assert ub < 3.0 * lam_max  # not a uselessly loose bound


class TestChebyshevFilter:
    def test_amplifies_wanted_damps_unwanted(self):
        # Diagonal operator: the filter acts per eigenvalue; components
        # below the damping interval must grow relative to those inside.
        d = jnp.linspace(1.0, 100.0, 64, dtype=jnp.float64)
        apply_a = lambda X: d[:, None] * X
        X = jnp.ones((64, 1), jnp.float64)
        a, b, lo = 10.0, 101.0, 1.0
        Y = np.asarray(chebyshev_filter(apply_a, X, 8, a, b, lo))[:, 0]
        gain = np.abs(Y)  # per-eigenvalue |p(λ)|
        # Amplification is exponential in the distance below the cut;
        # compare the well-separated wanted region against the interval.
        wanted = gain[np.asarray(d) < a / 2]
        unwanted = gain[np.asarray(d) > a]
        assert wanted.min() > 25 * unwanted.max()
        # σ-scaling keeps everything O(1) at the wanted end.
        assert wanted.max() < 1e3

    def test_zero_columns_stay_zero(self):
        d = jnp.linspace(1.0, 50.0, 32, dtype=jnp.float64)
        apply_a = lambda X: d[:, None] * X
        X = jnp.zeros((32, 3), jnp.float64).at[:, 0].set(1.0)
        Y = np.asarray(chebyshev_filter(apply_a, X, 6, 5.0, 51.0, 1.0))
        assert np.all(Y[:, 1:] == 0)
        assert np.abs(Y[:, 0]).max() > 0


class TestFilteredRestarts:
    def _problem(self):
        # Weakly diagonal-dominant (coupling ~ diag spacing) + small
        # max_dim: DPR corrections are poor, collapses are frequent —
        # the regime where filtering pays. Measured: plain DPR takes 54
        # iterations here, cheb_degree=8 takes 21.
        import jax
        return generate_diagonal_dominant(400, 1.0,
                                          key=jax.random.PRNGKey(3))

    def test_matches_scipy(self):
        A = self._problem()
        res = fdt.eigensolve(A, 4, tolerance=1e-8, max_dim_sub=12,
                             init_dim=6, cheb_degree=6,
                             max_iterations=300)
        assert bool(res.converged)
        want = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:4]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), want,
                                   atol=1e-8)

    def test_accelerates_collapse_heavy_solve(self):
        A = self._problem()
        common = dict(tolerance=1e-8, max_dim_sub=12, init_dim=6,
                      max_iterations=300)
        plain = fdt.eigensolve(A, 4, **common)
        filt = fdt.eigensolve(A, 4, cheb_degree=8, **common)
        assert bool(plain.converged) and bool(filt.converged)
        # Measured 54 -> 21; assert a comfortable margin, not the pin.
        assert int(filt.iterations) < 0.7 * int(plain.iterations)

    def test_off_by_default_identical(self):
        # cheb_degree=0 must leave the reference schedule untouched
        # (iteration-count parity invariant).
        A = generate_diagonal_dominant(80, 1e-3)
        base = fdt.eigensolve(A, 3, tolerance=1e-8)
        zero = fdt.eigensolve(A, 3, tolerance=1e-8, cheb_degree=0)
        assert int(base.iterations) == int(zero.iterations)
        np.testing.assert_array_equal(np.asarray(base.eigenvalues),
                                      np.asarray(zero.eigenvalues))

    def test_generalized_raises(self):
        A = generate_diagonal_dominant(40, 1e-3)
        B = generate_diagonal_dominant(40, 1e-3, diag_val=1.0)
        with pytest.raises(fdt.utils.errors.InvalidOptionsError):
            fdt.eigensolve(A, 3, second_matrix=B, cheb_degree=6)

    def test_operator_column_accounting(self):
        A = self._problem()
        common = dict(tolerance=1e-8, max_dim_sub=12, init_dim=6,
                      max_iterations=300)
        plain = fdt.eigensolve(A, 4, **common)
        filt = fdt.eigensolve(A, 4, cheb_degree=6, **common)
        # Filtered collapses charge (degree + 1) * init_dim columns each;
        # the work metric must reflect them (not undercount).
        n_collapse = int(np.sum(np.diff(np.asarray(
            filt.subspace_dims)[:int(filt.iterations)]) < 0))
        assert int(filt.operator_columns) >= n_collapse * 7 * 6
        assert int(plain.operator_columns) > 0


class TestAutoDegree:
    def test_geometry_scaling(self):
        from fortran_davidson_tpu.core.chebyshev import auto_degree
        # Well-separated wanted extreme -> small degree; clustered -> cap.
        d_sep = int(auto_degree(1.0, 50.0, 100.0, jnp.float64))
        d_clu = int(auto_degree(49.9, 50.0, 100.0, jnp.float64))
        assert 2 <= d_sep < d_clu
        assert d_clu == 12  # cap
        # Degenerate interval must not blow up.
        d_deg = int(auto_degree(1.0, 50.0, 50.0, jnp.float64))
        assert 2 <= d_deg <= 12

    def test_auto_solve_matches_scipy_and_accelerates(self):
        import jax
        A = generate_diagonal_dominant(400, 1.0, key=jax.random.PRNGKey(3))
        common = dict(tolerance=1e-8, max_dim_sub=12, init_dim=6,
                      max_iterations=300)
        plain = fdt.eigensolve(A, 4, **common)
        auto = fdt.eigensolve(A, 4, cheb_degree="auto", **common)
        assert bool(auto.converged)
        want = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:4]
        np.testing.assert_allclose(np.asarray(auto.eigenvalues), want,
                                   atol=1e-8)
        assert int(auto.iterations) < 0.8 * int(plain.iterations)

    def test_auto_generalized_raises(self):
        A = generate_diagonal_dominant(40, 1e-3)
        B = generate_diagonal_dominant(40, 1e-3, diag_val=1.0)
        with pytest.raises(fdt.utils.errors.InvalidOptionsError):
            fdt.eigensolve(A, 3, second_matrix=B, cheb_degree="auto")

    def test_bogus_string_raises(self):
        with pytest.raises(fdt.utils.errors.InvalidOptionsError):
            fdt.DavidsonOptions(cheb_degree="fast")
