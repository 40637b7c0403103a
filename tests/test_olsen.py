"""Olsen correction + projected (warm-start) GJD preconditioner.

Beyond the reference (its only schemes are DPR and unpreconditioned
dense-DSYSV GJD, ``src/davidson.f90:673-734``): the Olsen skew
projection keeps corrections orthogonal to the Ritz vector — the
standard fix for DPR's stagnation on strongly diagonal-dominant
operators — and its single-step form warm-starts the GJD inner MINRES.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.core import correction
from fortran_davidson_tpu.models.generators import (bse_surrogate,
                                                    generate_diagonal_dominant)


class TestOlsenMethod:
    @pytest.mark.parametrize("gen", [False, True])
    def test_matches_scipy(self, gen):
        A = generate_diagonal_dominant(80, 1e-3)
        B = generate_diagonal_dominant(80, 1e-3, diag_val=1.0) if gen \
            else None
        res = fdt.eigensolve(A, 3, second_matrix=B, method="OLSEN",
                             tolerance=1e-9)
        assert bool(res.converged)
        expected = scipy.linalg.eigh(
            np.asarray(A), None if B is None else np.asarray(B),
            eigvals_only=True)[:3]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), expected,
                                   atol=1e-8)

    def test_correction_is_orthogonal_to_ritz(self, rng):
        n, m = 64, 4
        X, _ = np.linalg.qr(rng.standard_normal((n, m)))
        X = jnp.asarray(X)
        R = jnp.asarray(rng.standard_normal((n, m)) * 1e-2)
        diag = jnp.arange(1.0, n + 1)
        mask = jnp.ones((m,))
        # Away from diagonal collisions: orthogonality at roundoff.
        lam = jnp.asarray([1.5, 2.5, 3.5, 4.5])
        t = correction.olsen_correction(R, lam, X, diag, jnp.ones((n,)),
                                        mask)
        overlaps = np.asarray(jnp.sum(X * t, axis=0))
        np.testing.assert_allclose(overlaps, 0.0, atol=1e-13)

    def test_beats_dpr_on_stagnating_problem(self):
        # λ_1 coincides with a diagonal entry (diag 1..n, eigenvector
        # concentrated at entry 0): DPR's K⁻¹r collapses onto x there.
        A = bse_surrogate(300, coupling=5e-3)
        kwargs = dict(tolerance=1e-9, max_iterations=80, max_dim_sub=24)
        dpr = fdt.eigensolve(A, 4, method="DPR", **kwargs)
        ols = fdt.eigensolve(A, 4, method="OLSEN", **kwargs)
        assert bool(ols.converged)
        expected = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:4]
        np.testing.assert_allclose(np.asarray(ols.eigenvalues), expected,
                                   atol=1e-8)
        # Olsen must never be slower; on clustered spectra it converges
        # in at most the DPR iteration count.
        assert int(ols.iterations) <= int(dpr.iterations)


class TestOlsenGJDWarmStart:
    def _ritz_data(self, A64, k):
        w, V = np.linalg.eigh(A64)
        # Perturbed Ritz data: a realistic mid-solve state.
        rng = np.random.default_rng(1)
        X = V[:, :k] + 1e-3 * rng.standard_normal((A64.shape[0], k))
        X /= np.linalg.norm(X, axis=0)
        lam = np.sum(X * (A64 @ X), axis=0)
        R = A64 @ X - X * lam[None, :]
        return (jnp.asarray(lam), jnp.asarray(X), jnp.asarray(R))

    def test_warm_start_cuts_inner_iterations(self):
        A = generate_diagonal_dominant(200, 1e-2)
        A64 = np.asarray(A)
        lam, X, R = self._ritz_data(A64, 3)
        mask = jnp.ones((3,))
        diag = jnp.asarray(np.diag(A64))

        # Unscaled projected operator (reference semantics; the
        # gjd_preconditioner="olsen" configuration): warm start vs cold.
        common = dict(mask=mask, inner_iters=400, inner_tol=1e-6,
                      diag_a=diag, scale=False, return_inner_iters=True)
        t_cold, it_cold = correction.gjd_correction(
            lambda T: jnp.asarray(A64) @ T, None, lam, X, R,
            olsen_start=False, **common)
        t_warm, it_warm = correction.gjd_correction(
            lambda T: jnp.asarray(A64) @ T, None, lam, X, R,
            olsen_start=True, **common)

        # Both satisfy the projected correction equation to the target
        # (the equation is near-singular along the approximate
        # eigenvector, so the SOLUTIONS may differ by a free near-null
        # component — the residual is the well-posed comparison).
        X64 = np.asarray(X)

        def proj_op(T):
            Tp = T - X64 * np.sum(X64 * T, axis=0)[None, :]
            S = A64 @ Tp - Tp * np.asarray(lam)[None, :]
            return S - X64 * np.sum(X64 * S, axis=0)[None, :]

        R64 = np.asarray(R)
        target = 1e-5 * np.linalg.norm(R64, axis=0)
        for t in (t_cold, t_warm):
            resid = np.linalg.norm(proj_op(np.asarray(t)) + R64, axis=0)
            assert (resid < target).all(), resid
        # The warm start reaches the same absolute target in fewer inner
        # iterations (the whole point of the projected preconditioner).
        assert int(it_warm) < int(it_cold), (int(it_warm), int(it_cold))

    def test_gjd_olsen_outer_parity(self):
        # The preconditioner must not change WHAT is solved: same
        # eigenvalues and iteration count as unpreconditioned GJD at a
        # tight inner tolerance.
        A = generate_diagonal_dominant(60, 1e-3)
        kwargs = dict(method="GJD", tolerance=1e-9, gjd_inner_tol=1e-12)
        ref = fdt.eigensolve(A, 3, gjd_preconditioner="none", **kwargs)
        got = fdt.eigensolve(A, 3, gjd_preconditioner="olsen", **kwargs)
        assert bool(got.converged)
        assert int(got.iterations) == int(ref.iterations)
        np.testing.assert_allclose(np.asarray(got.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-9)
