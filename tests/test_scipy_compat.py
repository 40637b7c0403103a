"""scipy.sparse.linalg-compatible `eigsh` shim.

The reference's own cross-validation harness compares against scipy
(``src/tests/test_davidson.py:15-51``); this surface lets a scipy
workflow switch call-compatibly.
"""

import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

from fortran_davidson_tpu.models.generators import (
    generate_diagonal_dominant)
from fortran_davidson_tpu.scipy_compat import ArpackNoConvergence, eigsh
from fortran_davidson_tpu.utils.errors import InvalidOptionsError


@pytest.fixture
def A():
    return np.asarray(generate_diagonal_dominant(120, 1e-3))


class TestEigsh:
    def test_matches_scipy_sa(self, A):
        w, v = eigsh(A, k=4, which="SA", tol=1e-9)
        ws, vs = scipy.sparse.linalg.eigsh(A, k=4, which="SA")
        np.testing.assert_allclose(w, ws, atol=1e-8)
        # Eigenvectors up to sign.
        for j in range(4):
            overlap = abs(float(v[:, j] @ vs[:, j]))
            assert overlap > 1.0 - 1e-8
        # Residuals.
        r = np.linalg.norm(A @ v - v * w[None, :], axis=0)
        assert np.all(r < 1e-8)

    def test_largest_algebraic(self, A):
        w, v = eigsh(A, k=3, which="LA", tol=1e-9)
        ws = scipy.sparse.linalg.eigsh(A, k=3, which="LA")[0]
        np.testing.assert_allclose(w, np.sort(ws), atol=1e-7)
        assert w[0] < w[-1]  # ascending, scipy order
        r = np.linalg.norm(A @ v - v * w[None, :], axis=0)
        assert np.all(r < 1e-7)

    def test_generalized(self, A):
        B = np.asarray(generate_diagonal_dominant(120, 1e-3,
                                                  diag_val=1.0))
        w, v = eigsh(A, k=3, M=B, tol=1e-9)
        ws = scipy.linalg.eigh(A, B, eigvals_only=True)[:3]
        np.testing.assert_allclose(w, ws, atol=1e-8)

    def test_scipy_sparse_input(self, A):
        As = scipy.sparse.csr_matrix(A)
        w = eigsh(As, k=2, tol=1e-9, return_eigenvectors=False)
        ws = np.linalg.eigvalsh(A)[:2]
        np.testing.assert_allclose(w, ws, atol=1e-8)

    def test_v0_warm_start(self, A):
        w0, v0 = eigsh(A, k=2, tol=1e-9)
        w, v = eigsh(A, k=2, tol=1e-9, v0=v0)
        np.testing.assert_allclose(w, w0, atol=1e-9)

    def test_ncv_and_overrides(self, A):
        w, _ = eigsh(A, k=2, ncv=12, maxiter=200, method="GJD", tol=1e-9)
        np.testing.assert_allclose(w, np.linalg.eigvalsh(A)[:2],
                                   atol=1e-8)

    def test_sigma_interior_fold_matches_scipy(self, A):
        # Eigenvalues nearest an interior shift via the spectral fold
        # (A - σ)² — scipy's shift-invert is the oracle.
        sig = float(np.median(np.linalg.eigvalsh(A)))
        w, v = eigsh(A, k=3, sigma=sig, tol=1e-9)
        ws = scipy.sparse.linalg.eigsh(A, k=3, sigma=sig)[0]
        np.testing.assert_allclose(w, np.sort(ws), atol=1e-7)
        r = np.linalg.norm(A @ v - v * w[None, :], axis=0)
        assert np.all(r < 1e-8)

    def test_sigma_requires_lm(self, A):
        with pytest.raises(InvalidOptionsError, match="'LM'"):
            eigsh(A, k=2, sigma=0.5, which="SA")

    def test_sigma_generalized_raises(self, A):
        B = np.asarray(generate_diagonal_dominant(120, 1e-3,
                                                  diag_val=1.0))
        with pytest.raises(InvalidOptionsError, match="standard"):
            eigsh(A, k=2, M=B, sigma=0.5)

    def test_which_sm_fold_at_zero(self, A):
        # Shift the spectrum to straddle zero so SM is a genuine
        # interior target, then check against the full dense solve.
        As = A - np.median(np.linalg.eigvalsh(A)) * np.eye(A.shape[0])
        w, v = eigsh(As, k=3, which="SM", tol=1e-9)
        full = np.linalg.eigvalsh(As)
        expect = np.sort(full[np.argsort(np.abs(full))[:3]])
        np.testing.assert_allclose(w, expect, atol=1e-7)
        r = np.linalg.norm(As @ v - v * w[None, :], axis=0)
        assert np.all(r < 1e-8)

    def test_which_lm_merges_spectrum_ends(self, A):
        w, v = eigsh(A, k=4, which="LM", tol=1e-9)
        ws = scipy.sparse.linalg.eigsh(A, k=4, which="LM")[0]
        np.testing.assert_allclose(w, np.sort(ws), atol=1e-7)
        r = np.linalg.norm(A @ v - v * w[None, :], axis=0)
        assert np.all(r < 1e-8)

    def test_which_lm_generalized_pencil(self, A):
        # Round-5 review fix: the LM two-end merge must solve the
        # PENCIL (A, M) — it previously dropped M silently.
        B = np.asarray(generate_diagonal_dominant(120, 1e-3,
                                                  diag_val=1.0))
        w, v = eigsh(A, k=3, M=B, which="LM", tol=1e-9)
        full = scipy.linalg.eigh(A, B, eigvals_only=True)
        expect = np.sort(full[np.argsort(-np.abs(full))[:3]])
        np.testing.assert_allclose(w, expect, rtol=1e-8, atol=1e-8)
        r = np.linalg.norm(A @ v - (B @ v) * w[None, :], axis=0)
        assert np.all(r < 1e-7)

    def test_which_lm_negative_end(self):
        # A spectrum straddling zero where the k largest |λ| come from
        # BOTH ends.
        d = np.concatenate([[-9.0, -8.5], np.linspace(-1, 1, 56),
                            [7.0, 8.0, 9.5]])
        rng = np.random.default_rng(5)
        Q = np.linalg.qr(rng.standard_normal((d.size, d.size)))[0]
        A = Q @ np.diag(d) @ Q.T
        w = eigsh(A, k=4, which="LM", tol=1e-9,
                  return_eigenvectors=False)
        np.testing.assert_allclose(sorted(np.abs(w)),
                                   [8.0, 8.5, 9.0, 9.5], atol=1e-7)

    def test_no_convergence_raises_with_partials(self, A):
        with pytest.raises(ArpackNoConvergence) as exc:
            eigsh(A, k=3, maxiter=1, tol=1e-14)
        e = exc.value
        assert e.result is not None
        assert e.eigenvalues.shape[0] == e.eigenvectors.shape[1]


class TestWhichBE:
    def test_both_ends_matches_scipy(self):
        A = np.asarray(generate_diagonal_dominant(120, 1e-3))
        w, v = eigsh(A, k=5, which="BE", tol=1e-9)
        ws = scipy.sparse.linalg.eigsh(A, k=5, which="BE")[0]
        np.testing.assert_allclose(w, np.sort(ws), atol=1e-7)
        r = np.linalg.norm(A @ v - v * w[None, :], axis=0)
        assert np.all(r < 1e-8)

    def test_both_ends_generalized(self):
        A = np.asarray(generate_diagonal_dominant(100, 1e-3))
        B = np.asarray(generate_diagonal_dominant(100, 1e-3,
                                                  diag_val=1.0))
        w, v = eigsh(A, k=4, M=B, which="BE", tol=1e-9)
        full = scipy.linalg.eigh(A, B, eigvals_only=True)
        expect = np.sort(np.concatenate([full[:2], full[-2:]]))
        np.testing.assert_allclose(w, expect, rtol=1e-8, atol=1e-8)
