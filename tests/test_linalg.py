"""lapack_wrapper-parity surface: small dense routines vs scipy/numpy.

Mirrors the reference's tier-2 cross-validation of its LAPACK wrappers
(``src/tests/test_lapack.py:30-67``), in-process (no subprocess/text-file
dance).
"""

import numpy as np
import pytest
import scipy.linalg

from fortran_davidson_tpu.models.generators import generate_diagonal_dominant
from fortran_davidson_tpu.utils import linalg as fla
from fortran_davidson_tpu.utils.errors import NumericalError


@pytest.fixture
def spd_pair(rng):
    H = np.asarray(generate_diagonal_dominant(24, 1e-2))
    S = np.asarray(generate_diagonal_dominant(24, 1e-3, diag_val=1.0))
    return H, S


class TestEigensolvers:
    def test_standard_matches_scipy(self, spd_pair):
        H, _ = spd_pair
        w, V = fla.generalized_eigensolver(H)
        np.testing.assert_allclose(np.asarray(w),
                                   scipy.linalg.eigh(H, eigvals_only=True),
                                   atol=1e-10)
        np.testing.assert_allclose(H @ np.asarray(V),
                                   np.asarray(V) * np.asarray(w), atol=1e-9)

    def test_generalized_matches_scipy(self, spd_pair):
        H, S = spd_pair
        w, V = fla.generalized_eigensolver(H, S)
        np.testing.assert_allclose(np.asarray(w),
                                   scipy.linalg.eigh(H, S, eigvals_only=True),
                                   atol=1e-10)
        # DSYGV contract: S-orthonormal eigenvectors.
        Vn = np.asarray(V)
        np.testing.assert_allclose(Vn.T @ S @ Vn, np.eye(24), atol=1e-9)

    def test_lowest_k(self, spd_pair):
        H, S = spd_pair
        w, V = fla.generalized_eigensolver_lowest(H, 4, S)
        assert w.shape == (4,) and V.shape == (24, 4)
        np.testing.assert_allclose(
            np.asarray(w), scipy.linalg.eigh(H, S, eigvals_only=True)[:4],
            atol=1e-10)


class TestQR:
    @pytest.mark.parametrize("method", ["cholqr2", "qr"])
    def test_orthonormal_and_spans(self, rng, method):
        X = rng.standard_normal((40, 7))
        Q = np.asarray(fla.qr_orthonormalize(X, method=method))
        np.testing.assert_allclose(Q.T @ Q, np.eye(7), atol=1e-12)
        # span(Q) == span(X): projection of X onto Q reproduces X.
        np.testing.assert_allclose(Q @ (Q.T @ X), X, atol=1e-10)


class TestSolveAndSort:
    def test_solve_symmetric(self, rng):
        A = rng.standard_normal((12, 12))
        A = A + A.T + 12 * np.eye(12)
        b = rng.standard_normal((12, 2))
        x = np.asarray(fla.solve_symmetric(A, b))
        np.testing.assert_allclose(A @ x, b, atol=1e-10)

    def test_solve_singular_retries_with_jitter(self):
        A = np.zeros((3, 3))  # exactly singular: direct solve -> inf/nan
        b = np.ones((3,))
        x = np.asarray(fla.solve_symmetric(A, b))
        assert np.all(np.isfinite(x))

    def test_sort_eigenpairs(self, rng):
        w = rng.standard_normal(9)
        V = rng.standard_normal((5, 9))
        ws, Vs = fla.sort_eigenpairs(w, V)
        order = np.argsort(w)
        np.testing.assert_array_equal(np.asarray(ws), w[order])
        np.testing.assert_array_equal(np.asarray(Vs), V[:, order])

    def test_check_finite_raises_with_name(self):
        with pytest.raises(NumericalError, match="my_routine"):
            fla.check_finite("my_routine", np.array([1.0, np.inf]))


class TestMultihost:
    def test_single_process_initialize(self):
        from fortran_davidson_tpu.parallel import multihost
        mesh = multihost.initialize()
        assert mesh.shape["rows"] >= 1
        assert multihost.is_coordinator()
