"""Cross-artifact check against the reference's real text fixture.

The reference ships a 100x100 dense matrix as whitespace text
(``/root/reference/src/tests/matrix.txt``, consumed by
``src/tests/test_dense_numpy.f90:16`` via ``test_utils.read_matrix``,
``src/tests/test_utils.f90:118-135``). This is the one reference data
artifact present in the mount, so it is the honest interchange test for
``utils.io.read_matrix``: load the actual file, solve with both methods,
and pin the lowest-k eigenvalues against hardcoded values AND an
in-process scipy oracle (SURVEY.md section 4 tier 2).

Skipped when the reference mount is absent (e.g. CI from a bare clone).
"""

import os

import numpy as np
import pytest

from fortran_davidson_tpu import eigensolve
from fortran_davidson_tpu.utils.io import read_matrix

REF_MATRIX = "/root/reference/src/tests/matrix.txt"

# scipy.linalg.eigh lowest-6 of the fixture (diag ~ 1..100, off-diag ~1e-4).
PINNED_LOWEST_6 = np.array([
    0.9999810486960571, 2.000015451839607, 2.9999777333778384,
    3.9999234478654784, 5.0000745107987346, 6.000049242377053,
])

pytestmark = pytest.mark.skipif(not os.path.exists(REF_MATRIX),
                                reason="reference fixture not mounted")


@pytest.fixture(scope="module")
def fixture_matrix():
    mtx = read_matrix(REF_MATRIX)
    assert mtx.shape == (100, 100)
    assert np.allclose(mtx, mtx.T)
    return mtx


def test_pinned_against_scipy(fixture_matrix):
    scipy_linalg = pytest.importorskip("scipy.linalg")
    w = scipy_linalg.eigh(fixture_matrix, eigvals_only=True)
    np.testing.assert_allclose(w[:6], PINNED_LOWEST_6, atol=1e-10)


@pytest.mark.parametrize("method", ["DPR", "GJD"])
def test_eigensolve_matches_fixture(fixture_matrix, method):
    res = eigensolve(fixture_matrix, 6, method=method, tolerance=1e-8,
                     max_iterations=60)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.eigenvalues),
                               PINNED_LOWEST_6, atol=1e-7)
    # Eigenpair equation on the returned vectors, reference-style
    # (src/tests/test_dense_properties.f90:21-48).
    V = np.asarray(res.eigenvectors)
    resid = fixture_matrix @ V - V * np.asarray(res.eigenvalues)[None, :]
    assert np.linalg.norm(resid, axis=0).max() < 1e-7
