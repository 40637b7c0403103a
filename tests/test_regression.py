"""Pinned-eigenvalue convergence regression (BSE-style fixture).

Mirrors the reference's de-facto convergence-behavior test
(``src/tests/test_reorder.f90:17-34``): an 864x864 electronic-structure
matrix solved for the lowest 6 with DPR at tol 1e-4, <= 50 iterations,
subspace 18, checked against hardcoded expected eigenvalues. The
reference's real BSE blob is missing from the mount
(``.MISSING_LARGE_BLOBS``), so the fixture is the deterministic
:func:`~fortran_davidson_tpu.models.generators.bse_surrogate`; the pinned
values below were computed with ``scipy.linalg.eigh`` on that fixture and
double-checked against this solver at commit time.
"""

import numpy as np
import pytest

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.models.generators import bse_surrogate

# scipy.linalg.eigh(bse_surrogate())[:6] — regenerate only if the fixture
# definition changes.
PINNED_EIGENVALUES = np.array([
    0.29955053, 0.29965599, 0.29985600, 0.30022568, 0.30032377, 0.30064347,
])
# Convergence-behavior pins (iteration counts at the reference's settings).
PINNED_ITERS = {"DPR": 10, "GJD": 4}


@pytest.fixture(scope="module")
def bse():
    return bse_surrogate()


@pytest.mark.parametrize("method", ["DPR", "GJD"])
def test_bse_regression(bse, method):
    res = fdt.eigensolve(bse, 6, method=method, tolerance=1e-4,
                         max_iterations=50, max_dim_sub=18)
    res.block_until_ready()
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.eigenvalues),
                               PINNED_EIGENVALUES, atol=5e-6)
    # Iteration-count stability: the exact count is pinned; a regression
    # in orthogonalization/projection details shows up here first.
    assert int(res.iterations) == PINNED_ITERS[method]


def test_bse_tight_tolerance_matches_scipy(bse):
    import scipy.linalg

    res = fdt.eigensolve(bse, 6, method="DPR", tolerance=1e-9,
                         max_iterations=200, max_dim_sub=24)
    res.block_until_ready()
    assert bool(res.converged)
    expected = scipy.linalg.eigh(np.asarray(bse), eigvals_only=True)[:6]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), expected,
                               atol=1e-9)
