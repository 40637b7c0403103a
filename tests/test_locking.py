"""Locking/deflation of converged eigenpairs.

Converged pairs keep their Ritz vectors in the basis (identical reported
eigenvalues) but stop spending correction columns; the
``operator_columns`` counter (live columns the operator was applied to)
must drop measurably for problems whose pairs converge at spread-out
iterations. The reference has only sticky convergence FLAGS
(``src/davidson.f90:173-178``) — it still corrects every pair every
iteration; locking goes beyond it, so it is off by default and the
parity pins elsewhere run without it.
"""

import numpy as np
import pytest
import scipy.linalg

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.models.generators import bse_surrogate


@pytest.fixture(scope="module")
def spread_problem():
    # BSE-style clustered spectrum: pairs converge at spread-out
    # iterations (the regression fixture takes ~10 DPR iterations at
    # 1e-4; at 1e-9 the spread between first and last pair is wide) —
    # exactly the regime deflation pays off in.
    return bse_surrogate(400, coupling=2e-3)


@pytest.mark.parametrize("method", ["DPR", "GJD"])
def test_locking_same_eigenvalues_fewer_columns(spread_problem, method):
    A = spread_problem
    k = 6
    kwargs = dict(method=method, tolerance=1e-9, expansion="lowest-k",
                  max_dim_sub=40, max_iterations=60)
    base = fdt.eigensolve(A, k, locking=False, **kwargs)
    lock = fdt.eigensolve(A, k, locking=True, **kwargs)
    assert bool(base.converged) and bool(lock.converged)
    expected = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:k]
    np.testing.assert_allclose(np.asarray(base.eigenvalues), expected,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(lock.eigenvalues), expected,
                               atol=1e-8)
    # The deflated run must do measurably less operator work.
    assert int(lock.operator_columns) < int(base.operator_columns), (
        int(lock.operator_columns), int(base.operator_columns))


def test_locking_does_not_stall(spread_problem):
    # All pairs must still converge when early pairs lock long before
    # the last one (regression against freezing the wrong columns).
    A = spread_problem
    res = fdt.eigensolve(A, 8, locking=True, tolerance=1e-10,
                         expansion="lowest-k", max_dim_sub=48,
                         max_iterations=80)
    assert bool(res.converged)
    expected = scipy.linalg.eigh(np.asarray(A), eigvals_only=True)[:8]
    np.testing.assert_allclose(np.asarray(res.eigenvalues), expected,
                               atol=1e-9)


def test_operator_columns_reported_without_locking(spread_problem):
    res = fdt.eigensolve(spread_problem, 3, tolerance=1e-8)
    # doubling schedule: init_dim + sum of expansion block sizes.
    assert int(res.operator_columns) >= 6
