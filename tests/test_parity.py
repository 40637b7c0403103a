"""Convergence parity vs. a clean-room numpy oracle of the reference
semantics (see reference_oracle.py). BASELINE.md requires eigenvalues AND
iteration counts to match the reference within its 1e-8 tolerance on
diagonal-dominant test matrices."""

import jax
import numpy as np
import pytest

from fortran_davidson_tpu import eigensolve
from fortran_davidson_tpu.models.generators import generate_diagonal_dominant
from tests.reference_oracle import davidson_oracle


CASES = [
    # (n, k, method, max_dim, generalized, tol)
    (50, 3, "DPR", None, False, 1e-8),
    (50, 3, "GJD", None, False, 1e-8),
    (50, 3, "DPR", 10, True, 1e-8),
    (50, 3, "GJD", 10, True, 1e-8),
    (100, 3, "DPR", 10, True, 1e-5),
    (80, 2, "DPR", 8, False, 1e-8),   # forces repeated collapses
]


@pytest.mark.parametrize("n,k,method,max_dim,gen,tol", CASES)
def test_iteration_count_parity(n, k, method, max_dim, gen, tol):
    A = generate_diagonal_dominant(n, 1e-3, key=jax.random.PRNGKey(n + k))
    B = None
    if gen:
        B = generate_diagonal_dominant(n, 1e-3, diag_val=1.0,
                                       key=jax.random.PRNGKey(n + k + 1))
    res = eigensolve(A, k, second_matrix=B, method=method, tolerance=tol,
                     max_dim_sub=max_dim, max_iterations=500)
    w_ref, _, iters_ref, conv_ref = davidson_oracle(
        np.asarray(A), k, method=method, max_iterations=500, tol=tol,
        max_dim=max_dim, B=None if B is None else np.asarray(B))
    assert conv_ref and bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), w_ref, atol=tol)
    # Iteration counts match the reference schedule (exact-arithmetic span
    # parity; roundoff can shift convergence by at most one iteration on
    # borderline residuals).
    assert abs(int(res.iterations) - iters_ref) <= 1, (
        f"iterations {int(res.iterations)} vs oracle {iters_ref}")
