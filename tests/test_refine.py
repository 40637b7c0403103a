"""Refined-precision residuals/Rayleigh quotients/polish vs f64 oracle.

Scale chosen so the naive f32 path demonstrably floors (sqrt(n)*eps ~
2e-5 at n=65k) while f64 scipy.sparse can still provide ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

from fortran_davidson_tpu.core import refine
from fortran_davidson_tpu.ops.sparse import (ELLOperator,
                                             generate_local_sparse)

N = 65536
K = 3


@pytest.fixture(scope="module")
def problem():
    rows, cols, vals = generate_local_sparse(N, 8, locality=16.0, seed=42)
    # Round the operator itself to f32 so "truth" is the f32-stored
    # operator evaluated in f64 — isolating arithmetic error from
    # storage error.
    vals32 = vals.astype(np.float32)
    op = ELLOperator.from_coo(rows, cols, vals32, N, dtype=jnp.float32)
    A64 = scipy.sparse.coo_matrix(
        (vals32.astype(np.float64), (rows, cols)), shape=(N, N)).tocsr()
    # Shift-invert at 0: orders of magnitude faster than which="SA" for
    # the wide spectrum (diag ~ 1..n).
    w, V = scipy.sparse.linalg.eigsh(A64.tocsc(), k=K, sigma=0.0,
                                     which="LM", tol=1e-12)
    return op, A64, w, V


def test_refined_pairs_match_f64_truth(problem):
    op, A64, w, V = problem
    X32 = jnp.asarray(V.astype(np.float32))
    # f64 truth of the f32-ROUNDED vectors: Rayleigh quotient + residual.
    X64 = np.asarray(X32, np.float64)
    nrm = np.linalg.norm(X64, axis=0)
    lam64 = np.sum(X64 * (A64 @ X64), axis=0) / nrm**2
    R64 = A64 @ X64 - X64 * lam64[None, :]
    err64 = np.linalg.norm(R64, axis=0)

    got = refine.refined_pairs(op.offdiag(), op.diagonal(), X32)
    # Refined eigenvalues agree with the f64 Rayleigh quotient far below
    # f32 eigh precision (~eps*|λ| would be ~6e-8*λ; we ask for 30x that
    # headroom over the naive sqrt(n)-floor).
    np.testing.assert_allclose(np.asarray(got.evals, np.float64), lam64,
                               rtol=3e-7, atol=1e-9)
    # The refined measurement's documented floor is the f32 rounding of
    # the off-diagonal apply and the final (canceling) add:
    # ~sqrt(n)*eps*||E x||_elem. For this op that is ~1e-7; the naive
    # f32 path floors ~3 orders higher (sqrt(n)*eps*λ).
    errs = np.asarray(got.errors, np.float64)
    assert (errs >= err64 - 1e-9).all()     # never under-reports
    assert errs.max() < 5e-7                # resolves to the E-floor

    AX = np.asarray(op.matmat(X32), np.float64)
    naive = np.linalg.norm(AX - X64 * np.asarray(got.evals)[None, :],
                           axis=0)
    assert naive.max() > 30 * errs.max()


def test_polish_reaches_sub_f32_residuals(problem):
    op, A64, w, V = problem
    X32 = jnp.asarray(V.astype(np.float32))
    res = refine.polish(op.offdiag(), op.diagonal(),
                        jnp.asarray(w.astype(np.float32)), X32,
                        iterations=4)
    x64 = (np.asarray(res.evecs_hi, np.float64)
           + np.asarray(res.evecs_lo, np.float64))
    lam = np.sum(x64 * (A64 @ x64), axis=0) / np.sum(x64 * x64, axis=0)
    R = A64 @ x64 - x64 * lam[None, :]
    err = np.linalg.norm(R, axis=0)
    # f32 STORAGE floors the residual at ~eps*λ ~ 1e-7*λ here; the DS
    # polish must land well below that floor.
    assert err.max() < 2e-9 * max(np.abs(lam).max(), 1.0)
    np.testing.assert_allclose(lam, w, rtol=1e-10, atol=1e-10)
    # Reported errors never under-report and sit at/below the refined
    # measurement floor (~sqrt(n)*eps*||E x||).
    errs = np.asarray(res.errors, np.float64)
    assert (errs >= err - 1e-9).all()
    assert errs.max() < 5e-7


def test_refined_solve_beats_f32_floor(problem):
    """eigensolve(refined=True) at f32 converges to ABSOLUTE tolerances
    in the reference's real64 regime (1e-8 — four orders below the naive
    f32 measurement floor sqrt(n)*eps*λ ~ 1e-5 at n=65k): compensated
    residual measurement feeds the corrections, and the DS Ritz
    refinement removes the f32-eigh floor (~eps*||H||)."""
    import fortran_davidson_tpu as fdt
    op, A64, w, V = problem
    res = fdt.eigensolve(op, K, dtype="float32", refined=True,
                         tolerance=1e-8, max_iterations=60,
                         expansion="lowest-k")
    assert bool(res.converged), np.asarray(res.residual_history)
    np.testing.assert_allclose(np.asarray(res.eigenvalues, np.float64), w,
                               rtol=3e-7, atol=3e-7)
    # Residuals are TRUE residuals: verify against f64 on the returned
    # vectors at their OPTIMAL (f64 Rayleigh) eigenvalue — the reported
    # f32 eigenvalue's own representation rounding (~3e-8*λ) would
    # otherwise dominate the verification.
    X64 = np.asarray(res.eigenvectors, np.float64)
    nrm2 = np.sum(X64 * X64, axis=0)
    lam64 = np.sum(X64 * (A64 @ X64), axis=0) / nrm2
    R64 = A64 @ X64 - X64 * lam64[None, :]
    err64 = np.linalg.norm(R64, axis=0) / np.sqrt(nrm2)
    assert err64.max() < 1e-8
    # The reported measurement never under-reports by more than its own
    # ~eps*|E x| elementwise-rounding floor.
    np.testing.assert_allclose(np.asarray(res.residual_norms, np.float64),
                               err64, rtol=0.5, atol=3e-9)


def test_polish_generalized(problem):
    op, A64, w, V = problem
    # Simple well-conditioned pencil: B = diag(1 + small variation).
    rng = np.random.default_rng(0)
    db = (1.0 + 0.1 * rng.random(N)).astype(np.float32)
    B64 = scipy.sparse.diags(db.astype(np.float64))
    wg, Vg = scipy.sparse.linalg.eigsh(A64, k=K, M=B64.tocsc(),
                                       which="SA", tol=1e-12)
    from fortran_davidson_tpu.ops.operators import DiagonalOperator
    Bop = DiagonalOperator(jnp.asarray(db))
    X32 = jnp.asarray(Vg.astype(np.float32))
    res = refine.polish(op.offdiag(), op.diagonal(),
                        jnp.asarray(wg.astype(np.float32)), X32,
                        iterations=4, B_off=Bop.offdiag(),
                        diag_b=Bop.diagonal())
    x64 = (np.asarray(res.evecs_hi, np.float64)
           + np.asarray(res.evecs_lo, np.float64))
    lam = (np.sum(x64 * (A64 @ x64), axis=0)
           / np.sum(x64 * (B64 @ x64), axis=0))
    R = A64 @ x64 - (B64 @ x64) * lam[None, :]
    err = np.linalg.norm(R, axis=0)
    assert err.max() < 5e-9 * max(np.abs(lam).max(), 1.0)
    np.testing.assert_allclose(lam, wg, rtol=1e-9, atol=1e-9)


def test_trial_polish_certification_exit():
    """Round 5: once the refined loop's fine no-progress window reaches
    _POLISH_POLL_AT, the in-body polish certifies against the user's
    tolerance and the loop exits through the stall path — far earlier
    than the 10-iteration noise window. The final polish then re-runs
    the same computation as the binding convergence check, so the
    result is converged=True with honest true residuals."""
    import fortran_davidson_tpu as fdt
    from fortran_davidson_tpu.models.generators import surrogate_hamiltonian

    n = 100_096
    op = surrogate_hamiltonian(n, dtype=jnp.float32)
    # Absolute 1e-9: BELOW the refined loop's f32-basis floor at this
    # scale (the loop plateaus without converging) but well above the
    # DS polish's reach (~2e-10) — the certified-stall regime.
    kw = dict(method="DPR", tolerance=1e-9, relative_tolerance=False,
              dtype="float32", expansion="lowest-k", refined=True,
              final_polish=3, max_iterations=80)
    res = fdt.eigensolve(op, 4, **kw)
    assert bool(res.converged)
    assert float(np.max(np.asarray(res.residual_norms))) < 1e-9
    # Convergence at this tolerance can only come from a certified
    # stall exit (the loop's own check never passes 1e-9 absolute at
    # this scale), well before the iteration cap.
    assert bool(res.stalled)
    assert int(res.iterations) < kw["max_iterations"]
