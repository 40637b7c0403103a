"""Double-single operator applies (`matmat_ds`) and the polish floors.

Round-4 finding (10M-row lowest-20 north star): a plain f32 operator
apply floors ANY residual measurement at the elementwise rounding of
its own output — norm ~eps/2·‖A_off x‖, which is ~1.4e-8 at 10M rows,
right AT the 1e-8 convergence contract; the in-solve polish both
measured and iterated through that noise and fixed-pointed on unlucky
pairs. `LinearOperator.matmat_ds` (structural compensated apply, here
the surrogates' Dot2 low-rank gram) removes the floor. These tests pin:

- the DS apply against a float64 oracle OF THE SAME MATRIX (the f32
  trig factors promoted exactly — an f64-generated operator is a
  *different* matrix and its difference swamps the comparison);
- that the polish through the DS apply reaches oracle-true residuals
  orders below the f32-apply floor;
- option plumbing and validation of the new `polish_update` knob.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fortran_davidson_tpu import eigensolve
from fortran_davidson_tpu.core import refine
from fortran_davidson_tpu.models.generators import surrogate_hamiltonian
from fortran_davidson_tpu.ops.operators import MatrixFreeOperator
from fortran_davidson_tpu.utils.errors import InvalidOptionsError

N = 200_192


def _f64_offdiag_apply(U, w, X64):
    """f64 apply of the SAME off-diagonal matrix the f32 operator
    represents (factors promoted exactly)."""
    U64 = jnp.asarray(np.asarray(U, np.float64))
    w64 = jnp.asarray(np.asarray(w, np.float64))
    coeff = U64.T @ X64
    low = (U64 * w64[None, :]) @ coeff
    corr = jnp.sum((U64 * U64) * w64[None, :], axis=1)
    return low - corr[:, None] * X64


def _oracle_residuals(op32, lam, x_hi, x_lo, lam_lo=None):
    """True residual norms of the DS pairs against the f64 oracle of
    the f32-represented matrix.

    ``lam_lo``: the eigenvalues' low words (PolishResult.evals_lo) —
    without them the f32 rounding of λ alone (~eps/2·λ ≈ 6e-8·λ)
    dominates the oracle readout of an otherwise-exact pair.
    """
    diag, U, w = op32.offdiag().captured
    X64 = jnp.asarray(np.asarray(x_hi, np.float64)
                      + np.asarray(x_lo, np.float64))
    d64 = jnp.asarray(np.asarray(op32.diagonal(), np.float64))
    AX = _f64_offdiag_apply(U, w, X64) + d64[:, None] * X64
    lam64 = np.asarray(lam, np.float64)
    if lam_lo is not None:
        lam64 = lam64 + np.asarray(lam_lo, np.float64)
    R = np.asarray(AX) - np.asarray(X64) * lam64[None, :]
    return np.linalg.norm(R, axis=0) / np.linalg.norm(np.asarray(X64),
                                                      axis=0)


class TestMatmatDS:
    def test_matches_same_factor_f64_oracle(self):
        op = surrogate_hamiltonian(N, dtype=jnp.float32)
        off = op.offdiag()
        rng = np.random.default_rng(0)
        xh = jnp.asarray(rng.standard_normal((N, 4)), jnp.float32)
        xh = xh / jnp.linalg.norm(xh, axis=0)
        xl = jnp.asarray(rng.standard_normal((N, 4)) * 1e-8, jnp.float32)
        _, U, w = off.captured
        X64 = jnp.asarray(np.asarray(xh, np.float64)
                          + np.asarray(xl, np.float64))
        y64 = np.asarray(_f64_offdiag_apply(U, w, X64))

        yh, yl = off.matmat_ds(xh, xl)
        err_ds = np.linalg.norm(
            np.asarray(yh, np.float64) + np.asarray(yl, np.float64) - y64,
            axis=0)
        yf = np.asarray(off.matmat(xh), np.float64) \
            + np.asarray(off.matmat(xl), np.float64)
        err_f32 = np.linalg.norm(yf - y64, axis=0)
        # DS: ~eps²-grade; f32: eps/2·||y|| (~1e-8 at this n).
        assert err_ds.max() < 1e-10
        assert err_ds.max() < err_f32.max() / 100

    def test_base_operator_returns_none(self):
        op = MatrixFreeOperator(lambda X: X, 8, dtype=jnp.float32,
                                diag=jnp.ones(8, jnp.float32))
        assert op.matmat_ds(jnp.zeros((8, 1), jnp.float32),
                            jnp.zeros((8, 1), jnp.float32)) is None
        assert op.offdiag().matmat_ds(
            jnp.zeros((8, 1), jnp.float32),
            jnp.zeros((8, 1), jnp.float32)) is None


class TestPolishFloors:
    @pytest.fixture(scope="class")
    def solved(self):
        op = surrogate_hamiltonian(N, dtype=jnp.float32)
        res = eigensolve(op, 3, method="DPR", tolerance=1e-6,
                         relative_tolerance=True, dtype="float32",
                         refined=True, expansion="lowest-k",
                         max_iterations=60)
        return op, res

    def test_ds_apply_polish_beats_f32_floor(self, solved):
        op, res = solved
        off = op.offdiag()
        diag = op.diagonal().astype(jnp.float32)

        pol_ds = refine.polish(off, diag, res.eigenvalues,
                               res.eigenvectors, iterations=3)
        orc_ds = _oracle_residuals(op, pol_ds.evals, pol_ds.evecs_hi,
                                   pol_ds.evecs_lo, pol_ds.evals_lo)

        # Same polish with the structural DS apply stripped: the f32
        # apply's output rounding floors the ORACLE residual.
        off_f32 = MatrixFreeOperator(off.fn, N, dtype=off.dtype,
                                     diag=off.diag,
                                     captured=off.captured)
        pol_f32 = refine.polish(off_f32, diag, res.eigenvalues,
                                res.eigenvectors, iterations=3)
        orc_f32 = _oracle_residuals(op, pol_f32.evals, pol_f32.evecs_hi,
                                    pol_f32.evecs_lo, pol_f32.evals_lo)
        assert orc_ds.max() < 1e-10
        assert orc_ds.max() < orc_f32.max()

    def test_olsen_update_reaches_the_same_floor(self, solved):
        op, res = solved
        off = op.offdiag()
        diag = op.diagonal().astype(jnp.float32)
        pol = refine.polish(off, diag, res.eigenvalues,
                            res.eigenvectors, iterations=3,
                            update="olsen")
        orc = _oracle_residuals(op, pol.evals, pol.evecs_hi,
                                pol.evecs_lo, pol.evals_lo)
        assert orc.max() < 1e-10

    def test_unknown_update_raises(self, solved):
        op, res = solved
        with pytest.raises(ValueError):
            refine.polish(op.offdiag(), op.diagonal().astype(jnp.float32),
                          res.eigenvalues, res.eigenvectors,
                          update="bogus")


class TestOptionPlumbing:
    def test_polish_update_option(self):
        op = surrogate_hamiltonian(4096, dtype=jnp.float32)
        r = eigensolve(op, 2, method="DPR", tolerance=1e-8,
                       relative_tolerance=True, dtype="float32",
                       refined=True, final_polish=3,
                       polish_update="olsen", max_iterations=60)
        assert bool(r.converged)
        assert float(np.max(np.asarray(r.residual_norms))) < 1e-8

    def test_bogus_polish_update_raises(self):
        op = surrogate_hamiltonian(512, dtype=jnp.float32)
        with pytest.raises(InvalidOptionsError):
            eigensolve(op, 2, dtype="float32", refined=True,
                       final_polish=1, polish_update="bogus")
