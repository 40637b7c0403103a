"""scipy.sparse.linalg-compatible entry point.

The reference's users cross-validate against scipy
(``src/tests/test_davidson.py:15-51`` drives ``scipy.linalg.eigh``);
users migrating a scipy workflow get the same call shape here:

    from fortran_davidson_tpu.scipy_compat import eigsh
    w, v = eigsh(A, k=6, which="SA", tol=1e-8)

Supported: symmetric/Hermitian-real operators (dense arrays,
``scipy.sparse`` matrices, any :class:`LinearOperator` of this package),
generalized pencils via ``M``, ``which in ("SA", "LA")`` (largest via
the spectral flip -A), ``v0`` warm starts, ``maxiter``/``tol``/``ncv``.
Shift-invert (``sigma``) is not implemented — Davidson targets edge
eigenpairs without factorizations; pass a preconditioned GJD solve
through :func:`fortran_davidson_tpu.eigensolve` instead.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

import jax

from fortran_davidson_tpu.ops.operators import LinearOperator, as_operator
from fortran_davidson_tpu.solver import eigensolve
from fortran_davidson_tpu.utils.errors import (InvalidOptionsError,
                                               OperatorError, require)


@jax.tree_util.register_pytree_node_class
class _Negated(LinearOperator):
    """-A as an operator (spectral flip for which='LA')."""

    def __init__(self, op: LinearOperator):
        self._op = op

    @property
    def shape(self):
        return self._op.shape

    @property
    def dtype(self):
        return self._op.dtype

    def matmat(self, block):
        return -self._op.matmat(block)

    def diagonal(self):
        return -self._op.diagonal()

    def offdiag(self):
        return _Negated(self._op.offdiag())

    def tree_flatten(self):
        return (self._op,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def eigsh(A, k: int = 6, M=None, sigma=None, which: str = "SA",
          v0=None, ncv: Optional[int] = None, maxiter: Optional[int] = None,
          tol: float = 0.0, return_eigenvectors: bool = True,
          dtype=None, **overrides):
    """Lowest/largest-k symmetric eigenpairs, scipy-call-shaped.

    Args mirror ``scipy.sparse.linalg.eigsh`` where the semantics map
    onto block Davidson:

      A, M: operator and optional pencil B — anything
        :func:`as_operator` accepts (dense, ``scipy.sparse``, this
        package's operators, callables are NOT guessed — wrap those in
        :class:`MatrixFreeOperator`).
      k: number of eigenpairs.
      which: "SA" (smallest algebraic — the Davidson native target) or
        "LA" (largest algebraic, solved as the smallest of -A; with a
        pencil the flip is applied to A only, which preserves the
        generalized eigenvectors and negates the eigenvalues).
      v0: (n,) or (n, j) warm-start vector(s).
      ncv: maximum working-subspace dimension (``max_dim_sub``).
      maxiter: outer-iteration cap (default: the solver's 1000).
      tol: convergence tolerance; scipy's 0 sentinel maps to 1e-8
        (the reference default) rather than machine precision.
      return_eigenvectors: scipy contract — (w, v) or w alone.
      **overrides: any :class:`DavidsonOptions` field (method="GJD",
        refined=True, ...).

    Returns eigenvalues ascending (scipy's eigsh order) and, when
    requested, the corresponding eigenvectors.
    """
    require(sigma is None, InvalidOptionsError,
            "sigma (shift-invert) is not implemented: Davidson targets "
            "edge eigenpairs without factorizations — use "
            "eigensolve(..., method='GJD', gjd_preconditioner='dpr') "
            "for interior-hardened solves")
    require(which in ("SA", "LA"), InvalidOptionsError,
            f"which={which!r} not supported (use 'SA' or 'LA'; 'SM'/'LM' "
            "magnitude targets need shift-invert)")
    op = as_operator(A, dtype=dtype)
    B = None if M is None else as_operator(M, dtype=dtype)
    flip = which == "LA"
    if flip:
        op = _Negated(op)

    kw = dict(overrides)
    if ncv is not None:
        kw.setdefault("max_dim_sub", int(ncv))
    if maxiter is not None:
        kw.setdefault("max_iterations", int(maxiter))
    kw.setdefault("tolerance", float(tol) if tol else 1e-8)
    if v0 is not None:
        v0 = jnp.asarray(v0)
        if v0.ndim == 1:
            v0 = v0[:, None]
        kw.setdefault("initial_vectors", v0)

    res = eigensolve(op, k, second_matrix=B, **kw)
    if not bool(res.converged):
        raise ArpackNoConvergence(res, k)
    w = np.asarray(res.eigenvalues)
    v = np.asarray(res.eigenvectors)
    if flip:
        w = -w[::-1]
        v = v[:, ::-1]
    return (w, v) if return_eigenvectors else w


class ArpackNoConvergence(RuntimeError):
    """Raised when the solve does not converge (scipy's eigsh raises its
    ARPACK equivalent). The partial result rides on ``.result``; the
    converged subset on ``.eigenvalues``/``.eigenvectors`` (scipy
    contract)."""

    def __init__(self, result, k: int):
        conv = np.asarray(result.converged_pairs)
        self.result = result
        self.eigenvalues = np.asarray(result.eigenvalues)[conv]
        self.eigenvectors = np.asarray(result.eigenvectors)[:, conv]
        super().__init__(
            f"Davidson did not converge all {k} pairs in "
            f"{int(result.iterations)} iterations "
            f"({int(conv.sum())} converged); inspect .result, or retry "
            "with refined=True / a larger maxiter")
