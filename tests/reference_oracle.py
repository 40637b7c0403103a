"""Clean-room numpy oracle of the reference block-Davidson semantics.

Implements, from the structural survey (SURVEY.md §3.1), the exact
iteration schedule of the reference dense engine
(``/root/reference/src/davidson.f90:51-246``): initial subspace of unit
vectors at the smallest diagonal entries, projection, full projected
eigensolve, per-pair sticky convergence on the lowest k residuals,
DPR/GJD correction for *all* subspace columns, full-QR expansion, collapse
to the first ``2k`` Ritz vectors when the dimension exceeds ``max_dim``.

Used only as a test oracle for iteration-count and eigenvalue parity; it is
not part of the framework.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg


def davidson_oracle(A, k, method="DPR", max_iterations=1000, tol=1e-8,
                    max_dim=None, B=None):
    n = A.shape[0]
    gen = B is not None
    init_dim = 2 * k
    if max_dim is None:
        max_dim = 10 * k

    d = np.diag(A).copy()
    order = np.argsort(d, kind="stable")
    V = np.zeros((n, init_dim))
    V[order[:init_dim], np.arange(init_dim)] = 1.0

    has_converged = np.zeros(k, bool)
    evals = np.zeros(k)
    evecs = np.zeros((n, k))
    iters = max_iterations

    for i in range(1, max_iterations + 1):
        H = V.T @ A @ V
        if gen:
            S = V.T @ B @ V
            w, W = scipy.linalg.eigh(H, S)
        else:
            w, W = scipy.linalg.eigh(H)
        X = V @ W
        if gen:
            R = A @ X - (B @ X) * w[None, :]
        else:
            R = A @ X - X * w[None, :]
        errors = np.linalg.norm(R[:, :k], axis=0)
        has_converged |= errors < tol
        evals = w[:k]
        evecs = X[:, :k]
        if has_converged.all():
            iters = i
            break
        m = V.shape[1]
        if m <= max_dim:
            if method == "DPR":
                if gen:
                    den = w[None, :m] * np.diag(B)[:, None] - np.diag(A)[:, None]
                else:
                    den = w[None, :m] - np.diag(A)[:, None]
                corr = R[:, :m] / den
            else:  # GJD
                corr = np.empty((n, m))
                for j in range(m):
                    x = X[:, j]
                    P = np.eye(n) - np.outer(x, x)
                    Y = A - w[j] * (B if gen else np.eye(n))
                    M = P @ Y @ P
                    corr[:, j] = np.linalg.lstsq(M, -R[:, j], rcond=None)[0]
            V = np.linalg.qr(np.concatenate([V, corr], axis=1))[0]
        else:
            V = X[:, :init_dim]

    return evals, evecs, iters, has_converged.all()
