"""Rayleigh-Ritz projection on a padded subspace.

Replaces the reference's DSYEV/DSYGV projected solves
(``src/lapack_wrapper.f90:14-91``) with a masked `jnp.linalg.eigh`:

- The basis is padded to a static width ``m_max``; inactive columns are
  exactly zero, so the projected Gram matrices have zero rows/columns in
  the inactive block.
- Before the eigendecomposition we place large, distinct values on the
  inactive diagonal (and 1s on the inactive diagonal of the B projection),
  making the padded problem block-diagonal: the active eigenpairs come out
  first in ascending order, bit-identical to solving the unpadded m x m
  problem, and the inactive eigenpairs sort last where the solver masks
  them out.
- The generalized problem is reduced with a Cholesky factorization
  (B = L L^T, solve L^-1 A L^-T), matching DSYGV's itype=1 reduction, and
  eigenvectors are returned B-orthonormal exactly as DSYGV returns them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def initial_subspace(diag, m_init: int, m_max: int):
    """Initial orthonormal basis: canonical unit vectors at the positions of
    the ``m_init`` smallest diagonal entries (ascending), padded to m_max.

    Mirrors ``generate_preconditioner`` (reference
    ``src/array_utils.f90:136-160``): column i is e_{p_i} with p_i the index
    of the i-th smallest diagonal element. Uses a single argsort instead of
    DLASRT + an O(n^2) key-recovery scan (``src/lapack_wrapper.f90:367-392``).
    """
    n = diag.shape[0]
    order = jnp.argsort(diag)  # stable: ties resolved by index, like the ref scan
    idx = order[:m_init]
    V = jnp.zeros((n, m_max), diag.dtype)
    V = V.at[idx, jnp.arange(m_init)].set(1.0)
    return V


def initial_subspace_with_guess(diag, X0, m_init: int, m_max: int,
                                precise: bool = False):
    """Warm-started initial basis: user vectors + preconditioner fill.

    ``X0`` (n, j), j <= m_init (static width): the caller's approximate
    eigenvectors — e.g. the previous solve of a slowly varying operator
    (the production warm-start pattern; the reference has no analogue).

    The remaining ``m_init - j`` columns come from the canonical
    preconditioner basis (:func:`initial_subspace`), and the combined
    block is SVQB-orthonormalized — near-duplicate or rank-deficient
    guesses lose their redundant directions instead of poisoning the
    basis. A degenerate guess can therefore start with fewer than
    ``m_init`` live columns (even fewer than ``lowest``); the loop's
    pair-existence convergence check and ordinary expansion grow the
    basis back honestly. On the precise path the SVQB applies the same
    noise-floor rank threshold as the expand step, so sub-noise
    difference directions between the guess and the fill are dropped,
    not whitened into junk columns.

    Returns ``(V0, col_ok, m0)``: the padded basis, its live-column
    mask, and the (traced) live count.
    """
    from fortran_davidson_tpu.core import orthogonal

    n = diag.shape[0]
    j = X0.shape[1]
    dt = diag.dtype
    eps = float(jnp.finfo(dt).eps)
    rank_rtol = (max(m_init * eps, (10.0 * eps) ** 2 * n) if precise
                 else None)
    C = jnp.zeros((n, m_init), dt)
    C = C.at[:, :j].set(X0.astype(dt))
    if m_init > j:
        fill = initial_subspace(diag, m_init - j, m_init - j)
        C = C.at[:, j:].set(fill)
    Q, alive = orthogonal.svqb(C, jnp.ones((m_init,), dt),
                               rank_rtol=rank_rtol, return_alive=True,
                               precise=precise)
    V0 = jnp.zeros((n, m_max), dt).at[:, :m_init].set(Q)
    col_ok = jnp.zeros((m_max,), dt).at[:m_init].set(alive)
    return V0, col_ok, jnp.sum(alive).astype(jnp.int32)


def project(V, AV, precise: bool = False):
    """Projected (Gram) matrix H = V^T (A V) on the padded basis.

    ``precise``: chunked-compensated contraction (``utils.ds.gram_ds``) —
    bounds the accumulation error to ~eps*chunk/sqrt(n) instead of the
    naive ~eps*sqrt(n) (which at n=10M is ~2e-4 and becomes the f32
    convergence floor). The result is still rounded to the working dtype
    (~eps relative), which is what the downstream eigh can use.
    """
    if precise:
        from fortran_davidson_tpu.utils.ds import gram_ds
        g = gram_ds(V, AV)
        return g.hi + g.lo
    return jnp.dot(V.T, AV, preferred_element_type=AV.dtype)


def _pad_penalties(H, mask):
    """Large, distinct diagonal entries for the inactive block.

    Must exceed every active eigenvalue; |lambda| <= ||H||_F and the padded
    rows/cols of H are zero, so 16(||H||_F + 1) is a safe bound. Distinct
    offsets keep the padded block non-degenerate.
    """
    m_max = H.shape[0]
    scale = 16.0 * (jnp.linalg.norm(H) + 1.0)
    offsets = 1.0 + jnp.arange(m_max, dtype=H.dtype) / m_max
    return (1.0 - mask) * scale * offsets


def masked_eigh(H, mask):
    """Eigendecomposition of the active block of a padded symmetric H.

    Returns (w, W) of full padded size; the first m eigenpairs (ascending)
    are the active ones, and their eigenvectors have (numerically) zero
    components in the padded rows.
    """
    Hm = H + jnp.diag(_pad_penalties(H, mask))
    return jnp.linalg.eigh(Hm)


def masked_generalized_eigh(H, S, mask):
    """Generalized eigendecomposition H w = lambda S w on the active block.

    Cholesky reduction (DSYGV itype=1 semantics,
    ``src/lapack_wrapper.f90:59-78``): S = L L^T, C = L^-1 H L^-T, eigh(C),
    W = L^-T Y. Returned eigenvectors satisfy W^T S W = I (B-orthonormal),
    exactly like DSYGV. The padded block of S is set to identity so the
    Cholesky is well-posed; the padded block of H carries large penalties
    so padded eigenpairs sort last.
    """
    Hm = H + jnp.diag(_pad_penalties(H, mask))
    Sm = S + jnp.diag(1.0 - mask)
    L = jnp.linalg.cholesky(Sm)
    # C = L^-1 Hm L^-T via two triangular solves.
    C1 = jax.scipy.linalg.solve_triangular(L, Hm, lower=True)
    C = jax.scipy.linalg.solve_triangular(L, C1.T, lower=True).T
    # Symmetrize against roundoff drift before eigh.
    C = 0.5 * (C + C.T)
    w, Y = jnp.linalg.eigh(C)
    W = jax.scipy.linalg.solve_triangular(L.T, Y, lower=False)
    return w, W


def ritz_decomposition(H, S: Optional[jnp.ndarray], mask):
    """Dispatch standard vs generalized masked Rayleigh-Ritz."""
    if S is None:
        return masked_eigh(H, mask)
    return masked_generalized_eigh(H, S, mask)
