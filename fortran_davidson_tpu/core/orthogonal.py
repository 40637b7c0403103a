"""Masked block orthonormalization (TPU-native replacement for DGEQRF/DORGQR).

The reference re-orthonormalizes the *entire* grown basis with a full
Householder QR every expansion (``src/davidson.f90:213`` ->
``src/lapack_wrapper.f90:176-236``), which costs O(n m^2) and — crucially
for us — rewrites every column, invalidating any cached A@V.

The TPU build instead keeps the existing basis columns untouched and
orthonormalizes only the *new* block against them with CGS2 (classical
Gram-Schmidt applied twice — "twice is enough", Giraud et al.), followed by
an intra-block thin QR. In exact arithmetic the resulting span equals the
reference's QR span, so Ritz values and therefore iteration counts are
preserved, while A/B need only be applied to the new columns.

All routines operate on *padded* bases: ``V`` has static shape
``(n, m_max)`` whose active columns are exactly the nonzero ones (padded
columns are identically zero), so no explicit mask arguments are needed for
the Gram products — zero columns contribute zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def col_mask(m, m_max: int, dtype):
    """(m_max,) float mask: 1.0 for columns < m (m may be traced)."""
    return (jnp.arange(m_max) < m).astype(dtype)


def project_out(V, block):
    """Remove the component of ``block`` lying in span(V's nonzero columns)."""
    coeffs = jnp.dot(V.T, block, preferred_element_type=block.dtype)
    return block - jnp.dot(V, coeffs, preferred_element_type=block.dtype)


def _filler(shape, dtype):
    """Deterministic pseudo-random directions for dead columns.

    When a correction column vanishes (e.g. an exactly-converged pair has a
    zero residual), the reference's full Householder QR silently completes
    the basis with an arbitrary orthonormal direction
    (``src/lapack_wrapper.f90:214-231`` never fails); a zero column here
    would instead poison the projected problem (singular B-Gram =>
    Cholesky NaN). We match the reference's "arbitrary direction" behavior
    with a fixed-key pseudo-random filler.
    """
    return jax.random.normal(jax.random.PRNGKey(0xDA71D50), shape, dtype)


def orthonormalize_block(V, block, mask, n_reorth: int = 2,
                         method: str = "cholqr2"):
    """Orthonormalize ``block`` against the padded basis ``V`` and itself.

    Args:
      V: (n, m_max) padded orthonormal basis (padded columns exactly zero).
      block: (n, b_max) candidate new directions; only columns where
        ``mask`` is 1 are meaningful and they must form a *prefix*.
      mask: (b_max,) float prefix mask of active block columns.
      n_reorth: number of CGS passes against V (2 = CGS2).

    Returns:
      (n, b_max) block with orthonormal active columns, orthogonal to the
      active columns of V; masked columns are exactly zero.
    """
    dt = block.dtype
    block = block * mask[None, :]
    for _ in range(n_reorth):
        block = project_out(V, block)
    # Revive dead active columns (vanished after projection against V) with
    # arbitrary directions, as the reference's Householder QR would.
    norms_in = jnp.linalg.norm(block, axis=0)
    scale = jnp.maximum(jnp.max(norms_in), 1.0)
    dead = mask.astype(bool) & (norms_in <= 64 * jnp.finfo(dt).eps * scale)
    fill = project_out(V, _filler(block.shape, dt) * mask[None, :])
    block = jnp.where(dead[None, :], fill, block)
    # Intra-block orthonormalization. Active columns form a prefix, so the
    # leading columns of Q from a thin QR span them; trailing Q columns are
    # arbitrary orthonormal directions and get masked back to zero.
    if method == "qr":
        q, _ = jnp.linalg.qr(block)
    else:
        # CholeskyQR2 on column-normalized data (padded columns pass
        # through as zeros via the unit Gram diagonal).
        norms0 = jnp.linalg.norm(block, axis=0)
        inv0 = jnp.where(norms0 > 0, 1.0 / jnp.where(norms0 > 0, norms0, 1.0),
                         0.0)
        q, _ = cholqr2(block * inv0[None, :], unit_diag=mask,
                       jitter=64.0 * jnp.finfo(dt).eps)
    q = q * mask[None, :]
    # One more sweep against V: the QR completes zero/near-zero columns with
    # arbitrary directions that may have components in span(V).
    q = project_out(V, q)
    # Renormalize columns (safe for exactly-zero padded columns).
    norms = jnp.linalg.norm(q, axis=0)
    inv = jnp.where(norms > 0, 1.0 / jnp.where(norms > 0, norms, 1.0), 0.0)
    return q * inv[None, :]


def cholqr_once(X, unit_diag=None, jitter: float = 0.0):
    """One CholeskyQR pass: X = Q R via R = chol(X^T X)^T, Q = X R^{-1}.

    All heavy work is one Gram matmul (MXU; a psum under row sharding)
    plus an m x m Cholesky/triangular solve — the TPU-native shape of
    tall-skinny QR, replacing the Householder DGEQRF/DORGQR of the
    reference (``src/lapack_wrapper.f90:176-236``) which XLA lowers to a
    slow sequential loop on TPU.

    ``unit_diag``: optional (m,) 0/1 mask; positions with 0 get a unit
    Gram diagonal so exactly-zero (padded) columns pass through as zero
    columns instead of breaking the factorization.
    """
    G = jnp.dot(X.T, X, preferred_element_type=X.dtype)
    if unit_diag is not None:
        G = G + jnp.diag(1.0 - unit_diag)
    if jitter:
        # Relative diagonal regularization: keeps the factorization finite
        # for (near-)parallel columns, where Householder QR would invent an
        # arbitrary completion direction anyway. Spans are unaffected.
        G = G + jitter * jnp.mean(jnp.diagonal(G)) * jnp.eye(
            G.shape[0], dtype=G.dtype)
    L = jnp.linalg.cholesky(G)
    Qt = jax.scipy.linalg.solve_triangular(L, X.T, lower=True)
    return Qt.T, L.T


def cholqr2(X, unit_diag=None, jitter: float = 0.0):
    """CholeskyQR2 (Yamamoto et al.): two passes give orthogonality at
    working precision for cond(X) up to ~1/sqrt(eps)."""
    Q1, R1 = cholqr_once(X, unit_diag, jitter)
    Q2, R2 = cholqr_once(Q1, unit_diag, jitter)
    return Q2, jnp.dot(R2, R1, preferred_element_type=X.dtype)


def thin_qr_collapse(X, method: str = "cholqr2"):
    """Thin QR used at subspace collapse.

    At collapse the reference sets ``V <- V @ W[:, :init_dim]``
    (``src/davidson.f90:218``) *without* re-orthonormalizing — in the
    generalized problem W is only B-orthogonal, so the collapsed basis is
    not orthonormal and the reference relies on the next DSYGV to cope.
    We keep the invariant "V orthonormal" instead: QR the collapsed block
    and return (Q, R) so cached A@V / B@V can be updated by a triangular
    solve (A@Q = (A@X) R^{-1}) with *no* extra operator applications.
    Identical span => identical Ritz values => iteration-count parity.

    The collapsed block is Ritz vectors (orthonormal, or B-orthonormal
    with a well-conditioned B, in exact arithmetic), so CholeskyQR2 is
    unconditionally stable here; ``method="qr"`` falls back to Householder.
    """
    if method == "qr":
        return jnp.linalg.qr(X)
    return cholqr2(X)


def right_tri_solve(Y, R):
    """Compute Y @ R^{-1} for upper-triangular R (used to update caches)."""
    # Solve X R = Y  <=>  R^T X^T = Y^T.
    Xt = jax.scipy.linalg.solve_triangular(R.T, Y.T, lower=True)
    return Xt.T
