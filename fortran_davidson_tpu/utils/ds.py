"""Double-single (two-float) compensated arithmetic for TPU.

TPU has no native float64 (v5e/v6e MXU+VPU are f32/bf16). The reference
computes everything in real64 (``/root/reference/src/numeric_kinds.f90:10``)
and its 1e-8 tolerances assume it. This module provides the error-free
transformations (Dekker/Knuth) and the *chunked compensated reductions*
that let the solver reach 1e-6..1e-8 accuracy on f32 hardware:

- ``two_sum`` / ``two_prod``: exact a+b / a*b as a (value, error) pair of
  f32s — branch-free VPU code (Dekker splitting; no FMA dependence).
- double-single scalars/arrays represented as a ``(hi, lo)`` pair with
  ``|lo| <= ulp(hi)``: ~48-bit effective mantissa (eps ~ 4e-15).
- ``gram_ds``: the workhorse. A naive f32 Gram V^T V over n=10M rows
  carries a stochastic ~sqrt(n)*eps ~ 2e-4 accumulation error — the
  measured f32 convergence floor of round 1. Chunking the row axis into
  c-row batched MXU matmuls and combining the n/c partial Grams with an
  exact two_sum tree bounds each rounding to its chunk's LOCAL magnitude:
  total error ~ eps * c / sqrt(n) (≈ 8e-8 at c=4096, n=1e7) — f64-grade
  accuracy at full MXU speed (the combine is O(n/c * m^2) VPU flops).

Everything is jit-safe, shard-safe (reductions stay per-chunk until the
final tree, which XLA lowers to log-depth elementwise adds), and works in
any float dtype (tests exercise f32 against an f64 oracle).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class DS(NamedTuple):
    """A double-single number/array: value ``hi + lo`` with |lo| <= ulp(hi)."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    def to_float(self):
        return self.hi + self.lo


def ds(hi, lo=None) -> DS:
    hi = jnp.asarray(hi)
    return DS(hi, jnp.zeros_like(hi) if lo is None else jnp.asarray(lo))


# -- error-free transformations ------------------------------------------

def two_sum(a, b):
    """Knuth two-sum: s = fl(a+b), e exact error (a+b = s+e). 6 flops."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def fast_two_sum(a, b):
    """Dekker fast two-sum; REQUIRES |a| >= |b| (or a == 0). 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split into hi/lo halves of the mantissa (f32: 12+12 bits)."""
    # 2^ceil(p/2) + 1 with p = mantissa bits (24 for f32, 53 for f64).
    c = jnp.asarray(4097.0 if a.dtype == jnp.float32 else 134217729.0,
                    a.dtype)
    t = c * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Dekker two-product: p = fl(a*b), e exact error (a*b = p+e)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# -- double-single arithmetic --------------------------------------------

def ds_add(x: DS, y: DS) -> DS:
    """DS + DS (Dekker add2: ~11 flops, |error| ~ eps^2)."""
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DS(*fast_two_sum(s, e))


def ds_neg(x: DS) -> DS:
    return DS(-x.hi, -x.lo)


def ds_sub(x: DS, y: DS) -> DS:
    return ds_add(x, ds_neg(y))


def ds_mul(x: DS, y: DS) -> DS:
    """DS * DS."""
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DS(*fast_two_sum(p, e))


def ds_mul_f(x: DS, a) -> DS:
    """DS * plain float."""
    p, e = two_prod(x.hi, a)
    e = e + x.lo * a
    return DS(*fast_two_sum(p, e))


def ds_div(x: DS, y: DS) -> DS:
    """DS / DS via Newton-corrected quotient."""
    q1 = x.hi / y.hi
    r = ds_sub(x, ds_mul_f(y, q1))
    q2 = (r.hi + r.lo) / y.hi
    return DS(*fast_two_sum(q1, q2))


def ds_sqrt(x: DS) -> DS:
    """sqrt of a DS (one Newton step on the f32 sqrt)."""
    s = jnp.sqrt(x.hi)
    # guard exact zeros (s == 0 -> division); sqrt(0) = 0 exactly.
    safe = jnp.where(s > 0, s, 1.0)
    r = ds_sub(x, DS(*two_prod(s, s)))
    corr = jnp.where(s > 0, (r.hi + r.lo) / (2.0 * safe), 0.0)
    return DS(*fast_two_sum(s, corr))


# -- compensated reductions ----------------------------------------------

def ds_sum_tree(x, axis: int = 0, lo=None) -> DS:
    """Exact-compensated sum along ``axis`` via a two_sum binary tree.

    Rounding errors at every node are carried in the lo channel (added in
    plain f32 — their own rounding is O(eps^2) relative). Cost: log2(k)
    elementwise passes over the array (total traffic ~2x the input).
    ``lo`` seeds the error channel — pass per-element exact product
    errors (two_prod) for Dot2-grade fully compensated dot products.
    """
    x = jnp.moveaxis(jnp.asarray(x), axis, 0)
    hi = x
    lo = (jnp.zeros_like(x) if lo is None
          else jnp.moveaxis(jnp.asarray(lo), axis, 0))
    while hi.shape[0] > 1:
        k = hi.shape[0]
        half = (k + 1) // 2
        pad = half * 2 - k
        if pad:
            hi = jnp.concatenate([hi, jnp.zeros_like(hi[:1])])
            lo = jnp.concatenate([lo, jnp.zeros_like(lo[:1])])
        s, e = two_sum(hi[0::2], hi[1::2])
        hi = s
        lo = lo[0::2] + lo[1::2] + e
    return DS(*fast_two_sum(hi[0], lo[0]))


def tall_sum_ds(x, lo=None) -> DS:
    """Exact-compensated column sums of a TALL (n, m) array pair.

    Same math as :func:`ds_sum_tree` over axis 0, restructured for TPU
    layout: arrays with a narrow minor dimension (m << 128) are
    lane-padded ~128/m-fold in memory, so a tree walking (n, m) arrays
    pays that bloat at every level (measured 570 ms for (10M, 4) — vs
    ~12 ms for a full Gram). Here the pair is reshaped to a full-lane
    ``(n/g, g*m)`` layout (g = 128/m strata interleaved), the two_sum
    tree runs on compact rows, and the g strata per column are folded
    with an exact sequential cascade at the end. Bit-for-bit it is a
    different (still error-free) summation order — accuracy class is
    identical (~eps² relative).
    """
    x = jnp.asarray(x)
    lo = jnp.zeros_like(x) if lo is None else jnp.asarray(lo)
    n, m = x.shape
    mp = 1
    while mp < m:
        mp *= 2
    if mp <= 128:
        g = 128 // mp
        if mp != m:
            x = jnp.pad(x, ((0, 0), (0, mp - m)))
            lo = jnp.pad(lo, ((0, 0), (0, mp - m)))
        if n % g:
            pad = g - n % g
            x = jnp.pad(x, ((0, pad), (0, 0)))
            lo = jnp.pad(lo, ((0, pad), (0, 0)))
            n = n + pad
        hi2 = x.reshape(n // g, g * mp)
        lo2 = lo.reshape(n // g, g * mp)
        while hi2.shape[0] > 1:
            kk = hi2.shape[0]
            half = (kk + 1) // 2
            if half * 2 - kk:
                hi2 = jnp.concatenate([hi2, jnp.zeros_like(hi2[:1])])
                lo2 = jnp.concatenate([lo2, jnp.zeros_like(lo2[:1])])
            s, e = two_sum(hi2[0::2], hi2[1::2])
            hi2 = s
            lo2 = lo2[0::2] + lo2[1::2] + e
        s = hi2[0].reshape(g, mp)
        e = lo2[0].reshape(g, mp)
        hi_acc, lo_acc = s[0], e[0]
        for i in range(1, g):  # exact cascade over the strata (g <= 128)
            hi_acc, err = two_sum(hi_acc, s[i])
            lo_acc = lo_acc + e[i] + err
        out = DS(*fast_two_sum(hi_acc, lo_acc))
        return DS(out.hi[:m], out.lo[:m])
    return ds_sum_tree(x, axis=0, lo=lo)


def _chunk(n: int, chunk: Optional[int]) -> int:
    if chunk is None:
        chunk = 4096
    while n % chunk and chunk > 1:
        chunk //= 2
    return max(chunk, 1)


def gram_ds(V, W=None, *, chunk: Optional[int] = None) -> DS:
    """Compensated Gram matrix ``V^T W`` (W defaults to V) as a DS pair.

    The row axis is cut into ``chunk``-row slabs; each slab's partial Gram
    is a batched MXU matmul in the working dtype, and the slab results are
    combined with the exact two_sum tree. Error ~ eps * chunk / sqrt(n)
    instead of the naive ~ eps * sqrt(n). ``chunk`` is reduced to divide
    n (the default 4096 handles all power-of-two-ish padded shapes).
    """
    W = V if W is None else W
    n, m = V.shape
    p = W.shape[1]
    c = _chunk(n, chunk)
    Vc = V.reshape(n // c, c, m)
    Wc = W.reshape(n // c, c, p)
    # precision=HIGHEST: on TPU the default einsum demotes f32 operands
    # to bf16 passes — that would put an eps_bf16 floor under everything.
    partial = jnp.einsum("kcm,kcp->kmp", Vc, Wc,
                         preferred_element_type=V.dtype,
                         precision=jax.lax.Precision.HIGHEST)
    return ds_sum_tree(partial, axis=0)


def col_sumsq_ds(X, *, chunk: Optional[int] = None) -> DS:
    """Compensated per-column sum of squares (residual/vector norms)."""
    n, m = X.shape
    c = _chunk(n, chunk)
    Xc = X.reshape(n // c, c, m)
    partial = jnp.einsum("kcm,kcm->km", Xc, Xc,
                         preferred_element_type=X.dtype,
                         precision=jax.lax.Precision.HIGHEST)
    return ds_sum_tree(partial, axis=0)


def col_norms_ds(X, *, chunk: Optional[int] = None):
    """Compensated per-column 2-norms (plain float result)."""
    return ds_sqrt(col_sumsq_ds(X, chunk=chunk)).to_float()


def dot_cols_ds(X, Y) -> DS:
    """Fully compensated per-column dots diag(X^T Y) (Dot2 quality).

    Unlike :func:`gram_ds` (chunked MXU — right for positive-dominant
    Gram sums), this pays for exact elementwise products (two_prod) and a
    full two_sum tree, so it stays accurate even under heavy cancellation
    (Rayleigh numerators ``x^T (A - σB) x``, deflation overlaps). Pure
    VPU; use on (n, k) column blocks, not wide bases.
    """
    p, e = two_prod(X, Y)
    return tall_sum_ds(p, lo=e)


# -- compensated elementwise kernels used by the solver -------------------

def shifted_diag_apply(diag, shift, X):
    """Compute ``(diag - shift)[:, None] * X`` in double-single.

    The heart of the high-precision residual for diagonal-dominant
    operators: near convergence ``diag_i ≈ shift`` where the eigenvector
    has its mass, and the f32 subtraction+product would leave an
    eps*|diag| error — exactly the term that dominates ``||Ax - λx||``.
    Returns a DS (n, k) pair (hi + lo).

    diag: (n,), shift: (k,), X: (n, k).
    """
    d, e_sub = two_sum(diag[:, None], -shift[None, :])
    p, e_mul = two_prod(d, X)
    return DS(*fast_two_sum(p, e_mul + e_sub * X))
