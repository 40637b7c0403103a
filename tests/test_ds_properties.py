"""Property-based tests (hypothesis) for the double-single substrate.

The fixed-seed tests in test_ds.py check accuracy on well-scaled random
data; these drive the error-free transformations and DS arithmetic with
adversarial floats (extreme exponents, cancellation, subnormal-adjacent
values) — the regimes where a wrong Dekker split constant or a misordered
two_sum silently loses the error term. Oracle: float64 (exact for any
single f32 product/sum, and ~eps(f64) for DS chains).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from fortran_davidson_tpu.utils import ds

# f32 values whose products/sums stay finite and whose error terms stay
# normal: |x| in [2^-40, 2^40] covers 80 octaves around 1.0 without
# hitting overflow (2^128) or the subnormal error-term floor (2^-149)
# in products of pairs.
finite_f32 = st.floats(min_value=2.0 ** -40, max_value=2.0 ** 40,
                       allow_nan=False, allow_infinity=False,
                       width=32).flatmap(
    lambda m: st.sampled_from([np.float32(m), np.float32(-m)]))


def to64(x):
    return np.asarray(x, np.float64)


@settings(max_examples=200, deadline=None)
@given(a=finite_f32, b=finite_f32)
def test_two_sum_exact(a, b):
    s, e = ds.two_sum(np.float32(a), np.float32(b))
    assert to64(s) + to64(e) == to64(a) + to64(b)


@settings(max_examples=200, deadline=None)
@given(a=finite_f32, b=finite_f32)
def test_two_prod_exact(a, b):
    p, e = ds.two_prod(np.float32(a), np.float32(b))
    # a*b is exactly representable in f64 for f32 inputs.
    assert to64(p) + to64(e) == to64(a) * to64(b)


@settings(max_examples=200, deadline=None)
@given(a=finite_f32, b=finite_f32, c=finite_f32, d=finite_f32)
def test_ds_add_accuracy(a, b, c, d):
    x = ds.DS(*ds.two_sum(np.float32(a), np.float32(b)))
    y = ds.DS(*ds.two_sum(np.float32(c), np.float32(d)))
    z = ds.ds_add(x, y)
    exact = (to64(x.hi) + to64(x.lo)) + (to64(y.hi) + to64(y.lo))
    got = to64(z.hi) + to64(z.lo)
    scale = max(abs(exact), abs(to64(x.hi)) + abs(to64(y.hi)), 1e-300)
    # DS add2 error bound: a few eps^2 of the larger operand.
    assert abs(got - exact) <= 16 * (2.0 ** -48) * scale


@settings(max_examples=200, deadline=None)
@given(a=finite_f32, b=finite_f32)
def test_ds_mul_accuracy(a, b):
    x = ds.DS(np.float32(a), np.float32(0))
    y = ds.DS(np.float32(b), np.float32(0))
    z = ds.ds_mul(x, y)
    exact = to64(a) * to64(b)
    got = to64(z.hi) + to64(z.lo)
    assert abs(got - exact) <= 4 * (2.0 ** -48) * abs(exact)


@settings(max_examples=150, deadline=None)
@given(a=finite_f32, b=finite_f32)
def test_ds_div_accuracy(a, b):
    x = ds.DS(np.float32(a), np.float32(0))
    y = ds.DS(np.float32(b), np.float32(0))
    z = ds.ds_div(x, y)
    exact = to64(a) / to64(b)
    got = to64(z.hi) + to64(z.lo)
    assert abs(got - exact) <= 8 * (2.0 ** -48) * abs(exact)


@settings(max_examples=150, deadline=None)
@given(a=st.floats(min_value=2.0 ** -40, max_value=2.0 ** 40,
                   allow_nan=False, allow_infinity=False, width=32))
def test_ds_sqrt_accuracy(a):
    x = ds.DS(np.float32(a), np.float32(0))
    z = ds.ds_sqrt(x)
    exact = np.sqrt(to64(a))
    got = to64(z.hi) + to64(z.lo)
    assert abs(got - exact) <= 8 * (2.0 ** -48) * abs(exact)


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_cascade_tree_strategy_agreement(data):
    """Both summation strategies are error-free transformations of the
    same sum: totals must agree to DS accuracy even under adversarial
    per-element magnitudes spanning many octaves."""
    import jax.numpy as jnp

    n = ds._CASCADE_MIN_ROWS + data.draw(
        st.integers(min_value=0, max_value=3000))
    rng = np.random.default_rng(data.draw(
        st.integers(min_value=0, max_value=2 ** 31)))
    expo = rng.uniform(-12, 12, size=(n, 2)).astype(np.float32)
    sign = rng.choice([-1.0, 1.0], size=(n, 2)).astype(np.float32)
    x = jnp.asarray(sign * np.exp2(expo), jnp.float32)
    with ds.sum_strategy("cascade"):
        a = ds.tall_sum_ds(x)
    with ds.sum_strategy("tree"):
        b = ds.tall_sum_ds(x)
    av = to64(a.hi) + to64(a.lo)
    bv = to64(b.hi) + to64(b.lo)
    scale = np.sum(np.abs(np.asarray(x, np.float64)), axis=0)
    assert np.all(np.abs(av - bv) <= 1e-10 * scale), (av, bv, scale)
