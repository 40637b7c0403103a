"""Native C++ assembly component: bit-parity with the numpy fallback.

The native layer must never change results — only assembly speed
(SURVEY.md §2 "native components"). Skipped cleanly if no toolchain.
"""

import numpy as np
import pytest

from fortran_davidson_tpu import native
from fortran_davidson_tpu.ops.sparse import ELLOperator, _ell_from_coo_np


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def _random_coo(n, nnz, rng, dtype=np.float64, with_dups=True):
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz).astype(dtype)
    if with_dups:
        rows = np.concatenate([rows, rows[: nnz // 4]])
        cols = np.concatenate([cols, cols[: nnz // 4]])
        vals = np.concatenate([vals, vals[: nnz // 4]])
    return rows, cols, vals


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_native_matches_numpy(lib, rng, dtype):
    n = 57
    rows, cols, vals = _random_coo(n, 400, rng, dtype)
    got = native.ell_from_coo(rows, cols, vals, n)
    assert got is not None
    idx_np, val_np = _ell_from_coo_np(rows, cols, vals, n, None)
    np.testing.assert_array_equal(got[0], idx_np)
    np.testing.assert_allclose(got[1], val_np, atol=1e-6)


def test_native_pad_width(lib, rng):
    n = 20
    rows, cols, vals = _random_coo(n, 60, rng)
    got = native.ell_from_coo(rows, cols, vals, n, pad_width=32)
    assert got[0].shape == (n, 32)
    idx_np, val_np = _ell_from_coo_np(rows, cols, vals, n, 32)
    np.testing.assert_array_equal(got[0], idx_np)
    np.testing.assert_allclose(got[1], val_np, atol=1e-12)


def test_native_pad_too_small_raises(lib):
    rows = np.zeros(5, np.int64)
    cols = np.arange(5)
    vals = np.ones(5)
    with pytest.raises(ValueError):
        native.ell_from_coo(rows, cols, vals, 6, pad_width=2)


def test_native_out_of_range_raises(lib):
    with pytest.raises(ValueError):
        native.ell_from_coo([0, 9], [0, 0], [1.0, 1.0], 5)


def test_fallback_out_of_range_raises():
    # The numpy fallback must honor the native path's index contract:
    # a negative col would otherwise fold into key = row*n + col and
    # silently land the entry at (row-1, n-1).
    with pytest.raises(ValueError):
        _ell_from_coo_np([1, 2], [0, -1], [1.0, 1.0], 5)
    with pytest.raises(ValueError):
        _ell_from_coo_np([0, 9], [0, 0], [1.0, 1.0], 5)


def test_from_coo_native_and_fallback_agree(lib, rng):
    n = 48
    rows, cols, vals = _random_coo(n, 300, rng)
    a = ELLOperator.from_coo(rows, cols, vals, n, use_native=True)
    b = ELLOperator.from_coo(rows, cols, vals, n, use_native=False)
    np.testing.assert_array_equal(np.asarray(a.indices), np.asarray(b.indices))
    np.testing.assert_allclose(np.asarray(a.values), np.asarray(b.values),
                               atol=1e-14)
