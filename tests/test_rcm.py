"""RCM bandwidth-reducing reordering for the hybrid sparse operator.

The unstructured-remainder gather is the hybrid operator's slow part
(~6e9 nnz/s gather-engine rate); RCM reordering (native C++ with a scipy
fallback) narrows the pattern so the fast banded path captures the mass.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu import native
from fortran_davidson_tpu.ops.sparse import (generate_local_sparse,
                                             split_band_remainder)


def scrambled_local_coo(n, seed=3):
    """A locality-bearing pattern hidden behind a random permutation —
    banded in disguise, hopeless for a naive band split."""
    rows, cols, vals = generate_local_sparse(n, 10, locality=12.0,
                                             seed=seed)
    rng = np.random.default_rng(seed + 1)
    scram = rng.permutation(n)
    return scram[rows], scram[cols], vals


class TestRcmOrder:
    def test_recovers_bandwidth(self):
        n = 512
        rows, cols, _ = scrambled_local_coo(n)
        perm = native.rcm_order(rows, cols, n)
        assert perm is not None and sorted(perm) == list(range(n))
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        spread = np.abs(inv[rows] - inv[cols])
        # The scrambled pattern has spreads ~n; RCM must pull the graph
        # back to a narrow profile.
        assert np.abs(rows - cols).max() > n // 2
        assert spread.max() < n // 4
        assert np.median(spread) < 64

    def test_out_of_range_raises(self):
        with pytest.raises(ValueError):
            native.rcm_order([0, 5], [0, 0], 5)

    def test_native_matches_fallback_quality(self):
        lib = native.load()
        if lib is None:
            pytest.skip("no native toolchain")
        scipy_csg = pytest.importorskip("scipy.sparse.csgraph")
        import scipy.sparse
        n = 256
        rows, cols, _ = scrambled_local_coo(n, seed=9)
        perm_nat = native.rcm_order(rows, cols, n)
        pattern = scipy.sparse.coo_matrix(
            (np.ones(len(rows), np.int8), (rows, cols)),
            shape=(n, n)).tocsr()
        perm_sp = np.asarray(scipy_csg.reverse_cuthill_mckee(
            pattern, symmetric_mode=True), np.int64)

        def bandwidth(perm):
            inv = np.empty(n, np.int64)
            inv[perm] = np.arange(n)
            return np.abs(inv[rows] - inv[cols]).max()

        # Equivalent quality (orders may differ; both must beat raw
        # dramatically and land in the same class).
        assert bandwidth(perm_nat) <= 2 * bandwidth(perm_sp) + 16


class TestHybridWithRcm:
    def test_band_fraction_improves(self):
        n = 768
        rows, cols, vals = scrambled_local_coo(n)
        raw = split_band_remainder(rows, cols, vals, n, block_size=64,
                                   bandwidth=1)
        rcm = split_band_remainder(rows, cols, vals, n, block_size=64,
                                   bandwidth=1, reorder="rcm")
        assert rcm.band_fraction > raw.band_fraction + 0.2
        assert rcm.band_fraction > 0.9

    def test_eigensolve_and_unpermute(self):
        n = 530  # non-multiple of block size: padding + reordering mix
        rows, cols, vals = scrambled_local_coo(n, seed=5)
        op = split_band_remainder(rows, cols, vals, n, block_size=64,
                                  bandwidth=1, reorder="rcm")
        res = fdt.eigensolve(op, 4, tolerance=1e-8)
        assert bool(res.converged)
        dense = np.zeros((n, n))
        np.add.at(dense, (rows, cols), vals)
        w, V = scipy.linalg.eigh(dense)
        np.testing.assert_allclose(np.asarray(res.eigenvalues), w[:4],
                                   atol=1e-8)
        # Eigenvectors map back to the original ordering.
        back = np.asarray(op.unpermute(res.eigenvectors))
        assert back.shape == (n, 4)
        for j in range(4):
            overlap = np.abs(back[:, j] @ V[:, j])
            np.testing.assert_allclose(overlap, 1.0, atol=1e-6)
