"""Component parity tests: examples, element-fn operators, text I/O.

Covers the reference's driver programs (``src/main.f90``,
``src/benchmark_free.f90``), its ``free_matmul`` row-on-the-fly engine
(``src/davidson.f90:526-569``), and the text I/O test utilities
(``src/tests/test_utils.f90:118-167``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import fortran_davidson_tpu as fdt
from fortran_davidson_tpu.models.generators import generate_diagonal_dominant
from fortran_davidson_tpu.ops.operators import from_element_fn
from fortran_davidson_tpu.utils import io as fio


class TestElementFnOperator:
    def test_matches_dense(self, rng):
        n = 97  # not a multiple of the row block
        dense = np.asarray(generate_diagonal_dominant(n, 1e-3))
        d = jnp.asarray(dense)

        op = from_element_fn(lambda i, j: d[i, j], n, row_block=32)
        X = jnp.asarray(rng.standard_normal((n, 5)))
        np.testing.assert_allclose(np.asarray(op.matmat(X)), dense @ X,
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(op.diagonal()),
                                   np.diagonal(dense), atol=1e-14)

    def test_analytic_elements_solve(self):
        """The reference's on-the-fly analytic operator style
        (``src/tests/test_utils.f90:37-51``): diag = i+1, tiny trig
        off-diagonals, solved end to end."""
        n = 60

        def elem(i, j):
            fi, fj = jnp.float64(i), jnp.float64(j)
            off = 1e-4 * jnp.cos(0.1 * (fi + fj))
            return jnp.where(i == j, fi + 1.0, off)

        op = from_element_fn(elem, n, row_block=16)
        res = fdt.eigensolve(op, 3, tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        import scipy.linalg
        dense = np.asarray(op.matmat(jnp.eye(n)))
        expected = scipy.linalg.eigh(dense, eigvals_only=True)[:3]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), expected,
                                   atol=1e-8)


class TestTextIO:
    def test_vector_roundtrip(self, tmp_path, rng):
        v = rng.standard_normal(17)
        p = tmp_path / "vec.txt"
        fio.write_vector(p, v)
        np.testing.assert_allclose(fio.read_vector(p), v, atol=1e-12)

    def test_matrix_roundtrip(self, tmp_path, rng):
        m = rng.standard_normal((6, 4))
        p = tmp_path / "mat.txt"
        fio.write_matrix(p, m)
        np.testing.assert_allclose(fio.read_matrix(p), m, atol=1e-12)


class TestExamples:
    def test_demo_runs_clean(self, capsys):
        from fortran_davidson_tpu.examples import demo
        rc = demo.main(["--dim", "60", "--tolerance", "1e-5"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "GJD algorithm converged" in out
        assert "True" in out

    def test_benchmark_free_runs_clean(self, capsys):
        from fortran_davidson_tpu.examples import benchmark_free
        rc = benchmark_free.main(["--dim", "200"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "warm solve" in out


class TestScipySparseIngestion:
    def test_csr_coo_inputs(self, rng):
        import scipy.sparse
        import scipy.linalg
        from fortran_davidson_tpu.ops.sparse import ELLOperator
        dense = np.array(generate_diagonal_dominant(40, 1e-2))
        dense[np.abs(dense) < 5e-3] = 0.0
        dense = (dense + dense.T) / 2
        for mat in (scipy.sparse.csr_matrix(dense),
                    scipy.sparse.coo_matrix(dense),
                    scipy.sparse.csc_matrix(dense)):
            op = fdt.as_operator(mat)
            assert isinstance(op, ELLOperator)
            np.testing.assert_allclose(np.asarray(op.to_dense()), dense,
                                       atol=1e-12)
        res = fdt.eigensolve(scipy.sparse.csr_matrix(dense), 2,
                             tolerance=1e-8)
        res.block_until_ready()
        assert bool(res.converged)
        expected = scipy.linalg.eigh(dense, eigvals_only=True)[:2]
        np.testing.assert_allclose(np.asarray(res.eigenvalues), expected,
                                   atol=1e-8)
