"""CLI driver (`python -m fortran_davidson_tpu`) — the production-shaped
equivalent of the reference's compiled driver programs (src/main.f90,
src/benchmark_free.f90)."""

import json
import subprocess
import sys

import numpy as np
import pytest
import scipy.linalg

from fortran_davidson_tpu.models.generators import \
    generate_diagonal_dominant
from fortran_davidson_tpu.utils.io import write_matrix


def _run(args, check=True):
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if args and args[0] == "solve":
        args = list(args) + ["--platform", "cpu"]
    p = subprocess.run([sys.executable, "-m", "fortran_davidson_tpu",
                        *args], capture_output=True, text=True, env=env)
    if check:
        assert p.returncode == 0, p.stderr[-2000:]
    return p


@pytest.fixture(scope="module")
def matrix_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    A = np.asarray(generate_diagonal_dominant(60, 1e-3))
    txt = d / "A.txt"
    write_matrix(txt, A)
    npy = d / "A.npy"
    np.save(npy, A)
    return A, str(txt), str(npy)


class TestSolveCommand:
    def test_text_matrix_matches_scipy(self, matrix_file):
        A, txt, _ = matrix_file
        p = _run(["solve", txt, "-k", "3", "--tolerance", "1e-8"])
        out = json.loads(p.stdout.strip().splitlines()[-1])
        assert out["converged"]
        want = scipy.linalg.eigh(A, eigvals_only=True)[:3]
        np.testing.assert_allclose(out["eigenvalues"], want, atol=1e-9)

    def test_npy_with_eigenvectors_output(self, matrix_file, tmp_path):
        A, _, npy = matrix_file
        vec = tmp_path / "V.npy"
        p = _run(["solve", npy, "-k", "2", "--eigenvectors", str(vec)])
        out = json.loads(p.stdout.strip().splitlines()[-1])
        V = np.load(vec)
        assert V.shape == (60, 2)
        # Residual check against the file's own matrix.
        lam = np.asarray(out["eigenvalues"])
        r = A @ V - V * lam[None, :]
        assert np.linalg.norm(r, axis=0).max() < 1e-7

    def test_scipy_csr_npz(self, matrix_file, tmp_path):
        A, _, _ = matrix_file
        import scipy.sparse as sp
        csr = sp.csr_matrix(np.asarray(A))
        f = tmp_path / "A.npz"
        np.savez(f, data=csr.data, indices=csr.indices,
                 indptr=csr.indptr, shape=np.asarray(csr.shape))
        p = _run(["solve", str(f), "-k", "2", "--dtype", "float64"])
        out = json.loads(p.stdout.strip().splitlines()[-1])
        assert out["converged"]
        want = scipy.linalg.eigh(A, eigvals_only=True)[:2]
        np.testing.assert_allclose(out["eigenvalues"], want, atol=1e-7)

    def test_nonconvergence_exit_code(self, matrix_file):
        _, txt, _ = matrix_file
        p = _run(["solve", txt, "-k", "2", "--max-iterations", "1",
                  "--tolerance", "1e-14"], check=False)
        assert p.returncode == 1
        out = json.loads(p.stdout.strip().splitlines()[-1])
        assert not out["converged"]


class TestSubcommandPassthrough:
    def test_demo(self):
        p = _run(["demo"])
        assert p.returncode == 0
