"""Round-4 debug: why does the 10M lowest-20 polish floor at ~1.4e-8?

Observed (TPU + CPU f32, n=10,000,384, k=20, max_dim_sub=44,
progressive refined+polish): pair 1 fixed-points at 2.46e-8 (its bar is
1e-8 absolute), pairs 3-17 share a ~1.39e-8 floor, pairs 2/8 reach
1e-12 — polish iterations 3 vs 6 bit-identical, so these are genuine
fixed points of the Jacobi/DPR polish map.

This script separates the candidate causes on the SAME solve output:
  1. run the loop with final_polish=0, keep the pre-polish pairs;
  2. polish them with refine.polish (both DS channels retained);
  3. evaluate the DS pair's residual with a float64 oracle apply —
     if the f64 residual is much smaller than the reported one, the
     polish's f32 A_off apply noise dominates the MEASUREMENT; if they
     agree, the pair itself is stuck (Jacobi fixed point / floored
     denominator).

CPU-only (needs f64): PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    python experiments/r4_polish_debug.py --n 10000384
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_384)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--max-dim-sub", type=int, default=44)
    ap.add_argument("--polish", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fortran_davidson_tpu import eigensolve
    from fortran_davidson_tpu.core import refine
    from fortran_davidson_tpu.models.generators import surrogate_hamiltonian

    n, k = args.n, args.k
    op = surrogate_hamiltonian(n, dtype=jnp.float32)
    loose = dict(method="DPR", tolerance=1e-3, relative_tolerance=True,
                 dtype="float32", expansion="lowest-k",
                 max_dim_sub=args.max_dim_sub, max_iterations=30)
    kw = dict(loose, tolerance=1e-8, refined=True, final_polish=0,
              max_iterations=120)
    l = eigensolve(op, k, **loose)
    r = eigensolve(op, k, initial_vectors=l.eigenvectors, **kw)

    op64 = surrogate_hamiltonian(n, dtype=jnp.float64)
    out = dict(
        probe="polish_debug", n=n, k=k,
        pre_polish=[float(v) for v in np.asarray(r.residual_norms)],
    )
    for update in ("dpr", "olsen"):
        pol = refine.polish(op.offdiag(),
                            op.diagonal().astype(jnp.float32),
                            r.eigenvalues, r.eigenvectors,
                            iterations=args.polish, update=update)
        lam = np.asarray(pol.evals, np.float64)
        xh = np.asarray(pol.evecs_hi, np.float64)
        xl = np.asarray(pol.evecs_lo, np.float64)

        # f64 oracle on the DS pair x = hi + lo.
        X = jnp.asarray(xh + xl, jnp.float64)
        AX = np.asarray(op64.matmat(X), np.float64)
        Xn = np.asarray(X)
        nrm2 = (Xn * Xn).sum(axis=0)
        rq = (Xn * AX).sum(axis=0) / nrm2
        res_at_lam = np.linalg.norm(AX - Xn * lam[None, :], axis=0) \
            / np.sqrt(nrm2)
        res_at_rq = np.linalg.norm(AX - Xn * rq[None, :], axis=0) \
            / np.sqrt(nrm2)
        out[update] = dict(
            reported=[float(v) for v in np.asarray(pol.errors)],
            f64_res_at_returned_lambda=[float(v) for v in res_at_lam],
            f64_res_at_f64_rq=[float(v) for v in res_at_rq],
            lambda_minus_rq=[float(v) for v in (lam - rq)],
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
