"""Round-4 TPU measurement batch.

    python experiments/r4_measure.py gjd_warm           # warm start A/B, 10M GJD
    python experiments/r4_measure.py gjd_warm --n 1000448
    python experiments/r4_measure.py all

Each result prints one JSON line; timings fetch scalars to host
(block_until_ready is unreliable through the tunnel — see CLAUDE.md).
"""

import argparse
import json
import time

import jax.numpy as jnp


def _finish(res):
    import numpy as np
    return dict(
        iterations=int(res.iterations),
        converged=bool(res.converged),
        inner_iterations=(None if res.inner_iterations is None
                          else int(res.inner_iterations)),
        eigenvalues=[float(v) for v in res.eigenvalues],
        max_residual=float(np.max(np.asarray(res.residual_norms))),
    )


def measure_gjd_warm(n: int):
    """Cross-outer-iteration GJD warm start A/B (ROADMAP "next lever").

    Expect: outer iterations unchanged (the recycled guess is solved to
    the same absolute target), cumulative inner MINRES iterations — the
    GJD-at-scale cost — reduced, wall time following.
    """
    from fortran_davidson_tpu import eigensolve
    from fortran_davidson_tpu.models.generators import surrogate_hamiltonian

    op = surrogate_hamiltonian(n, dtype=jnp.float32)
    kw = dict(method="GJD", tolerance=1e-8, relative_tolerance=True,
              dtype="float32", refined=True, final_polish=3,
              expansion="lowest-k", max_iterations=40,
              gjd_preconditioner="dpr")
    out = {"probe": "gjd_warm_start", "n": n}
    for ws in (False, True):
        r = eigensolve(op, 3, gjd_warm_start=ws, **kw)
        info = _finish(r)
        t0 = time.perf_counter()
        r = eigensolve(op, 3, gjd_warm_start=ws, **kw)
        info = _finish(r)
        info["wall_s"] = time.perf_counter() - t0
        out["warm" if ws else "cold"] = info
    if out["warm"]["wall_s"] > 0:
        out["speedup"] = out["cold"]["wall_s"] / out["warm"]["wall_s"]
        out["inner_reduction"] = (
            out["cold"]["inner_iterations"]
            / max(out["warm"]["inner_iterations"], 1))
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("probe", choices=["gjd_warm", "all"])
    ap.add_argument("--n", type=int, default=10_000_384)
    args = ap.parse_args()
    if args.probe in ("gjd_warm", "all"):
        measure_gjd_warm(args.n)


if __name__ == "__main__":
    main()
