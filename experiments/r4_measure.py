"""Round-4 TPU measurement batch.

    python experiments/r4_measure.py gjd_warm           # warm start A/B, 10M GJD
    python experiments/r4_measure.py gjd_warm --n 1000448
    python experiments/r4_measure.py all

Each result prints one JSON line; timings fetch scalars to host
(block_until_ready is unreliable through the tunnel — see CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def _finish(res, per_pair=False):
    import numpy as np
    out = dict(
        iterations=int(res.iterations),
        converged=bool(res.converged),
        inner_iterations=(None if res.inner_iterations is None
                          else int(res.inner_iterations)),
        eigenvalues=[float(v) for v in res.eigenvalues],
        max_residual=float(np.max(np.asarray(res.residual_norms))),
    )
    if per_pair:
        out["residuals"] = [float(v) for v in
                            np.asarray(res.residual_norms)]
        out["converged_pairs"] = [bool(v) for v in
                                  np.asarray(res.converged_pairs)]
    return out


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


def measure_pad(n: int):
    """Does an 8-aligned padded width m_max remove the chunked batched-
    gram dot's tiling relayout (profiled ~11.3 ms/iter at 10M: a 44->48
    sublane PAD + m-split interleave COPY of the 1.9 GB carry)?

    lowest=4 with the default max_dim=40 gives m_max=44; max_dim_sub=44
    gives m_max=48 (one extra expansion step per cycle — compare
    ms/iter, not wall)."""
    from fortran_davidson_tpu import eigensolve
    from fortran_davidson_tpu.models.generators import surrogate_hamiltonian

    op = surrogate_hamiltonian(n, dtype=jnp.float32)
    kw = dict(method="DPR", tolerance=1e-8, relative_tolerance=True,
              dtype="float32", refined=True, final_polish=3,
              expansion="lowest-k", max_iterations=60,
              carry_layout="chunked")
    out = {"probe": "mmax_pad", "n": n}
    for label, md in (("m44", 40), ("m48", 44)):
        r = eigensolve(op, 4, max_dim_sub=md, **kw)
        info = _finish(r)
        t0 = time.perf_counter()
        r = eigensolve(op, 4, max_dim_sub=md, **kw)
        info = _finish(r)
        dt = time.perf_counter() - t0
        info["wall_s"] = dt
        info["ms_per_iter"] = dt / max(info["iterations"], 1) * 1e3
        out[label] = info
    out["ms_per_iter_ratio"] = (out["m44"]["ms_per_iter"]
                                / out["m48"]["ms_per_iter"])
    print(json.dumps(out))
    return out


def measure_wide10m(n: int, max_dim_sub: int = 44, final_polish: int = 3):
    """The literal BASELINE north star: lowest-20 of a 10M-row operator
    to 1e-8 — on ONE chip. The default basis (max_dim_sub=10*k=200,
    m_max=220) needs 17.6 GB of carries at 10M rows (a pod shape); a
    narrow basis fits one v5e. max_dim_sub=60 (m_max=80, 6.4 GB V+AV)
    OOMs at 10M — the collapse rotation transiently doubles both tall
    carries — so the single-chip shape is max_dim_sub=44 (m_max=64,
    5.1 GB; ~10.5 GB transient peak). Progressive recipe (plain f32
    floor solve warm-starts the refined solve), chunked carries via the
    auto default."""
    from fortran_davidson_tpu import eigensolve
    from fortran_davidson_tpu.models.generators import surrogate_hamiltonian

    op = surrogate_hamiltonian(n, dtype=jnp.float32)
    out = {"probe": "wide10m_lowest20", "n": n, "max_dim_sub": max_dim_sub,
           "final_polish": final_polish}
    loose = dict(method="DPR", tolerance=1e-3, relative_tolerance=True,
                 dtype="float32", expansion="lowest-k",
                 max_dim_sub=max_dim_sub, max_iterations=30)
    kw = dict(loose, tolerance=1e-8, refined=True,
              final_polish=final_polish, max_iterations=120)

    def run():
        l = eigensolve(op, 20, **loose)
        return eigensolve(op, 20, initial_vectors=l.eigenvectors, **kw)

    r = run()
    info = _finish(r, per_pair=True)
    t0 = time.perf_counter()
    r = run()
    info = _finish(r, per_pair=True)
    info["wall_s"] = time.perf_counter() - t0
    out["progressive"] = info
    print(json.dumps(out))
    return out


def measure_batched(b: int = 128, n: int = 1024, k: int = 4):
    """Batched multi-problem throughput: one vmapped program vs a
    sequential per-problem loop (both on device, both warm). The batch
    fills the MXU that a single small solve leaves idle."""
    import numpy as np

    from fortran_davidson_tpu import eigensolve, eigensolve_batched

    rng = np.random.default_rng(0)
    d = np.arange(1, n + 1, dtype=np.float32)
    off = (rng.random((n, n), dtype=np.float32) - 0.5) * 2e-3
    base = np.triu(off, 1)
    base = base + base.T
    shifts = 1.0 + 0.05 * np.arange(b, dtype=np.float32)
    mats = shifts[:, None, None] * np.diag(d)[None] + base[None]
    kw = dict(tolerance=1e-4, dtype="float32", max_iterations=60)

    out = {"probe": "batched", "b": b, "n": n, "k": k}
    # Scalar fetches close every timed window — block_until_ready does
    # not block through the tunnel (module docstring / CLAUDE.md).
    r = eigensolve_batched(mats, k, **kw)
    float(jnp.sum(r.eigenvalues))
    t0 = time.perf_counter()
    r = eigensolve_batched(mats, k, **kw)
    float(jnp.sum(r.eigenvalues))
    out["batched_s"] = time.perf_counter() - t0
    out["batched_all_converged"] = bool(jnp.all(r.converged))

    # Sequential loop over the same problems (one compile, b dispatches);
    # a scalar accumulated across ALL results closes the window.
    r1 = eigensolve(mats[0], k, **kw)
    float(jnp.sum(r1.eigenvalues))
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for i in range(b):
        ri = eigensolve(mats[i], k, **kw)
        acc = acc + jnp.sum(ri.eigenvalues)
    float(acc)
    out["sequential_s"] = time.perf_counter() - t0
    out["speedup"] = out["sequential_s"] / out["batched_s"]
    out["problems_per_s_batched"] = b / out["batched_s"]
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("probe", choices=["gjd_warm", "pad", "batched",
                                      "wide10m", "all"])
    ap.add_argument("--n", type=int, default=10_000_384)
    ap.add_argument("--max-dim-sub", type=int, default=44)
    ap.add_argument("--final-polish", type=int, default=3)
    args = ap.parse_args()
    if args.probe in ("gjd_warm", "all"):
        measure_gjd_warm(args.n)
    if args.probe in ("pad", "all"):
        measure_pad(args.n)
    if args.probe in ("batched", "all"):
        measure_batched()
    if args.probe in ("wide10m", "all"):
        measure_wide10m(args.n, args.max_dim_sub, args.final_polish)


if __name__ == "__main__":
    main()
