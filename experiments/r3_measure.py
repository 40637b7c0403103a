"""Round-3 TPU measurement batch (run when the axon tunnel is healthy).

One command per pending round-3 claim so a single session can capture
all the missing evidence:

    python experiments/r3_measure.py carry      # chunked vs flat, 10M refined
    python experiments/r3_measure.py carry --n 1000448
    python experiments/r3_measure.py gjd        # adaptive vs fixed, 10M GJD
    python experiments/r3_measure.py northstar  # progressive 1e-8 recipe
    python experiments/r3_measure.py all

(`python bench.py` separately records the fused SpMM+gram sweeps and the
ELL-vs-SELL remainder path in its JSON details.)

Each result prints one JSON line; timings fetch scalars to host
(block_until_ready is unreliable through the tunnel — see CLAUDE.md).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _finish(res):
    """Force completion through the tunnel and summarize."""
    import numpy as np
    return dict(
        iterations=int(res.iterations),
        converged=bool(res.converged),
        stalled=bool(np.asarray(res.stalled)) if res.stalled is not None
        else None,
        inner_iterations=(None if res.inner_iterations is None
                          else int(res.inner_iterations)),
        eigenvalues=[float(v) for v in res.eigenvalues],
        max_residual=float(np.max(np.asarray(res.residual_norms))),
    )


def measure_carry(n: int):
    """Chunked-carry vs flat layout: the layout-wall A/B (VERDICT r2 #3).

    Expect: identical trajectories (bit-identical on CPU; on TPU the
    compiled graphs differ so allow iteration-count equality only) and,
    if the escape works, ms/iter dropping from ~103 toward the ~55-60
    the relayout-copy accounting predicts at 10M rows.
    """
    from fortran_davidson_tpu import eigensolve
    from fortran_davidson_tpu.models.generators import surrogate_hamiltonian

    op = surrogate_hamiltonian(n, dtype=jnp.float32)
    kw = dict(method="DPR", tolerance=1e-8, relative_tolerance=True,
              dtype="float32", refined=True, final_polish=3,
              expansion="lowest-k", max_iterations=60)
    out = {"probe": "carry_layout", "n": n}
    for layout in ("flat", "chunked"):
        r = eigensolve(op, 4, carry_layout=layout, **kw)   # compile+warm
        info = _finish(r)
        t0 = time.perf_counter()
        r = eigensolve(op, 4, carry_layout=layout, **kw)
        info = _finish(r)
        dt = time.perf_counter() - t0
        info["wall_s"] = dt
        info["ms_per_iter"] = dt / max(info["iterations"], 1) * 1e3
        out[layout] = info
    if out["flat"]["ms_per_iter"] > 0:
        out["speedup"] = (out["flat"]["ms_per_iter"]
                          / out["chunked"]["ms_per_iter"])
    print(json.dumps(out))
    return out


def measure_gjd(n: int):
    """Adaptive vs fixed GJD inner stopping at scale (VERDICT r2 #5).

    Expect: outer iteration counts unchanged (the schedule is invisible
    against the convergence test) with wall time roughly halved from
    the reported 15-19 s via the MINRES stall cutoff + forcing terms.
    """
    from fortran_davidson_tpu import eigensolve
    from fortran_davidson_tpu.models.generators import surrogate_hamiltonian

    op = surrogate_hamiltonian(n, dtype=jnp.float32)
    kw = dict(method="GJD", tolerance=1e-8, relative_tolerance=True,
              dtype="float32", refined=True, final_polish=3,
              expansion="lowest-k", max_iterations=40,
              gjd_preconditioner="dpr")
    out = {"probe": "gjd_schedule", "n": n}
    for sched in ("adaptive", "fixed"):
        r = eigensolve(op, 3, gjd_inner_schedule=sched, **kw)
        info = _finish(r)
        t0 = time.perf_counter()
        r = eigensolve(op, 3, gjd_inner_schedule=sched, **kw)
        info = _finish(r)
        info["wall_s"] = time.perf_counter() - t0
        out[sched] = info
    if out["fixed"]["wall_s"] > 0:
        out["speedup"] = out["fixed"]["wall_s"] / out["adaptive"]["wall_s"]
    print(json.dumps(out))
    return out


def measure_wide(n: int):
    """Lowest-20 at single-chip scale (the BASELINE north-star k;
    the 10M-row variant is a pod workload). Wide-basis engine:
    m_max = max_dim + k = 220, refined + polish to honest 1e-8."""
    from fortran_davidson_tpu import eigensolve
    from fortran_davidson_tpu.models.generators import surrogate_hamiltonian

    op = surrogate_hamiltonian(n, dtype=jnp.float32)
    kw = dict(method="DPR", tolerance=1e-8, relative_tolerance=True,
              dtype="float32", refined=True, final_polish=3,
              expansion="lowest-k", max_iterations=120)
    out = {"probe": "wide_lowest20", "n": n}
    for layout in ("flat", "chunked"):
        r = eigensolve(op, 20, carry_layout=layout, **kw)
        info = _finish(r)
        t0 = time.perf_counter()
        r = eigensolve(op, 20, carry_layout=layout, **kw)
        info = _finish(r)
        info["wall_s"] = time.perf_counter() - t0
        out[layout] = info
    print(json.dumps(out))
    return out


def measure_northstar():
    """The round-2 headline re-measurement command (VERDICT r2 #1)."""
    import subprocess
    import sys
    cmd = [sys.executable, "-m",
           "fortran_davidson_tpu.examples.northstar", "--progressive",
           "--tolerance", "1e-8", "--expansion", "lowest-k"]
    t0 = time.perf_counter()
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    out = {"probe": "northstar", "rc": p.returncode,
           "wall_s": time.perf_counter() - t0,
           "stdout_tail": p.stdout[-2000:], "stderr_tail": p.stderr[-500:]}
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("probe",
                    choices=["carry", "gjd", "wide", "northstar", "all"])
    ap.add_argument("--n", type=int, default=10_000_384)
    args = ap.parse_args()
    if args.probe in ("carry", "all"):
        measure_carry(args.n)
    if args.probe in ("gjd", "all"):
        measure_gjd(args.n)
    if args.probe in ("wide", "all"):
        # 1M rows: (n, 220) V/AV fit one chip comfortably.
        measure_wide(min(args.n, 1_000_448))
    if args.probe in ("northstar", "all"):
        measure_northstar()


if __name__ == "__main__":
    main()
