"""Capture a jax.profiler trace of the warm 10M chunked refined solve
and aggregate device-op durations by HLO category/name.

    python experiments/trace_chunked.py [--n 10000384] [--layout auto]

Prints a JSON summary of the top ops (total ms across the solve) so the
remaining per-iteration cost can be attributed without TensorBoard.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_384)
    ap.add_argument("--layout", default="auto")
    ap.add_argument("--lowest", type=int, default=4)
    ap.add_argument("--warm", action="store_true", help="progressive: loose solve warm-starts the traced refined solve")
    ap.add_argument("--dir", default="/tmp/jaxtrace")
    args = ap.parse_args()

    from fortran_davidson_tpu import eigensolve
    from fortran_davidson_tpu.models.generators import surrogate_hamiltonian

    op = surrogate_hamiltonian(args.n, dtype=jnp.float32)
    kw = dict(method="DPR", tolerance=1e-8, relative_tolerance=True,
              dtype="float32", refined=True, final_polish=3,
              expansion="lowest-k", max_iterations=60,
              carry_layout=args.layout)
    x0 = None
    if args.warm:
        l = eigensolve(op, args.lowest, method="DPR", tolerance=1e-3,
                       relative_tolerance=True, dtype="float32",
                       expansion="lowest-k", max_iterations=30)
        int(l.iterations)
        x0 = l.eigenvectors
        kw["initial_vectors"] = x0
    r = eigensolve(op, args.lowest, **kw)          # compile + warm
    iters = int(r.iterations)
    print(f"warm: iters={iters} converged={bool(r.converged)}",
          flush=True)

    jax.profiler.start_trace(args.dir)
    r = eigensolve(op, args.lowest, **kw)
    iters = int(r.iterations)            # host fetch forces completion
    jax.profiler.stop_trace()

    files = sorted(glob.glob(
        os.path.join(args.dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        print(json.dumps({"error": "no trace file"}))
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # Aggregate complete events on device tracks (TensorCore pids).
    dev_pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                dev_pids.add(ev["pid"])
    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        totals[name] += ev.get("dur", 0) / 1e3  # us -> ms
        counts[name] += 1
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
    print(json.dumps({
        "iters": iters,
        "device_pids": sorted(dev_pids),
        "top_ops_ms": [
            {"name": k[:120], "total_ms": round(v, 2),
             "count": counts[k],
             "ms_per_iter": round(v / max(iters, 1), 2)}
            for k, v in top],
    }))


if __name__ == "__main__":
    main()
