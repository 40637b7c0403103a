"""Round-5 probe: attack or bound the fused SpMM+Gram WRITE variant.

Round 4 left the write variant (Y = A@X written to HBM + G = Xt A X,
the op the cached-AV engines consume) at 0.498 of its NOMINAL two-leg
roofline — the one bench number clearly below target. Known platform
fact (spmm_probe5): Pallas VMEM->HBM writes sustain ~250-260 GB/s vs
819 nominal, so a nominal-bandwidth write leg may simply be
unattainable by ANY kernel that writes its output.

This probe (a) sweeps the output write-ring depth NBO (2/3/4 — deeper
rings hide more write latency behind compute), and (b) measures the
same-pattern PURE-DMA copy at the fused kernel's own (R, W) geometry —
identical block stream + x windows + output writes, zero MXU — which is
the honest light speed for this op's data movement on this chip. The
conclusion feeds bench.py's fused_gram.write scoring the same way the
plain SpMM is already scored against its measured copy.

Run (TPU): python experiments/r5_write_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fortran_davidson_tpu.ops import pallas_kernels as pk
from fortran_davidson_tpu.ops.sparse import (generate_banded_bsr,
                                             quantize_banded_int8)

CHAIN = 100


def timed(fn, *args):
    z = fn(*args)
    float(jnp.asarray(z[0]).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    z = fn(*args)
    float(jnp.asarray(z[0]).reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / CHAIN


def chain_write(q, y):
    def body(_, y):
        y2, g = q.matmat_with_gram(y)
        return y2.at[0, 0].add(g[0, 0].astype(y2.dtype) * 1e-30)
    return jax.lax.fori_loop(0, CHAIN, body, y)


def main():
    nbr, bs, bw, m = 4096, 128, 2, 256
    base = generate_banded_bsr(nbr, bs, bandwidth=bw, coupling=1e-3,
                               dtype=jnp.float32)
    scale = 1.0 / (nbr * bs * 2.0)
    base = type(base)(base.block_cols, base.blocks * scale,
                      backend=base.backend, bandwidth=base.bandwidth)
    qop = quantize_banded_int8(base).with_backend("pallas")
    n = qop.shape[0]
    nnz = int(base.blocks.size)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, m),
                          jnp.float32).astype(jnp.bfloat16)
    out = {"shape": dict(nbr=nbr, bs=bs, bw=bw, m=m, n=n, nnz=nnz)}

    # (a) write-ring depth sweep. _N_OUT_BUFFERS is read at trace time;
    # clear jit caches so each depth really re-traces.
    default_nbo = pk._N_OUT_BUFFERS
    for nbo in (2, 3, 4):
        pk._N_OUT_BUFFERS = nbo
        jax.clear_caches()
        try:
            t = timed(jax.jit(chain_write), qop, x)
            out[f"write_nbo{nbo}_s"] = t
            out[f"write_nbo{nbo}_eff_nnz_per_s"] = nnz * m / t
        except Exception as e:  # noqa: BLE001
            out[f"write_nbo{nbo}_error"] = str(e)[:200]
        print(json.dumps({k: v for k, v in out.items() if str(nbo) in k}),
              flush=True)
    pk._N_OUT_BUFFERS = default_nbo
    jax.clear_caches()

    # (b) measured same-pattern copy at the FUSED kernel's geometry.
    K = 2 * bw + 1
    b_item_q = 1 + 4 / bs + 4 / (K * bs)
    fplan = pk._gram_plan(nbr, bs, K, bw, m, m, 2, b_item_q, 2, 2, True)
    out["fused_plan_RNBW"] = fplan
    if fplan is not None:
        Rf, NBf, Wf = fplan
        from bench import _copy_roofline_kernel  # noqa: E402
        copy_fn = _copy_roofline_kernel(bs, K, Wf, Rf, NBf, m,
                                        jnp.int8, jnp.bfloat16,
                                        jnp.bfloat16, nbr)
        copy_chain = jax.jit(lambda b, y: jax.lax.fori_loop(
            0, CHAIN, lambda _, yy: copy_fn(b, yy), y))
        t_copy = timed(copy_chain, qop.qblocks, x)
        out["copy_same_pattern_s"] = t_copy
        reads = (nnz * 1 + nbr * K * bs * 4 + nbr * bs * 4
                 + (nbr // Rf) * Wf * bs * m * 2)
        writes = n * m * 2
        out["copy_bytes"] = reads + writes
        out["copy_sustained_GBps"] = (reads + writes) / t_copy / 1e9
        flops = 2 * nnz * m + 2 * n * m * m
        mxu_leg = flops / 197e12
        t_w = min(v for k, v in out.items()
                  if k.startswith("write_nbo") and k.endswith("_s"))
        out["best_write_s"] = t_w
        out["frac_of_measured_copy"] = t_copy / t_w
        out["frac_of_two_leg_measured"] = max(t_copy, mxu_leg) / t_w
        out["mxu_leg_s"] = mxu_leg
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
