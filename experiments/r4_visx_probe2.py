"""Round-4 probe 2: where does the v_is_x fused no-write sweep's time go?

Probe 1 (`r4_visx_probe.py`) measured the v_is_x kernel at 1.538 ms vs
1.563 ms for the explicit-v kernel — removing 268 MB (~27%) of reads
moved time by 1.6%. Hypothesis shift: the sweep is no longer
memory-bound at all. Arithmetic: SpMM 2*nnz*m = 171.8 GFLOP + gram
2*n*m^2 = 68.7 GFLOP in 1.538 ms = 156 TFLOP/s — ~79% of the v5e's
197 TFLOP/s bf16 MXU peak. This probe A/Bs (R, NB) and the gram's
presence at fixed traffic to separate window-DMA-issue effects from MXU
saturation.

Run (TPU): python experiments/r4_visx_probe2.py
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fortran_davidson_tpu.ops import pallas_kernels as pk
from fortran_davidson_tpu.ops.sparse import (
    generate_banded_bsr, quantize_banded_int8)


def build(qop, m, R, NB, mode):
    """mode: 'visx' (fused gram from window center), 'nogram' (pure
    sweep, VPU row-sum consumer), 'visx_f32acc' (gram accumulated
    straight from the f32 row results — no bf16 ybuf round trip)."""
    qblocks = qop.qblocks
    nbr, bs, kbs = qblocks.shape
    K = kbs // bs
    bw = (K - 1) // 2
    W = R + 2 * bw
    mp = m

    def kernel(blocks_ref, srow_ref, diag_ref, x_hbm, g_ref, xbuf, sem,
               *maybe_ybuf):
        ybuf = maybe_ybuf[0] if maybe_ybuf else None

        def compute_row(i, slot):
            w = blocks_ref[i].astype(jnp.float32) * srow_ref[i][None, :]
            acc = jnp.dot(w, xbuf[slot, i * bs:(i + K) * bs, :],
                          preferred_element_type=jnp.float32)
            ctr = xbuf[slot, (i + bw) * bs:(i + bw + 1) * bs, :]
            y_i = acc + diag_ref[i][:, None] * ctr.astype(jnp.float32)
            if ybuf is not None:
                ybuf[pl.ds(i * bs, bs), :] = y_i.astype(ybuf.dtype)
            else:
                g_ref[0:1, :] += jnp.sum(y_i, axis=0, keepdims=True)
            return y_i

        def init_gram():
            g_ref[:] = jnp.zeros(g_ref.shape, g_ref.dtype)

        pk._banded_sweep(x_hbm, xbuf, sem, bs=bs, bw=bw, W=W, nbr=nbr,
                         R=R, NB=NB, compute_row=compute_row, out=None,
                         on_first_tile=init_gram)
        if ybuf is not None:
            slot = pl.program_id(0) % NB
            vblk = xbuf[slot, bw * bs:(bw + R) * bs, :]
            g_ref[:] += jax.lax.dot_general(
                vblk, ybuf[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    in_specs = [
        pl.BlockSpec((R, bs, K * bs), lambda r: (r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, K * bs), lambda r: (r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, bs), lambda r: (r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [pltpu.VMEM((NB, W * bs, mp), jnp.bfloat16),
               pltpu.SemaphoreType.DMA((NB,))]
    if mode == "visx":
        scratch.append(pltpu.VMEM((R * bs, mp), jnp.bfloat16))
    elif mode == "visx_f32acc":
        scratch.append(pltpu.VMEM((R * bs, mp), jnp.float32))
    g_shape = jax.ShapeDtypeStruct((mp, mp), jnp.float32)
    g_spec = pl.BlockSpec((mp, mp), lambda r: (0, 0),
                          memory_space=pltpu.VMEM)

    @jax.jit
    def run(qb, sr, dg, x):
        return pl.pallas_call(
            kernel, grid=(nbr // R,), in_specs=in_specs,
            out_specs=g_spec, scratch_shapes=scratch, out_shape=g_shape,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(qb, sr, dg, x)
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbr", type=int, default=4096)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--chain", type=int, default=100)
    args = ap.parse_args()

    nbr, bs, bw, m = args.nbr, 128, 2, args.m
    base = generate_banded_bsr(nbr, bs, bandwidth=bw, coupling=1e-3,
                               dtype=jnp.float32)
    scale = 1.0 / (nbr * bs * 2.0)
    base = type(base)(base.block_cols, base.blocks * scale,
                      backend=base.backend, bandwidth=base.bandwidth)
    qop = quantize_banded_int8(base).with_backend("pallas")
    n = nbr * bs
    x = jax.random.normal(jax.random.PRNGKey(0), (n, m),
                          jnp.float32).astype(jnp.bfloat16)
    nnz = int(base.blocks.size)
    qb, sr, dg = qop.qblocks, qop.scale_rows, qop.diag

    out = {"probe": "visx2", "nbr": nbr, "m": m, "nnz": nnz}
    cases = [
        ("visx_R32_NB2", 32, 2, "visx"),
        ("visx_R32_NB3", 32, 3, "visx"),      # 14.7 MB — may not map
        ("visx_R16_NB4", 16, 4, "visx"),
        ("visx_R16_NB6", 16, 6, "visx"),
        ("nogram_R32_NB3", 32, 3, "nogram"),
        ("nogram_R16_NB4", 16, 4, "nogram"),
        ("visxf32_R16_NB4", 16, 4, "visx_f32acc"),
    ]
    for name, R, NB, mode in cases:
        try:
            run = build(qop, m, R, NB, mode)

            def chain(qb, sr, dg, y):
                def body(_, yy):
                    g = run(qb, sr, dg, yy)
                    return yy.at[0, 0].add(g[0, 0].astype(yy.dtype)
                                           * 1e-30)
                return jax.lax.fori_loop(0, args.chain, body, y)
            cj = jax.jit(chain)
            z = cj(qb, sr, dg, x)
            float(z[0, 0].astype(jnp.float32))
            t0 = time.perf_counter()
            z = cj(qb, sr, dg, x)
            float(z[0, 0].astype(jnp.float32))
            dt = (time.perf_counter() - t0) / args.chain
            W = R + 2 * bw
            reads = (nnz + nbr * (kq := 2 * bw + 1) * bs * 4
                     + nbr * bs * 4 + (nbr // R) * W * bs * m * 2)
            flops = 2 * nnz * m + (0 if mode == "nogram"
                                   else 2 * n * m * m)
            out[name] = dict(
                time_s=dt, GBps=reads / dt / 1e9,
                TFLOPs=flops / dt / 1e12)
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
