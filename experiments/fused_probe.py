"""Fused SpMM+Gram bottleneck isolation (round 3).

The no-write fused int8 sweep measured 2.267 ms for 952 MB of pure
reads (~420 GB/s) while the same windowed-DMA read path sustains
786 GB/s in isolation (`spmm_probe5.py`) — ~1.9x headroom. Candidate
costs, each isolated by one variant below:

  rowgram   — the shipped kernel (per-row gram dot += into the VMEM
              accumulator): the baseline.
  tilegram  — stage the R row results in a VMEM scratch and run ONE
              (R*bs)-deep gram dot per tile: fewer accumulator RMWs,
              deeper MXU contraction.
  nogram    — v still streamed, y consumed by a VPU row-sum only:
              isolates the gram MXU dot's cost.
  nov       — no v operand at all: the pure-read SpMM ceiling of this
              sweep (blocks + windows only).
  bf16deq   — dequantize int8 -> bf16 and multiply by a bf16 scale so
              the SpMM dot runs the native bf16 MXU path instead of
              f32xbf16: isolates the f32-dequant dot's cost.

Run (TPU):  python experiments/fused_probe.py [--nb 4] [--chain 100]
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

from fortran_davidson_tpu.ops.pallas_kernels import (
    _banded_sweep, _gram_plan)
from fortran_davidson_tpu.ops.sparse import (
    generate_banded_bsr, quantize_banded_int8)


def _spmm_row(blocks_ref, srow_ref, diag_ref, xbuf, i, slot, *, K, bw,
              dequant):
    """The SpMM part of one block row under the selected dequant scheme.

    f32     — the shipped scheme: int8 -> f32 cast * f32 scale, then a
              mixed f32 x bf16 MXU dot (multiple passes).
    bf16    — dequantize to bf16 (scale multiply rounds the blocks to
              bf16), single-pass bf16 MXU dot.
    slotdot — exact int8 -> bf16 cast (integers <= 127 are exact in
              bf16), K per-slot single-pass bf16 dots, and the f32
              per-slot scale applied to the f32 PARTIALS — full scale
              precision with 1-pass MXU work.
    """
    bs = blocks_ref.shape[1]
    if dequant == "slotdot":
        qb = blocks_ref[i].astype(jnp.bfloat16)
        acc = None
        for k in range(K):
            part = jnp.dot(qb[:, k * bs:(k + 1) * bs],
                           xbuf[slot, (i + k) * bs:(i + k + 1) * bs, :],
                           preferred_element_type=jnp.float32)
            term = part * srow_ref[i][k * bs]
            acc = term if acc is None else acc + term
    elif dequant == "bf16":
        w = (blocks_ref[i].astype(jnp.bfloat16)
             * srow_ref[i][None, :].astype(jnp.bfloat16))
        acc = jnp.dot(w, xbuf[slot, i * bs:(i + K) * bs, :],
                      preferred_element_type=jnp.float32)
    else:
        w = blocks_ref[i].astype(jnp.float32) * srow_ref[i][None, :]
        acc = jnp.dot(w, xbuf[slot, i * bs:(i + K) * bs, :],
                      preferred_element_type=jnp.float32)
    ctr = xbuf[slot, (i + bw) * bs:(i + bw + 1) * bs, :]
    return acc + diag_ref[i][:, None] * ctr.astype(jnp.float32)


def _q_nowrite_kernel(blocks_ref, srow_ref, diag_ref, v_ref, x_hbm,
                      g_ref, xbuf, sem, *maybe_ybuf, K, bw, W, nbr, R, NB,
                      mode):
    bs = blocks_ref.shape[1]
    ybuf = maybe_ybuf[0] if maybe_ybuf else None
    dequant = {"bf16deq": "bf16", "tg_bf16deq": "bf16",
               "tg_slotdot": "slotdot"}.get(mode, "f32")

    def compute_row(i, slot):
        y_i = _spmm_row(blocks_ref, srow_ref, diag_ref, xbuf, i, slot,
                        K=K, bw=bw, dequant=dequant)
        if mode in ("rowgram", "bf16deq"):
            g_ref[:] += jax.lax.dot_general(
                v_ref[pl.ds(i * bs, bs), :], y_i.astype(v_ref.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode in ("tilegram", "tg_bf16deq", "tg_slotdot"):
            ybuf[pl.ds(i * bs, bs), :] = y_i.astype(ybuf.dtype)
        elif mode == "nogram":
            g_ref[0:1, :] += jnp.sum(y_i, axis=0, keepdims=True)
        return y_i

    def init_gram():
        g_ref[:] = jnp.zeros(g_ref.shape, g_ref.dtype)

    _banded_sweep(x_hbm, xbuf, sem, bs=bs, bw=bw, W=W, nbr=nbr, R=R,
                  NB=NB, compute_row=compute_row, out=None,
                  on_first_tile=init_gram)
    if mode in ("tilegram", "tg_bf16deq", "tg_slotdot"):
        g_ref[:] += jax.lax.dot_general(
            v_ref[:], ybuf[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _q_nov_kernel(blocks_ref, srow_ref, diag_ref, x_hbm, g_ref, xbuf, sem,
                  *, K, bw, W, nbr, R, NB, dequant="f32"):
    bs = blocks_ref.shape[1]

    def compute_row(i, slot):
        y_i = _spmm_row(blocks_ref, srow_ref, diag_ref, xbuf, i, slot,
                        K=K, bw=bw, dequant=dequant)
        g_ref[0:1, :] += jnp.sum(y_i, axis=0, keepdims=True)
        return y_i

    def init_gram():
        g_ref[:] = jnp.zeros(g_ref.shape, g_ref.dtype)

    _banded_sweep(x_hbm, xbuf, sem, bs=bs, bw=bw, W=W, nbr=nbr, R=R,
                  NB=NB, compute_row=compute_row, out=None,
                  on_first_tile=init_gram)


def build(mode, qop, m, NB_override=None):
    qblocks, srows, diag = qop.qblocks, qop.scale_rows, qop.diag
    nbr, bs, kbs = qblocks.shape
    K = kbs // bs
    bw = (K - 1) // 2
    mp = mvp = m
    b_item = 1 + 4 / bs + 4 / (K * bs)
    v_item = 0 if mode.startswith("nov") else 2
    plan = _gram_plan(nbr, bs, K, bw, m, m, 2, b_item, 0, v_item)
    assert plan is not None
    R, NB, W = plan
    if NB_override:
        NB = NB_override
    g_shape = jax.ShapeDtypeStruct((mvp, mp), jnp.float32)
    g_spec = pl.BlockSpec((mvp, mp), lambda r: (0, 0),
                          memory_space=pltpu.VMEM)
    base_specs = [
        pl.BlockSpec((R, bs, K * bs), lambda r: (r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, K * bs), lambda r: (r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, bs), lambda r: (r, 0), memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((NB, W * bs, mp), jnp.bfloat16),
               pltpu.SemaphoreType.DMA((NB,))]
    # NOTE: the operator arrays must be jit ARGUMENTS, never captured
    # constants — the tunnel's remote-compile RPC rejects large bodies
    # (HTTP 413), see CLAUDE.md.
    if mode.startswith("nov"):
        kern = functools.partial(
            _q_nov_kernel, K=K, bw=bw, W=W, nbr=nbr, R=R, NB=NB,
            dequant={"nov_bf16": "bf16", "nov_slotdot": "slotdot"}
            .get(mode, "f32"))
        in_specs = base_specs + [pl.BlockSpec(memory_space=pl.ANY)]

        @jax.jit
        def run(qb, sr, dg, x):
            return pl.pallas_call(
                kern, grid=(nbr // R,), in_specs=in_specs,
                out_specs=g_spec, scratch_shapes=scratch,
                out_shape=g_shape,
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(qb, sr, dg, x)
        return run, (R, NB, W)

    kern = functools.partial(_q_nowrite_kernel, K=K, bw=bw, W=W, nbr=nbr,
                             R=R, NB=NB, mode=mode)
    in_specs = base_specs + [
        pl.BlockSpec((R * bs, mvp), lambda r: (r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if mode in ("tilegram", "tg_bf16deq", "tg_slotdot"):
        scratch = scratch + [pltpu.VMEM((R * bs, mp), jnp.bfloat16)]

    @jax.jit
    def run(qb, sr, dg, x, v):
        return pl.pallas_call(
            kern, grid=(nbr // R,), in_specs=in_specs,
            out_specs=g_spec, scratch_shapes=scratch, out_shape=g_shape,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(qb, sr, dg, v, x)
    return run, (R, NB, W)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbr", type=int, default=4096)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--chain", type=int, default=100)
    ap.add_argument("--nb", type=int, default=0,
                    help="override window-ring depth (0 = planned)")
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
    v = jax.random.normal(jax.random.PRNGKey(1), (n, m),
                          jnp.float32).astype(jnp.bfloat16)
    nnz = int(base.blocks.size)
    nb = args.nb or None

    qb, sr, dg = qop.qblocks, qop.scale_rows, qop.diag
    out = {"nbr": nbr, "m": m, "nnz": nnz}
    modes = ("rowgram", "tilegram", "nogram", "nov", "bf16deq",
             "tg_bf16deq", "tg_slotdot", "nov_bf16", "nov_slotdot")
    for mode in modes:
        try:
            run, plan = build(mode, qop, m, NB_override=nb)
            if mode.startswith("nov"):
                def chain(qb, sr, dg, y):
                    def body(_, y):
                        g = run(qb, sr, dg, y)
                        return y.at[0, 0].add(g[0, 0].astype(y.dtype)
                                              * 1e-30)
                    return jax.lax.fori_loop(0, args.chain, body, y)
                cj = jax.jit(chain)
                z = cj(qb, sr, dg, x); float(z[0, 0].astype(jnp.float32))
                t0 = time.perf_counter()
                z = cj(qb, sr, dg, x); float(z[0, 0].astype(jnp.float32))
            else:
                def chain(qb, sr, dg, y, vv):
                    def body(_, y):
                        g = run(qb, sr, dg, y, vv)
                        return y.at[0, 0].add(g[0, 0].astype(y.dtype)
                                              * 1e-30)
                    return jax.lax.fori_loop(0, args.chain, body, y)
                cj = jax.jit(chain)
                z = cj(qb, sr, dg, x, v)
                float(z[0, 0].astype(jnp.float32))
                t0 = time.perf_counter()
                z = cj(qb, sr, dg, x, v)
                float(z[0, 0].astype(jnp.float32))
            dt = (time.perf_counter() - t0) / args.chain
            reads = (qop.qblocks.size + qop.scale_rows.size * 4
                     + qop.diag.size * 4)
            R, NB, W = plan
            reads += (nbr // R) * W * bs * m * 2
            if not mode.startswith("nov"):
                reads += n * m * 2
            out[mode] = {"time_s": dt, "plan_RNBW": list(plan),
                         "read_GBps": reads / dt / 1e9,
                         "eff_nnz_per_s": nnz * m / dt}
        except Exception as e:  # noqa: BLE001 — probe records failures
            out[mode] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
