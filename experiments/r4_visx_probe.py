"""Round-4 probe: v_is_x fused gram (single x read + R=32 tiles).

The round-3 fused no-write sweep (`fused_nowrite_int8`, bench shape
nbr=4096/bs=128/bw=2/m=256) measured 1.619 ms while streaming x TWICE
(window ring + pipelined v operand) — 952 MB counted, ~268 MB of it the
redundant v stream — and capped at ~566 GB/s from DMA-issue contention
between the three concurrent streams. This probe measures the shipped
kernels' v=None path (gram contracted from the window buffer's center
rows; freed VMEM admits R=32 tiles) against the explicit v=x path, for
both write_out settings.

Run (TPU): python experiments/r4_visx_probe.py [--chain 100]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nbr", type=int, default=4096)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--chain", type=int, default=100)
    args = ap.parse_args()

    from fortran_davidson_tpu.ops.pallas_kernels import _gram_plan
    from fortran_davidson_tpu.ops.sparse import (
        generate_banded_bsr, quantize_banded_int8)

    nbr, bs, bw, m = args.nbr, 128, 2, args.m
    K = 2 * bw + 1
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

    def timed(fn, *arrs):
        # The operator rides as a jit ARGUMENT (pytree) — captured
        # constants blow the tunnel's remote-compile body limit.
        z = fn(qop, *arrs)
        float(z[0, 0].astype(jnp.float32))
        t0 = time.perf_counter()
        z = fn(qop, *arrs)
        float(z[0, 0].astype(jnp.float32))
        return (time.perf_counter() - t0) / args.chain

    def chain_nw(explicit_v):
        def body(q, y):
            g = q.matmat_with_gram(y, y if explicit_v else None,
                                   write_out=False)
            return y.at[0, 0].add(g[0, 0].astype(y.dtype) * 1e-30)
        return jax.jit(lambda q, y: jax.lax.fori_loop(
            0, args.chain, lambda _, yy: body(q, yy), y))

    def chain_w(explicit_v):
        def body(q, y):
            y2, g = q.matmat_with_gram(y, y if explicit_v else None)
            return y2.at[0, 0].add(g[0, 0].astype(y2.dtype) * 1e-30)
        return jax.jit(lambda q, y: jax.lax.fori_loop(
            0, args.chain, lambda _, yy: body(q, yy), y))

    b_item = 1 + 4 / bs + 4 / (K * bs)
    out = {"probe": "visx_fused", "nbr": nbr, "m": m, "nnz": nnz}
    nominal = 819.2e9  # v5e HBM
    aux = nbr * K * bs * 4 + nbr * bs * 4
    for name, fn, v_is_x, out_item in (
            ("nowrite_explicit_v", chain_nw(True), False, 0),
            ("nowrite_visx", chain_nw(False), True, 0),
            ("write_explicit_v", chain_w(True), False, 2),
            ("write_visx", chain_w(False), True, 2)):
        plan = _gram_plan(nbr, bs, K, bw, m, m, 2, b_item, out_item, 2,
                          v_is_x)
        R, NB, W = plan
        t = timed(fn, x)
        reads = (nnz + aux + (nbr // R) * W * bs * m * 2
                 + (0 if v_is_x else n * m * 2))
        bytes_min = reads + (n * m * 2 if out_item else 0)
        out[name] = dict(
            time_s=t, plan=[R, NB, W],
            eff_nnz_per_s=nnz * m / t,
            bytes_min=bytes_min,
            frac_of_nominal=bytes_min / nominal / t,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
