"""SpMM kernel probe #1: chaining artifact, tile size, x-stationary schedule.

Measures on the real TPU (axon tunnel). Variants over the DIA banded
kernel at the bench shape (nbr=4096, bs=128, bw=2, m=256, bf16):

  v0-mulchain : current kernel, bench.py's y*(1+0*s) chain  (suspect:
                adds a full (n,m) rewrite = ~536 MB/iter of HBM traffic)
  v0-pingpong : current kernel, output fed as next input (operator
                pre-scaled to spectral radius <~1 so values stay bounded)
  r16         : 16-block-row tiles (halves the window-overlap waste,
                doubles per-tile MXU work)
  xstat       : x-stationary schedule — dots grouped by window block-row
                so consecutive MXU ops share the same rhs (weight) tile,
                f32 VMEM accumulators
  dma-only    : window DMAs + block streaming, no dots (DMA ceiling)
  compute-512 : nbr=512 (blocks fit streaming easily) to expose the MXU
                ceiling of the dot schedule

Prints one JSON line per measurement.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBR, BS, BW, M = 4096, 128, 2, 256
K = 2 * BW + 1
NB = 4  # window ring depth


def make_kernel(R, schedule="big", dma_only=False):
    W = R + 2 * BW

    def kernel(blocks_ref, x_hbm, out_ref, xbuf, sem, acc=None):
        bs = BS
        tile = pl.program_id(0)
        ntiles = pl.num_programs(0)
        D = NB - 1
        V = W - BW
        nbr = ntiles * R

        def edge_top(slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, V * bs), :],
                xbuf.at[slot, pl.ds(BW * bs, V * bs), :], sem.at[slot])

        def edge_bottom(slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds((nbr - V) * bs, V * bs), :],
                xbuf.at[slot, pl.ds(0, V * bs), :], sem.at[slot])

        def interior(slot, t):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds((t * R - BW) * bs, W * bs), :],
                xbuf.at[slot], sem.at[slot])

        def start_window(slot, t):
            @pl.when(t == 0)
            def _():
                edge_top(slot).start()

            @pl.when(t == ntiles - 1)
            def _():
                edge_bottom(slot).start()

            @pl.when((t > 0) & (t < ntiles - 1))
            def _():
                interior(slot, t).start()

        def wait_window(slot, t):
            @pl.when(t == 0)
            def _():
                edge_top(slot).wait()
                xbuf[slot, 0:BW * bs, :] = jnp.zeros(
                    (BW * bs, xbuf.shape[2]), xbuf.dtype)

            @pl.when(t == ntiles - 1)
            def _():
                edge_bottom(slot).wait()
                xbuf[slot, V * bs:, :] = jnp.zeros(
                    (W * bs - V * bs, xbuf.shape[2]), xbuf.dtype)

            @pl.when((t > 0) & (t < ntiles - 1))
            def _():
                interior(slot, t).wait()

        slot = tile % NB

        @pl.when(tile == 0)
        def _():
            for d in range(min(D, ntiles)):
                start_window(d % NB, d)

        @pl.when(tile + D < ntiles)
        def _():
            start_window((tile + D) % NB, tile + D)

        wait_window(slot, tile)

        if dma_only:
            out_ref[0] = xbuf[slot, :bs, :].astype(out_ref.dtype)
            for i in range(1, R):
                out_ref[i] = out_ref[0]
            return

        if schedule == "big":
            for i in range(R):
                out_ref[i] = jnp.dot(
                    blocks_ref[i], xbuf[slot, i * bs:(i + K) * bs, :],
                    preferred_element_type=jnp.float32,
                ).astype(out_ref.dtype)
        else:  # xstat: group dots by window block-row (shared rhs tile)
            mp = out_ref.shape[2]
            acc[...] = jnp.zeros((R, bs, mp), jnp.float32)
            for j in range(W):
                lo = max(0, j - K + 1)
                hi = min(R, j + 1)
                for i in range(lo, hi):
                    acc[i] += jnp.dot(
                        blocks_ref[i, :, (j - i) * bs:(j - i + 1) * bs],
                        xbuf[slot, j * bs:(j + 1) * bs, :],
                        preferred_element_type=jnp.float32)
            for i in range(R):
                out_ref[i] = acc[i].astype(out_ref.dtype)

    return kernel, W


def build_spmm(R, schedule="big", dma_only=False, nbr=NBR):
    kernel, W = make_kernel(R, schedule, dma_only)
    scratch = [
        pltpu.VMEM((NB, W * BS, M), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((NB,)),
    ]
    if schedule == "xstat" and not dma_only:
        scratch.append(pltpu.VMEM((R, BS, M), jnp.float32))

    @jax.jit
    def spmm(blocks, x):
        return pl.pallas_call(
            kernel,
            grid=(nbr // R,),
            in_specs=[
                pl.BlockSpec((R, BS, K * BS), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((R, BS, M), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            out_shape=jax.ShapeDtypeStruct((nbr, BS, M), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=2 * nbr * K * BS * BS * M,
                bytes_accessed=nbr * BS * K * BS * 2 + nbr * BS * M * 4,
                transcendentals=0,
            ),
        )(blocks, x).reshape(nbr * BS, M)

    return spmm


CHAIN = 20


def timed_pingpong(spmm, blocks, x):
    def chain(blocks, y):
        def body(_, y):
            return spmm(blocks, y)
        return jax.lax.fori_loop(0, CHAIN, body, y)

    cj = jax.jit(chain)
    z = cj(blocks, x)
    float(z[0, 0].astype(jnp.float32))  # warm + sync
    t0 = time.perf_counter()
    z = cj(blocks, x)
    s = float(z[0, 0].astype(jnp.float32))
    return (time.perf_counter() - t0) / CHAIN, s


def timed_mulchain(spmm, blocks, x):
    def chain(blocks, y):
        def body(_, carry):
            y, _ = carry
            z = spmm(blocks, y)
            s = z[0, 0].astype(jnp.float32)
            return y * (1.0 + 0.0 * s).astype(y.dtype), s
        return jax.lax.fori_loop(0, CHAIN, body, (y, jnp.float32(0)))[1]

    cj = jax.jit(chain)
    float(cj(blocks, x))
    t0 = time.perf_counter()
    s = float(cj(blocks, x))
    return (time.perf_counter() - t0) / CHAIN, s


def report(name, t, nbr=NBR):
    nnz = nbr * BS * K * BS
    eff = nnz * M / t
    # roofline at bf16: blocks + x once + out once (ignoring window overlap)
    bytes_min = nnz * 2 + nbr * BS * M * 2 * 2
    print(json.dumps(dict(name=name, ms=t * 1e3, eff_nnz_per_s=eff,
                          ideal_ms_819=bytes_min / 819e9 * 1e3)), flush=True)


def main():
    import numpy as np
    rng = np.random.default_rng(0)

    def make_blocks(nbr):
        # scaled so the operator's spectral radius is ~<1 (safe ping-pong)
        b = (rng.standard_normal((nbr, BS, K * BS)) * 0.02).astype(
            np.float32)
        return jnp.asarray(b, jnp.bfloat16)

    blocks = make_blocks(NBR)
    x = jnp.asarray(rng.standard_normal((NBR * BS, M)), jnp.bfloat16)

    print(json.dumps({"device": jax.devices()[0].device_kind}), flush=True)

    v0 = build_spmm(8, "big")
    t, _ = timed_mulchain(v0, blocks, x)
    report("v0-mulchain", t)
    t, _ = timed_pingpong(v0, blocks, x)
    report("v0-pingpong", t)

    t, _ = timed_pingpong(build_spmm(16, "big"), blocks, x)
    report("r16-pingpong", t)

    t, _ = timed_pingpong(build_spmm(8, "xstat"), blocks, x)
    report("xstat8-pingpong", t)

    t, _ = timed_pingpong(build_spmm(16, "xstat"), blocks, x)
    report("xstat16-pingpong", t)

    t, _ = timed_pingpong(build_spmm(8, "big", dma_only=True), blocks, x)
    report("dma-only-r8", t)

    nbr_s = 512
    blocks_s = make_blocks(nbr_s)
    x_s = jnp.asarray(rng.standard_normal((nbr_s * BS, M)), jnp.bfloat16)
    t, _ = timed_pingpong(build_spmm(8, "big", nbr=nbr_s), blocks_s, x_s)
    report("compute512-r8", t, nbr=nbr_s)
    t, _ = timed_pingpong(build_spmm(8, "xstat", nbr=nbr_s), blocks_s, x_s)
    report("compute512-xstat8", t, nbr=nbr_s)


if __name__ == "__main__":
    main()
