"""SpMM probe #2: amortized timing (CHAIN=100) + DMA-bandwidth levers.

Probe 1 showed the kernel is 100% DMA-bound (dma-only == full kernel) at
~420 GB/s sustained (after removing a ~18 ms fixed chain overhead that
probe 1's CHAIN=20 hid). Levers measured here:

  v0        : baseline (NB=4 window ring, auto block pipeline)
  nb8       : window ring depth 8
  blkring   : manual block prefetch ring depth 3 (blocks via pl.ANY +
              make_async_copy instead of the automatic grid pipeline)
  split2    : window fetched as 2 parallel half-DMAs (engage 2 DMA engines)
  readonly  : same reads, output written to a single shared tile
              (index_map -> 0): the read-mostly ceiling of this pattern
  int8      : blocks stored int8, dequantized to bf16 in-kernel
              (halves block traffic; accuracy probe separate)
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBR, BS, BW, M = 4096, 128, 2, 256
K = 2 * BW + 1
R = 8
W = R + 2 * BW
CHAIN = 100


def window_dmas(x_hbm, xbuf, sem, slot, t, ntiles, nbr, split=1):
    """DMAs for tile t's window (interior only; edges handled by caller
    zeroing). Returns list of copy objects."""
    copies = []
    rows = W * BS
    start = (t * R - BW) * BS
    step = rows // split
    for s in range(split):
        copies.append(pltpu.make_async_copy(
            x_hbm.at[pl.ds(start + s * step, step), :],
            xbuf.at[slot, pl.ds(s * step, step), :],
            sem.at[slot, s]))
    return copies


def make_kernel(nb=4, split=1, manual_blocks=False, int8=False,
                readonly=False):
    def kernel(*refs):
        if manual_blocks:
            (blocks_hbm, x_hbm, out_ref, xbuf, sem, bbuf, bsem) = refs
        else:
            (blocks_ref, x_hbm, out_ref, xbuf, sem) = refs
        tile = pl.program_id(0)
        ntiles = pl.num_programs(0)
        nbr = ntiles * R
        D = nb - 1

        def win_copies(slot, t):
            # interior windows only; first/last tile use a clamped source
            # (reads wrap rows that multiply zero blocks — values don't
            # matter for the perf probe, traffic identical). Clip in
            # BLOCK-row units so start*BS stays provably tile-aligned.
            start = pl.multiple_of(
                jnp.clip(t * R - BW, 0, nbr - W) * BS, BS)
            step = W * BS // split
            return [pltpu.make_async_copy(
                x_hbm.at[pl.ds(start + s * step, step), :],
                xbuf.at[slot, pl.ds(s * step, step), :],
                sem.at[slot, s]) for s in range(split)]

        def start_win(slot, t):
            for c in win_copies(slot, t):
                c.start()

        def wait_win(slot, t):
            for c in win_copies(slot, t):
                c.wait()

        def start_blocks(bslot, t):
            pltpu.make_async_copy(
                blocks_hbm.at[pl.ds(t * R, R)], bbuf.at[bslot],
                bsem.at[bslot]).start()

        def wait_blocks(bslot, t):
            pltpu.make_async_copy(
                blocks_hbm.at[pl.ds(t * R, R)], bbuf.at[bslot],
                bsem.at[bslot]).wait()

        slot = tile % nb

        @pl.when(tile == 0)
        def _():
            for d in range(min(D, ntiles)):
                start_win(d % nb, d)
                if manual_blocks:
                    start_blocks(d % 3, d)

        @pl.when(tile + D < ntiles)
        def _():
            start_win((tile + D) % nb, tile + D)

        if manual_blocks:
            @pl.when((tile + 2 < ntiles) & (tile > 0))
            def _():
                start_blocks((tile + 2) % 3, tile + 2)

        wait_win(slot, tile)
        if manual_blocks:
            wait_blocks(tile % 3, tile)
            blocks = bbuf[tile % 3]
        else:
            blocks = blocks_ref[...]

        if int8:
            blocks = blocks.astype(jnp.bfloat16) * jnp.bfloat16(0.02)

        for i in range(R):
            out_ref[i] = jnp.dot(
                blocks[i], xbuf[slot, i * BS:(i + K) * BS, :],
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)

    return kernel


def build(nb=4, split=1, manual_blocks=False, int8=False, readonly=False,
          nbr=NBR):
    kernel = make_kernel(nb, split, manual_blocks, int8, readonly)
    bdt = jnp.int8 if int8 else jnp.bfloat16
    scratch = [
        pltpu.VMEM((nb, W * BS, M), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((nb, split)),
    ]
    in_specs = [
        (pl.BlockSpec(memory_space=pl.ANY) if manual_blocks else
         pl.BlockSpec((R, BS, K * BS), lambda r: (r, 0, 0),
                      memory_space=pltpu.VMEM)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if manual_blocks:
        scratch += [pltpu.VMEM((3, R, BS, K * BS), bdt),
                    pltpu.SemaphoreType.DMA((3,))]
    out_spec = (pl.BlockSpec((R, BS, M), lambda r: (0, 0, 0),
                             memory_space=pltpu.VMEM) if readonly else
                pl.BlockSpec((R, BS, M), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM))
    out_rows = R if readonly else nbr

    @jax.jit
    def spmm(blocks, x):
        out = pl.pallas_call(
            kernel,
            grid=(nbr // R,),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
            out_shape=jax.ShapeDtypeStruct((out_rows, BS, M), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=2 * nbr * K * BS * BS * M,
                bytes_accessed=nbr * BS * K * BS * 2 + nbr * BS * M * 4,
                transcendentals=0,
            ),
        )(blocks, x)
        return out.reshape(out_rows * BS, M)

    return spmm, readonly


def timed(built, blocks, x, chain=CHAIN):
    spmm, readonly = built

    if readonly:
        # No same-shape output to ping-pong: sequence iterations by
        # punching the scalar result into the carry in place
        # (dynamic_update_slice on a loop carry aliases, no copy).
        def chain_fn(blocks, y):
            def body(_, y):
                z = spmm(blocks, y)
                return y.at[0, 0].set(z[0, 0])
            return jax.lax.fori_loop(0, chain, body, y)
    else:
        def chain_fn(blocks, y):
            return jax.lax.fori_loop(0, chain, lambda _, y: spmm(blocks, y),
                                     y)

    cj = jax.jit(chain_fn)
    z = cj(blocks, x)
    float(z[0, 0].astype(jnp.float32))
    t0 = time.perf_counter()
    z = cj(blocks, x)
    float(z[0, 0].astype(jnp.float32))
    return (time.perf_counter() - t0) / chain


def report(name, t, extra_bytes=0, int8=False):
    nnz = NBR * BS * K * BS
    blocks_b = nnz * (1 if int8 else 2)
    win_b = (NBR // R) * W * BS * M * 2
    out_b = NBR * BS * M * 2
    total = blocks_b + win_b + out_b + extra_bytes
    print(json.dumps(dict(name=name, ms=t * 1e3,
                          eff_nnz_per_s=nnz * M / t,
                          sustained_GBps=total / t / 1e9)), flush=True)


def main(stages):
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        rng.standard_normal((NBR, BS, K * BS)) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((NBR * BS, M)), jnp.bfloat16)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "chain": CHAIN, "stages": stages}), flush=True)

    if "cal" in stages:
        t25 = timed(build(), blocks, x, chain=25)
        t100 = timed(build(), blocks, x, chain=100)
        overhead_ms = (t25 - t100) / (1 / 25 - 1 / 100) * 1e3
        print(json.dumps({"name": "v0", "ms25": t25 * 1e3,
                          "ms100": t100 * 1e3,
                          "fixed_overhead_ms_est": overhead_ms}), flush=True)
        report("v0-c100", t100)
    if "nb8" in stages:
        report("nb8", timed(build(nb=8), blocks, x))
    if "blkring" in stages:
        report("blkring", timed(build(manual_blocks=True), blocks, x))
    if "split2" in stages:
        report("split2", timed(build(split=2), blocks, x))
    if "nb8split2" in stages:
        report("nb8-split2", timed(build(nb=8, split=2), blocks, x))
    if "readonly" in stages:
        report("readonly", timed(build(readonly=True), blocks, x))
    if "int8" in stages:
        blocks8 = jnp.asarray(
            np.clip(rng.standard_normal((NBR, BS, K * BS)) * 30, -127, 127),
            jnp.int8)
        report("int8", timed(build(int8=True, manual_blocks=True),
                             blocks8, x), int8=True)


if __name__ == "__main__":
    import sys
    main(sys.argv[1:] or ["cal"])
