"""SpMM probe #3: manual output-write ring.

Probe 2 calibration: reads sustain 786 GB/s (96% of nominal) but the
automatic out-BlockSpec pipeline writes at only ~208 GB/s effective,
costing 1.3 of the 3.0 ms. This probe routes the output through a manual
VMEM ring with async VMEM->HBM copies (wait depth NBO), overlapping
writes with the next tiles' reads+compute.

Variants: manwrite (NBO=3), manwrite-nbo2, manwrite-r16, manwrite-int8.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBR, BS, BW, M = 4096, 128, 2, 256
K = 2 * BW + 1
NB = 4     # window ring
CHAIN = 100


def make_kernel(R, nbo, int8=False):
    W = R + 2 * BW

    def kernel(blocks_ref, x_hbm, out_hbm, xbuf, sem, obuf, osem):
        tile = pl.program_id(0)
        ntiles = pl.num_programs(0)
        nbr = ntiles * R
        D = NB - 1

        def win_copy(slot, t):
            start = pl.multiple_of(
                jnp.clip(t * R - BW, 0, nbr - W) * BS, BS)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, W * BS), :],
                xbuf.at[slot], sem.at[slot])

        def out_copy(oslot, t):
            return pltpu.make_async_copy(
                obuf.at[oslot], out_hbm.at[pl.ds(t * R, R)],
                osem.at[oslot])

        slot = tile % NB
        oslot = tile % nbo

        @pl.when(tile == 0)
        def _():
            for d in range(min(D, ntiles)):
                win_copy(d % NB, d).start()

        @pl.when(tile + D < ntiles)
        def _():
            win_copy((tile + D) % NB, tile + D).start()

        # Reclaim the output buffer written NBO tiles ago.
        @pl.when(tile >= nbo)
        def _():
            out_copy(oslot, tile - nbo).wait()

        win_copy(slot, tile).wait()

        blocks = blocks_ref[...]
        if int8:
            blocks = blocks.astype(jnp.bfloat16) * jnp.bfloat16(0.02)

        for i in range(R):
            obuf[oslot, i] = jnp.dot(
                blocks[i], xbuf[slot, i * BS:(i + K) * BS, :],
                preferred_element_type=jnp.float32,
            ).astype(obuf.dtype)

        out_copy(oslot, tile).start()

        # Drain all outstanding writes on the last tile.
        @pl.when(tile == ntiles - 1)
        def _():
            for d in range(nbo):
                t_last = ntiles - 1 - d
                @pl.when(t_last >= 0)
                def _():
                    out_copy(t_last % nbo, t_last).wait()

    return kernel, W


def build(R=8, nbo=3, int8=False, nbr=NBR):
    kernel, W = make_kernel(R, nbo, int8)
    bdt = jnp.int8 if int8 else jnp.bfloat16

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
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((NB, W * BS, M), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((NB,)),
                pltpu.VMEM((nbo, R, BS, M), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((nbo,)),
            ],
            out_shape=jax.ShapeDtypeStruct((nbr, BS, M), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * nbr * K * BS * BS * M,
                bytes_accessed=nbr * BS * K * BS * 2 + nbr * BS * M * 4,
                transcendentals=0,
            ),
        )(blocks, x).reshape(nbr * BS, M)

    return spmm


def timed(spmm, blocks, x, chain=CHAIN):
    def chain_fn(blocks, y):
        return jax.lax.fori_loop(0, chain, lambda _, y: spmm(blocks, y), y)

    cj = jax.jit(chain_fn)
    z = cj(blocks, x)
    float(z[0, 0].astype(jnp.float32))
    t0 = time.perf_counter()
    z = cj(blocks, x)
    float(z[0, 0].astype(jnp.float32))
    return (time.perf_counter() - t0) / chain


def report(name, t, int8=False):
    nnz = NBR * BS * K * BS
    blocks_b = nnz * (1 if int8 else 2)
    win_b = (NBR // 8) * (8 + 2 * BW) * BS * M * 2
    out_b = NBR * BS * M * 2
    total = blocks_b + win_b + out_b
    print(json.dumps(dict(name=name, ms=t * 1e3,
                          eff_nnz_per_s=nnz * M / t,
                          sustained_GBps=total / t / 1e9,
                          frac_819=total / 819e9 / t)), flush=True)


def main(stages):
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        rng.standard_normal((NBR, BS, K * BS)) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((NBR * BS, M)), jnp.bfloat16)
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "stages": stages}), flush=True)

    if "manwrite" in stages:
        report("manwrite-nbo3", timed(build(nbo=3), blocks, x))
    if "nbo2" in stages:
        report("manwrite-nbo2", timed(build(nbo=2), blocks, x))
    if "r16" in stages:
        report("manwrite-r16", timed(build(R=16, nbo=3), blocks, x))
    if "int8" in stages:
        blocks8 = jnp.asarray(np.clip(
            rng.standard_normal((NBR, BS, K * BS)) * 30, -127, 127),
            jnp.int8)
        report("manwrite-int8", timed(build(nbo=3, int8=True), blocks8, x),
               int8=True)
    # correctness spot check vs reference on INTERIOR tiles (this probe
    # clamps edge windows for perf-measurement simplicity; the library
    # integration keeps the exact edge forms)
    if "check" in stages:
        full = np.asarray(build(nbo=3)(blocks, x), np.float64)
        b64 = np.asarray(blocks, np.float64).reshape(NBR, BS, K, BS)
        x64 = np.asarray(x, np.float64).reshape(NBR, BS, M)
        rows = [8, 9, 100, 2000, NBR - 16]
        err = 0.0
        for r in rows:
            exp = np.zeros((BS, M))
            for k in range(K):
                exp += b64[r, :, k] @ x64[r - BW + k]
            err = max(err, np.abs(
                full[r * BS:(r + 1) * BS] - exp).max())
        print(json.dumps({"name": "check-interior", "max_abs_err": err}),
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["manwrite", "check"])
