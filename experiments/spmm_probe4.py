"""SpMM probe #4: the write path.

Probe 3: reads sustain 786 GB/s alone, but adding the 268 MB of output
writes costs +1.3 ms — effective write rate ~165 GB/s regardless of
manual vs automatic write pipelining. Hypotheses: (a) writes are
bandwidth-starved behind reads (fix: priority), (b) small-write
turnaround (fix: burst), (c) platform write rate is just low (measure:
writeonly), (d) latency not bandwidth (measure: f32out doubles write
bytes — if time is unchanged it's not bandwidth).
"""

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
NB = 4
R = 8
W = R + 2 * BW
CHAIN = 100


def make_kernel(*, burst=1, prio=None, writeonly=False, out_dt=jnp.bfloat16,
                nbo=3):
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

        # burst: obuf holds `burst` consecutive tiles; one DMA flushes
        # them all. oslot cycles over nbo burst-buffers.
        def out_copy(oslot, burst_idx):
            return pltpu.make_async_copy(
                obuf.at[oslot],
                out_hbm.at[pl.ds(burst_idx * burst * R, burst * R)],
                osem.at[oslot])

        slot = tile % NB

        if not writeonly:
            @pl.when(tile == 0)
            def _():
                for d in range(min(D, ntiles)):
                    win_copy(d % NB, d).start()

            @pl.when(tile + D < ntiles)
            def _():
                win_copy((tile + D) % NB, tile + D).start()

        bidx = tile // burst
        pos = tile % burst
        oslot = bidx % nbo

        # Reclaim this burst buffer (written nbo bursts ago).
        @pl.when((pos == 0) & (bidx >= nbo))
        def _():
            out_copy(oslot, bidx - nbo).wait()

        if writeonly:
            for i in range(R):
                obuf[oslot, pos * R + i] = xbuf[0, :BS, :].astype(
                    obuf.dtype)
        else:
            win_copy(slot, tile).wait()
            for i in range(R):
                obuf[oslot, pos * R + i] = jnp.dot(
                    blocks_ref[i], xbuf[slot, i * BS:(i + K) * BS, :],
                    preferred_element_type=jnp.float32,
                ).astype(obuf.dtype)

        @pl.when(pos == burst - 1)
        def _():
            c = out_copy(oslot, bidx)
            if prio is None:
                c.start()
            else:
                c.start(priority=prio)

        @pl.when(tile == ntiles - 1)
        def _():
            nburst = ntiles // burst
            for d in range(nbo):
                b_last = nburst - 1 - d
                @pl.when(b_last >= 0)
                def _():
                    out_copy(b_last % nbo, b_last).wait()

    return kernel


def build(*, burst=1, prio=None, writeonly=False, out_dt=jnp.bfloat16,
          nbo=3, nbr=NBR):
    kernel = make_kernel(burst=burst, prio=prio, writeonly=writeonly,
                         out_dt=out_dt, nbo=nbo)

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
                pltpu.VMEM((nbo, burst * R, BS, M), out_dt),
                pltpu.SemaphoreType.DMA((nbo,)),
            ],
            out_shape=jax.ShapeDtypeStruct((nbr, BS, M), out_dt),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(blocks, x).reshape(nbr * BS, M)

    return spmm


def timed(spmm, blocks, x, out_dt=jnp.bfloat16, chain=CHAIN):
    def chain_fn(blocks, y):
        def body(_, y):
            z = spmm(blocks, y)
            return z.astype(y.dtype)
        return jax.lax.fori_loop(0, chain, body, y)

    cj = jax.jit(chain_fn)
    z = cj(blocks, x)
    float(z[0, 0].astype(jnp.float32))
    t0 = time.perf_counter()
    z = cj(blocks, x)
    float(z[0, 0].astype(jnp.float32))
    return (time.perf_counter() - t0) / chain


def report(name, t, write_bytes=None):
    nnz = NBR * BS * K * BS
    wb = write_bytes if write_bytes is not None else NBR * BS * M * 2
    total = nnz * 2 + (NBR // R) * W * BS * M * 2 + wb
    print(json.dumps(dict(name=name, ms=t * 1e3,
                          sustained_GBps=total / t / 1e9,
                          write_GBps_if_reads_786=wb / max(
                              t - (total - wb) / 786e9, 1e-9) / 1e9)),
          flush=True)


def main(stages):
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        rng.standard_normal((NBR, BS, K * BS)) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((NBR * BS, M)), jnp.bfloat16)
    print(json.dumps({"stages": stages}), flush=True)

    if "writeonly" in stages:
        t = timed(build(writeonly=True), blocks, x)
        wb = NBR * BS * M * 2
        print(json.dumps({"name": "writeonly", "ms": t * 1e3,
                          "write_GBps": wb / t / 1e9}), flush=True)
    if "burst4" in stages:
        report("burst4", timed(build(burst=4), blocks, x))
    if "prio" in stages:
        report("prio1", timed(build(prio=1), blocks, x))
    if "f32out" in stages:
        t = timed(build(out_dt=jnp.float32), blocks, x,
                  out_dt=jnp.float32)
        report("f32out", t, write_bytes=NBR * BS * M * 4)
    if "burst8" in stages:
        report("burst8", timed(build(burst=8, nbo=2), blocks, x))


if __name__ == "__main__":
    main(sys.argv[1:] or ["writeonly", "burst4"])
