"""SpMM probe #5: can ANYTHING lift the ~110 GB/s HBM write rate?

Probe 4 established: write-only Pallas DMAs sustain 108 GB/s (3
outstanding 512 KB DMAs), f32 output (2x bytes) reaches ~214 GB/s
effective — far below the 786 GB/s read rate. Remaining hypotheses:

- (e) outstanding-transfer count: the write engine may want more
  concurrent DMAs (nbo sweep) or fewer/larger (burst sweep at high nbo);
- (f) page reuse: writing the SAME HBM pages that were just read
  (input_output_aliasing / donation) may hit a faster path than fresh
  allocations (virtualized backing store allocating on first touch);
- (g) XLA comparison: is a plain jitted elementwise write (y = x + 1,
  donated vs not) any faster than Pallas DMAs? If XLA writes at the
  same ~110-175 GB/s, it is the platform, full stop.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBR, BS, M = 4096, 128, 256
CHAIN = 50


def make_writeonly(burst, nbo, R=8):
    def kernel(out_hbm, obuf, osem):
        tile = pl.program_id(0)
        ntiles = pl.num_programs(0)

        def out_copy(oslot, bidx):
            return pltpu.make_async_copy(
                obuf.at[oslot],
                out_hbm.at[pl.ds(bidx * burst * R, burst * R)],
                osem.at[oslot])

        bidx = tile // burst
        pos = tile % burst
        oslot = bidx % nbo

        @pl.when((pos == 0) & (bidx >= nbo))
        def _():
            out_copy(oslot, bidx - nbo).wait()

        for i in range(R):
            obuf[oslot, pos * R + i] = jnp.full(
                (BS, M), 1.0, obuf.dtype)

        @pl.when(pos == burst - 1)
        def _():
            out_copy(oslot, bidx).start()

        @pl.when(tile == ntiles - 1)
        def _():
            nburst = ntiles // burst
            for d in range(nbo):
                b_last = nburst - 1 - d

                @pl.when(b_last >= 0)
                def _():
                    out_copy(b_last % nbo, b_last).wait()

    @jax.jit
    def run():
        return pl.pallas_call(
            kernel,
            grid=(NBR // R,),
            in_specs=[],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((nbo, burst * R, BS, M), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((nbo,)),
            ],
            out_shape=jax.ShapeDtypeStruct((NBR, BS, M), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )()

    return run


def timed_scalar(fn, *args):
    z = fn(*args)
    float(jnp.asarray(z[0, 0, 0] if z.ndim == 3 else z[0, 0],
                      jnp.float32))
    t0 = time.perf_counter()
    for _ in range(CHAIN):
        z = fn(*args)
    float(jnp.asarray(z[0, 0, 0] if z.ndim == 3 else z[0, 0],
                      jnp.float32))
    return (time.perf_counter() - t0) / CHAIN


def main(stages):
    wb = NBR * BS * M * 2
    print(json.dumps({"stages": stages, "write_MB": wb / 1e6}), flush=True)

    if "nbo" in stages:
        # Outstanding-DMA sweep. Each call is one pallas launch; chain at
        # the Python level (launch overhead ~26us << ms timescale, and a
        # fori_loop would need a fake dependency anyway).
        for burst, nbo in [(1, 3), (1, 6), (1, 12), (2, 6), (4, 6),
                           (8, 3), (16, 2)]:
            try:
                t = timed_scalar(make_writeonly(burst, nbo))
                print(json.dumps({"name": f"writeonly_b{burst}_nbo{nbo}",
                                  "ms": t * 1e3,
                                  "write_GBps": wb / t / 1e9}), flush=True)
            except Exception as e:
                print(json.dumps({"name": f"writeonly_b{burst}_nbo{nbo}",
                                  "error": str(e)[:150]}), flush=True)

    if "rsweep" in stages:
        # Grid-step-overhead hypothesis: same bytes, same DMA sizes per
        # row, fewer grid steps. If GB/s rises with R, the 512-step grid
        # is costing ~1 ms of scalar-core overhead.
        for R, burst, nbo in [(8, 1, 3), (16, 1, 3), (32, 1, 3),
                              (64, 1, 3), (128, 1, 2)]:
            try:
                t = timed_scalar(make_writeonly(burst, nbo, R=R))
                print(json.dumps({"name": f"writeonly_R{R}",
                                  "grid": NBR // R, "ms": t * 1e3,
                                  "write_GBps": wb / t / 1e9}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"name": f"writeonly_R{R}",
                                  "error": str(e)[:150]}), flush=True)

    if "xla" in stages:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((NBR * BS, M)), jnp.bfloat16)

        @jax.jit
        def fresh(x):
            return x + jnp.bfloat16(1.0)

        @jax.jit
        def chained(x):
            # 10 dependent r+w passes inside one program: steady-state
            # traffic, donation/aliasing handled by XLA internally.
            return jax.lax.fori_loop(
                0, 10, lambda _, y: y + jnp.bfloat16(1.0), x)

        t = timed_scalar(fresh, x)
        print(json.dumps({"name": "xla_rw_fresh", "ms": t * 1e3,
                          "rw_GBps": 2 * wb / t / 1e9}), flush=True)
        t = timed_scalar(chained, x) / 10
        print(json.dumps({"name": "xla_rw_chained_per_pass", "ms": t * 1e3,
                          "rw_GBps": 2 * wb / t / 1e9}), flush=True)

        @jax.jit
        def pure_write_chain(y):
            # Carry = the full array; each pass reads ONE element and
            # rewrites the whole buffer (the loop carry must materialize
            # every iteration — no DCE possible): XLA write light speed.
            def body(_, y):
                s = y[0, 0]
                return jnp.full_like(y, s + jnp.bfloat16(1.0))
            return jax.lax.fori_loop(0, 10, body, y)

        z = pure_write_chain(x)
        float(jnp.asarray(z[0, 0], jnp.float32))
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            z = pure_write_chain(x)
        float(jnp.asarray(z[0, 0], jnp.float32))
        t = (time.perf_counter() - t0) / CHAIN / 10
        print(json.dumps({"name": "xla_writeonly_per_pass", "ms": t * 1e3,
                          "write_GBps": wb / t / 1e9}), flush=True)

    if "alias" in stages:
        # In-place: write into the donated input's own HBM pages.
        R = 8
        burst, nbo = 4, 3

        def kernel(in_hbm, out_hbm, obuf, osem):
            tile = pl.program_id(0)
            ntiles = pl.num_programs(0)

            def out_copy(oslot, bidx):
                return pltpu.make_async_copy(
                    obuf.at[oslot],
                    out_hbm.at[pl.ds(bidx * burst * R, burst * R)],
                    osem.at[oslot])

            bidx = tile // burst
            pos = tile % burst
            oslot = bidx % nbo

            @pl.when((pos == 0) & (bidx >= nbo))
            def _():
                out_copy(oslot, bidx - nbo).wait()

            for i in range(R):
                obuf[oslot, pos * R + i] = jnp.full((BS, M), 1.0,
                                                    obuf.dtype)

            @pl.when(pos == burst - 1)
            def _():
                out_copy(oslot, bidx).start()

            @pl.when(tile == ntiles - 1)
            def _():
                nburst = ntiles // burst
                for d in range(nbo):
                    b_last = nburst - 1 - d

                    @pl.when(b_last >= 0)
                    def _():
                        out_copy(b_last % nbo, b_last).wait()

        def run_aliased(x):
            return pl.pallas_call(
                kernel,
                grid=(NBR // R,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((nbo, burst * R, BS, M), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((nbo,)),
                ],
                out_shape=jax.ShapeDtypeStruct((NBR, BS, M),
                                               jnp.bfloat16),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(x)

        jalias = jax.jit(run_aliased, donate_argnums=0)
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.standard_normal((NBR, BS, M)), jnp.bfloat16)
        z = jalias(z)
        float(jnp.asarray(z[0, 0, 0], jnp.float32))
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            z = jalias(z)  # donated: in-place on the same HBM pages
        float(jnp.asarray(z[0, 0, 0], jnp.float32))
        t = (time.perf_counter() - t0) / CHAIN
        print(json.dumps({"name": "writeonly_aliased_b4", "ms": t * 1e3,
                          "write_GBps": wb / t / 1e9}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["nbo", "xla", "alias"])
