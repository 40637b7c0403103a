"""Pallas TPU kernels for the sparse operator layer.

The hot op of the whole framework is SpMM: ``Y = A @ X`` with A block
sparse and X a tall-skinny block of basis vectors (BASELINE north star:
>= 80% of HBM-roofline nnz/s). The XLA gather path
(:meth:`fortran_davidson_tpu.ops.sparse.BSROperator.matmat`) materializes a
``(nbr, K, bs, m)`` gather buffer in HBM; this kernel instead *streams*
each stored block and the matching input slice through VMEM:

- the block-column table is a **scalar-prefetch** argument, so the input
  BlockSpec's ``index_map`` can address the gathered X slice before the
  kernel body runs — Pallas's pipeline machinery then double-buffers the
  HBM->VMEM DMAs of blocks and slices automatically;
- each grid step does one ``(bs, bs) @ (bs, m)`` MXU contraction,
  accumulating into the output tile that stays resident in VMEM across
  the inner ``K`` iterations (grid iterates the last axis fastest).

The kernel is dtype-generic; on TPU use float32/bfloat16 (float64 Davidson
parity runs use the XLA path). ``interpret=True`` (default off-TPU) runs
the same kernel under the Pallas interpreter for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bsr_kernel(cols_ref, blocks_ref, x_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0] += jnp.dot(blocks_ref[0, 0], x_ref[0],
                          preferred_element_type=out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_spmm(block_cols, blocks, x, *, interpret: bool | None = None):
    """Block-sparse (block-ELL) SpMM: ``Y = A @ X``.

    Args:
      block_cols: (nbr, K) int32 block-column indices (padded slots may
        point anywhere in range; their blocks must be zero).
      blocks: (nbr, K, bs, bs) dense blocks.
      x: (nbc * bs, m) input block of vectors.
      interpret: run under the Pallas interpreter (defaults to True off-TPU
        so tests exercise the identical kernel on CPU).

    Returns:
      (nbr * bs, m) output block.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nbr, K, bs, _ = blocks.shape
    n_in, m = x.shape
    nbc = n_in // bs
    # Lane dimension: pad m to the 128-lane register width.
    mp = max(128, -(-m // 128) * 128)
    if mp != m:
        x = jnp.pad(x, ((0, 0), (0, mp - m)))
    x3 = x.reshape(nbc, bs, mp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, K),
        in_specs=[
            pl.BlockSpec((1, 1, bs, bs), lambda r, k, cols: (r, k, 0, 0)),
            pl.BlockSpec((1, bs, mp), lambda r, k, cols: (cols[r, k], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, mp), lambda r, k, cols: (r, 0, 0)),
    )
    out = pl.pallas_call(
        _bsr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr, bs, mp), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * K * bs * bs * mp,
            bytes_accessed=(blocks.size * blocks.dtype.itemsize
                            + nbr * K * bs * mp * x.dtype.itemsize
                            + nbr * bs * mp * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(block_cols, blocks, x3)
    out = out.reshape(nbr * bs, mp)
    return out[:, :m] if mp != m else out
