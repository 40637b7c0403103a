"""Pallas TPU kernels for the sparse operator layer.

The hot op of the whole framework is SpMM: ``Y = A @ X`` with A block
sparse and X a tall block of basis vectors (BASELINE north star: >= 80% of
HBM-roofline nnz/s). The XLA gather path
(:meth:`fortran_davidson_tpu.ops.sparse.BSROperator.matmat`) materializes a
``(nbr, K, bs, m)`` gather buffer in HBM — ~3x the minimum traffic. This
kernel instead streams the operand blocks through VMEM:

- grid = one program per 8-row tile of block rows; the stored blocks
  (row-major block layout ``(nbr, bs, K*bs)``) arrive as normally
  pipelined VMEM inputs and the block-column tables as per-tile SMEM
  inputs (deliberately NOT scalar prefetch: SMEM-resident prefetch
  tables scale with ``nbr`` and overflow SMEM / explode compile time
  beyond ~1k block rows);
- per block row, the K gathered ``(bs, m)`` input slices are fetched
  from HBM with manual double-buffered ``make_async_copy`` DMAs into a
  stacked ``(K*bs, m)`` buffer, overlapping the next row's transfers
  with the current row's single ``(bs, K*bs) @ (K*bs, m)`` MXU
  contraction — one large dot per block row instead of K small ones;
- mixed precision: bf16 blocks/x with float32 accumulation via
  ``preferred_element_type`` (pass ``out_dtype=jnp.float32``).

``interpret=True`` (default off-TPU) runs the same kernel under the
Pallas interpreter for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 8  # block rows per grid step (minimum f32 sublane tile)


def _acc_dtype(operand_dtype):
    """MXU accumulator dtype: Mosaic requires 32-bit accumulation for
    sub-32-bit operands (bf16 matmuls accumulate in f32 natively)."""
    dt = jnp.dtype(operand_dtype)
    return jnp.dtype(jnp.float32) if dt.itemsize < 4 else dt


def _bsr_kernel(cols_ref, blocks_ref, x_hbm, out_ref, xbuf, sem):
    R, K = cols_ref.shape
    bs = blocks_ref.shape[1]

    def start_row(slot, r):
        for k in range(K):  # static unroll, K is small
            col = cols_ref[r, k]
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(col * bs, bs), :],
                xbuf.at[slot, pl.ds(k * bs, bs), :],
                sem.at[slot, k],
            ).start()

    def wait_row(slot, r):
        for k in range(K):
            col = cols_ref[r, k]
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(col * bs, bs), :],
                xbuf.at[slot, pl.ds(k * bs, bs), :],
                sem.at[slot, k],
            ).wait()

    start_row(0, 0)

    def body(r, carry):
        slot = r % 2

        @pl.when(r + 1 < R)
        def _():
            start_row(1 - slot, r + 1)

        wait_row(slot, r)
        out_ref[pl.ds(r, 1)] = jnp.dot(
            blocks_ref[r], xbuf[slot],
            preferred_element_type=_acc_dtype(blocks_ref.dtype),
        )[None].astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, R, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def bsr_spmm(block_cols, blocks, x, *, interpret: bool | None = None,
             out_dtype=None):
    """Block-sparse (block-ELL) SpMM: ``Y = A @ X``.

    Args:
      block_cols: (nbr, K) int32 block-column indices (padded slots may
        point anywhere in range; their blocks must be zero).
      blocks: (nbr, bs, K*bs) dense blocks, row-major block layout
        (``BSROperator`` storage): columns [k*bs, (k+1)*bs) hold block k.
      x: (nbc * bs, m) input block of vectors.
      interpret: run under the Pallas interpreter (defaults to True off-TPU
        so tests exercise the identical kernel on CPU).
      out_dtype: accumulation/output dtype (defaults to ``x.dtype``; pass
        ``jnp.float32`` with bf16 inputs for mixed-precision SpMM).

    Returns:
      (nbr * bs, m) output block.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = jnp.dtype(x.dtype if out_dtype is None else out_dtype)
    nbr, bs, kbs = blocks.shape
    K = kbs // bs
    n_in, m = x.shape
    # Lane dimension: pad m to the 128-lane register width.
    mp = max(128, -(-m // 128) * 128)
    if mp != m:
        x = jnp.pad(x, ((0, 0), (0, mp - m)))
    # Row-tile dimension: pad the block-row tables to a multiple of the
    # 8-row tile (padded rows reference block 0 with zero blocks).
    R = _TILE_R
    if nbr % R:
        pad_r = R - nbr % R
        block_cols = jnp.pad(block_cols, ((0, pad_r), (0, 0)))
        blocks = jnp.pad(blocks, ((0, pad_r), (0, 0), (0, 0)))
    nbr_p = block_cols.shape[0]
    blocks2 = blocks

    out = pl.pallas_call(
        _bsr_kernel,
        grid=(nbr_p // R,),
        in_specs=[
            pl.BlockSpec((R, K), lambda r: (r, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R, bs, K * bs), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((R, bs, mp), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K * bs, mp), x.dtype),
            pltpu.SemaphoreType.DMA((2, K)),
        ],
        out_shape=jax.ShapeDtypeStruct((nbr_p, bs, mp), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * K * bs * bs * mp,
            bytes_accessed=(blocks.size * blocks.dtype.itemsize
                            + nbr * K * bs * mp * x.dtype.itemsize
                            + nbr * bs * mp * out_dtype.itemsize),
            transcendentals=0,
        ),
    )(block_cols, blocks2, x)
    out = out[:nbr].reshape(nbr * bs, mp)
    return out[:, :m] if mp != m else out


_N_WINDOW_BUFFERS = 4  # ring depth: windows fetched 3 tiles ahead


def _banded_kernel_db(nbr_ref, blocks_ref, x_hbm, out_ref, xbuf, sem, *,
                      K: int, bw: int, W: int):
    """Banded-window kernel: x windows are prefetched several tiles ahead
    into a ring of VMEM buffers (scratch persists across the sequential
    TPU grid). Measured on v5e: depth-3 prefetch cuts the SpMM from
    5.7 ms to 3.3 ms at 4096x4096 blocks/bw=2/m=128 — beyond depth 3 the
    kernel is HBM-bound."""
    R = out_ref.shape[0]
    bs = blocks_ref.shape[1]
    nbr = nbr_ref[0]
    tile = pl.program_id(0)
    ntiles = pl.num_programs(0)
    NB = _N_WINDOW_BUFFERS
    D = NB - 1  # prefetch depth

    def window_start(t):
        return jnp.clip(t * R - bw, 0, nbr - W)

    def window_dma(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(window_start(t) * bs, W * bs), :],
            xbuf.at[slot],
            sem.at[slot],
        )

    slot = tile % NB

    @pl.when(tile == 0)
    def _():
        # ntiles is static (the grid is static), so the prologue only
        # starts windows for tiles that exist.
        for d in range(min(D, ntiles)):
            window_dma(d % NB, d).start()

    @pl.when(tile + D < ntiles)
    def _():
        window_dma((tile + D) % NB, tile + D).start()

    window_dma(slot, tile).wait()
    w0 = window_start(tile)

    # Interior tiles (everything except the first/last few at the band
    # edges) have w0 == tile*R - bw and every row unclipped, so row i's
    # window offset is exactly i — a fully static slice. Unrolling the 8
    # rows with static slices lets Mosaic schedule the MXU dots
    # back-to-back; the dynamic-offset path only runs at the edges.
    interior = (tile * R >= bw) & (tile * R + R - 1 + bw <= nbr - 1)

    @pl.when(interior)
    def _():
        for i in range(R):  # static unroll
            out_ref[i] = jnp.dot(
                blocks_ref[i], xbuf[slot, i * bs:(i + K) * bs, :],
                preferred_element_type=_acc_dtype(blocks_ref.dtype),
            ).astype(out_ref.dtype)

    @pl.when(jnp.logical_not(interior))
    def _():
        def body(i, carry):
            r = tile * R + i
            start_r = jnp.clip(r - bw, 0, nbr - K)
            off = start_r - w0  # in [0, W - K]
            out_ref[pl.ds(i, 1)] = jnp.dot(
                blocks_ref[i], xbuf[slot, pl.ds(off * bs, K * bs), :],
                preferred_element_type=_acc_dtype(blocks_ref.dtype),
            )[None].astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, R, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("bandwidth", "interpret", "out_dtype"))
def banded_bsr_spmm(blocks, x, *, bandwidth: int,
                    interpret: bool | None = None, out_dtype=None):
    """Banded block-sparse SpMM with implicit column structure.

    For a banded BSR matrix (every stored block within ``bandwidth`` block
    rows of the diagonal, stored in clipped-window order: row ``r`` holds
    columns ``clip(r - bw, 0, nbr - K) + k``), the K gathered slices per
    row are CONTIGUOUS rows of ``x`` — so each 8-row tile needs exactly
    ONE windowed DMA of ``(8 + 2*bw) * bs`` rows instead of ``8 * K``
    scattered slice fetches. Rows whose stored column order deviates from
    the window (band edges) must hold zero blocks in the deviating slots
    (which :func:`~fortran_davidson_tpu.ops.sparse.generate_banded_bsr`
    and any symmetric band produce naturally).

    Args:
      blocks: (nbr, bs, K*bs) row-major block layout, K = 2*bandwidth+1.
      x: (nbr * bs, m).
      bandwidth: block bandwidth bw (static).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = jnp.dtype(x.dtype if out_dtype is None else out_dtype)
    nbr, bs, kbs = blocks.shape
    K = kbs // bs
    bw = int(bandwidth)
    R = _TILE_R
    W = R + 2 * bw  # x-window size in block rows
    if nbr < W or K != 2 * bw + 1:
        # Degenerate band: fall back to a dense-view contraction via the
        # general kernel semantics (tiny problems only).
        raise ValueError(
            f"banded_bsr_spmm needs nbr >= {W} and K == 2*bw+1, got "
            f"nbr={nbr}, K={K}, bw={bw}")
    n_in, m = x.shape
    mp = max(128, -(-m // 128) * 128)
    if mp != m:
        x = jnp.pad(x, ((0, 0), (0, mp - m)))
    if nbr % R:
        pad_r = R - nbr % R
        blocks = jnp.pad(blocks, ((0, pad_r), (0, 0), (0, 0)))
    nbr_p = blocks.shape[0]
    blocks2 = blocks

    kernel = functools.partial(_banded_kernel_db, K=K, bw=bw, W=W)
    out = pl.pallas_call(
        kernel,
        grid=(nbr_p // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, bs, K * bs), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((R, bs, mp), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_WINDOW_BUFFERS, W * bs, mp), x.dtype),
            pltpu.SemaphoreType.DMA((_N_WINDOW_BUFFERS,)),
        ],
        out_shape=jax.ShapeDtypeStruct((nbr_p, bs, mp), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * K * bs * bs * mp,
            bytes_accessed=(blocks.size * blocks.dtype.itemsize
                            + (nbr_p // R) * W * bs * mp * x.dtype.itemsize
                            + nbr * bs * mp * out_dtype.itemsize),
            transcendentals=0,
        ),
    )(jnp.asarray([nbr], jnp.int32), blocks2, x)
    out = out[:nbr].reshape(nbr * bs, mp)
    return out[:, :m] if mp != m else out
