"""Pallas scatter-add for wide table rows: sorted-run read-modify-write at
streaming HBM bandwidth.

XLA's TPU row scatter runs at ~40 GB/s (measured v5e, BASELINE.md) — for
TransR's ``transfer_matrix`` updates (rows of d_e·d_r = 20 000 f32 = 80 KB)
that scatter alone was ~9.7 ms/step and made config #4 the slowest in the
suite (VERDICT.md r1 weak #1 / next #3, #4). This kernel replaces it:

- the caller argsorts the id stream (int32 sort, trivial next to the row
  bytes) so every destination row becomes one contiguous *run*;
- the kernel walks the sorted stream with double-buffered DMAs: the
  destination row is fetched once per run, delta rows stream in via a
  scalar-prefetched gather order, duplicates accumulate in VMEM, and the
  row is written back once — read+write each unique row once, read each
  delta row once, all as large (row-sized) DMAs that pipeline at HBM
  bandwidth instead of XLA's serialized scatter path;
- rows past the valid prefix (the optimizer's discard-sentinel ids sort to
  the end) are never touched.

Exactness: the sums are the same f32 adds as the XLA scatter, reassociated
into sorted order — parity tests assert 1e-6 closeness against the XLA
path and exact equality against a NumPy float64-free oracle summing in
sorted order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# delta-stream DMA lookahead depth: each delta row is an independent read,
# so deep pipelining hides the per-DMA latency that bounds the walk
# (measured: 2 bufs → 89 GB/s effective at TransR shape; latency-bound)
_D_BUFS = 8


def _kernel(ids_ref, order_ref, nval_ref, table_in, delta_ref, out_ref,
            tbuf, dbuf, sem_t, sem_d, sem_w):
    del table_in  # aliased with out_ref; all access goes through out_ref
    n = nval_ref[0]
    n_total = ids_ref.shape[0]

    # arrays arrive as [rows, 1, width]: the leading (row) dimension is
    # untiled, so single-row HBM slices are legal (Mosaic requires tiled
    # dims — the trailing two — to slice at tile granularity)
    def row_read(slot, i):
        return pltpu.make_async_copy(
            out_ref.at[pl.ds(ids_ref[i], 1)], tbuf.at[slot],
            sem_t.at[slot])

    def row_write(slot, i):
        return pltpu.make_async_copy(
            tbuf.at[slot], out_ref.at[pl.ds(ids_ref[i], 1)],
            sem_w.at[slot])

    def wait_write(slot):
        # same transfer size as the outstanding write on this slot — the
        # wait only consumes the semaphore, src/dst rows are irrelevant
        pltpu.make_async_copy(tbuf.at[slot], out_ref.at[pl.ds(0, 1)],
                              sem_w.at[slot]).wait()

    def delta_read(slot, i):
        return pltpu.make_async_copy(
            delta_ref.at[pl.ds(order_ref[i], 1)], dbuf.at[slot],
            sem_d.at[slot])

    @pl.when(n > 0)
    def _():
        row_read(0, 0).start()

    def warm(j, _):
        @pl.when(j < n)
        def _():
            delta_read(j, j).start()
        return 0

    jax.lax.fori_loop(0, _D_BUFS, warm, 0)

    def body(i, carry):
        tslot, pend0, pend1 = carry
        dslot = jax.lax.rem(i, _D_BUFS)

        delta_read(dslot, i).wait()
        prev = ids_ref[jnp.maximum(i - 1, 0)]
        nxt = ids_ref[jnp.minimum(i + 1, n_total - 1)]
        run_start = (i == 0) | (prev != ids_ref[i])
        run_end = (i + 1 >= n) | (nxt != ids_ref[i])

        @pl.when(run_start)
        def _():
            row_read(tslot, i).wait()

        tbuf[tslot] = tbuf[tslot] + dbuf[dslot]

        @pl.when(i + _D_BUFS < n)   # slot consumed above — safe to refill
        def _():
            delta_read(dslot, i + _D_BUFS).start()

        pend = jnp.where(tslot == 0, pend0, pend1)
        other = 1 - tslot
        pend_other = jnp.where(other == 0, pend0, pend1)

        @pl.when(run_end)
        def _():
            row_write(tslot, i).start()

            @pl.when(i + 1 < n)
            def _():
                # reuse the other slot for the next run's row: its last
                # write (two runs back) must have landed first
                @pl.when(pend_other > 0)
                def _():
                    wait_write(other)

                row_read(other, i + 1).start()

        new_pend = jnp.where(run_end, 1, pend)           # write started
        new_pend_other = jnp.where(run_end & (i + 1 < n), 0, pend_other)
        p0 = jnp.where(tslot == 0, new_pend, new_pend_other)
        p1 = jnp.where(tslot == 0, new_pend_other, new_pend)
        new_tslot = jnp.where(run_end, other, tslot)
        return (new_tslot, p0, p1)

    tslot, pend0, pend1 = jax.lax.fori_loop(
        0, n, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    @pl.when(pend0 > 0)
    def _():
        wait_write(0)

    @pl.when(pend1 > 0)
    def _():
        wait_write(1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scatter_add_rows_sorted(table: jax.Array, ids: jax.Array,
                            delta: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """``table[ids] += delta`` (duplicates sum; ids ≥ rows discarded) via
    the sorted-run RMW kernel. ``table`` is donated/aliased in place.

    Intended for wide rows (width ≥ ~1 KB) where per-row DMAs amortize;
    ``train.optim`` routes based on width and backend.

    Mosaic requires HBM row slices to span full 128-lane tiles, so
    non-multiple widths are zero-padded in and sliced back out — two
    streaming copies (~0.5 ms at TransR scale) against the ~8 ms the
    kernel saves over the XLA scatter there."""
    rows, width = table.shape
    w_pad = (-width) % 128
    if w_pad:
        out = scatter_add_rows_sorted(
            jnp.pad(table, ((0, 0), (0, w_pad))), ids,
            jnp.pad(delta, ((0, 0), (0, w_pad))), interpret=interpret)
        return out[:, :width]
    order = jnp.argsort(ids).astype(jnp.int32)
    sids = jnp.take(ids, order).astype(jnp.int32)
    n_valid = jnp.sum(sids < rows).astype(jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # table (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),   # delta
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 1, 1, width), table.dtype),      # row accums
            pltpu.VMEM((_D_BUFS, 1, 1, width), table.dtype),  # delta bufs
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((_D_BUFS,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 1, width), table.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},   # table operand (after 3 scalar args)
        interpret=interpret,
    )(sids, order, n_valid, table.reshape(rows, 1, width),
      delta.astype(table.dtype).reshape(-1, 1, width))
    return out.reshape(rows, width)
