"""Pallas TPU kernel: fused blocked score + rank-count for link-prediction
evaluation.

The eval hot loop (reference ``Test.h``'s per-triple N_entity scoring,
SURVEY.md §3.3) is O(N_test × N_entity × d) VPU work. The XLA fallback in
``eval/link_prediction.py`` sweeps the entity table twice per chunk (one
pass to extract gold scores, one to count better-scoring candidates) and
materializes a [C, block, d] broadcast per block. This kernel does the
whole thing in ONE pass with nothing materialized:

- grid over candidate blocks of the (transposed) entity table; Pallas
  pipelines the HBM→VMEM block fetches automatically (double-buffered by
  the BlockSpec machinery), so compute overlaps the table streaming;
- per d-chunk accumulation keeps the broadcast at [C, DC, BLK] with the
  **candidate axis in lanes** (128-aligned) — the layout the VPU wants;
- score, compare against gold, mask padding, and accumulate the per-query
  count in VMEM scratch; a single [C] int32 vector leaves the kernel.

Supports the TransE residual form ``score = ‖q + sign·e_c‖_p`` (the
head/tail sweeps of TransE — the flagship/bench model) with p ∈ {1, 2}.
The projection models (TransH/R/D) keep the XLA path; their candidate
projections are relation-dependent matmuls that XLA already maps to the
MXU well (eval/scoring.py).

Numerics note: the caller supplies gold scores computed on gathered rows
with the same subtract→|·|→sum-over-d expression; reductions are f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _count_kernel(qt_ref, tab_ref, gold_ref, gid_ref, out_ref, acc_ref, *,
                  sign: float, p: int, n_ent: int, d_chunk: int,
                  block: int, C: int):
    """One grid step = one candidate block of the transposed table.

    qt_ref   [Dp, C]      query residual vectors, TRANSPOSED (f32) — the
                          d-axis is the sublane dim so it can be sliced in
                          chunks of 8 (lane slices must be ×128)
    tab_ref  [Dp, BLK]    entity-table block, transposed (f32)
    gold_ref [C, 1]       gold scores (f32)
    gid_ref  [C, 1]       gold entity ids (int32) — masked out of the
                          count so float noise can never make the gold
                          candidate "beat" itself
    out_ref  [C, 1]       int32 counts (same block every step → lives in
                          VMEM across the grid; accumulated)
    acc_ref  [C, BLK]     VMEM scratch for the score accumulator
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    Dp = qt_ref.shape[0]
    n_chunks = Dp // d_chunk

    def body(k, _):
        qc = qt_ref[pl.ds(k * d_chunk, d_chunk), :]         # [DC, C]
        cc = tab_ref[pl.ds(k * d_chunk, d_chunk), :]        # [DC, BLK]
        r = qc[:, :, None] + sign * cc[:, None, :]          # [DC, C, BLK]
        if p == 1:
            acc_ref[:] += jnp.sum(jnp.abs(r), axis=0)
        else:
            acc_ref[:] += jnp.sum(r * r, axis=0)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    ids = i * block + jax.lax.broadcasted_iota(jnp.int32, (C, block), 1)
    better = ((acc_ref[:] < gold_ref[:]) & (ids < n_ent)
              & (ids != gid_ref[:]))
    out_ref[:] += jnp.sum(better, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("sign", "p", "n_ent", "block",
                                             "interpret"))
def count_better_transe(q: jax.Array, table_t: jax.Array, gold: jax.Array,
                        gold_ids: jax.Array, sign: float, p: int,
                        n_ent: int, block: int = 512,
                        interpret: bool = False) -> jax.Array:
    """#{e < n_ent, e ≠ gold_id_c : ‖q_c + sign·E[e]‖_p < gold_c} per query.

    ``q`` [C, D] f32; ``table_t`` [Dp, Ep] — the entity table transposed
    and zero-padded so Dp % 8 == 0 and Ep % block == 0 (see
    :func:`prepare_table`); ``gold`` [C] f32; ``gold_ids`` [C] int32."""
    C, D = q.shape
    Dp, Ep = table_t.shape
    assert Dp % 8 == 0 and Ep % block == 0, (Dp, Ep, block)
    Cp = _round_up(max(C, 8), 8)
    if Dp != D:
        q = jnp.pad(q, ((0, 0), (0, Dp - D)))
    if Cp != C:
        q = jnp.pad(q, ((0, Cp - C), (0, 0)))
        gold = jnp.pad(gold, (0, Cp - C))
        gold_ids = jnp.pad(gold_ids, (0, Cp - C), constant_values=-1)
    d_chunk = 8
    nblocks = Ep // block

    counts = pl.pallas_call(
        functools.partial(_count_kernel, sign=sign, p=p, n_ent=n_ent,
                          d_chunk=d_chunk, block=block, C=Cp),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((Dp, Cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cp, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cp, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((Cp, block), jnp.float32)],
        interpret=interpret,
    )(q.astype(jnp.float32).T, table_t,
      gold.astype(jnp.float32)[:, None],
      gold_ids.astype(jnp.int32)[:, None])
    return counts[:C, 0]


def prepare_table(table: jax.Array, block: int = 512) -> jax.Array:
    """Transpose + zero-pad an entity table [E, D] → [Dp, Ep] for the
    kernel (done once per evaluation; the copy lives in HBM)."""
    E, D = table.shape
    Dp = _round_up(D, 8)
    Ep = _round_up(E, block)
    t = jnp.pad(table.astype(jnp.float32), ((0, Ep - E), (0, Dp - D)))
    return t.T


def transe_queries(params, h: jax.Array, t: jax.Array, r: jax.Array,
                   replace: str):
    """(q, sign) so that candidate scores are ‖q + sign·E[c]‖ — mirrors
    eval/scoring.py::_transe."""
    E = params["ent_embeddings"].astype(jnp.float32)
    R = params["rel_embeddings"].astype(jnp.float32)
    if replace == "tail":
        return jnp.take(E, h, 0) + jnp.take(R, r, 0), -1.0
    return jnp.take(R, r, 0) - jnp.take(E, t, 0), 1.0


def transe_candidate_scores(q: jax.Array, params, ids: jax.Array,
                            sign: float, p: int,
                            d_chunk: int = 8) -> jax.Array:
    """Score explicit candidate ids through arithmetic that mirrors the
    kernel's d-chunked accumulation order (8-wide partial sums added in
    sequence), so gold/known scores are tie-exact against kernel counts.

    ``q`` [C, D]; ``ids`` [C] or [C, K] → scores of the same shape."""
    E = params["ent_embeddings"].astype(jnp.float32)
    rows = jnp.take(E, ids, 0)                       # [..., D]
    qb = q if ids.ndim == 1 else q[:, None, :]
    res = qb + sign * rows
    D = res.shape[-1]
    Dp = _round_up(D, d_chunk)
    if Dp != D:
        res = jnp.pad(res, [(0, 0)] * (res.ndim - 1) + [(0, Dp - D)])
    part = res.reshape(res.shape[:-1] + (Dp // d_chunk, d_chunk))
    if p == 1:
        part = jnp.sum(jnp.abs(part), axis=-1)       # per-chunk partials
    else:
        part = jnp.sum(part * part, axis=-1)
    # sequential accumulation across chunks = the kernel's fori order
    def body(k, acc):
        return acc + part[..., k]
    return jax.lax.fori_loop(0, Dp // d_chunk, body,
                             jnp.zeros(part.shape[:-1], jnp.float32))
