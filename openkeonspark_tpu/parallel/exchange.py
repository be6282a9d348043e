"""Boundary-entity exchange: the owner-directed sharded training step.

The north-star comm pattern (BASELINE.json; SURVEY.md §2.3 row 2): row
shards exchange **only the embedding rows each device actually needs or
owns** — replacing ``parallel/sharded.py``'s full-row ``psum`` broadcast
(cost ∝ batch_rows × d per device, regardless of how few rows a device
touches) and the tiled full-stream ``all_gather`` of updates.

Design (one XLA program per step, mesh ``('data','model')``, tables
row-sharded over 'model' in contiguous ``Lp``-row ranges):

- **Sub-batch split.** All M devices of a data row draw the *same* batch
  (replicated sampling — it is pure vector math, far cheaper than a
  coordination collective), then device m keeps the m-th contiguous
  sub-slice. Gather/score/grad run on ``B_local/M`` rows per device, so
  the model axis now parallelizes compute as well as storage (the legacy
  step replicated compute M times).
- **Owner-directed gather.** Each device buckets its distinct row ids by
  owning shard (owner = id // Lp) into M capacity-``C`` buckets
  (``C ≈ slack·U/M``), ``all_to_all``s the requests over 'model', serves
  its owned rows, and ``all_to_all``s the rows back. Per-device traffic:
  O(U·slack·d) instead of the psum's O(U·M·d) — the judge's
  "O(unique_rows·d)" target (VERDICT.md #1).
- **Owner-directed update.** The merged (ids, row-grads) streams
  (``train.step.merged_row_updates``) are bucketed the same way and
  ``all_to_all``ed to the owning shard; one ``all_gather`` over 'data'
  then sums the data-parallel contributions. The all_gathered stream is
  M× smaller than the legacy step's.
- **Exactness under skew.** Bucket overflow (a hot shard owning more than
  C of a device's ids — possible when entity ids correlate with frequency)
  is handled by a ``lax.cond``-gated exact fallback whose predicate is
  ``psum``ed over the whole mesh, so every device takes the same branch:
  the gather falls back to an all_gather+``psum_scatter`` of the overflow
  ids, the update to an all_gather of the overflow stream folded into the
  *same* optimizer application (lazy-Adam moments stay exact). When
  nothing overflows the fallback branch never executes and costs no
  communication.
- **Overlap.** The sub-batch is split into ``cfg.exchange_microbatches``
  chunks with independent gather-exchange → score → update-exchange
  chains; XLA's latency-hiding scheduler overlaps chunk k+1's exchange
  with chunk k's compute (the north star's "overlap the exchange with
  batch scoring"). Gradients are taken at the same params for every
  chunk, so the math equals the unsplit step.

Numerics vs the legacy psum step: identical draws (same fold_in keys),
identical gathered row values, identical per-row gradients (margin-loss
grads are row-local); only float *summation order* differs where duplicate
ids collide in a scatter — parity tests assert rtol=1e-6/atol=1e-7
(``tests/test_exchange.py``).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.models.base import KGEModel
from openkeonspark_tpu.parallel.mesh import DATA, MODEL
from openkeonspark_tpu.parallel.sharded import (_sampler_specs, _state_specs,
                                                build_sharded_train_step)
from openkeonspark_tpu.sampling.device import DeviceSampler, SampledBatch
from openkeonspark_tpu.train.optim import Updates, make_optimizer
from openkeonspark_tpu.train.step import (TrainState, merged_row_updates,
                                          slot_loss_and_grads)

try:  # JAX ≥ 0.8 module layout
    from jax import shard_map
except ImportError:  # pragma: no cover - older layout
    from jax.experimental.shard_map import shard_map  # type: ignore


def capacity_for(n_ids: int, m_axis: int, slack: float) -> int:
    """Bucket capacity: ``slack`` × the uniform share, multiple of 8,
    capped at the stream length (cap ⇒ overflow is impossible)."""
    c = -(-int(n_ids * slack) // m_axis)
    c = -(-c // 8) * 8
    return max(8, min(n_ids, c))


def _bucket(ids: jax.Array, m_axis: int, cap: int, lp: int):
    """Owner bucketing for one id stream. Returns (fits [U] bool,
    slot [U] ∈ [0, M·C]  — M·C is the overflow sink slot)."""
    owner = ids // lp
    onehot = owner[:, None] == jnp.arange(m_axis, dtype=owner.dtype)[None, :]
    pos = jnp.sum((jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1)
                  * onehot, axis=1)
    fits = pos < cap
    slot = jnp.where(fits, owner.astype(jnp.int32) * cap + pos,
                     m_axis * cap)
    return fits, slot


def _a2a(x: jax.Array) -> jax.Array:
    return jax.lax.all_to_all(x, MODEL, split_axis=0, concat_axis=0)


def _exchange_gather(local: jax.Array, ids: jax.Array, m_idx, m_axis: int,
                     cap: int):
    """Fetch global table rows from their owning shards over 'model'.
    Returns (rows [U, d] with zeros where the request overflowed,
    fits [U])."""
    lp, d = local.shape
    fits, slot = _bucket(ids, m_axis, cap, lp)
    req = jnp.full((m_axis * cap + 1,), -1, ids.dtype).at[slot].set(ids)
    req = req[: m_axis * cap].reshape(m_axis, cap)
    req_r = _a2a(req).reshape(-1)
    lid = req_r - m_idx * lp
    ok = (lid >= 0) & (lid < lp) & (req_r >= 0)
    rows = jnp.take(local, jnp.clip(lid, 0, lp - 1), axis=0)
    rows = jnp.where(ok[:, None], rows, 0)
    resp = _a2a(rows.reshape(m_axis, cap, d)).reshape(m_axis * cap, d)
    out = jnp.take(resp, jnp.where(fits, slot, 0), axis=0)
    return jnp.where(fits[:, None], out, 0.0), fits


def _gather_fallback(local: jax.Array, ids: jax.Array, fits: jax.Array,
                     m_idx, m_axis: int) -> jax.Array:
    """Exact rows for overflowed requests: all_gather the (masked) ids over
    'model', serve owned rows, psum_scatter each requester its slice.
    Only reached inside the cond-gated slow branch."""
    lp, d = local.shape
    all_ids = jax.lax.all_gather(jnp.where(fits, -1, ids), MODEL)  # [M, U]
    lid = all_ids - m_idx * lp
    ok = (lid >= 0) & (lid < lp) & (all_ids >= 0)
    rows = jnp.take(local, jnp.clip(lid, 0, lp - 1).reshape(-1), axis=0)
    rows = jnp.where(ok.reshape(-1)[:, None], rows, 0)
    return jax.lax.psum_scatter(rows.reshape(m_axis, ids.shape[0], d),
                                MODEL, scatter_dimension=0, tiled=False)


def _exchange_update(lp: int, ids: jax.Array, grads: jax.Array, m_idx,
                     m_axis: int, cap: int):
    """Route (id, row-grad) pairs to the owning shard over 'model'.
    Returns (local_ids [M·C] with the optimizer's discard sentinel ``lp``
    for padding/non-owned, grads [M·C, d], ovf_ids [U] — the device's own
    overflow rows, others marked with the global sentinel — and the
    overflow count)."""
    d = grads.shape[1]
    sent = m_axis * lp  # global sentinel: maps past every shard's range
    fits, slot = _bucket(ids, m_axis, cap, lp)
    # inverse permutation: ONE int32 scatter serves both id + grad buffers
    src = jnp.full((m_axis * cap + 1,), ids.shape[0], jnp.int32)
    src = src.at[slot].set(jnp.arange(ids.shape[0], dtype=jnp.int32))
    src = src[: m_axis * cap]
    buf_ids = jnp.take(jnp.append(ids, jnp.asarray(sent, ids.dtype)), src)
    buf_g = jnp.take(jnp.concatenate([grads, jnp.zeros((1, d), grads.dtype)]),
                     src, axis=0)
    rid = _a2a(buf_ids.reshape(m_axis, cap)).reshape(-1)
    rg = _a2a(buf_g.reshape(m_axis, cap, d)).reshape(-1, d)
    lid = rid - m_idx * lp
    owned = (lid >= 0) & (lid < lp)
    lid = jnp.where(owned, lid, lp).astype(jnp.int32)
    ovf_ids = jnp.where(fits, jnp.asarray(sent, ids.dtype), ids)
    n_ovf = jnp.sum(~fits)
    return lid, rg, ovf_ids, n_ovf


def _gather_plan(model: KGEModel, batch: SampledBatch):
    """Per-table distinct id streams (structural duplicates gathered once —
    mirrors ``train.step.gather_slots_structured``) + the recipe to
    assemble the slot row bundles from the fetched rows."""
    b = batch.h.shape[0]
    n_e = batch.neg_h.shape[1] if batch.neg_h is not None else 0
    n_r = batch.neg_rel.shape[1] if batch.neg_rel is not None else 0
    pieces: Dict[str, List[jax.Array]] = {}
    offs: Dict[str, int] = {}
    recipes = []  # (slot, table, offset, anchor, length)
    for slot, table, anchor in model.gathers():
        if anchor == "r":
            parts = [batch.r] + [batch.neg_rel[:, k] for k in range(n_r)]
        elif anchor == "h":
            parts = [batch.h] + [batch.neg_h[:, k] for k in range(n_e)]
        else:
            parts = [batch.t] + [batch.neg_t[:, k] for k in range(n_e)]
        ids = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        off = offs.get(table, 0)
        offs[table] = off + ids.shape[0]
        pieces.setdefault(table, []).append(ids)
        recipes.append((slot, table, off, anchor, ids.shape[0]))
    table_ids = {t: (jnp.concatenate(p) if len(p) > 1 else p[0])
                 for t, p in pieces.items()}

    def assemble(rows_by_table: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        slots = {}
        for slot, table, off, anchor, n in recipes:
            rows = jax.lax.dynamic_slice_in_dim(rows_by_table[table], off, n,
                                                axis=0)
            if anchor == "r":
                if n_r == 0:
                    slots[slot] = rows          # untiled [B, d] slot
                    continue
                base = rows[:b]
                parts = [base] * (1 + n_e) + [rows[b * (1 + k): b * (2 + k)]
                                              for k in range(n_r)]
            else:
                parts = [rows] + [rows[:b]] * n_r
            slots[slot] = (jnp.concatenate(parts) if len(parts) > 1
                           else parts[0])
        return slots

    return table_ids, assemble


def _sub_batch(batch: SampledBatch, m_idx, b_sub: int) -> SampledBatch:
    def cut(x):
        return (None if x is None else
                jax.lax.dynamic_slice_in_dim(x, m_idx * b_sub, b_sub, 0))
    return SampledBatch(h=cut(batch.h), t=cut(batch.t), r=cut(batch.r),
                        neg_h=cut(batch.neg_h), neg_t=cut(batch.neg_t),
                        neg_rel=cut(batch.neg_rel))


def build_exchange_train_step(model: KGEModel, cfg: Config,
                              sampler: DeviceSampler, batch_size: int,
                              mesh: Mesh) -> Callable:
    """(state, sampler, key) → (state, loss) — owner-directed exchange step.

    ``batch_size`` is global; each data row draws ``batch_size // D``
    positives (identical draws to the legacy step) and each device keeps a
    ``B_local / M`` sub-slice. Requires ``B_local % M == 0`` and table rows
    padded to a multiple of M."""
    d_axis = mesh.shape[DATA]
    m_axis = mesh.shape[MODEL]
    b_local = max(1, batch_size // d_axis)
    if m_axis == 1:
        # no model sharding → nothing to exchange; the legacy step IS the
        # minimal-comm program (local takes + loss psum + data all_gather)
        return build_sharded_train_step(model, cfg, sampler, batch_size,
                                        mesh)
    if b_local % m_axis:
        raise ValueError(
            f"exchange step needs per-data-shard batch ({b_local}) divisible"
            f" by the model axis ({m_axis}); pick batch_size accordingly or"
            f" use sharded_step='psum'")
    mb = cfg.exchange_microbatches
    while b_local // m_axis % mb:
        mb -= 1
    b_sub = b_local // m_axis // mb
    n_train = sampler.n_train
    opt = make_optimizer(cfg)
    slack = cfg.exchange_slack

    def step(state: TrainState, sampler_: DeviceSampler, key: jax.Array):
        d_idx = jax.lax.axis_index(DATA)
        m_idx = jax.lax.axis_index(MODEL)
        key_d = jax.random.fold_in(key, d_idx) if d_axis > 1 else key

        base = n_train // d_axis
        start = d_idx * base
        size = jnp.where(d_idx == d_axis - 1, n_train - start, base)
        batch = sampler_.sample(key_d, b_local, cfg.negative_ent,
                                cfg.negative_rel, cfg.bern,
                                partition=(start.astype(jnp.int32),
                                           size.astype(jnp.int32)))

        loss = jnp.zeros((), jnp.float32)
        main_pairs: Dict[str, List[Tuple[jax.Array, jax.Array]]] = {}
        ovf_pairs: Dict[str, List[Tuple[jax.Array, jax.Array]]] = {}
        n_ovf_upd = jnp.zeros((), jnp.int32)

        for c in range(mb):
            sub = _sub_batch(batch, m_idx * mb + c, b_sub)
            table_ids, assemble = _gather_plan(model, sub)

            # --- owner-directed gather, cond-gated exact fallback -------
            rows_by_table, fits_by_table = {}, {}
            n_ovf = jnp.zeros((), jnp.int32)
            for table, ids in table_ids.items():
                lp = state.params[table].shape[0]
                cap = capacity_for(ids.shape[0], m_axis, slack)
                rows, fits = _exchange_gather(state.params[table], ids,
                                              m_idx, m_axis, cap)
                rows_by_table[table] = rows
                fits_by_table[table] = fits
                n_ovf = n_ovf + jnp.sum(~fits).astype(jnp.int32)
            n_ovf = jax.lax.psum(n_ovf, (DATA, MODEL))
            names = sorted(table_ids)

            def slow(_):
                return tuple(
                    _gather_fallback(state.params[t], table_ids[t],
                                     fits_by_table[t], m_idx, m_axis)
                    for t in names)

            def fast(_):
                return tuple(jnp.zeros_like(rows_by_table[t]) for t in names)

            extra = jax.lax.cond(n_ovf > 0, slow, fast, None)
            for t, ex in zip(names, extra):
                rows_by_table[t] = rows_by_table[t] + ex

            slots = assemble(rows_by_table)
            n_neg = cfg.negative_ent + cfg.negative_rel
            closs, g_slots = slot_loss_and_grads(model, cfg, slots, b_sub,
                                                 n_neg)
            loss = loss + closs

            # --- owner-directed update exchange --------------------------
            for table, pairs in merged_row_updates(model, sub,
                                                   g_slots).items():
                if len(pairs) == 1:
                    uid, ug = pairs[0]
                else:
                    uid = jnp.concatenate([i for i, _ in pairs])
                    ug = jnp.concatenate([g for _, g in pairs])
                lp = state.params[table].shape[0]
                cap = capacity_for(uid.shape[0], m_axis, slack)
                lid, rg, ovf_ids, novf = _exchange_update(
                    lp, uid, ug, m_idx, m_axis, cap)
                main_pairs.setdefault(table, []).append((lid, rg))
                ovf_pairs.setdefault(table, []).append((ovf_ids, ug))
                n_ovf_upd = n_ovf_upd + novf.astype(jnp.int32)

        # --- one all_gather over 'data' sums data-parallel streams -------
        updates: Updates = {}
        for table, pairs in main_pairs.items():
            lid = jnp.concatenate([i for i, _ in pairs])
            g = jnp.concatenate([gg for _, gg in pairs])
            if d_axis > 1:
                lid = jax.lax.all_gather(lid, DATA, tiled=True)
                g = jax.lax.all_gather(g, DATA, tiled=True)
            updates[table] = [(lid, g)]

        n_ovf_upd = jax.lax.psum(n_ovf_upd, (DATA, MODEL))

        def apply_fast(operand):
            params, opt_state = operand
            return opt.apply(params, opt_state, updates, state.step)

        def apply_slow(operand):
            params, opt_state = operand
            ups: Updates = {t: list(v) for t, v in updates.items()}
            for table, pairs in ovf_pairs.items():
                lp = state.params[table].shape[0]
                for oid, og in pairs:
                    gid = jax.lax.all_gather(oid, (DATA, MODEL), tiled=True)
                    gg = jax.lax.all_gather(og, (DATA, MODEL), tiled=True)
                    lid = gid - m_idx * lp
                    owned = (lid >= 0) & (lid < lp)
                    ups[table].append(
                        (jnp.where(owned, lid, lp).astype(jnp.int32),
                         jnp.where(owned[:, None], gg, 0.0)))
            return opt.apply(params, opt_state, ups, state.step)

        params, opt_state = jax.lax.cond(
            n_ovf_upd > 0, apply_slow, apply_fast,
            (state.params, state.opt_state))
        global_loss = jax.lax.psum(loss, (DATA, MODEL))
        return (TrainState(params, opt_state, state.step + 1), global_loss)

    sspec = _state_specs(model, cfg)
    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(sspec, _sampler_specs(sampler), P()),
        out_specs=(sspec, P()),
        check_vma=False,
    )

    def step_fn(state: TrainState, sampler_: DeviceSampler, key: jax.Array):
        return mapped(state, sampler_, key)

    return step_fn


def make_exchange_step_builder(mesh: Mesh) -> Callable:
    """Adapter for ``train.loop.train(step_builder=...)`` — picks the
    exchange step when the geometry allows it, the legacy psum step
    otherwise."""

    def builder(model, cfg, sampler, batch_size):
        return build_train_step_for(model, cfg, sampler, batch_size, mesh)

    return builder


def build_train_step_for(model: KGEModel, cfg: Config,
                         sampler: DeviceSampler, batch_size: int,
                         mesh: Mesh) -> Callable:
    """Sharded step dispatch: ``cfg.sharded_step`` = 'exchange' (default,
    owner-directed boundary exchange) falls back to 'psum' when the
    per-shard batch does not divide by the model axis."""
    d_axis = mesh.shape[DATA]
    m_axis = mesh.shape[MODEL]
    b_local = max(1, batch_size // d_axis)
    if (cfg.sharded_step == "exchange" and m_axis > 1
            and b_local % m_axis == 0):
        return build_exchange_train_step(model, cfg, sampler, batch_size,
                                         mesh)
    return build_sharded_train_step(model, cfg, sampler, batch_size, mesh)
