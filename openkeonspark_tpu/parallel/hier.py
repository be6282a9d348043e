"""Hierarchical (topology-aware) owner-directed exchange: ICI-local
aggregation, one DCN crossing per host.

The flat-grid exchange (``parallel/exchange.py``) routes every request and
update row over a single ``all_to_all`` spanning ALL devices — correct and
optimal inside one ICI domain, but when the grid spans hosts joined by
data-center network (DCN), each embedding row crosses the expensive link
once per *device pair*, and the r3 scaling model predicted 63.6% efficiency
at 8 devices under the DCN bandwidth model (VERDICT r3 weak #1 / next #1).

This step factors the mesh into ``(host, data, model)`` — 'host' is the
DCN-connected outer axis, ``(data, model)`` the ICI-local grid of one host
(``L = data·model`` chips) — and routes every big-table exchange in two
stages through a **relay** device:

- **Relay assignment.** Tables are row-sharded over the flat grid
  (host-major): row ``id`` lives on device ``n = id // Lp``, i.e. host
  ``n // L``, local position ``n % L``. The relay of ``id`` on *this* host
  is the device at local position ``(id // Lp) % L`` — the same local
  position the owning device has on the owner host. Routing first to the
  relay (ICI all_to_all over ('data','model')) and then across hosts
  (DCN all_to_all over ('host',)) therefore lands **exactly on the owning
  device** with no third hop.
- **Gather**: dedup own ids → ICI-route ids to relays → relay dedups the
  host's union (the host-level dedup is the point: a row wanted by many
  of the host's chips crosses DCN once) → DCN-route ids to owner hosts →
  owner serves rows locally → rows return over DCN once per requesting
  host → relay fans them back out over ICI. DCN row traffic per step =
  host-unique remote rows, ~L× less than the flat grid's.
- **Update**: merged (id, row-grad) streams ICI-route to relays
  (``exchange_ici_wire_dtype``: f32 default keeps a single quantization
  point; bfloat16 halves the step's ICI bytes — its predicted bottleneck
  at 8 devices — at the cost of double quantization), relay
  **aggregates duplicates across the host** (segment-sum), aggregated
  rows cross DCN once per source host in ``exchange_wire_dtype`` and are
  applied by the owner. Each update row crosses DCN once per *host*
  instead of once per device.
- **Small tables** ride the flat path (one grid-wide all_gather + dense
  psum) — their whole-table traffic is already minimal.
- **Exactness**: both bucket stages carry the flat design's cond-gated
  exact overflow fallbacks (a psum'd predicate keeps every device on the
  same branch; gather responses carry a per-entry success flag back so
  dropped requests — at either stage — are re-served by the grid-wide
  fallback, and dropped update rows fold into the same optimizer apply).

Numerics: identical draws and per-row gradients as the flat exchange and
legacy psum steps (same fold_in keys); at ``exchange_wire_dtype=float32``
only float summation order differs (relay pre-aggregation), which the
parity tests bound at rtol=1e-6 (``tests/test_hier.py``).

Replaces (reference): the same worker↔PS gRPC traffic as
``parallel/exchange.py`` (SURVEY.md §2.4) — the reference has no
topology-aware path at all; its PS traffic crosses the cluster network
once per worker per variable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from typing import Callable, Dict, List, Tuple

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.models.base import KGEModel
from openkeonspark_tpu.parallel.mesh import DATA, HOST, MODEL
from openkeonspark_tpu.parallel.exchange import (
    SMALL_TABLE_ROWS, _a2a, _bucket, _gather_fallback, _gather_plan,
    _sub_batch, capacity_for, dedup_ids, expected_unique)
from openkeonspark_tpu.parallel.hot import HOT_SUFFIX, HotPlan
from openkeonspark_tpu.parallel.sharded import _sampler_specs, _state_specs
from openkeonspark_tpu.sampling.device import DeviceSampler
from openkeonspark_tpu.train.optim import (DenseUpdate, Updates,
                                           aggregate_duplicates,
                                           make_optimizer, scatter_add_rows)
from openkeonspark_tpu.train.step import (TrainState, merged_row_updates,
                                          slot_loss_and_grads)

try:  # JAX ≥ 0.8 module layout
    from jax import shard_map
except ImportError:  # pragma: no cover - older layout
    from jax.experimental.shard_map import shard_map  # type: ignore

LOCAL = (DATA, MODEL)          # ICI-local grid of one host
ALL = (HOST, DATA, MODEL)      # the full device grid, host-major


def _scatter_ids(ids: jax.Array, slot: jax.Array, n_slots: int,
                 fill) -> jax.Array:
    """[n_slots] buffer with ``ids`` at their slots, ``fill`` elsewhere
    (slot ``n_slots`` is the dropped sink)."""
    buf = jnp.full((n_slots + 1,), fill, ids.dtype).at[slot].set(ids)
    return buf[:n_slots]


def _scatter_pairs(ids: jax.Array, grads: jax.Array, slot: jax.Array,
                   n_slots: int, sent: int):
    """Bucketed (ids, grads) buffers via ONE inverse permutation (the
    int32 scatter serves both)."""
    src = jnp.full((n_slots + 1,), ids.shape[0], jnp.int32)
    src = src.at[slot].set(jnp.arange(ids.shape[0], dtype=jnp.int32))
    src = src[:n_slots]
    buf_ids = jnp.take(jnp.append(ids, jnp.asarray(sent, ids.dtype)), src)
    buf_ids = jnp.where(buf_ids >= sent, sent, buf_ids)
    buf_g = jnp.take(
        jnp.concatenate([grads, jnp.zeros((1, grads.shape[1]),
                                          grads.dtype)]), src, axis=0)
    return buf_ids, buf_g


def build_hier_train_step(model: KGEModel, cfg: Config,
                          sampler: DeviceSampler, batch_size: int,
                          mesh: Mesh) -> Callable:
    """(state, sampler, key) → (state, loss) — two-stage relay exchange on
    a ``(host, data, model)`` mesh (``make_mesh((H, Di, M))``). State must
    be sharded flat over all three axes
    (``shard_state(state, mesh, flat=True)``) with tables padded to a
    multiple of the grid size.

    ``batch_size`` is global; the data-parallel degree is ``H·Di`` and the
    draws (fold_in by global data index) equal a flat ``(H·Di, M)`` mesh's,
    so results are parity-comparable with the legacy/flat steps."""
    if tuple(mesh.axis_names) != ALL:
        raise ValueError(f"hier step needs a (host,data,model) mesh, got "
                         f"{mesh.axis_names}")
    H = mesh.shape[HOST]
    Di = mesh.shape[DATA]
    M = mesh.shape[MODEL]
    L = Di * M                      # chips per host
    n_grid = H * L
    d_glob = H * Di                 # data-parallel degree
    b_local = max(1, batch_size // d_glob)
    if b_local % M:
        raise ValueError(
            f"hier step needs per-data-shard batch ({b_local}) divisible "
            f"by the model axis ({M}); pick batch_size accordingly")
    mb = cfg.exchange_microbatches
    while b_local // M % mb:
        mb -= 1
    b_sub = b_local // M // mb
    n_train = sampler.n_train
    opt = make_optimizer(cfg)
    slack = cfg.exchange_slack
    wire_dt = jnp.dtype(cfg.exchange_wire_dtype)
    ici_dt = jnp.dtype(cfg.exchange_ici_wire_dtype)
    dedup_gather = cfg.exchange_dedup in ("gather", "both")
    dedup_update = cfg.exchange_dedup == "both"

    # hot-row replication + frequency-aware capacities (parallel/hot.py):
    # the plan is computed host-side at build from the dataset's degree
    # tables. Entity tables are padded to the grid (shard_state contract),
    # so the local row count is known before tracing.
    lp_guess = -(-sampler.n_ent // n_grid)
    from openkeonspark_tpu.parallel.hot import entity_table_names
    big_ent = {t: lp_guess for t in entity_table_names(model)
               if lp_guess * n_grid > SMALL_TABLE_ROWS}
    plan = (HotPlan(model, cfg, sampler, b_sub, big_ent, L, H)
            if (cfg.exchange_hot_rows or cfg.exchange_capacity == "stats")
            else None)
    hot_tables = plan.hot_tables if plan is not None else ()
    hot_k_val = plan.k if plan is not None else 0
    hot_ids_arr = plan.hot_ids if hot_k_val else None
    stats_caps = plan.caps if plan is not None else {}

    def _hot_mask(ids, sentinel):
        """(is_hot, hot_slot, cold-masked ids) against the replicated hot
        id set (ascending; one searchsorted per stream)."""
        pos = jnp.searchsorted(hot_ids_arr, ids)
        posc = jnp.minimum(pos, hot_k_val - 1).astype(jnp.int32)
        is_hot = jnp.take(hot_ids_arr, posc) == ids
        return (is_hot, posc,
                jnp.where(is_hot, jnp.asarray(sentinel, ids.dtype), ids))

    def step(state: TrainState, sampler_: DeviceSampler, key: jax.Array):
        h_idx = jax.lax.axis_index(HOST)
        d_idx = jax.lax.axis_index(DATA)
        m_idx = jax.lax.axis_index(MODEL)
        l_idx = d_idx * M + m_idx               # local position in host
        n_idx = h_idx * L + l_idx               # global flat index
        gd_idx = h_idx * Di + d_idx             # global data shard
        key_d = jax.random.fold_in(key, gd_idx) if d_glob > 1 else key

        base = n_train // d_glob
        start = gd_idx * base
        size = jnp.where(gd_idx == d_glob - 1, n_train - start, base)
        batch = sampler_.sample(key_d, b_local, cfg.negative_ent,
                                cfg.negative_rel, cfg.bern,
                                partition=(start.astype(jnp.int32),
                                           size.astype(jnp.int32)))

        loss = jnp.zeros((), jnp.float32)
        main_pairs: Dict[str, List[Tuple[jax.Array, jax.Array]]] = {}
        ovf_pairs: Dict[str, List[Tuple[jax.Array, jax.Array]]] = {}
        dense_grads: Dict[str, jax.Array] = {}
        hot_grads: Dict[str, jax.Array] = {}   # table -> [K, d+1] f32
        n_ovf_upd = jnp.zeros((), jnp.int32)

        def small(table):
            return state.params[table].shape[0] * n_grid <= SMALL_TABLE_ROWS

        # small tables: ONE grid-wide table all_gather serves every chunk
        small_full = {
            t: jax.lax.all_gather(
                state.params[t].astype(wire_dt), ALL,
                tiled=True).astype(state.params[t].dtype)
            for t in sorted({tb for _, tb, _ in model.gathers()})
            if small(t)}

        def hier_gather(table, ids):
            """Two-stage gather for one distinct-id stream. Returns
            (rows [U, d] — zeros where not served, fallback args)."""
            local = state.params[table]
            lp, d = local.shape
            rows_phys = lp * n_grid
            if dedup_gather:
                work, u_idx = dedup_ids(ids, sentinel=rows_phys)
                exp1 = expected_unique(ids.shape[0], rows_phys)
            else:
                work, u_idx = ids, None
                exp1 = None
            # `< rows_phys` also drops hot ids masked to the sentinel
            valid = work < rows_phys
            u = work.shape[0]

            # stage 1: ids to relays over ICI
            relay = (work // lp) % L
            if table in stats_caps:   # frequency-aware (parallel/hot.py)
                cap1 = max(8, min(stats_caps[table]["g1"], u))
            else:
                cap1 = capacity_for(u, L, slack, expected=exp1,
                                    local_rows=H * lp if dedup_gather
                                    else None)
            routed1, slot1, novf1 = _bucket(work, L, cap1, lp, valid,
                                            owner=relay)
            req1 = _scatter_ids(work, slot1, L * cap1, -1)
            recv1 = _a2a(req1.reshape(L, cap1), LOCAL).reshape(-1)

            # stage 2 at the relay: host-level dedup, ids to owner hosts
            ids2 = jnp.where(recv1 >= 0, recv1,
                             jnp.asarray(rows_phys, recv1.dtype))
            runiq, r_uidx = dedup_ids(ids2, sentinel=rows_phys)
            rvalid = runiq < rows_phys
            owner_host = runiq // (L * lp)
            if table in stats_caps:
                cap2 = max(8, min(stats_caps[table]["c2"], L * cap1, lp))
            else:
                cap2 = capacity_for(
                    L * cap1, H, slack,
                    expected=expected_unique(L * ids.shape[0],
                                             rows_phys) / L,
                    local_rows=lp)
            routed2, slot2, novf2 = _bucket(runiq, H, cap2, lp, rvalid,
                                            owner=owner_host)
            req2 = _scatter_ids(runiq, slot2, H * cap2, -1)
            recv2 = _a2a(req2.reshape(H, cap2), HOST).reshape(-1)

            # serve: the receiver IS the owner (relay position == owner's
            # local position), so one local take suffices
            lid = recv2 - n_idx * lp
            ok = (lid >= 0) & (lid < lp) & (recv2 >= 0)
            srows = jnp.take(local, jnp.clip(lid, 0, lp - 1), axis=0)
            srows = jnp.where(ok[:, None], srows, 0).astype(wire_dt)

            # response: DCN hop back to the relay, fan-out over ICI
            resp2 = _a2a(srows.reshape(H, cap2, d), HOST).reshape(-1, d)
            rows_runiq = jnp.take(resp2, jnp.where(routed2, slot2, 0),
                                  axis=0)
            rows_runiq = jnp.where(routed2[:, None], rows_runiq, 0)
            rows_recv1 = jnp.take(rows_runiq, r_uidx, axis=0)
            resp1 = _a2a(rows_recv1.reshape(L, cap1, d),
                         LOCAL).reshape(-1, d)
            out = jnp.take(resp1, jnp.where(routed1, slot1, 0), axis=0)
            out = jnp.where(routed1[:, None], out,
                            0).astype(local.dtype)

            # per-entry success flag (a stage-2 drop must reach the
            # requester so the exact fallback can re-serve it): the
            # relay's routed2 travels back through the same ICI hop
            flag2 = jnp.take(routed2.astype(jnp.int8), r_uidx)
            flag1 = _a2a(flag2.reshape(L, cap1), LOCAL).reshape(-1)
            served = routed1 & (jnp.take(flag1,
                                         jnp.where(routed1, slot1, 0)) > 0)
            out = jnp.where(served[:, None], out, 0)
            novf = novf1 + novf2
            return out, u_idx, (work, served, valid), novf

        for c in range(mb):
            sub = _sub_batch(batch, m_idx * mb + c, b_sub)
            table_ids, assemble = _gather_plan(model, sub)

            rows_by_table: Dict[str, jax.Array] = {}
            fb_args = {}
            hot_info: Dict[str, Tuple[jax.Array, jax.Array]] = {}
            n_ovf = jnp.zeros((), jnp.int32)
            for table, ids in table_ids.items():
                if table in small_full:
                    rows_by_table[table] = jnp.take(small_full[table], ids,
                                                    axis=0)
                    continue
                if table in hot_tables:
                    # hot ids: zero-wire local cache read; the routed
                    # stream sees the sentinel (never bucketed, never in
                    # the fallback)
                    rp = state.params[table].shape[0] * n_grid
                    is_hot, slot_h, ids = _hot_mask(ids, rp)
                    hot_info[table] = (is_hot, jnp.take(
                        state.params[table + HOT_SUFFIX], slot_h, axis=0))
                rows, u_idx, fb, novf = hier_gather(table, ids)
                fb_args[table] = fb
                rows_by_table[table] = (rows, u_idx)
                n_ovf = n_ovf + novf
            n_ovf = jax.lax.psum(n_ovf, ALL)
            names = sorted(fb_args)

            def slow(_):
                return tuple(
                    _gather_fallback(state.params[t], fb_args[t][0],
                                     fb_args[t][1], fb_args[t][2], n_idx,
                                     n_grid, axes=ALL)
                    for t in names)

            def fast(_):
                return tuple(jnp.zeros_like(rows_by_table[t][0])
                             for t in names)

            extra = jax.lax.cond(n_ovf > 0, slow, fast, None)
            for t, ex in zip(names, extra):
                rows, u_idx = rows_by_table[t]
                rows = rows + ex
                rows = (jnp.take(rows, u_idx, axis=0)
                        if u_idx is not None else rows)
                if t in hot_info:
                    is_hot, hot_rows = hot_info[t]
                    rows = jnp.where(is_hot[:, None],
                                     hot_rows.astype(rows.dtype), rows)
                rows_by_table[t] = rows

            slots = assemble(rows_by_table)
            n_neg = cfg.negative_ent + cfg.negative_rel
            closs, g_slots = slot_loss_and_grads(model, cfg, slots, b_sub,
                                                 n_neg)
            loss = loss + closs

            # --- hierarchical update routing ----------------------------
            for table, pairs in merged_row_updates(model, sub,
                                                   g_slots).items():
                if len(pairs) == 1:
                    uid, ug = pairs[0]
                else:
                    uid = jnp.concatenate([i for i, _ in pairs])
                    ug = jnp.concatenate([g for _, g in pairs])
                lp = state.params[table].shape[0]
                rows_phys = lp * n_grid
                if table in small_full:
                    g_dense = scatter_add_rows(
                        jnp.zeros((rows_phys, ug.shape[1] + 1), ug.dtype),
                        uid,
                        jnp.concatenate(
                            [ug, jnp.ones((ug.shape[0], 1), ug.dtype)], 1))
                    dense_grads[table] = (dense_grads.get(table, 0.0)
                                          + g_dense)
                    continue
                sent = rows_phys
                if table in hot_tables:
                    # hot rows: dense grid-summed gradient (one psum after
                    # the chunk loop), applied replicated — never routed.
                    # The extra column counts touches for the lazy
                    # optimizers' moment mask.
                    is_hot, slot_h, uid = _hot_mask(uid, sent)
                    gext = jnp.concatenate(
                        [ug, jnp.ones((ug.shape[0], 1), ug.dtype)], 1)
                    acc = hot_grads.get(table)
                    if acc is None:
                        acc = jnp.zeros((hot_k_val, ug.shape[1] + 1),
                                        jnp.float32)
                    hot_grads[table] = scatter_add_rows(
                        acc, jnp.where(is_hot, slot_h, hot_k_val), gext)
                if dedup_update:
                    uid, ug = aggregate_duplicates(uid, ug, sentinel=sent)
                    exp1 = expected_unique(uid.shape[0], rows_phys)
                else:
                    exp1 = None
                # `< sent` also drops hot ids masked to the sentinel
                valid = uid < sent

                # stage 1 (ICI; cfg.exchange_ici_wire_dtype — f32 default
                # keeps the DCN hop as the single quantization point):
                # route (id, grad) to the relay
                relay = (uid // lp) % L
                if table in stats_caps:
                    cap1 = max(8, min(stats_caps[table]["u1"],
                                      uid.shape[0]))
                else:
                    cap1 = capacity_for(uid.shape[0], L, slack,
                                        expected=exp1)
                routed1, slot1, novf1 = _bucket(uid, L, cap1, lp, valid,
                                                owner=relay)
                b_ids, b_g = _scatter_pairs(uid, ug, slot1, L * cap1, sent)
                rid = _a2a(b_ids.reshape(L, cap1), LOCAL).reshape(-1)
                rg = _a2a(b_g.astype(ici_dt).reshape(L, cap1, -1),
                          LOCAL).reshape(-1, ug.shape[1]).astype(ug.dtype)

                # relay: aggregate the host's duplicate rows, then one DCN
                # hop straight to the owning device
                auid, aagg = aggregate_duplicates(rid, rg, sentinel=sent)
                avalid = auid < sent
                owner_host = auid // (L * lp)
                if table in stats_caps:
                    cap2 = max(8, min(stats_caps[table]["c2"], L * cap1,
                                      lp))
                else:
                    cap2 = capacity_for(
                        L * cap1, H, slack,
                        expected=expected_unique(
                            L * uid.shape[0], rows_phys) / L,
                        local_rows=lp)
                routed2, slot2, novf2 = _bucket(auid, H, cap2, lp, avalid,
                                                owner=owner_host)
                b2_ids, b2_g = _scatter_pairs(auid, aagg, slot2, H * cap2,
                                              sent)
                rid2 = _a2a(b2_ids.reshape(H, cap2), HOST).reshape(-1)
                rg2 = _a2a(b2_g.astype(wire_dt).reshape(H, cap2, -1),
                           HOST).reshape(-1, ug.shape[1]).astype(ug.dtype)
                lid = rid2 - n_idx * lp
                owned = (lid >= 0) & (lid < lp)
                lid = jnp.where(owned, lid, lp).astype(jnp.int32)
                main_pairs.setdefault(table, []).append((lid, rg2))
                # overflow streams (rare, cond-gated): my own unrouted
                # rows + the relay's unrouted aggregated rows
                ovf_pairs.setdefault(table, []).append(
                    (jnp.where(routed1 | ~valid,
                               jnp.asarray(sent, uid.dtype), uid), ug))
                ovf_pairs.setdefault(table, []).append(
                    (jnp.where(routed2 | ~avalid,
                               jnp.asarray(sent, auid.dtype), auid), aagg))
                n_ovf_upd = n_ovf_upd + novf1 + novf2

        updates: Updates = {}
        for table, pairs in main_pairs.items():
            lid = jnp.concatenate([i for i, _ in pairs])
            g = jnp.concatenate([gg for _, gg in pairs])
            updates[table] = [(lid, g)]
        for table, g_dense in dense_grads.items():
            lp = state.params[table].shape[0]
            # wire-dtype psum: the same quantization point the routed
            # grads get (bit-parity with the legacy step at f32 wire)
            g_sum = jax.lax.psum(g_dense.astype(wire_dt),
                                 ALL).astype(jnp.float32)
            g_local = jax.lax.dynamic_slice_in_dim(g_sum, n_idx * lp, lp, 0)
            touched = g_local[:, -1] > 0
            lid = jnp.where(touched, jnp.arange(lp, dtype=jnp.int32), lp)
            updates[table] = [(lid, g_local[:, :-1])]
        for table, g_hot in hot_grads.items():
            # ONE grid psum carries every hot-row gradient (XLA reduces
            # hierarchically: ICI within a host, one DCN crossing per
            # host); the wire dtype matches the routed grads' quantization
            # point. Every device then applies the identical DenseUpdate
            # to its replicated companion — replicas stay bit-identical.
            g_sum = jax.lax.psum(g_hot.astype(wire_dt),
                                 ALL).astype(jnp.float32)
            updates[table + HOT_SUFFIX] = DenseUpdate(
                grad=g_sum[:, :-1], touched=g_sum[:, -1] > 0)

        n_ovf_upd = jax.lax.psum(n_ovf_upd, ALL)

        def apply_fast(operand):
            params, opt_state = operand
            return opt.apply(params, opt_state, updates, state.step)

        def apply_slow(operand):
            params, opt_state = operand
            ups: Updates = {t: list(v) if isinstance(v, list) else v
                            for t, v in updates.items()}
            for table, pairs in ovf_pairs.items():
                lp = state.params[table].shape[0]
                for oid, og in pairs:
                    gid = jax.lax.all_gather(oid, ALL, tiled=True)
                    gg = jax.lax.all_gather(og, ALL, tiled=True)
                    lid = gid - n_idx * lp
                    owned = (lid >= 0) & (lid < lp)
                    ups[table].append(
                        (jnp.where(owned, lid, lp).astype(jnp.int32),
                         jnp.where(owned[:, None], gg, 0.0)))
            return opt.apply(params, opt_state, ups, state.step)

        params, opt_state = jax.lax.cond(
            n_ovf_upd > 0, apply_slow, apply_fast,
            (state.params, state.opt_state))
        if hot_grads:
            # owner mirror: each device scatters its owned hot rows (and
            # optimizer slots) from the updated replicated companions back
            # into the sharded tables — a K-row local write, zero wire —
            # so the authoritative sharded state is never stale and
            # eval/checkpoint/export need no merge step.
            params = dict(params)
            opt_state = {s: dict(v) for s, v in opt_state.items()}
            for table in hot_grads:
                lp = params[table].shape[0]
                lid = hot_ids_arr - n_idx * lp
                tgt = jnp.where((lid >= 0) & (lid < lp), lid,
                                lp).astype(jnp.int32)
                cache = params[table + HOT_SUFFIX]
                params[table] = params[table].at[tgt].set(
                    cache.astype(params[table].dtype), mode="drop")
                for s in opt_state:
                    hot_slot = opt_state[s][table + HOT_SUFFIX]
                    opt_state[s][table] = opt_state[s][table].at[tgt].set(
                        hot_slot.astype(opt_state[s][table].dtype),
                        mode="drop")
        global_loss = jax.lax.psum(loss, ALL)
        return (TrainState(params, opt_state, state.step + 1), global_loss)

    sspec = _state_specs(model, cfg, flat=True, axes=ALL)
    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(sspec, _sampler_specs(sampler), P()),
        out_specs=(sspec, P()),
        check_vma=False,
    )

    def step_fn(state: TrainState, sampler_: DeviceSampler, key: jax.Array):
        return mapped(state, sampler_, key)

    return step_fn
