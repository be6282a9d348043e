"""Multi-device link-prediction evaluation: the candidate-entity axis
sharded over 'model', query chunks over 'data'.

This is the rebuild's "sequence-parallel equivalent" (SURVEY.md §5
"Long-context"): the reference scores one test triple against all
N entities in one process (``Test.h``); at 10M+ entities a single chip
can neither hold nor sweep the table, so each model shard counts
better-scoring candidates among **its own rows** of the row-sharded
entity table and one ``psum`` over 'model' combines the rank counts.
Query construction, gold scoring, and the known-true (filter) correction
are small gathers left to XLA's auto-SPMD partitioner outside the
shard_map.

Tie handling matches ops/pallas_rank.py: the gold id is masked out of the
count, so the gold score's arithmetic path can't perturb its own rank."""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.eval.scoring import (CANDIDATE_TABLES, build_queries,
                                            score_block)
from openkeonspark_tpu.parallel.mesh import DATA, MODEL

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


class ShardedRanker:
    """Jitted, cached sharded rank-count programs for one (cfg, mesh)."""

    def __init__(self, cfg: Config, mesh: Mesh, n_ent: int):
        self.cfg = cfg
        self.mesh = mesh
        self.n_ent = n_ent
        self.block = cfg.eval_block
        self._mapped: Dict[str, callable] = {}

    # ---- inside-shard_map candidate sweep ----------------------------
    def _count_body(self, replace: str):
        cfg, n_ent, block = self.cfg, self.n_ent, self.block
        model_name = cfg.model

        def count(cand, q, gold_ids, gold_scores):
            m_idx = jax.lax.axis_index(MODEL)
            Lp = cand["ent_embeddings"].shape[0]
            nblocks = -(-Lp // block)
            padded = {k: jnp.pad(v, ((0, nblocks * block - Lp), (0, 0)))
                      for k, v in cand.items()}
            row0 = m_idx * Lp
            C = gold_ids.shape[0]

            def body(acc, b):
                cand0 = b * block
                blk = {k: jax.lax.dynamic_slice_in_dim(v, cand0, block, 0)
                       for k, v in padded.items()}
                s = score_block(model_name, q, blk, replace, cfg)
                local = cand0 + jnp.arange(block, dtype=jnp.int32)[None, :]
                ids = row0 + local
                ok = ((s.astype(jnp.float32) < gold_scores[:, None])
                      & (ids < n_ent) & (ids != gold_ids[:, None])
                      & (local < Lp))
                return acc + jnp.sum(ok, axis=1).astype(jnp.int32), None

            acc, _ = jax.lax.scan(body, jnp.zeros((C,), jnp.int32),
                                  jnp.arange(nblocks))
            return jax.lax.psum(acc, MODEL)

        return count

    def count(self, cand_tables, q, gold_ids, gold_scores, replace: str):
        if replace not in self._mapped:
            table_specs = {name: P(MODEL, None)
                           for name in CANDIDATE_TABLES[self.cfg.model]}
            q_specs = jax.tree_util.tree_map(
                lambda x: P(DATA, *([None] * (x.ndim - 1))), q)
            self._mapped[replace] = jax.jit(shard_map(
                self._count_body(replace), mesh=self.mesh,
                in_specs=(table_specs, q_specs, P(DATA), P(DATA)),
                out_specs=P(DATA),
                check_vma=False,
            ))
        return self._mapped[replace](cand_tables, q, gold_ids, gold_scores)


@partial(jax.jit, static_argnames=("model_name", "replace", "cfg", "n_ent"))
def _prep_chunk(params, h, t, r, gold, known, model_name: str, replace: str,
                cfg: Config, n_ent: int):
    """Auto-SPMD part: queries, gold scores, known-true correction."""
    q = build_queries(model_name, params, h, t, r, replace, cfg)
    qv = jax.tree_util.tree_map(lambda x: x[:, None], q)
    rows = params["ent_embeddings"].shape[0]

    def score_ids(ids):
        cand = {name: jnp.take(params[name], ids, 0)
                for name in CANDIDATE_TABLES[model_name]}
        s = jax.vmap(lambda qq, cc: score_block(model_name, qq, cc, replace,
                                                cfg))(qv, cand)
        return s[:, 0, :]

    gold_s = score_ids(gold[:, None])[:, 0].astype(jnp.float32)
    kn = jnp.minimum(known, jnp.int32(rows - 1))
    ks = score_ids(kn).astype(jnp.float32)
    kvalid = (known < n_ent) & (known != gold[:, None])
    known_better = jnp.sum((ks < gold_s[:, None]) & kvalid,
                           axis=1).astype(jnp.int32)
    return q, gold_s, known_better


def sharded_link_prediction(params, cfg: Config, ds, index, mesh: Mesh,
                            triples=None, log=None):
    """Drop-in multi-device variant of ``eval.link_prediction`` for
    row-sharded params. Global chunk = ``cfg.eval_chunk × data_axis``."""
    from openkeonspark_tpu.data.dataset import H, R, T
    from openkeonspark_tpu.eval.link_prediction import (DirectionMetrics,
                                                        LinkPredictionResult,
                                                        _known_matrix)
    if triples is None:
        triples = ds.test
    assert index.hr_all is not None and index.tr_all is not None
    D = mesh.shape[DATA]
    chunk = cfg.eval_chunk * D
    ranker = ShardedRanker(cfg, mesh, ds.n_ent)
    cand_tables = {name: params[name]
                   for name in CANDIDATE_TABLES[cfg.model]}

    h_all, t_all, r_all = triples[:, H], triples[:, T], triples[:, R]
    n = len(triples)
    _, cntt = index.hr_all.lookup(h_all, r_all)
    _, cnth = index.tr_all.lookup(t_all, r_all)
    k_max = int(max(cntt.max() if n else 0, cnth.max() if n else 0, 1))
    k_max = -(-k_max // 64) * 64

    ranks = {k: np.empty(n, np.int64) for k in
             ("raw_head", "raw_tail", "filt_head", "filt_tail")}
    for s0 in range(0, n, chunk):
        e = min(s0 + chunk, n)
        pad = chunk - (e - s0)
        sl = slice(s0, e)
        hq = np.concatenate([h_all[sl], np.repeat(h_all[s0:s0 + 1], pad)])
        tq = np.concatenate([t_all[sl], np.repeat(t_all[s0:s0 + 1], pad)])
        rq = np.concatenate([r_all[sl], np.repeat(r_all[s0:s0 + 1], pad)])
        kt = _known_matrix(index.hr_all, hq, rq, k_max, ds.n_ent)
        kh = _known_matrix(index.tr_all, tq, rq, k_max, ds.n_ent)
        hj, tj, rj = jnp.asarray(hq), jnp.asarray(tq), jnp.asarray(rq)

        m = e - s0
        for replace, gold, known, rk, fk in (
                ("tail", tj, kt, "raw_tail", "filt_tail"),
                ("head", hj, kh, "raw_head", "filt_head")):
            q, gold_s, known_better = _prep_chunk(
                params, hj, tj, rj, gold, jnp.asarray(known),
                model_name=cfg.model, replace=replace, cfg=cfg,
                n_ent=ds.n_ent)
            raw = ranker.count(cand_tables, q, gold, gold_s, replace)
            ranks[rk][sl] = np.asarray(raw)[:m]
            ranks[fk][sl] = (np.asarray(raw) - np.asarray(known_better))[:m]
        if log:
            log(f"sharded link-pred {e}/{n}")

    return LinkPredictionResult(
        raw_head=DirectionMetrics.from_ranks(ranks["raw_head"]),
        raw_tail=DirectionMetrics.from_ranks(ranks["raw_tail"]),
        filt_head=DirectionMetrics.from_ranks(ranks["filt_head"]),
        filt_tail=DirectionMetrics.from_ranks(ranks["filt_tail"]),
        ranks=ranks,
    )
