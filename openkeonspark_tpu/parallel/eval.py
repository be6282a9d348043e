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
shard_map; known-id windows materialize on device (link_prediction's
``_known_window``).

Both stages ``lax.scan`` over all query chunks inside ONE jitted program
per direction (mirroring ``eval.link_prediction``): per-chunk dispatch
cost dwarfed the scoring, especially on remote-attached devices.

Tie handling matches ops/pallas_rank.py: the gold id is masked out of the
count, so the gold score's arithmetic path can't perturb its own rank."""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.eval.scoring import (CANDIDATE_TABLES, build_queries,
                                            score_block)
from openkeonspark_tpu.ops.gather import Packed1D
from openkeonspark_tpu.parallel.mesh import DATA, MODEL

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


@partial(jax.jit, static_argnames=("model_name", "replace", "cfg", "n_ent",
                                   "k_max"))
def _prep_scan(params, kvals, h, t, r, gold, koff, kcnt, model_name: str,
               replace: str, cfg: Config, n_ent: int, k_max: int):
    """Auto-SPMD stage, all chunks in one dispatch: per-chunk queries,
    gold scores, and the known-true rank correction."""
    from openkeonspark_tpu.eval.link_prediction import _known_window
    rows = params["ent_embeddings"].shape[0]

    def score_ids(qv, ids):
        cand = {name: jnp.take(params[name], ids, 0)
                for name in CANDIDATE_TABLES[model_name]}
        s = jax.vmap(lambda qq, cc: score_block(model_name, qq, cc, replace,
                                                cfg))(qv, cand)
        return s[:, 0, :]

    def body(_, inp):
        hq, tq, rq, g, ko, kc = inp
        known = _known_window(kvals, ko, kc, k_max, n_ent)
        q = build_queries(model_name, params, hq, tq, rq, replace, cfg)
        qv = jax.tree_util.tree_map(lambda x: x[:, None], q)
        gold_s = score_ids(qv, g[:, None])[:, 0].astype(jnp.float32)
        kn = jnp.minimum(known, jnp.int32(rows - 1))
        ks = score_ids(qv, kn).astype(jnp.float32)
        kvalid = (known < n_ent) & (known != g[:, None])
        known_better = jnp.sum((ks < gold_s[:, None]) & kvalid,
                               axis=1).astype(jnp.int32)
        return None, (q, gold_s, known_better)

    _, out = jax.lax.scan(body, None, (h, t, r, gold, koff, kcnt))
    return out


class ShardedRanker:
    """Jitted, cached sharded rank-count programs for one (cfg, mesh):
    each program scans every chunk, sharding queries over 'data' and the
    candidate rows over 'model'."""

    def __init__(self, cfg: Config, mesh: Mesh, n_ent: int):
        self.cfg = cfg
        self.mesh = mesh
        self.n_ent = n_ent
        self.block = cfg.eval_block
        self._mapped: Dict[str, callable] = {}

    def _count_body(self, replace: str):
        cfg, n_ent, block = self.cfg, self.n_ent, self.block
        model_name = cfg.model

        def count_all(cand, q, gold_ids, gold_scores):
            m_idx = jax.lax.axis_index(MODEL)
            Lp = cand["ent_embeddings"].shape[0]
            nblocks = -(-Lp // block)
            padded = {k: jnp.pad(v, ((0, nblocks * block - Lp), (0, 0)))
                      for k, v in cand.items()}
            row0 = m_idx * Lp

            def chunk(_, inp):
                q_c, gids, gscores = inp
                C = gids.shape[0]

                def body(acc, b):
                    cand0 = b * block
                    blk = {k: jax.lax.dynamic_slice_in_dim(v, cand0, block,
                                                           0)
                           for k, v in padded.items()}
                    s = score_block(model_name, q_c, blk, replace, cfg)
                    local = cand0 + jnp.arange(block, dtype=jnp.int32)[None,
                                                                       :]
                    ids = row0 + local
                    ok = ((s.astype(jnp.float32) < gscores[:, None])
                          & (ids < n_ent) & (ids != gids[:, None])
                          & (local < Lp))
                    return acc + jnp.sum(ok, axis=1).astype(jnp.int32), None

                acc, _ = jax.lax.scan(body, jnp.zeros((C,), jnp.int32),
                                      jnp.arange(nblocks))
                return None, jax.lax.psum(acc, MODEL)

            _, raw = jax.lax.scan(chunk, None, (q, gold_ids, gold_scores))
            return raw

        return count_all

    def count(self, cand_tables, q, gold_ids, gold_scores, replace: str):
        """cand_tables row-sharded; q/gold arrays [NC, C_global(, ...)] —
        queries shard over 'data' on axis 1."""
        if replace not in self._mapped:
            table_specs = {name: P(MODEL, None)
                           for name in CANDIDATE_TABLES[self.cfg.model]}
            q_specs = jax.tree_util.tree_map(
                lambda x: P(None, DATA, *([None] * (x.ndim - 2))), q)
            self._mapped[replace] = jax.jit(shard_map(
                self._count_body(replace), mesh=self.mesh,
                in_specs=(table_specs, q_specs, P(None, DATA),
                          P(None, DATA)),
                out_specs=P(None, DATA),
                check_vma=False,
            ))
        return self._mapped[replace](cand_tables, q, gold_ids, gold_scores)


def sharded_link_prediction(params, cfg: Config, ds, index, mesh: Mesh,
                            triples=None, log=None):
    """Drop-in multi-device variant of ``eval.link_prediction`` for
    row-sharded params. Global chunk = ``cfg.eval_chunk × data_axis``;
    4 device dispatches total (prep + count, per direction)."""
    from openkeonspark_tpu.data.dataset import H, R, T
    from openkeonspark_tpu.eval.link_prediction import (DirectionMetrics,
                                                        LinkPredictionResult,
                                                        guard_finite_params)
    if triples is None:
        triples = ds.test
    assert index.hr_all is not None and index.tr_all is not None
    guard_finite_params(params)
    D = mesh.shape[DATA]
    chunk = cfg.eval_chunk_size * D
    ranker = ShardedRanker(cfg, mesh, ds.n_ent)
    cand_tables = {name: params[name]
                   for name in CANDIDATE_TABLES[cfg.model]}

    h_all, t_all, r_all = triples[:, H], triples[:, T], triples[:, R]
    n = len(triples)
    offt, cntt = index.hr_all.lookup(h_all, r_all)
    offh, cnth = index.tr_all.lookup(t_all, r_all)
    k_max = int(max(cntt.max() if n else 0, cnth.max() if n else 0, 1))
    k_max = -(-k_max // 64) * 64
    kvals_t = Packed1D.build(index.hr_all.sorted_vals.astype(np.int32),
                             pad_value=ds.n_ent)
    kvals_h = Packed1D.build(index.tr_all.sorted_vals.astype(np.int32),
                             pad_value=ds.n_ent)

    pad = (-n) % chunk
    ext = lambda a: np.concatenate([a, np.repeat(a[:1], pad)]) if pad else a
    nc = (n + pad) // chunk
    c2 = lambda a: jnp.asarray(ext(a).reshape(nc, chunk))
    hq, tq, rq = c2(h_all), c2(t_all), c2(r_all)
    ot, ct, oh, ch = c2(offt), c2(cntt), c2(offh), c2(cnth)

    ranks = {}
    for replace, gold, kv, ko, kc, rk, fk in (
            ("tail", tq, kvals_t, ot, ct, "raw_tail", "filt_tail"),
            ("head", hq, kvals_h, oh, ch, "raw_head", "filt_head")):
        q, gold_s, known_better = _prep_scan(
            params, kv, hq, tq, rq, gold, ko, kc, model_name=cfg.model,
            replace=replace, cfg=cfg, n_ent=ds.n_ent, k_max=k_max)
        raw = ranker.count(cand_tables, q, gold, gold_s, replace)
        ranks[rk] = np.asarray(raw).reshape(-1)[:n].astype(np.int64)
        ranks[fk] = (np.asarray(raw).reshape(-1)
                     - np.asarray(known_better).reshape(-1))[:n].astype(
                         np.int64)
        if log:
            log(f"sharded link-pred {replace} done ({n} triples)")

    return LinkPredictionResult(
        raw_head=DirectionMetrics.from_ranks(ranks["raw_head"]),
        raw_tail=DirectionMetrics.from_ranks(ranks["raw_tail"]),
        filt_head=DirectionMetrics.from_ranks(ranks["filt_head"]),
        filt_tail=DirectionMetrics.from_ranks(ranks["filt_tail"]),
        ranks=ranks,
    )
