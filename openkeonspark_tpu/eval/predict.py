"""Ad-hoc top-k prediction — the reference's "serving" path.

Replaces ``Config.predict_head_entity`` / ``predict_tail_entity`` /
``predict_relation`` / ``predict_triple`` (reconstructed
``Config.py:~600–760`` per SURVEY.md §3.5): build all-candidate triples,
score, argsort, return top-k ids. Here candidates are scored with the same
blocked device scorer as evaluation and top-k is a fused
``jax.lax.top_k`` over negated scores (lower score = better = larger
-score)."""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.eval.classification import Thresholds
from openkeonspark_tpu.eval.link_prediction import _pad_entity_tables
from openkeonspark_tpu.eval.scoring import candidate_scores
from openkeonspark_tpu.models.base import get_model


@partial(jax.jit, static_argnames=("model_name", "replace", "block",
                                   "nblocks", "n_ent", "k", "cfg"))
def _topk_entities(params, h, t, r, model_name: str, replace: str, block: int,
                   nblocks: int, n_ent: int, k: int, cfg: Config):
    """Streaming top-k over candidate blocks: carry the best-k (score, id)
    pairs, merge each block with lax.top_k — O(E) scan, O(k) state."""

    def body(carry, b):
        best_s, best_i = carry
        cand0 = b * block
        s = candidate_scores(model_name, params, h, t, r, cand0, block,
                             replace, cfg).astype(jnp.float32)
        ids = cand0 + jnp.arange(block, dtype=jnp.int32)[None, :]
        s = jnp.where(ids < n_ent, s, jnp.inf)
        ids = jnp.broadcast_to(ids, s.shape)
        merged_s = jnp.concatenate([best_s, s], axis=1)
        merged_i = jnp.concatenate([best_i, ids], axis=1)
        top_neg, pos = jax.lax.top_k(-merged_s, k)
        return (-top_neg, jnp.take_along_axis(merged_i, pos, axis=1)), None

    C = h.shape[0]
    init = (jnp.full((C, k), jnp.inf, jnp.float32),
            jnp.full((C, k), -1, jnp.int32))
    (best_s, best_i), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    return best_s, best_i


def _prep(params, cfg: Config, n_ent: int, n_rel: int):
    model = get_model(cfg.model)
    return _pad_entity_tables(model, params, cfg, n_ent, n_rel,
                              cfg.eval_block)


def predict_tail_entity(params, cfg: Config, n_ent: int, n_rel: int,
                        h: int, r: int, k: int = 10
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k tails for (h, r, ?) → (ids [k], scores [k])."""
    params_pad, nblocks = _prep(params, cfg, n_ent, n_rel)
    hq = jnp.asarray([h], jnp.int32)
    rq = jnp.asarray([r], jnp.int32)
    tq = jnp.zeros((1,), jnp.int32)
    s, i = _topk_entities(params_pad, hq, tq, rq, model_name=cfg.model,
                          replace="tail", block=cfg.eval_block,
                          nblocks=nblocks, n_ent=n_ent, k=k, cfg=cfg)
    return np.asarray(i[0]), np.asarray(s[0])


def predict_head_entity(params, cfg: Config, n_ent: int, n_rel: int,
                        t: int, r: int, k: int = 10
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k heads for (?, r, t)."""
    params_pad, nblocks = _prep(params, cfg, n_ent, n_rel)
    tq = jnp.asarray([t], jnp.int32)
    rq = jnp.asarray([r], jnp.int32)
    hq = jnp.zeros((1,), jnp.int32)
    s, i = _topk_entities(params_pad, hq, tq, rq, model_name=cfg.model,
                          replace="head", block=cfg.eval_block,
                          nblocks=nblocks, n_ent=n_ent, k=k, cfg=cfg)
    return np.asarray(i[0]), np.asarray(s[0])


def predict_relation(params, cfg: Config, n_ent: int, n_rel: int,
                     h: int, t: int, k: int = 10
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k relations for (h, ?, t): score every relation id directly
    (relation count is small; one gather-score call)."""
    from openkeonspark_tpu.eval.classification import _score_jit
    rs = jnp.arange(n_rel, dtype=jnp.int32)
    hs = jnp.full((n_rel,), h, jnp.int32)
    ts = jnp.full((n_rel,), t, jnp.int32)
    scores = np.asarray(_score_jit(params, hs, ts, rs,
                                   model_name=cfg.model, cfg=cfg))
    k = min(k, n_rel)
    order = np.argsort(scores, kind="stable")[:k]
    return order.astype(np.int32), scores[order]


def predict_triple(params, cfg: Config, h: int, t: int, r: int,
                   thresholds: Optional[Thresholds] = None,
                   threshold: Optional[float] = None) -> Dict[str, object]:
    """Classify one triple (reference ``predict_triple(h, t, r, thresh)``):
    score < threshold ⇒ true. Give either a fitted :class:`Thresholds` or an
    explicit scalar threshold."""
    from openkeonspark_tpu.eval.classification import _score_jit
    score = float(_score_jit(
        params, jnp.asarray([h], jnp.int32), jnp.asarray([t], jnp.int32),
        jnp.asarray([r], jnp.int32), model_name=cfg.model, cfg=cfg)[0])
    if threshold is None:
        if thresholds is None:
            raise ValueError("need thresholds or an explicit threshold")
        threshold = float(np.where(thresholds.has_rel[r],
                                   thresholds.per_rel[r],
                                   thresholds.fallback))
    return {"score": score, "threshold": threshold,
            "is_true": bool(score < threshold)}
