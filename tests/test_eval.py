"""Link prediction / classification / predict_* correctness against a dense
NumPy rank oracle (SURVEY.md §4 "rank golden tests")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.data.index import build_kg_index
from openkeonspark_tpu.data.synth import random_kg
from openkeonspark_tpu.eval import (fit_thresholds, link_prediction,
                                    predict_head_entity, predict_relation,
                                    predict_tail_entity, predict_triple,
                                    triple_classification)
from openkeonspark_tpu.models import get_model
from openkeonspark_tpu.train.step import init_state

from oracle import dense_score


def make(model_name="transe", p_norm=1, **kw):
    ds = random_kg(n_ent=91, n_rel=7, n_triples=900, n_valid=60, n_test=60,
                   seed=3)
    cfg = Config(model=model_name, hidden_size=16, p_norm=p_norm,
                 eval_chunk=16, eval_block=32, **kw)
    idx = build_kg_index(ds, for_eval=True)
    model = get_model(model_name)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(8))
    return ds, cfg, idx, model, state


def oracle_ranks(model_name, cfg, dense, ds, replace):
    """Dense rank oracle: score every candidate for every test triple."""
    n = len(ds.test)
    all_trip = {tuple(t) for t in ds.all_triples().tolist()}
    raw = np.zeros(n, np.int64)
    filt = np.zeros(n, np.int64)
    cand = np.arange(ds.n_ent)
    for i, (h, t, r) in enumerate(ds.test.tolist()):
        if replace == "tail":
            hh = np.full(ds.n_ent, h)
            tt = cand
            gold = t
        else:
            hh = cand
            tt = np.full(ds.n_ent, t)
            gold = h
        rr = np.full(ds.n_ent, r)
        s = np.asarray(dense_score(model_name, cfg, dense, hh, tt, rr))
        better = s < s[gold]
        raw[i] = int(better.sum())
        known = np.array([
            ((h, c, r) if replace == "tail" else (c, t, r)) in all_trip
            for c in cand])
        known[gold] = False
        filt[i] = int((better & ~known).sum())
    return raw, filt


@pytest.mark.parametrize("model_name", ["transe", "transh", "transr",
                                        "transd", "distmult", "complex",
                                        "rotate"])
def test_link_prediction_matches_dense_oracle(model_name):
    kw = {}
    if model_name == "transr":
        kw = dict(ent_size=16, rel_size=8)
    ds, cfg, idx, model, state = make(model_name, **kw)
    from openkeonspark_tpu.models import strip_padding
    dense = {k: jnp.asarray(v) for k, v in strip_padding(
        state.params, model.tables(cfg, ds.n_ent, ds.n_rel)).items()}

    res = link_prediction(state.params, cfg, ds, idx)

    for replace, rk, fk in (("tail", "raw_tail", "filt_tail"),
                            ("head", "raw_head", "filt_head")):
        raw, filt = oracle_ranks(model_name, cfg, dense, ds, replace)
        np.testing.assert_array_equal(res.ranks[rk], raw,
                                      err_msg=f"{model_name}/{rk}")
        np.testing.assert_array_equal(res.ranks[fk], filt,
                                      err_msg=f"{model_name}/{fk}")
    # metric math spot check
    want_mrr = float((1.0 / (res.ranks["filt_tail"] + 1.0)).mean())
    assert abs(res.filt_tail.mrr - want_mrr) < 1e-9
    assert res.format_table().count("\n") == 6


def test_filtered_ranks_never_worse_than_raw():
    ds, cfg, idx, model, state = make("transe")
    res = link_prediction(state.params, cfg, ds, idx)
    assert (res.ranks["filt_tail"] <= res.ranks["raw_tail"]).all()
    assert (res.ranks["filt_head"] <= res.ranks["raw_head"]).all()


def test_triple_classification_and_thresholds():
    ds, cfg, idx, model, state = make("transe")
    thr, valid_acc = fit_thresholds(state.params, cfg, ds, idx)
    assert 0.0 <= valid_acc <= 1.0
    # fitted thresholds must reproduce their own valid accuracy
    out = triple_classification(state.params, cfg, ds, idx)
    assert set(out) >= {"accuracy", "precision", "recall", "f1",
                        "valid_accuracy"}
    assert 0.0 <= out["accuracy"] <= 1.0
    # random embeddings ≈ chance, not degenerate all-one-class
    assert 0.2 <= out["accuracy"] <= 0.9


def test_classification_perfect_when_separable():
    """If pos scores and neg scores are fully separated per relation, the
    threshold fit must find 100% accuracy."""
    from openkeonspark_tpu.eval.classification import _best_threshold
    th, acc = _best_threshold(np.array([1.0, 2.0]), np.array([5.0, 6.0]))
    assert acc == 1.0 and 2.0 < th < 5.0
    th, acc = _best_threshold(np.array([5.0]), np.array([1.0]))
    assert acc == 0.5  # inverted case: best single cut gets half


def test_predict_topk_matches_oracle():
    ds, cfg, idx, model, state = make("transe")
    from openkeonspark_tpu.models import strip_padding
    dense = {k: jnp.asarray(v) for k, v in strip_padding(
        state.params, model.tables(cfg, ds.n_ent, ds.n_rel)).items()}
    h, t, r = ds.test[0].tolist()

    ids, scores = predict_tail_entity(state.params, cfg, ds.n_ent, ds.n_rel,
                                      h, r, k=5)
    s = np.asarray(dense_score("transe", cfg, dense,
                               np.full(ds.n_ent, h), np.arange(ds.n_ent),
                               np.full(ds.n_ent, r)))
    want = set(np.sort(np.argsort(s, kind="stable")[:5]).tolist())
    assert set(np.sort(ids).tolist()) == want
    assert (np.diff(scores) >= 0).all()

    ids2, _ = predict_head_entity(state.params, cfg, ds.n_ent, ds.n_rel,
                                  t, r, k=5)
    s2 = np.asarray(dense_score("transe", cfg, dense,
                                np.arange(ds.n_ent), np.full(ds.n_ent, t),
                                np.full(ds.n_ent, r)))
    assert set(ids2.tolist()) == set(np.argsort(s2, kind="stable")[:5].tolist())

    ids3, s3 = predict_relation(state.params, cfg, ds.n_ent, ds.n_rel, h, t,
                                k=3)
    sr = np.asarray(dense_score("transe", cfg, dense,
                                np.full(ds.n_rel, h), np.full(ds.n_rel, t),
                                np.arange(ds.n_rel)))
    assert ids3.tolist() == np.argsort(sr, kind="stable")[:3].tolist()

    thr, _ = fit_thresholds(state.params, cfg, ds, idx)
    out = predict_triple(state.params, cfg, h, t, r, thresholds=thr)
    assert out["is_true"] == (out["score"] < out["threshold"])
