"""Sharded-step correctness on the 8-virtual-CPU-device mesh (SURVEY.md §4:
multi-host logic tested single-host via simulated devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.data.index import build_kg_index
from openkeonspark_tpu.data.synth import random_kg
from openkeonspark_tpu.models import get_model, strip_padding
from openkeonspark_tpu.sampling.device import DeviceSampler
from openkeonspark_tpu.parallel import (build_sharded_train_step, make_mesh,
                                        shard_sampler, shard_state)
from openkeonspark_tpu.train.step import build_train_step, init_state


@pytest.fixture(scope="module")
def kg():
    ds = random_kg(n_ent=100, n_rel=6, n_triples=1000, n_valid=30, n_test=30,
                   seed=2)
    idx = build_kg_index(ds, for_eval=False)
    return ds, idx


def setup(ds, idx, opt="sgd", pad=1):
    cfg = Config(model="transe", hidden_size=16, alpha=0.05, negative_ent=2,
                 negative_rel=1, opt_method=opt)
    model = get_model(cfg.model)
    sampler = DeviceSampler.build(ds, idx)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(0),
                       pad_to_multiple=pad)
    return cfg, model, sampler, state


@pytest.mark.parametrize("opt", ["sgd", "adam"])
@pytest.mark.parametrize("model_axis", [2, 4])
def test_model_sharding_matches_single_device(kg, opt, model_axis):
    """data=1 ⇒ identical batch ⇒ the row-sharded gather + masked sparse
    update must reproduce the single-device step to float-reassociation
    tolerance (not bitwise: the sharded scatter applies the same updates
    in a different duplicate-collision order — VERDICT.md r1 weak #4)."""
    ds, idx = kg
    cfg, model, sampler, state = setup(ds, idx, opt=opt, pad=model_axis)
    mesh = make_mesh((1, model_axis))

    step_ref = jax.jit(build_train_step(model, cfg, sampler, 64))
    sh = shard_state(state, mesh)
    step_sh = jax.jit(build_sharded_train_step(
        model, cfg, shard_sampler(sampler, mesh), 64, mesh))

    a, la = state, None
    b, lb = sh, None
    for i in range(3):
        a, la = step_ref(a, sampler, jax.random.key(i))
        b, lb = step_sh(b, shard_sampler(sampler, mesh), jax.random.key(i))
    assert float(la) == pytest.approx(float(lb), rel=1e-6)
    specs = model.tables(cfg, ds.n_ent, ds.n_rel)
    pa = strip_padding(a.params, specs)
    pb = strip_padding(b.params, specs)
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], rtol=1e-6, atol=1e-7,
                                   err_msg=f"{opt}/m{model_axis}/{k}")


def test_data_sharding_trains_and_stays_synced(kg):
    """4 data shards × 2 model shards: loss decreases and every device's
    view of the (replicated-over-data) tables agrees."""
    ds, idx = kg
    cfg, model, sampler, state = setup(ds, idx, opt="sgd", pad=2)
    mesh = make_mesh((4, 2))
    sh = shard_state(state, mesh)
    step = jax.jit(build_sharded_train_step(
        model, cfg, shard_sampler(sampler, mesh), 128, mesh))

    losses = []
    for i in range(20):
        sh, loss = step(sh, shard_sampler(sampler, mesh), jax.random.key(i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # addressable shards along 'data' must be identical replicas
    ent = sh.params["ent_embeddings"]
    per_dev = {tuple(s.index[0].indices(ent.shape[0])): np.asarray(s.data)
               for s in ent.addressable_shards}
    assert len(per_dev) == 2  # 2 distinct row ranges (model axis)
    for s in ent.addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(s.data),
            per_dev[tuple(s.index[0].indices(ent.shape[0]))])


@pytest.mark.parametrize("model_name", ["transe", "transh", "transr",
                                        "transd", "distmult", "complex",
                                        "rotate"])
def test_sharded_eval_matches_single_device(kg, model_name):
    """Candidate axis over 'model', queries over 'data': ranks must equal
    the single-device evaluator exactly."""
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.eval import link_prediction
    from openkeonspark_tpu.parallel.eval import sharded_link_prediction

    ds, _ = kg
    idx = build_kg_index(ds, for_eval=True)
    cfg = Config(model=model_name, hidden_size=16, eval_chunk=8,
                 eval_block=32, use_pallas_eval=False)
    model = get_model(model_name)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(8),
                       pad_to_multiple=4)
    mesh = make_mesh((2, 4))
    sh = shard_state(state, mesh)
    res1 = link_prediction(state.params, cfg, ds, idx,
                           triples=ds.test[:24])
    res2 = sharded_link_prediction(sh.params, cfg, ds, idx, mesh,
                                   triples=ds.test[:24])
    for k in res1.ranks:
        np.testing.assert_array_equal(res1.ranks[k], res2.ranks[k],
                                      err_msg=f"{model_name}/{k}")


def test_data_sharding_gradient_sum_semantics(kg):
    """D=2, deterministic check: the sharded step's update must equal the
    single-device update on the union of the two shard batches (gradient
    sum, not average)."""
    ds, idx = kg
    cfg, model, sampler, state = setup(ds, idx, opt="sgd")
    mesh = make_mesh((2, 1))
    sh = shard_state(init_state(model, cfg, ds.n_ent, ds.n_rel,
                                jax.random.key(0)), mesh)
    step = jax.jit(build_sharded_train_step(
        model, cfg, shard_sampler(sampler, mesh), 64, mesh))
    key = jax.random.key(7)
    b, lb = step(sh, shard_sampler(sampler, mesh), key)

    # reproduce on host: each shard draws 32 positives from its slice with
    # fold_in(key, d); apply both updates to one dense table copy
    from openkeonspark_tpu.train.step import loss_and_row_grads
    T = ds.n_train
    base = T // 2
    params = dict(state.params)
    total_loss = 0.0
    all_updates = []
    for d in range(2):
        kd = jax.random.fold_in(key, d)
        start = d * base
        size = base if d == 0 else T - base
        batch = sampler.sample(kd, 32, cfg.negative_ent, cfg.negative_rel,
                               cfg.bern,
                               partition=(jnp.int32(start), jnp.int32(size)))
        loss, ups = loss_and_row_grads(model, cfg, state.params, batch)
        total_loss += float(loss)
        all_updates.append(ups)
    for ups in all_updates:
        for table, pairs in ups.items():
            t = params[table]
            for ids, g in pairs:
                t = t.at[ids].add(-cfg.alpha * g)
            params[table] = t

    assert float(lb) == pytest.approx(total_loss, rel=1e-5)
    specs = model.tables(cfg, ds.n_ent, ds.n_rel)
    pa = strip_padding(params, specs)
    pb = strip_padding(b.params, specs)
    for k in pa:
        np.testing.assert_allclose(pb[k], pa[k], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("model_name", ["distmult", "complex"])
def test_bilinear_models_shard_like_single_device(kg, model_name):
    """The bilinear additions train identically sharded vs single-device
    (model-agnostic machinery, but the 2d-wide ComplEx tables and negated
    scores deserve their own check). Same reassociation tolerance as
    above."""
    ds, idx = kg
    cfg = Config(model=model_name, hidden_size=16, alpha=0.05,
                 negative_ent=2, negative_rel=1)
    model = get_model(cfg.model)
    sampler = DeviceSampler.build(ds, idx)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(0),
                       pad_to_multiple=2)
    mesh = make_mesh((1, 2))
    step_ref = jax.jit(build_train_step(model, cfg, sampler, 64))
    step_sh = jax.jit(build_sharded_train_step(
        model, cfg, shard_sampler(sampler, mesh), 64, mesh))
    a, b = state, shard_state(state, mesh)
    for i in range(3):
        a, la = step_ref(a, sampler, jax.random.key(i))
        b, lb = step_sh(b, shard_sampler(sampler, mesh), jax.random.key(i))
    assert float(la) == pytest.approx(float(lb), rel=1e-6)
    specs = model.tables(cfg, ds.n_ent, ds.n_rel)
    pa = strip_padding(a.params, specs)
    pb = strip_padding(b.params, specs)
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], rtol=1e-6, atol=1e-7,
                                   err_msg=f"{model_name}/{k}")


@pytest.mark.parametrize("model_name", ["transe", "transh"])
def test_sharded_type_constrained_matches_single_device(kg, model_name):
    """Type-constrained ranks with the mask sharded over 'model' along the
    entity axis must equal the single-device dense-mask evaluator exactly
    (VERDICT r3 next #6) — incl. a projection model (TransH)."""
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.data.type_constrain import build_type_constraints
    from openkeonspark_tpu.eval import type_constrained_link_prediction
    from openkeonspark_tpu.parallel.eval import \
        sharded_type_constrained_link_prediction

    ds, _ = kg
    idx = build_kg_index(ds, for_eval=True)
    tc = build_type_constraints(ds)
    cfg = Config(model=model_name, hidden_size=16, eval_chunk=8,
                 eval_block=32, use_pallas_eval=False)
    model = get_model(cfg.model)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(8),
                       pad_to_multiple=4)
    mesh = make_mesh((2, 4))
    sh = shard_state(state, mesh)
    res1 = type_constrained_link_prediction(state.params, cfg, ds, idx, tc,
                                            triples=ds.test[:24])
    res2 = sharded_type_constrained_link_prediction(
        sh.params, cfg, ds, idx, tc, mesh, triples=ds.test[:24])
    for k in res1.ranks:
        np.testing.assert_array_equal(res1.ranks[k], res2.ranks[k],
                                      err_msg=k)


def test_sharded_classification_matches_single_device(kg):
    """Thresholds fitted from ShardedTripleScorer scores must reproduce
    the single-device classification metrics (identical arithmetic: each
    slot row is served by its owning shard and psum'd)."""
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.eval import triple_classification
    from openkeonspark_tpu.parallel.eval import ShardedTripleScorer

    ds, _ = kg
    idx = build_kg_index(ds, for_eval=True)
    cfg = Config(model="transe", hidden_size=16)
    model = get_model(cfg.model)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(8),
                       pad_to_multiple=4)
    mesh = make_mesh((2, 4))
    sh = shard_state(state, mesh)
    r1 = triple_classification(state.params, cfg, ds, idx)
    r2 = triple_classification(sh.params, cfg, ds, idx,
                               score_fn=ShardedTripleScorer(cfg, mesh))
    for k in r1:
        assert r1[k] == pytest.approx(r2[k], abs=1e-9), (k, r1, r2)
