"""Per-step allclose parity of the sparse training step against the dense
oracle — the BASELINE.json "match per-step scores and embedding updates"
requirement, enforced for every model × optimizer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.data.index import build_kg_index
from openkeonspark_tpu.data.synth import random_kg
from openkeonspark_tpu.models import get_model, strip_padding
from openkeonspark_tpu.sampling.device import DeviceSampler, SampledBatch
from openkeonspark_tpu.train.optim import make_optimizer
from openkeonspark_tpu.train.step import (build_train_step, init_state,
                                          loss_and_row_grads)

from oracle import (dense_adadelta_step, dense_adagrad_step, dense_adam_step,
                    dense_loss, dense_sgd_step, transe_manual_grad)

MODELS = ["transe", "transh", "transr", "transd", "distmult",
          "complex", "rotate"]


def setup(model_name, loss_mode="mean_neg", opt="sgd", p_norm=1):
    ds = random_kg(n_ent=60, n_rel=5, n_triples=600, n_valid=20, n_test=20,
                   seed=11)
    cfg = Config(model=model_name, hidden_size=8, margin=2.0, alpha=0.05,
                 loss_mode=loss_mode, opt_method=opt, p_norm=p_norm,
                 negative_ent=3, negative_rel=1)
    if model_name == "transr":
        cfg = cfg.replace(ent_size=8, rel_size=4)
    model = get_model(model_name)
    idx = build_kg_index(ds, for_eval=False)
    sampler = DeviceSampler.build(ds, idx)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(5))
    return ds, cfg, model, sampler, state


def dense_params_from(state, model, cfg, n_ent, n_rel):
    """Oracle params = stripped (pad-free) copies, so dense ids index the
    same rows."""
    specs = model.tables(cfg, n_ent, n_rel)
    return {k: jnp.asarray(v) for k, v in
            strip_padding(state.params, specs).items()}


def flat_ids(batch):
    from openkeonspark_tpu.train.step import _batch_ids
    h, t, r, n_neg = _batch_ids(batch)
    return np.asarray(h), np.asarray(t), np.asarray(r)


@pytest.mark.parametrize("name", MODELS)
@pytest.mark.parametrize("loss_mode", ["mean_neg", "pairwise",
                                       "self_adv"])
def test_sgd_step_matches_dense_oracle(name, loss_mode):
    ds, cfg, model, sampler, state = setup(name, loss_mode=loss_mode)
    B = 32
    step_fn = jax.jit(build_train_step(model, cfg, sampler, B))
    key = jax.random.key(42)

    # capture the batch the step will draw (same key path)
    batch = sampler.sample(key, B, cfg.negative_ent, cfg.negative_rel,
                           cfg.bern)
    h, t, r = flat_ids(batch)

    dense0 = dense_params_from(state, model, cfg, ds.n_ent, ds.n_rel)
    want_loss, want_params = dense_sgd_step(name, cfg, dense0, h, t, r, B)

    new_state, loss = step_fn(state, sampler, key)
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    got = strip_padding(new_state.params,
                        model.tables(cfg, ds.n_ent, ds.n_rel))
    for k in got:
        np.testing.assert_allclose(got[k], want_params[k], rtol=1e-5,
                                   atol=1e-6, err_msg=f"{name}/{k}")


def _oracle_stateful_step(opt, name, cfg, dense, aux, step, h, t, r, B):
    """Dispatch one lazy dense oracle step; ``aux`` is the optimizer-state
    dict threaded between steps (zeros / adagrad-init on first call)."""
    if aux is None:
        zeros = {k: np.zeros_like(np.asarray(v)) for k, v in dense.items()}
        if opt == "adam":
            aux = {"m": dict(zeros), "v": dict(zeros)}
        elif opt == "adagrad":
            aux = {"accum": {k: np.full_like(np.asarray(v),
                                             cfg.adagrad_init_acc)
                             for k, v in dense.items()}}
        else:
            aux = {"accum": dict(zeros), "accum_update": dict(zeros)}
    if opt == "adam":
        loss, p, m, v = dense_adam_step(name, cfg, dense, aux["m"],
                                        aux["v"], step, h, t, r, B)
        return loss, p, {"m": m, "v": v}
    if opt == "adagrad":
        loss, p, a = dense_adagrad_step(name, cfg, dense, aux["accum"],
                                        step, h, t, r, B)
        return loss, p, {"accum": a}
    loss, p, a, u = dense_adadelta_step(name, cfg, dense, aux["accum"],
                                        aux["accum_update"], step, h, t, r, B)
    return loss, p, {"accum": a, "accum_update": u}


@pytest.mark.parametrize("name", ["transe", "transd"])
@pytest.mark.parametrize("opt", ["adam", "adagrad", "adadelta"])
def test_stateful_opt_step_matches_dense_lazy_oracle(name, opt):
    """All reference ``set_opt_method`` optimizers (VERDICT r3 #5): one
    step of the sparse lazy implementation == the dense lazy oracle."""
    ds, cfg, model, sampler, state = setup(name, opt=opt)
    B = 32
    step_fn = jax.jit(build_train_step(model, cfg, sampler, B))
    key = jax.random.key(43)
    batch = sampler.sample(key, B, cfg.negative_ent, cfg.negative_rel,
                           cfg.bern)
    h, t, r = flat_ids(batch)

    dense0 = dense_params_from(state, model, cfg, ds.n_ent, ds.n_rel)
    want_loss, want_params, _ = _oracle_stateful_step(
        opt, name, cfg, dense0, None, 0, h, t, r, B)

    new_state, loss = step_fn(state, sampler, key)
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    got = strip_padding(new_state.params,
                        model.tables(cfg, ds.n_ent, ds.n_rel))
    for k in got:
        np.testing.assert_allclose(got[k], want_params[k], rtol=1e-4,
                                   atol=1e-6, err_msg=f"{name}/{k}")


@pytest.mark.parametrize("opt", ["adagrad", "adadelta"])
def test_stateful_opt_two_steps_keep_parity(opt):
    """Optimizer-state accumulation across steps (accumulators persist,
    duplicate rows across batches) stays allclose to the dense oracle."""
    ds, cfg, model, sampler, state = setup("transe", opt=opt)
    B = 32
    step_fn = jax.jit(build_train_step(model, cfg, sampler, B))
    k1, k2 = jax.random.split(jax.random.key(44))

    dense = dense_params_from(state, model, cfg, ds.n_ent, ds.n_rel)
    aux = None
    for i, k in enumerate((k1, k2)):
        batch = sampler.sample(k, B, cfg.negative_ent, cfg.negative_rel,
                               cfg.bern)
        h, t, r = flat_ids(batch)
        _, dense, aux = _oracle_stateful_step(
            opt, "transe", cfg,
            {n: jnp.asarray(v) for n, v in dense.items()}, aux, i, h, t, r, B)
        state, _ = step_fn(state, sampler, k)

    got = strip_padding(state.params, model.tables(cfg, ds.n_ent, ds.n_rel))
    for k in got:
        np.testing.assert_allclose(got[k], dense[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)


def test_transe_manual_numpy_gradient():
    """No-autodiff hand gradient — systemic independence check."""
    ds, cfg, model, sampler, state = setup("transe")
    B = 16
    batch = sampler.sample(jax.random.key(9), B, cfg.negative_ent,
                           cfg.negative_rel, cfg.bern)
    h, t, r = flat_ids(batch)
    dense0 = dense_params_from(state, model, cfg, ds.n_ent, ds.n_rel)
    ent = np.asarray(dense0["ent_embeddings"], dtype=np.float64)
    rel = np.asarray(dense0["rel_embeddings"], dtype=np.float64)
    want_loss, d_ent, d_rel = transe_manual_grad(cfg, ent, rel, h, t, r, B)

    loss, updates = loss_and_row_grads(model, cfg, state.params,
                                       batch)
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    # accumulate sparse row grads densely and compare
    got_ent = np.zeros_like(ent)
    got_rel = np.zeros_like(rel)
    for ids, g in updates["ent_embeddings"]:
        np.add.at(got_ent, np.asarray(ids), np.asarray(g, dtype=np.float64))
    for ids, g in updates["rel_embeddings"]:
        np.add.at(got_rel, np.asarray(ids), np.asarray(g, dtype=np.float64))
    np.testing.assert_allclose(got_ent, d_ent, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got_rel, d_rel, rtol=1e-4, atol=1e-6)


def test_two_sgd_steps_keep_parity():
    """Scatter-add accumulation across steps (duplicate rows across batches)
    stays allclose to dense SGD."""
    ds, cfg, model, sampler, state = setup("transe")
    B = 32
    step_fn = jax.jit(build_train_step(model, cfg, sampler, B))
    key = jax.random.key(44)
    k1, k2 = jax.random.split(key)

    dense = dense_params_from(state, model, cfg, ds.n_ent, ds.n_rel)
    for k in (k1, k2):
        batch = sampler.sample(k, B, cfg.negative_ent, cfg.negative_rel,
                               cfg.bern)
        h, t, r = flat_ids(batch)
        _, dense = dense_sgd_step("transe", cfg,
                                  {n: jnp.asarray(v) for n, v in dense.items()},
                                  h, t, r, B)
        state, _ = step_fn(state, sampler, k)

    got = strip_padding(state.params, model.tables(cfg, ds.n_ent, ds.n_rel))
    for k in got:
        np.testing.assert_allclose(got[k], dense[k], rtol=1e-5, atol=1e-6)


def test_loss_modes_differ():
    ds, cfg, model, sampler, state = setup("transe", loss_mode="mean_neg")
    B = 16
    batch = sampler.sample(jax.random.key(1), B, 3, 1, True)
    h, t, r = flat_ids(batch)
    dense0 = dense_params_from(state, model, cfg, ds.n_ent, ds.n_rel)
    l1 = float(dense_loss("transe", cfg, dense0, h, t, r, B))
    l2 = float(dense_loss("transe", cfg.replace(loss_mode="pairwise"),
                          dense0, h, t, r, B))
    assert l1 != l2


def test_adam_dense_and_sorted_paths_agree():
    """The dense-G Adam path (small tables) and the sort-aggregation path
    (huge tables) implement the same lazy update."""
    from openkeonspark_tpu.train.optim import SparseAdam
    ds, cfg, model, sampler, state = setup("transe", opt="adam")
    B = 32
    step_fn = jax.jit(build_train_step(model, cfg, sampler, B))
    key = jax.random.key(77)
    a, _ = step_fn(state, sampler, key)

    old = SparseAdam.DENSE_MOMENT_MAX_ELEMS
    SparseAdam.DENSE_MOMENT_MAX_ELEMS = 0          # force the sort path
    try:
        step_fn2 = jax.jit(build_train_step(model, cfg, sampler, B))
        state2 = init_state(model, cfg, ds.n_ent, ds.n_rel,
                            jax.random.key(5))
        b, _ = step_fn2(state2, sampler, key)
    finally:
        SparseAdam.DENSE_MOMENT_MAX_ELEMS = old
    for k in a.params:
        np.testing.assert_allclose(np.asarray(a.params[k]),
                                   np.asarray(b.params[k]), rtol=1e-6,
                                   atol=1e-7, err_msg=k)
    for mv in ("m", "v"):
        for k in a.opt_state[mv]:
            np.testing.assert_allclose(np.asarray(a.opt_state[mv][k]),
                                       np.asarray(b.opt_state[mv][k]),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"{mv}/{k}")
