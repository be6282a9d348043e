"""Relation-grouped TransR training path (ops/pallas_grouped.py): kernel
parity vs the XLA reference, and step-level parity vs the generic
gather/einsum/scatter path (VERDICT r2 #3)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.data.index import build_kg_index
from openkeonspark_tpu.data.synth import random_kg
from openkeonspark_tpu.models import get_model
from openkeonspark_tpu.ops.pallas_grouped import (GROUP, grouped_project,
                                                  grouped_project_ref,
                                                  pad_inputs, plan_runs)
from openkeonspark_tpu.sampling.device import DeviceSampler
from openkeonspark_tpu.train.optim import DenseUpdate, make_optimizer
from openkeonspark_tpu.train.step import (init_state, loss_and_row_grads,
                                          loss_and_row_grads_transr_grouped,
                                          use_grouped_transr)


def test_plan_runs():
    rel = jnp.asarray(np.repeat([2, 5, 6], [3, 1, 4]).astype(np.int32))
    starts, block_first = plan_runs(rel, group=8)
    assert list(np.asarray(starts[:4])) == [0, 3, 4, 8]
    assert list(np.asarray(block_first)) == [0]
    # a run spanning blocks: 16 rows, group 8, run 1 covers [2, 13)
    rel2 = jnp.asarray(np.repeat([0, 1, 3], [2, 11, 3]).astype(np.int32))
    starts2, bf2 = plan_runs(rel2, group=8)
    assert list(np.asarray(starts2[:4])) == [0, 2, 13, 16]
    assert list(np.asarray(bf2)) == [0, 1]


@pytest.mark.parametrize("n_rel,n_rows", [(5, 300), (1, 64), (40, 1000)])
def test_grouped_project_matches_reference(n_rel, n_rows):
    rng = np.random.default_rng(3)
    de, drp = 16, 128
    rel = np.sort(rng.integers(0, n_rel, n_rows)).astype(np.int32)
    x = rng.normal(size=(n_rows, de)).astype(np.float32)
    m3 = rng.normal(size=(n_rel, de, drp)).astype(np.float32)
    xp, relp = pad_inputs(jnp.asarray(x), jnp.asarray(rel))
    y = grouped_project(jnp.asarray(m3), xp, relp, True)[:n_rows]
    want = grouped_project_ref(jnp.asarray(m3), jnp.asarray(x),
                               jnp.asarray(rel))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-5)


def test_grouped_project_vjp_matches_reference():
    rng = np.random.default_rng(7)
    n_rel, de, drp, n_rows = 9, 24, 128, 500
    rel = jnp.asarray(np.sort(rng.integers(0, n_rel, n_rows)).astype(np.int32))
    x = jnp.asarray(rng.normal(size=(n_rows, de)).astype(np.float32))
    m3 = jnp.asarray(rng.normal(size=(n_rel, de, drp)).astype(np.float32))

    def f(m3_, x_):
        xp, relp = pad_inputs(x_, rel)
        return jnp.sum(jnp.sin(grouped_project(m3_, xp, relp, True)[:n_rows]))

    def f_ref(m3_, x_):
        return jnp.sum(jnp.sin(grouped_project_ref(m3_, x_, rel)))

    dm, dx = jax.grad(f, argnums=(0, 1))(m3, x)
    dm_r, dx_r = jax.grad(f_ref, argnums=(0, 1))(m3, x)
    np.testing.assert_allclose(np.asarray(dm), np.asarray(dm_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r), atol=2e-5)
    # relations absent from the stream must have exactly-zero dM rows
    present = np.zeros(n_rel, bool)
    present[np.unique(np.asarray(rel))] = True
    assert bool(jnp.all(dm[~present] == 0))


@pytest.mark.parametrize("opt", ["sgd", "adam"])
def test_grouped_step_matches_generic(opt, monkeypatch):
    """Full TransR step through the grouped path vs the generic path:
    same loss, same post-optimizer tables (float reassociation only)."""
    monkeypatch.setenv("OKST_PALLAS_INTERPRET", "1")
    ds = random_kg(n_ent=90, n_rel=6, n_triples=900, n_valid=30, n_test=30,
                   seed=5)
    cfg = Config(model="transr", ent_size=16, rel_size=8, alpha=0.05,
                 margin=1.0, negative_ent=2, opt_method=opt)
    assert use_grouped_transr(cfg)
    model = get_model("transr")
    index = build_kg_index(ds, for_eval=False)
    sampler = DeviceSampler.build(ds, index)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(2))
    batch = sampler.sample(jax.random.key(9), 128, cfg.negative_ent, 0,
                           cfg.bern)

    loss_g, upd_g = loss_and_row_grads_transr_grouped(model, cfg,
                                                      state.params, batch)
    assert isinstance(upd_g["transfer_matrix"], DenseUpdate)
    cfg_off = cfg.replace(grouped_transr=False)
    assert not use_grouped_transr(cfg_off)
    loss_s, upd_s = loss_and_row_grads(model, cfg_off, state.params, batch)
    np.testing.assert_allclose(float(loss_g), float(loss_s), rtol=1e-5)

    opt_fn = make_optimizer(cfg)
    pg, sg = opt_fn.apply(state.params, state.opt_state, upd_g, state.step)
    ps, ss = opt_fn.apply(state.params, state.opt_state, upd_s, state.step)
    for k in pg:
        np.testing.assert_allclose(np.asarray(pg[k]), np.asarray(ps[k]),
                                   atol=1e-5, err_msg=k)
    if opt == "adam":
        for mv in ("m", "v"):
            np.testing.assert_allclose(
                np.asarray(sg[mv]["transfer_matrix"]),
                np.asarray(ss[mv]["transfer_matrix"]), atol=1e-5,
                err_msg=mv)
