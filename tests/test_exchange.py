"""Boundary-exchange sharded step (parallel/exchange.py): parity with the
legacy psum step, exactness under adversarial bucket overflow, and the
comm-volume drop the north star demands (VERDICT.md #1/#2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.data.index import build_kg_index
from openkeonspark_tpu.data.synth import random_kg
from openkeonspark_tpu.models import get_model, strip_padding
from openkeonspark_tpu.parallel import (build_exchange_train_step,
                                        build_sharded_train_step, make_mesh,
                                        shard_sampler, shard_state)
from openkeonspark_tpu.parallel.comm import collective_bytes
from openkeonspark_tpu.sampling.device import DeviceSampler
from openkeonspark_tpu.train.step import init_state


@pytest.fixture(scope="module")
def kg():
    ds = random_kg(n_ent=100, n_rel=6, n_triples=1000, n_valid=30, n_test=30,
                   seed=2)
    idx = build_kg_index(ds, for_eval=False)
    return ds, idx


def setup(ds, idx, model_name="transe", opt="sgd", pad=1, **cfg_kw):
    cfg = Config(model=model_name, hidden_size=16, alpha=0.05,
                 negative_ent=2, negative_rel=1, opt_method=opt, **cfg_kw)
    model = get_model(cfg.model)
    sampler = DeviceSampler.build(ds, idx)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(0),
                       pad_to_multiple=pad)
    return cfg, model, sampler, state


def run_pair(ds, idx, mesh_shape, batch, model_name="transe", opt="sgd",
             steps=3, **cfg_kw):
    """Run legacy psum step and exchange step with identical keys; return
    final (loss, params, first-moments) of each. Draws are identical by
    construction (same fold_in(key, data_idx) per data row)."""
    cfg, model, sampler, state = setup(ds, idx, model_name, opt,
                                       pad=mesh_shape[1], **cfg_kw)
    mesh = make_mesh(mesh_shape)
    sh0 = shard_state(state, mesh)
    ssampler = shard_sampler(sampler, mesh)
    legacy = jax.jit(build_sharded_train_step(model, cfg, ssampler, batch,
                                              mesh))
    exch = jax.jit(build_exchange_train_step(model, cfg, ssampler, batch,
                                             mesh))
    a, b = sh0, sh0
    la = lb = None
    for i in range(steps):
        a, la = legacy(a, ssampler, jax.random.key(i))
        b, lb = exch(b, ssampler, jax.random.key(i))
    specs = model.tables(cfg, ds.n_ent, ds.n_rel)

    def out(st, loss):
        m = (strip_padding(st.opt_state["m"], specs)
             if opt == "adam" else None)
        return float(loss), strip_padding(st.params, specs), m

    return out(a, la), out(b, lb)


def assert_match(pa, pb, ma=None, msg=""):
    """Tight allclose — except, for Adam, cells whose aggregated gradient
    is exact-cancellation noise (|G| at float-reassociation ulp level):
    there ``m/(sqrt(v)+eps)`` is ±sign(G)-scaled and reordered summation
    legitimately flips the sign (measured |G| ≤ 3e-7 at such cells, delta
    jump ≈ 2·lr_t). Everything real must match to 1e-6."""
    for k in pa:
        if ma is None:
            np.testing.assert_allclose(pa[k], pb[k], rtol=1e-6, atol=1e-7,
                                       err_msg=f"{msg}/{k}")
        else:
            noise = np.abs(ma[k]) < 1e-5
            np.testing.assert_allclose(pa[k][~noise], pb[k][~noise],
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"{msg}/{k}")
            np.testing.assert_allclose(pa[k][noise], pb[k][noise], atol=0.5,
                                       err_msg=f"{msg}/{k} (noise cells)")


@pytest.mark.parametrize("opt", ["sgd", "adam"])
@pytest.mark.parametrize("mesh_shape", [(1, 2), (1, 4), (2, 2), (4, 2)])
def test_exchange_matches_legacy(kg, mesh_shape, opt):
    """Same draws ⇒ gathered rows and per-row gradients are exact; only
    duplicate-id scatter order differs (float reassociation). Adam runs
    one step (its cancelled-gradient sign sensitivity compounds over
    steps — see assert_match)."""
    ds, idx = kg
    steps = 1 if opt == "adam" else 3
    (la, pa, ma), (lb, pb, _) = run_pair(ds, idx, mesh_shape, batch=64,
                                         opt=opt, steps=steps)
    assert la == pytest.approx(lb, rel=1e-6)
    assert_match(pa, pb, ma, msg=f"{opt}/{mesh_shape}")


@pytest.mark.parametrize("model_name", ["transr", "complex"])
def test_exchange_matches_legacy_other_models(kg, model_name):
    """Wide-row (TransR transfer_matrix) and 2d-lane (ComplEx) tables ride
    the same exchange machinery."""
    ds, idx = kg
    (la, pa, _), (lb, pb, _) = run_pair(ds, idx, (2, 2), batch=64,
                                        model_name=model_name)
    assert la == pytest.approx(lb, rel=1e-6)
    assert_match(pa, pb, msg=model_name)


def test_exchange_overflow_fallback_is_exact(kg):
    """slack → 0 forces every bucket to overflow: the cond-gated fallback
    (gather psum_scatter + update all_gather folded into one optimizer
    apply) must still reproduce the legacy step."""
    ds, idx = kg
    (la, pa, ma), (lb, pb, _) = run_pair(ds, idx, (2, 4), batch=64,
                                         opt="adam", steps=1,
                                         exchange_slack=0.01)
    assert la == pytest.approx(lb, rel=1e-6)
    assert_match(pa, pb, ma, msg="overflow")


def test_exchange_microbatch_invariance(kg):
    """exchange_microbatches only reorders independent chains; gradients
    are taken at the same params, so results must agree across settings."""
    ds, idx = kg
    (_, p1, _), (_, p2, _) = (
        run_pair(ds, idx, (1, 4), batch=64,
                 exchange_microbatches=m)[1]  # exchange result only
        for m in (1, 4))
    for k in p1:
        np.testing.assert_allclose(p1[k], p2[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


@pytest.mark.parametrize("mesh_shape,min_ratio", [((2, 4), 1.7),
                                                  ((1, 8), 3.0)])
def test_exchange_comm_bytes_drop(kg, mesh_shape, min_ratio):
    """The whole point: per-device collective payload must drop vs the
    legacy psum/all_gather step — O(batch_rows·d·M) → O(unique_rows·d·slack)
    (VERDICT.md #1 'done' criterion). The legacy psum payload per device is
    independent of M while the exchange shrinks ∝ 1/M, so the drop must
    grow with the model axis: ≥1.7× at M=4 (slack 2 pads each bucket 2×),
    ≥3× at M=8."""
    ds, idx = kg
    cfg = Config(model="transe", hidden_size=64, alpha=0.05,
                 negative_ent=2, negative_rel=1, exchange_microbatches=1)
    model = get_model(cfg.model)
    sampler = DeviceSampler.build(ds, idx)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(0),
                       pad_to_multiple=mesh_shape[1])
    mesh = make_mesh(mesh_shape)
    sh = shard_state(state, mesh)
    ss = shard_sampler(sampler, mesh)
    batch = 256
    legacy = jax.jit(build_sharded_train_step(model, cfg, ss, batch, mesh))
    exch = jax.jit(build_exchange_train_step(model, cfg, ss, batch, mesh))
    key = jax.random.key(0)
    b_legacy = collective_bytes(legacy, sh, ss, key)
    b_exch = collective_bytes(exch, sh, ss, key)
    heavy_legacy = b_legacy["all-reduce"] + b_legacy["all-gather"]
    heavy_exch = (b_exch["all-to-all"] + b_exch["all-gather"]
                  + b_exch["all-reduce"])
    assert heavy_exch * min_ratio <= heavy_legacy, (b_legacy, b_exch)
    assert b_exch["all-to-all"] > 0  # the exchange actually lowered to a2a
