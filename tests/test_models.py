import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.models import get_model, init_tables, strip_padding
from openkeonspark_tpu.models.base import padded_rows

MODELS = ["transe", "transh", "transr", "transd", "rotate"]


def make(model_name, **kw):
    cfg = Config(model=model_name, hidden_size=16, **kw)
    model = get_model(model_name)
    specs = model.tables(cfg, n_ent=30, n_rel=7)
    params = init_tables(jax.random.key(0), specs)
    return cfg, model, specs, params


@pytest.mark.parametrize("name", MODELS)
def test_score_shapes_and_finite(name):
    cfg, model, specs, params = make(name)
    h = jnp.arange(10, dtype=jnp.int32)
    t = jnp.arange(10, 20, dtype=jnp.int32)
    r = jnp.zeros(10, dtype=jnp.int32)
    s = model.score_triples(params, h, t, r, cfg)
    assert s.shape == (10,)
    assert np.all(np.isfinite(np.asarray(s)))
    assert np.all(np.asarray(s) >= 0)  # p-norms are nonnegative


def test_padding_rows():
    assert padded_rows(10, 1) == 11
    assert padded_rows(10, 4) == 12
    assert padded_rows(11, 4) == 12
    cfg, model, specs, params = make("transe")
    assert params["ent_embeddings"].shape[0] == 31
    # padding row is zero
    np.testing.assert_array_equal(np.asarray(params["ent_embeddings"][30]), 0)
    stripped = strip_padding(params, specs)
    assert stripped["ent_embeddings"].shape == (30, 16)


def test_transe_formula():
    cfg, model, specs, params = make("transe")
    E = np.asarray(params["ent_embeddings"])
    R = np.asarray(params["rel_embeddings"])
    h, t, r = np.array([1, 2]), np.array([3, 4]), np.array([0, 5])
    want = np.abs(E[h] + R[r] - E[t]).sum(-1)
    got = np.asarray(model.score_triples(params, jnp.asarray(h),
                                         jnp.asarray(t), jnp.asarray(r), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # p=2 variant: squared L2
    cfg2 = cfg.replace(p_norm=2)
    want2 = ((E[h] + R[r] - E[t]) ** 2).sum(-1)
    got2 = np.asarray(model.score_triples(params, jnp.asarray(h),
                                          jnp.asarray(t), jnp.asarray(r),
                                          cfg2))
    np.testing.assert_allclose(got2, want2, rtol=1e-6)


def test_transr_dims():
    cfg = Config(model="transr", hidden_size=16, ent_size=16, rel_size=8)
    model = get_model("transr")
    specs = model.tables(cfg, n_ent=30, n_rel=7)
    assert specs["transfer_matrix"].dim == 16 * 8
    assert specs["rel_embeddings"].dim == 8
    params = init_tables(jax.random.key(0), specs)
    s = model.score_triples(params, jnp.array([0]), jnp.array([1]),
                            jnp.array([2]), cfg)
    assert s.shape == (1,)


def test_transh_projection_is_invariant_to_w_component():
    """Score must not change when adding a multiple of w to h (after
    projection the w-component vanishes) — only when w is unit norm; with
    raw w the projection still kills exactly the w direction iff |w|=1.
    Verify the algebraic property: projecting twice == projecting once when
    |w| = 1."""
    cfg, model, specs, params = make("transh")
    w = np.asarray(params["normal_vectors"])
    w_unit = w / np.linalg.norm(w, axis=1, keepdims=True)
    params = dict(params)
    params["normal_vectors"] = jnp.asarray(
        np.concatenate([w_unit[:-1], np.zeros((1, 16), np.float32)]))
    E = np.asarray(params["ent_embeddings"])
    r = jnp.zeros(5, dtype=jnp.int32)
    h = jnp.arange(5, dtype=jnp.int32)
    t = jnp.arange(5, 10, dtype=jnp.int32)
    base = model.score_triples(params, h, t, r, cfg)
    # shift h rows along w[0]: projected score unchanged
    E2 = E.copy()
    E2[:5] += 3.0 * np.asarray(params["normal_vectors"])[0]
    params2 = dict(params)
    params2["ent_embeddings"] = jnp.asarray(E2)
    shifted = model.score_triples(params2, h, t, r, cfg)
    np.testing.assert_allclose(np.asarray(base), np.asarray(shifted),
                               atol=1e-4)


def test_rotate_trains_and_evaluates():
    """Beyond-parity RotatE: loss decreases under the shared trainer and
    the full evaluator runs (rank exactness is covered by
    test_eval.py::test_link_prediction_matches_dense_oracle[rotate])."""
    from openkeonspark_tpu.data.synth import random_kg
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.eval.link_prediction import link_prediction
    from openkeonspark_tpu.train.loop import train

    ds = random_kg(n_ent=200, n_rel=6, n_triples=3000, n_valid=40,
                   n_test=40, seed=2)
    cfg = Config(model="rotate", hidden_size=16, alpha=0.05, margin=4.0,
                 train_times=8, nbatches=10, negative_ent=2, log_every=0)
    res = train(cfg, ds, echo=lambda *a, **k: None)
    assert res.history[-1].loss < res.history[0].loss * 0.8
    idx = build_kg_index(ds, for_eval=True)
    lp = link_prediction(res.state.params, cfg, ds, idx)
    assert 0.0 <= lp.filt_avg.mrr <= 1.0
