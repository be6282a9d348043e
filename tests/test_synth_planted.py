"""Planted-structure generators for every model family + both directions
(VERDICT.md r1 next #5) and the non-finite-params evaluation guard.

Recovery thresholds are **ceiling-normalized** (VERDICT r3 next #4): each
test evaluates the generator's own hidden tables through the same
evaluator (the achievable maximum given the KG's split and planting
ambiguity) and requires the trained model to reach ≥ RECOVERY_FRAC of it
per direction. Measured at these shapes the trained families hit 78–104%
of ceiling (ceilings 0.67–0.90 Hits@10), so 0.6 leaves seed-noise margin
while being ~2.5× stronger than the old absolute 0.25 floor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.data.index import build_kg_index
from openkeonspark_tpu.data.synth import planted_kg
from openkeonspark_tpu.eval.link_prediction import (guard_finite_params,
                                                    link_prediction)
from openkeonspark_tpu.models import get_model
from openkeonspark_tpu.train.loop import train
from openkeonspark_tpu.train.step import init_state

RECOVERY_FRAC = 0.6


def ceiling_eval(model_name, ds, hidden, dim, idx):
    """Evaluate the generator's hidden tables: the recovery ceiling.
    p_norm=2 matches the generator's squared-Euclidean planting rule.
    (rotate: `dim` counts table lanes; its complex dim is dim//2.)"""
    if model_name == "rotate":
        dim = dim // 2
    cfg = Config(model=model_name, hidden_size=dim, p_norm=2,
                 use_pallas_eval=False, eval_chunk=64, eval_block=128,
                 **({"ent_size": dim, "rel_size": max(2, dim // 2)}
                    if model_name == "transr" else {}))
    return link_prediction({k: jnp.asarray(v) for k, v in hidden.items()},
                           cfg, ds, idx, triples=ds.test)


def assert_recovers(lp, ceil, model_name):
    assert lp.filt_tail.hits10 >= RECOVERY_FRAC * ceil.filt_tail.hits10, \
        (model_name, lp.filt_tail.hits10, ceil.filt_tail.hits10)
    assert lp.filt_head.hits10 >= RECOVERY_FRAC * ceil.filt_head.hits10, \
        (model_name, lp.filt_head.hits10, ceil.filt_head.hits10)


@pytest.mark.parametrize("model_name", ["rotate", "transe", "transh", "transr",
                                        "transd"])
def test_planted_generator_all_families(model_name):
    ds = planted_kg(n_ent=120, n_rel=4, n_triples=1500, n_valid=50,
                    n_test=50, dim=6, noise=0.0, seed=3, model=model_name)
    assert ds.n_train > 800
    all_t = np.concatenate([ds.train, ds.valid, ds.test])
    assert len(np.unique(all_t, axis=0)) == len(all_t)  # deduped
    assert all_t[:, :2].max() < ds.n_ent and all_t[:, 2].max() < ds.n_rel


def test_planted_head_direction_is_learnable():
    """head_frac plants pre-image structure: a trained TransE must rank
    heads as well as tails (the r1 generator was tail-only and head
    prediction was intrinsically ill-posed)."""
    ds, hidden = planted_kg(n_ent=200, n_rel=6, n_triples=4000, n_valid=100,
                            n_test=200, dim=8, noise=0.0, seed=1,
                            head_frac=0.5, with_params=True)
    cfg = Config(model="transe", hidden_size=24, alpha=0.1, margin=2.0,
                 train_times=25, nbatches=15, negative_ent=2,
                 use_pallas_eval=False, eval_chunk=64, eval_block=128)
    res = train(cfg, ds, echo=lambda *a, **k: None)
    idx = build_kg_index(ds, for_eval=True)
    lp = link_prediction(res.state.params, cfg, ds, idx, triples=ds.test)
    ceil = ceiling_eval("transe", ds, hidden, 8, idx)
    assert_recovers(lp, ceil, "transe")        # head-wards now well-posed


def test_planted_transh_recovery():
    """The family-matched generator is recoverable by its family's model
    (per-model CPU smoke; the TPU-scale anchors live in BASELINE.md)."""
    ds, hidden = planted_kg(n_ent=150, n_rel=4, n_triples=3000, n_valid=80,
                            n_test=120, dim=6, noise=0.0, seed=1,
                            model="transh", with_params=True)
    cfg = Config(model="transh", hidden_size=24, alpha=0.005, margin=2.0,
                 train_times=60, nbatches=15, negative_ent=2,
                 use_pallas_eval=False, eval_chunk=64, eval_block=128)
    res = train(cfg, ds, echo=lambda *a, **k: None)
    idx = build_kg_index(ds, for_eval=True)
    lp = link_prediction(res.state.params, cfg, ds, idx, triples=ds.test)
    ceil = ceiling_eval("transh", ds, hidden, 6, idx)
    assert_recovers(lp, ceil, "transh")


def test_planted_transr_recovery():
    """End-to-end: a TransR-planted KG (per-relation projection matrices)
    is recoverable by TransR training — the 'verified recoverable' claim
    lives in the suite, not a commit message (VERDICT r2 missing #3)."""
    ds, hidden = planted_kg(n_ent=150, n_rel=4, n_triples=3000, n_valid=80,
                            n_test=120, dim=6, noise=0.0, seed=1,
                            model="transr", with_params=True)
    cfg = Config(model="transr", ent_size=24, rel_size=12, alpha=0.01,
                 margin=2.0, train_times=60, nbatches=15, negative_ent=2,
                 use_pallas_eval=False, eval_chunk=64, eval_block=128)
    res = train(cfg, ds, echo=lambda *a, **k: None)
    idx = build_kg_index(ds, for_eval=True)
    lp = link_prediction(res.state.params, cfg, ds, idx, triples=ds.test)
    ceil = ceiling_eval("transr", ds, hidden, 6, idx)
    assert_recovers(lp, ceil, "transr")


def test_planted_transd_recovery():
    """End-to-end: a TransD-planted KG (dynamic entity/relation transfer
    maps) is recoverable by TransD training."""
    ds, hidden = planted_kg(n_ent=150, n_rel=4, n_triples=3000, n_valid=80,
                            n_test=120, dim=6, noise=0.0, seed=1,
                            model="transd", with_params=True)
    cfg = Config(model="transd", hidden_size=24, alpha=0.01, margin=2.0,
                 train_times=60, nbatches=15, negative_ent=2,
                 use_pallas_eval=False, eval_chunk=64, eval_block=128)
    res = train(cfg, ds, echo=lambda *a, **k: None)
    idx = build_kg_index(ds, for_eval=True)
    lp = link_prediction(res.state.params, cfg, ds, idx, triples=ds.test)
    ceil = ceiling_eval("transd", ds, hidden, 6, idx)
    assert_recovers(lp, ceil, "transd")


def test_planted_rotate_recovery():
    """End-to-end (beyond-parity, r5): a rotation-planted KG
    (rot(h, θ_r) ≈ t, asymmetric head/tail projections) is recoverable by
    RotatE under the self-adversarial loss — the margin-ranking loss fits
    the train split but does NOT generalize on rotation structure
    (measured: 5% vs 71% of ceiling at 500 entities; BASELINE §7)."""
    ds, hidden = planted_kg(n_ent=150, n_rel=4, n_triples=3000, n_valid=80,
                            n_test=120, dim=8, noise=0.0, seed=1,
                            model="rotate", with_params=True)
    cfg = Config(model="rotate", hidden_size=24, alpha=0.05, margin=6.0,
                 train_times=80, nbatches=15, negative_ent=4,
                 loss_mode="self_adv",
                 use_pallas_eval=False, eval_chunk=64, eval_block=128)
    res = train(cfg, ds, echo=lambda *a, **k: None)
    idx = build_kg_index(ds, for_eval=True)
    lp = link_prediction(res.state.params, cfg, ds, idx, triples=ds.test)
    ceil = ceiling_eval("rotate", ds, hidden, 8, idx)
    assert_recovers(lp, ceil, "rotate")


@pytest.mark.parametrize("model_name", ["distmult", "complex"])
def test_planted_bilinear_recovery(model_name):
    """Beyond-parity bilinears recover the translation-planted structure
    (nearest-neighbor clusters are also high-dot-product clusters — the
    generator's stated rationale, now asserted: measured 0.70-0.80 of the
    transe ceiling at this shape). The ceiling is the transe hidden
    tables — the structure is translation-planted regardless of which
    family trains on it."""
    ds, hidden = planted_kg(n_ent=150, n_rel=4, n_triples=3000, n_valid=80,
                            n_test=120, dim=6, noise=0.0, seed=1,
                            model="transe", with_params=True)
    cfg = Config(model=model_name, hidden_size=24, alpha=0.05, margin=2.0,
                 train_times=60, nbatches=15, negative_ent=2,
                 use_pallas_eval=False, eval_chunk=64, eval_block=128)
    res = train(cfg, ds, echo=lambda *a, **k: None)
    idx = build_kg_index(ds, for_eval=True)
    lp = link_prediction(res.state.params, cfg, ds, idx, triples=ds.test)
    ceil = ceiling_eval("transe", ds, hidden, 6, idx)
    assert_recovers(lp, ceil, model_name)


def test_nan_params_refuse_to_evaluate():
    """NaN scores compare False everywhere → rank 0 → fake-perfect
    Hits@10; the evaluator must fail loudly instead."""
    cfg = Config(model="transe", hidden_size=8)
    model = get_model(cfg.model)
    state = init_state(model, cfg, 50, 4, jax.random.key(0))
    params = dict(state.params)
    params["ent_embeddings"] = params["ent_embeddings"].at[3, 2].set(
        float("nan"))
    with pytest.raises(ValueError, match="non-finite"):
        guard_finite_params(params)
