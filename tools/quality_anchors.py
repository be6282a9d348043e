"""Per-family quality anchors: train each model on its family-matched
planted KG at TPU scale and record filtered Hits@10 / MRR (VERDICT r2 #4),
**normalized by the generator's own ceiling** (VERDICT r3 next #4).

The real benchmark splits are unfetchable in this sandbox, so the planted
generators (``data/synth.planted_kg``) are the quality oracle: each KG is
generated FROM a hidden model of the family, so the family's trainer must
recover high filtered Hits@10. Raw planted-KG numbers are meaningless
without a ceiling — the KG's split/noise/ambiguity caps what ANY model of
the family can score — so each run also evaluates the generator's hidden
tables through the same evaluator (``planted_kg(with_params=True)``,
p_norm=2 to match the generator's Euclidean nearest-neighbor rule) and
reports ``recovery = trained_hits10 / ceiling_hits10``. The numbers this
prints are the anchors BASELINE.md pins (regressions in sampling/loss/
eval all surface here).

Usage: python tools/quality_anchors.py
  [--models transe,transh,transr,transd,distmult,complex,rotate]
Prints one JSON line per family.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

SPECS = {
    # (kg kwargs, cfg kwargs) — dims/epochs chosen so each family trains
    # to recovery in ~1-2 min of device time at FB15K-237-ish scale
    # alphas mirror the in-suite recovery tests (tests/test_synth_planted.py)
    # scaled to this KG size — the first r3 run diverged TransH (non-finite
    # tables at alpha=0.02, pre-unit-norm-constraint). Note head_frac=0.5
    # plants BOTH directions, so the averaged Hits@10 here (~0.2) is not
    # comparable to r1's tail-direction-only 0.475 headline.
    "transe": (dict(n_ent=10000, n_rel=24, n_triples=200000, dim=16),
               dict(hidden_size=100, alpha=0.1, margin=2.0,
                    train_times=150, negative_ent=4)),
    "transh": (dict(n_ent=10000, n_rel=24, n_triples=200000, dim=16),
               dict(hidden_size=100, alpha=0.005, margin=2.0,
                    train_times=200, negative_ent=4)),
    "transr": (dict(n_ent=10000, n_rel=24, n_triples=200000, dim=16),
               dict(ent_size=100, rel_size=50, alpha=0.01, margin=2.0,
                    train_times=200, negative_ent=4)),
    "transd": (dict(n_ent=10000, n_rel=24, n_triples=200000, dim=16),
               dict(hidden_size=100, alpha=0.01, margin=2.0,
                    train_times=200, negative_ent=4)),
    # beyond-parity: planted by rot(h, θ_r) ≈ t (asymmetric projections);
    # hypers from the rotate train-sanity test scaled to this KG size
    "rotate": (dict(n_ent=10000, n_rel=24, n_triples=200000, dim=16),
               dict(hidden_size=50, alpha=0.05, margin=6.0,
                    train_times=200, negative_ent=32,
                    loss_mode="self_adv")),
    # beyond-parity bilinears anchor on the TRANSLATION-planted KG (no
    # bilinear generator exists; the in-suite rationale — nearest-
    # neighbor clusters are high-dot-product clusters — is measured at
    # 0.70-0.80x of the transe ceiling at small shape)
    "distmult": (dict(n_ent=10000, n_rel=24, n_triples=200000, dim=16,
                      kg_model="transe"),
                 dict(hidden_size=100, alpha=0.01, margin=2.0,
                      train_times=150, negative_ent=4)),
    "complex": (dict(n_ent=10000, n_rel=24, n_triples=200000, dim=16,
                     kg_model="transe"),
                dict(hidden_size=100, alpha=0.01, margin=2.0,
                     train_times=150, negative_ent=4)),
    # rotate needs the self-adversarial loss AND a high negative rate:
    # margin ranking fits its train split but transfers ~5% of ceiling;
    # self_adv transfers 71% at 500 ents, and at 10k ents recovery scales
    # 7%->29%->34% with negatives 8->32 and 2x epochs — the same
    # contrastive-scarcity law as the translational families (BASELINE 7)
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="transe,transh,transr,transd")
    ap.add_argument("--epochs-scale", type=float, default=1.0,
                    help="multiply each spec's train_times (recovery-vs-"
                         "budget experiments)")
    ap.add_argument("--p-norm", type=int, default=0,
                    help="override the TRAINED model's score norm (0 = "
                         "spec default L1). The ceiling always scores "
                         "p2 — the generator's Euclidean planting rule — "
                         "so --p-norm 2 is the A/B that tests whether the "
                         "recovery plateau is the L1-loss/L2-geometry "
                         "mismatch (VERDICT r4 weak #5)")
    ap.add_argument("--negative-ent", type=int, default=0,
                    help="override negatives per positive (0 = spec)")
    ap.add_argument("--margin", type=float, default=0.0,
                    help="override margin (0 = spec)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scale n_ent AND n_triples by this factor — "
                         "probes the small-shape (78-104%% of ceiling) "
                         "vs 10k-entity (33-46%%) recovery dependence")
    args = ap.parse_args()

    import jax.numpy as jnp

    from openkeonspark_tpu.config import Config
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.data.synth import planted_kg
    from openkeonspark_tpu.eval.link_prediction import link_prediction
    from openkeonspark_tpu.train.loop import train

    for name in args.models.split(","):
        kg_kw, cfg_kw = SPECS[name]
        kg_kw = dict(kg_kw)
        if args.scale != 1.0:
            kg_kw["n_ent"] = max(200, int(kg_kw["n_ent"] * args.scale))
            kg_kw["n_triples"] = max(4000, int(kg_kw["n_triples"]
                                               * args.scale))
        kg_model = kg_kw.pop("kg_model", name)
        n_test = min(5000, kg_kw["n_triples"] // 8)
        ds, hidden = planted_kg(n_valid=min(2000, n_test), n_test=n_test,
                                noise=0.0, seed=1, model=kg_model,
                                head_frac=0.5, with_params=True, **kg_kw)
        cfg_kw = dict(cfg_kw)
        cfg_kw["train_times"] = int(cfg_kw["train_times"]
                                    * args.epochs_scale)
        if args.p_norm:
            cfg_kw["p_norm"] = args.p_norm
        if args.negative_ent:
            cfg_kw["negative_ent"] = args.negative_ent
        if args.margin:
            cfg_kw["margin"] = args.margin
        cfg = Config(model=name, nbatches=100, **cfg_kw)
        t0 = time.time()
        res = train(cfg, ds, echo=lambda *a, **k: None)
        train_s = time.time() - t0
        idx = build_kg_index(ds, for_eval=True)

        # ceiling: the generator's hidden tables through the same
        # evaluator — hidden dim, p_norm=2 (the generator plants by
        # squared-Euclidean nearest neighbors)
        dim = kg_kw["dim"]
        # the ceiling is the GENERATOR family's hidden tables (rotate's
        # `dim` counts table lanes; its complex hidden dim is dim//2)
        hs = dim // 2 if kg_model == "rotate" else dim
        ceil_cfg = Config(model=kg_model, hidden_size=hs, p_norm=2,
                          **({"ent_size": dim, "rel_size": max(2, dim // 2)}
                             if kg_model == "transr" else {}))
        ceil = link_prediction({k: jnp.asarray(v) for k, v in hidden.items()},
                               ceil_cfg, ds, idx, triples=ds.test)

        t0 = time.time()
        lp = link_prediction(res.state.params, cfg, ds, idx,
                             triples=ds.test)
        eval_s = time.time() - t0
        print(json.dumps({
            "model": name, "n_ent": kg_kw["n_ent"],
            "p_norm": cfg.p_norm, "margin": cfg.margin,
            "negative_ent": cfg.negative_ent,
            "n_train": int(ds.n_train),
            "final_loss": round(res.final_loss, 3),
            "train_s": round(train_s, 1), "eval_s": round(eval_s, 1),
            "filt_hits10": round(lp.filt_avg.hits10, 4),
            "filt_mrr": round(lp.filt_avg.mrr, 4),
            "filt_hits10_tail": round(lp.filt_tail.hits10, 4),
            "filt_hits10_head": round(lp.filt_head.hits10, 4),
            "ceiling_hits10": round(ceil.filt_avg.hits10, 4),
            "ceiling_mrr": round(ceil.filt_avg.mrr, 4),
            "recovery_hits10": round(lp.filt_avg.hits10
                                     / max(ceil.filt_avg.hits10, 1e-9), 4),
            "recovery_mrr": round(lp.filt_avg.mrr
                                  / max(ceil.filt_avg.mrr, 1e-9), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
