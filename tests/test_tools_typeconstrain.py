"""Dataset tooling (incremental splitter, type-constraint generator) and
type-constrained evaluation vs a dense NumPy oracle."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from openkeonspark_tpu.config import Config
from openkeonspark_tpu.data.dataset import load_dataset, save_dataset
from openkeonspark_tpu.data.index import build_kg_index
from openkeonspark_tpu.data.synth import random_kg
from openkeonspark_tpu.data.type_constrain import (build_type_constraints,
                                                   load_type_constraints,
                                                   maybe_load,
                                                   save_type_constraints)
from openkeonspark_tpu.eval import type_constrained_link_prediction
from openkeonspark_tpu.models import get_model, strip_padding
from openkeonspark_tpu.train.step import init_state

from oracle import dense_score
from split_incremental import split_incremental


def test_split_incremental_is_cumulative(tmp_path):
    ds = random_kg(n_ent=80, n_rel=5, n_triples=800, n_valid=60, n_test=60,
                   seed=2)
    snaps = list(split_incremental(ds, 3, seed=1))
    assert [i for i, _ in snaps] == [0, 1, 2]
    sets = []
    for _, snap in snaps:
        sets.append({tuple(x) for x in snap.train.tolist()})
        snap.validate()
    assert sets[0] < sets[1] < sets[2]
    assert sets[2] == {tuple(x) for x in ds.train.tolist()}
    # round-trips through the reference text layout
    save_dataset(snaps[1][1], str(tmp_path / "1"))
    back = load_dataset(str(tmp_path / "1"))
    assert {tuple(x) for x in back.train.tolist()} == sets[1]


def test_type_constraints_roundtrip(tmp_path):
    ds = random_kg(n_ent=50, n_rel=4, n_triples=400, n_valid=20, n_test=20,
                   seed=3)
    tc = build_type_constraints(ds)
    p = str(tmp_path / "type_constrain.txt")
    save_type_constraints(tc, p)
    back = load_type_constraints(p)
    assert back.n_rel == tc.n_rel
    for rel in range(tc.n_rel):
        np.testing.assert_array_equal(back.heads[rel], tc.heads[rel])
        np.testing.assert_array_equal(back.tails[rel], tc.tails[rel])
    assert maybe_load(str(tmp_path)) is not None
    assert maybe_load(str(tmp_path / "nope")) is None
    # every observed (h, r) pair is covered
    for h, t, r in ds.all_triples().tolist():
        assert h in set(tc.heads[r].tolist())
        assert t in set(tc.tails[r].tolist())


def test_type_constrained_ranks_match_oracle():
    ds = random_kg(n_ent=71, n_rel=6, n_triples=700, n_valid=30, n_test=30,
                   seed=5)
    cfg = Config(model="transe", hidden_size=12, eval_chunk=16,
                 eval_block=32)
    idx = build_kg_index(ds, for_eval=True)
    tc = build_type_constraints(ds)
    model = get_model("transe")
    state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(4))
    res = type_constrained_link_prediction(state.params, cfg, ds, idx, tc)

    import jax.numpy as jnp
    dense = {k: jnp.asarray(v) for k, v in strip_padding(
        state.params, model.tables(cfg, ds.n_ent, ds.n_rel)).items()}
    all_trip = {tuple(x) for x in ds.all_triples().tolist()}
    tmask = tc.tail_mask(ds.n_ent)
    cand = np.arange(ds.n_ent)
    for i, (h, t, r) in enumerate(ds.test.tolist()):
        s = np.asarray(dense_score("transe", cfg, dense,
                                   np.full(ds.n_ent, h), cand,
                                   np.full(ds.n_ent, r)))
        allowed = tmask[r].astype(bool).copy()
        allowed[t] = True
        better = (s < s[t]) & allowed
        assert res.ranks["raw_tail"][i] == better.sum(), i
        known = np.array([(h, c, r) in all_trip for c in cand])
        known[t] = False
        assert res.ranks["filt_tail"][i] == (better & ~known).sum(), i
    # constrained ranks can never exceed unconstrained
    from openkeonspark_tpu.eval import link_prediction
    unc = link_prediction(state.params, cfg, ds, idx)
    assert (res.ranks["raw_tail"] <= unc.ranks["raw_tail"]).all()
    assert (res.ranks["raw_head"] <= unc.ranks["raw_head"]).all()
