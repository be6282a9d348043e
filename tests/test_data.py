import numpy as np
import pytest

from openkeonspark_tpu.data.dataset import Dataset, load_dataset, save_dataset
from openkeonspark_tpu.data.index import (build_group_index, bern_stats,
                                          build_kg_index)
from openkeonspark_tpu.data.synth import planted_kg, random_kg


def test_roundtrip(tmp_path):
    ds = random_kg(n_ent=50, n_rel=5, n_triples=300, n_valid=30, n_test=30,
                   seed=1)
    save_dataset(ds, str(tmp_path))
    back = load_dataset(str(tmp_path))
    assert back.n_ent == ds.n_ent and back.n_rel == ds.n_rel
    np.testing.assert_array_equal(back.train, ds.train)
    np.testing.assert_array_equal(back.valid, ds.valid)
    np.testing.assert_array_equal(back.test, ds.test)


def test_validate_rejects_out_of_range():
    bad = np.array([[0, 99, 0]], dtype=np.int32)
    with pytest.raises(ValueError):
        Dataset(n_ent=10, n_rel=1, train=bad).validate()


def test_all_triples_concat():
    ds = random_kg(n_ent=40, n_rel=4, n_triples=200, n_valid=20, n_test=20,
                   seed=2)
    assert len(ds.all_triples()) == ds.n_train + ds.n_valid + ds.n_test


def test_group_index_vs_bruteforce():
    rng = np.random.default_rng(0)
    n_a, n_b, n_v = 30, 7, 40
    a = rng.integers(0, n_a, 500)
    b = rng.integers(0, n_b, 500)
    v = rng.integers(0, n_v, 500)
    gi = build_group_index(a, b, v, n_b, n_v)

    groups = {}
    for ai, bi, vi in zip(a, b, v):
        groups.setdefault((ai, bi), set()).add(vi)

    # lookup + contains parity with the brute-force dict
    qa = rng.integers(0, n_a, 200)
    qb = rng.integers(0, n_b, 200)
    qv = rng.integers(0, n_v, 200)
    got = gi.contains(qa, qb, qv)
    want = np.array([qv[i] in groups.get((qa[i], qb[i]), set())
                     for i in range(200)])
    np.testing.assert_array_equal(got, want)

    # group lists are sorted + deduped; adj strictly increasing per group
    for g in range(len(gi.keys)):
        off, cnt = gi.group_off[g], gi.group_cnt[g]
        vals = gi.sorted_vals[off:off + cnt]
        assert np.all(np.diff(vals) > 0)
        adj = gi.adj[off:off + cnt]
        assert np.all(np.diff(adj) >= 0)
        key = gi.keys[g]
        assert set(vals) == groups[(key // n_b, key % n_b)]


def test_complement_offset_trick():
    """The (adj, upper_bound) construction must enumerate exactly the
    complement of each group, in order."""
    rng = np.random.default_rng(3)
    n_v = 25
    a = np.zeros(10, dtype=int)
    b = np.zeros(10, dtype=int)
    v = rng.choice(n_v, size=10, replace=False)
    gi = build_group_index(a, b, v, 1, n_v)
    off, cnt = int(gi.group_off[0]), int(gi.group_cnt[0])
    adj = gi.adj[off:off + cnt]
    complement = sorted(set(range(n_v)) - set(v.tolist()))
    for x in range(n_v - cnt):
        k = np.searchsorted(adj, x, side="right")
        assert x + k == complement[x]


def test_bern_stats():
    #   r=0: heads {0,1} tails {5}; 2 triples -> tph=1, hpt=2
    train = np.array([[0, 5, 0], [1, 5, 0]], dtype=np.int32)
    tph, hpt = bern_stats(train, n_rel=2)
    assert tph[0] == 1.0 and hpt[0] == 2.0
    assert tph[1] == 1.0 and hpt[1] == 1.0  # absent relation default


def test_kg_index_build():
    ds = planted_kg(n_ent=200, n_rel=5, n_triples=2000, n_valid=100,
                    n_test=100, dim=8, seed=0)
    idx = build_kg_index(ds)
    rows = idx.train_row_tables(ds.train)
    # every train triple's tail must be inside its own (h,r) group
    assert np.all(rows["hr_cnt"] >= 1)
    assert np.all(rows["tr_cnt"] >= 1)
    assert np.all(rows["ht_cnt"] >= 1)
    p = idx.p_corrupt_head
    assert np.all((p > 0) & (p < 1))
