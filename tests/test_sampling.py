import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openkeonspark_tpu.data.index import build_kg_index
from openkeonspark_tpu.data.synth import random_kg
from openkeonspark_tpu.sampling.device import (DeviceSampler,
                                               batched_upper_bound,
                                               flatten_reference_layout)


@pytest.fixture(scope="module")
def kg():
    ds = random_kg(n_ent=120, n_rel=6, n_triples=1500, n_valid=50, n_test=50,
                   seed=7)
    idx = build_kg_index(ds)
    sampler = DeviceSampler.build(ds, idx)
    return ds, idx, sampler


def test_batched_upper_bound_matches_searchsorted():
    rng = np.random.default_rng(0)
    windows = [np.sort(rng.choice(100, size=n, replace=False))
               for n in [0, 1, 3, 17, 40]]
    arr = np.concatenate([w for w in windows if len(w)]).astype(np.int32)
    offs, cur = [], 0
    for w in windows:
        offs.append(cur)
        cur += len(w)
    queries, want, off_q, cnt_q = [], [], [], []
    for wi, w in enumerate(windows):
        for x in rng.integers(-5, 105, size=20):
            queries.append(x)
            off_q.append(offs[wi])
            cnt_q.append(len(w))
            want.append(int(np.searchsorted(w, x, side="right")))
    got = batched_upper_bound(jnp.asarray(arr),
                              jnp.asarray(off_q, jnp.int32),
                              jnp.asarray(cnt_q, jnp.int32),
                              jnp.asarray(queries, jnp.int32), iters=7)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_negatives_are_filtered(kg):
    """No corrupted triple may be an existing train triple — the exact-filter
    guarantee of Corrupt.h, preserved on device."""
    ds, idx, sampler = kg
    train_set = {tuple(t) for t in ds.train.tolist()}
    batch = jax.jit(lambda k: sampler.sample(k, 512, 4, 2, True))(
        jax.random.key(0))
    h = np.asarray(batch.h)
    t = np.asarray(batch.t)
    r = np.asarray(batch.r)
    nh, nt = np.asarray(batch.neg_h), np.asarray(batch.neg_t)
    nr = np.asarray(batch.neg_rel)
    for i in range(512):
        assert (h[i], t[i], r[i]) in train_set  # positives from train
        for j in range(4):
            assert (nh[i, j], nt[i, j], r[i]) not in train_set
            assert 0 <= nh[i, j] < ds.n_ent and 0 <= nt[i, j] < ds.n_ent
            # exactly one slot corrupted (complement sampling can never
            # return the original entity)
            assert (nh[i, j] != h[i]) != (nt[i, j] != t[i])
        # a (h,t) pair linked by EVERY relation has an empty complement —
        # the sampler then falls back to "any relation but the positive's
        # own" (collisions with other train triples unavoidable)
        saturated = len({rr for (hh, tt, rr) in train_set
                         if hh == h[i] and tt == t[i]}) == ds.n_rel
        for j in range(2):
            if not saturated:
                assert (h[i], t[i], nr[i, j]) not in train_set
            assert nr[i, j] != r[i]
            assert 0 <= nr[i, j] < ds.n_rel


def test_complement_uniformity(kg):
    """Corrupted tails for a fixed positive must be ~uniform over the
    complement of its (h,r) tail set."""
    ds, idx, sampler = kg
    # take the train triple with the largest (h,r) group to stress the trick
    rows = idx.train_row_tables(ds.train)
    i = int(np.argmax(rows["hr_cnt"]))
    h0, t0, r0 = ds.train[i]
    known = set(ds.train[(ds.train[:, 0] == h0) & (ds.train[:, 2] == r0),
                         1].tolist())
    complement = np.array(sorted(set(range(ds.n_ent)) - known))

    # force tail corruption by zeroing p_corrupt_head
    import dataclasses
    forced = dataclasses.replace(
        sampler, p_corrupt_head=dataclasses.replace(
            sampler.p_corrupt_head,
            rows=jnp.zeros_like(sampler.p_corrupt_head.rows)))
    n_draw, counts = 20000, {}
    part = (jnp.int32(i), jnp.int32(1))  # only draw positive i
    batch = jax.jit(lambda k: forced.sample(k, n_draw, 1, 0, True,
                                            partition=part))(
        jax.random.key(1))
    nt = np.asarray(batch.neg_t)[:, 0]
    assert set(np.unique(nt)).issubset(set(complement.tolist()))
    freq = np.bincount(nt, minlength=ds.n_ent)[complement]
    expected = n_draw / len(complement)
    # loose chi-square-style bound: all complement entities hit, no 5x skew
    assert freq.min() > 0
    assert freq.max() < 5 * expected


def test_bern_head_tail_ratio(kg):
    """Fraction of head-corruptions per relation ≈ tph/(tph+hpt)."""
    ds, idx, sampler = kg
    batch = jax.jit(lambda k: sampler.sample(k, 40000, 1, 0, True))(
        jax.random.key(2))
    h = np.asarray(batch.h)
    r = np.asarray(batch.r)
    head_corrupted = np.asarray(batch.neg_h)[:, 0] != h
    p = idx.p_corrupt_head
    for rel in range(ds.n_rel):
        m = r == rel
        if m.sum() < 500:
            continue
        frac = head_corrupted[m].mean()
        assert abs(frac - p[rel]) < 0.08, (rel, frac, p[rel])


def test_partition_restricts_positives(kg):
    ds, idx, sampler = kg
    part = (jnp.int32(100), jnp.int32(50))
    batch = jax.jit(lambda k: sampler.sample(k, 256, 1, 0, False,
                                             partition=part))(
        jax.random.key(3))
    htr = np.stack([np.asarray(batch.h), np.asarray(batch.t),
                    np.asarray(batch.r)], 1)
    allowed = {tuple(t) for t in ds.train[100:150].tolist()}
    for row in htr.tolist():
        assert tuple(row) in allowed


def test_reference_layout(kg):
    ds, idx, sampler = kg
    batch = sampler.sample(jax.random.key(4), 64, 2, 1, True)
    flat = flatten_reference_layout(batch)
    B, n_neg = 64, 3
    assert flat["batch_h"].shape == (B * (1 + n_neg),)
    np.testing.assert_array_equal(np.asarray(flat["batch_y"][:B]), 1.0)
    np.testing.assert_array_equal(np.asarray(flat["batch_y"][B:]), -1.0)
    # slot j + B*(1+k) pairs with positive j
    nh = np.asarray(batch.neg_h)
    got = np.asarray(flat["batch_h"][B:2 * B])
    np.testing.assert_array_equal(got, nh[:, 0])


def test_packed1d_take_matches_plain():
    from openkeonspark_tpu.ops.gather import Packed1D
    rng = np.random.default_rng(3)
    for n in (1, 5, 127, 128, 129, 1000):
        arr = rng.integers(-50, 50, n).astype(np.int32)
        p = Packed1D.build(arr)
        idx = rng.integers(0, n, (7, 13)).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(jax.jit(p.take)(jnp.asarray(idx))), arr[idx])


def test_packed_records_roundtrip():
    from openkeonspark_tpu.ops.gather import PackedRecords
    rng = np.random.default_rng(4)
    n, k = 1000, 9
    fields = [rng.integers(0, 10**6, n).astype(np.int32) for _ in range(k)]
    rec = PackedRecords.build(fields)
    idx = rng.integers(0, n, 257).astype(np.int32)
    got = jax.jit(rec.take)(jnp.asarray(idx))
    assert len(got) == k
    for j in range(k):
        np.testing.assert_array_equal(np.asarray(got[j]), fields[j][idx])


def test_hybrid_upper_bound_large_groups():
    """Packed1D path with group sizes FAR above 128 — exercises the
    binary-narrowing rounds + the two-row count epilogue."""
    from openkeonspark_tpu.ops.gather import Packed1D
    from openkeonspark_tpu.sampling.device import (_ceil_log2,
                                                   batched_upper_bound)
    rng = np.random.default_rng(5)
    sizes = [0, 1, 127, 128, 129, 300, 1000, 4097]
    windows = [np.sort(rng.choice(10**6, size=s, replace=False)).astype(np.int32)
               for s in sizes]
    arr = np.concatenate([w for w in windows if len(w)] or
                         [np.empty(0, np.int32)])
    offs, cur = [], 0
    for w in windows:
        offs.append(cur)
        cur += len(w)
    off_q, cnt_q, queries, want = [], [], [], []
    for wi, w in enumerate(windows):
        for x in rng.integers(0, 10**6, size=31):
            off_q.append(offs[wi]); cnt_q.append(len(w)); queries.append(x)
            want.append(int(np.searchsorted(w, x, side="right")))
    iters = _ceil_log2(max(sizes) + 1)
    got = jax.jit(lambda a, o, c, x: batched_upper_bound(a, o, c, x, iters))(
        Packed1D.build(arr),
        jnp.asarray(off_q, jnp.int32), jnp.asarray(cnt_q, jnp.int32),
        jnp.asarray(queries, jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_np_upper_bound_matches_searchsorted():
    from openkeonspark_tpu.eval.classification import _np_upper_bound
    rng = np.random.default_rng(6)
    windows = [np.sort(rng.choice(1000, size=s, replace=False)).astype(np.int64)
               for s in (0, 1, 17, 400)]
    arr = np.concatenate([w for w in windows if len(w)])
    offs, cur = [], 0
    for w in windows:
        offs.append(cur); cur += len(w)
    off, cnt, x, want = [], [], [], []
    for wi, w in enumerate(windows):
        for q in rng.integers(-5, 1005, 40):
            off.append(offs[wi]); cnt.append(len(w)); x.append(q)
            want.append(int(np.searchsorted(w, q, side="right")))
    got = _np_upper_bound(arr, np.array(off), np.array(cnt, np.int64),
                          np.array(x))
    np.testing.assert_array_equal(got, want)
