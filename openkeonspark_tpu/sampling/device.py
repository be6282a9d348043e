"""On-device negative sampling — the TPU-native replacement for the
reference's C++ sampler (``base/Base.cpp::sampling`` + ``base/Corrupt.h`` +
``base/Random.h``, reconstructed per SURVEY.md §2.2).

The reference fills host buffers with pthreads and feeds them through
``feed_dict`` every step. Here sampling is part of the jitted training step
itself: uniform positive draws, Bernoulli corrupt-head/tail choice, and
**exact filtered** corruption (negatives never collide with a known train
triple) all run on the TPU as pure vector ops, so the table gathers that
follow never wait on the host.

Filtered corruption keeps ``Corrupt.h``'s complement "offset trick"
(``Corrupt.h:~40–90``): to sample uniformly from entities **not** in the
sorted group list ``g[0..cnt)``, draw ``x ~ U[0, n − cnt)`` and return
``x + |{i : g[i] − i ≤ x}|``. The count is an ``upper_bound`` over the
precomputed strictly-increasing ``adj[i] = g[i] − i`` window — evaluated
here as a *batched bitwise binary search*: a ``fori_loop`` of
``ceil(log2(max_cnt))`` rounds of pure vector compares/gathers, no
data-dependent control flow, identical cost for every lane (XLA-friendly,
no warp-divergence analog).

Randomness: ``jax.random`` threefry bits with modulo range reduction —
the same reduction the reference's per-thread LCG uses
(``Random.h::rand_max`` = ``rand() % x``), so the (negligible) modulo bias
is parity rather than a regression.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openkeonspark_tpu.data.dataset import Dataset
from openkeonspark_tpu.data.index import KGIndex


def _ceil_log2(n: int) -> int:
    n = max(int(n), 1)
    return max(1, (n - 1).bit_length())


def batched_upper_bound(arr: jax.Array, off: jax.Array, cnt: jax.Array,
                        x: jax.Array, iters: int) -> jax.Array:
    """For each lane: ``|{i in [0,cnt): arr[off+i] <= x}|``.

    ``arr`` holds per-group sorted windows back to back; ``iters`` must be a
    static bound ≥ ceil(log2(max cnt + 1)). Pure vector binary search.

    (Measured note: a k-ary variant — one [lanes, k−1] probe gather per
    round, log_k rounds — was tried to shorten the dependent-gather chain,
    but the wide 3-D gather hits a slower path on v5e than k−1 extra cheap
    rounds of flat [lanes] gathers: 1.39 vs 0.97 ms/step at FB15K-237
    shapes. Keep the flat binary search.)"""
    shape = jnp.broadcast_shapes(jnp.shape(cnt), jnp.shape(x),
                                 jnp.shape(off))
    lo = jnp.zeros(shape, dtype=cnt.dtype)
    hi = jnp.broadcast_to(cnt, shape)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        probe = jnp.take(arr, off + jnp.minimum(mid, jnp.maximum(cnt - 1, 0)),
                         axis=0)
        go_right = (mid < hi) & (probe <= x)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def _randint(key: jax.Array, shape, bound: jax.Array) -> jax.Array:
    """Per-lane uniform int in [0, bound) via 32 random bits mod bound —
    the reference's ``rand_max`` reduction (``Random.h:~20–40``)."""
    bits = jax.random.bits(key, shape, dtype=jnp.uint32)
    return (bits % jnp.maximum(bound, 1).astype(jnp.uint32)).astype(jnp.int32)


def _complement_sample(key: jax.Array, shape, arr: jax.Array, off: jax.Array,
                       cnt: jax.Array, n_vals: int, iters: int,
                       avoid: jax.Array) -> jax.Array:
    """Uniform draw from ``[0, n_vals) \\ group`` via the offset trick.

    Degenerate case the reference never hits at KG scale but we must
    (``Corrupt.h`` would spin forever): when the group already contains
    *every* value the complement is empty — fall back to uniform over the
    domain minus the positive's own value ``avoid`` (a collision with some
    *other* train triple is then unavoidable, but the negative never equals
    its positive)."""
    full = cnt >= jnp.int32(n_vals)
    space = jnp.where(full, jnp.int32(max(n_vals - 1, 1)),
                      jnp.maximum(jnp.int32(n_vals) - cnt, 1))
    x = _randint(key, shape, space)
    k = batched_upper_bound(arr, off, cnt, x, iters)
    fallback = x + (x >= avoid).astype(x.dtype)
    return jnp.where(jnp.broadcast_to(full, x.shape), fallback, x + k)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSampler:
    """Device-resident triple store + corruption indexes.

    The arrays live in HBM for the whole run (10M triples ≈ a few hundred
    MB); every ``sample`` call is traceable and fuses into the train step."""

    train_h: jax.Array     # [T] int32
    train_t: jax.Array
    train_r: jax.Array
    hr_off: jax.Array      # [T] per-triple window into ent_adj (tails of (h,r))
    hr_cnt: jax.Array
    tr_off: jax.Array      # [T] per-triple window into ent_adj (heads of (t,r))
    tr_cnt: jax.Array
    ent_adj: jax.Array     # concat(hr.adj, tr.adj) — tr_off pre-shifted
    ht_off: jax.Array      # [T] window into rel_adj (rels of (h,t))
    ht_cnt: jax.Array
    rel_adj: jax.Array
    p_corrupt_head: jax.Array  # [R] float32 (bern); 0.5 used when bern=False
    # static metadata
    n_ent: int
    n_rel: int
    n_train: int
    ent_iters: int
    rel_iters: int

    def tree_flatten(self):
        children = (self.train_h, self.train_t, self.train_r,
                    self.hr_off, self.hr_cnt, self.tr_off, self.tr_cnt,
                    self.ent_adj, self.ht_off, self.ht_cnt, self.rel_adj,
                    self.p_corrupt_head)
        aux = (self.n_ent, self.n_rel, self.n_train, self.ent_iters,
               self.rel_iters)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, ds: Dataset, index: KGIndex) -> "DeviceSampler":
        rows = index.train_row_tables(ds.train, with_rel=True)
        hr_adj = index.hr.adj
        tr_adj = index.tr.adj
        ent_adj = np.concatenate([hr_adj, tr_adj]) if len(tr_adj) else hr_adj
        tr_off = rows["tr_off"].astype(np.int64) + len(hr_adj)
        max_ent_cnt = max(index.hr.max_cnt, index.tr.max_cnt, 1)
        max_rel_cnt = max(index.ht.max_cnt, 1)
        dev = jnp.asarray
        return cls(
            train_h=dev(rows["train_h"]), train_t=dev(rows["train_t"]),
            train_r=dev(rows["train_r"]),
            hr_off=dev(rows["hr_off"]), hr_cnt=dev(rows["hr_cnt"]),
            tr_off=dev(tr_off.astype(np.int32)), tr_cnt=dev(rows["tr_cnt"]),
            ent_adj=dev(ent_adj.astype(np.int32)),
            ht_off=dev(rows["ht_off"]), ht_cnt=dev(rows["ht_cnt"]),
            rel_adj=dev(index.ht.adj.astype(np.int32)),
            p_corrupt_head=dev(index.p_corrupt_head),
            n_ent=ds.n_ent, n_rel=ds.n_rel, n_train=len(ds.train),
            ent_iters=_ceil_log2(max_ent_cnt + 1),
            rel_iters=_ceil_log2(max_rel_cnt + 1),
        )

    # ------------------------------------------------------------------
    def sample(self, key: jax.Array, batch_size: int, negative_ent: int,
               negative_rel: int, bern: bool,
               partition: Optional[Tuple[jax.Array, jax.Array]] = None
               ) -> "SampledBatch":
        """Draw a batch: ``batch_size`` uniform positives + per-positive
        corrupted negatives (``Base.cpp::getBatch`` semantics).

        ``partition=(start, size)`` restricts positive draws to a contiguous
        triple slice — edge partitioning for data-parallel shards."""
        k_pos, k_flip, k_ent, k_rel = jax.random.split(key, 4)

        if partition is None:
            idx = _randint(k_pos, (batch_size,), jnp.int32(self.n_train))
        else:
            start, size = partition
            idx = start + _randint(k_pos, (batch_size,), size)

        h = jnp.take(self.train_h, idx)
        t = jnp.take(self.train_t, idx)
        r = jnp.take(self.train_r, idx)

        neg_h = neg_t = neg_r_h = None
        if negative_ent > 0:
            shape = (batch_size, negative_ent)
            if bern:
                p_head = jnp.take(self.p_corrupt_head, r)[:, None]
            else:
                p_head = jnp.float32(0.5)
            corrupt_head = jax.random.uniform(k_flip, shape) < p_head

            # one fused complement search over the concatenated adj array:
            # head-corruption uses the (t,r)→heads window, tail-corruption
            # the (h,r)→tails window
            off = jnp.where(corrupt_head, jnp.take(self.tr_off, idx)[:, None],
                            jnp.take(self.hr_off, idx)[:, None])
            cnt = jnp.where(corrupt_head, jnp.take(self.tr_cnt, idx)[:, None],
                            jnp.take(self.hr_cnt, idx)[:, None])
            avoid = jnp.where(corrupt_head, h[:, None], t[:, None])
            corrupted = _complement_sample(k_ent, shape, self.ent_adj, off,
                                           cnt, self.n_ent, self.ent_iters,
                                           avoid)
            neg_h = jnp.where(corrupt_head, corrupted, h[:, None])
            neg_t = jnp.where(corrupt_head, t[:, None], corrupted)

        neg_rel = None
        if negative_rel > 0:
            shape = (batch_size, negative_rel)
            off = jnp.take(self.ht_off, idx)[:, None]
            cnt = jnp.take(self.ht_cnt, idx)[:, None]
            neg_rel = _complement_sample(k_rel, shape, self.rel_adj, off,
                                         cnt, self.n_rel, self.rel_iters,
                                         r[:, None])

        return SampledBatch(h=h, t=t, r=r, neg_h=neg_h, neg_t=neg_t,
                            neg_rel=neg_rel)


@jax.tree_util.register_pytree_node_class
@dataclass
class SampledBatch:
    """Positives [B] and structured negatives ([B, negE] entity-corrupted
    triples sharing r; [B, negR] corrupted relations sharing (h, t))."""

    h: jax.Array
    t: jax.Array
    r: jax.Array
    neg_h: Optional[jax.Array] = None
    neg_t: Optional[jax.Array] = None
    neg_rel: Optional[jax.Array] = None

    def tree_flatten(self):
        return (self.h, self.t, self.r, self.neg_h, self.neg_t,
                self.neg_rel), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def flatten_reference_layout(b: SampledBatch) -> Dict[str, jax.Array]:
    """Reference buffer-layout parity (``Model.py`` slot convention,
    SURVEY.md §2.1): slot j<B = positive j; negatives at j + B*(1+k);
    y = +1 for positives, −1 for negatives. Used by the host-sampler
    interop tests and anywhere layout parity with ``Base.so`` matters."""
    B = b.h.shape[0]
    hs, ts, rs = [b.h], [b.t], [b.r]
    if b.neg_h is not None:
        for k in range(b.neg_h.shape[1]):
            hs.append(b.neg_h[:, k])
            ts.append(b.neg_t[:, k])
            rs.append(b.r)
    if b.neg_rel is not None:
        for k in range(b.neg_rel.shape[1]):
            hs.append(b.h)
            ts.append(b.t)
            rs.append(b.neg_rel[:, k])
    batch_h = jnp.concatenate(hs)
    batch_t = jnp.concatenate(ts)
    batch_r = jnp.concatenate(rs)
    n_neg = batch_h.shape[0] // B - 1
    batch_y = jnp.concatenate([jnp.ones((B,), jnp.float32),
                               -jnp.ones((B * n_neg,), jnp.float32)])
    return {"batch_h": batch_h, "batch_t": batch_t, "batch_r": batch_r,
            "batch_y": batch_y}
