"""Scatter-floor probe (VERDICT r3 next #2): measure narrow-row
scatter-add variants at the flagship shapes on the real chip.

XLA's TPU row scatter costs ~19 ns/row regardless of width (DESIGN.md) —
~50% of the flagship (config #2) step. Candidate replacement measured
here: **sorted-segment tile-MXU** — argsort the id stream once, then each
TILE-row slice of the table receives a CONTIGUOUS segment of the sorted
stream, aggregated as a one-hot matmul on the MXU (the r1 one-hot dead
end was whole-table; per-tile is exactly the ≤512-row regime where the
one-hot path already wins, train/optim.MATMUL_SCATTER_MAX_ROWS). Segments
longer than SMAX (hub tiles under Zipf skew) spill to a cond-gated exact
XLA scatter of the remainder, so the variant is exact at any skew.

Timing: K scatter applications chained through a lax.scan (the table is
the carry, ids vary per step) in ONE device program — per-call tunnel
round trips (~25 ms on this remote-attached chip) would otherwise swamp
sub-ms ops. One data-dependent scalar pull per measurement.

Usage: python tools/scatter_probe.py [--shape flagship|config1|transd|big]
                                     [--skew 0.8] [--scan 100]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


def xla_scatter(table, ids, delta):
    rows = table.shape[0]
    valid = (ids < rows)[:, None]
    idc = jnp.minimum(ids, rows - 1)
    return table.at[idc].add(jnp.where(valid, delta, 0.0))


def tile_mxu_scatter(table, ids, delta, tile, smax):
    """Sorted-segment one-hot MXU scatter-add, exact at any skew: per-tile
    segments beyond ``smax`` rows spill to a cond-gated XLA scatter."""
    rows, d = table.shape
    ntiles = -(-rows // tile)
    order = jnp.argsort(ids)
    sids = jnp.take(ids, order)
    sdelta = jnp.take(delta, order, axis=0)
    bounds = jnp.searchsorted(sids, jnp.arange(ntiles + 1) * tile
                              ).astype(jnp.int32)
    sids_p = jnp.concatenate(
        [sids, jnp.full((smax,), rows + tile, sids.dtype)])
    sdelta_p = jnp.concatenate([sdelta, jnp.zeros((smax, d), sdelta.dtype)])

    def per_tile(k):
        s0 = bounds[k]
        ln = bounds[k + 1] - s0
        seg_ids = jax.lax.dynamic_slice(sids_p, (s0,), (smax,))
        seg = jax.lax.dynamic_slice(sdelta_p, (s0, 0), (smax, d))
        pos = seg_ids - k * tile
        valid = jnp.arange(smax) < ln
        onehot = ((pos[None, :] == jnp.arange(tile, dtype=pos.dtype)[:, None])
                  & valid[None, :])
        return jax.lax.dot(onehot.astype(seg.dtype), seg,
                           precision=jax.lax.Precision.HIGHEST)

    upd = jax.vmap(per_tile)(jnp.arange(ntiles))        # [T, tile, d]
    upd = upd.reshape(ntiles * tile, d)[:rows]
    out = table + upd

    # exact spill for hub tiles: stream rows whose rank within their
    # segment is >= smax take the ordinary scatter (cond-gated — free
    # when nothing spills)
    seg_of = jnp.clip(sids // tile, 0, ntiles - 1).astype(jnp.int32)
    rank = jnp.arange(sids.shape[0], dtype=jnp.int32) - bounds[seg_of]
    left = (rank >= smax) & (sids < rows)

    def spill(t):
        rid = jnp.where(left, sids, rows)
        return xla_scatter(t, rid, sdelta)

    return jax.lax.cond(jnp.any(left), spill, lambda t: t, out)


def sort_gather(table, ids, delta):
    """Component cost: argsort the id stream + reorder the delta rows —
    the entry fee of EVERY sorted-run variant."""
    order = jnp.argsort(ids)
    sdelta = jnp.take(delta, order, axis=0)
    return table + sdelta[:1]   # consume, keep carry shape


def make_scan(variant, K):
    @jax.jit
    def run(table, ids_all, delta):
        def body(t, ids_k):
            return variant(t, ids_k, delta), None
        out, _ = jax.lax.scan(body, table, ids_all)
        return out
    return run


def timeit_scan(variant, table, ids_all, delta, K, repeats=5):
    run = make_scan(variant, K)
    out = run(table, ids_all, delta)
    float(out[0, 0])
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(table, ids_all, delta)
        float(out[0, 0])
        ts.append((time.perf_counter() - t0) / K)
    return statistics.median(ts), out


SHAPES = {
    # (rows, d, stream) — stream = merged update rows per step
    "flagship": (14541, 200, 3 * 2721),    # config #2 TransE ent updates
    "config1": (3000, 64, 3 * 400),
    "transd": (14541, 200, 6 * 2721),
    "big": (2_000_000, 256, 3 * 10000),    # config #5 scale
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="flagship", choices=sorted(SHAPES))
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--scan", type=int, default=100)
    ap.add_argument("--skew", type=float, default=0.8,
                    help="Zipf exponent of the id stream (0 = uniform)")
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--smax", type=int, default=512)
    args = ap.parse_args()
    rows, d, stream = SHAPES[args.shape]
    K = args.scan

    rng = np.random.default_rng(1)
    if args.skew > 0:
        w = 1.0 / np.arange(1, rows + 1, dtype=np.float64) ** args.skew
        w /= w.sum()
        ids_np = rng.choice(rows, size=(K, stream), p=w)
    else:
        ids_np = rng.integers(0, rows, size=(K, stream))
    # spread hub ids across the table like real vocab ids (not sorted
    # by popularity): random relabeling
    relabel = rng.permutation(rows)
    ids_all = jnp.asarray(relabel[ids_np].astype(np.int32))
    table = jax.random.normal(jax.random.key(0), (rows, d), jnp.float32)
    delta = jax.random.normal(jax.random.key(2), (stream, d), jnp.float32)

    # dispatch/RTT floor: a scan of the same depth whose body only nudges
    # the carry — subtracted from both variants (the tunnel's ~25 ms
    # round trip shows up as RTT/K per step otherwise)
    def noop(t, ids_k, dl):
        return t + jnp.float32(1e-12) * ids_k[0]

    t_0, _ = timeit_scan(noop, table, ids_all, delta, K, args.repeats)
    t_x, out_x = timeit_scan(xla_scatter, table, ids_all, delta, K,
                             args.repeats)
    mxu = functools.partial(tile_mxu_scatter, tile=args.tile,
                            smax=args.smax)
    t_m, out_m = timeit_scan(mxu, table, ids_all, delta, K, args.repeats)
    t_s, _ = timeit_scan(sort_gather, table, ids_all, delta, K,
                         args.repeats)
    t_x = max(t_x - t_0, 1e-9)
    t_m = max(t_m - t_0, 1e-9)
    t_s = max(t_s - t_0, 1e-9)
    err = float(jnp.max(jnp.abs(out_x - out_m)))
    scale = float(jnp.max(jnp.abs(out_x)))
    # spill fraction on the first step's stream (skew diagnostics)
    sids = jnp.sort(ids_all[0])
    b = jnp.searchsorted(sids, jnp.arange(-(-rows // args.tile) + 1)
                         * args.tile)
    spill = float(jnp.sum(jnp.maximum((b[1:] - b[:-1]) - args.smax, 0))
                  / stream)
    print(json.dumps({
        "shape": args.shape, "rows": rows, "d": d, "stream": stream,
        "skew": args.skew, "tile": args.tile, "smax": args.smax,
        "scan": K,
        "xla_scatter_us": round(t_x * 1e6, 2),
        "xla_ns_per_row": round(t_x / stream * 1e9, 2),
        "tile_mxu_us": round(t_m * 1e6, 2),
        "tile_mxu_ns_per_row": round(t_m / stream * 1e9, 2),
        "speedup": round(t_x / t_m, 3),
        "sort_gather_us": round(t_s * 1e6, 2),
        "noop_floor_us": round(t_0 * 1e6, 2),
        "spill_frac": round(spill, 4),
        "max_rel_err": err / max(scale, 1e-9),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
