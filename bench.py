"""Benchmark: TransE d=200 training throughput (triples/s/chip) on an
FB15K-237-shaped KG, vs the CPU reference-stack stand-in.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "triples/s", "vs_baseline": N}

- Workload: config #2 of BASELINE.md — TransE d=200, bern sampling,
  1 corrupted-entity negative per positive, margin-ranking loss, batch =
  n_train/nbatches — on a synthetic KG with FB15K-237's shape (14541
  entities, 237 relations, 272k train triples; the real split is not on
  disk and the sandbox has no egress, so shape-matched synthetic data
  stands in; the compute/memory profile is identical).
- ``vs_baseline``: ratio over the reference CPU stand-in — a NumPy
  implementation of the same step (sampling + gather + margin-L1 grad +
  sparse scatter update), the "NumPy/TF re-derivation of its step"
  BASELINE.md prescribes since the Spark+TF-1.x stack itself is
  unmeasurable here. Measured once on this VM's CPUs and cached in
  bench_baseline_cpu.json.
"""

import json
import os
import time

import numpy as np

N_ENT, N_REL, N_TRAIN = 14541, 237, 272115
D = 200
NBATCHES = 100
SEED = 7


def _dataset():
    from openkeonspark_tpu.data.synth import random_kg
    return random_kg(n_ent=N_ENT, n_rel=N_REL, n_triples=N_TRAIN,
                     n_valid=1000, n_test=1000, seed=SEED)


def cpu_baseline_tps(ds, batch_size, cache="bench_baseline_cpu.json"):
    """Reference-stack stand-in: NumPy TransE step (bern corrupt sampling,
    dense gather, L1 margin grad, scatter-add SGD), single process."""
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["triples_per_sec"]

    rng = np.random.default_rng(0)
    ent = rng.uniform(-0.01, 0.01, (N_ENT, D)).astype(np.float32)
    rel = rng.uniform(-0.01, 0.01, (N_REL, D)).astype(np.float32)
    train = ds.train
    alpha, margin = 0.01, 1.0

    def step():
        idx = rng.integers(0, len(train), batch_size)
        h, t, r = train[idx, 0], train[idx, 1], train[idx, 2]
        corrupt = rng.integers(0, N_ENT, batch_size).astype(np.int32)
        flip = rng.random(batch_size) < 0.5
        nh = np.where(flip, corrupt, h)
        nt = np.where(flip, t, corrupt)
        res_p = ent[h] + rel[r] - ent[t]
        res_n = ent[nh] + rel[r] - ent[nt]
        s_p = np.abs(res_p).sum(1)
        s_n = np.abs(res_n).sum(1)
        active = (s_p - s_n + margin) > 0
        gp = np.sign(res_p) * active[:, None]
        gn = -np.sign(res_n) * active[:, None]
        np.add.at(ent, h, -alpha * gp)
        np.add.at(ent, t, alpha * gp)
        np.add.at(rel, r, -alpha * gp)
        np.add.at(ent, nh, -alpha * gn)
        np.add.at(ent, nt, alpha * gn)
        np.add.at(rel, r, -alpha * gn)

    step()  # warm caches
    # pinned protocol (VERDICT r2 weak #4: the multiplier drifted with
    # VM noise): median of 5 runs × 20 steps, fixed seed, stored once —
    # the cache file is committed so the baseline never re-measures
    n_steps, n_runs = 20, 5
    rates = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            step()
        rates.append(n_steps * batch_size / (time.perf_counter() - t0))
    tps = float(np.median(rates))
    with open(cache, "w") as f:
        json.dump({"triples_per_sec": tps, "batch_size": batch_size,
                   "steps": n_steps, "runs": n_runs,
                   "protocol": "median of 5 runs x 20 steps, seed 0",
                   "rates": [round(r, 1) for r in rates]}, f)
    return tps


def tpu_tps(ds, cfg, batch_size, steps_per_scan=200, repeats=5):
    import jax
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.models import get_model
    from openkeonspark_tpu.sampling.device import DeviceSampler
    from openkeonspark_tpu.train.step import (build_scan_steps,
                                              build_train_step, init_state)

    model = get_model(cfg.model)
    index = build_kg_index(ds, for_eval=False)
    sampler = DeviceSampler.build(ds, index)
    state = init_state(model, cfg, ds.n_ent, ds.n_rel,
                       jax.random.key(cfg.seed))
    step = build_train_step(model, cfg, sampler, batch_size)
    run = build_scan_steps(step, steps_per_scan)

    key = jax.random.key(1)
    state, loss = run(state, sampler, key)  # compile + warmup
    float(loss)
    # second warm call: the first post-compile call can pay donated-
    # buffer relayout (a lone ~2x-slow run in bench_all's cfg-1/6 spreads
    # until excluded) — warm until steady before the timed window
    state, loss = run(state, sampler, jax.random.fold_in(key, 999))
    float(loss)
    rates = []
    for i in range(repeats):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        state, loss = run(state, sampler, key)
        # pull a scalar that data-depends on the whole scan: the ONLY
        # honest sync point on remote-attached TPUs, where
        # block_until_ready on donated (input-aliased) outputs returns
        # before execution finishes and under-reports by orders of
        # magnitude (measured)
        float(loss)
        dt = time.perf_counter() - t0
        rates.append(steps_per_scan * batch_size / dt)
    # median-of-5 + relative spread — the SAME protocol as the CPU
    # baseline and the eval bench (r4 review: the old best-of-5 against a
    # median denominator inflated vs_baseline and hid session swing; the
    # r3->r4 -4.5% flagship drift sits inside the tunnel's measured
    # 5-15% session spread, BASELINE.md section 2)
    med = float(np.median(rates))
    spread = float((max(rates) - min(rates)) / med)
    return med, spread, [round(r, 1) for r in rates]


def main():
    from openkeonspark_tpu.config import Config

    ds = _dataset()
    batch_size = N_TRAIN // NBATCHES
    cfg = Config(model="transe", hidden_size=D, alpha=0.01, margin=1.0,
                 negative_ent=1, negative_rel=0, bern=True,
                 nbatches=NBATCHES)
    # ONE pinned scan depth (steps_per_scan=200); anchored against the
    # stored median of a reference session so day-to-day tunnel variance
    # is visible as vs_anchor, not silently folded into vs_baseline
    value, spread, rates = tpu_tps(ds, cfg, batch_size)
    baseline = cpu_baseline_tps(ds, batch_size)
    anchor_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_train_anchor.json")
    if os.path.exists(anchor_file):
        with open(anchor_file) as f:
            anchor = json.load(f)["median_triples_per_sec"]
    else:  # first run pins the anchor (committed alongside the bench)
        anchor = value
        with open(anchor_file, "w") as f:
            json.dump({"median_triples_per_sec": value, "spread": spread,
                       "rates": rates, "steps_per_scan": 200,
                       "protocol": "median of 5 scans x 200 steps, "
                                   "pinned seed, post-warmup"}, f)
    print(json.dumps({
        "metric": "transe_d200_fb15k237shape_train_throughput",
        "value": round(value, 1),
        "unit": "triples/s",
        "vs_baseline": round(value / baseline, 2),
        "spread": round(spread, 3),
        "vs_anchor": round(value / anchor, 3),
    }))


if __name__ == "__main__":
    main()
