"""Analytic multi-chip scaling report — the honest stand-in for the
unmeasurable ≥2-host number (VERDICT.md r1 next #2).

Real multi-chip hardware is absent in this environment, so this tool
compiles the ACTUAL sharded training step for each mesh shape on virtual
CPU devices (collective payloads are shape-derived, backend-independent),
counts per-device collective bytes from the compiled HLO
(``parallel.comm``), and combines them with the measured single-chip step
time into a predicted step time / scaling efficiency per mesh, under the
stated model:

    step(mesh) = max(compute, comm) + 0.1·min(compute, comm)
    compute    = measured single-chip step time (weak scaling: per-device
                 batch constant, global batch ∝ devices)
    comm       = wire_bytes(mesh) / BW, BW = ICI inside a host (45 GB/s
                 effective per collective), DCN across hosts (25 GB/s)

Usage:
    python tools/scaling_report.py [--step-ms 0.24] [--batch 2721]
                                   [--d 200] [--step exchange|psum]
Prints a markdown table (pasted into BASELINE.md) plus one JSON line.
"""

# Runnable from a clean shell without installing the package (VERDICT r2
# #5: PYTHONPATH overrides break this machine's TPU plugin, so the repo
# root is added here instead).
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

MESHES = [(1, 1), (2, 1), (2, 2), (4, 2), (2, 4)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=0.24,
                    help="measured single-chip step time (BASELINE.md)")
    ap.add_argument("--batch", type=int, default=2721)
    ap.add_argument("--d", type=int, default=200)
    ap.add_argument("--n-ent", type=int, default=14541)
    ap.add_argument("--step", default="exchange",
                    choices=["exchange", "psum"])
    args = ap.parse_args()

    from openkeonspark_tpu.config import Config
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.data.synth import random_kg
    from openkeonspark_tpu.models import get_model
    from openkeonspark_tpu.parallel import (build_exchange_train_step,
                                            build_sharded_train_step,
                                            make_mesh, shard_sampler,
                                            shard_state)
    from openkeonspark_tpu.parallel.comm import (collective_bytes,
                                                 predict_scaling)
    from openkeonspark_tpu.sampling.device import DeviceSampler
    from openkeonspark_tpu.train.step import init_state

    # small synthetic KG: collective shapes depend on batch/d/mesh, not on
    # the store size, so a compact store keeps compiles fast
    ds = random_kg(n_ent=args.n_ent, n_rel=237, n_triples=20000,
                   n_valid=100, n_test=100, seed=7)
    cfg = Config(model="transe", hidden_size=args.d, negative_ent=1,
                 sharded_step=args.step)
    model = get_model(cfg.model)
    sampler = DeviceSampler.build(ds, build_kg_index(ds, for_eval=False))

    payload_by_mesh = {}
    for shape in MESHES:
        n = shape[0] * shape[1]
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(shape)
        state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(0),
                           pad_to_multiple=n)
        sh = shard_state(state, mesh, flat=(args.step == "exchange" and
                                            n > 1))
        ss = shard_sampler(sampler, mesh)
        build = (build_exchange_train_step if args.step == "exchange"
                 else build_sharded_train_step)
        # weak scaling: global batch ∝ devices, per-device share constant
        step = jax.jit(build(model, cfg, ss, args.batch * n, mesh))
        payload_by_mesh[shape] = collective_bytes(step, sh, ss,
                                                  jax.random.key(0))

    from openkeonspark_tpu.parallel.comm import (BW_BRACKETS,
                                                 OVERLAP_BRACKETS)
    table = predict_scaling(args.step_ms / 1e3, payload_by_mesh)
    print(f"| mesh (data,model) | devices | link | payload MB/dev | "
          f"wire MB/dev | comm ms | pred step ms | scaling eff |")
    print("|---|---|---|---|---|---|---|---|")
    for shape, row in sorted(table.items(), key=lambda kv: kv[1]["devices"]):
        pl = payload_by_mesh[shape]["total"] / 1e6
        print(f"| {shape} | {row['devices']} | {row['link']} | {pl:.2f} | "
              f"{row['wire_bytes_per_device']/1e6:.2f} | "
              f"{row['comm_s']*1e3:.3f} | {row['predicted_step_s']*1e3:.3f} "
              f"| {row['scaling_efficiency']:.1%} |")

    # sensitivity brackets (VERDICT r2 weak #9): efficiency under
    # pessimistic/nominal/optimistic bandwidth × overlap assumptions
    print("\nSensitivity (scaling efficiency; bandwidth ×0.5/×1/×2, "
          "overlap 0%/90%/100%):")
    print("| mesh | " + " | ".join(
        f"bw×{b:g}, ov={o:.0%}" for b in BW_BRACKETS
        for o in OVERLAP_BRACKETS) + " |")
    print("|---|" + "---|" * (len(BW_BRACKETS) * len(OVERLAP_BRACKETS)))
    sens = {}
    for shape in sorted(payload_by_mesh, key=lambda s: s[0] * s[1]):
        cells = []
        for b in BW_BRACKETS:
            for o in OVERLAP_BRACKETS:
                eff = predict_scaling(args.step_ms / 1e3,
                                      {shape: payload_by_mesh[shape]},
                                      bw_scale=b, overlap=o
                                      )[shape]["scaling_efficiency"]
                cells.append(eff)
        sens[str(shape)] = cells
        print(f"| {shape} | " + " | ".join(f"{c:.0%}" for c in cells) + " |")

    json.dump({"step": args.step, "step_ms": args.step_ms,
               "wire_dtype": cfg.exchange_wire_dtype,
               "dedup": cfg.exchange_dedup,
               "meshes": {str(k): {**v, "payload_bytes":
                                   payload_by_mesh[k]["total"]}
                          for k, v in table.items()},
               "sensitivity": sens}, sys.stdout)
    print()


if __name__ == "__main__":
    main()
