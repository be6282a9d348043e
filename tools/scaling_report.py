"""Analytic multi-chip scaling report — the honest stand-in for the
unmeasurable ≥2-host number (VERDICT r1 next #2; hierarchical model r4).

Real multi-chip hardware is absent in this environment, so this tool
compiles the ACTUAL sharded training step for each mesh shape on virtual
CPU devices (collective payloads are shape-derived, backend-independent),
counts per-device collective bytes from the compiled HLO with each op's
replica groups classified ICI-vs-DCN against host blocks of
``--chips-per-host`` devices (``parallel.comm``), and combines them with
the measured single-chip step time into a predicted step time / scaling
efficiency per mesh, under the stated two-link model:

    step(mesh) = max(compute, comm) + (1−overlap)·min(compute, comm)
    comm       = max(t_ici, t_dcn)   [pipelined; --link-model serial sums]
    t_ici      = wire_ici_bytes/dev / ICI_BW          (45 GB/s effective)
    t_dcn      = wire_dcn_bytes/dev · L / DCN_BW      (25 GB/s per-host
                 NIC shared by the host's L chips)
    compute    = measured single-chip step time (weak scaling: per-device
                 batch constant, global batch ∝ devices)

Mesh shapes: 2-tuples (data, model) run the flat-grid exchange
(``parallel/exchange.py``); 3-tuples (host, data, model) run the
hierarchical two-stage relay exchange (``parallel/hier.py``) that
aggregates within a host over ICI and crosses DCN once per host.

Usage:
    python tools/scaling_report.py [--step-ms 0.24] [--batch 2721]
        [--d 200] [--step exchange|psum] [--chips-per-host 4]
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

import sys as _s

import jax

jax.config.update("jax_platforms", "cpu")
_n_dev = 8
if "--devices" in _s.argv:
    _n_dev = int(_s.argv[_s.argv.index("--devices") + 1])
jax.config.update("jax_num_cpu_devices", _n_dev)

# 2-tuples = flat exchange; 3-tuples = hierarchical (host, data, model).
# (2,2,2) and (2,1,4) are the two 8-device 2-host factorizations of
# chips_per_host=4 hosts; the 16-device shapes (4 hosts) need --devices 16.
MESHES = [(1, 1), (2, 1), (2, 2), (4, 2), (2, 4), (2, 2, 2), (2, 1, 4),
          (4, 2, 2), (8, 2), (2, 2, 4)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=0.24,
                    help="measured single-chip step time (BASELINE.md)")
    ap.add_argument("--batch", type=int, default=2721)
    ap.add_argument("--d", type=int, default=200)
    ap.add_argument("--n-ent", type=int, default=14541)
    ap.add_argument("--step", default="exchange",
                    choices=["exchange", "psum"])
    ap.add_argument("--chips-per-host", type=int, default=4,
                    help="ICI-domain size used for link classification")
    ap.add_argument("--link-model", default="pipelined",
                    choices=["pipelined", "serial"])
    ap.add_argument("--ici-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="hier stage-1 (ICI) update wire dtype")
    ap.add_argument("--wire-dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "float8_e4m3fn"],
                    help="exchange wire dtype (a2a payloads)")
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU devices (16 unlocks the 4-host "
                         "meshes); parsed before jax init")
    ap.add_argument("--hot-rows", type=int, default=0,
                    help="replicate the top-K highest-degree entity rows "
                         "(parallel/hot.py); requires --capacity stats")
    ap.add_argument("--n-triples", type=int, default=20000,
                    help="synthetic store size — matters in stats mode "
                         "(capacities derive from the degree tables)")
    ap.add_argument("--meshes", default="",
                    help="comma list of mesh shapes to run, e.g. "
                         "'2x2,2x2x2' (empty = the standard list)")
    ap.add_argument("--capacity", default="uniform",
                    choices=["uniform", "stats"],
                    help="owner-bucket capacity model (stats = sized from "
                         "the dataset's measured degree tables)")
    args = ap.parse_args()

    from openkeonspark_tpu.config import Config
    from openkeonspark_tpu.data.index import build_kg_index
    from openkeonspark_tpu.data.synth import random_kg
    from openkeonspark_tpu.models import get_model
    from openkeonspark_tpu.parallel import (build_train_step_for, make_mesh,
                                            shard_sampler, shard_state)
    from openkeonspark_tpu.parallel.exchange import plan_sharded_step
    from openkeonspark_tpu.parallel.comm import (collective_bytes,
                                                 predict_scaling)
    from openkeonspark_tpu.sampling.device import DeviceSampler
    from openkeonspark_tpu.train.step import init_state

    # compact synthetic store by default (collective shapes depend on
    # batch/d/mesh); stats-mode capacities ALSO depend on the degree
    # tables, so config-#5 runs pass a representative --n-triples
    ds = random_kg(n_ent=args.n_ent, n_rel=237, n_triples=args.n_triples,
                   n_valid=100, n_test=100, seed=7)
    cfg = Config(model="transe", hidden_size=args.d, negative_ent=1,
                 sharded_step=args.step,
                 exchange_wire_dtype=args.wire_dtype,
                 exchange_ici_wire_dtype=args.ici_dtype,
                 exchange_hot_rows=args.hot_rows,
                 exchange_capacity=args.capacity)
    model = get_model(cfg.model)
    sampler = DeviceSampler.build(ds, build_kg_index(ds, for_eval=False))

    meshes = MESHES
    if args.meshes:
        meshes = [tuple(int(x) for x in m.split("x"))
                  for m in args.meshes.split(",")]
    payload_by_mesh = {}
    for shape in meshes:
        n = 1
        for s in shape:
            n *= s
        if n > len(jax.devices()):
            continue
        if len(shape) == 3 and args.step != "exchange":
            continue   # hierarchical meshes exist only for the exchange
        mesh = make_mesh(shape)
        state = init_state(model, cfg, ds.n_ent, ds.n_rel, jax.random.key(0),
                           pad_to_multiple=n)
        kind = plan_sharded_step(cfg, args.batch * n, mesh)
        sh = shard_state(state, mesh, flat=(kind != "psum"))
        ss = shard_sampler(sampler, mesh)
        # weak scaling: global batch ∝ devices, per-device share constant
        step = jax.jit(build_train_step_for(model, cfg, ss, args.batch * n,
                                            mesh))
        payload_by_mesh[shape] = collective_bytes(
            step, sh, ss, jax.random.key(0),
            chips_per_host=args.chips_per_host)

    from openkeonspark_tpu.parallel.comm import (BW_BRACKETS,
                                                 OVERLAP_BRACKETS)
    table = predict_scaling(args.step_ms / 1e3, payload_by_mesh,
                            chips_per_host=args.chips_per_host,
                            link_model=args.link_model)
    print("| mesh | devices | payload MB/dev | wire MB/dev "
          "| ICI MB/dev | DCN MB/dev | comm ms | pred step ms "
          "| scaling eff |")
    print("|---|---|---|---|---|---|---|---|---|")
    for shape, row in sorted(table.items(),
                             key=lambda kv: (kv[1]["devices"], len(kv[0]))):
        pl = payload_by_mesh[shape]
        name = str(shape) + (" hier" if len(shape) == 3 else "")
        print(f"| {name} | {row['devices']} | {pl['total']/1e6:.2f} | "
              f"{row['wire_bytes_per_device']/1e6:.2f} | "
              f"{pl.get('wire_ici', 0)/1e6:.2f} | "
              f"{pl.get('wire_dcn', 0)/1e6:.2f} | "
              f"{row['comm_s']*1e3:.3f} | {row['predicted_step_s']*1e3:.3f} "
              f"| {row['scaling_efficiency']:.1%} |")

    # sensitivity brackets (VERDICT r2 weak #9): efficiency under
    # pessimistic/nominal/optimistic bandwidth × overlap assumptions,
    # plus the serialized-links bracket
    print("\nSensitivity (scaling efficiency; bandwidth ×0.5/×1/×2, "
          "overlap 0%/90%/100%; final column = serialized ICI+DCN at "
          "nominal bw, overlap 90%):")
    print("| mesh | " + " | ".join(
        f"bw×{b:g}, ov={o:.0%}" for b in BW_BRACKETS
        for o in OVERLAP_BRACKETS) + " | serial links |")
    print("|---|" + "---|" * (len(BW_BRACKETS) * len(OVERLAP_BRACKETS) + 1))
    sens = {}
    for shape in sorted(payload_by_mesh,
                        key=lambda s: (len(s), [x for x in s])):
        cells = []
        for b in BW_BRACKETS:
            for o in OVERLAP_BRACKETS:
                eff = predict_scaling(args.step_ms / 1e3,
                                      {shape: payload_by_mesh[shape]},
                                      chips_per_host=args.chips_per_host,
                                      bw_scale=b, overlap=o,
                                      link_model=args.link_model
                                      )[shape]["scaling_efficiency"]
                cells.append(eff)
        serial = predict_scaling(args.step_ms / 1e3,
                                 {shape: payload_by_mesh[shape]},
                                 chips_per_host=args.chips_per_host,
                                 link_model="serial"
                                 )[shape]["scaling_efficiency"]
        sens[str(shape)] = cells + [serial]
        print(f"| {shape} | " + " | ".join(f"{c:.0%}" for c in cells)
              + f" | {serial:.0%} |")

    json.dump({"step": args.step, "step_ms": args.step_ms,
               "chips_per_host": args.chips_per_host,
               "link_model": args.link_model,
               "wire_dtype": cfg.exchange_wire_dtype,
               "dedup": cfg.exchange_dedup,
               "hot_rows": cfg.exchange_hot_rows,
               "capacity": cfg.exchange_capacity,
               "meshes": {str(k): {**v, "payload_bytes":
                                   payload_by_mesh[k]["total"],
                                   "wire_ici": payload_by_mesh[k].get(
                                       "wire_ici"),
                                   "wire_dcn": payload_by_mesh[k].get(
                                       "wire_dcn")}
                          for k, v in table.items()},
               "sensitivity": sens}, sys.stdout)
    print()


if __name__ == "__main__":
    main()
