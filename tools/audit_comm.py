"""Cross-check the scaling model's comm terms against the COMPILED program.

The analytic efficiency model (tools/bench_scaling.py) charges, per GAT
engine round under destination-ownership edge partitioning:

    fwd : one assembly psum of [B, npg, C]        (engine dtype)
    bwd : one node-cotangent psum of [B, npg, C_in=C] (the assembly psum's
          transpose is communication-free; the cotangent psum comes from the
          replicated node projections consuming shard-varying inputs)
    bwd : per-round W-cotangent psums (f32)

CPU-mesh *timings* of collectives say nothing about ICI, but the compiled
HLO's collective *inventory* — how many collectives, of which shapes, hence
how many bytes per step — is backend-independent and is exactly what the
model's comm term assumes.  This tool compiles the real
``make_dp_edge_train_step`` on a virtual mesh, parses the optimized HLO,
buckets every collective by byte volume, and prints the measured-vs-modeled
table.  Run:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/audit_comm.py [--k 2] [--rounds 5]

The assertion encoded here (engine collectives = rounds x [B,npg,C]-sized
psums in each direction, nothing k-independent) is what distinguishes the
r3 scheme from the r2 scheme it replaced (whose P-matrix psum was
O(npg^2 H) and shard-count-independent).
"""
from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

_COLL = re.compile(
    r"(\w+) = ((?:\w+\[[\d,]*\][^ ]* ?)+) (all-reduce|all-gather|"
    r"reduce-scatter|collective-permute|all-to-all)\(")
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")


def _bytes_of(shapes_txt: str) -> int:
    total = 0
    for m in _SHAPE.finditer(shapes_txt):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def collect_collectives(hlo_text: str):
    """[(name, op, bytes)] for every collective in the optimized HLO."""
    out = []
    for m in _COLL.finditer(hlo_text):
        out.append((m.group(1), m.group(3), _bytes_of(m.group(2))))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=1, help="data-axis size")
    ap.add_argument("--k", type=int, default=2, help="edge-axis size")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--graphs", type=int, default=4)
    ap.add_argument("--npg", type=int, default=64)
    ap.add_argument("--epg", type=int, default=128)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from graphvqa_tpu.config import (BatchConfig, CONFIG_FACTORY, Config,
                                     TrainConfig)
    import dataclasses
    from graphvqa_tpu.models import PipelineModel
    from graphvqa_tpu.parallel import (make_dp_edge_train_step, make_mesh,
                                       prepare_dp_edge_batch)
    from graphvqa_tpu.train.train_state import create_train_state
    from tests.helpers import random_qa_batch

    cfg0 = CONFIG_FACTORY["gat"]()
    m = dataclasses.replace(
        cfg0.model,
        text=dataclasses.replace(cfg0.model.text, vocab_size=256),
        scene=dataclasses.replace(cfg0.model.scene, vocab_size=256),
        engine=dataclasses.replace(cfg0.model.engine,
                                   num_rounds=args.rounds),
    )
    cfg = Config(model=m,
                 batch=BatchConfig(num_graphs=args.graphs, layout="dense",
                                   nodes_per_graph=args.npg,
                                   edges_per_graph=args.epg),
                 train=TrainConfig())
    B, npg = args.graphs, args.npg
    C = m.scene.emb_dim   # engine node channels (300 in production)
    dtype_bytes = 2 if m.dtype == "bfloat16" else 4

    batch = random_qa_batch(seed=0, num_graphs=B, dense=True,
                            nodes_per_graph=npg, edges_per_graph=args.epg,
                            cfg=m, q_len=16, p_len=8, fa_len=8)
    model = PipelineModel(m)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    variables = model.init(rngs, batch.replace(
        programs=batch.programs[:, :-1],
        full_answers=batch.full_answers[:, :-1]))
    state = create_train_state(variables)
    mesh = make_mesh(data=args.d, edge=args.k,
                     devices=jax.devices()[: args.d * args.k])
    step = make_dp_edge_train_step(model, cfg, mesh)
    stacked = prepare_dp_edge_batch([batch] * args.d, mesh)

    print(f"compiling d={args.d} x k={args.k}, B={B}, npg={npg}, "
          f"epg={args.epg}, rounds={args.rounds}, C={C}, "
          f"dtype={m.dtype} ...", flush=True)
    lowered = jax.jit(step).lower(state, stacked, jax.random.key(0))

    # pre-optimization StableHLO: the payloads the PROGRAM requests,
    # platform-independent (XLA:CPU later promotes bf16 all-reduce to f32;
    # TPU reduces bf16 natively)
    shlo_lines = lowered.as_text().splitlines()
    req = []
    for i, line in enumerate(shlo_lines):
        if "all_reduce" not in line and "all_gather" not in line \
                and "reduce_scatter" not in line:
            continue
        for j in range(i, min(i + 8, len(shlo_lines))):
            msh = re.search(r"\(tensor<([^>]+)>\) -> tensor<", shlo_lines[j])
            if msh:
                spec = msh.group(1).split("x")
                dt_name = spec[-1]
                n = 1
                for d in spec[:-1]:
                    n *= int(d)
                req.append((dt_name, n * _DTYPE_BYTES.get(
                    {"bf16": "bf16", "f32": "f32", "f16": "f16",
                     "i32": "s32", "i64": "s64"}.get(dt_name, "f32"), 4)))
                break

    compiled = lowered.compile()
    hlo = compiled.as_text()
    colls = collect_collectives(hlo)

    assembly = B * npg * C * dtype_bytes          # fwd psum [B, npg, C]
    cotangent = B * npg * C * dtype_bytes         # bwd input-cotangent psum
    print(f"\nmodel terms/round: assembly psum = {assembly/1e6:.3f} MB, "
          f"bwd cotangent psum = {cotangent/1e6:.3f} MB")
    print(f"model total engine comm/step: "
          f"{args.rounds * (assembly + cotangent)/1e6:.3f} MB payload\n")

    from collections import Counter
    sizes = Counter()
    for name, op, nbytes in colls:
        sizes[(op, nbytes)] += 1
    print(f"{'op':20s} {'payload':>12s} {'count':>6s}")
    total = 0
    for (op, nbytes), cnt in sorted(sizes.items(),
                                    key=lambda kv: -kv[0][1] * kv[1]):
        print(f"{op:20s} {nbytes/1e6:10.3f}MB {cnt:6d}")
        total += nbytes * cnt
    print(f"\ntotal collective payload/step: {total/1e6:.3f} MB "
          f"({len(colls)} collectives)")

    # requested (pre-optimization) payload table: platform-independent
    req_sizes = Counter(req)
    n_req_assembly = sum(c for (dtn, b), c in req_sizes.items()
                         if b == assembly and dtn == (
                             "bf16" if dtype_bytes == 2 else "f32"))
    print("\nrequested collectives (pre-optimization, program-level):")
    for (dtn, b), cnt in sorted(req_sizes.items(),
                                key=lambda kv: -kv[0][1] * kv[1])[:8]:
        print(f"  {dtn:6s} {b/1e6:10.3f}MB x {cnt}")

    # the checks:
    #  1. the program requests >= `rounds` engine-dtype collectives of
    #     exactly the assembly payload (fwd assembly psum per round; the
    #     bwd cotangent psums show at the same size);
    #  2. the optimized program contains collectives at that payload (or 2x
    #     under XLA:CPU's bf16->f32 all-reduce promotion);
    #  3. nothing k-independent (npg^2-sized, the r2-scheme smell) appears.
    n_assembly = sum(c for (op, b), c in sizes.items()
                     if b in (assembly, 2 * assembly))
    big = [(op, b, c) for (op, b), c in sizes.items()
           if b > 4 * assembly]
    print(f"\n[{'OK' if n_req_assembly >= args.rounds else 'MISMATCH'}] "
          f"requested engine-dtype assembly-payload collectives: "
          f"{n_req_assembly} (model expects >= {args.rounds}, one per "
          f"round fwd)")
    print(f"[{'OK' if n_assembly >= 2 * args.rounds else 'MISMATCH'}] "
          f"compiled engine-round collectives: {n_assembly} (model expects "
          f">= {2 * args.rounds}: fwd assembly + bwd cotangent per round; "
          f"payload may read 2x on CPU, which promotes bf16 all-reduce "
          f"to f32)")
    print(f"[{'OK' if not big else 'MISMATCH'}] collectives larger than 4x "
          f"the assembly payload (r2-scheme smell): {big or 'none'}")


if __name__ == "__main__":
    main()
