"""Host-side cost of validate()'s per-row work at production batch sizes.

VERDICT r4 weak 4: the committed eval numbers are 14.2 ms/step device-only;
validate() does per-row Python between dispatches (program token decode,
dump-dict building, metric slicing — train/loop.py:393-443). At the device
step's ~36k QA/s the host must process 36k rows/s of that Python; this bench
measures the host side ALONE (no device in the loop) so the ceiling is
attributable.

    python tools/bench_validate_host.py [--graphs 512] [--batches 20]

Reports ms/batch and rows/s for: metrics-only, +qualitative(first batch),
+dump accumulation, and the dump-JSON write — against the 14.2 ms device
step (which overlaps: dispatch is async, so host work under 14.2 ms/batch
is free).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=512)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--program-len", type=int, default=16)
    args = ap.parse_args()

    from graphvqa_tpu.data.vocab import Vocab

    B, M, L = args.graphs, 5, args.program_len
    rng = np.random.default_rng(0)
    # GQA-like text vocab (~2k tokens)
    words = [f"w{i}" for i in range(2000)]
    vocab = Vocab(["<unk>", "<pad>", "<start>", "<end>"] + words)
    label2ans = [f"ans{i}" for i in range(1842)]

    def fake_batch():
        # plausible decoded rows: <start> + ~8 tokens + <end> + pad
        prog = np.full((B * M, L), 1, np.int32)
        n_tok = rng.integers(4, 12, size=B * M)
        prog[:, 0] = 2
        for r in range(B * M):
            prog[r, 1:1 + n_tok[r]] = rng.integers(4, len(vocab), n_tok[r])
            prog[r, 1 + n_tok[r]] = 3
        sa_pred = rng.integers(0, 1842, B).astype(np.int32)
        sa_score = rng.random(B).astype(np.float32)
        labels = rng.integers(0, 1842, B).astype(np.int32)
        match = rng.random(B * M) > 0.5
        gmatch = rng.random(B) > 0.5
        empty = rng.random(B * M) > 0.8
        meta = {"question_ids": [str(i) for i in range(B)],
                "questions": [f"is there a thing {i} ?" for i in range(B)],
                "answers": ["yes"] * B,
                "types": [{"structural": "query", "semantic": "attr",
                           "detailed": "synthetic"}] * B,
                "real_count": B}
        return meta, prog, sa_pred, sa_score, labels, match, gmatch, empty

    batches = [fake_batch() for _ in range(args.batches)]

    def timeit(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        per_batch = dt / args.batches
        print(f"{name:34s} {per_batch*1e3:8.2f} ms/batch "
              f"{B/per_batch:10.0f} rows/s", flush=True)
        return out

    # 1. metrics only (the always-on path)
    def metrics_only():
        acc = 0.0
        for meta, prog, sa_pred, sa_score, labels, match, gmatch, empty \
                in batches:
            real = meta["real_count"]
            acc += float((sa_pred[:real] == labels[:real]).sum())
            acc += float(match[: real * M].sum())
            acc += float(gmatch[:real].sum())
            acc += float(match.sum() - empty.sum())
        return acc
    timeit("metrics only", metrics_only)

    # 2. dump accumulation (per-row decode + dict build — the DUMP_RESULT
    #    path, train/loop.py:397-419)
    def dump_accum(decode):
        quesid2ans = {}
        for meta, prog, sa_pred, sa_score, labels, match, gmatch, empty \
                in batches:
            real = meta["real_count"]
            gt_rows = decode(prog)      # stand-in: gt uses batch.programs
            pred_rows = decode(prog)
            for b in range(real):
                gt_progs, pred_progs = [], []
                for s in range(M):
                    row = s + M * b
                    g, p = gt_rows[row], pred_rows[row]
                    if not g and not p:
                        continue
                    gt_progs.append(g)
                    pred_progs.append(p)
                qid = meta["question_ids"][b]
                quesid2ans[qid] = {
                    "questionId": qid,
                    "question": meta["questions"][b],
                    "ground_truth_program_list": gt_progs,
                    "predicted_program_list": pred_progs,
                    "answer": meta["answers"][b],
                    "prediction": label2ans[int(sa_pred[b])],
                    "prediction_score": "{:.2f}".format(float(sa_score[b])),
                    "types": meta["types"][b],
                }
        return quesid2ans

    def per_row_decode(prog):
        return [vocab.decode(prog[r]) for r in range(prog.shape[0])]

    q1 = timeit("dump accum (per-row decode)",
                lambda: dump_accum(per_row_decode))

    # 3. vectorized decode
    q2 = timeit("dump accum (batch decode)",
                lambda: dump_accum(vocab.decode_batch))
    assert q1 == q2, "vectorized decode changed the dump"

    # 4. JSON write of the full dump
    t0 = time.perf_counter()
    js = json.dumps(q1, indent=4, sort_keys=True)
    print(f"{'json.dumps of full dump':34s} {(time.perf_counter()-t0)*1e3:8.2f}"
          f" ms total ({len(js)/1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
