"""Train the (PyG-free) torch reference architecture on the synthetic split.

VERDICT r4 item 1(a): the flat val curve needs an architecture-level A/B —
if the REFERENCE model also fails to generalize on the identical synthetic
data, the task/scale is the cause, not this framework's training dynamics.
torch_geometric cannot be installed here, so the A/B uses
tests/torch_reference.TorchGraphVQA: the reference pipeline with exact
reference parameter names, stock torch transformer stacks, and index_add
graph ops (per-layer parity-tested against the framework).

Runs on CPU at --tiny-equivalent dims (the framework mirror is
``train_cli --tiny`` on the same data), so the comparison is
matched-scale framework-vs-framework:

    python tools/ab_torch_reference.py --data-root /tmp/synexist_s \
        --tied /tmp/run/tied.npy --epochs 20 [--program-loss]

Prints one line per epoch: train loss/acc and val acc.
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
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--vocab-dir", default="",
                    help="directory with text_vocab.json (default: build "
                         "from the train split)")
    ap.add_argument("--tied", default="",
                    help="tied.npy from tools/make_tied_embeddings.py "
                         "(expects <stem>_sg.npy beside it); injected into "
                         "both embeddings like --glove/--glove-sg")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--clip-grad", type=float, default=1.0)
    ap.add_argument("--program-loss", action="store_true",
                    help="add program CE (the gcn/gine driver recipe) to "
                         "the reference-GAT short-answer CE")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--emb", type=int, default=48)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--max-train", type=int, default=0)
    ap.add_argument("--max-val", type=int, default=0)
    args = ap.parse_args()

    import torch

    from graphvqa_tpu.config import BatchConfig
    from graphvqa_tpu.data import (
        GQADataset, build_scene_graph_vocab, build_text_vocab, tokenize)
    from graphvqa_tpu.data.dataset import collate_qa
    from graphvqa_tpu.data.vocab import Vocab
    from tests.torch_reference import TorchGraphVQA, torch_inputs_from_items

    root = pathlib.Path(args.data_root)
    sg_vocab = build_scene_graph_vocab()
    if args.vocab_dir and (pathlib.Path(args.vocab_dir)
                           / "text_vocab.json").exists():
        text_vocab = Vocab.load(
            pathlib.Path(args.vocab_dir) / "text_vocab.json")
    else:
        data = json.loads(
            (root / "questions" / "train_balanced_programs.json").read_text())
        text_vocab = build_text_vocab(data, tokenize)
    print(f"text vocab {len(text_vocab)} | sg vocab {len(sg_vocab)}")

    def load(split, scenes, limit):
        ds = GQADataset(root / "questions" / f"{split}_programs.json",
                        root / "sceneGraphs" / f"{scenes}_sceneGraphs.json",
                        text_vocab, sg_vocab)
        if limit and limit < len(ds):
            ds.data = ds.data[:limit]
        return ds

    train_ds = load("train_balanced", "train", args.max_train)
    val_ds = load("val_balanced", "val", args.max_val)
    print(f"train {len(train_ds)} | val {len(val_ds)}")

    torch.manual_seed(args.seed)
    model = TorchGraphVQA(text_vocab=len(text_vocab), sg_vocab=len(sg_vocab),
                          emb=args.emb, d=args.dim, ffn=2 * args.dim,
                          classifier_hidden=args.dim)
    if args.tied:
        t = np.load(args.tied)[:, : args.emb]
        s = np.load(pathlib.Path(args.tied).with_name(
            pathlib.Path(args.tied).stem + "_sg.npy"))[:, : args.emb]
        with torch.no_grad():
            model.text_vocab_embedding.weight.copy_(torch.from_numpy(t))
            model.scene_graph_encoder.sg_vocab_embedding.weight.copy_(
                torch.from_numpy(s))
        print(f"injected tied embeddings ({args.emb} dims)")
    n = sum(p.numel() for p in model.parameters())
    print(f"params: {n/1e6:.2f}M")
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)

    bcfg = BatchConfig(num_graphs=args.batch_size)
    rng = np.random.default_rng(args.seed)

    def batches(ds, shuffle):
        order = np.arange(len(ds))
        if shuffle:
            rng.shuffle(order)
        for s in range(0, len(order) - args.batch_size + 1, args.batch_size):
            items = [ds[int(i)] for i in order[s: s + args.batch_size]]
            qab = collate_qa(items, bcfg, text_vocab)
            inp = torch_inputs_from_items(items, np.asarray(qab.questions),
                                          np.asarray(qab.programs))
            labels = torch.from_numpy(
                np.asarray(qab.short_answer_label, np.int64))
            prog_t = torch.from_numpy(
                np.asarray(qab.programs, np.int64)[:, 1:])
            yield inp, labels, prog_t

    for epoch in range(args.epochs):
        model.train()
        t0 = time.perf_counter()
        tl, tc, tn = 0.0, 0, 0
        for inp, labels, prog_t in batches(train_ds, shuffle=True):
            opt.zero_grad()
            logits, prog_logits, _ = model(**inp)
            loss = torch.nn.functional.cross_entropy(logits, labels)
            if args.program_loss:
                loss = loss + torch.nn.functional.cross_entropy(
                    prog_logits.reshape(-1, prog_logits.shape[-1]),
                    prog_t.reshape(-1), ignore_index=1)
            else:
                loss = loss + 0.0 * prog_logits.mean()
            loss.backward()
            if args.clip_grad:
                torch.nn.utils.clip_grad_norm_(model.parameters(),
                                               args.clip_grad)
            opt.step()
            tl += float(loss) * len(labels)
            tc += int((logits.argmax(-1) == labels).sum())
            tn += len(labels)

        model.eval()
        vc, vn = 0, 0
        with torch.no_grad():
            for inp, labels, _ in batches(val_ds, shuffle=False):
                logits, _, _ = model(**inp)
                vc += int((logits.argmax(-1) == labels).sum())
                vn += len(labels)
        print(f"epoch {epoch:3d}  loss {tl/max(tn,1):.4f}  "
              f"train acc {100*tc/max(tn,1):5.2f}%  "
              f"val acc {100*vc/max(vn,1):5.2f}%  "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
