"""Tied pseudo-GloVe embeddings: align text- and scene-graph-vocab vectors.

The reference trains with GloVe-300d injected into the shared text embedding
(pipeline_model_gat.py:633-634), which gives the question token "dog" and the
scene-graph name "dog" correlated representations from step 0 (the SG vocab is
built over the same English words, gqa_dataset_entry.py:138-163). A synthetic
run without GloVe must *learn* that ~1700-way text<->scene name binding from
scratch before any scene-derivable question generalizes — the leading
hypothesis for round 4's flat val curve (VERDICT r4 item 1).

This tool reproduces the reference's aligned-init property without shipping
GloVe weights: every surface WORD gets a deterministic random 300-d vector
(seeded by a stable hash of the word), and a vocab entry's row is the SUM of
its words' vectors. Summing makes multi-word SG tokens ("to the left of",
"traffic light") consistent with the text side, where the same surface splits
into word tokens and node features sum over token slots
(pipeline_model_gat.py:583-585 semantics).

    python tools/make_tied_embeddings.py --data-root /tmp/syngqa \
        --out outputdir/tied.npy

writes ``tied.npy`` (text vocab rows), ``tied_sg.npy`` (SG vocab rows), and
``text_vocab.json`` next to --out, matching the trainer's artifacts, so:

    python -m graphvqa_tpu.cli.train_cli ... --output_dir outputdir \
        --glove outputdir/tied.npy --glove-sg
"""
from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from graphvqa_tpu.data.tokenizer import tokenize  # noqa: E402
from graphvqa_tpu.data.vocab import (  # noqa: E402
    SPECIALS, Vocab, build_scene_graph_vocab, build_text_vocab)


def word_vector(word: str, dim: int = 300, scale: float = 0.4) -> np.ndarray:
    """Deterministic per-word vector, stable across runs/processes (unlike
    builtin hash()). scale ~= GloVe-300d's per-component std."""
    seed = int.from_bytes(
        hashlib.blake2b(word.encode("utf-8"), digest_size=8).digest(),
        "little")
    rng = np.random.default_rng(np.random.SeedSequence(seed))
    return rng.normal(0.0, scale, size=(dim,)).astype(np.float32)


def matrix_for(vocab: Vocab, dim: int = 300) -> np.ndarray:
    mat = np.zeros((len(vocab), dim), dtype=np.float32)
    for i, tok in enumerate(vocab.itos):
        if tok in SPECIALS or tok.startswith("<"):
            continue  # specials/<self> stay zero (torchtext OOV behavior)
        words = tok.split()
        if not words:
            continue
        mat[i] = np.sum([word_vector(w, dim) for w in words], axis=0)
    return mat


def main():
    p = argparse.ArgumentParser("tied pseudo-GloVe embedding generator")
    p.add_argument("--data-root", required=True)
    p.add_argument("--split", default="train_balanced")
    p.add_argument("--out", required=True, metavar="TIED_NPY",
                   help="output .npy for the text matrix; the SG matrix goes "
                        "to <stem>_sg.npy and the vocab to text_vocab.json "
                        "in the same directory")
    p.add_argument("--dim", type=int, default=300)
    args = p.parse_args()

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)

    vocab_path = out.parent / "text_vocab.json"
    if vocab_path.exists():
        text_vocab = Vocab.load(vocab_path)
        print(f"reusing {vocab_path} ({len(text_vocab)} tokens)")
    else:
        programs = json.loads(
            (pathlib.Path(args.data_root) / "questions" /
             f"{args.split}_programs.json").read_text())
        text_vocab = build_text_vocab(programs, tokenize)
        text_vocab.save(vocab_path)
        print(f"built text vocab: {len(text_vocab)} tokens -> {vocab_path}")
    sg_vocab = build_scene_graph_vocab()

    text_mat = matrix_for(text_vocab, args.dim)
    sg_mat = matrix_for(sg_vocab, args.dim)
    np.save(out, text_mat)
    np.save(out.with_name(out.stem + "_sg.npy"), sg_mat)

    # sanity: the same surface word must land on identical vectors
    shared = [w for w in ("dog", "window", "red") if w in text_vocab.stoi
              and w in sg_vocab.stoi]
    for w in shared:
        assert np.allclose(text_mat[text_vocab.stoi[w]],
                           sg_mat[sg_vocab.stoi[w]]), w
    nz_t = int((text_mat != 0).any(1).sum())
    nz_s = int((sg_mat != 0).any(1).sum())
    print(f"text rows non-zero: {nz_t}/{len(text_vocab)} | "
          f"sg rows non-zero: {nz_s}/{len(sg_vocab)} | "
          f"tied check ok on {shared}")


if __name__ == "__main__":
    main()
