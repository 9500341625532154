"""Offline preprocessing CLI (reference: preprocess.py:599-697 driver).

    python -m graphvqa_tpu.cli.preprocess_cli --data-root /path/to/GraphVQA \
        [--val-all]

Expects the GQA layout under --data-root:
    questions/original/{split}_questions.json
    sceneGraphs/{train,val}_sceneGraphs.json
Writes questions/{split}_programs.json (11-field tuples).
"""
from __future__ import annotations

import argparse
import pathlib

from graphvqa_tpu.data.preprocess import preprocess_file


def main():
    p = argparse.ArgumentParser("GraphVQA-TPU preprocessing")
    p.add_argument("--data-root", required=True)
    p.add_argument("--val-all", action="store_true",
                   help="also generate val_all programs (for consistency "
                        "scoring)")
    p.add_argument("--seed", type=int, default=0,
                   help="seed for choose-argument shuffling (None in the "
                        "reference; seeded here for reproducibility)")
    args = p.parse_args()

    root = pathlib.Path(args.data_root)
    q = root / "questions"
    sg = root / "sceneGraphs"

    # testdev has no GT scene graphs (gqa_dataset_entry.py:92-95)
    preprocess_file(q / "original" / "testdev_balanced_questions.json",
                    q / "testdev_balanced_programs.json", None, args.seed)
    preprocess_file(q / "original" / "val_balanced_questions.json",
                    q / "val_balanced_programs.json",
                    sg / "val_sceneGraphs.json", args.seed)
    preprocess_file(q / "original" / "train_balanced_questions.json",
                    q / "train_balanced_programs.json",
                    sg / "train_sceneGraphs.json", args.seed)
    if args.val_all:
        preprocess_file(q / "original" / "val_all_questions.json",
                        q / "val_all_programs.json",
                        sg / "val_sceneGraphs.json", args.seed)


if __name__ == "__main__":
    main()
