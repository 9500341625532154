"""Migration dress rehearsal: a torch-TRAINED reference checkpoint works.

VERDICT r4 item 5: previous rounds proved numeric parity against composed
torch oracles fed synthesized weights; this closes the last gap to "a
user's checkpoint works" by executing the exact MIGRATION.md sequence from
a real torch artifact:

  1. train the reference architecture in torch (tests/torch_reference.py —
     exact reference state_dict names, PyG-free) on the debug fixture;
  2. ``torch.save`` the trainer-format checkpoint + pickle a
     torchtext-shaped vocab (the two files a reference user has,
     mainExplain_gat.py:371-384 + gqa_dataset_entry.py:546-578);
  3. ``convert_ckpt_cli --torch-ckpt --torch-vocab``;
  4. evaluate through the real CLI (greedy decode + result dump);
  5. assert the CLI's per-question predictions and accuracy EQUAL the
     torch-side eval of the same model.
"""
import json
import pathlib
import shutil

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from graphvqa_tpu.config import BatchConfig  # noqa: E402
from graphvqa_tpu.data import (  # noqa: E402
    GQADataset, build_scene_graph_vocab, build_text_vocab, tokenize)
from graphvqa_tpu.data.dataset import collate_qa  # noqa: E402
from graphvqa_tpu.data.vocab import load_answer_maps  # noqa: E402
from tests.test_torchtext_import import _fake_torchtext_pickle  # noqa: E402
from tests.torch_reference import (  # noqa: E402
    TorchGraphVQA, torch_inputs_from_items)

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "graphvqa_tpu" / \
    "assets" / "debug"


@pytest.mark.slow
def test_migration_dress_rehearsal(tmp_path):
    root = tmp_path / "data"
    (root / "questions").mkdir(parents=True)
    (root / "sceneGraphs").mkdir()
    shutil.copy(ASSETS / "debug_programs.json", root / "questions")
    shutil.copy(ASSETS / "debug_sceneGraphs.json",
                root / "sceneGraphs" / "val_sceneGraphs.json")
    out = tmp_path / "out"
    out.mkdir()

    # --- the vocab a reference user's torchtext Field would hold ---
    data = json.loads((root / "questions" / "debug_programs.json").read_text())
    text_vocab = build_text_vocab(data, tokenize)
    sg_vocab = build_scene_graph_vocab()
    pkl = tmp_path / "GQA_TEXT_obj.pkl"
    pkl.write_bytes(_fake_torchtext_pickle(text_vocab.itos,
                                           with_vectors=False))

    # --- torch-side training on the fixture (reference recipe shape:
    # Adam, loss = short-answer CE + 0*programs, mainExplain_gat.py:542) ---
    ds = GQADataset(root / "questions" / "debug_programs.json",
                    root / "sceneGraphs" / "val_sceneGraphs.json",
                    text_vocab, sg_vocab)
    items = [ds[i] for i in range(len(ds))]
    bcfg = BatchConfig(num_graphs=len(items))
    qab = collate_qa(items, bcfg, text_vocab)
    inp = torch_inputs_from_items(items, np.asarray(qab.questions),
                                  np.asarray(qab.programs))
    labels = torch.from_numpy(
        np.asarray(qab.short_answer_label, np.int64))

    torch.manual_seed(0)
    model = TorchGraphVQA(text_vocab=len(text_vocab), sg_vocab=len(sg_vocab))
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    model.train()
    acc = 0.0
    for step in range(400):
        opt.zero_grad()
        logits, prog_logits, _ = model(**inp)
        loss = torch.nn.functional.cross_entropy(logits, labels) \
            + 0.0 * prog_logits.mean()
        loss.backward()
        opt.step()
        acc = float((logits.argmax(-1) == labels).float().mean())
        if acc == 1.0 and step > 50:
            break
    assert acc == 1.0, f"torch-side training failed to overfit ({acc})"

    # --- torch-side eval (the accuracies the user migrates FROM) ---
    model.eval()
    with torch.no_grad():
        logits, _, _ = model(**inp)
    torch_pred = logits.argmax(-1).numpy()
    torch_acc = float((torch_pred == labels.numpy()).mean())
    _, label2ans = load_answer_maps()
    torch_pred_ans = {it["question_id"]: label2ans[int(p)]
                      for it, p in zip(items, torch_pred)}

    # --- the user's two artifacts ---
    pth = tmp_path / "checkpoint.pth"
    torch.save({"model": {"module." + k: v
                          for k, v in model.state_dict().items()},
                "epoch": 0}, pth)

    # --- conversion CLI (ckpt + vocab in one invocation) ---
    from graphvqa_tpu.cli.convert_ckpt_cli import (
        get_args_parser as conv_parser, main as conv_main)
    conv_main(conv_parser().parse_args([
        "--torch-ckpt", str(pth), "--torch-vocab", str(pkl),
        "--out", str(out / "ckpt_converted"),
        "--num-encoder-layers", "2", "--num-decoder-layers", "2",
        "--num-rounds", "5"]))
    assert (out / "text_vocab.json").exists()

    # --- real-CLI evaluation from the converted checkpoint ---
    from graphvqa_tpu.cli.train_cli import (
        get_args_parser as train_parser, main as train_main)
    train_main(train_parser().parse_args([
        "--model", "gat", "--tiny", "--data-root", str(root),
        "--split", "debug", "--val-split", "debug",
        "--batch-size", "4", "--output_dir", str(out),
        "--dtype", "float32", "--print-freq", "1000",
        "--evaluate", "--dump-result",
        "--resume", str(out / "ckpt_converted")]))

    dump = json.loads((out / "dump_results.json").read_text())
    assert set(dump) == set(torch_pred_ans)
    cli_acc = float(np.mean([row["prediction"] == row["answer"]
                             for row in dump.values()]))
    for qid, row in dump.items():
        assert row["prediction"] == torch_pred_ans[qid], (
            qid, row["prediction"], torch_pred_ans[qid])
    assert cli_acc == pytest.approx(torch_acc), (cli_acc, torch_acc)
    assert cli_acc == 1.0
