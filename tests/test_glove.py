"""GloVe wiring: .txt -> matrix -> injected rows land in the live params.

VERDICT r1 item 3's done-criterion: a params test showing known GloVe rows
land in ``text_vocab_embedding`` (reference construction-time copy:
pipeline_model_gat.py:633-634) — through the same loader + injection the CLI
uses (cli/train_cli.py:_load_glove -> inject_pretrained_embeddings).
"""
import numpy as np
import jax

from graphvqa_tpu.data.vocab import Vocab, load_glove_matrix
from graphvqa_tpu.models import PipelineModel
from graphvqa_tpu.models.pretrained import inject_pretrained_embeddings

from tests.helpers import random_qa_batch, tiny_model_config


def _write_glove(path, dim):
    rows = {
        "wall": np.arange(dim, dtype=np.float32) * 0.01,
        "white": np.ones(dim, np.float32) * 0.5,
        "dog": -np.arange(dim, dtype=np.float32) * 0.02,
    }
    with open(path, "w") as f:
        for w, v in rows.items():
            f.write(w + " " + " ".join(f"{x:.5f}" for x in v) + "\n")
        # a word outside the vocab must be ignored
        f.write("zzyzx " + " ".join("9.0" for _ in range(dim)) + "\n")
    return rows


def test_load_glove_matrix(tmp_path):
    vocab = Vocab(["<unk>", "<pad>", "<start>", "<end>",
                   "wall", "white", "is", "the", "dog"])
    rows = _write_glove(tmp_path / "glove.txt", dim=8)
    mat = load_glove_matrix(vocab, tmp_path / "glove.txt", dim=8)
    assert mat.shape == (len(vocab), 8)
    np.testing.assert_allclose(mat[vocab.stoi["wall"]], rows["wall"],
                               atol=1e-5)
    np.testing.assert_allclose(mat[vocab.stoi["dog"]], rows["dog"], atol=1e-5)
    # words missing from GloVe stay zero (torchtext behavior)
    assert (mat[vocab.stoi["is"]] == 0).all()
    assert (mat[vocab.stoi["<pad>"]] == 0).all()


def test_missing_glove_file_fails_loud(tmp_path):
    """A typo'd --glove path must error, not silently train with all-zero
    injected embeddings (VERDICT r3 weak #6)."""
    import pytest

    vocab = Vocab(["<unk>", "<pad>", "<start>", "<end>", "dog"])
    missing = tmp_path / "nope" / "glove.6B.300d.txt"
    with pytest.raises(FileNotFoundError, match="glove-allow-missing"):
        load_glove_matrix(vocab, missing, dim=8)
    mat = load_glove_matrix(vocab, missing, dim=8, allow_missing=True)
    assert mat.shape == (len(vocab), 8) and (mat == 0).all()


def test_injected_rows_reach_model_params(tmp_path):
    cfg = tiny_model_config()
    dim = cfg.text.emb_dim
    vocab_words = ["<unk>", "<pad>", "<start>", "<end>", "wall", "white",
                   "dog"] + [f"w{i}" for i in range(cfg.text.vocab_size - 7)]
    vocab = Vocab(vocab_words[: cfg.text.vocab_size])
    rows = _write_glove(tmp_path / "glove.txt", dim=dim)
    mat = load_glove_matrix(vocab, tmp_path / "glove.txt", dim=dim)

    batch = random_qa_batch(cfg=cfg, dense=True)
    model = PipelineModel(cfg)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    model_in = batch.replace(programs=batch.programs[:, :-1],
                             full_answers=batch.full_answers[:, :-1])
    variables = model.init(rngs, model_in)
    before = np.asarray(
        variables["params"]["text_vocab_embedding"]["embedding"])
    assert not np.allclose(before[vocab.stoi["wall"]], rows["wall"])

    variables = inject_pretrained_embeddings(variables, text_matrix=mat)
    emb = np.asarray(
        variables["params"]["text_vocab_embedding"]["embedding"])
    np.testing.assert_allclose(emb[vocab.stoi["wall"]], rows["wall"],
                               atol=1e-5)
    np.testing.assert_allclose(emb[vocab.stoi["white"]], rows["white"],
                               atol=1e-5)

    # the injected variables still drive a full forward
    out = model.apply(variables, model_in, sample=False, deterministic=True,
                      use_running_average=True)
    assert np.isfinite(np.asarray(out.short_answer_logits)).all()
