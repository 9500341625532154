"""End-to-end smoke: every pipeline flavor initializes, forwards, and samples.

Mirrors the reference's `python pipeline_model_gat.py` smoke entry
(pipeline_model_gat.py:839-902) as real pytest.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphvqa_tpu.models import PipelineModel
from tests.helpers import random_qa_batch, tiny_model_config


def _init_and_forward(kind, sample=False, **cfg_overrides):
    cfg = tiny_model_config(kind, **cfg_overrides)
    batch = random_qa_batch(cfg=cfg)
    model = PipelineModel(cfg)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    variables = model.init(rngs, batch, sample=False)
    out = model.apply(
        variables, batch, sample=sample,
        deterministic=True, use_running_average=True,
        rngs={"lcgn_ctx": jax.random.key(3)})
    return cfg, batch, out


@pytest.mark.parametrize("kind", ["gat", "gcn", "gine", "lcgn", "none"])
def test_forward_shapes(kind):
    cfg, batch, out = _init_and_forward(kind)
    B = batch.graphs.num_graphs
    M = cfg.max_execution_steps
    assert out.short_answer_logits.shape == (B, cfg.num_answers)
    assert out.instr_vectors.shape == (M, B, cfg.transformer.hidden_dim)
    assert out.program_logits.shape == (
        B * M, batch.programs.shape[1], cfg.text.vocab_size)
    assert out.full_answer_logits.shape == (
        B, batch.full_answers.shape[1], cfg.text.vocab_size)
    assert np.all(np.isfinite(np.asarray(out.short_answer_logits)))
    assert np.all(np.isfinite(np.asarray(out.program_logits)))


def test_greedy_sampling():
    cfg, batch, out = _init_and_forward("gat", sample=True)
    B = batch.graphs.num_graphs
    M = cfg.max_execution_steps
    assert out.program_tokens.shape == (B * M, cfg.program_decode_len)
    assert out.full_answer_tokens.shape == (B, cfg.full_answer_decode_len)
    # position 0 is always <start>
    assert np.all(np.asarray(out.program_tokens[:, 0]) == cfg.text.sos_idx)


def test_execution_engine_bitmap():
    cfg, batch, out = _init_and_forward("gat", use_execution_engine=True)
    N = batch.graphs.nodes_pad
    M = cfg.max_execution_steps
    assert out.execution_bitmap.shape == (N, M)
    bm = np.asarray(out.execution_bitmap)
    mask = np.asarray(batch.graphs.node_mask)
    # per-graph softmax: columns sum to ~1 per graph
    ng = np.asarray(batch.graphs.node_graph)
    for g in range(batch.graphs.num_graphs):
        col = bm[(ng == g) & mask, 0]
        np.testing.assert_allclose(col.sum(), 1.0, atol=1e-4)
    assert np.all(bm[~mask] == 0.0)


def test_onlysg_ablation_ignores_question():
    """Different question tokens must produce identical logits under 'none'."""
    cfg = tiny_model_config("none")
    batch = random_qa_batch(cfg=cfg)
    model = PipelineModel(cfg)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    variables = model.init(rngs, batch, sample=False)
    out1 = model.apply(variables, batch, deterministic=True)
    batch2 = batch.replace(questions=jnp.roll(batch.questions, 1, axis=1))
    out2 = model.apply(variables, batch2, deterministic=True)
    np.testing.assert_allclose(np.asarray(out1.short_answer_logits),
                               np.asarray(out2.short_answer_logits), atol=1e-5)


def test_padding_invariance():
    """Growing the pad region must not change real outputs (mask correctness)."""
    cfg = tiny_model_config("gat")
    b_small = random_qa_batch(cfg=cfg, nodes_pad=24, edges_pad=48)
    b_big = random_qa_batch(cfg=cfg, nodes_pad=40, edges_pad=96)
    model = PipelineModel(cfg)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    variables = model.init(rngs, b_small, sample=False)
    out_s = model.apply(variables, b_small, deterministic=True)
    out_b = model.apply(variables, b_big, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_s.short_answer_logits),
        np.asarray(out_b.short_answer_logits), rtol=1e-4, atol=1e-4)


def test_edge_attention_exposed():
    """GAT per-edge attention surfaces through ModelOutput
    (gat_skip.py:170-177 explainability output)."""
    import jax
    import numpy as np
    from graphvqa_tpu.models import PipelineModel
    from tests.helpers import random_qa_batch, tiny_model_config

    cfg = tiny_model_config("gat")
    batch = random_qa_batch(cfg=cfg, dense=True)
    model = PipelineModel(cfg)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    model_in = batch.replace(programs=batch.programs[:, :-1],
                             full_answers=batch.full_answers[:, :-1])
    variables = model.init(rngs, model_in)
    out = model.apply(variables, model_in, sample=False, deterministic=True,
                      use_running_average=True, return_edge_attention=True)
    E = batch.graphs.edges_pad
    assert out.edge_attention.shape == (
        cfg.engine.num_rounds, E, cfg.engine.heads)
    alpha = np.asarray(out.edge_attention)
    mask = np.asarray(batch.graphs.edge_mask)
    assert np.all(alpha[:, ~mask] == 0.0)
    assert np.isfinite(alpha).all()


def test_pipeline_forward_bfloat16_fast_tier():
    """The SHIPPING dtype must be exercised in the fast tier (round-3 review
    weak): a bf16 forward + a few train steps stay finite and reduce loss —
    the full accuracy bar stays with the slow golden test."""
    import dataclasses

    import numpy as np
    import jax

    from graphvqa_tpu.config import BatchConfig, Config, TrainConfig
    from graphvqa_tpu.models import PipelineModel
    from graphvqa_tpu.train.loop import make_train_step
    from graphvqa_tpu.train.train_state import create_train_state
    from tests.helpers import random_qa_batch, tiny_model_config

    mcfg = dataclasses.replace(tiny_model_config("gat"), dtype="bfloat16")
    cfg = Config(model=mcfg, batch=BatchConfig(), train=TrainConfig())
    batch = random_qa_batch(seed=21, num_graphs=3, dense=True,
                            nodes_per_graph=8, edges_per_graph=16, cfg=mcfg)
    model = PipelineModel(mcfg)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "lcgn_ctx": jax.random.key(2)}
    variables = model.init(rngs, batch.replace(
        programs=batch.programs[:, :-1],
        full_answers=batch.full_answers[:, :-1]))
    state = create_train_state(variables, lr=1e-3)
    step = make_train_step(model, cfg)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(3))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
