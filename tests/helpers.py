"""Shared test fixtures: tiny configs and random batches."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from graphvqa_tpu.config import (
    BatchConfig, EngineConfig, ModelConfig, SceneGraphConfig, TextConfig,
    TransformerConfig)
from graphvqa_tpu.core import (
    GraphSample, QABatch, pack_graphs, pack_graphs_dense)


def tiny_model_config(kind="gat", **overrides) -> ModelConfig:
    cfg = ModelConfig(
        text=TextConfig(vocab_size=60, emb_dim=16),
        scene=SceneGraphConfig(vocab_size=40, emb_dim=12),
        transformer=TransformerConfig(hidden_dim=32, num_heads=4, ffn_dim=64,
                                      num_layers=2, dropout=0.1),
        engine=EngineConfig(kind=kind, num_rounds=3, heads=2, lcgn_iters=2),
        num_answers=20,
        max_execution_steps=3,
        program_decode_len=8,
        full_answer_decode_len=8,
        classifier_hidden=32,
        # unit tests are parity oracles vs float64/torch-f32 references; the
        # shipping bfloat16 default is exercised by the golden CLI tests
        dtype="float32",
    )
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def random_sample(rng, n, e, sg_vocab=40, tok_w=12, steps=3):
    return GraphSample(
        node_tokens=rng.integers(2, sg_vocab, size=(n, tok_w)).astype(np.int32),
        edge_src=rng.integers(0, n, size=e).astype(np.int32),
        edge_dst=rng.integers(0, n, size=e).astype(np.int32),
        edge_tokens=rng.integers(2, sg_vocab, size=(e, 1)).astype(np.int32),
        edge_sym=rng.random(e) > 0.7,
        exec_bitmap=(rng.random((n, steps)) > 0.5).astype(np.float32),
    )


def random_qa_batch(seed=0, num_graphs=2, nodes_pad=24, edges_pad=48,
                    q_len=7, p_len=6, fa_len=8, cfg: ModelConfig | None = None,
                    dense=False, nodes_per_graph=8, edges_per_graph=16):
    cfg = cfg or tiny_model_config()
    rng = np.random.default_rng(seed)
    samples = [random_sample(rng, rng.integers(3, 8), rng.integers(4, 16),
                             sg_vocab=cfg.scene.vocab_size,
                             steps=cfg.max_execution_steps)
               for _ in range(num_graphs)]
    if dense:
        graphs = pack_graphs_dense(samples, nodes_per_graph, edges_per_graph,
                                   max_steps=cfg.max_execution_steps)
    else:
        graphs = pack_graphs(samples, nodes_pad, edges_pad,
                             max_steps=cfg.max_execution_steps)
    graphs = graphs.replace(
        node_tokens=jnp.asarray(graphs.node_tokens),
        node_graph=jnp.asarray(graphs.node_graph),
        node_mask=jnp.asarray(graphs.node_mask),
        edge_src=jnp.asarray(graphs.edge_src),
        edge_dst=jnp.asarray(graphs.edge_dst),
        edge_tokens=jnp.asarray(graphs.edge_tokens),
        edge_mask=jnp.asarray(graphs.edge_mask),
        edge_sym_sign=jnp.asarray(graphs.edge_sym_sign),
        exec_bitmap=jnp.asarray(graphs.exec_bitmap),
    )
    V = cfg.text.vocab_size
    M = cfg.max_execution_steps
    return QABatch(
        graphs=graphs,
        questions=jnp.asarray(
            rng.integers(4, V, size=(num_graphs, q_len)), jnp.int32),
        programs=jnp.asarray(
            rng.integers(4, V, size=(num_graphs * M, p_len)), jnp.int32),
        full_answers=jnp.asarray(
            rng.integers(4, V, size=(num_graphs, fa_len)), jnp.int32),
        short_answer_label=jnp.asarray(
            rng.integers(0, cfg.num_answers, size=(num_graphs,)), jnp.int32),
    )
