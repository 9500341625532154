"""The whole pipeline model — all neural modules wired together.

TPU-native re-design of the reference's ``PipelineModel``
(pipeline_model_gat.py:615-836) and its three variants:

  scene-graph encoder -> question encoder -> hierarchical program decoder
  -> language-conditioned message-passing engine (gat|gcn|gine|lcgn)
  -> conditional global attention pooling -> short-answer classifier
  (+ optional full-answer decoder and recurrent execution engine).

Variant selection is a config switch rather than four copied files; the
``onlysg`` ablation zeroes the encoded question memory, removing language
information while keeping shapes identical (eval_result/onlysg's ablation).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from graphvqa_tpu.config import ModelConfig
from graphvqa_tpu.core.graph import GraphBatch, QABatch
from graphvqa_tpu.nn.decoders import FullAnswerDecoder, ProgramDecoder
from graphvqa_tpu.nn.embedding import PaddedEmbed
from graphvqa_tpu.nn.encoders import QuestionEncoder, SceneGraphEncoder
from graphvqa_tpu.nn.execution import RecurrentExecutionEngine
from graphvqa_tpu.nn.gnn import GATSeq, GCNSeq, GINESeq, LCGNSeq
from graphvqa_tpu.nn.pooling import ConditionalGlobalAttention
from graphvqa_tpu.nn.transformer import TorchLinear


@struct.dataclass
class ModelOutput:
    short_answer_logits: jax.Array                 # [B, num_answers]
    instr_vectors: jax.Array                       # [M, B, D]
    program_logits: Optional[jax.Array] = None     # [B*M, Lp, V] (teacher-forced)
    program_tokens: Optional[jax.Array] = None     # [B*M, T] (greedy sample)
    full_answer_logits: Optional[jax.Array] = None
    full_answer_tokens: Optional[jax.Array] = None
    execution_bitmap: Optional[jax.Array] = None   # [N, M]
    node_attention: Optional[jax.Array] = None     # [N] pooling gate per node
    edge_attention: Optional[jax.Array] = None     # [rounds, E, H] GAT alphas
                                                   # (gat_skip.py:170-177)


class PipelineModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)

        self.scene_graph_encoder = SceneGraphEncoder(
            c.scene.vocab_size, c.scene.emb_dim, c.scene.pad_idx, dtype)

        # one text embedding shared by question encoder + both decoders
        # (reference: pipeline_model_gat.py:633-634)
        self.text_embed = PaddedEmbed(
            c.text.vocab_size, c.text.emb_dim, c.text.pad_idx,
            name="text_vocab_embedding")

        t = c.transformer
        self.question_encoder = QuestionEncoder(
            self.text_embed, t.hidden_dim, t.num_heads, t.ffn_dim,
            t.num_layers, t.dropout, dtype=dtype)
        self.program_decoder = ProgramDecoder(
            self.text_embed, c.text.vocab_size, c.max_execution_steps,
            t.hidden_dim, t.num_heads, t.ffn_dim, t.num_layers, t.dropout,
            sos_idx=c.text.sos_idx, pad_idx=c.text.pad_idx,
            max_decode_len=c.program_decode_len, dtype=dtype)
        if c.use_full_answer:
            self.full_answer_decoder = FullAnswerDecoder(
                self.text_embed, c.text.vocab_size, t.hidden_dim, t.num_heads,
                t.ffn_dim, t.num_layers, 0.1,
                sos_idx=c.text.sos_idx, pad_idx=c.text.pad_idx,
                max_decode_len=c.full_answer_decode_len, dtype=dtype)

        e = c.engine
        if e.kind in ("gat", "none"):
            self.engine = GATSeq(c.scene.emb_dim, e.num_rounds, e.heads,
                                 e.negative_slope, e.dropout, dtype)
        elif e.kind == "gcn":
            self.engine = GCNSeq(c.scene.emb_dim, e.num_rounds, e.dropout,
                                 dtype=dtype)
        elif e.kind == "gine":
            self.engine = GINESeq(c.scene.emb_dim, e.num_rounds, e.dropout,
                                  dtype=dtype)
        elif e.kind == "lcgn":
            self.engine = LCGNSeq(t.hidden_dim, e.lcgn_iters, e.lcgn_heads,
                                  e.negative_slope, e.dropout, dtype)
        else:
            raise ValueError(f"unknown engine kind: {e.kind}")

        pool_in = t.hidden_dim if e.kind == "lcgn" else c.scene.emb_dim
        del pool_in  # pooling's node_nn infers input dim from x
        self.pooling = ConditionalGlobalAttention(t.hidden_dim, dtype)

        if c.use_execution_engine:
            self.execution_engine = RecurrentExecutionEngine(
                c.scene.emb_dim, t.hidden_dim, c.max_execution_steps, dtype)

        self.classifier_dropout = nn.Dropout(c.classifier_dropout)
        self.classifier_hidden_layer = TorchLinear(
            c.classifier_hidden, dtype=dtype, name="logit_fc_hidden")
        self.classifier_out_layer = TorchLinear(
            c.num_answers, dtype=dtype, name="logit_fc_out")

    def __call__(
        self,
        batch: QABatch,
        sample: bool = False,
        deterministic: bool = True,
        use_running_average: bool = True,
        return_edge_attention: bool = False,
    ) -> ModelOutput:
        """``return_edge_attention`` additionally returns the per-round
        per-edge GAT attention weights (flat edge order) — the reference's
        optional explainability output (gat_skip.py:170-177); GAT engine
        only."""
        c = self.cfg
        graph = batch.graphs

        x_encoded, edge_attr_encoded = self.scene_graph_encoder(graph)

        questions_encoded = self.question_encoder(
            batch.questions, deterministic=deterministic)  # [B, Lq, D]
        if c.engine.kind == "none":
            # onlysg ablation: remove all language information downstream
            questions_encoded = jnp.zeros_like(questions_encoded)

        if sample:
            program_tokens, instr_vectors = self.program_decoder.sample(
                questions_encoded, deterministic=deterministic)
            program_logits = None
        else:
            program_logits, instr_vectors = self.program_decoder(
                questions_encoded, batch.programs, deterministic=deterministic)
            program_tokens = None

        execution_bitmap = None
        if c.use_execution_engine:
            _, execution_bitmap, _ = self.execution_engine(
                graph, x_encoded, instr_vectors)

        kind = c.engine.kind
        edge_attention = None
        if kind in ("gat", "none"):
            x_executed = self.engine(
                graph, x_encoded, edge_attr_encoded, instr_vectors,
                deterministic=deterministic,
                use_running_average=use_running_average,
                return_alpha=return_edge_attention)
            if return_edge_attention:
                x_executed, edge_attention = x_executed
        elif kind == "gcn":
            x_executed = self.engine(
                graph, x_encoded, instr_vectors, deterministic=deterministic,
                use_running_average=use_running_average)
        elif kind == "gine":
            x_executed = self.engine(
                graph, x_encoded, edge_attr_encoded, instr_vectors,
                deterministic=deterministic,
                use_running_average=use_running_average)
        else:  # lcgn
            q_first = questions_encoded[:, 0, :]
            x_executed = self.engine(
                graph, x_encoded, q_first, questions_encoded,
                deterministic=deterministic,
                use_running_average=use_running_average)

        # global language feature = <start>-position encoding
        # (pipeline_model_gat.py:799)
        q_feat = questions_encoded[:, 0, :]
        graph_feat, node_gate = self.pooling(graph, x_executed, q_feat)

        fused = jnp.concatenate(
            [graph_feat, q_feat, graph_feat * q_feat], axis=-1)
        h = self.classifier_dropout(fused, deterministic=deterministic)
        h = self.classifier_hidden_layer(h)
        h = nn.elu(h)
        h = self.classifier_dropout(h, deterministic=deterministic)
        short_answer_logits = self.classifier_out_layer(h)

        full_answer_logits = full_answer_tokens = None
        if c.use_full_answer:
            if sample:
                full_answer_tokens = self.full_answer_decoder.sample(
                    questions_encoded, deterministic=deterministic)
            else:
                full_answer_logits = self.full_answer_decoder(
                    questions_encoded, batch.full_answers,
                    deterministic=deterministic)

        return ModelOutput(
            short_answer_logits=short_answer_logits,
            instr_vectors=instr_vectors,
            program_logits=program_logits,
            program_tokens=program_tokens,
            full_answer_logits=full_answer_logits,
            full_answer_tokens=full_answer_tokens,
            execution_bitmap=execution_bitmap,
            node_attention=node_gate[:, 0],
            edge_attention=edge_attention,
        )
