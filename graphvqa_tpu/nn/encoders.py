"""Scene-graph and question encoders.

Scene-graph encoder (reference: GroundTruth_SceneGraph_Encoder,
pipeline_model_gat.py:553-610): GloVe-style embedding of node/edge token
arrays **summed** (not averaged) over token slots, sign-flip of dataset-added
symmetric edges, one MetaLayer round, then per-graph LayerNorm.

Question encoder (reference: TransformerQuestionEncoder,
pipeline_model_gat.py:529-550): shared text embedding -> linear projection
x sqrt(d) -> sinusoidal positions -> 3-layer post-LN transformer encoder.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphvqa_tpu.core.graph import GraphBatch
from graphvqa_tpu.nn.embedding import PaddedEmbed
from graphvqa_tpu.nn.gnn import SceneGraphMetaLayer
from graphvqa_tpu.nn.transformer import (
    PositionalEncoding, TorchLinear, TransformerEncoder)
from graphvqa_tpu.ops.layernorm import graph_layer_norm_any


class SceneGraphEncoder(nn.Module):
    vocab_size: int
    emb_dim: int = 300
    pad_idx: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, graph: GraphBatch) -> Tuple[jax.Array, jax.Array]:
        embed = PaddedEmbed(self.vocab_size, self.emb_dim, self.pad_idx,
                            name="sg_vocab_embedding")

        # [N, T] -> sum over token slots -> [N, D] (sum, not mean:
        # pipeline_model_gat.py:585) via the counts-matmul embedding bag —
        # the gather+scatter this replaces cost ~45 ms/step in the profiled
        # production train step (tools/profile_train_step.py)
        x = embed.bag_sum(graph.node_tokens, compute_dtype=self.dtype)
        # edge embedding with reverse-edge sign flip (pipeline_model_gat.py:590)
        e = embed.bag_sum(graph.edge_tokens, compute_dtype=self.dtype)
        e = e * graph.edge_sym_sign[:, None].astype(e.dtype)

        x = jnp.where(graph.node_mask[:, None], x, 0.0)
        e = jnp.where(graph.edge_mask[:, None], e, 0.0)

        x_enc, e_enc = SceneGraphMetaLayer(
            self.emb_dim, self.emb_dim, self.dtype, name="meta_layer")(
            graph, x, e)

        ln_w = self.param("ln_weight", nn.initializers.ones, (1,))
        ln_b = self.param("ln_bias", nn.initializers.zeros, (1,))
        x_enc = graph_layer_norm_any(graph, x_enc, ln_w, ln_b)
        return x_enc, e_enc


class QuestionEncoder(nn.Module):
    text_embed: PaddedEmbed        # shared with the decoders
    hidden_dim: int = 512
    num_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 3
    dropout: float = 0.1
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, deterministic: bool = True) -> jax.Array:
        # tokens: [B, L] -> [B, L, hidden_dim]
        x = self.text_embed(tokens)
        x = TorchLinear(self.hidden_dim, dtype=self.dtype, name="emb_proj")(x)
        x = x * math.sqrt(self.hidden_dim)
        x = PositionalEncoding(self.hidden_dim, self.dropout, self.max_len,
                               name="pos_encoder")(x, deterministic=deterministic)
        return TransformerEncoder(
            self.num_layers, self.hidden_dim, self.num_heads, self.ffn_dim,
            self.dropout, self.dtype, name="encoder")(
            x, deterministic=deterministic)
