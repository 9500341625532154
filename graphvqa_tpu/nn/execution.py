"""Recurrent execution engine + execution-bitmap head (the paper's
"explainable" capability).

Reference: ``RecurrentExecutionEngine`` (pipeline_model_gat.py:194-288) — per
instruction step: a residual node update conditioned on the instruction vector
and a per-graph history vector, graph LayerNorm, then a per-node gate that is
segment-softmaxed per graph to produce one column of the [num_nodes, 5]
execution bitmap; the gated sum of node features becomes the next history
vector. Supervised with BCE against ``GraphBatch.exec_bitmap``
(mainExplain_gat.py:325,504; GT built at gqa_dataset_entry.py:111-134).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphvqa_tpu.core.graph import GraphBatch
from graphvqa_tpu.nn.gnn import MLP2
from graphvqa_tpu.ops import segment_softmax, segment_sum
from graphvqa_tpu.ops.layernorm import graph_layer_norm_any


class RecurrentExecutionEngine(nn.Module):
    node_features: int
    instr_features: int
    max_steps: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        x: jax.Array,               # [N, node_features]
        instr_vectors: jax.Array,   # [max_steps, B, instr_features]
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        Cn, Ci = self.node_features, self.instr_features
        N, B = graph.nodes_pad, graph.num_graphs

        node_mlp_1 = MLP2(Cn, Cn, self.dtype, name="node_mlp_1")
        node_mlp_2 = MLP2(Cn, Cn, self.dtype, name="node_mlp_2")
        gate_mlp = MLP2(Cn, 1, self.dtype, name="bitmap_gate_mlp")
        ln_w = self.param("ln_weight", nn.initializers.ones, (1,))
        ln_b = self.param("ln_bias", nn.initializers.zeros, (1,))

        history = jnp.zeros((B, Cn), self.dtype)
        bitmap_cols = []
        history_list = []
        for step in range(self.max_steps):
            u = instr_vectors[step]                              # [B, Ci]
            hist_pad = jnp.concatenate(
                [history, jnp.zeros((1, Cn), history.dtype)], axis=0)
            u_pad = jnp.concatenate(
                [u, jnp.zeros((1, Ci), u.dtype)], axis=0)

            # residual node update (pipeline_model_gat.py:236-259):
            # messages [x_src, history[graph_of_src]] -> MLP -> scatter_mean
            if graph.has_dense_layout:
                from graphvqa_tpu.ops.dense import (
                    broadcast_to_edges, broadcast_to_nodes, dense_gather_src)
                msg_in = jnp.concatenate(
                    [dense_gather_src(graph, x),
                     broadcast_to_edges(graph, history)], axis=-1)
                u_nodes = broadcast_to_nodes(graph, u)
            else:
                src_graph = jnp.take(graph.node_graph, graph.edge_src, axis=0)
                msg_in = jnp.concatenate(
                    [jnp.take(x, graph.edge_src, axis=0),
                     jnp.take(hist_pad, src_graph, axis=0)], axis=-1)
                u_nodes = jnp.take(u_pad, graph.node_graph, axis=0)
            msg = node_mlp_1(msg_in)
            from graphvqa_tpu.ops.dispatch import aggregate_edge_values
            aggr = aggregate_edge_values(graph, msg, reduce="mean")
            upd_in = jnp.concatenate([x, aggr, u_nodes], axis=-1)
            x_out = node_mlp_2(upd_in) + x
            x_out = graph_layer_norm_any(graph, x_out, ln_w, ln_b)

            # bitmap predictor (pipeline_model_gat.py:270-286)
            gate = gate_mlp(x_out)                               # [N, 1]
            if graph.has_dense_layout:
                from graphvqa_tpu.ops.dense import (
                    dense_node_softmax, dense_segment_sum_nodes)
                gate = dense_node_softmax(graph, gate)
                history = dense_segment_sum_nodes(graph, gate * x_out)
            else:
                gate = segment_softmax(gate, graph.node_graph, B + 1,
                                       mask=graph.node_mask)
                history = segment_sum(gate * x_out, graph.node_graph, B + 1,
                                      mask=graph.node_mask)[:B]
            bitmap_cols.append(gate)
            history_list.append(history)

        bitmap = jnp.concatenate(bitmap_cols, axis=1)            # [N, steps]
        histories = jnp.stack(history_list, axis=0)              # [steps, B, Cn]
        histories = MLP2(Ci, Ci, self.dtype, name="history_mlp")(histories)
        return x, bitmap, histories


def bitmap_precision_recall(
    bitmap_pred: jax.Array,     # [N, steps] in [0, 1]
    bitmap_true: jax.Array,     # [N, steps] {0, 1}
    node_mask: jax.Array,
    threshold: float = 0.5,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """GPU-metric parity of mainExplain_gat.py:1013-1042: returns
    (precision_sum, precision_count, recall_sum, recall_count)."""
    m = node_mask[:, None]
    pred = (bitmap_pred >= threshold) & m
    true = (bitmap_true >= 0.5) & m
    tp = jnp.sum(pred & true)
    precision_div = jnp.sum(pred)
    recall_div = jnp.sum(true)
    return tp, precision_div, tp, recall_div
