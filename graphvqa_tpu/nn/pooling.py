"""Language-conditioned global attention pooling.

Reference: ``MyConditionalGlobalAttention`` (pipeline_model_gat.py:108-185):
gate = MLP(ques_nn(u)[batch] * node_nn(x)), segment-softmaxed per graph, then
scatter-add of gate * node_nn(x) into a [B, D] graph readout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphvqa_tpu.core.graph import GraphBatch
from graphvqa_tpu.nn.gnn import MLP2
from graphvqa_tpu.ops import segment_softmax, segment_sum


class ConditionalGlobalAttention(nn.Module):
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        x: jax.Array,        # [N, node_dim]
        u: jax.Array,        # [B, out_features] global language feature
    ) -> tuple:
        """Returns (readout [B, D], gate [N, 1]).

        The gate is the per-node attention distribution (softmax within each
        graph) — the model's object-level attention map, consumed by the
        official grounding metric (reference: eval.py:316-338; the reference
        layer exposes it through ``gate_* = gate`` at
        pipeline_model_gat.py:178)."""
        D = self.out_features
        B = graph.num_graphs

        x = MLP2(D, D, self.dtype, name="node_nn")(x)
        uq = MLP2(D, D, self.dtype, name="ques_nn")(u)        # [B, D]
        if graph.has_dense_layout:
            from graphvqa_tpu.ops.dense import (
                dense_node_softmax, dense_segment_sum_nodes)
            npg = graph.nodes_per_graph
            u_per_node = jnp.broadcast_to(
                uq[:, None, :], (B, npg, D)).reshape(B * npg, D)
            gate = MLP2(D, 1, self.dtype, name="gate_nn")(u_per_node * x)
            gate = dense_node_softmax(graph, gate)
            out = dense_segment_sum_nodes(graph, gate * x)
            return out, gate
        uq_pad = jnp.concatenate(
            [uq, jnp.zeros((1, D), uq.dtype)], axis=0)
        u_per_node = jnp.take(uq_pad, graph.node_graph, axis=0)

        gate = MLP2(D, 1, self.dtype, name="gate_nn")(u_per_node * x)  # [N, 1]
        gate = segment_softmax(gate, graph.node_graph, B + 1,
                               mask=graph.node_mask)
        out = segment_sum(gate * x, graph.node_graph, B + 1,
                          mask=graph.node_mask)
        return out[:B], gate
