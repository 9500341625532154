from graphvqa_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    gather_nodes,
    scatter_edges_to_nodes,
)
from graphvqa_tpu.ops.layernorm import graph_layer_norm

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "gather_nodes",
    "scatter_edges_to_nodes",
    "graph_layer_norm",
]
