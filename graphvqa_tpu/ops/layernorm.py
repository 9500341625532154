"""Per-graph LayerNorm over nodes x channels jointly.

TPU-native rebuild of the reference's custom graph LayerNorm
(reference: graph_utils/my_graph_layernorm.py:52-78): for each graph in the
batch, mean/variance are computed over *all* node features of that graph
(nodes and channels jointly, like instance norm), then an affine transform.

Parity quirks preserved deliberately:
  * the affine weight/bias are **scalars** — the reference constructs
    ``Parameter(torch.Tensor([in_channels]))``, a 1-element tensor reset to
    ones/zeros (my_graph_layernorm.py:40-41,48-50);
  * eps is added to the **std**, not the variance (my_graph_layernorm.py:73);
  * the normalizer is ``num_nodes.clamp(min=1) * channels``
    (my_graph_layernorm.py:61-62).
(The class body being pasted twice in the reference file is behaviorally inert
and not reproduced.)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graphvqa_tpu.ops.segment import segment_sum


def graph_layer_norm_any(graph, x, weight, bias, eps: float = 1e-5):
    """Layout-dispatching per-graph LayerNorm: dense masked reduce on the
    uniform layout, segment path otherwise."""
    if graph.has_dense_layout:
        from graphvqa_tpu.ops.dense import dense_graph_layer_norm
        return dense_graph_layer_norm(graph, x, weight, bias, eps)
    return graph_layer_norm(x, graph.node_graph, graph.num_graphs,
                            weight, bias, node_mask=graph.node_mask, eps=eps)


def graph_layer_norm(
    x: jax.Array,
    node_graph: jax.Array,
    num_graphs: int,
    weight: jax.Array,
    bias: jax.Array,
    node_mask: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> jax.Array:
    """Normalize node features per graph.

    Args:
      x          : [nodes_pad, C] node features
      node_graph : [nodes_pad] segment ids (padding -> num_graphs)
      num_graphs : static number of real graphs
      weight,bias: scalar affine parameters (shape [] or [1])
      node_mask  : [nodes_pad] bool
    """
    channels = x.shape[-1]
    num_segments = num_graphs + 1  # one discard segment for padding

    mask_f = None if node_mask is None else node_mask.astype(x.dtype)
    if mask_f is None:
        counts = segment_sum(jnp.ones_like(x[:, :1]), node_graph, num_segments)
    else:
        counts = segment_sum(mask_f[:, None], node_graph, num_segments)
    norm = jnp.maximum(counts, 1.0) * channels  # [num_segments, 1]

    total = segment_sum(x, node_graph, num_segments, mask=node_mask)
    mean = total.sum(axis=-1, keepdims=True) / norm  # [num_segments, 1]

    centered = x - jnp.take(mean, node_graph, axis=0)
    if node_mask is not None:
        centered = jnp.where(node_mask[:, None], centered, 0.0)

    sq = segment_sum(centered * centered, node_graph, num_segments, mask=node_mask)
    var = sq.sum(axis=-1, keepdims=True) / norm

    # double-where guards sqrt'(0)=inf from poisoning gradients through the
    # padding segment (inf * 0 = NaN under reverse-mode AD)
    safe_var = jnp.where(var > 0, var, 1.0)
    std = jnp.where(var > 0, jnp.sqrt(safe_var), 0.0)
    out = centered / (jnp.take(std, node_graph, axis=0) + eps)
    out = out * jnp.reshape(weight, ()) + jnp.reshape(bias, ())
    if node_mask is not None:
        out = jnp.where(node_mask[:, None], out, 0.0)
    return out
