"""Static-shape graph batch containers.

This replaces the reference's ragged ``torch_geometric.data.Batch``
(reference: gqa_dataset_entry.py:654, Batch.from_data_list) with dense, padded,
fixed-shape arrays so every training/eval step compiles once under jit.

Layout decisions (TPU-first):
  * Nodes/edges of all graphs in a batch are **concatenated** into flat arrays
    of static length ``nodes_pad`` / ``edges_pad``; per-element segment ids map
    back to graphs (the PyG ``batch`` vector, made static).
  * The edge list is **sorted by destination node** so segment reductions over
    destinations (the SpMM aggregate and the attention segment-softmax) operate
    on contiguous runs — `jax.ops.segment_sum(indices_are_sorted=True)` and the
    Pallas kernels both exploit this.
  * Padding convention: padded nodes carry ``node_graph == num_graphs`` (an
    extra, discarded segment); padded edges carry ``src == dst == nodes_pad-1``
    (keeps dst-sortedness since they sit at the tail) and are masked out of all
    message aggregation.
  * ``edge_sym_sign`` is +1/-1 and implements the reference's "negate the
    embedding of manually-added symmetric edges" trick
    (reference: pipeline_model_gat.py:590, gqa_dataset_entry.py:323-332) as a
    dense multiply rather than an index-scatter.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GraphBatch:
    """A padded batch of scene graphs.

    Shapes (all static under jit):
      node_tokens : [nodes_pad, max_obj_tokens] int32
      node_graph  : [nodes_pad] int32      segment id in [0, num_graphs]; num_graphs == padding
      node_mask   : [nodes_pad] bool
      edge_src    : [edges_pad] int32      source node index (flat)
      edge_dst    : [edges_pad] int32      destination node index (flat), sorted ascending
      edge_tokens : [edges_pad, max_edge_tokens] int32
      edge_mask   : [edges_pad] bool
      edge_sym_sign : [edges_pad] float32  -1 for dataset-added reverse edges else +1
      exec_bitmap : [nodes_pad, max_steps] float32   GT execution supervision (datum.y,
                    reference: gqa_dataset_entry.py:111-134); zeros when absent
      num_graphs  : static int
    """
    node_tokens: jax.Array
    node_graph: jax.Array
    node_mask: jax.Array
    edge_src: jax.Array
    edge_dst: jax.Array
    edge_tokens: jax.Array
    edge_mask: jax.Array
    edge_sym_sign: jax.Array
    exec_bitmap: jax.Array
    num_graphs: int = struct.field(pytree_node=False)

    # Fully-uniform dense per-graph layout (core/packing.py:pack_graphs_dense):
    # every graph is padded to exactly ``nodes_per_graph`` node rows AND
    # ``edges_per_graph`` edge rows, so graph g owns node rows
    # [g*npg, (g+1)*npg) and edge rows [g*epg, (g+1)*epg);
    # nodes_pad == B*npg, edges_pad == B*epg. Flat [N, ...]/[E, ...] arrays
    # reshape to dense [B, npg, ...]/[B, epg, ...] for free, which turns every
    # segment reduction / segment softmax / SpMM into batched dense
    # contractions against one-hot incidence matrices on the MXU
    # (ops/dense.py) — the TPU-native replacement for torch_scatter (K1/K3/K4).
    # 0 (default) means the layout is the ordinary concatenated one.
    nodes_per_graph: int = struct.field(pytree_node=False, default=0)
    edges_per_graph: int = struct.field(pytree_node=False, default=0)

    # Edge-partitioned execution (graph-domain context parallelism, SURVEY §5;
    # redesigned round 3): when set (inside shard_map), this GraphBatch's edge
    # arrays hold only the local shard of every graph's edges, partitioned by
    # **destination ownership** — shard s (s = axis index along ``edge_axis``,
    # of ``edge_axis_size`` shards) holds exactly the edges whose local
    # destination index i has i % k == s (parallel/edge_sharded.py:
    # shard_edges_by_dst). Destination softmax and aggregation are therefore
    # fully local per owned row; ops/dense.py assembles full node outputs with
    # a single strided all-gather of owned rows (exchange_owned_rows). Node
    # arrays stay replicated across the axis.
    edge_axis: Optional[str] = struct.field(pytree_node=False, default=None)
    edge_axis_size: int = struct.field(pytree_node=False, default=1)

    @property
    def has_dense_layout(self) -> bool:
        return self.nodes_per_graph > 0 and self.edges_per_graph > 0

    def edge_dense_indices(self):
        """(graph, dst_local, src_local) per edge for the dense layout.

        Requires ``has_dense_layout``. Padded edges land on a padding slot of
        their own graph; their contributions must be masked upstream.
        """
        npg = self.nodes_per_graph
        return self.edge_dst // npg, self.edge_dst % npg, self.edge_src % npg

    @property
    def nodes_pad(self) -> int:
        return self.node_tokens.shape[0]

    @property
    def edges_pad(self) -> int:
        return self.edge_src.shape[0]

    def node_counts(self) -> jax.Array:
        """Number of real nodes per graph, shape [num_graphs].

        Equivalent of PyG ``degree(batch)`` (reference: my_graph_layernorm.py:61).
        """
        return jax.ops.segment_sum(
            self.node_mask.astype(jnp.int32), self.node_graph,
            num_segments=self.num_graphs + 1)[: self.num_graphs]

    def edge_graph(self) -> jax.Array:
        """Segment id per edge via its source node (reference: gat_skip.py:257
        ``batch[edge_index[0]]``). Padded edges map to segment num_graphs."""
        eg = jnp.take(self.node_graph, self.edge_src, axis=0)
        return jnp.where(self.edge_mask, eg, self.num_graphs)


@struct.dataclass
class QABatch:
    """One full training/eval batch: graphs + tokenized text + labels.

    Equivalent of the reference collate output tuple
    (reference: gqa_dataset_entry.py:672-675) with batch-first token layout.

    Shapes:
      graphs           : GraphBatch
      questions        : [num_graphs, question_len] int32 (with <start>/<end>/<pad>)
      programs         : [num_graphs * max_steps, program_len] int32 — the 5x
                         flattened per-instruction token streams
                         (reference: gqa_dataset_entry.py:659-663)
      full_answers     : [num_graphs, full_answer_len] int32
      short_answer_label : [num_graphs] int32
    """
    graphs: GraphBatch
    questions: jax.Array
    programs: jax.Array
    full_answers: jax.Array
    short_answer_label: jax.Array
