"""Layout dispatch for edge→node aggregation + the Pallas opt-in gate.

Two graph layouts remain after the round-2 measurements (ROOFLINE.md):

  * **dense** (production): fully-uniform per-graph padding; every segment
    primitive is a batched one-hot incidence contraction on the MXU
    (ops/dense.py) — measured 11.8x f32 / 13.5x bf16 over the naive scatter
    formulation on TPU v5e.
  * **flat** (oracle / fallback): concatenated dst-sorted edge list reduced
    with XLA segment ops (ops/segment.py) — the parity reference for every
    dense kernel, and the path for batches that overflow the dense ladder.

The r1 blocked ELL+spill layout and its Pallas kernels lost to the naive
baseline on hardware and were superseded by the dense layout; they were
removed in round 3 (VERDICT r2 item 7).
"""
from __future__ import annotations

import os

import jax

from graphvqa_tpu.core.graph import GraphBatch


def _use_pallas() -> bool:
    """Opt the dense GAT round into the fused Pallas kernel (TPU backends
    only). Default OFF: the kernel was measured SLOWER than the XLA one-hot
    path at production shapes (see ops/pallas/fused_dense_gat.py header for
    the measurement and the crossover condition)."""
    env = os.environ.get("GRAPHVQA_USE_PALLAS", "auto")
    if env in ("0", "false", "off"):
        return False
    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    if env in ("1", "true", "on"):
        return on_tpu
    return False  # auto: stay on the XLA path until profiled faster


def aggregate_edge_values(
    graph: GraphBatch,
    edge_values: jax.Array,       # [E, D] flat per-edge values
    reduce: str = "sum",
) -> jax.Array:
    """Layout-dispatching replacement for ``scatter_edges_to_nodes``: the MXU
    dense path when the batch carries the dense layout, else the XLA segment
    path. Returns [nodes_pad, D]."""
    if graph.has_dense_layout:
        from graphvqa_tpu.ops.dense import dense_aggregate_edges
        return dense_aggregate_edges(graph, edge_values, reduce=reduce)
    from graphvqa_tpu.ops.segment import scatter_edges_to_nodes
    return scatter_edges_to_nodes(
        edge_values, graph.edge_dst, graph.nodes_pad,
        edge_mask=graph.edge_mask, reduce=reduce)
