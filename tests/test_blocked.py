"""Blocked (ELL + spill) aggregation parity vs the flat segment path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphvqa_tpu.core.packing import build_blocked_edges
from graphvqa_tpu.nn.gnn import GATLayer
from graphvqa_tpu.ops.blocked import aggregate_edge_values
from graphvqa_tpu.ops.segment import scatter_edges_to_nodes
from tests.helpers import random_qa_batch, tiny_model_config


def _graphs(slots_per_node=4):
    cfg = tiny_model_config("gat")
    batch = random_qa_batch(cfg=cfg, num_graphs=3, nodes_pad=32, edges_pad=128)
    flat = batch.graphs
    blocked = build_blocked_edges(flat, block_nodes=8,
                                  slots_per_node=slots_per_node,
                                  spill_pad=64)
    return flat, blocked


@pytest.mark.parametrize("slots", [2, 16])  # slots=2 forces spill traffic
def test_aggregate_edge_values_matches_flat(slots):
    flat, blocked = _graphs(slots)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(flat.edges_pad, 7)).astype(np.float32))
    for reduce in ("sum", "mean"):
        want = scatter_edges_to_nodes(vals, flat.edge_dst, flat.nodes_pad,
                                      edge_mask=flat.edge_mask, reduce=reduce)
        got = aggregate_edge_values(blocked, vals, reduce=reduce)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("slots", [2, 16])
def test_gat_layer_blocked_matches_flat(slots):
    flat, blocked = _graphs(slots)
    H, C, in_dim = 2, 8, 8
    layer = GATLayer(out_channels=C, heads=H, dropout=0.0)
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (flat.nodes_pad, in_dim))
    e = jax.random.normal(jax.random.fold_in(key, 2), (flat.edges_pad, in_dim))
    ins = jax.random.normal(jax.random.fold_in(key, 3), (flat.num_graphs, 6))
    variables = layer.init({"params": jax.random.key(4)}, flat, x, e, ins=ins)
    want = layer.apply(variables, flat, x, e, ins=ins)
    got = layer.apply(variables, blocked, x, e, ins=ins)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_blocked_spill_overflow_raises():
    flat, _ = _graphs()
    with pytest.raises(ValueError):
        build_blocked_edges(flat, block_nodes=8, slots_per_node=1, spill_pad=1)
