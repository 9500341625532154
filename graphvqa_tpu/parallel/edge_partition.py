"""Edge-partitioned message passing — graph-domain context parallelism.

The scaling dimension of this workload is the batched edge list (~1e6 edges at
batch 2000; SURVEY.md §5). This module shards the dst-sorted edge array across
the ``edge`` mesh axis with ``shard_map``: each chip runs SDDMM + local
segment reductions over its contiguous edge block, and the destination-softmax
is completed with a two-pass cross-partition reduction (pmax of per-node
maxima, psum of exp-sums and of weighted messages) — the same online-softmax
structure as ring attention, expressed as XLA collectives over ICI.

Because edges are sorted by destination, a contiguous 1/n slice touches a
narrow destination range, so per-shard partial vectors are sparse and the
psums carry mostly zeros per non-owned node; XLA's all-reduce keeps this
bandwidth-bound at [N, H(+C)] per round, independent of edge count — the
right trade once E >> N (GQA batches: E ~ 10x N).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _sm
    def _shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _esm
    def _shard_map(f, mesh, in_specs, out_specs):
        return _esm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False)

from graphvqa_tpu.ops.segment import segment_sum as _seg_sum

_NEG_INF = -1e30
_EPS = 1e-16


def edge_partitioned_gat_attention(
    xw: jax.Array,          # [N, H, C] projected nodes, replicated
    alpha_l: jax.Array,     # [N, H]
    alpha_r: jax.Array,     # [N, H]
    alpha_e: jax.Array,     # [E_loc, H] per-edge scores, shard-local
    edge_src: jax.Array,    # [E_loc]
    edge_dst: jax.Array,    # [E_loc]
    edge_mask: jax.Array,   # [E_loc]
    axis_name: str = "edge",
    negative_slope: float = 0.2,
) -> jax.Array:
    """One GAT aggregation round over a sharded edge block. Call inside
    shard_map with ``axis_name`` bound. Returns [N, H, C] (replicated)."""
    N = xw.shape[0]
    logits = (jnp.take(alpha_l, edge_src, axis=0)
              + jnp.take(alpha_r, edge_dst, axis=0)
              + alpha_e)
    logits = jax.nn.leaky_relu(logits, negative_slope)
    logits = jnp.where(edge_mask[:, None], logits, _NEG_INF)

    # pass 1: cross-partition destination max
    local_max = jax.ops.segment_max(logits, edge_dst, num_segments=N,
                                    indices_are_sorted=True)
    global_max = jax.lax.pmax(local_max, axis_name)
    # empty destinations hold -inf sentinels; exp() of (-inf - -inf) is
    # avoided because their edges are masked
    shifted = logits - jnp.take(global_max, edge_dst, axis=0)
    expd = jnp.where(edge_mask[:, None], jnp.exp(shifted), 0.0)

    # pass 2: cross-partition normalizer + weighted aggregation, one psum each
    local_sum = jax.ops.segment_sum(expd, edge_dst, num_segments=N,
                                    indices_are_sorted=True)
    global_sum = jax.lax.psum(local_sum, axis_name) + _EPS

    alpha = expd / jnp.take(global_sum, edge_dst, axis=0)
    msgs = jnp.take(xw, edge_src, axis=0) * alpha[..., None]     # [E_loc,H,C]
    partial = _seg_sum(msgs, edge_dst, N, mask=edge_mask,
                       indices_are_sorted=True)
    return jax.lax.psum(partial, axis_name)


def make_edge_partitioned_engine(
    mesh: Mesh,
    heads: int,
    out_channels: int,
    negative_slope: float = 0.2,
    axis_name: str = "edge",
) -> Callable:
    """Jitted one-round GAT forward with the edge list sharded over ``mesh``.

    Takes the *same parameter dict* as :class:`graphvqa_tpu.nn.gnn.GATLayer`
    (keys lin_lr/lin_e/att_l/att_r/att_e/bias) so a model trained single-chip
    runs edge-partitioned without conversion.
    """
    H, C = heads, out_channels

    def fwd(params: Dict[str, jax.Array], x, edge_attr,
            edge_src, edge_dst, edge_mask, node_mask):
        N = x.shape[0]
        xw = jnp.dot(x, params["lin_lr"],
                     preferred_element_type=jnp.float32).reshape(N, H, C)
        alpha_l = (xw * params["att_l"]).sum(-1)
        alpha_r = (xw * params["att_r"]).sum(-1)
        ew = jnp.dot(edge_attr, params["lin_e"],
                     preferred_element_type=jnp.float32).reshape(-1, H, C)
        alpha_e = (ew * params["att_e"]).sum(-1)
        out = edge_partitioned_gat_attention(
            xw, alpha_l, alpha_r, alpha_e, edge_src, edge_dst, edge_mask,
            axis_name=axis_name, negative_slope=negative_slope)
        out = out.mean(axis=1) + params["bias"]
        return jnp.where(node_mask[:, None], out, 0.0)

    mapped = _shard_map(
        fwd, mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P()),
        out_specs=P(),
    )
    return jax.jit(mapped)
