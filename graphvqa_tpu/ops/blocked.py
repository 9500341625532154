"""Blocked (ELL + spill) segment reductions — the MXU aggregation path.

XLA lowers ``segment_sum`` over [E, D] messages to a scatter-add that runs at
~90 GB/s effective on TPU (measured, bench.py microbench) — an order of
magnitude under HBM speed. With the host-packed blocked layout
(core/packing.py:build_blocked_edges) the same reduction becomes a batch of
dense one-hot contractions:

    out[block, n, d] = sum_e onehot[block, n, e] * values[block, e, d]

which the MXU executes at matmul speed; the <1% spilled edges go through the
ordinary segment path and are added in. ``blocked_segment_max`` uses a masked
VPU max over the same layout (for the attention softmax's stabilizing pass).

All functions return *flat* [nodes_pad, ...] arrays so callers are layout-
agnostic.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

import os

from graphvqa_tpu.core.graph import GraphBatch
from graphvqa_tpu.ops.segment import segment_sum, segment_max

_NEG_INF = -1e30


def _use_pallas() -> bool:
    """Opt the message aggregation into the Pallas kernel (TPU backends only;
    the XLA one-hot path is the oracle and the CPU/test path)."""
    env = os.environ.get("GRAPHVQA_USE_PALLAS", "auto")
    if env in ("0", "false", "off"):
        return False
    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    if env in ("1", "true", "on"):
        return on_tpu
    return False  # auto: stay on the XLA path until profiled faster


def _onehot(graph: GraphBatch, dtype=jnp.float32) -> jax.Array:
    """[nb, BN, BE] one-hot destination matrix (masked)."""
    BN = graph.block_nodes
    sel = (graph.blk_dst_local[:, None, :]
           == jax.lax.broadcasted_iota(jnp.int32, (1, BN, 1), 1))
    sel = sel & graph.blk_mask[:, None, :]
    return sel.astype(dtype)


def blocked_segment_sum(
    graph: GraphBatch,
    blk_values: jax.Array,        # [nb, BE, D]
    spill_values: Optional[jax.Array] = None,   # [S, D]
) -> jax.Array:
    """Sum per destination -> [nodes_pad, D]."""
    onehot = _onehot(graph, blk_values.dtype)
    out = jnp.einsum("nbe,ned->nbd", onehot, blk_values,
                     preferred_element_type=jnp.float32)
    out = out.reshape(graph.nodes_pad, -1).astype(blk_values.dtype)
    if spill_values is not None:
        spill_dst = jnp.take(graph.edge_dst, graph.spill_perm, axis=0)
        out = out + segment_sum(spill_values, spill_dst, graph.nodes_pad,
                                mask=graph.spill_mask)
    return out


def blocked_segment_max(
    graph: GraphBatch,
    blk_values: jax.Array,        # [nb, BE, H]
    spill_values: Optional[jax.Array] = None,   # [S, H]
) -> jax.Array:
    """Max per destination -> [nodes_pad, H]; empty -> -inf sentinel."""
    BN = graph.block_nodes
    sel = (graph.blk_dst_local[:, None, :]
           == jax.lax.broadcasted_iota(jnp.int32, (1, BN, 1), 1))
    sel = sel & graph.blk_mask[:, None, :]
    expanded = jnp.where(sel[..., None], blk_values[:, None, :, :], _NEG_INF)
    out = expanded.max(axis=2).reshape(graph.nodes_pad, -1)
    if spill_values is not None:
        spill_dst = jnp.take(graph.edge_dst, graph.spill_perm, axis=0)
        sp = segment_max(spill_values, spill_dst, graph.nodes_pad,
                         mask=graph.spill_mask)
        out = jnp.maximum(out, sp)
    return out


def aggregate_edge_values(
    graph: GraphBatch,
    edge_values: jax.Array,       # [E, D] flat per-edge values
    reduce: str = "sum",
) -> jax.Array:
    """Layout-dispatching replacement for ``scatter_edges_to_nodes``: uses the
    MXU dense/blocked paths when the batch carries them, else the XLA segment
    path. Returns [nodes_pad, D]."""
    from graphvqa_tpu.ops.segment import scatter_edges_to_nodes
    if graph.has_dense_layout:
        from graphvqa_tpu.ops.dense import dense_aggregate_edges
        return dense_aggregate_edges(graph, edge_values, reduce=reduce)
    if not graph.has_blocked_layout:
        return scatter_edges_to_nodes(
            edge_values, graph.edge_dst, graph.nodes_pad,
            edge_mask=graph.edge_mask, reduce=reduce)
    blk_vals = jnp.take(edge_values, graph.blk_edge_perm, axis=0)
    blk_vals = jnp.where(graph.blk_mask[..., None], blk_vals, 0.0)
    spill_vals = jnp.take(edge_values, graph.spill_perm, axis=0)
    spill_vals = jnp.where(graph.spill_mask[..., None], spill_vals, 0.0)
    total = blocked_segment_sum(graph, blk_vals, spill_vals)
    if reduce == "sum":
        return total
    if reduce == "mean":
        ones_blk = graph.blk_mask[..., None].astype(total.dtype)
        ones_sp = graph.spill_mask[..., None].astype(total.dtype)
        counts = blocked_segment_sum(graph, ones_blk, ones_sp)
        return total / jnp.maximum(counts, 1.0)
    raise ValueError(f"unknown reduce: {reduce}")


def blocked_gat_aggregate(
    graph: GraphBatch,
    xw: jax.Array,          # [N, H, C] projected node features
    alpha_l: jax.Array,     # [N, H]
    alpha_r: jax.Array,     # [N, H]
    alpha_e: jax.Array,     # [E, H] per-edge scores (flat layout)
    negative_slope: float = 0.2,
    softmax_eps: float = 1e-16,
    return_alpha: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Fused GAT round on the blocked layout: SDDMM logits, destination
    softmax (two-pass, block + spill combined), and message aggregation.

    Returns (out [N, H, C], alpha_flat [E, H] attention weights in the flat
    edge order — for parity checks / attention dumps).
    """
    N, H, C = xw.shape
    nb, BE = graph.blk_src.shape
    BN = graph.block_nodes

    blk_dst_global = (graph.blk_dst_local
                      + jax.lax.broadcasted_iota(jnp.int32, (nb, BE), 0) * BN)

    def logits_of(src_idx, dst_idx, e_perm, mask):
        lg = (jnp.take(alpha_l, src_idx, axis=0)
              + jnp.take(alpha_r, dst_idx, axis=0)
              + jnp.take(alpha_e, e_perm, axis=0))
        lg = jax.nn.leaky_relu(lg, negative_slope)
        return jnp.where(mask[..., None], lg, _NEG_INF)

    blk_logits = logits_of(graph.blk_src, blk_dst_global,
                           graph.blk_edge_perm, graph.blk_mask)  # [nb, BE, H]

    # fully fused Pallas round: softmax + aggregation in one kernel pass —
    # valid only when no edge spilled (softmax completeness per block) and
    # without attention dropout / alpha observability
    if (_use_pallas() and not graph.has_spill and dropout_rate == 0.0
            and not return_alpha):
        from graphvqa_tpu.ops.pallas.fused_gat import pallas_fused_gat_round
        xw_cm = jnp.transpose(xw, (0, 2, 1)).reshape(N, C * H)
        feats = jnp.take(xw_cm, graph.blk_src, axis=0).reshape(nb, BE, H * C)
        out_cm = pallas_fused_gat_round(
            graph.blk_dst_local, blk_logits, feats, graph.block_nodes)
        out = jnp.transpose(out_cm.reshape(N, C, H), (0, 2, 1))
        return out, None
    spill_src = jnp.take(graph.edge_src, graph.spill_perm, axis=0)
    spill_dst = jnp.take(graph.edge_dst, graph.spill_perm, axis=0)
    spill_logits = logits_of(spill_src, spill_dst, graph.spill_perm,
                             graph.spill_mask)                    # [S, H]

    # pass 1: destination max (block ∪ spill)
    seg_max = blocked_segment_max(graph, blk_logits, spill_logits)  # [N, H]

    def exp_of(logits, dst_idx, mask):
        shifted = logits - jnp.take(seg_max, dst_idx, axis=0)
        shifted = jnp.where(mask[..., None], shifted, 0.0)
        return jnp.where(mask[..., None],
                         jnp.exp(jnp.minimum(shifted, 0.0)), 0.0)

    blk_exp = exp_of(blk_logits, blk_dst_global, graph.blk_mask)
    spill_exp = exp_of(spill_logits, spill_dst, graph.spill_mask)

    # pass 2: normalizer
    denom = blocked_segment_sum(graph, blk_exp, spill_exp) + softmax_eps

    blk_alpha = blk_exp / jnp.take(denom, blk_dst_global, axis=0)
    spill_alpha = spill_exp / jnp.take(denom, spill_dst, axis=0)

    if dropout_rate > 0.0 and dropout_rng is not None:
        kb, ks = jax.random.split(dropout_rng)
        keep = 1.0 - dropout_rate
        blk_alpha = blk_alpha * jax.random.bernoulli(
            kb, keep, blk_alpha.shape).astype(blk_alpha.dtype) / keep
        spill_alpha = spill_alpha * jax.random.bernoulli(
            ks, keep, spill_alpha.shape).astype(spill_alpha.dtype) / keep

    # message aggregation: [nb, BE, H*C] one-hot contraction + spill scatter
    spill_msgs = (jnp.take(xw, spill_src, axis=0)
                  * spill_alpha[..., None]).reshape(-1, H * C)
    if _use_pallas():
        from graphvqa_tpu.ops.pallas import pallas_blocked_aggregate
        # kernel wants head-interleaved (C-major) lanes — see its contract
        xw_cm = jnp.transpose(xw, (0, 2, 1)).reshape(N, C * H)
        feats = jnp.take(xw_cm, graph.blk_src, axis=0).reshape(nb, BE, H * C)
        out_cm = pallas_blocked_aggregate(
            graph.blk_dst_local, blk_alpha, feats, graph.block_nodes)
        out = jnp.transpose(out_cm.reshape(N, C, H), (0, 2, 1))
        spill_dst2 = jnp.take(graph.edge_dst, graph.spill_perm, axis=0)
        out = out.reshape(N, H * C) + segment_sum(
            spill_msgs, spill_dst2, N, mask=graph.spill_mask)
        out = out.reshape(N, H, C)
    else:
        blk_msgs = (jnp.take(xw, graph.blk_src, axis=0)
                    * blk_alpha[..., None]).reshape(nb, BE, H * C)
        out = blocked_segment_sum(graph, blk_msgs, spill_msgs).reshape(N, H, C)

    if not return_alpha:
        return out, None
    # flat-order alpha for observability: scatter block+spill back by perm
    alpha_flat = jnp.zeros((graph.edges_pad, H), blk_alpha.dtype)
    alpha_flat = alpha_flat.at[graph.blk_edge_perm.reshape(-1)].set(
        blk_alpha.reshape(-1, H), mode="drop")
    alpha_flat = alpha_flat.at[graph.spill_perm].set(spill_alpha, mode="drop")
    alpha_flat = jnp.where(graph.edge_mask[:, None], alpha_flat, 0.0)
    return out, alpha_flat
