"""XLA-native segment primitives: the sparse engine's reference path.

These are the TPU-native equivalents of the CUDA kernels the reference imports
(SURVEY.md §2.2): ``torch_scatter.scatter_add/scatter_mean`` (K1),
``torch_geometric.utils.softmax`` segment softmax (K3), and the
``MessagePassing.propagate`` gather/scatter machinery (K4).

All functions assume the flat padded layout of
:class:`graphvqa_tpu.core.graph.GraphBatch`: edges sorted by destination so
segment reductions are contiguous runs (XLA lowers ``segment_sum`` with
``indices_are_sorted=True`` to an efficient scan; the Pallas kernels in
``ops/pallas`` exploit the same layout for the fused hot path).

Masking convention: callers pass a boolean ``mask``; masked lanes contribute
zero to sums and ``-inf`` to maxes/softmax numerators. Padded indices are
in-bounds by construction so gathers never clamp.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30
_SOFTMAX_EPS = 1e-16  # matches torch_geometric.utils.softmax's +1e-16 denominator


def _mask_up(mask: Optional[jax.Array], ref: jax.Array) -> Optional[jax.Array]:
    """Broadcast a [E]-mask against a [E, ...] value array."""
    if mask is None:
        return None
    return mask.reshape(mask.shape + (1,) * (ref.ndim - mask.ndim))


def segment_sum(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum of ``values`` rows per segment (torch_scatter.scatter_add, K1)."""
    if mask is not None:
        values = jnp.where(_mask_up(mask, values), values, 0)
    return jax.ops.segment_sum(
        values, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_mean(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Mean per segment (torch_scatter.scatter_mean, K1). Empty segments -> 0."""
    if mask is not None:
        ones = mask.astype(values.dtype)
    else:
        ones = jnp.ones(segment_ids.shape, dtype=values.dtype)
    total = segment_sum(values, segment_ids, num_segments, mask, indices_are_sorted)
    count = jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (total.ndim - count.ndim))


def segment_max(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Max per segment; empty segments -> -inf sentinel."""
    if mask is not None:
        values = jnp.where(_mask_up(mask, values), values, _NEG_INF)
    return jax.ops.segment_max(
        values, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Numerically-stable softmax within each segment.

    TPU-native equivalent of ``torch_geometric.utils.softmax`` (K3; used at
    gat_skip.py:188, pipeline_model_gat.py:178,284, lcgn.py:212): per-segment
    max-subtract, exp, segment-sum, divide with the same +1e-16 denominator.
    Masked lanes return 0.
    """
    seg_max = segment_max(logits, segment_ids, num_segments, mask, indices_are_sorted)
    # Empty segments hold -inf sentinels; clamp the masked lanes *before* exp
    # so no inf/NaN ever enters a where() (reverse-mode AD turns inf*0 into
    # NaN even when the forward value is masked out).
    shifted = logits - jnp.take(seg_max, segment_ids, axis=0)
    if mask is not None:
        shifted = jnp.where(_mask_up(mask, shifted), shifted, 0.0)
    expd = jnp.exp(jnp.minimum(shifted, 0.0))
    if mask is not None:
        expd = jnp.where(_mask_up(mask, expd), expd, 0.0)
    denom = jax.ops.segment_sum(
        expd, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    denom = jnp.take(denom, segment_ids, axis=0) + _SOFTMAX_EPS
    out = expd / denom
    if mask is not None:
        out = jnp.where(_mask_up(mask, out), out, 0.0)
    return out


def gather_nodes(node_values: jax.Array, edge_index: jax.Array) -> jax.Array:
    """Per-edge gather ``x_j = x[edge_index]`` (the gather half of K4)."""
    return jnp.take(node_values, edge_index, axis=0)


def scatter_edges_to_nodes(
    edge_values: jax.Array,
    edge_dst: jax.Array,
    num_nodes: int,
    edge_mask: Optional[jax.Array] = None,
    reduce: str = "sum",
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Aggregate per-edge messages into destination nodes (the scatter half of
    K4; SpMM accumulate). ``edge_dst`` is sorted by construction."""
    if reduce == "sum":
        return segment_sum(edge_values, edge_dst, num_nodes, edge_mask,
                           indices_are_sorted=indices_are_sorted)
    if reduce == "mean":
        return segment_mean(edge_values, edge_dst, num_nodes, edge_mask,
                            indices_are_sorted=indices_are_sorted)
    raise ValueError(f"unknown reduce: {reduce}")
