"""In-graph metric kernels (batch-first layout).

TPU-resident equivalents of the reference's GPU metric helpers:
  * ``topk_accuracy`` — mainExplain_gat.py:996-1010
  * ``string_exact_match_acc`` — mainExplain_gat.py:576-605
  * ``program_string_exact_match_acc`` (+ 5-way group and non-empty rates) —
    mainExplain_gat.py:619-672

Each returns (correct_count, denominator) pairs rather than percentages so
callers can all-reduce across data shards before dividing.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def topk_accuracy(logits: jax.Array, labels: jax.Array, k: int = 1
                  ) -> Tuple[jax.Array, jax.Array]:
    """[B, C] logits vs [B] labels -> (num_correct, batch)."""
    _, topi = jax.lax.top_k(logits, k)
    correct = jnp.any(topi == labels[:, None], axis=-1)
    return correct.sum(), jnp.asarray(labels.shape[0])


def _sequence_match(predictions: jax.Array, target: jax.Array,
                    padding_idx: int) -> jax.Array:
    """[B, L] exact match per row: token equal OR target is pad."""
    L = target.shape[1]
    preds = predictions[:, :L]
    ok = (preds == target) | (target == padding_idx)
    return jnp.all(ok, axis=1)


def string_exact_match_acc(predictions: jax.Array, target: jax.Array,
                           padding_idx: int = 1
                           ) -> Tuple[jax.Array, jax.Array]:
    match = _sequence_match(predictions, target, padding_idx)
    return match.sum(), jnp.asarray(target.shape[0])


def program_match_vectors(
    predictions: jax.Array,    # [B*M, L]
    target: jax.Array,         # [B*M, L]
    padding_idx: int = 1,
    group_size: int = 5,
):
    """Per-row program match signals, so callers can mask padded/replicated
    tail rows before counting (validate pads ragged final batches by
    replication; counts must cover real rows only — the reference never pads,
    mainExplain_gat.py:619-672 operates on exact batches).

    Returns (match [B*M] bool, group_match [B] bool, empty_and_match [B*M]
    bool). Empty-instruction detection follows the reference: an instruction
    whose target position 2 is already padding (only <start> <end> remain
    after the shift) counts as empty (mainExplain_gat.py:655-663).
    """
    match = _sequence_match(predictions, target, padding_idx)
    group_match = jnp.all(match.reshape(-1, group_size), axis=1)
    empty = (target[:, 2] == padding_idx) & match
    return match, group_match, empty


def program_string_exact_match_acc(
    predictions: jax.Array,    # [B*M, L]
    target: jax.Array,         # [B*M, L]
    padding_idx: int = 1,
    group_size: int = 5,
):
    """Returns ((instr_correct, instr_total), (group_correct, group_total),
    (non_empty_correct, non_empty_total)). See program_match_vectors."""
    match, group_match, empty = program_match_vectors(
        predictions, target, padding_idx, group_size)
    total = target.shape[0]
    non_empty_correct = match.sum() - empty.sum()
    non_empty_total = total - empty.sum()
    return ((match.sum(), jnp.asarray(total)),
            (group_match.sum(), jnp.asarray(total // group_size)),
            (non_empty_correct, non_empty_total))


# Count-style metric keys (summed when reducing over the K inner steps of a
# steps-per-dispatch lax.scan); everything else is a loss scalar (meaned —
# equal-size batches) except lr (last). NOTE "total" alone is the total LOSS,
# not a count.
SCAN_COUNT_KEYS = frozenset({
    "short_answer_correct", "short_answer_total", "program_correct",
    "program_total", "program_group_correct", "program_group_total",
    "program_nonempty_correct", "program_nonempty_total", "bitmap_tp",
    "bitmap_pred_total", "bitmap_true_total", "edge_count"})


def reduce_scanned_metrics(ms: dict) -> dict:
    """Reduce a [K, ...]-stacked metrics dict (one row per inner step of a
    steps-per-dispatch scan) to the same shape one dispatch reports."""
    out = {}
    for key, v in ms.items():
        if key == "lr":
            out[key] = v[-1]
        elif key in SCAN_COUNT_KEYS:
            out[key] = v.sum(axis=0)
        else:
            out[key] = v.mean(axis=0)
    return out
