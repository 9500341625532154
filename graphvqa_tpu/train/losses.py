"""Loss kernels — the criterion dict of the reference trainer.

Reference: mainExplain_gat.py:319-326 builds
  {program: CE(ignore_index=pad), full_answer: CE(ignore_index=pad),
   short_answer: CE, execution_bitmap: BCE}
and composes them per model family: the GAT driver optimizes short-answer CE
only, with a zero-weighted program term to keep unused parameters alive under
DDP (mainExplain_gat.py:542) — in JAX the zero-weighted term is unnecessary
(dead branches simply get zero gradients), but the composition flags mirror
the variants (mainExplain_gcn.py:540 adds program loss).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from graphvqa_tpu.models.pipeline import ModelOutput


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax CE (torch.nn.CrossEntropyLoss default reduction)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -picked.mean()


def masked_token_cross_entropy(
    logits: jax.Array,      # [B, L, V]
    targets: jax.Array,     # [B, L]
    pad_idx: int,
) -> jax.Array:
    """Token CE averaged over non-pad targets (CE with ignore_index=pad,
    mainExplain_gat.py:321-322 + the flatten at :520-526)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != pad_idx).astype(picked.dtype)
    return (picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def bitmap_bce(
    bitmap_pred: jax.Array,   # [N, steps] probabilities in (0, 1)
    bitmap_true: jax.Array,   # [N, steps]
    node_mask: jax.Array,     # [N]
    eps: float = 1e-7,
) -> jax.Array:
    """torch.nn.BCELoss over real nodes (mainExplain_gat.py:325,504)."""
    p = jnp.clip(bitmap_pred, eps, 1.0 - eps)
    per = -(bitmap_true * jnp.log(p) + (1.0 - bitmap_true) * jnp.log1p(-p))
    m = node_mask.astype(per.dtype)
    denom = jnp.maximum(m.sum() * per.shape[1], 1.0)  # mean over real nodes x steps
    return (per * m[:, None]).sum() / denom


def total_loss(
    out: ModelOutput,
    programs_target: jax.Array,       # [B*M, L-1]
    full_answers_target: Optional[jax.Array],
    short_answer_label: jax.Array,
    pad_idx: int,
    bitmap_true: Optional[jax.Array] = None,
    node_mask: Optional[jax.Array] = None,
    use_program_loss: bool = False,
    use_full_answer_loss: bool = False,
    use_bitmap_loss: bool = False,
) -> tuple[jax.Array, Dict[str, jax.Array]]:
    parts: Dict[str, jax.Array] = {}
    parts["short_answer"] = cross_entropy(out.short_answer_logits,
                                          short_answer_label)
    loss = parts["short_answer"]
    if use_program_loss and out.program_logits is not None:
        parts["program"] = masked_token_cross_entropy(
            out.program_logits, programs_target, pad_idx)
        loss = loss + parts["program"]
    if (use_full_answer_loss and out.full_answer_logits is not None
            and full_answers_target is not None):
        parts["full_answer"] = masked_token_cross_entropy(
            out.full_answer_logits, full_answers_target, pad_idx)
        loss = loss + parts["full_answer"]
    if use_bitmap_loss and out.execution_bitmap is not None:
        parts["execution_bitmap"] = bitmap_bce(
            out.execution_bitmap, bitmap_true, node_mask)
        loss = loss + parts["execution_bitmap"]
    parts["total"] = loss
    return loss, parts
