"""Token embedding with hard-zero padding row.

Equivalent of ``torch.nn.Embedding(..., padding_idx=pad)`` (reference:
pipeline_model_gat.py:562,633): the pad token embeds to an exact zero vector.
Torch achieves this by zero-init + zeroed gradients; here we multiply the
lookup by a pad mask, which keeps the row identically zero under any optimizer
and lets the GloVe *sum* over object-token slots (pipeline_model_gat.py:585)
ignore padding for free.

``bag_sum`` is the TPU-native path for the scene-graph side's
sum-over-token-slots (pipeline_model_gat.py:585,594): TPU gathers/scatters
serialize row updates (~40 ns/row, ROOFLINE.md), and the profiled production
train step spent ~13 ms gathering + ~19 ms scatter-adding embedding rows for
the ~500k node/edge token slots. Summing each row's token embeddings is
linear in the embedding table, so it is EXACTLY a counts-matrix matmul:

    counts[n, v] = #slots of row n holding token v (pad excluded)
    out          = counts @ table

— one [N, V] x [V, D] MXU contraction forward and its transpose backward
(scatter-free gradient for the table). Exact up to fp reassociation at f32;
at bfloat16 the table rounds to bf16 before the dot (counts up to the slot
width are exact in bf16), matching the engine's compute dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class PaddedEmbed(nn.Module):
    vocab_size: int
    features: int
    pad_idx: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embedding = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),  # torch Embedding default N(0,1)
            (self.vocab_size, self.features),
            self.dtype,
        )

    def __call__(self, ids: jax.Array) -> jax.Array:
        out = jnp.take(self.embedding, ids, axis=0)
        return out * (ids != self.pad_idx)[..., None].astype(out.dtype)

    def bag_sum(self, ids: jax.Array,
                compute_dtype: jnp.dtype = jnp.float32) -> jax.Array:
        """Sum of token embeddings over the trailing slot axis,
        ``[N, T] -> [N, D]``, as a counts-matrix matmul (see module
        docstring). Pad tokens contribute nothing (PaddedEmbed semantics)."""
        N, T = ids.shape
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, self.vocab_size), 2)
        sel = (ids[:, :, None] == iota) & (ids != self.pad_idx)[:, :, None]
        counts = sel.sum(axis=1).astype(compute_dtype)       # [N, V]
        out = jnp.dot(counts, self.embedding.astype(compute_dtype),
                      preferred_element_type=jnp.float32)
        return out.astype(compute_dtype)
