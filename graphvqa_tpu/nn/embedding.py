"""Token embedding with hard-zero padding row.

Equivalent of ``torch.nn.Embedding(..., padding_idx=pad)`` (reference:
pipeline_model_gat.py:562,633): the pad token embeds to an exact zero vector.
Torch achieves this by zero-init + zeroed gradients; here we multiply the
lookup by a pad mask, which keeps the row identically zero under any optimizer
and lets the GloVe *sum* over object-token slots (pipeline_model_gat.py:585)
ignore padding for free.
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

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),  # torch Embedding default N(0,1)
            (self.vocab_size, self.features),
            self.dtype,
        )
        out = jnp.take(table, ids, axis=0)
        return out * (ids != self.pad_idx)[..., None].astype(out.dtype)
