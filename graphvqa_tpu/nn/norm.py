"""Masked BatchNorm over concatenated batched-graph nodes.

The reference applies ``torch.nn.BatchNorm1d`` directly to the concatenated
node tensor between message-passing rounds (reference: gat_skip.py:235,273-276)
— batch statistics couple all graphs in the batch. With padded static batching
the padded rows must be excluded from the statistics, hence this masked
variant. Running stats live in the flax ``batch_stats`` collection.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.1          # torch BatchNorm1d default
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                       # [N, C]
        mask: Optional[jax.Array] = None,   # [N] bool
        use_running_average: bool = False,
    ) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # one fused pass over x: sum and sum-of-squares together
            # (var = E[x^2] - E[x]^2), instead of a second centered pass —
            # the stats read the [N, C] array once at HBM speed
            xf = x.astype(jnp.float32)
            if mask is None:
                count = jnp.asarray(x.shape[0], jnp.float32)
                s1 = xf.sum(axis=0)
                s2 = (xf * xf).sum(axis=0)
            else:
                m = mask.astype(jnp.float32)[:, None]
                count = jnp.maximum(m.sum(), 1.0)
                xm = xf * m
                s1 = xm.sum(axis=0)
                s2 = (xm * xf).sum(axis=0)
            mean = s1 / count
            var = jnp.maximum(s2 / count - mean * mean, 0.0)
            if not self.is_initializing():
                # torch tracks *unbiased* variance in running stats
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        out = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        if mask is not None:
            out = jnp.where(mask[:, None], out, 0.0)
        return out.astype(self.dtype)
