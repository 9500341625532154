"""Dense transformer stacks for question encoding / program decoding.

TPU-native replacement for the reference's cuDNN-backed ``nn.TransformerEncoder/
Decoder`` blocks (K8; reference: pipeline_model_gat.py:334-341,458-459,537-538).
The math is the classic **post-LN** torch layer (attn -> add -> LN ->
FFN(ReLU) -> add -> LN, final LN on stack output) so checkpoints/activations
are comparable, but the layout is batch-first [B, L, D] and everything lowers
to large fused MXU matmuls under XLA.

Like the reference, no key-padding masks are applied to question memory — pad
positions participate in attention (their embeddings are zero but position
encodings are not); replicated deliberately for activation parity.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
# weight and bias. Using the same family keeps activation scales comparable.
def _torch_linear_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    """nn.Dense with torch's default uniform init (for scale parity)."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", _torch_linear_init, (fan_in, self.features))
        y = jnp.dot(x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", _torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """[L, L] additive mask: 0 on/below diagonal, -inf above (reference:
    pipeline_model_gat.py:347-354 generate_square_subsequent_mask)."""
    return jnp.where(
        jnp.tril(jnp.ones((length, length), bool)), 0.0, -jnp.inf
    ).astype(dtype)


class MultiheadAttention(nn.Module):
    """Torch-style MHA: packed in-proj, scaled dot product, out-proj.

    Attention-weight dropout matches torch's placement (after softmax).
    """
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,            # [B, Lq, D]
        key: jax.Array,              # [B, Lk, D]
        value: jax.Array,            # [B, Lk, D]
        attn_mask: Optional[jax.Array] = None,  # [Lq, Lk] additive
        deterministic: bool = True,
    ) -> jax.Array:
        d, h = self.embed_dim, self.num_heads
        head_dim = d // h
        assert head_dim * h == d

        q = TorchLinear(d, dtype=self.dtype, name="q_proj")(query)
        k = TorchLinear(d, dtype=self.dtype, name="k_proj")(key)
        v = TorchLinear(d, dtype=self.dtype, name="v_proj")(value)

        def split(x):  # [B, L, D] -> [B, h, L, hd]
            b, l, _ = x.shape
            return x.reshape(b, l, h, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32) / math.sqrt(head_dim)
        if attn_mask is not None:
            scores = scores + attn_mask[None, None, :, :]
        weights = jax.nn.softmax(scores, axis=-1)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        b, _, lq, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
        return TorchLinear(d, dtype=self.dtype, name="out_proj")(out)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, deterministic=True):
        attn = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                                  self.dtype, name="self_attn")(
            src, src, src, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(src)
        ff = TorchLinear(self.ffn_dim, dtype=self.dtype, name="linear1")(src)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = TorchLinear(self.d_model, dtype=self.dtype, name="linear2")(ff)
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(name="norm2")(src)


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, deterministic=True):
        attn = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                                  self.dtype, name="self_attn")(
            tgt, tgt, tgt, attn_mask=tgt_mask, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1")(tgt)
        cross = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                                   self.dtype, name="cross_attn")(
            tgt, memory, memory, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(cross, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(tgt)
        ff = TorchLinear(self.ffn_dim, dtype=self.dtype, name="linear1")(tgt)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = TorchLinear(self.d_model, dtype=self.dtype, name="linear2")(ff)
        tgt = tgt + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(name="norm3")(tgt)


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, deterministic=True):
        x = src
        for i in range(self.num_layers):
            x = EncoderLayer(self.d_model, self.num_heads, self.ffn_dim,
                             self.dropout, self.dtype, name=f"layer_{i}")(
                x, deterministic=deterministic)
        return nn.LayerNorm(name="final_norm")(x)


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, deterministic=True):
        x = tgt
        for i in range(self.num_layers):
            x = DecoderLayer(self.d_model, self.num_heads, self.ffn_dim,
                             self.dropout, self.dtype, name=f"layer_{i}")(
                x, memory, tgt_mask=tgt_mask, deterministic=deterministic)
        return nn.LayerNorm(name="final_norm")(x)


class PositionalEncoding(nn.Module):
    """Sinusoidal positions + dropout (reference: pipeline_model_gat.py:297-313)."""
    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    def setup(self):
        position = jnp.arange(self.max_len, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
                           * (-math.log(10000.0) / self.d_model))
        pe = jnp.zeros((self.max_len, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
        self.pe = pe
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, deterministic=True):
        # x: [B, L, D]
        x = x + self.pe[None, : x.shape[1], :]
        return self.drop(x, deterministic=deterministic)
