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
        # cast the input too: a mixed f32 x bf16 dot upcasts and misses the
        # MXU's native bf16 path (and leaks f32 into downstream bf16 buffers)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
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


def block_causal_mask(blocks: int, length: int,
                      dtype=jnp.float32) -> jax.Array:
    """[blocks*length]² additive mask: causal within each diagonal block,
    -inf across blocks — packs ``blocks`` independent causal sequences into
    one attention call (ProgramDecoder's M instruction streams)."""
    allowed = jnp.kron(jnp.eye(blocks, dtype=jnp.int32),
                       jnp.tril(jnp.ones((length, length), jnp.int32)))
    return jnp.where(allowed > 0, 0.0, -jnp.inf).astype(dtype)


class MultiheadAttention(nn.Module):
    """Torch-style MHA: separate q/k/v projections, scaled dot product,
    out-proj. (Torch packs the three into one ``in_proj_weight`` [3D, D];
    a torch-checkpoint converter must split that tensor into q/k/v thirds,
    in that order, to populate these params.)

    Attention-weight dropout matches torch's placement (after softmax).
    Besides the full ``__call__``, exposes an incremental path for greedy
    decoding: ``project_kv`` computes head-split key/value tensors once and
    ``attend_step`` runs one query position against a (possibly growing)
    key/value buffer — the KV-cache building block used by
    ``TransformerDecoder.decode_step``.
    """
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.embed_dim
        self.q_proj = TorchLinear(d, dtype=self.dtype, name="q_proj")
        self.k_proj = TorchLinear(d, dtype=self.dtype, name="k_proj")
        self.v_proj = TorchLinear(d, dtype=self.dtype, name="v_proj")
        self.out_proj = TorchLinear(d, dtype=self.dtype, name="out_proj")
        self.attn_drop = nn.Dropout(self.dropout)

    @property
    def head_dim(self) -> int:
        assert self.embed_dim % self.num_heads == 0
        return self.embed_dim // self.num_heads

    def _split(self, x):  # [B, L, D] -> [B, h, L, hd]
        b, l, _ = x.shape
        return x.reshape(b, l, self.num_heads, self.head_dim).transpose(
            0, 2, 1, 3)

    def __call__(
        self,
        query: jax.Array,            # [B, Lq, D]
        key: jax.Array,              # [B, Lk, D]
        value: jax.Array,            # [B, Lk, D]
        attn_mask: Optional[jax.Array] = None,  # [Lq, Lk] additive
        deterministic: bool = True,
    ) -> jax.Array:
        q = self._split(self.q_proj(query))
        k = self._split(self.k_proj(key))
        v = self._split(self.v_proj(value))
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            preferred_element_type=jnp.float32) / math.sqrt(self.head_dim)
        if attn_mask is not None:
            scores = scores + attn_mask[None, None, :, :]
        weights = jax.nn.softmax(scores, axis=-1)
        weights = self.attn_drop(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        b, _, lq, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.embed_dim)
        return self.out_proj(out)

    def project_kv(self, key: jax.Array, value: jax.Array):
        """Head-split K/V for a fixed memory — compute once per decode."""
        return self._split(self.k_proj(key)), self._split(self.v_proj(value))

    def project_kv_step(self, x_t: jax.Array):
        """K/V for one new token position. x_t: [B, D] -> ([B,h,hd], [B,h,hd])."""
        b = x_t.shape[0]
        shape = (b, self.num_heads, self.head_dim)
        return (self.k_proj(x_t).reshape(shape), self.v_proj(x_t).reshape(shape))

    def attend_step(
        self,
        q_t: jax.Array,                       # [B*g, D] single query position
        k: jax.Array,                          # [B, h, Lk, hd]
        v: jax.Array,                          # [B, h, Lk, hd]
        key_mask: Optional[jax.Array] = None,  # [Lk] additive (0 / -inf)
        group: int = 1,
    ) -> jax.Array:
        """``group=g`` attends g query rows against each K/V batch row
        (b-major expansion — the grouped-cross-attention decode analog of
        DecoderLayer's ``memory_group``)."""
        bg = q_t.shape[0]
        q = self.q_proj(q_t).reshape(bg // group, group, self.num_heads,
                                     self.head_dim)
        scores = jnp.einsum(
            "bghd,bhkd->bghk", q, k,
            preferred_element_type=jnp.float32) / math.sqrt(self.head_dim)
        if key_mask is not None:
            scores = scores + key_mask[None, None, None, :]
        weights = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bghk,bhkd->bghd", weights.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return self.out_proj(out.reshape(bg, self.embed_dim))


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
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)
        ff = TorchLinear(self.ffn_dim, dtype=self.dtype, name="linear1")(src)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = TorchLinear(self.d_model, dtype=self.dtype, name="linear2")(ff)
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, self.dtype,
            name="self_attn")
        self.cross_attn = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, self.dtype,
            name="cross_attn")
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")
        self.linear1 = TorchLinear(self.ffn_dim, dtype=self.dtype,
                                   name="linear1")
        self.linear2 = TorchLinear(self.d_model, dtype=self.dtype,
                                   name="linear2")
        self.drop = nn.Dropout(self.dropout)

    def _ffn(self, x, deterministic):
        ff = self.linear1(x)
        ff = nn.relu(ff)
        ff = self.drop(ff, deterministic=deterministic)
        return self.linear2(ff)

    def __call__(self, tgt, memory, tgt_mask=None, deterministic=True):
        attn = self.self_attn(tgt, tgt, tgt, attn_mask=tgt_mask,
                              deterministic=deterministic)
        tgt = tgt + self.drop(attn, deterministic=deterministic)
        tgt = self.norm1(tgt)
        cross = self.cross_attn(tgt, memory, memory,
                                deterministic=deterministic)
        tgt = tgt + self.drop(cross, deterministic=deterministic)
        tgt = self.norm2(tgt)
        tgt = tgt + self.drop(self._ffn(tgt, deterministic),
                              deterministic=deterministic)
        return self.norm3(tgt)

    def decode_step(self, x_t, self_kv, cross_kv, t, key_mask,
                    memory_group: int = 1):
        """One greedy-decode step for this layer.

        x_t: [B, D] hidden at the newest position (index ``t``).
        self_kv: (k, v) cache buffers [B, h, T, hd]; entry ``t`` is written
        from ``x_t`` before attending. cross_kv: precomputed memory K/V
        (unexpanded batch when ``memory_group`` > 1 — K/V projected once
        per memory row, not once per expanded row).
        key_mask: [T] additive mask hiding cache entries > ``t``.
        Returns (y_t [B, D], updated self_kv). Deterministic (eval path).
        """
        k_buf, v_buf = self_kv
        k_t, v_t = self.self_attn.project_kv_step(x_t)
        k_buf = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k_t[:, :, None, :], t, axis=2)
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v_t[:, :, None, :], t, axis=2)
        attn = self.self_attn.attend_step(x_t, k_buf, v_buf, key_mask)
        x = self.norm1(x_t + attn)
        cross = self.cross_attn.attend_step(x, *cross_kv,
                                            group=memory_group)
        x = self.norm2(x + cross)
        x = x + self._ffn(x, deterministic=True)
        return self.norm3(x), (k_buf, v_buf)


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
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="final_norm")(x)


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            DecoderLayer(self.d_model, self.num_heads, self.ffn_dim,
                         self.dropout, self.dtype, name=f"layer_{i}")
            for i in range(self.num_layers)]
        self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name="final_norm")

    def __call__(self, tgt, memory, tgt_mask=None, deterministic=True):
        x = tgt
        for layer in self.layers:
            x = layer(x, memory, tgt_mask=tgt_mask,
                      deterministic=deterministic)
        return self.final_norm(x)

    # -- incremental (KV-cached) greedy-decode path ------------------------
    # The reference's greedy loop re-runs the whole decoder stack per emitted
    # token (pipeline_model_gat.py:423-443). The TPU-shaped replacement is a
    # compiled loop over decode_step: cross-attention K/V are projected once
    # per decode, self-attention K/V accumulate in per-layer static buffers.

    def init_cache(self, batch: int, max_len: int):
        """Zeroed per-layer self-attention K/V buffers [B, h, T, hd]."""
        h = self.num_heads
        hd = self.d_model // h
        shape = (batch, h, max_len, hd)
        zero = jnp.zeros(shape, self.dtype)
        return tuple((zero, zero) for _ in range(self.num_layers))

    def precompute_cross_kv(self, memory: jax.Array):
        """Per-layer head-split memory K/V, computed once per decode."""
        return tuple(layer.cross_attn.project_kv(memory, memory)
                     for layer in self.layers)

    def decode_step(self, x_t, cache, cross_kvs, t, memory_group: int = 1):
        """Run one position through all layers. x_t: [B, D] embedding at
        position ``t``. Returns (normed output [B, D], updated cache).
        ``memory_group``: see DecoderLayer.decode_step."""
        max_len = cache[0][0].shape[2]
        key_mask = jnp.where(jnp.arange(max_len) <= t, 0.0, -jnp.inf
                             ).astype(self.dtype)
        new_cache = []
        for layer, self_kv, cross_kv in zip(self.layers, cache, cross_kvs):
            x_t, self_kv = layer.decode_step(x_t, self_kv, cross_kv, t,
                                             key_mask,
                                             memory_group=memory_group)
            new_cache.append(self_kv)
        return self.final_norm(x_t), tuple(new_cache)


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
        # x: [B, L, D]; pe cast to x's dtype so the bf16 path stays bf16
        # (f32 + bf16 promotes to f32 and drags the whole stack up)
        x = x + self.pe[None, : x.shape[1], :].astype(x.dtype)
        return self.drop(x, deterministic=deterministic)
