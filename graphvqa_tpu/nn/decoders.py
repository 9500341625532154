"""Program and full-answer decoders.

Program decoder (reference: TransformerProgramDecoder,
pipeline_model_gat.py:317-445) is two-stage "hierarchical":
  1. coarse, non-autoregressive: M=5 learned query embeddings cross-attend to
     the question memory (no causal mask) -> instruction vectors [M, B, D];
  2. fine, autoregressive (teacher-forced): the batch is expanded M-fold, the
     <start> token's embedding is *replaced* by the matching instruction
     vector, and a causal-masked decoder predicts the program tokens.

Greedy sampling is a single compiled `lax.fori_loop` with **KV caching**:
cross-attention K/V over the question memory are projected once per decode and
self-attention K/V accumulate in static per-layer buffers, so each emitted
token costs one decoder-layer stack pass over one position — versus the
reference's Python loop that re-runs the full decoder stack at full length for
every token (pipeline_model_gat.py:423-443). Same greedy outputs, O(T) instead
of O(T^2) stack passes.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphvqa_tpu.nn.embedding import PaddedEmbed
from graphvqa_tpu.nn.transformer import (
    PositionalEncoding, TorchLinear, TransformerDecoder, block_causal_mask,
    causal_mask)


def _greedy_token(logits: jax.Array, pad_idx: int, sos_idx: int) -> jax.Array:
    """Argmax over *emittable* tokens: ``<pad>`` and ``<start>`` never appear
    at a supervised target position (targets are the shifted program/answer
    streams, where pad only pads after ``<end>`` and is masked out of the CE),
    so their logits receive no down-weighting gradient and raw argmax can tip
    into them — most visibly in bf16 where near-ties are common. The torch
    reference argmaxes the raw logits (pipeline_model_gat.py:441) and merely
    never *hit* this at its training scale; masking the two never-valid
    specials is the semantically-correct greedy step. ``<unk>`` stays
    emittable (a legal target for OOV words). NaN guard: argmax of an
    all-masked/-NaN row would silently emit 0 (= ``<unk>``); keep that
    behavior but make the mask explicit."""
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    logits = logits.at[..., pad_idx].set(neg).at[..., sos_idx].set(neg)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


class ProgramDecoder(nn.Module):
    text_embed: PaddedEmbed      # shared text embedding
    vocab_size: int
    num_queries: int = 5         # M == MAX_EXECUTION_STEP
    hidden_dim: int = 512
    num_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 3
    dropout: float = 0.1
    sos_idx: int = 2
    pad_idx: int = 1
    max_decode_len: int = 16     # pipeline_model_gat.py:416
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim))
        self.emb_proj = TorchLinear(self.hidden_dim, dtype=self.dtype,
                                    name="emb_proj")
        self.pos_encoder = PositionalEncoding(self.hidden_dim, self.dropout)
        self.coarse_decoder = TransformerDecoder(
            self.num_layers, self.hidden_dim, self.num_heads, self.ffn_dim,
            self.dropout, self.dtype, name="coarse_decoder")
        self.fine_decoder = TransformerDecoder(
            self.num_layers, self.hidden_dim, self.num_heads, self.ffn_dim,
            self.dropout, self.dtype, name="fine_decoder")
        self.vocab_decoder = TorchLinear(self.vocab_size, dtype=self.dtype,
                                         name="vocab_decoder")

    def _instruction_vectors(self, memory, deterministic):
        """Coarse stage -> (instr [M, B, D], flattened instr [B*M, D]).

        The flat ordering is (b0 s0..s4, b1 s0..s4, ...), matching the 5x
        flattened program stream (gqa_dataset_entry.py:659-663); neither
        consumer expands the memory any more (packed block-causal fine
        decode / grouped cross-KV sampling)."""
        B = memory.shape[0]
        queries = jnp.broadcast_to(
            self.query_embed[None], (B, self.num_queries, self.hidden_dim))
        instr = self.coarse_decoder(queries, memory, tgt_mask=None,
                                    deterministic=deterministic)  # [B, M, D]
        instr_flat = instr.reshape(B * self.num_queries, self.hidden_dim)
        instr_mbd = jnp.transpose(instr, (1, 0, 2))  # [M, B, D]
        return instr_mbd, instr_flat

    def _embed_program(self, tokens, instr_flat, deterministic):
        """Token embedding with the <start> slot replaced by the instruction
        vector (pipeline_model_gat.py:389-390)."""
        x = self.text_embed(tokens)                     # [B*M, L, 300]
        x = self.emb_proj(x) * math.sqrt(self.hidden_dim)
        x = self.pos_encoder(x, deterministic=deterministic)
        return jnp.concatenate([instr_flat[:, None, :], x[:, 1:]], axis=1)

    def __call__(
        self,
        memory: jax.Array,     # [B, Lq, D]
        tgt: jax.Array,        # [B*M, Lp] teacher-forcing input tokens
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        instr_mbd, instr_flat = self._instruction_vectors(
            memory, deterministic)
        x = self._embed_program(tgt, instr_flat, deterministic)
        BM, L, D = x.shape
        M = self.num_queries
        # The M instruction streams of one question PACK into one length-M*L
        # sequence under a block-diagonal causal mask — exact (masked
        # positions contribute exp(-inf)=0), and it replaces M*B tiny
        # [L, L] attention matmuls with B [M*L, M*L] ones (4-5x fewer MXU
        # launches at much better tile utilization) AND makes the memory
        # batch line up, so cross-attention K/V are projected once per
        # question with no repeat_interleave (the packed-form equivalent of
        # the reference's expansion at pipeline_model_gat.py:369).
        xp = x.reshape(BM // M, M * L, D)
        out = self.fine_decoder(xp, memory,
                                tgt_mask=block_causal_mask(M, L),
                                deterministic=deterministic)
        out = out.reshape(BM, L, D)
        logits = self.vocab_decoder(out)               # [B*M, L, V]
        return logits, instr_mbd

    def _embed_program_step(self, tokens: jax.Array, instr_flat: jax.Array,
                            t) -> jax.Array:
        """Embedding of one program position ``t`` (traced index); position 0
        is the raw instruction vector (no positional encoding), matching
        ``_embed_program``'s concat semantics."""
        x = self.text_embed(tokens[:, None])            # [BM, 1, 300]
        x = (self.emb_proj(x) * math.sqrt(self.hidden_dim))[:, 0, :]
        # cast the f32 positional row: bf16 + f32 would promote the whole
        # decode stack to f32 (same fix as PositionalEncoding.__call__)
        x = x + jnp.take(self.pos_encoder.pe, t, axis=0)[None, :].astype(
            x.dtype)
        return jnp.where(jnp.equal(t, 0), instr_flat.astype(x.dtype), x)

    def sample(
        self,
        memory: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """KV-cached greedy decode to ``max_decode_len``; returns token buffer
        [B*M, max_decode_len] (position 0 = <start>) and instruction vectors.

        Eval-only: the KV-cached step path applies no dropout, so a
        non-deterministic call would half-apply dropout (coarse stage only) —
        fail loudly instead."""
        assert deterministic, "sample() is eval-only (KV cache has no dropout)"
        instr_mbd, instr_flat = self._instruction_vectors(
            memory, deterministic)
        T = self.max_decode_len
        BM = instr_flat.shape[0]
        buf0 = jnp.full((BM, T), self.sos_idx, jnp.int32)
        # the loop writes cache positions 0..T-2 only (step t reads/writes
        # position t-1), so T-1 slots suffice
        cache0 = self.fine_decoder.init_cache(BM, T - 1)
        # grouped cross-KV: memory K/V projected once per question, shared
        # by its M instruction streams (exact vs repeat_interleave)
        cross_kvs = self.fine_decoder.precompute_cross_kv(memory)

        def step(carry, t):
            buf, cache = carry
            # feed position t-1 (tokens buf[:, t-1]) -> predict position t
            x_t = self._embed_program_step(buf[:, t - 1], instr_flat, t - 1)
            out, cache = self.fine_decoder.decode_step(
                x_t, cache, cross_kvs, t - 1,
                memory_group=self.num_queries)
            nxt = _greedy_token(self.vocab_decoder(out),
                                self.pad_idx, self.sos_idx)
            return (buf.at[:, t].set(nxt), cache), None

        # lax.scan, NOT lax.fori_loop: when a fori_loop decode is compiled
        # INTO the surrounding jit (instr vectors + cross-KV precompute in
        # the same XLA program), the TPU backend miscompiles the while loop
        # and every emitted token degenerates to id 0 — eager execution,
        # CPU jit, an unrolled loop, scan, and fori_loop behind an
        # optimization_barrier all agree with the teacher-forced oracle
        # (ROOFLINE.md "greedy-decode miscompile"). scan is the canonical
        # fixed-trip-count loop and compiles correctly everywhere.
        (buf, _), _ = jax.lax.scan(step, (buf0, cache0), jnp.arange(1, T))
        return buf, instr_mbd


class FullAnswerDecoder(nn.Module):
    """Natural-language full-answer decoder (reference:
    TransformerFullAnswerDecoder, pipeline_model_gat.py:450-525)."""
    text_embed: PaddedEmbed
    vocab_size: int
    hidden_dim: int = 512
    num_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 3
    dropout: float = 0.5          # reference default dropout=0.5 (line 452)
    sos_idx: int = 2
    pad_idx: int = 1
    max_decode_len: int = 20      # pipeline_model_gat.py:502
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.emb_proj = TorchLinear(self.hidden_dim, dtype=self.dtype,
                                    name="emb_proj")
        self.pos_encoder = PositionalEncoding(self.hidden_dim, self.dropout)
        self.decoder = TransformerDecoder(
            self.num_layers, self.hidden_dim, self.num_heads, self.ffn_dim,
            self.dropout, self.dtype, name="decoder")
        self.vocab_decoder = TorchLinear(self.vocab_size, dtype=self.dtype,
                                         name="vocab_decoder")

    def _embed(self, tokens, deterministic):
        x = self.text_embed(tokens)
        x = self.emb_proj(x) * math.sqrt(self.hidden_dim)
        return self.pos_encoder(x, deterministic=deterministic)

    def __call__(self, memory, tgt, deterministic: bool = True) -> jax.Array:
        x = self._embed(tgt, deterministic)
        out = self.decoder(x, memory, tgt_mask=causal_mask(tgt.shape[1]),
                           deterministic=deterministic)
        return self.vocab_decoder(out)

    def _embed_step(self, tokens: jax.Array, t) -> jax.Array:
        x = self.text_embed(tokens[:, None])
        x = (self.emb_proj(x) * math.sqrt(self.hidden_dim))[:, 0, :]
        return x + jnp.take(self.pos_encoder.pe, t, axis=0)[None, :].astype(
            x.dtype)

    def sample(self, memory, deterministic: bool = True) -> jax.Array:
        """KV-cached greedy decode (see ProgramDecoder.sample). Eval-only."""
        assert deterministic, "sample() is eval-only (KV cache has no dropout)"
        T = self.max_decode_len
        B = memory.shape[0]
        buf0 = jnp.full((B, T), self.sos_idx, jnp.int32)
        cache0 = self.decoder.init_cache(B, T - 1)
        cross_kvs = self.decoder.precompute_cross_kv(memory)

        def step(carry, t):
            buf, cache = carry
            x_t = self._embed_step(buf[:, t - 1], t - 1)
            out, cache = self.decoder.decode_step(x_t, cache, cross_kvs, t - 1)
            nxt = _greedy_token(self.vocab_decoder(out),
                                self.pad_idx, self.sos_idx)
            return (buf.at[:, t].set(nxt), cache), None

        # scan, not fori_loop — see ProgramDecoder.sample (TPU while-loop
        # miscompile when fused with the K/V precompute)
        (buf, _), _ = jax.lax.scan(step, (buf0, cache0), jnp.arange(1, T))
        return buf
