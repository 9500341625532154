"""Pallas TPU kernel: fully fused blocked GAT round.

One kernel per node block computes the destination softmax AND the weighted
aggregation — replacing (flat segment-max + segment-sum + gathers + divide +
weighting + scatter) with a single VMEM-resident pass:

  j == 0 chunk:   onehot [BN, BE] from dst ids
                  per-node max  m = rowmax over incident edges       (VPU)
                  expd = exp(logits - onehot^T @ m)                  (MXU gather)
                  denom = onehot @ expd; alpha = expd/(onehot^T@denom+eps)
                  -> alpha persists in VMEM scratch
  every chunk:    out_chunk = onehot @ (feats_chunk * tile(alpha))   (MXU)

Requirements: the blocked layout must have NO spilled edges (caller checks
``GraphBatch.has_spill``), and padded slots must carry -inf logits. The
``feats`` lane layout is head-interleaved (see blocked_aggregate contract).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_EPS = 1e-16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(dst_ref, logits_ref, feats_ref, out_ref, alpha_scratch, *,
            block_nodes: int, heads: int):
    # dst_ref   : [1, 1, BE] int32
    # logits_ref: [1, BE, H] float32 (-inf at padded slots)
    # feats_ref : [1, BE, d_chunk] float32 head-interleaved lanes
    # out_ref   : [1, BN, d_chunk]
    # alpha_scratch: [BE, H] float32 (persists across the chunk grid dim)
    BE = logits_ref.shape[1]
    d_chunk = feats_ref.shape[2]
    C = d_chunk // heads
    j = pl.program_id(1)

    onehot = (
        dst_ref[0, 0, :][None, :]
        == jax.lax.broadcasted_iota(jnp.int32, (block_nodes, BE), 0)
    ).astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        logits = logits_ref[0]                          # [BE, H]
        # per-node max over incident edges: mask non-incident with -inf
        sel = onehot > 0.5                              # [BN, BE]
        m = jnp.max(
            jnp.where(sel[:, :, None], logits[None, :, :], _NEG_INF),
            axis=1)                                     # [BN, H]
        # one-hot rows -> transposed matmul is a gather back to edges
        m_edge = jnp.dot(onehot.T, m,
                         preferred_element_type=jnp.float32)  # [BE, H]
        expd = jnp.exp(jnp.minimum(logits - m_edge, 0.0))
        expd = jnp.where(logits > _NEG_INF * 0.5, expd, 0.0)
        denom = jnp.dot(onehot, expd,
                        preferred_element_type=jnp.float32)   # [BN, H]
        denom_edge = jnp.dot(onehot.T, denom,
                             preferred_element_type=jnp.float32) + _EPS
        alpha_scratch[:, :] = expd / denom_edge

    alpha_rep = pltpu.repeat(alpha_scratch[:, :], C, axis=1)  # [BE, d_chunk]
    out_ref[0] = jnp.dot(onehot, feats_ref[0] * alpha_rep,
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_nodes", "interpret",
                                             "vmem_budget"))
def pallas_fused_gat_round(
    dst_local: jax.Array,   # [nb, BE] int32
    logits: jax.Array,      # [nb, BE, H] float32, -inf at padded slots
    feats: jax.Array,       # [nb, BE, H*C] head-interleaved gathered features
    block_nodes: int,
    interpret: bool = False,
    vmem_budget: int = 6 * 1024 * 1024,
) -> jax.Array:
    """Returns [nb * block_nodes, H*C] (head-interleaved lanes)."""
    nb, BE = dst_local.shape
    D = feats.shape[-1]
    heads = logits.shape[-1]

    d_pad = _round_up(D, 128)
    if d_pad != D:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, d_pad - D)))
    n_chunks = 1
    while (BE * (d_pad // n_chunks) * 4 > vmem_budget
           or d_pad % (n_chunks * 128) != 0):
        n_chunks += 1
        if n_chunks > d_pad // 128:
            n_chunks = d_pad // 128
            break
    d_chunk = d_pad // n_chunks
    assert d_chunk % heads == 0, (d_chunk, heads)

    out = pl.pallas_call(
        functools.partial(_kernel, block_nodes=block_nodes, heads=heads),
        grid=(nb, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, BE), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BE, heads), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BE, d_chunk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_nodes, d_chunk),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, block_nodes, d_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BE, heads), jnp.float32)],
        interpret=interpret,
    )(dst_local[:, None, :], logits.astype(jnp.float32),
      feats.astype(jnp.float32))
    out = out.reshape(nb * block_nodes, d_pad)
    return out[:, :D] if d_pad != D else out
