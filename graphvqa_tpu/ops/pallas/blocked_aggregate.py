"""Pallas TPU kernel: fused weighted one-hot aggregation per node block.

The inner loop of the blocked SpMM (ops/blocked.py): for each node block,
contract the block's gathered+weighted edge messages onto its BN destination
rows. The XLA path materializes the weighted messages [nb, BE, D] in HBM
before the contraction; this kernel fuses the alpha-weighting and the one-hot
construction into the MXU matmul, so per block only the gathered features are
read and only the [BN, D] output is written.

    out[i, n, :] = sum_e 1[dst_local[i,e] == n] * alpha[i,e] * feats[i,e,:]

Grid: one step per node block (TPU grid is sequential; each step owns its
output block, no cross-step accumulation needed).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def pallas_available() -> bool:
    return _HAS_PALLAS


def _kernel(dst_ref, alpha_ref, feats_ref, out_ref, *,
            block_nodes: int, heads: int):
    # dst_ref  : [1, 1, BE] int32 destination-in-block ids
    # alpha_ref: [1, BE, H] float32 per-edge/per-head weights (0 for padding)
    # feats_ref: [1, BE, H*C] float32 gathered source features
    # out_ref  : [1, BN, H*C]
    BE = feats_ref.shape[1]
    D = feats_ref.shape[2]
    C = D // heads
    onehot = (
        dst_ref[0, 0, :][None, :]
        == jax.lax.broadcasted_iota(jnp.int32, (block_nodes, BE), 0)
    ).astype(jnp.float32)
    feats = feats_ref[0]
    if heads > 1:
        # CONTRACT: feats lanes are head-INTERLEAVED (C-major): lane l holds
        # head l % H, channel l // H. pltpu.repeat tiles its input, so
        # tile(alpha[BE, H], C) puts alpha[l % H] on lane l — matching that
        # layout without any (Mosaic-unsupported) lane-dim reshape.
        alpha_rep = pltpu.repeat(alpha_ref[0], C, axis=1)   # [BE, H*C]
        weighted = feats * alpha_rep
    else:
        weighted = feats * alpha_ref[0]             # [BE, D] (VPU)
    out_ref[0] = jnp.dot(onehot, weighted,
                         preferred_element_type=jnp.float32)  # MXU


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_nodes", "interpret",
                                             "vmem_budget"))
def pallas_blocked_aggregate(
    dst_local: jax.Array,   # [nb, BE] int32 (padding slots may hold any id —
                            #  their alpha must be 0)
    alpha: jax.Array,       # [nb, BE] or [nb, BE, H] weights (0 on padding)
    feats: jax.Array,       # [nb, BE, H*C] gathered features; multi-head
                            #  lanes must be head-INTERLEAVED (C-major):
                            #  lane l = (head l % H, channel l // H)
    block_nodes: int,
    interpret: bool = False,
    vmem_budget: int = 6 * 1024 * 1024,
) -> jax.Array:
    """Returns [nb * block_nodes, H*C] in the same lane layout as ``feats``.

    Channels are chunked into a second grid dimension so each step's feature
    block (double-buffered by the pipeline) stays within the VMEM budget;
    lanes are padded to a 128 multiple for Mosaic tiling.
    """
    nb, BE = dst_local.shape
    D = feats.shape[-1]
    if alpha.ndim == 2:
        alpha = alpha[..., None]
    heads = alpha.shape[-1]

    d_pad = _round_up(D, 128)
    if d_pad != D:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, d_pad - D)))
    # chunk so BE * d_chunk * 4B fits the per-buffer budget; chunks are
    # 128-multiples (also head-multiples since 128 % heads == 0 for H<=128
    # powers of two; enforced below)
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
            # [nb, 1, BE]: keeps Mosaic's (8,128)-divisible-or-full rule happy
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
        interpret=interpret,
    )(dst_local[:, None, :], alpha.astype(jnp.float32),
      feats.astype(jnp.float32))
    out = out.reshape(nb * block_nodes, d_pad)
    return out[:, :D] if d_pad != D else out
