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


@functools.partial(jax.jit, static_argnames=("block_nodes", "interpret"))
def pallas_blocked_aggregate(
    dst_local: jax.Array,   # [nb, BE] int32 (padding slots may hold any id —
                            #  their alpha must be 0)
    alpha: jax.Array,       # [nb, BE] or [nb, BE, H] weights (0 on padding)
    feats: jax.Array,       # [nb, BE, H*C] gathered features; multi-head
                            #  lanes must be head-INTERLEAVED (C-major):
                            #  lane l = (head l % H, channel l // H)
    block_nodes: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns [nb * block_nodes, H*C] in the same lane layout as ``feats``."""
    nb, BE = dst_local.shape
    D = feats.shape[-1]
    if alpha.ndim == 2:
        alpha = alpha[..., None]
    heads = alpha.shape[-1]
    out = pl.pallas_call(
        functools.partial(_kernel, block_nodes=block_nodes, heads=heads),
        grid=(nb,),
        in_specs=[
            # [nb, 1, BE]: keeps Mosaic's (8,128)-divisible-or-full rule happy
            pl.BlockSpec((1, 1, BE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BE, heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BE, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_nodes, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, block_nodes, D), jnp.float32),
        interpret=interpret,
    )(dst_local[:, None, :], alpha.astype(jnp.float32),
      feats.astype(jnp.float32))
    return out.reshape(nb * block_nodes, D)
