"""Fused dense-layout GAT round as one Pallas TPU kernel.

One grid step processes ``graphs_per_step`` graphs of the fully-uniform dense
layout (core/packing.py:pack_graphs_dense) entirely in VMEM:

    build one-hot incidence (iota compare)      never touches HBM
    SDDMM logits  = oh_src@a_l + oh_dst@a_r + a_e, leaky_relu
    destination softmax (max via masked reduce, sums via incidence matmuls)
    P_h = (oh_dst * alpha_h)^T @ oh_src         per head
    out_h = P_h @ xw_h                          per head

HBM traffic is just the true inputs/outputs (xw in, out out, [epg]-sized
index/score arrays) — the XLA path additionally materializes the two
[B, epg, npg] one-hot operands and re-reads them per head, which is why this
kernel was written. Parity with ops/dense.py:dense_gat_aggregate is exact up
to fp reassociation (tests/test_pallas_kernels.py).

MEASURED ON TPU v5e (2026-08-20, bench.py config B=512 npg=64 epg=256 H=4
C=300): 29.5 ms / 5-round engine iter vs 17.8 ms for the XLA dense path —
the kernel LOSES despite saving ~260 MB/round of one-hot HBM traffic,
because its per-graph [epg,npg]/[npg,npg] matmuls execute serially inside
each grid step while XLA pipelines all 512 graphs as single batched
dot_generals that keep the MXU fed. Kept as a tested reference point and
gated OFF by default (GRAPHVQA_USE_PALLAS=auto -> XLA path); revisit only if
the one-hot materialization becomes the measured bottleneck at much larger
npg/epg where per-graph matmuls reach MXU-native sizes.

Weight layout contract: ``xw`` arrives as [B*npg, H*C] with heads MAJOR
(xw[:, h*C:(h+1)*C] is head h) — the natural reshape of [N, H, C].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_EPS = 1e-16


def _round_kernel(dl_ref, sl_ref, mask_ref, al_ref, ar_ref, ae_ref, xw_ref,
                  out_ref, *, G, npg, epg, H, C, negative_slope):
    # refs are blocks of G graphs:
    #   dl/sl   [G, epg] int32 (destination/source local index)
    #   mask    [G, epg] float32 (1.0 real edge / 0.0 pad)
    #   al/ar   [G*npg, H] float32 (per-node attention scores)
    #   ae      [G, epg, H] float32 (per-edge scores)
    #   xw      [G*npg, H*C] float32 (head-major projected features)
    #   out     [G*npg, H*C] float32
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (epg, npg), 1)
    for g in range(G):
        mask = mask_ref[g, :]                               # [epg]
        ohd = jnp.where((dl_ref[g, :][:, None] == iota_n)
                        & (mask[:, None] > 0), 1.0, 0.0)    # [epg, npg]
        ohs = jnp.where((sl_ref[g, :][:, None] == iota_n)
                        & (mask[:, None] > 0), 1.0, 0.0)

        al = al_ref[g * npg:(g + 1) * npg, :]               # [npg, H]
        ar = ar_ref[g * npg:(g + 1) * npg, :]
        lg = (jnp.dot(ohs, al, preferred_element_type=jnp.float32)
              + jnp.dot(ohd, ar, preferred_element_type=jnp.float32)
              + ae_ref[g, :, :])                            # [epg, H]
        lg = jnp.where(lg >= 0, lg, negative_slope * lg)
        lg = jnp.where(mask[:, None] > 0, lg, _NEG_INF)

        # per-destination max: masked reduce over the edge axis
        seg_max = jnp.max(
            jnp.where(ohd[:, :, None] > 0, lg[:, None, :], _NEG_INF),
            axis=0)                                         # [npg, H]
        seg_max = jnp.maximum(seg_max, _NEG_INF)
        max_e = jnp.dot(ohd, seg_max,
                        preferred_element_type=jnp.float32)  # [epg, H]
        shifted = jnp.minimum(lg - max_e, 0.0)
        p = jnp.where(mask[:, None] > 0, jnp.exp(shifted), 0.0)

        denom = jnp.dot(ohd.T, p,
                        preferred_element_type=jnp.float32)  # [npg, H]
        denom_e = jnp.dot(ohd, denom,
                          preferred_element_type=jnp.float32) + _EPS
        alpha = p / denom_e                                  # [epg, H]

        for h in range(H):
            p_h = jnp.dot((ohd * alpha[:, h:h + 1]).T, ohs,
                          preferred_element_type=jnp.float32)  # [npg, npg]
            xw_h = xw_ref[g * npg:(g + 1) * npg, h * C:(h + 1) * C]
            out_ref[g * npg:(g + 1) * npg, h * C:(h + 1) * C] = jnp.dot(
                p_h, xw_h, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "npg", "epg", "H", "C", "negative_slope", "graphs_per_step", "interpret"))
def pallas_fused_dense_gat(
    dl: jax.Array,          # [B, epg] int32 destination local index
    sl: jax.Array,          # [B, epg] int32 source local index
    mask: jax.Array,        # [B, epg] float32
    alpha_l: jax.Array,     # [B*npg, H]
    alpha_r: jax.Array,     # [B*npg, H]
    alpha_e: jax.Array,     # [B, epg, H]
    xw: jax.Array,          # [B*npg, H*C] head-major
    *,
    npg: int, epg: int, H: int, C: int,
    negative_slope: float = 0.2,
    graphs_per_step: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Returns out [B*npg, H*C] (head-major), the aggregated messages."""
    B = dl.shape[0]
    G = graphs_per_step
    while B % G:
        G //= 2
    grid = (B // G,)

    kern = functools.partial(
        _round_kernel, G=G, npg=npg, epg=epg, H=H, C=C,
        negative_slope=negative_slope)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, epg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, epg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, epg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * npg, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * npg, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, epg, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * npg, H * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G * npg, H * C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * npg, H * C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * epg * npg * (4 * H + H * npg) + 2 * B * npg * npg * H * C,
            bytes_accessed=4 * B * (3 * epg + 2 * npg * H + epg * H
                                    + 2 * npg * H * C),
            transcendentals=B * epg * H,
        ),
        interpret=interpret,
    )(dl, sl, mask, alpha_l, alpha_r, alpha_e, xw)
