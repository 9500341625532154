"""Dense per-graph message aggregation — the MXU hot path.

GQA scene graphs are tiny (~17 nodes / ~100 edges mean), so with **fully
uniform per-graph padding** (:func:`graphvqa_tpu.core.packing.pack_graphs_dense`:
graph g owns node rows [g*npg, (g+1)*npg) and edge rows [g*epg, (g+1)*epg)),
every segment primitive the reference imports from CUDA (SURVEY.md K1/K3/K4 —
torch_scatter reductions, torch_geometric segment softmax, the
``MessagePassing.propagate`` gather/scatter) becomes a **batched dense
contraction against one-hot incidence matrices**:

    oh_dst[b, e, i] = 1 iff edge e of graph b points at local node i
    sum-per-destination:   out[b, i] = einsum('bei,bed->bid', oh_dst, msgs)
    softmax denominator:   den[b, i] = einsum('bei,beh->bih', oh_dst, exp)
    per-edge re-broadcast: y[b, e]   = einsum('bei,bih->beh', oh_dst, den)

All of it runs on the MXU at matmul speed. Measured on TPU v5e
(tools/bench_dense_attribution.py): the XLA scatter this replaces costs
~40 ns/edge-row (5.4 ms for 131k edges) — two orders of magnitude over the
one-hot contraction — because TPU scatters serialize row updates.

The one-hot operands are built on device from the index arrays (an iota
compare — no host memory or H2D traffic) and XLA materializes them once per
round.

Attention softmax semantics stay exact: logits and the per-destination
max/denominator follow torch_geometric.utils.softmax (+1e-16), and parallel
edges between the same (src, dst) pair keep their individual pre-softmax
nonlinearity — they are only merged *after* normalization, where the merge is
exact because messages are linear in the per-edge weight.

**Edge partitioning (destination ownership, round 3).** When
``graph.edge_axis`` is set (parallel/edge_sharded.py), this shard holds
exactly the edges whose local destination index i has
``i % k == shard`` (k = ``graph.edge_axis_size``). All destination-indexed
arrays then use the **compressed owned-row space** ``q = i // k`` of size
``npg/k``: the one-hot destination incidence is [B, epg_loc, npg/k], the
softmax max/denominator and the per-graph edge-weight matrix P materialize
only the owned rows, and the destination softmax needs NO cross-shard
collective (every edge of an owned destination is local). The single
collective per aggregation is :func:`_assemble_dst_rows` — a strided
all-gather of the owned output rows, (k-1)/k of [B, npg, D] over ICI
(backward transpose: the matching reduce-scatter). This replaces the r2
scheme (full-npg rows + psum of [B, H, npg, npg] P matrices + pmax/psum
softmax passes) whose comm volume was independent of shard count.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graphvqa_tpu.core.graph import GraphBatch

_NEG_INF = -1e30
_SOFTMAX_EPS = 1e-16  # torch_geometric.utils.softmax denominator

# P-matrix dimension order for the GAT round (ROOFLINE.md "copy residue"
# investigation, round 4):
#   'hij': P [B, H, rows, npg] — the shipping default. Measured on v5e:
#          engine 37.7 M edges/s, full-model train 59.5 ms / eval 14.2 ms.
#   'ijh': P [B, rows, npg, H] — the hypothesis that aligning P@v's
#          contracting-dim order with v's layout kills the relayout copy.
#          MEASURED LOSER: engine 31.1 M edges/s (-18%), train 60.4 ms,
#          eval 15.3 ms — the P build pays more for the 'bijh' output order
#          than P@v saves. Kept selectable for re-measurement on future
#          compilers: GRAPHVQA_P_LAYOUT=ijh.
#   'hij_t': fast 'hij' P build + an EXPLICIT [B,rows,npg,H] transpose of P
#          (33 MB) so P@v reads v natively — trades the compiler's 78 MB v
#          relayout for a 2.4x smaller one we control. MEASURED LOSER:
#          34.4 M edges/s (-9%) — the explicit transpose materializes where
#          the compiler's relayout partially fuses.
_P_LAYOUT = os.environ.get("GRAPHVQA_P_LAYOUT", "hij")

# Softmax stabilizer constant (ROOFLINE.md "remaining levers" #3, round 5):
#   'dst':   torch_geometric-exact per-DESTINATION max — needs a masked
#            [B, epg, rows, H] reduce plus a max_e incidence matmul to
#            re-broadcast the max per edge (two of the one-hot re-reads the
#            lever names).
#   'graph': per-GRAPH max — softmax is invariant to any constant that is
#            uniform across a destination's edges, and the graph max is;
#            the reduce collapses to [B, epg, H] -> [B, H] and the
#            re-broadcast matmul disappears. Exact up to fp (denominator
#            scale changes by exp(dst_max - graph_max), so the +1e-16 eps
#            weighs relatively heavier; underflow needs a per-graph logit
#            spread > ~80 in f32). Measured on v5e: 39.50 M edges/s vs
#            37.64 M for 'dst' (+4.9%, 1.368 ms/round) — ships as the
#            default; GRAPHVQA_SOFTMAX_SHIFT=dst restores the
#            torch_geometric-exact stabilizer (e.g. for bit-level A/Bs
#            against converted reference checkpoints).
_SOFTMAX_SHIFT = os.environ.get("GRAPHVQA_SOFTMAX_SHIFT", "graph")


def _dense_shapes(graph: GraphBatch) -> Tuple[int, int, int]:
    B, npg, epg = graph.num_graphs, graph.nodes_per_graph, graph.edges_per_graph
    assert npg > 0 and epg > 0, "dense ops need the fully-uniform layout"
    return B, npg, epg


def _owned(graph: GraphBatch) -> bool:
    # a size-1 edge axis still partitions formally (vma bookkeeping): the
    # general owned-row path degenerates to an identity + free psum
    return graph.edge_axis is not None


def _dst_rows(graph: GraphBatch) -> int:
    """Destination-row count this shard materializes: npg, or npg/k under
    destination-owned edge partitioning."""
    npg = graph.nodes_per_graph
    return npg // graph.edge_axis_size if _owned(graph) else npg


def _assemble_dst_rows(graph: GraphBatch, out: jax.Array) -> jax.Array:
    """[B, rows, D] per-destination-row output -> flat [B*npg, D].

    Under destination ownership, shard s's row q is global local-index
    ``q*k + s``; the shards' disjoint rows are interleaved back into node
    order with ONE collective — a masked psum (each shard contributes its
    own slice of the [B, npg/k, k, D] layout; XLA lowers the psum to
    reduce-scatter + all-gather over ICI). A psum rather than an all-gather
    because jax's varying-manual-axes system has no varying→invariant cast:
    the psum is what re-establishes edge-axis invariance for the node path,
    and its transpose is communication-free.
    """
    B, npg = graph.num_graphs, graph.nodes_per_graph
    D = out.shape[-1]
    if not _owned(graph):
        return out.reshape(B * npg, D)
    k, ax = graph.edge_axis_size, graph.edge_axis
    s = jax.lax.axis_index(ax)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k, 1), 2)
    full = jnp.where(lane == s, out[:, :, None, :], 0)
    full = jax.lax.psum(full, ax)                    # [B, npg/k, k, D]
    # row j = (q=j//k on shard r=j%k)
    return full.reshape(B * npg, D)


def onehot_dst(graph: GraphBatch, dtype=jnp.float32) -> jax.Array:
    """[B, epg, rows] one-hot destination incidence (masked). ``rows`` is the
    (possibly compressed, see module docstring) destination-row count."""
    B, npg, epg = _dense_shapes(graph)
    dl = graph.edge_dst % npg
    rows = _dst_rows(graph)
    if _owned(graph):
        dl = dl // graph.edge_axis_size
    dl = dl.reshape(B, epg)
    sel = dl[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, rows), 2)
    sel = sel & graph.edge_mask.reshape(B, epg)[:, :, None]
    return sel.astype(dtype)


def onehot_src(graph: GraphBatch, dtype=jnp.float32) -> jax.Array:
    """[B, epg, npg] one-hot source incidence (masked). Sources are never
    compressed — any node can source an edge on any shard."""
    B, npg, epg = _dense_shapes(graph)
    sl = (graph.edge_src % npg).reshape(B, epg)
    sel = sl[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, npg), 2)
    sel = sel & graph.edge_mask.reshape(B, epg)[:, :, None]
    return sel.astype(dtype)


def dense_aggregate_edges(
    graph: GraphBatch,
    edge_values: jax.Array,      # [E, D] flat per-edge values
    reduce: str = "sum",
    oh_dst: Optional[jax.Array] = None,
) -> jax.Array:
    """Aggregate per-edge values into destination nodes -> [N, D].

    The dense replacement for ``scatter_edges_to_nodes`` (K1/K4): one batched
    [rows, epg] x [epg, D] contraction per graph instead of a serialized
    scatter. Handles *any* per-edge message (MetaLayer, GINE, the execution
    engine), not just src-factorizable ones. Under edge partitioning the
    per-destination counts are local-complete (ownership), so ``mean``
    normalizes before the row exchange.
    """
    B, npg, epg = _dense_shapes(graph)
    D = edge_values.shape[-1]
    oh = onehot_dst(graph, edge_values.dtype) if oh_dst is None else oh_dst
    v = jnp.where(graph.edge_mask[:, None], edge_values, 0.0)
    out = jnp.einsum("bei,bed->bid", oh, v.reshape(B, epg, D),
                     preferred_element_type=jnp.float32)   # [B, rows, D]
    if reduce == "mean":
        ones = graph.edge_mask.reshape(B, epg, 1).astype(out.dtype)
        counts = jnp.einsum("bei,bed->bid", oh, ones,
                            preferred_element_type=jnp.float32)
        out = out / jnp.maximum(counts, 1.0)
    elif reduce != "sum":
        raise ValueError(f"unknown reduce: {reduce}")
    # cast BEFORE the assembly psum: each destination row lives on exactly
    # one shard (ownership), so the psum adds only zeros — rounding first is
    # bitwise identical and halves the collective payload (HLO-audited,
    # tools/audit_comm.py)
    return _assemble_dst_rows(graph, out.astype(edge_values.dtype))


def _dense_softmax_stats(
    graph: GraphBatch,
    logits: jax.Array,           # [E, H] flat per-edge logits
    oh_dst: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """The two reduction passes of the destination softmax.

    Returns ``(expd, denom)``: ``expd`` [B, epg, H] is the masked, max-shifted
    exp of each edge's logit; ``denom`` [B, rows, H] the per-destination sum
    (WITHOUT the +1e-16 — callers add it where they divide). Splitting the
    stats from the per-edge normalization lets :func:`dense_gat_aggregate`
    divide once per destination *after* aggregation instead of re-broadcasting
    the denominator to every edge (exactly equal math: the division by the
    destination's denominator distributes out of the destination sum).

    Under destination-owned edge partitioning both passes are **fully
    local**: every edge of an owned destination lives on this shard, so the
    r2 cross-shard pmax/psum passes are gone by construction.
    """
    B, npg, epg = _dense_shapes(graph)
    H = logits.shape[-1]
    lg = jnp.where(graph.edge_mask[:, None], logits, _NEG_INF)
    lg = lg.reshape(B, epg, H)

    if _SOFTMAX_SHIFT == "graph":
        # per-graph max: a valid stabilizer (uniform across every
        # destination's edges) that needs neither the [B,epg,rows,H]
        # masked reduce nor the per-edge re-broadcast matmul
        seg_max = jax.lax.stop_gradient(jnp.max(lg, axis=1))     # [B, H]
        if graph.edge_axis is not None:
            # under destination ownership the shift is already exact with
            # the LOCAL max (uniform across every owned destination's
            # edges, which are all local) — this tiny [B, H] pmax only
            # makes the constant equal to the unsharded run's global max,
            # keeping the sharded-vs-single-device gradient-exactness
            # tests bitwise-meaningful
            seg_max = jax.lax.pmax(seg_max, graph.edge_axis)
        seg_max = jnp.maximum(seg_max, _NEG_INF)
        max_e = seg_max[:, None, :]
    else:
        ohb = oh_dst != 0
        # per-destination max: masked reduce over the edge axis (XLA fuses
        # the select into the reduction; nothing [B,epg,rows,H]-sized
        # reaches HBM)
        seg_max = jnp.max(
            jnp.where(ohb[:, :, :, None], lg[:, :, None, :], _NEG_INF),
            axis=1)                                          # [B, rows, H]
        # the max only stabilizes the exp — softmax is invariant to it, so
        # its gradient contributions cancel exactly; stop_gradient keeps
        # that cancellation exact in fp
        seg_max = jax.lax.stop_gradient(seg_max)
        seg_max = jnp.maximum(seg_max, _NEG_INF)

        # re-broadcast per edge via the incidence matmul, then exp
        max_e = jnp.einsum("bei,bih->beh", oh_dst, seg_max,
                           preferred_element_type=jnp.float32)  # [B, epg, H]
    shifted = lg - max_e
    mask3 = graph.edge_mask.reshape(B, epg)[:, :, None]
    shifted = jnp.where(mask3, shifted, 0.0)
    expd = jnp.where(mask3, jnp.exp(jnp.minimum(shifted, 0.0)), 0.0)

    denom = jnp.einsum("bei,beh->bih", oh_dst, expd,
                       preferred_element_type=jnp.float32)   # [B, rows, H]
    return expd, denom


def dense_segment_softmax(
    graph: GraphBatch,
    logits: jax.Array,           # [E, H] flat per-edge logits
    oh_dst: Optional[jax.Array] = None,
) -> jax.Array:
    """Destination softmax over edges, scatter-free -> [E, H].

    Exact semantics of torch_geometric.utils.softmax (K3): per-destination
    max subtraction, exp, per-destination sum, divide (+1e-16); masked lanes
    return 0. The max is a fused masked reduce over the one-hot expansion;
    the sum and the per-edge re-broadcasts are batched matmuls.
    """
    B, npg, epg = _dense_shapes(graph)
    H = logits.shape[-1]
    oh = onehot_dst(graph, logits.dtype) if oh_dst is None else oh_dst
    expd, denom = _dense_softmax_stats(graph, logits, oh)
    denom_e = jnp.einsum("bei,bih->beh", oh, denom,
                         preferred_element_type=jnp.float32) + _SOFTMAX_EPS
    alpha = expd / denom_e
    mask3 = graph.edge_mask.reshape(B, epg)[:, :, None]
    alpha = jnp.where(mask3, alpha, 0.0)
    return alpha.reshape(B * epg, H).astype(logits.dtype)


def dense_scatter_matmul(
    graph: GraphBatch,
    edge_weights: jax.Array,     # [E, H] per-edge scalar weights per head
    values: jax.Array,           # [N, H, C] per-source-node message content
    oh_dst: Optional[jax.Array] = None,
    oh_src: Optional[jax.Array] = None,
) -> jax.Array:
    """out[dst] = sum_{e: src->dst} edge_weights[e] * values[src]  -> [N, H, C].

    The SpMM of K4 as two chained batched matmuls, all heads in ONE
    contraction each (the one-hot operands are read once, not once per head):
        P   = (oh_dst ⊗_H w)^T @ oh_src          [B, H, rows, npg]
        out = P @ values                         [B, H, rows, C]
    Parallel (src, dst) edges accumulate in P — exact post-normalization.
    Under edge partitioning both matmuls materialize only the owned rows.
    """
    N, H, C = values.shape
    B, npg, epg = _dense_shapes(graph)
    dt = values.dtype
    p = _dense_edge_weight_matrix(graph, edge_weights, dt, oh_dst, oh_src)
    v = values.reshape(B, npg, H, C)
    out = jnp.einsum("bhij,bjhc->bihc", p.astype(dt), v,
                     preferred_element_type=jnp.float32)  # [B, rows, H, C]
    rows = out.shape[1]
    # dtype cast before the disjoint-row assembly psum: exact, half the bytes
    out = _assemble_dst_rows(graph,
                             out.reshape(B, rows, H * C).astype(dt))
    return out.reshape(N, H, C)


def _dense_edge_weight_matrix(
    graph: GraphBatch,
    edge_weights: jax.Array,     # [E, H] flat per-edge weights
    dt,
    oh_dst: Optional[jax.Array] = None,
    oh_src: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-graph per-head edge-weight matrix P [B, H, rows, npg] (f32).

    P[b, h, i, j] = sum over edges e of graph b with src j, dst i of
    ``edge_weights[e, h]``. One batched [B, epg, H*rows] x [B, epg, npg]
    contraction for all heads; the elementwise ``oh_dst * w`` operand fuses
    into the dot's lhs read. Under edge partitioning P's destination rows are
    local-complete for owned destinations and absent otherwise — no
    cross-shard combine (the r2 psum of this matrix is gone).
    """
    B, npg, epg = _dense_shapes(graph)
    H = edge_weights.shape[-1]
    ohd = onehot_dst(graph, dt) if oh_dst is None else oh_dst
    ohs = onehot_src(graph, dt) if oh_src is None else oh_src
    w = jnp.where(graph.edge_mask[:, None], edge_weights, 0.0)
    # match the compute dtype so a bf16 engine runs the P build on the
    # MXU's native path (accumulation stays f32 via preferred_element_type)
    w = w.reshape(B, epg, H).astype(dt)
    ohdw = ohd[:, :, None, :] * w[:, :, :, None]            # [B, epg, H, rows]
    p = jnp.einsum("behi,bej->bhij", ohdw, ohs,
                   preferred_element_type=jnp.float32)      # [B, H, rows, npg]
    return p


def dense_gat_aggregate(
    graph: GraphBatch,
    xw: jax.Array,          # [N, H, C] projected node features
    alpha_l: jax.Array,     # [N, H]
    alpha_r: jax.Array,     # [N, H]
    alpha_e: jax.Array,     # [E, H] per-edge scores (flat layout)
    negative_slope: float = 0.2,
    softmax_eps: float = 1e-16,
    return_alpha: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    ins_value: Optional[jax.Array] = None,   # [B, H, C] per-graph value share
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Full GAT round on the uniform dense layout, scatter/gather-free.

    Returns the **head-averaged** [N, C] output (concat=False semantics —
    averaging before the layout transpose keeps the [B, H, rows, C] aggregate
    in its natural dot_general order) plus optionally the per-edge attention
    [E, H].

    ``ins_value`` is the per-graph (instruction) share of the projected node
    values. Because every source node of graph b carries the same ins vector,
    its aggregate is EXACTLY ``rowsum(P_n) ⊗ ins_value`` — a [B, H, rows] x
    [B, H, C] contraction — so the caller never materializes the [N, H*C]
    broadcast-add into the node values (2x157 MB of HBM traffic per round on
    the bench shapes).

    SDDMM logits (gat_skip.py:180-208) come from incidence matmuls against
    the per-node score vectors. The softmax normalization happens AFTER
    aggregation: out_i = (sum_e expd_e * v_src) / denom_i — exactly equal to
    normalizing per edge (the division distributes out of the destination
    sum), but it skips the per-edge denominator re-broadcast matmul, and the
    P build runs once for all heads. Attention dropout commutes with the
    division (it is a per-edge mask/scale), so it applies to ``expd``.
    Bit-compatible with the flat segment path up to fp reassociation.

    Under destination-owned edge partitioning every array indexed by
    destination ([B, rows, ...]) materializes only this shard's owned rows;
    the final ``_assemble_dst_rows`` all-gather is the round's one collective.
    """
    del softmax_eps  # fixed to the torch_geometric 1e-16 of the stats pass
    N, H, C = xw.shape
    B, npg, epg = _dense_shapes(graph)
    dt = xw.dtype

    # fully fused Pallas round: one-hot incidence never leaves VMEM
    # (ops/pallas/fused_dense_gat.py). Gated on a measured win; no dropout /
    # alpha observability / cross-chip sharding on this path.
    from graphvqa_tpu.ops.dispatch import _use_pallas
    if (_use_pallas() and graph.edge_axis is None and dropout_rate == 0.0
            and not return_alpha and dt == jnp.float32
            and ins_value is None):
        from graphvqa_tpu.ops.pallas.fused_dense_gat import (
            pallas_fused_dense_gat)
        dl = (graph.edge_dst % npg).reshape(B, epg)
        sl = (graph.edge_src % npg).reshape(B, epg)
        mask = graph.edge_mask.reshape(B, epg).astype(jnp.float32)
        out = pallas_fused_dense_gat(
            dl, sl, mask, alpha_l, alpha_r,
            alpha_e.reshape(B, epg, H), xw.reshape(N, H * C),
            npg=npg, epg=epg, H=H, C=C, negative_slope=negative_slope)
        return out.reshape(N, H, C).mean(axis=1), None

    ohd = onehot_dst(graph, dt)
    ohs = onehot_src(graph, dt)

    al = jnp.einsum("bej,bjh->beh", ohs, alpha_l.reshape(B, npg, H),
                    preferred_element_type=jnp.float32)
    if _owned(graph):
        # dst-side score gather must use the FULL-npg node array; build the
        # owned-row slice of alpha_r instead of a full-width incidence
        k, s = graph.edge_axis_size, jax.lax.axis_index(graph.edge_axis)
        ar_rows = jnp.take(alpha_r.reshape(B, npg // k, k, H), s, axis=2)
        ar = jnp.einsum("bei,bih->beh", ohd, ar_rows,
                        preferred_element_type=jnp.float32)
    else:
        ar = jnp.einsum("bei,bih->beh", ohd, alpha_r.reshape(B, npg, H),
                        preferred_element_type=jnp.float32)
    logits = (al + ar).reshape(B * epg, H) + alpha_e
    logits = jax.nn.leaky_relu(logits, negative_slope)

    expd, denom = _dense_softmax_stats(graph, logits, ohd)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = 1.0 - dropout_rate
        expd = expd * (jax.random.bernoulli(
            dropout_rng, keep, (B * epg, H)).astype(expd.dtype)
            / keep).reshape(B, epg, H)

    # normalize P's destination rows (33 MB) instead of the [B, rows, H, C]
    # aggregate (157 MB), folding the concat=False head-mean 1/H in too;
    # the head average itself rides the contraction below (sum over h)
    recip = (1.0 / H) / (denom + _SOFTMAX_EPS)               # [B, rows, H]
    w = jnp.where(graph.edge_mask[:, None], expd.reshape(B * epg, H), 0.0)
    w = w.reshape(B, epg, H).astype(dt)
    v = xw.reshape(B, npg, H, C)
    if _P_LAYOUT == "ijh":
        # P [B, rows, npg, H]: both contractions below see their contracting
        # dims adjacent and identically ordered — removes the relayout copy
        # around P@v, but the P build pays more for the 'bijh' output order
        # than P@v saves (measured loser, see _P_LAYOUT above).
        # XLA:CPU's DotThunk lacks bf16 x bf16 -> f32 for the small
        # owned-row shapes this order produces — tests run these dots in
        # f32 there (TPU, the target, stays bf16).
        ddt = (jnp.float32 if dt == jnp.bfloat16
               and jax.default_backend() == "cpu" else dt)
        ohdw = (ohd[:, :, :, None] * w[:, :, None, :]).astype(ddt)
        p = jnp.einsum("beih,bej->bijh", ohdw, ohs.astype(ddt),
                       preferred_element_type=jnp.float32)   # [B,rows,npg,H]
        p = p * recip[:, :, None, :]
        out = jnp.einsum("bijh,bjhc->bic", p.astype(ddt), v.astype(ddt),
                         preferred_element_type=jnp.float32)  # [B, rows, C]
        if ins_value is not None:
            rowsum = p.sum(axis=2)                           # [B, rows, H]
            out = out + jnp.einsum("bih,bhc->bic", rowsum.astype(ddt),
                                   ins_value.astype(ddt),
                                   preferred_element_type=jnp.float32)
    elif _P_LAYOUT == "hij_t":
        p = _dense_edge_weight_matrix(graph, expd.reshape(B * epg, H), dt,
                                      oh_dst=ohd, oh_src=ohs)  # [B,H,rows,npg]
        p = p * recip.transpose(0, 2, 1)[:, :, :, None]
        ddt = (jnp.float32 if dt == jnp.bfloat16
               and jax.default_backend() == "cpu" else dt)
        pt = p.astype(ddt).transpose(0, 2, 3, 1)         # [B, rows, npg, H]
        out = jnp.einsum("bijh,bjhc->bic", pt, v.astype(ddt),
                         preferred_element_type=jnp.float32)  # [B, rows, C]
        if ins_value is not None:
            rowsum = p.sum(axis=3)                           # [B, H, rows]
            out = out + jnp.einsum("bhi,bhc->bic", rowsum.astype(ddt),
                                   ins_value.astype(ddt),
                                   preferred_element_type=jnp.float32)
    else:
        p = _dense_edge_weight_matrix(graph, expd.reshape(B * epg, H), dt,
                                      oh_dst=ohd, oh_src=ohs)  # [B,H,rows,npg]
        p = p * recip.transpose(0, 2, 1)[:, :, :, None]
        out = jnp.einsum("bhij,bjhc->bic", p.astype(dt), v,
                         preferred_element_type=jnp.float32)  # [B, rows, C]
        if ins_value is not None:
            # per-graph value share: P_n applied to a per-graph constant is
            # rowsum(P_n) times that constant (exact, incl. dropout and the
            # +eps in recip — the row sums carry both)
            rowsum = p.sum(axis=3)                           # [B, H, rows]
            out = out + jnp.einsum("bhi,bhc->bic", rowsum.astype(dt),
                                   ins_value.astype(dt),
                                   preferred_element_type=jnp.float32)
    # cast BEFORE the assembly psum: destination rows are shard-disjoint
    # (ownership), the psum adds only zeros — rounding first is bitwise
    # identical and halves the collective payload (tools/audit_comm.py)
    out = _assemble_dst_rows(graph, out.astype(dt))          # [N, C]

    alpha_ret = None
    if return_alpha:
        denom_e = jnp.einsum("bei,bih->beh", ohd, denom,
                             preferred_element_type=jnp.float32) + _SOFTMAX_EPS
        alpha_ret = (expd / denom_e).reshape(B * epg, H).astype(dt)
    return out, alpha_ret


def broadcast_to_nodes(graph: GraphBatch, values: jax.Array) -> jax.Array:
    """Per-graph vectors [B, D] -> per-node rows [N, D] (replaces the
    ``jnp.take(values, node_graph)`` gather — a reshape-broadcast on the
    uniform layout; measured ~40x cheaper than the row gather on TPU).

    Padded node rows receive their graph's value (the gather path gives them
    zeros) — all consumers mask padded rows, so the difference is inert.
    """
    B, npg, _ = _dense_shapes(graph)
    out = jnp.broadcast_to(values[:, None, :], (B, npg, values.shape[-1]))
    return out.reshape(B * npg, values.shape[-1])


def broadcast_to_edges(graph: GraphBatch, values: jax.Array) -> jax.Array:
    """Per-graph vectors [B, D] -> per-edge rows [E, D] (replaces the
    ``jnp.take(values, edge_graph)`` gather). Padded edge slots receive their
    graph's value; consumers mask them."""
    B, _, epg = _dense_shapes(graph)
    out = jnp.broadcast_to(values[:, None, :], (B, epg, values.shape[-1]))
    return out.reshape(B * epg, values.shape[-1])


def dense_gather_src(
    graph: GraphBatch,
    values: jax.Array,           # [N, D]
    oh_src: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-edge gather ``values[edge_src]`` -> [E, D] as an incidence matmul
    (the gather half of K4). Row gathers serialize on TPU (~40 ns/row); the
    batched [epg, npg] x [npg, D] contraction runs at MXU speed. Padded edge
    slots return zeros (their one-hot row is masked)."""
    B, npg, epg = _dense_shapes(graph)
    D = values.shape[-1]
    oh = onehot_src(graph, values.dtype) if oh_src is None else oh_src
    out = jnp.einsum("bej,bjd->bed", oh, values.reshape(B, npg, D),
                     preferred_element_type=jnp.float32)
    return out.reshape(B * epg, D).astype(values.dtype)


def dense_gather_dst(
    graph: GraphBatch,
    values: jax.Array,           # [N, D]
) -> jax.Array:
    """Per-edge gather ``values[edge_dst]`` -> [E, D] as an incidence matmul.
    Under destination-owned edge partitioning the incidence is in the
    compressed owned-row space, so the full node array is sliced to the
    owned rows first."""
    B, npg, epg = _dense_shapes(graph)
    D = values.shape[-1]
    v = values.reshape(B, npg, D)
    if _owned(graph):
        k, s = graph.edge_axis_size, jax.lax.axis_index(graph.edge_axis)
        v = jnp.take(v.reshape(B, npg // k, k, D), s, axis=2)
    oh = onehot_dst(graph, values.dtype)
    out = jnp.einsum("bei,bid->bed", oh, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B * epg, D).astype(values.dtype)


def dense_node_softmax(graph: GraphBatch, values: jax.Array) -> jax.Array:
    """Softmax over each graph's nodes (segment softmax over node_graph, K3)
    as a masked dense softmax -> same shape as ``values`` [N, H].

    Exact torch_geometric semantics: max-subtract, +1e-16 denominator, masked
    rows -> 0. Used by the conditional pooling gate and the execution-bitmap
    head on the dense layout.
    """
    B, npg, _ = _dense_shapes(graph)
    H = values.shape[-1]
    m3 = graph.node_mask.reshape(B, npg)[:, :, None]
    v = jnp.where(m3, values.reshape(B, npg, H), _NEG_INF)
    vmax = jnp.max(v, axis=1, keepdims=True)
    vmax = jnp.maximum(vmax, _NEG_INF)
    shifted = jnp.where(m3, v - vmax, 0.0)
    expd = jnp.where(m3, jnp.exp(jnp.minimum(shifted, 0.0)), 0.0)
    denom = expd.sum(axis=1, keepdims=True) + _SOFTMAX_EPS
    out = jnp.where(m3, expd / denom, 0.0)
    return out.reshape(B * npg, H).astype(values.dtype)


def dense_graph_layer_norm(
    graph: GraphBatch,
    x: jax.Array,            # [N, C]
    weight: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Per-graph LayerNorm over nodes x channels jointly on the dense layout
    (reference: my_graph_layernorm.py:52-78; quirks as ops/layernorm.py:
    scalar affine, eps on std, count clamped to 1)."""
    B, npg, _ = _dense_shapes(graph)
    C = x.shape[-1]
    m = graph.node_mask.reshape(B, npg, 1).astype(x.dtype)
    xd = x.reshape(B, npg, C) * m
    norm = jnp.maximum(m.sum(axis=(1, 2), keepdims=True), 1.0) * C
    mean = xd.sum(axis=(1, 2), keepdims=True) / norm
    centered = (xd - mean) * m
    var = (centered * centered).sum(axis=(1, 2), keepdims=True) / norm
    safe_var = jnp.where(var > 0, var, 1.0)
    std = jnp.where(var > 0, jnp.sqrt(safe_var), 0.0)
    out = centered / (std + eps)
    out = out * jnp.reshape(weight, ()) + jnp.reshape(bias, ())
    out = out * m
    return out.reshape(B * npg, C)


def dense_segment_sum_nodes(graph: GraphBatch, values: jax.Array) -> jax.Array:
    """Per-graph sum over nodes -> [num_graphs, ...] via a dense masked reduce
    (the dense-layout replacement for segment_sum over node_graph, K1)."""
    npg, B = graph.nodes_per_graph, graph.num_graphs
    v = jnp.where(
        graph.node_mask.reshape(values.shape[0],
                                *([1] * (values.ndim - 1))), values, 0)
    return v.reshape(B, npg, *values.shape[1:]).sum(axis=1)
