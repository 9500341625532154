"""Language-conditioned graph message-passing engines.

One sparse engine — SDDMM (per-edge scores) + segment-softmax + SpMM
(destination aggregation) over the flat dst-sorted edge layout — instantiated
four ways, mirroring the reference model family:

  * :class:`GATLayer`/:class:`GATSeq` — the flagship edge-featured multi-head
    GAT with skip connections (reference: gat_skip.py:16-279)
  * :class:`GCNSeq` — degree-normalized convolutions (reference:
    baseline_and_test_models/pipeline_model_gcn.py:622-669, PyG GCNConv K5)
  * :class:`GINESeq` — GIN-with-edge-features (reference:
    baseline_and_test_models/pipeline_model_gine.py:622-674, PyG GINEConv K5)
  * :class:`LCGNSeq` — the LCGN baseline with per-iteration textual commands
    (reference: baseline_and_test_models/lcgn.py:17-353)

All layers consume a :class:`~graphvqa_tpu.core.graph.GraphBatch` plus dense
feature arrays and respect node/edge masks, so a single jit trace serves any
ragged batch in the bucket.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from graphvqa_tpu.core.graph import GraphBatch
from graphvqa_tpu.nn.norm import MaskedBatchNorm
from graphvqa_tpu.nn.transformer import TorchLinear
from graphvqa_tpu.ops import (
    gather_nodes,
    scatter_edges_to_nodes,
    segment_softmax,
)

glorot = nn.initializers.xavier_uniform()


class GlorotLinear(nn.Module):
    """Dense layer with PyG's glorot (xavier-uniform) init."""
    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", glorot, (x.shape[-1], self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class MLP2(nn.Module):
    """Lin -> ReLU -> Lin with torch default init (the reference's Seq(Lin,ReLU,Lin))."""
    hidden: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.hidden, dtype=self.dtype, name="lin1")(x)
        x = nn.relu(x)
        return TorchLinear(self.features, dtype=self.dtype, name="lin2")(x)


class SceneGraphMetaLayer(nn.Module):
    """One MetaLayer round of edge-then-node updates for SG encoding.

    Reference: pipeline_model_gat.py:63-101 (EdgeModel/NodeModel via PyG
    MetaLayer, K2). Edge update sees [src, dst, edge]; node update aggregates
    transformed incident-edge messages by scatter-mean over destinations.
    """
    node_dim: int
    edge_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, graph: GraphBatch, x: jax.Array, edge_attr: jax.Array):
        if graph.has_dense_layout:
            # incidence matmuls instead of row gathers: TPU row gathers
            # serialize (~40 ns/row, ROOFLINE.md) — at 131k edge slots the
            # two gathers alone would cost ~10 ms/step
            from graphvqa_tpu.ops.dense import (
                dense_gather_dst, dense_gather_src)
            x_src = dense_gather_src(graph, x)
            x_dst = dense_gather_dst(graph, x)
        else:
            src, dst = graph.edge_src, graph.edge_dst
            x_src = gather_nodes(x, src)
            x_dst = gather_nodes(x, dst)

        edge_in = jnp.concatenate([x_src, x_dst, edge_attr], axis=-1)
        edge_out = MLP2(self.edge_dim, self.edge_dim, self.dtype,
                        name="edge_mlp")(edge_in)
        edge_out = jnp.where(graph.edge_mask[:, None], edge_out, 0.0)

        node_msg_in = jnp.concatenate([x_src, edge_out], axis=-1)
        node_msg = MLP2(self.node_dim, self.node_dim, self.dtype,
                        name="node_mlp_1")(node_msg_in)
        from graphvqa_tpu.ops.dispatch import aggregate_edge_values
        aggregated = aggregate_edge_values(graph, node_msg, reduce="mean")
        node_out = MLP2(self.node_dim, self.node_dim, self.dtype,
                        name="node_mlp_2")(
            jnp.concatenate([x, aggregated], axis=-1))
        node_out = jnp.where(graph.node_mask[:, None], node_out, 0.0)
        return node_out, edge_out


class GATLayer(nn.Module):
    """Edge-featured multi-head GAT layer (reference: gat_skip.py:16-213).

    Score per edge (src j -> dst i):
        alpha = leaky_relu(a_l . Wx_j + a_r . Wx_i + a_e . We e_ij)
    softmax over each destination's incoming edges, then sum-aggregate
    ``alpha * Wx_j``; heads are averaged (concat=False) and a bias added.
    ``lin_l`` and ``lin_r`` share weights as in the reference (gat_skip.py:76-77).

    TPU FLOP optimizations (exact algebra, identical outputs up to fp
    reassociation; parameter shapes match the naive formulation so
    checkpoints interchange):
      * the full edge projection ``We e_ij`` is consumed only through
        ``(. * att_e).sum(-1)``, so it collapses to a precontracted
        ``[ein_c, H]`` matrix — O(E*ein*H) instead of O(E*ein*H*C);
      * when ``ins`` (the per-graph instruction vector, reference
        gat_skip.py:256-264) is passed separately instead of pre-concatenated,
        its share of both projections is computed on the [B, ins_dim] matrix
        and gathered per node/edge — O(B*ins*H*C) instead of O(E*ins*H*C).
    """
    out_channels: int
    heads: int = 4
    negative_slope: float = 0.2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        x: jax.Array,                       # [N, x_c]
        edge_attr: jax.Array,               # [E, e_c]
        ins: Optional[jax.Array] = None,    # [B, ins_dim] per-graph vectors
        deterministic: bool = True,
        return_alpha: bool = False,
        alpha_e_base: Optional[jax.Array] = None,
        static_edge_att_only: bool = False,
    ):
        """``static_edge_att_only`` returns this layer's collapsed edge-score
        matrix ``we_att[:e_c]`` [e_c, H] without touching the data — the
        caller (GATSeq) stacks all rounds' matrices and projects the static
        ``edge_attr`` ONCE for the whole sequence, then feeds the slice back
        per round via ``alpha_e_base`` (one [E, e_c] read instead of one per
        round)."""
        H, C = self.heads, self.out_channels
        N = graph.nodes_pad
        ins_dim = 0 if ins is None else ins.shape[-1]

        # parameter shapes as if inputs were concatenated with ins
        w = self.param("lin_lr", glorot, (x.shape[-1] + ins_dim, H * C))
        we = self.param("lin_e", glorot, (edge_attr.shape[-1] + ins_dim, H * C))
        att_l = self.param("att_l", glorot, (H, C))
        att_r = self.param("att_r", glorot, (H, C))
        att_e = self.param("att_e", glorot, (H, C))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if static_edge_att_only:
            we_att = (we.reshape(-1, H, C) * att_e[None]).sum(-1)
            return we_att[: edge_attr.shape[-1]]

        dt = self.dtype
        x_dim = x.shape[-1]
        ins_value = None   # dense path: per-graph value share, kept at [B, H, C]
        if graph.has_dense_layout:
            if graph.edge_axis is not None:
                # edge-partitioned round: cast the node input to
                # edge-axis-varying BEFORE the projection. The projection
                # still computes replicated values on every shard (same
                # input, same math — recomputing beats exchanging the 4x
                # wider projected array over ICI), but the explicit varying
                # boundary pins the backward-pass gradient psum to the
                # [N, in_c] input cotangent instead of the [N, H*C]
                # projected cotangent that jax's automatic lifting at the
                # P@v contraction would produce — 4x less ICI in backward.
                if graph.edge_axis not in jax.typeof(x).vma:
                    x = jax.lax.pcast(x, graph.edge_axis, to="varying")
            # dense path: three exact collapses keep ALL per-round work on
            # [N, H*C]-or-smaller arrays read once —
            #  1. alpha_l/alpha_r fold into the projection matmul as two
            #     extra output columns per head ((x@W · att).sum(-1) ==
            #     x @ (W·att));
            #  2. the per-graph instruction vector never broadcasts to nodes:
            #     its attention share adds at [B, H], its value share
            #     aggregates via rowsum(P) inside dense_gat_aggregate;
            #  3. the static edge projection arrives precomputed
            #     (alpha_e_base, hoisted across rounds by GATSeq).
            from graphvqa_tpu.ops.dense import broadcast_to_nodes
            w3 = w.reshape(-1, H, C)
            wa_l = (w3 * att_l[None]).sum(-1)          # [x_dim+ins, H]
            wa_r = (w3 * att_r[None]).sum(-1)
            w_aug = jnp.concatenate(
                [w[:x_dim], wa_l[:x_dim], wa_r[:x_dim]], axis=1)
            proj = jnp.dot(x.astype(dt), w_aug.astype(dt),
                           preferred_element_type=jnp.float32)  # [N, H*C+2H]
            xw = proj[:, :H * C].reshape(N, H, C).astype(dt)
            alpha_l = proj[:, H * C:H * C + H]
            alpha_r = proj[:, H * C + H:]
            if ins is not None:
                ins_w = jnp.dot(ins.astype(dt), w[x_dim:].astype(dt),
                                preferred_element_type=jnp.float32)  # [B, H*C]
                ins_value = ins_w.reshape(-1, H, C)
                alpha_l = alpha_l + broadcast_to_nodes(
                    graph, (ins_value * att_l[None]).sum(-1))
                alpha_r = alpha_r + broadcast_to_nodes(
                    graph, (ins_value * att_r[None]).sum(-1))
        else:
            xw = jnp.dot(x.astype(dt), w[:x_dim].astype(dt),
                         preferred_element_type=jnp.float32)
            if ins is not None:
                ins_w = jnp.dot(ins.astype(dt), w[x_dim:].astype(dt),
                                preferred_element_type=jnp.float32)  # [B, H*C]
                ins_w = jnp.concatenate(
                    [ins_w, jnp.zeros((1, H * C), ins_w.dtype)], axis=0)
                xw = xw + jnp.take(ins_w, graph.node_graph, axis=0)
            xw = xw.reshape(N, H, C).astype(dt)
            alpha_l = (xw * att_l).sum(-1)   # [N, H]
            alpha_r = (xw * att_r).sum(-1)

        # collapsed edge-attention projection: [e_c(+ins), H]
        we_att = (we.reshape(-1, H, C) * att_e[None]).sum(-1)     # [e_c+ins, H]
        if alpha_e_base is None:
            alpha_e = jnp.dot(edge_attr.astype(dt),
                              we_att[: edge_attr.shape[-1]].astype(dt),
                              preferred_element_type=jnp.float32)  # [E, H]
        else:
            alpha_e = alpha_e_base
        if ins is not None:
            ins_e = jnp.dot(ins.astype(dt),
                            we_att[edge_attr.shape[-1]:].astype(dt),
                            preferred_element_type=jnp.float32)    # [B, H]
            if graph.has_dense_layout:
                from graphvqa_tpu.ops.dense import broadcast_to_edges
                alpha_e = alpha_e + broadcast_to_edges(graph, ins_e)
            else:
                ins_e = jnp.concatenate(
                    [ins_e, jnp.zeros((1, H), ins_e.dtype)], axis=0)
                alpha_e = alpha_e + jnp.take(ins_e, graph.edge_graph(),
                                             axis=0)
        alpha_e = alpha_e.astype(dt)

        apply_dropout = self.dropout > 0.0 and not deterministic
        alpha_out = None
        if graph.has_dense_layout:
            # MXU path: batched per-graph dense matmul (ops/dense.py);
            # returns head-averaged [N, C] directly
            from graphvqa_tpu.ops.dense import dense_gat_aggregate
            drop_rng = self.make_rng("dropout") if apply_dropout else None
            out2, alpha_out = dense_gat_aggregate(
                graph, xw, alpha_l, alpha_r, alpha_e,
                negative_slope=self.negative_slope,
                return_alpha=return_alpha,
                dropout_rate=self.dropout if apply_dropout else 0.0,
                dropout_rng=drop_rng, ins_value=ins_value)
        else:
            logits = (jnp.take(alpha_l, graph.edge_src, axis=0)
                      + jnp.take(alpha_r, graph.edge_dst, axis=0)
                      + alpha_e)
            logits = nn.leaky_relu(logits, self.negative_slope)
            alpha = segment_softmax(logits, graph.edge_dst, N,
                                    mask=graph.edge_mask,
                                    indices_are_sorted=True)
            alpha = nn.Dropout(self.dropout)(alpha,
                                             deterministic=deterministic)
            msgs = jnp.take(xw, graph.edge_src, axis=0) * alpha[..., None]
            out3 = scatter_edges_to_nodes(msgs, graph.edge_dst, N,
                                          edge_mask=graph.edge_mask)
            alpha_out = alpha if return_alpha else None
            out2 = out3.mean(axis=1)   # concat=False: mean over heads
        out = out2 + bias
        out = jnp.where(graph.node_mask[:, None], out, 0.0)
        if return_alpha:
            return out, alpha_out
        return out


class GATSeq(nn.Module):
    """Five instruction-conditioned GAT rounds with skip + BN/ReLU/dropout
    between rounds (reference: gat_skip.py:220-279)."""
    out_channels: int
    num_rounds: int = 5
    heads: int = 4
    negative_slope: float = 0.2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        x: jax.Array,               # [N, C]
        edge_attr: jax.Array,       # [E, C]
        instr_vectors: jax.Array,   # [num_rounds, B, ins_dim]
        deterministic: bool = True,
        use_running_average: bool = False,
        return_alpha: bool = False,
    ):
        """When ``return_alpha`` is set, also returns the per-round per-edge
        attention weights [num_rounds, E, H] in flat edge order (the
        reference's optional explainability output, gat_skip.py:170-177)."""
        layers = [
            GATLayer(self.out_channels, self.heads, self.negative_slope,
                     self.dropout, self.dtype, name=f"conv_{i}")
            for i in range(self.num_rounds)
        ]
        # hoist the round-invariant edge-attention projection: edge_attr is
        # static across rounds, so project it through ALL rounds' collapsed
        # [e_c, H] score matrices in one [E, e_c] x [e_c, R*H] matmul instead
        # of re-reading the [E, e_c] array every round
        H = self.heads
        dt = self.dtype
        we_att_all = jnp.concatenate(
            [layers[i](graph, x, edge_attr, ins=instr_vectors[i],
                       static_edge_att_only=True)
             for i in range(self.num_rounds)], axis=-1)      # [e_c, R*H]
        alpha_e_all = jnp.dot(edge_attr.astype(dt), we_att_all.astype(dt),
                              preferred_element_type=jnp.float32)  # [E, R*H]

        h = x
        alphas = []
        for i in range(self.num_rounds):
            ins = instr_vectors[i]                          # [B, ins_dim]
            conv = layers[i](
                graph, h, edge_attr, ins=ins, deterministic=deterministic,
                return_alpha=return_alpha,
                alpha_e_base=alpha_e_all[:, i * H:(i + 1) * H])
            if return_alpha:
                conv, alpha = conv
                alphas.append(alpha)
            h = conv + h  # skip connection (gat_skip.py:270)

            if i != self.num_rounds - 1:
                h = MaskedBatchNorm(self.out_channels, dtype=self.dtype,
                                    name=f"bn_{i}")(
                    h, mask=graph.node_mask,
                    use_running_average=use_running_average)
                h = nn.relu(h)
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if return_alpha:
            stacked = (jnp.stack(alphas) if alphas[0] is not None else None)
            return h, stacked
        return h


class GCNSeq(nn.Module):
    """Five instruction-conditioned GCN rounds (reference:
    pipeline_model_gcn.py:622-669; PyG GCNConv semantics, K5).

    Per round: x' = W [h ; ins], then symmetric-degree-normalized aggregation
    over edges *plus one implicit self-loop per node* (GCNConv adds its own
    self-loop on top of the dataset's ``<self>`` edges — replicated).

    ``fix_discarded_conv`` — the released reference never assigns ``conv_res``
    back to ``h`` (pipeline_model_gcn.py:660-666), so its convs are dead code.
    True (default) implements the intended semantics ``h <- conv_res``; False
    replicates the released behavior bit-for-bit for parity studies.
    """
    out_channels: int
    num_rounds: int = 5
    dropout: float = 0.0
    fix_discarded_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        x: jax.Array,
        instr_vectors: jax.Array,
        deterministic: bool = True,
        use_running_average: bool = False,
    ) -> jax.Array:
        N = graph.nodes_pad
        # in-degree over real edges + 1 for the GCNConv-added self-loop
        ones = graph.edge_mask.astype(jnp.float32)
        if graph.has_dense_layout:
            from graphvqa_tpu.ops.dense import dense_aggregate_edges
            deg = dense_aggregate_edges(graph, ones[:, None])[:, 0] + 1.0
        else:
            deg = jax.ops.segment_sum(ones, graph.edge_dst, num_segments=N,
                                      indices_are_sorted=True) + 1.0
        dinv = jax.lax.rsqrt(deg)
        edge_norm = (jnp.take(dinv, graph.edge_src, axis=0)
                     * jnp.take(dinv, graph.edge_dst, axis=0))
        self_norm = dinv * dinv

        h = x
        for i in range(self.num_rounds):
            ins = instr_vectors[i]
            if graph.has_dense_layout:
                from graphvqa_tpu.ops.dense import broadcast_to_nodes
                ins_nodes = broadcast_to_nodes(graph, ins)
            else:
                ins_pad = jnp.concatenate(
                    [ins, jnp.zeros((1, ins.shape[-1]), ins.dtype)], axis=0)
                ins_nodes = jnp.take(ins_pad, graph.node_graph, axis=0)
            x_cat = jnp.concatenate([h, ins_nodes], axis=-1)

            xw = GlorotLinear(self.out_channels, dtype=self.dtype,
                              name=f"conv_{i}_weight")(x_cat)
            if graph.has_dense_layout:
                # message is linear in edge_norm -> dense MXU SpMM
                from graphvqa_tpu.ops.dense import dense_scatter_matmul
                w_edge = jnp.where(graph.edge_mask, edge_norm, 0.0)[:, None]
                aggr = dense_scatter_matmul(
                    graph, w_edge, xw[:, None, :])[:, 0, :]
            else:
                from graphvqa_tpu.ops.dispatch import aggregate_edge_values
                msgs = jnp.take(xw, graph.edge_src, axis=0) * edge_norm[:, None]
                aggr = aggregate_edge_values(graph, msgs)
            conv_res = aggr + xw * self_norm[:, None]
            conv_res = conv_res + self.param(
                f"conv_{i}_bias", nn.initializers.zeros, (self.out_channels,))
            conv_res = jnp.where(graph.node_mask[:, None], conv_res, 0.0)

            if self.fix_discarded_conv:
                h = conv_res
            if i != self.num_rounds - 1:
                h = MaskedBatchNorm(self.out_channels, dtype=self.dtype,
                                    name=f"bn_{i}")(
                    h, mask=graph.node_mask,
                    use_running_average=use_running_average)
                h = nn.relu(h)
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h


class GINESeq(nn.Module):
    """Five instruction-conditioned GINE rounds (reference:
    pipeline_model_gine.py:622-674; PyG GINEConv semantics, K5):
        out_i = MLP((1+eps) x_i + sum_{j in N(i)} ReLU(x_j + e_ij)),  eps = 0.
    Same ``fix_discarded_conv`` compat flag as :class:`GCNSeq`
    (pipeline_model_gine.py:665-669 has the identical bug).
    """
    out_channels: int
    num_rounds: int = 5
    dropout: float = 0.0
    fix_discarded_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        x: jax.Array,
        edge_attr: jax.Array,
        instr_vectors: jax.Array,
        deterministic: bool = True,
        use_running_average: bool = False,
    ) -> jax.Array:
        N = graph.nodes_pad
        edge_graph = graph.edge_graph()
        h = x
        for i in range(self.num_rounds):
            ins = instr_vectors[i]
            if graph.has_dense_layout:
                from graphvqa_tpu.ops.dense import (
                    broadcast_to_edges, broadcast_to_nodes, dense_gather_src)
                x_cat = jnp.concatenate(
                    [h, broadcast_to_nodes(graph, ins)], axis=-1)
                edge_cat = jnp.concatenate(
                    [edge_attr, broadcast_to_edges(graph, ins)], axis=-1)
                x_src = dense_gather_src(graph, x_cat)
            else:
                ins_pad = jnp.concatenate(
                    [ins, jnp.zeros((1, ins.shape[-1]), ins.dtype)], axis=0)
                x_cat = jnp.concatenate(
                    [h, jnp.take(ins_pad, graph.node_graph, axis=0)], axis=-1)
                edge_cat = jnp.concatenate(
                    [edge_attr, jnp.take(ins_pad, edge_graph, axis=0)],
                    axis=-1)
                x_src = jnp.take(x_cat, graph.edge_src, axis=0)

            msgs = nn.relu(x_src + edge_cat)
            from graphvqa_tpu.ops.dispatch import aggregate_edge_values
            aggr = aggregate_edge_values(graph, msgs)
            conv_res = MLP2(self.out_channels, self.out_channels, self.dtype,
                            name=f"conv_{i}_mlp")(x_cat + aggr)
            conv_res = jnp.where(graph.node_mask[:, None], conv_res, 0.0)

            if self.fix_discarded_conv:
                h = conv_res
            if i != self.num_rounds - 1:
                h = MaskedBatchNorm(self.out_channels, dtype=self.dtype,
                                    name=f"bn_{i}")(
                    h, mask=graph.node_mask,
                    use_running_average=use_running_average)
                h = nn.relu(h)
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h


class LCGNCell(nn.Module):
    """The LCGN message-passing cell (reference: lcgn.py:17-244 ``gat_lcgn``).

    Attention logit per edge = <W_l x_j , proj_cmd_i * W_r x_i> per head;
    message = (W9 x_j * cal_cmd_j) * alpha. Commands are per-graph vectors
    broadcast to nodes (the reference's one-hot matmul becomes a take).
    """
    out_channels: int
    heads: int = 1
    negative_slope: float = 0.2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        x_joint: jax.Array,      # [N, 3*C]
        cmd: jax.Array,          # [B, cmd_dim]
        deterministic: bool = True,
    ) -> jax.Array:
        H, C = self.heads, self.out_channels
        N = graph.nodes_pad

        x_l = GlorotLinear(H * C, name="lin_l")(x_joint).reshape(N, H, C)
        x_r = GlorotLinear(H * C, name="lin_r")(x_joint).reshape(N, H, C)
        if graph.has_dense_layout:
            # per-graph command vectors broadcast to node rows without the
            # [N]-row gather (TPU row gathers serialize; ROOFLINE.md)
            from graphvqa_tpu.ops.dense import broadcast_to_nodes
            proj_cmd = broadcast_to_nodes(
                graph, GlorotLinear(H * C, name="proj_cmd")(cmd))
            cal_cmd = broadcast_to_nodes(
                graph, GlorotLinear(H * C, name="cal_cmd")(cmd))
        else:
            cmd_pad = jnp.concatenate(
                [cmd, jnp.zeros((1, cmd.shape[-1]), cmd.dtype)], axis=0)
            proj_cmd = jnp.take(GlorotLinear(H * C, name="proj_cmd")(cmd_pad),
                                graph.node_graph, axis=0)
            cal_cmd = jnp.take(GlorotLinear(H * C, name="cal_cmd")(cmd_pad),
                               graph.node_graph, axis=0)
        proj_cmd = proj_cmd.reshape(N, H, C)
        cal_cmd = cal_cmd.reshape(N, H, C)

        x_mul = proj_cmd * x_r
        if graph.has_dense_layout:
            from graphvqa_tpu.ops.dense import (
                dense_gather_dst, dense_gather_src, dense_segment_softmax)
            B, epg = graph.num_graphs, graph.edges_per_graph
            x_l_src = dense_gather_src(
                graph, x_l.reshape(N, H * C)).reshape(B * epg, H, C)
            # dst-side gather via the destination incidence matmul
            x_mul_dst = dense_gather_dst(
                graph, x_mul.reshape(N, H * C)).reshape(B * epg, H, C)
            logits = (x_l_src * x_mul_dst).sum(-1)                  # [E, H]
        else:
            logits = (jnp.take(x_l, graph.edge_src, axis=0)
                      * jnp.take(x_mul, graph.edge_dst, axis=0)).sum(-1)
        logits = nn.leaky_relu(logits, self.negative_slope)
        if graph.has_dense_layout:
            alpha = dense_segment_softmax(graph, logits)
        else:
            alpha = segment_softmax(logits, graph.edge_dst, N,
                                    mask=graph.edge_mask,
                                    indices_are_sorted=True)
        alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)

        x_val = GlorotLinear(H * C, name="cal_x")(x_joint).reshape(N, H, C)
        if graph.has_dense_layout:
            # message = alpha * (cal_x * cal_cmd)[src]: linear in alpha ->
            # dense MXU SpMM over the per-graph blocks
            from graphvqa_tpu.ops.dense import dense_scatter_matmul
            out = dense_scatter_matmul(graph, alpha, x_val * cal_cmd)
            out = out.mean(axis=1)  # concat=False
        else:
            msgs = (jnp.take(x_val, graph.edge_src, axis=0)
                    * jnp.take(cal_cmd, graph.edge_src, axis=0)) * alpha[..., None]
            from graphvqa_tpu.ops.dispatch import aggregate_edge_values
            out = aggregate_edge_values(
                graph, msgs.reshape(msgs.shape[0], H * C))
            out = out.reshape(N, H, C).mean(axis=1)  # concat=False
        out = out + self.param("bias", nn.initializers.zeros, (C,))
        return jnp.where(graph.node_mask[:, None], out, 0.0)


class LCGNSeq(nn.Module):
    """LCGN executor: textual-command extraction + 4 fixed context-update
    iterations (reference: lcgn.py:251-323 ``lcgn_seq``).

    ``x_ctx`` is initialized from a PRNG normal; the reference literally calls
    ``torch.randn`` at every forward (lcgn.py:306 — nondeterministic even at
    eval). Here the noise comes from the flax 'lcgn_ctx' RNG stream so eval is
    reproducible; pass a fixed key for deterministic behavior.
    """
    out_channels: int
    max_iters: int = 4
    heads: int = 1
    negative_slope: float = 0.2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        x: jax.Array,                # [N, in_c] encoded nodes
        q_encoding: jax.Array,       # [B, D] first-token question feature
        lstm_outputs: jax.Array,     # [B, L, D] full question memory
        deterministic: bool = True,
        use_running_average: bool = False,
    ) -> jax.Array:
        C = self.out_channels
        x_loc = TorchLinear(C, name="init_sg_emb")(x)
        x_loc = nn.Dropout(self.dropout)(x_loc, deterministic=deterministic)

        ctx_key = self.make_rng("lcgn_ctx")
        x_ctx = jax.random.normal(ctx_key, x_loc.shape, x_loc.dtype)

        q_emb = nn.relu(TorchLinear(C, name="q_input1")(q_encoding))  # [B, C]
        proj_x_loc = TorchLinear(C, name="proj_x_loc")(
            nn.Dropout(self.dropout)(x_loc, deterministic=deterministic))

        # modules shared across iterations (only q_input2_t is per-iteration,
        # lcgn.py:263-266) — instantiate once, call in the loop
        cmd_logits = TorchLinear(1, name="cmd_inter2logits")
        proj_ctx_lin = TorchLinear(C, name="proj_x_ctx")
        cell = LCGNCell(C, self.heads, self.negative_slope,
                        self.dropout, self.dtype, name="cell")
        output_layer = TorchLinear(C, name="output_layer")

        for t in range(self.max_iters):
            # textual command for iteration t (lcgn.py:292-300)
            q_cmd = TorchLinear(C, name=f"q_input2_{t}")(q_emb)        # [B, C]
            raw_att = cmd_logits(q_cmd[:, None, :] * lstm_outputs).squeeze(-1)
            att = jax.nn.softmax(raw_att, axis=-1)                     # [B, L]
            cmd = jnp.einsum("bl,bld->bd", att, lstm_outputs)          # [B, C]

            proj_x_ctx = proj_ctx_lin(
                nn.Dropout(self.dropout)(x_ctx, deterministic=deterministic))
            x_joint = jnp.concatenate(
                [x_loc, x_ctx, proj_x_ctx * proj_x_loc], axis=-1)
            msg_aggr = cell(graph, x_joint, cmd, deterministic=deterministic)
            x_ctx = output_layer(
                jnp.concatenate([x_ctx, msg_aggr], axis=-1))

        out = TorchLinear(C, name="fin_layer")(
            jnp.concatenate([x_loc, x_ctx], axis=-1))
        return jnp.where(graph.node_mask[:, None], out, 0.0)
