"""A trainable, PyG-free torch implementation of the reference GraphVQA-GAT.

The migration dress rehearsal (VERDICT r4 item 5) needs a REAL torch
artifact: a model trained in torch whose ``state_dict()`` carries exactly
the reference's parameter names/shapes (pipeline_model_gat.py:615-731), so
``convert_ckpt_cli --torch-ckpt --torch-vocab`` can be exercised on a
checkpoint that a reference user could have produced. torch_geometric is
not installable here, so the graph ops (MetaLayer scatter_mean, custom gat
message passing with segment softmax, per-graph LayerNorm) are implemented
with plain ``index_add`` — the same math the per-layer parity oracles in
tests/test_torch_parity.py pin down, but as trainable ``nn.Module``s.

State-dict key layout matches tests/test_pipeline_convert._reference_state_dict
(which mirrors the reference checkpoints): text_vocab_embedding,
scene_graph_encoder.{sg_vocab_embedding, scene_graph_encoding_layer.
{edge_model.edge_mlp, node_model.node_mlp_1/2}, graph_layer_norm},
question_encoder.{emb_proj, transformer_encoder}, program_decoder.
{query_embed, emb_proj, coarse_decoder, transformer_decoder, vocab_decoder},
full_answer_decoder.*, gat_seq.{convs.i, bns.i},
graph_global_attention_pooling.{gate_nn, node_nn, ques_nn}, logit_fc.{1,4}.
"""
from __future__ import annotations

import math

import numpy as np
import torch
from torch import nn


def _seq2(i, h, o):
    return nn.Sequential(nn.Linear(i, h), nn.ReLU(), nn.Linear(h, o))


def _pe(x, d):
    """Sinusoidal positional table added to [B, L, D]
    (pipeline_model_gat.py:297-313)."""
    position = torch.arange(0, x.shape[1], dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d, 2).float()
                         * (-math.log(10000.0) / d))
    pe = torch.zeros(x.shape[1], d)
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    return x + pe[None].to(x.device)


class GraphLayerNorm(nn.Module):
    """my_graph_layernorm.py:11-81: per-graph mean/var over nodes x channels
    jointly, scalar affine."""

    def __init__(self):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(1))
        self.bias = nn.Parameter(torch.zeros(1))

    def forward(self, x, batch, num_graphs, eps=1e-5):
        C = x.shape[1]
        ones = torch.ones(x.shape[0], device=x.device)
        counts = torch.zeros(num_graphs, device=x.device).index_add(
            0, batch, ones)
        norm = counts.clamp(min=1) * C
        mean = torch.zeros(num_graphs, device=x.device).index_add(
            0, batch, x.sum(-1)) / norm
        centered = x - mean[batch, None]
        var = torch.zeros(num_graphs, device=x.device).index_add(
            0, batch, (centered * centered).sum(-1)) / norm
        std = var.sqrt()
        return centered / (std[batch, None] + eps) * self.weight + self.bias


class EdgeModel(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.edge_mlp = _seq2(3 * c, c, c)

    def forward(self, x_src, x_dst, e):
        return self.edge_mlp(torch.cat([x_src, x_dst, e], -1))


class NodeModel(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.node_mlp_1 = _seq2(2 * c, c, c)
        self.node_mlp_2 = _seq2(2 * c, c, c)

    def forward(self, x, src, dst, e):
        msg = self.node_mlp_1(torch.cat([x[src], e], -1))
        n = x.shape[0]
        counts = torch.zeros(n, device=x.device).index_add(
            0, dst, torch.ones(len(dst), device=x.device))
        aggr = torch.zeros_like(x).index_add(0, dst, msg) \
            / counts.clamp(min=1)[:, None]
        return self.node_mlp_2(torch.cat([x, aggr], -1))


class MetaLayer(nn.Module):
    """One PyG MetaLayer round (pipeline_model_gat.py:63-101)."""

    def __init__(self, c):
        super().__init__()
        self.edge_model = EdgeModel(c)
        self.node_model = NodeModel(c)

    def forward(self, x, src, dst, e):
        e_out = self.edge_model(x[src], x[dst], e)
        x_out = self.node_model(x, src, dst, e_out)
        return x_out, e_out


class SceneGraphEncoder(nn.Module):
    def __init__(self, sg_vocab, emb):
        super().__init__()
        self.sg_vocab_embedding = nn.Embedding(sg_vocab, emb, padding_idx=1)
        self.scene_graph_encoding_layer = MetaLayer(emb)
        self.graph_layer_norm = GraphLayerNorm()

    def forward(self, node_tokens, edge_tokens, sym_sign, src, dst, batch,
                num_graphs):
        x = self.sg_vocab_embedding(node_tokens).sum(1)
        e = self.sg_vocab_embedding(edge_tokens).sum(1) * sym_sign[:, None]
        x, e_out = self.scene_graph_encoding_layer(x, src, dst, e)
        x = self.graph_layer_norm(x, batch, num_graphs)
        return x, e_out


class QuestionEncoder(nn.Module):
    def __init__(self, emb_dim, d, heads, ffn, layers):
        super().__init__()
        self.emb_proj = nn.Linear(emb_dim, d)
        layer = nn.TransformerEncoderLayer(
            d, heads, dim_feedforward=ffn, dropout=0.0, batch_first=True)
        self.transformer_encoder = nn.TransformerEncoder(
            layer, layers, norm=nn.LayerNorm(d))
        self.d = d

    def forward(self, q_emb):
        q = _pe(self.emb_proj(q_emb) * math.sqrt(self.d), self.d)
        return self.transformer_encoder(q)


class ProgramDecoder(nn.Module):
    def __init__(self, emb_dim, d, heads, ffn, layers, vocab, m):
        super().__init__()
        self.query_embed = nn.Embedding(m, d)
        self.emb_proj = nn.Linear(emb_dim, d)
        dlayer = nn.TransformerDecoderLayer(
            d, heads, dim_feedforward=ffn, dropout=0.0, batch_first=True)
        self.coarse_decoder = nn.TransformerDecoder(
            dlayer, layers, norm=nn.LayerNorm(d))
        dlayer2 = nn.TransformerDecoderLayer(
            d, heads, dim_feedforward=ffn, dropout=0.0, batch_first=True)
        self.transformer_decoder = nn.TransformerDecoder(
            dlayer2, layers, norm=nn.LayerNorm(d))
        self.vocab_decoder = nn.Linear(d, vocab)
        self.d, self.m = d, m

    def forward(self, memory, programs_in_emb):
        B = memory.shape[0]
        queries = self.query_embed.weight[None].repeat(B, 1, 1)
        instr = self.coarse_decoder(queries, memory)          # [B, M, D]
        instr_flat = instr.reshape(B * self.m, self.d)
        memory_rep = memory.repeat_interleave(self.m, dim=0)
        Lp = programs_in_emb.shape[1]
        tgt = _pe(self.emb_proj(programs_in_emb) * math.sqrt(self.d), self.d)
        tgt = torch.cat([instr_flat[:, None, :], tgt[:, 1:]], 1)
        cmask = torch.triu(torch.full((Lp, Lp), float("-inf"),
                                      device=memory.device), diagonal=1)
        out = self.transformer_decoder(tgt, memory_rep, tgt_mask=cmask)
        return self.vocab_decoder(out), instr


class FullAnswerDecoder(nn.Module):
    def __init__(self, emb_dim, d, heads, ffn, layers, vocab):
        super().__init__()
        self.emb_proj = nn.Linear(emb_dim, d)
        dlayer = nn.TransformerDecoderLayer(
            d, heads, dim_feedforward=ffn, dropout=0.0, batch_first=True)
        self.transformer_decoder = nn.TransformerDecoder(
            dlayer, layers, norm=nn.LayerNorm(d))
        self.vocab_decoder = nn.Linear(d, vocab)
        self.d = d

    def forward(self, memory, fa_in_emb):
        Lf = fa_in_emb.shape[1]
        tgt = _pe(self.emb_proj(fa_in_emb) * math.sqrt(self.d), self.d)
        cmask = torch.triu(torch.full((Lf, Lf), float("-inf"),
                                      device=memory.device), diagonal=1)
        return self.vocab_decoder(
            self.transformer_decoder(tgt, memory, tgt_mask=cmask))


class RefGATConv(nn.Module):
    """gat_skip.py:16-213: shared lin_l=lin_r node projection, per-head
    attention params, segment softmax over destination, sum aggregation,
    concat=False head mean + bias."""

    def __init__(self, in_c, e_c, out_c, heads):
        super().__init__()
        self.lin_l = nn.Linear(in_c, heads * out_c, bias=False)
        self.lin_e = nn.Linear(e_c, heads * out_c, bias=False)
        self.att_l = nn.Parameter(torch.empty(1, heads, out_c))
        self.att_r = nn.Parameter(torch.empty(1, heads, out_c))
        self.att_e = nn.Parameter(torch.empty(1, heads, out_c))
        self.bias = nn.Parameter(torch.zeros(out_c))
        for p in (self.att_l, self.att_r, self.att_e):
            nn.init.xavier_uniform_(p)
        self.h, self.c = heads, out_c

    def forward(self, x, src, dst, e):
        n = x.shape[0]
        xw = self.lin_l(x).view(n, self.h, self.c)
        ew = self.lin_e(e).view(-1, self.h, self.c)
        a_l = (xw * self.att_l).sum(-1)
        a_r = (xw * self.att_r).sum(-1)
        a_e = (ew * self.att_e).sum(-1)
        logits = nn.functional.leaky_relu(a_l[src] + a_r[dst] + a_e, 0.2)
        with torch.no_grad():  # max-subtract is gradient-neutral
            seg_max = torch.full((n, self.h), -1e30).index_reduce_(
                0, dst, logits.detach(), "amax", include_self=False)
        expd = (logits - seg_max[dst]).exp()
        denom = torch.zeros(n, self.h, device=x.device).index_add(
            0, dst, expd)
        alpha = expd / (denom[dst] + 1e-16)
        msgs = xw[src] * alpha[..., None]
        out = torch.zeros(n, self.h, self.c, device=x.device).index_add(
            0, dst, msgs)
        return out.mean(1) + self.bias


class GATSeq(nn.Module):
    """gat_skip.py:220-279: R instruction-conditioned rounds, skip
    connection, BatchNorm+ReLU between (not after the last) rounds."""

    def __init__(self, c, d, heads, rounds):
        super().__init__()
        self.convs = nn.ModuleList(
            [RefGATConv(c + d, c + d, c, heads) for _ in range(rounds)])
        self.bns = nn.ModuleList(
            [nn.BatchNorm1d(c) for _ in range(rounds - 1)])
        self.rounds = rounds

    def forward(self, h, e, instr, src, dst, batch):
        edge_graph = batch[src]
        for i in range(self.rounds):
            ins = instr[:, i, :]                              # [B, D]
            x_cat = torch.cat([h, ins[batch]], -1)
            e_cat = torch.cat([e, ins[edge_graph]], -1)
            h = self.convs[i](x_cat, src, dst, e_cat) + h
            if i != self.rounds - 1:
                h = torch.relu(self.bns[i](h))
        return h


class Pooling(nn.Module):
    """MyConditionalGlobalAttention (pipeline_model_gat.py:108-185)."""

    def __init__(self, c, d):
        super().__init__()
        self.gate_nn = _seq2(d, d, 1)
        self.node_nn = _seq2(c, d, d)
        self.ques_nn = _seq2(d, d, d)

    def forward(self, x, q_feat, batch, num_graphs):
        xn = self.node_nn(x)
        uq = self.ques_nn(q_feat)
        gate = self.gate_nn(uq[batch] * xn)
        with torch.no_grad():
            seg_max = torch.full((num_graphs, 1), -1e30).index_reduce_(
                0, batch, gate.detach(), "amax", include_self=False)
        expd = (gate - seg_max[batch]).exp()
        denom = torch.zeros(num_graphs, 1, device=x.device).index_add(
            0, batch, expd)
        gate = expd / (denom[batch] + 1e-16)
        return torch.zeros(num_graphs, xn.shape[1],
                           device=x.device).index_add(0, batch, gate * xn)


class TorchGraphVQA(nn.Module):
    """The full reference pipeline, trainable, reference state_dict names."""

    def __init__(self, text_vocab, sg_vocab, emb=48, d=64, heads=4, ffn=128,
                 layers=2, engine_heads=4, rounds=5, m=5,
                 classifier_hidden=64, num_answers=1842):
        super().__init__()
        self.text_vocab_embedding = nn.Embedding(text_vocab, emb,
                                                 padding_idx=1)
        self.scene_graph_encoder = SceneGraphEncoder(sg_vocab, emb)
        self.question_encoder = QuestionEncoder(emb, d, heads, ffn, layers)
        self.program_decoder = ProgramDecoder(emb, d, heads, ffn, layers,
                                              text_vocab, m)
        self.full_answer_decoder = FullAnswerDecoder(emb, d, heads, ffn,
                                                     layers, text_vocab)
        self.gat_seq = GATSeq(emb, d, engine_heads, rounds)
        self.graph_global_attention_pooling = Pooling(emb, d)
        self.logit_fc = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(3 * d, classifier_hidden), nn.ELU(),
            nn.Dropout(0.2), nn.Linear(classifier_hidden, num_answers))

    def forward(self, questions, node_tokens, edge_tokens, sym_sign, src,
                dst, batch, num_graphs, programs_in, full_answers_in=None):
        x, e = self.scene_graph_encoder(
            node_tokens, edge_tokens, sym_sign, src, dst, batch, num_graphs)
        memory = self.question_encoder(self.text_vocab_embedding(questions))
        prog_logits, instr = self.program_decoder(
            memory, self.text_vocab_embedding(programs_in))
        h = self.gat_seq(x, e, instr, src, dst, batch)
        q_feat = memory[:, 0, :]
        g = self.graph_global_attention_pooling(h, q_feat, batch, num_graphs)
        logits = self.logit_fc(torch.cat([g, q_feat, g * q_feat], -1))
        fa_logits = None
        if full_answers_in is not None:
            fa_logits = self.full_answer_decoder(
                memory, self.text_vocab_embedding(full_answers_in))
        return logits, prog_logits, fa_logits


def torch_inputs_from_items(items, questions_np, programs_np,
                            full_answers_np=None):
    """Map a list of GQADataset items + padded question/program id arrays to
    the flat concatenated tensors TorchGraphVQA.forward takes. Questions and
    programs come from the SAME collate the framework uses, so both sides
    numericalize identically."""
    graphs = [it["graph"] for it in items]
    offs = np.cumsum([0] + [g.node_tokens.shape[0] for g in graphs])
    node_tokens = np.concatenate([g.node_tokens for g in graphs])
    src = np.concatenate(
        [g.edge_src + offs[i] for i, g in enumerate(graphs)])
    dst = np.concatenate(
        [g.edge_dst + offs[i] for i, g in enumerate(graphs)])
    etok = np.concatenate([g.edge_tokens for g in graphs])
    sym = np.concatenate(
        [np.where(g.edge_sym, -1.0, 1.0) for g in graphs]).astype(np.float32)
    batch = np.repeat(np.arange(len(graphs)),
                      [g.node_tokens.shape[0] for g in graphs])
    out = dict(
        questions=torch.from_numpy(np.asarray(questions_np, np.int64)),
        node_tokens=torch.from_numpy(node_tokens.astype(np.int64)),
        edge_tokens=torch.from_numpy(etok.astype(np.int64)),
        sym_sign=torch.from_numpy(sym),
        src=torch.from_numpy(src.astype(np.int64)),
        dst=torch.from_numpy(dst.astype(np.int64)),
        batch=torch.from_numpy(batch.astype(np.int64)),
        num_graphs=len(graphs),
        programs_in=torch.from_numpy(
            np.asarray(programs_np, np.int64)[:, :-1]),
    )
    if full_answers_np is not None:
        out["full_answers_in"] = torch.from_numpy(
            np.asarray(full_answers_np, np.int64)[:, :-1])
    return out
