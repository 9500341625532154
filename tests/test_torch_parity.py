"""Per-layer activation parity vs PyTorch (BASELINE.md: "allclose").

Each test builds the *torch* module (the exact stock layer the reference
uses — nn.TransformerEncoder/Decoder, nn.BatchNorm1d — or a plain-torch
oracle of the reference's custom math for gat_skip.py / my_graph_layernorm.py),
transfers its weights through :mod:`graphvqa_tpu.models.torch_convert` (the
same converter a reference-checkpoint migration would use), runs both on the
same inputs, and asserts allclose. PyG is not installed here, so the custom
graph layers are oracled with plain torch index/scatter ops implementing the
reference source line by line.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from graphvqa_tpu.models.torch_convert import (
    convert_batchnorm1d, convert_gat_layer, convert_transformer_stack, to_jax)

RTOL, ATOL = 1e-4, 1e-5


def _np_sd(module, prefix):
    # .copy(): torch .numpy() shares memory with the tensor, and CPU jax can
    # alias numpy buffers — torch's in-place running-stat updates would then
    # mutate the converted params after the fact
    return {f"{prefix}.{k}": v.detach().numpy().copy()
            for k, v in module.state_dict().items()}


# ---------------------------------------------------------------- encoder --

def test_transformer_encoder_matches_torch():
    """3-layer post-LN encoder (reference: pipeline_model_gat.py:641-649)."""
    from graphvqa_tpu.nn.transformer import TransformerEncoder
    torch.manual_seed(0)
    D, HEADS, FFN, L = 32, 4, 64, 3
    layer = torch.nn.TransformerEncoderLayer(
        D, HEADS, dim_feedforward=FFN, dropout=0.0, batch_first=True)
    tenc = torch.nn.TransformerEncoder(layer, L, norm=torch.nn.LayerNorm(D))
    tenc.eval()

    x = torch.randn(5, 9, D)
    with torch.no_grad():
        want = tenc(x).numpy()

    params = to_jax(convert_transformer_stack(_np_sd(tenc, "enc"), "enc", L))
    enc = TransformerEncoder(num_layers=L, d_model=D, num_heads=HEADS,
                             ffn_dim=FFN, dropout=0.0)
    got = enc.apply({"params": params}, jnp.asarray(x.numpy()),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_transformer_decoder_matches_torch():
    """Post-LN decoder with causal self-attention mask (reference:
    pipeline_model_gat.py:334-341,374-376)."""
    from graphvqa_tpu.nn.transformer import TransformerDecoder, causal_mask
    torch.manual_seed(1)
    D, HEADS, FFN, L, T = 32, 4, 64, 3, 7
    layer = torch.nn.TransformerDecoderLayer(
        D, HEADS, dim_feedforward=FFN, dropout=0.0, batch_first=True)
    tdec = torch.nn.TransformerDecoder(layer, L, norm=torch.nn.LayerNorm(D))
    tdec.eval()

    tgt = torch.randn(4, T, D)
    mem = torch.randn(4, 11, D)
    tmask = torch.from_numpy(np.asarray(causal_mask(T)))
    with torch.no_grad():
        want = tdec(tgt, mem, tgt_mask=tmask).numpy()

    params = to_jax(convert_transformer_stack(
        _np_sd(tdec, "dec"), "dec", L, decoder=True))
    dec = TransformerDecoder(num_layers=L, d_model=D, num_heads=HEADS,
                             ffn_dim=FFN, dropout=0.0)
    got = dec.apply({"params": params}, jnp.asarray(tgt.numpy()),
                    jnp.asarray(mem.numpy()), tgt_mask=causal_mask(T),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


# -------------------------------------------------------------- batchnorm --

def test_batchnorm1d_matches_torch():
    """Inter-round BatchNorm1d (reference: gat_skip.py:235,273-276): one
    training forward must match outputs AND the running-stats update, then an
    eval forward must match under the running averages."""
    from graphvqa_tpu.nn.norm import MaskedBatchNorm
    torch.manual_seed(2)
    C, N = 12, 37
    tbn = torch.nn.BatchNorm1d(C)
    # randomize affine + initial running stats so the transfer is non-trivial
    with torch.no_grad():
        tbn.weight.copy_(torch.randn(C))
        tbn.bias.copy_(torch.randn(C))
        tbn.running_mean.copy_(torch.randn(C) * 0.1)
        tbn.running_var.copy_(torch.rand(C) + 0.5)

    params, stats = convert_batchnorm1d(_np_sd(tbn, "bn"), "bn")
    variables = {"params": to_jax(params), "batch_stats": to_jax(stats)}
    bn = MaskedBatchNorm(C)

    x = torch.randn(N, C)
    tbn.train()
    want_train = tbn(x).detach().numpy()
    got_train, mutated = bn.apply(variables, jnp.asarray(x.numpy()),
                                  use_running_average=False,
                                  mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_train), want_train,
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=RTOL, atol=ATOL)

    tbn.eval()
    x2 = torch.randn(N, C)
    with torch.no_grad():
        want_eval = tbn(x2).numpy()
    got_eval = bn.apply({"params": variables["params"],
                         "batch_stats": mutated["batch_stats"]},
                        jnp.asarray(x2.numpy()), use_running_average=True)
    np.testing.assert_allclose(np.asarray(got_eval), want_eval,
                               rtol=RTOL, atol=ATOL)


# ------------------------------------------------------- graph layer norm --

def _torch_graph_layernorm(x, batch, num_graphs, weight, bias, eps=1e-5):
    """Reference my_graph_layernorm.py:52-78 verbatim in plain torch:
    per-graph mean/var over nodes x channels jointly, scalar affine, eps
    added to the std, count clamped to 1."""
    C = x.shape[1]
    ones = torch.ones(x.shape[0])
    counts = torch.zeros(num_graphs).index_add_(0, batch, ones)
    norm = counts.clamp(min=1) * C
    mean = torch.zeros(num_graphs).index_add_(0, batch, x.sum(-1)) / norm
    centered = x - mean[batch, None]
    var = torch.zeros(num_graphs).index_add_(
        0, batch, (centered * centered).sum(-1)) / norm
    std = var.sqrt()
    out = centered / (std[batch, None] + eps)
    return out * weight + bias


def test_graph_layernorm_matches_torch_oracle():
    from graphvqa_tpu.ops.layernorm import graph_layer_norm
    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    C, G = 10, 4
    sizes = [3, 7, 1, 5]
    batch = np.repeat(np.arange(G), sizes)
    x = rng.normal(size=(len(batch), C)).astype(np.float32)
    weight, bias = 1.7, -0.3

    want = _torch_graph_layernorm(
        torch.from_numpy(x), torch.from_numpy(batch), G,
        weight, bias).numpy()
    got = graph_layer_norm(
        jnp.asarray(x), jnp.asarray(batch), G,
        jnp.asarray(weight), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


# ------------------------------------------------------------- GAT layer --

def _torch_gat_oracle(sd, x, edge_index, edge_attr, H, C, neg_slope=0.2):
    """Reference gat_skip.py:110-208 in plain torch: shared lin_l/lin_r node
    projection, collapsed per-head attention scores, leaky_relu, segment
    softmax over destinations (+1e-16), sum aggregation, head mean + bias."""
    src, dst = edge_index
    N = x.shape[0]
    xw = (x @ torch.from_numpy(sd["lin_l.weight"]).T).view(N, H, C)
    ew = (edge_attr @ torch.from_numpy(sd["lin_e.weight"]).T).view(-1, H, C)
    att_l = torch.from_numpy(sd["att_l"])
    att_r = torch.from_numpy(sd["att_r"])
    att_e = torch.from_numpy(sd["att_e"])
    a_l = (xw * att_l).sum(-1)          # [N, H]
    a_r = (xw * att_r).sum(-1)
    a_e = (ew * att_e).sum(-1)          # [E, H]
    logits = torch.nn.functional.leaky_relu(
        a_l[src] + a_r[dst] + a_e, neg_slope)
    # torch_geometric.utils.softmax over dst
    seg_max = torch.full((N, H), -1e30).index_reduce_(
        0, dst, logits, "amax", include_self=False)
    expd = (logits - seg_max[dst]).exp()
    denom = torch.zeros(N, H).index_add_(0, dst, expd)
    alpha = expd / (denom[dst] + 1e-16)
    msgs = xw[src] * alpha[..., None]   # [E, H, C]
    out = torch.zeros(N, H, C).index_add_(0, dst, msgs)
    return out.mean(1) + torch.from_numpy(sd["bias"])


def test_gat_layer_matches_torch_oracle():
    from graphvqa_tpu.core import pack_graphs, pack_graphs_dense
    from graphvqa_tpu.nn.gnn import GATLayer
    from tests.helpers import random_sample

    rng = np.random.default_rng(7)
    H, C = 2, 8
    samples = [random_sample(rng, int(rng.integers(4, 8)),
                             int(rng.integers(5, 14))) for _ in range(4)]

    # torch side: one concatenated graph, real edges only
    offs = np.cumsum([0] + [s.num_nodes for s in samples])
    n_total = offs[-1]
    src = np.concatenate([s.edge_src + offs[i] for i, s in enumerate(samples)])
    dst = np.concatenate([s.edge_dst + offs[i] for i, s in enumerate(samples)])
    x = rng.normal(size=(n_total, C)).astype(np.float32)
    e = rng.normal(size=(len(src), C)).astype(np.float32)

    sd = {
        "lin_l.weight": rng.normal(size=(H * C, C)).astype(np.float32) * 0.3,
        "lin_e.weight": rng.normal(size=(H * C, C)).astype(np.float32) * 0.3,
        "att_l": rng.normal(size=(1, H, C)).astype(np.float32) * 0.3,
        "att_r": rng.normal(size=(1, H, C)).astype(np.float32) * 0.3,
        "att_e": rng.normal(size=(1, H, C)).astype(np.float32) * 0.3,
        "bias": rng.normal(size=(C,)).astype(np.float32),
    }
    want = _torch_gat_oracle(
        sd, torch.from_numpy(x),
        (torch.from_numpy(src), torch.from_numpy(dst)),
        torch.from_numpy(e), H, C).numpy()

    params = to_jax(convert_gat_layer(sd))
    layer = GATLayer(out_channels=C, heads=H, dropout=0.0)

    for packing in ("flat", "dense"):
        if packing == "flat":
            gb = pack_graphs(samples, nodes_pad=48, edges_pad=96)
        else:
            gb = pack_graphs_dense(samples, 8, 16)
        gb = jax.tree.map(jnp.asarray, gb)
        # place features at the packed row positions
        nm = np.asarray(gb.node_mask)
        em = np.asarray(gb.edge_mask)
        xp = np.zeros((gb.nodes_pad, C), np.float32)
        ep = np.zeros((gb.edges_pad, C), np.float32)
        # both packings keep nodes in (graph, local) order and edges
        # (graph, dst_local)-sorted — rebuild the same order on the oracle side
        order = np.lexsort((np.arange(len(dst)),
                            dst - offs[:-1].repeat(
                                [s.num_edges for s in samples]),
                            np.repeat(np.arange(len(samples)),
                                      [s.num_edges for s in samples])))
        xp[nm] = x
        ep[em] = e[order]
        got = layer.apply({"params": params}, gb, jnp.asarray(xp),
                          jnp.asarray(ep), deterministic=True)
        np.testing.assert_allclose(
            np.asarray(got)[nm], want, rtol=5e-4, atol=5e-5,
            err_msg=f"packing={packing}")


# ---------------------------------------------------- positional encoding --

def test_positional_encoding_matches_torch_oracle():
    """Sinusoidal PE table (reference: pipeline_model_gat.py:297-313)."""
    from graphvqa_tpu.nn.transformer import PositionalEncoding
    D, L = 16, 11
    position = torch.arange(0, 5000, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, D, 2).float()
                         * (-math.log(10000.0) / D))
    pe = torch.zeros(5000, D)
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)

    x = torch.randn(3, L, D)
    want = (x + pe[:L]).numpy()
    mod = PositionalEncoding(d_model=D, dropout=0.0)
    got = mod.apply({}, jnp.asarray(x.numpy()), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)
