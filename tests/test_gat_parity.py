"""GAT layer parity: dense numpy oracle (PyG semantics) + algebraic-split
equivalence of the instruction-vector optimization."""
import numpy as np
import jax
import jax.numpy as jnp

from graphvqa_tpu.nn.gnn import GATLayer
from tests.helpers import random_qa_batch, tiny_model_config


def _leaky(x, s=0.2):
    return np.where(x > 0, x, s * x)


def _oracle_gat(params, g, x, e_attr, H, C):
    """Dense implementation of gat_skip.py:111-208 semantics."""
    w = np.asarray(params["lin_lr"], np.float64)
    we = np.asarray(params["lin_e"], np.float64)
    att_l = np.asarray(params["att_l"], np.float64)
    att_r = np.asarray(params["att_r"], np.float64)
    att_e = np.asarray(params["att_e"], np.float64)
    bias = np.asarray(params["bias"], np.float64)

    N = x.shape[0]
    xw = (x @ w).reshape(N, H, C)
    al = (xw * att_l).sum(-1)
    ar = (xw * att_r).sum(-1)
    ew = (e_attr @ we).reshape(-1, H, C)
    ae = (ew * att_e).sum(-1)

    src = np.asarray(g.edge_src)
    dst = np.asarray(g.edge_dst)
    mask = np.asarray(g.edge_mask)
    logits = _leaky(al[src] + ar[dst] + ae)

    out = np.zeros((N, H, C))
    for i in range(N):
        sel = (dst == i) & mask
        if not sel.any():
            continue
        lg = logits[sel]                                   # [k, H]
        a = np.exp(lg - lg.max(axis=0, keepdims=True))
        a = a / (a.sum(axis=0, keepdims=True) + 1e-16)
        out[i] = np.einsum("kh,khc->hc", a, xw[src[sel]])
    res = out.mean(axis=1) + bias
    res[~np.asarray(g.node_mask)] = 0.0
    return res


def test_gat_layer_matches_dense_oracle():
    cfg = tiny_model_config("gat")
    batch = random_qa_batch(cfg=cfg, nodes_pad=32, edges_pad=64)
    g = batch.graphs
    H, C, in_dim = 2, 8, 8

    layer = GATLayer(out_channels=C, heads=H, dropout=0.0)
    x = np.random.default_rng(0).normal(size=(g.nodes_pad, in_dim)).astype(np.float32)
    e = np.random.default_rng(1).normal(size=(g.edges_pad, in_dim)).astype(np.float32)
    variables = layer.init({"params": jax.random.key(2)}, g,
                           jnp.asarray(x), jnp.asarray(e))
    got = np.asarray(layer.apply(variables, g, jnp.asarray(x), jnp.asarray(e)))
    want = _oracle_gat(variables["params"], g, x.astype(np.float64),
                       e.astype(np.float64), H, C)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_split_ins_equals_concat():
    """GATLayer(x, e, ins) == GATLayer(concat[x,ins_per_node],
    concat[e,ins_per_edge]) with identical parameters."""
    cfg = tiny_model_config("gat")
    batch = random_qa_batch(cfg=cfg, nodes_pad=32, edges_pad=64)
    g = batch.graphs
    B = g.num_graphs
    H, C, x_dim, ins_dim = 2, 8, 8, 6

    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (g.nodes_pad, x_dim))
    e = jax.random.normal(jax.random.fold_in(key, 2), (g.edges_pad, x_dim))
    ins = jax.random.normal(jax.random.fold_in(key, 3), (B, ins_dim))

    layer = GATLayer(out_channels=C, heads=H, dropout=0.0)
    variables = layer.init({"params": jax.random.key(4)}, g, x, e, ins=ins)
    got_split = layer.apply(variables, g, x, e, ins=ins)

    # concat formulation with the same parameters
    ins_pad = jnp.concatenate([ins, jnp.zeros((1, ins_dim))], axis=0)
    x_cat = jnp.concatenate(
        [x, jnp.take(ins_pad, g.node_graph, axis=0)], axis=-1)
    e_cat = jnp.concatenate(
        [e, jnp.take(ins_pad, g.edge_graph(), axis=0)], axis=-1)
    got_cat = layer.apply(variables, g, x_cat, e_cat, ins=None)

    np.testing.assert_allclose(np.asarray(got_split), np.asarray(got_cat),
                               rtol=1e-4, atol=1e-5)
