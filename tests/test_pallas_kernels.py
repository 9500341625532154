"""Pallas kernel parity (interpret mode on CPU) vs the XLA blocked path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphvqa_tpu.ops.pallas import pallas_available, pallas_blocked_aggregate

pytestmark = pytest.mark.skipif(not pallas_available(),
                                reason="pallas unavailable")


def test_blocked_aggregate_matches_dense():
    rng = np.random.default_rng(0)
    nb, BE, BN, D = 4, 32, 8, 16
    dst_local = rng.integers(0, BN, size=(nb, BE)).astype(np.int32)
    alpha = rng.random((nb, BE)).astype(np.float32)
    alpha[:, -5:] = 0.0  # padding slots
    feats = rng.normal(size=(nb, BE, D)).astype(np.float32)

    got = np.asarray(pallas_blocked_aggregate(
        jnp.asarray(dst_local), jnp.asarray(alpha), jnp.asarray(feats),
        block_nodes=BN, interpret=True))

    want = np.zeros((nb * BN, D), np.float32)
    for i in range(nb):
        for e in range(BE):
            want[i * BN + dst_local[i, e]] += alpha[i, e] * feats[i, e]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_blocked_aggregate_multihead_interleaved():
    """Multi-head path: alpha tiled over C-major (head-interleaved) lanes."""
    rng = np.random.default_rng(1)
    nb, BE, BN, H, C = 3, 16, 4, 2, 5
    dst = rng.integers(0, BN, (nb, BE)).astype(np.int32)
    alpha = rng.random((nb, BE, H)).astype(np.float32)
    feats = rng.normal(size=(nb, BE, H * C)).astype(np.float32)
    got = np.asarray(pallas_blocked_aggregate(
        jnp.asarray(dst), jnp.asarray(alpha), jnp.asarray(feats), BN,
        interpret=True))
    want = np.zeros((nb * BN, H * C), np.float32)
    for i in range(nb):
        for e in range(BE):
            w = np.tile(alpha[i, e], C)   # lane l -> head l % H
            want[i * BN + dst[i, e]] += w * feats[i, e]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_gat_round_matches_xla_blocked():
    """Fused softmax+aggregate kernel == XLA blocked softmax + aggregation."""
    import jax
    from graphvqa_tpu.core.packing import build_blocked_edges
    from graphvqa_tpu.ops.blocked import blocked_gat_aggregate
    from graphvqa_tpu.ops.pallas.fused_gat import pallas_fused_gat_round
    from tests.helpers import random_qa_batch, tiny_model_config

    cfg = tiny_model_config("gat")
    batch = random_qa_batch(cfg=cfg, num_graphs=3, nodes_pad=32, edges_pad=128)
    # generous slots -> no spill (fused kernel requirement)
    g = build_blocked_edges(batch.graphs, block_nodes=8, slots_per_node=16,
                            spill_pad=64)
    assert int(np.asarray(g.spill_mask).sum()) == 0

    H, C = 2, 8
    N = g.nodes_pad
    key = jax.random.key(0)
    xw = jax.random.normal(jax.random.fold_in(key, 1), (N, H, C))
    al = jax.random.normal(jax.random.fold_in(key, 2), (N, H))
    ar = jax.random.normal(jax.random.fold_in(key, 3), (N, H))
    ae = jax.random.normal(jax.random.fold_in(key, 4), (g.edges_pad, H))

    want, _ = blocked_gat_aggregate(g, xw, al, ar, ae)   # [N, H, C]

    # build the fused kernel's inputs exactly as the dispatch layer does
    nb, BE = g.blk_src.shape
    blk_dst_global = (g.blk_dst_local
                      + jax.lax.broadcasted_iota(jnp.int32, (nb, BE), 0)
                      * g.block_nodes)
    lg = (jnp.take(al, g.blk_src, axis=0)
          + jnp.take(ar, blk_dst_global, axis=0)
          + jnp.take(ae, g.blk_edge_perm, axis=0))
    lg = jax.nn.leaky_relu(lg, 0.2)
    lg = jnp.where(g.blk_mask[..., None], lg, -1e30)
    xw_cm = jnp.transpose(xw, (0, 2, 1)).reshape(N, C * H)
    feats = jnp.take(xw_cm, g.blk_src, axis=0).reshape(nb, BE, H * C)
    got_cm = pallas_fused_gat_round(g.blk_dst_local, lg, feats,
                                    g.block_nodes, interpret=True)
    got = jnp.transpose(got_cm.reshape(N, C, H), (0, 2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_dense_gat_matches_xla(monkeypatch):
    """Interpret-mode parity: the fused dense-round kernel == the XLA dense
    path (ops/dense.py:dense_gat_aggregate) on a ragged dense batch."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from graphvqa_tpu.core import pack_graphs_dense
    from graphvqa_tpu.ops.dense import dense_gat_aggregate
    from graphvqa_tpu.ops.pallas.fused_dense_gat import pallas_fused_dense_gat
    from tests.helpers import random_sample

    rng = np.random.default_rng(17)
    samples = [random_sample(rng, int(rng.integers(3, 8)),
                             int(rng.integers(4, 16))) for _ in range(6)]
    g = jax.tree.map(jnp.asarray, pack_graphs_dense(samples, 8, 16))
    B, npg, epg = g.num_graphs, g.nodes_per_graph, g.edges_per_graph
    N, H, C = g.nodes_pad, 2, 12
    xw = jnp.asarray(rng.normal(size=(N, H, C)), jnp.float32)
    al = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    ar = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    ae = jnp.asarray(rng.normal(size=(g.edges_pad, H)), jnp.float32)

    want, _ = dense_gat_aggregate(g, xw, al, ar, ae)   # head-averaged [N, C]

    dl = (g.edge_dst % npg).reshape(B, epg)
    sl = (g.edge_src % npg).reshape(B, epg)
    mask = g.edge_mask.reshape(B, epg).astype(jnp.float32)
    got = pallas_fused_dense_gat(
        dl, sl, mask, al, ar, ae.reshape(B, epg, H), xw.reshape(N, H * C),
        npg=npg, epg=epg, H=H, C=C, graphs_per_step=2, interpret=True)
    got = np.asarray(got).reshape(N, H, C).mean(axis=1)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)
