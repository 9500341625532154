"""Packing: ragged graphs -> static padded batch with dst-sorted edges."""
import numpy as np
import pytest

from graphvqa_tpu.core import GraphSample, pack_graphs, pick_bucket


def _mk_sample(rng, n, e, tok_w=12, steps=5):
    return GraphSample(
        node_tokens=rng.integers(2, 50, size=(n, tok_w)).astype(np.int32),
        edge_src=rng.integers(0, n, size=e).astype(np.int32),
        edge_dst=rng.integers(0, n, size=e).astype(np.int32),
        edge_tokens=rng.integers(2, 50, size=(e, 1)).astype(np.int32),
        edge_sym=rng.random(e) > 0.5,
        exec_bitmap=(rng.random((n, steps)) > 0.5).astype(np.float32),
    )


def test_pack_roundtrip_and_sorted():
    rng = np.random.default_rng(11)
    samples = [_mk_sample(rng, 5, 12), _mk_sample(rng, 9, 30), _mk_sample(rng, 3, 4)]
    gb = pack_graphs(samples, nodes_pad=32, edges_pad=64)

    assert gb.num_graphs == 3
    total_nodes = sum(s.num_nodes for s in samples)
    total_edges = sum(s.num_edges for s in samples)
    assert gb.node_mask.sum() == total_nodes
    assert gb.edge_mask.sum() == total_edges

    # segment ids
    np.testing.assert_array_equal(np.asarray(gb.node_graph[:5]), 0)
    np.testing.assert_array_equal(np.asarray(gb.node_graph[5:14]), 1)
    np.testing.assert_array_equal(np.asarray(gb.node_graph[14:17]), 2)
    np.testing.assert_array_equal(np.asarray(gb.node_graph[17:]), 3)  # padding segment

    # dst-sorted over the real prefix, and padded tail keeps global sortedness
    dst = np.asarray(gb.edge_dst)
    assert np.all(np.diff(dst) >= 0) or np.all(np.diff(dst[:total_edges]) >= 0)
    assert np.all(dst[total_edges:] == 31)

    # every real edge stays within its own graph's node range
    src = np.asarray(gb.edge_src)[:total_edges]
    ng = np.asarray(gb.node_graph)
    dstg = ng[dst[:total_edges]]
    srcg = ng[src]
    np.testing.assert_array_equal(srcg, dstg)

    # sym sign is -1 exactly where edge_sym was set (order permuted by the sort,
    # so compare multisets per destination graph)
    sym_count = sum(int(s.edge_sym.sum()) for s in samples)
    assert (np.asarray(gb.edge_sym_sign)[:total_edges] == -1).sum() == sym_count

    # node_counts helper
    np.testing.assert_array_equal(np.asarray(gb.node_counts()), [5, 9, 3])

    # edge_graph maps padded edges to the discard segment
    eg = np.asarray(gb.edge_graph())
    assert np.all(eg[total_edges:] == 3)


def test_pack_overflow_raises():
    rng = np.random.default_rng(12)
    with pytest.raises(ValueError):
        pack_graphs([_mk_sample(rng, 40, 10)], nodes_pad=32, edges_pad=64)


def test_pick_bucket():
    assert pick_bucket(100, 900) == (256, 1024)
    assert pick_bucket(300, 100) == (512, 2048)
    with pytest.raises(ValueError):
        pick_bucket(10**9, 10**9)
