"""Native C++ packer parity vs the numpy reference path."""
import numpy as np
import pytest

from graphvqa_tpu.core.native import (
    native_available, pack_graphs_native)
from graphvqa_tpu.core.packing import pack_graphs
from tests.helpers import random_sample

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def _samples(seed=0, n_graphs=5):
    rng = np.random.default_rng(seed)
    return [random_sample(rng, int(rng.integers(3, 20)),
                          int(rng.integers(4, 60))) for _ in range(n_graphs)]


def test_pack_matches_python():
    samples = _samples()
    py = pack_graphs(samples, nodes_pad=128, edges_pad=512)
    cc = pack_graphs_native(samples, nodes_pad=128, edges_pad=512)

    np.testing.assert_array_equal(cc.node_tokens, py.node_tokens)
    np.testing.assert_array_equal(cc.node_graph, py.node_graph)
    np.testing.assert_array_equal(cc.node_mask, py.node_mask)
    np.testing.assert_array_equal(cc.edge_src, py.edge_src)
    np.testing.assert_array_equal(cc.edge_dst, py.edge_dst)
    np.testing.assert_array_equal(cc.edge_tokens, py.edge_tokens)
    np.testing.assert_array_equal(cc.edge_mask, py.edge_mask)
    np.testing.assert_array_equal(cc.edge_sym_sign, py.edge_sym_sign)
    np.testing.assert_array_equal(cc.exec_bitmap, py.exec_bitmap)


def test_native_overflow_raises():
    samples = _samples(seed=4)
    with pytest.raises(ValueError):
        pack_graphs_native(samples, nodes_pad=8, edges_pad=512)


def test_native_dense_matches_python():
    from graphvqa_tpu.core.native import pack_graphs_dense_native
    from graphvqa_tpu.core.packing import pack_graphs_dense
    rng = np.random.default_rng(3)
    samples = [random_sample(rng, int(rng.integers(3, 8)),
                             int(rng.integers(4, 16))) for _ in range(5)]
    py = pack_graphs_dense(samples, 8, 16, num_graphs=7)
    cc = pack_graphs_dense_native(samples, 8, 16, num_graphs=7)
    assert cc.nodes_per_graph == py.nodes_per_graph
    assert cc.edges_per_graph == py.edges_per_graph
    for f in ("node_tokens", "node_graph", "node_mask", "edge_src",
              "edge_dst", "edge_tokens", "edge_mask", "edge_sym_sign",
              "exec_bitmap"):
        np.testing.assert_array_equal(
            np.asarray(getattr(py, f)), np.asarray(getattr(cc, f)), err_msg=f)


def test_shard_by_dst_native_matches_python():
    """Native gp_shard_by_dst == the numpy partitioner, byte for byte."""
    from graphvqa_tpu.core.native import shard_edges_by_dst_native
    from graphvqa_tpu.parallel.edge_sharded import shard_edges_by_dst
    from tests.helpers import random_qa_batch

    if not native_available():
        import pytest
        pytest.skip("native library unavailable")
    g = random_qa_batch(seed=31, num_graphs=3, dense=True,
                        nodes_per_graph=8, edges_per_graph=16).graphs
    for k in (1, 2, 4):
        py = shard_edges_by_dst(g, k)
        cc = shard_edges_by_dst_native(g, k)
        for f in ("edge_src", "edge_dst", "edge_tokens", "edge_mask",
                  "edge_sym_sign"):
            np.testing.assert_array_equal(
                np.asarray(getattr(cc, f)), np.asarray(getattr(py, f)), f)
