"""Graph LayerNorm parity vs an independent per-graph numpy oracle."""
import numpy as np
import jax.numpy as jnp

from graphvqa_tpu.ops import graph_layer_norm


def _oracle(x, graph_of_node, num_graphs, w, b, eps=1e-5):
    out = np.zeros_like(x, dtype=np.float64)
    for g in range(num_graphs):
        sel = graph_of_node == g
        if not sel.any():
            continue
        block = x[sel].astype(np.float64)
        mean = block.mean()  # over nodes AND channels jointly
        centered = block - mean
        var = (centered ** 2).mean()
        out[sel] = centered / (np.sqrt(var) + eps)  # eps on std, reference quirk
    return out * w + b


def test_graph_layer_norm_matches_oracle_with_padding():
    rng = np.random.default_rng(7)
    num_graphs, nodes_pad, c = 3, 40, 6
    sizes = [5, 17, 9]
    node_graph = np.full(nodes_pad, num_graphs, np.int32)
    mask = np.zeros(nodes_pad, bool)
    off = 0
    for g, s in enumerate(sizes):
        node_graph[off:off + s] = g
        mask[off:off + s] = True
        off += s
    x = rng.normal(size=(nodes_pad, c)).astype(np.float32) * 3 + 1

    w, b = 1.7, -0.3
    got = np.asarray(graph_layer_norm(
        jnp.asarray(x), jnp.asarray(node_graph), num_graphs,
        jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32),
        node_mask=jnp.asarray(mask)))

    want = _oracle(x[mask], node_graph[mask], num_graphs, w, b)
    np.testing.assert_allclose(got[mask], want, rtol=1e-4, atol=1e-5)
    # padded rows normalized to affine bias only? no — they are zeroed pre-affine
    # and the final where() masks them fully to 0
    np.testing.assert_array_equal(got[~mask], 0.0)
