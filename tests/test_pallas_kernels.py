"""Pallas kernel parity (interpret mode on CPU) vs the XLA dense path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphvqa_tpu.ops.pallas import pallas_available

pytestmark = pytest.mark.skipif(not pallas_available(),
                                reason="pallas unavailable")


def test_fused_dense_gat_matches_xla():
    """Interpret-mode parity: the fused dense-round kernel == the XLA dense
    path (ops/dense.py:dense_gat_aggregate) on a ragged dense batch."""
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
