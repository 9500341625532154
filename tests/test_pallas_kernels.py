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
