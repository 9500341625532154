"""Unit parity tests for the segment primitives against dense numpy oracles.

The oracles are independent dense-math implementations (not ports): grouping by
boolean row-selection, exactly what torch_scatter / PyG softmax compute.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from graphvqa_tpu.ops import (
    segment_sum, segment_mean, segment_max, segment_softmax,
    gather_nodes, scatter_edges_to_nodes,
)


def _dense_group_sum(values, seg, num_segments, mask=None):
    out = np.zeros((num_segments,) + values.shape[1:], dtype=np.float64)
    for i in range(values.shape[0]):
        if mask is not None and not mask[i]:
            continue
        out[seg[i]] += values[i]
    return out


def _rand_segments(rng, n, num_segments, sort=False):
    seg = rng.integers(0, num_segments, size=n)
    if sort:
        seg = np.sort(seg)
    return seg.astype(np.int32)


@pytest.mark.parametrize("sort", [False, True])
def test_segment_sum_matches_dense(sort):
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(64, 7)).astype(np.float32)
    seg = _rand_segments(rng, 64, 9, sort)
    mask = rng.random(64) > 0.3
    got = segment_sum(jnp.asarray(vals), jnp.asarray(seg), 9,
                      mask=jnp.asarray(mask), indices_are_sorted=sort)
    want = _dense_group_sum(vals, seg, 9, mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_segment_mean_matches_dense_and_zeroes_empty():
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(40, 3)).astype(np.float32)
    seg = np.clip(_rand_segments(rng, 40, 6), 0, 4)  # segment 5 is empty
    got = np.asarray(segment_mean(jnp.asarray(vals), jnp.asarray(seg), 6))
    for s in range(5):
        sel = seg == s
        if sel.any():
            np.testing.assert_allclose(got[s], vals[sel].mean(axis=0),
                                       rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got[5], np.zeros(3, np.float32))


def test_segment_max():
    rng = np.random.default_rng(2)
    vals = rng.normal(size=(30, 4)).astype(np.float32)
    seg = _rand_segments(rng, 30, 5)
    got = np.asarray(segment_max(jnp.asarray(vals), jnp.asarray(seg), 5))
    for s in range(5):
        sel = seg == s
        if sel.any():
            np.testing.assert_allclose(got[s], vals[sel].max(axis=0), rtol=1e-6)


def test_segment_softmax_matches_dense():
    """Per-destination softmax equals a per-group numpy softmax (PyG K3 semantics)."""
    rng = np.random.default_rng(3)
    logits = (5 * rng.normal(size=(50, 4))).astype(np.float32)  # [E, H]
    seg = np.sort(_rand_segments(rng, 50, 8))
    mask = rng.random(50) > 0.2
    got = np.asarray(segment_softmax(
        jnp.asarray(logits), jnp.asarray(seg), 8,
        mask=jnp.asarray(mask), indices_are_sorted=True))
    for s in range(8):
        sel = (seg == s) & mask
        if not sel.any():
            continue
        x = logits[sel].astype(np.float64)
        e = np.exp(x - x.max(axis=0, keepdims=True))
        want = e / (e.sum(axis=0, keepdims=True) + 1e-16)
        np.testing.assert_allclose(got[sel], want, rtol=1e-4, atol=1e-5)
    # masked lanes are exactly zero
    assert np.all(got[~mask] == 0.0)


def test_segment_softmax_sums_to_one_per_nonempty_group():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(100, 1)).astype(np.float32)
    seg = np.sort(_rand_segments(rng, 100, 12))
    got = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(seg), 12,
                                     indices_are_sorted=True))
    sums = _dense_group_sum(got, seg, 12)
    present = np.bincount(seg, minlength=12) > 0
    np.testing.assert_allclose(sums[present], 1.0, atol=1e-5)


def test_gather_scatter_roundtrip_spmm():
    """alpha-weighted gather-scatter equals dense adjacency matmul (K4)."""
    rng = np.random.default_rng(5)
    n, e, c = 16, 60, 8
    x = rng.normal(size=(n, c)).astype(np.float32)
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    alpha = rng.random(e).astype(np.float32)

    msgs = gather_nodes(jnp.asarray(x), jnp.asarray(src)) * alpha[:, None]
    got = np.asarray(scatter_edges_to_nodes(msgs, jnp.asarray(dst), n))

    adj = np.zeros((n, n), dtype=np.float32)
    for k in range(e):
        adj[dst[k], src[k]] += alpha[k]
    want = adj @ x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
