"""Metric-kernel semantics vs hand-computed cases (mainExplain_gat.py parity)."""
import numpy as np
import jax.numpy as jnp

from graphvqa_tpu.train.metrics import (
    program_string_exact_match_acc, string_exact_match_acc, topk_accuracy)

PAD = 1


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.asarray([1, 2])
    c, t = topk_accuracy(logits, labels, k=1)
    assert (int(c), int(t)) == (1, 2)
    c2, _ = topk_accuracy(logits, labels, k=2)
    assert int(c2) == 1  # label 2 is ranked 3rd and 2nd... row2 top2={0,1}


def test_string_exact_match_pad_is_wildcard():
    target = jnp.asarray([[5, 6, PAD, PAD], [5, 6, 7, PAD]])
    pred = jnp.asarray([[5, 6, 9, 9], [5, 6, 8, 9]])
    c, t = string_exact_match_acc(pred, target, PAD)
    # row0 matches (pad positions ignored), row1 differs at position 2
    assert (int(c), int(t)) == (1, 2)


def test_program_group_and_nonempty():
    # 2 groups of 2 instructions (group_size=2)
    # layout: [<end>-ish shifted targets]; position 2 == PAD marks "empty"
    target = jnp.asarray([
        [5, 6, 7, PAD],    # non-empty, matches
        [3, PAD, PAD, PAD],  # empty (pos2 pad), matches
        [5, 6, 7, 8],      # non-empty, mismatch
        [3, PAD, PAD, PAD],  # empty, matches
    ])
    pred = jnp.asarray([
        [5, 6, 7, 0],
        [3, 0, 0, 0],
        [5, 6, 0, 8],
        [3, 0, 0, 0],
    ])
    (c, t), (gc, gt), (nc, nt) = program_string_exact_match_acc(
        pred, target, PAD, group_size=2)
    assert (int(c), int(t)) == (3, 4)
    assert (int(gc), int(gt)) == (1, 2)      # only group 0 fully correct
    assert (int(nc), int(nt)) == (1, 2)      # non-empty rows: #0 ok, #2 wrong


def test_prefetch_yields_all_and_propagates_errors():
    from graphvqa_tpu.data.prefetch import prefetch

    assert list(prefetch(range(10), depth=2)) == list(range(10))

    def gen():
        yield 1
        raise RuntimeError("boom")
    import pytest
    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)
