"""C1 surface: DSL parse_program, ontologies, bbox IoU, vocab maps."""
import numpy as np
import pytest

from graphvqa_tpu.data.constants import (
    BBOX_ATTRIBUTES, BBOX_ONTOLOGY, BINARY_FUNCS, OBJECT_FUNCS,
    SCENE_ATTRIBUTES, STRING_FUNCS, bbox_iou, load_gqa_vocab_maps,
    parse_program)


def test_dsl_function_partition():
    # the 36-function DSL splits 9/13/13 with no overlap (Constants.py:29-31)
    assert len(OBJECT_FUNCS) == 9
    assert len(STRING_FUNCS) == 13 and len(BINARY_FUNCS) == 13
    assert not (set(OBJECT_FUNCS) & set(STRING_FUNCS) & set(BINARY_FUNCS))


def test_parse_program():
    assert parse_program("[1]=relate_inv_name([0], on, dog)") == (
        "[1]", "relate_inv_name", ["[0]", "on", "dog"])
    assert parse_program("exist([0])") == ("?", "exist", ["[0]"])
    assert parse_program("[0]=select(car)") == ("[0]", "select", ["car"])
    assert parse_program("noop()") == ("?", "noop", [])


def test_ontology_inversion():
    # every ontology value maps back to its (category, index) slots
    for cat, values in BBOX_ONTOLOGY.items():
        for i, v in enumerate(values):
            slots = BBOX_ATTRIBUTES[v]
            assert any(i == j for _, j in slots)
    assert ("indoors" in SCENE_ATTRIBUTES and "rainy" in SCENE_ATTRIBUTES)


def test_bbox_iou():
    # identical boxes -> IoU ~ 1 (the +0.01 regularizer keeps it under 1)
    v = bbox_iou([0, 0, 10, 10], [0, 0, 10, 10], option="xywh")
    assert 0.99 < v < 1.0
    # disjoint -> 0
    assert bbox_iou([0, 0, 1, 1], [5, 5, 1, 1], option="xywh") == 0.0
    # half overlap, both encodings agree
    a = bbox_iou([0, 0, 2, 2], [1, 0, 2, 2], option="xywh")
    b = bbox_iou([0, 0, 2, 2], [1, 0, 3, 2], option="x1y1x2y2")
    np.testing.assert_allclose(a, b, rtol=1e-6)
    # containment rate
    iou, contained = bbox_iou([2, 2, 2, 2], [0, 0, 10, 10],
                              option="xywh", contained=True)
    assert contained == pytest.approx(4 / 4.01)


def test_gqa_vocab_maps():
    objs, objs_inv, rels, rels_inv, attrs, attrs_inv = load_gqa_vocab_maps()
    assert len(objs_inv) > 500 and len(rels_inv) > 100 and len(attrs_inv) > 300
    assert objs[objs_inv[5]] == 5
    assert rels[rels_inv[0]] == 0
    assert attrs[attrs_inv[-1]] == len(attrs_inv) - 1
