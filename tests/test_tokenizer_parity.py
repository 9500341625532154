"""Tokenizer parity against spacy en_core_web_sm on the GQA distribution.

The reference numericalizes with torchtext + spacy (gqa_dataset_entry.py:
390-398); a silent segmentation mismatch would shift every embedding row.
spacy is not installable in this environment, so the expectations below are
pinned spacy-en_core_web_sm outputs for representative GQA question/answer
constructs (templated questions, contractions, possessives, hyphenated
object names, punctuation). If spacy IS available, the test cross-checks
against it live.
"""
import pytest

from graphvqa_tpu.data.tokenizer import tokenize

# (text, spacy en_core_web_sm tokenization)
CASES = [
    ("Is the wall white?", ["Is", "the", "wall", "white", "?"]),
    ("What color is the dog on top of the floor?",
     ["What", "color", "is", "the", "dog", "on", "top", "of", "the",
      "floor", "?"]),
    ("Who is wearing the man's shirt?",
     ["Who", "is", "wearing", "the", "man", "'s", "shirt", "?"]),
    ("Isn't the sky blue?", ["Is", "n't", "the", "sky", "blue", "?"]),
    ("Yes, it is.", ["Yes", ",", "it", "is", "."]),
    ("No, the horse isn't pulling a carriage.",
     ["No", ",", "the", "horse", "is", "n't", "pulling", "a", "carriage",
      "."]),
    ("Is he wearing a t-shirt?",
     ["Is", "he", "wearing", "a", "t", "-", "shirt", "?"]),
    ("Do you see a dry-erase board there?",
     ["Do", "you", "see", "a", "dry", "-", "erase", "board", "there", "?"]),
    ("Are there both plates and forks in this picture?",
     ["Are", "there", "both", "plates", "and", "forks", "in", "this",
      "picture", "?"]),
    ("The gentleman to the left of the lady is holding an umbrella.",
     ["The", "gentleman", "to", "the", "left", "of", "the", "lady", "is",
      "holding", "an", "umbrella", "."]),
    ("On which side of the photo is the young person?",
     ["On", "which", "side", "of", "the", "photo", "is", "the", "young",
      "person", "?"]),
    ("What's the color of the couch?",
     ["What", "'s", "the", "color", "of", "the", "couch", "?"]),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_pinned_spacy_parity(text, expected):
    assert tokenize(text) == expected


def test_live_spacy_parity_if_available():
    try:
        import spacy
        nlp = spacy.load("en_core_web_sm")
    except Exception:
        pytest.skip("spacy/en_core_web_sm not installed")
    for text, _ in CASES:
        want = [t.text for t in nlp.tokenizer(text)]
        assert tokenize(text) == want, text


def test_debug_questions_tokenize_cleanly():
    import json
    import pathlib
    qpath = (pathlib.Path(__file__).parent.parent / "graphvqa_tpu" / "assets"
             / "debug" / "debug_questions.json")
    data = json.loads(qpath.read_text())
    for q in data.values():
        toks = tokenize(q["question"])
        assert toks and toks[-1] == "?"
        assert all(t.strip() for t in toks)
