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
    # numerics: bare counts, decimals, and clock times stay single tokens
    ("Are there 2 cats on the couch?",
     ["Are", "there", "2", "cats", "on", "the", "couch", "?"]),
    ("Is the bottle 1.5 liters?",
     ["Is", "the", "bottle", "1.5", "liters", "?"]),
    ("Does the clock say 2:30?",
     ["Does", "the", "clock", "say", "2:30", "?"]),
    # quotes around a word
    ('Is the sign that says "stop" red?',
     ["Is", "the", "sign", "that", "says", '"', "stop", '"', "red", "?"]),
    # multi-hyphen compounds split at every infix hyphen
    ("Is the state-of-the-art phone black?",
     ["Is", "the", "state", "-", "of", "-", "the", "-", "art", "phone",
      "black", "?"]),
    ("Do you see a blue-and-white striped shirt?",
     ["Do", "you", "see", "a", "blue", "-", "and", "-", "white", "striped",
      "shirt", "?"]),
    # spacy tokenizer-exception table entries (not derivable from the
    # contraction suffix rule)
    ("You cannot see the horse.",
     ["You", "can", "not", "see", "the", "horse", "."]),
    ("It's ten o'clock.", ["It", "'s", "ten", "o'clock", "."]),
    # slash infix
    ("Is there a salt/pepper shaker?",
     ["Is", "there", "a", "salt", "/", "pepper", "shaker", "?"]),
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


def test_token_audit_report():
    """preprocess_cli --audit-tokens backend (VERDICT r3 item 3): construct
    coverage, suspicious tokens, unknown-rate vs a vocab."""
    from graphvqa_tpu.data.token_audit import audit_tokens, format_report
    from graphvqa_tpu.data.vocab import Vocab

    texts = [
        "Isn't the sky blue?",             # contraction
        "Who took the man's hat?",         # possessive
        "Is he wearing a t-shirt?",        # hyphen infix
        "Are there 2 cats?",               # numeric
        'A sign saying "stop".',           # quote
        "café au lait",               # non-ascii -> suspicious
    ]
    vocab = Vocab(["<unk>", "<pad>", "<start>", "<end>", "the", "sky",
                   "blue", "?", "Is", "n't"])
    rep = audit_tokens(texts, vocab=vocab)
    assert rep["n_texts"] == 6
    cc = rep["construct_counts"]
    assert cc["contraction"] == 1 and cc["possessive_or_is"] == 1
    assert cc["hyphen_infix"] == 1 and cc["numeric"] == 1
    assert cc["quote"] == 1 and cc["non_ascii"] == 1
    assert rep["suspicious_token_count"] >= 1  # café
    assert any("caf" in t for t, _ in rep["suspicious_top"])
    assert rep["unknown_token_count"] > 0      # most words not in tiny vocab
    out = format_report(rep)
    assert "suspicious tokens" in out and "construct coverage" in out


def test_token_audit_file_formats(tmp_path):
    import json
    from graphvqa_tpu.data.token_audit import audit_file

    raw = {"1": {"question": "Is the wall white?", "fullAnswer": "Yes."}}
    p1 = tmp_path / "raw.json"
    p1.write_text(json.dumps(raw))
    rep = audit_file(p1)
    assert rep["n_texts"] == 2

    tup = [["img", "Is the wall white?", [], "1", "yes", "Yes, it is.",
            [], {}, [], [], {}]]
    p2 = tmp_path / "programs.json"
    p2.write_text(json.dumps(tup))
    rep = audit_file(p2)
    assert rep["n_texts"] == 2
