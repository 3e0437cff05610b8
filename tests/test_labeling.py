"""BILOU alignment goldens — the reference's most load-bearing semantic
(build_datasets.py:30-106): overlap rule, U/B-I-L assignment, -100
specials, truncation."""

from pii_spark.config import LABEL2ID, MAX_TOKENS
from pii_spark.labeling import decode_bilou, spans_to_token_labels
from pii_spark.tokenizer import tokenize_with_offsets


def toks(text):
    return tokenize_with_offsets(text)


def test_tokenizer_offsets_exact():
    text = "Contact John at j.doe@gmail.com!"
    tokens, offsets, ids = toks(text)
    for tok, (s, e) in zip(tokens, offsets):
        if s == e == 0:
            continue
        assert text[s:e] == tok
    assert offsets[0] == (0, 0) and offsets[-1] == (0, 0)  # BOS/EOS


def test_subword_splits():
    tokens, _, _ = toks("frompBlack1988 camelCase")
    assert "fromp" in tokens and "Black" in tokens and "1988" in tokens
    assert "camel" in tokens and "Case" in tokens


def test_singleton_entity_is_U():
    text = "ssn 123456789 end"
    _, offsets, _ = toks(text)
    tags, ids = spans_to_token_labels(
        offsets, [{"start": 4, "end": 13, "label": "SSN"}]
    )
    assert tags.count("U-SSN") == 1
    assert ids[0] == -100 and ids[-1] == -100  # specials


def test_multi_token_entity_is_BIL():
    text = "name John Q Smith here"
    _, offsets, _ = toks(text)
    tags, _ = spans_to_token_labels(
        offsets, [{"start": 5, "end": 17, "label": "PERSON"}]
    )
    assert "B-PERSON" in tags and "L-PERSON" in tags and "I-PERSON" in tags


def test_overlap_rule_includes_partial_tokens():
    # token overlapping the span boundary is included
    # (tok_end > e_start and tok_start < e_end, build_datasets.py:64-71)
    text = "xx smithz yy"
    _, offsets, _ = toks(text)
    # span covers 'smith' but token is 'smithz'
    tags, _ = spans_to_token_labels(
        offsets, [{"start": 3, "end": 8, "label": "PERSON"}]
    )
    assert "U-PERSON" in tags


def test_decode_roundtrip():
    text = "a b c d e"
    _, offsets, _ = toks(text)
    spans = [
        {"start": 0, "end": 1, "label": "AGE"},
        {"start": 2, "end": 5, "label": "ORG"},
    ]
    tags, _ = spans_to_token_labels(offsets, spans)
    ents = decode_bilou(tags)
    assert len(ents) == 2
    assert {e[0] for e in ents} == {"AGE", "ORG"}


def test_decode_lenient_stray_I():
    ents = decode_bilou(["O", "I-ORG", "L-ORG", "O"])
    assert ents == [("ORG", 1, 2)]


def test_truncation_cap():
    text = " ".join(f"w{i}" for i in range(2000))
    tokens, offsets, _ = toks(text)
    assert len(tokens) == MAX_TOKENS
    # a span beyond the cap aligns to nothing
    start = text.index("w1999")
    tags, _ = spans_to_token_labels(
        offsets, [{"start": start, "end": start + 5, "label": "ORG"}]
    )
    assert all(t == "O" for t in tags)


def test_label_vocabulary_size():
    assert len(LABEL2ID) == 37  # O + BILOU×9 (config_and_labels.py:38-45)
