"""Generator invariants: determinism, span validity, corpus mix."""

import collections

from pii_spark.textgrammar.fields import luhn_valid, sample_credit_card
from pii_spark.textgrammar.generator import (
    build_example,
    fill_template,
    rng_for,
)


def test_deterministic_per_doc_id():
    for i in (0, 7, 991):
        assert build_example(42, i) == build_example(42, i)
    assert build_example(42, 3) != build_example(43, 3)


def test_spans_within_text_and_nonempty():
    for i in range(500):
        ex = build_example(42, i)
        for sp in ex["spans"]:
            assert 0 <= sp["start"] < sp["end"] <= len(ex["text"])
            assert ex["text"][sp["start"] : sp["end"]].strip()


def test_mix_ratios():
    kinds = collections.Counter(
        build_example(42, i)["kind"] for i in range(3000)
    )
    total = sum(kinds.values())
    # lang split ≈ 80% en; of en: 35% positive / 50% O-only / 15% hard-neg
    assert 0.75 < (total - kinds["non_english"]) / total < 0.85
    en = total - kinds["non_english"]
    assert 0.30 < kinds["positive"] / en < 0.40
    assert 0.45 < kinds["o_only"] / en < 0.55
    assert 0.11 < kinds["hard_negative"] / en < 0.19


def test_repeated_slots_record_all_occurrences():
    # divergence from the reference (generation.py:540 keeps only the
    # last occurrence): every slot occurrence must carry a span
    text, spans = fill_template(
        "Attendees: {person}, {person}, {person}",
        {"person": "alice smith"},
    )
    assert len(spans) == 3
    assert all(text[s:e] == "alice smith" for s, e, _ in spans)


def test_credit_cards_luhn_valid():
    truncated_pass = 0
    for i in range(200):
        cc = sample_credit_card(rng_for(42, i))
        assert 13 <= len(cc) <= 19
        assert luhn_valid(cc)
        truncated_pass += luhn_valid(cc[:-1])
    # truncation ('missing digit' hard negative) passes only by chance ~10%
    assert truncated_pass <= 40


def test_corpus_row_shape():
    ex = build_example(42, 11)
    assert ex["url"].startswith("https://")
    assert ex["html"].startswith(b"<html><body>")
    assert ex["lang"] in ("en", "de", "fr", "es", "zz")
