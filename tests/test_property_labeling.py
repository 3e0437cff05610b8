"""Property-based tests (hypothesis) for the span/label/scrub core —
invariants that must hold for ARBITRARY inputs, not just the generator
distribution.

  * span→BILOU→entity roundtrip: non-overlapping char spans that cover
    at least one token come back exactly (label + covered-token range)
  * BILOU well-formedness of spans_to_token_labels output
  * scrub: placeholders replace exactly the span bytes, text outside
    spans is byte-identical, and scrubbing is idempotent
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pii_spark.detect.scrub import scrub_text
from pii_spark.labeling import decode_bilou, spans_to_token_labels
from pii_spark.tokenizer import tokenize_with_offsets

_LABELS = ("EMAIL", "PHONE", "PERSON", "ADDRESS", "ORG")


@st.composite
def _text_and_spans(draw):
    text = draw(st.text(
        alphabet=string.ascii_letters + string.digits + " .-@_,",
        min_size=1, max_size=200,
    ))
    n_spans = draw(st.integers(0, 4))
    spans, used = [], []
    for _ in range(n_spans):
        if len(text) < 2:
            break
        a = draw(st.integers(0, len(text) - 1))
        b = draw(st.integers(a + 1, min(len(text), a + 30)))
        if any(a < e and b > s for s, e in used):
            continue
        used.append((a, b))
        spans.append({
            "start": a, "end": b,
            "label": draw(st.sampled_from(_LABELS)),
        })
    spans.sort(key=lambda s: s["start"])
    return text, spans


def _token_disjoint(spans, offsets):
    """Keep only spans whose covered-token ranges are pairwise disjoint:
    char-disjoint spans can still share a boundary token (the overlap
    rule), where the reference algorithm's last-wins overwrite yields
    sequences only the lenient decoder handles — the strict roundtrip
    property holds for token-disjoint spans."""
    kept, used = [], set()
    for s in spans:
        toks = {
            i for i, (ts, te) in enumerate(offsets)
            if not (ts == te == 0) and te > s["start"] and ts < s["end"]
        }
        if toks & used:
            continue
        used |= toks
        kept.append(s)
    return kept


@given(_text_and_spans())
@settings(max_examples=300, deadline=None)
def test_span_bilou_roundtrip(case):
    text, spans = case
    tokens, offsets, _ = tokenize_with_offsets(text)
    spans = _token_disjoint(spans, offsets)
    tags, label_ids = spans_to_token_labels(offsets, spans)

    # well-formedness: B opens, I continues same type, L closes; U solo
    open_lab = None
    for t, (ts, te) in zip(tags, offsets):
        if ts == te == 0:
            continue
        if open_lab is None:
            assert not t.startswith(("I-", "L-")), tags
            if t.startswith("B-"):
                open_lab = t[2:]
        else:
            assert t in (f"I-{open_lab}", f"L-{open_lab}"), tags
            if t.startswith("L-"):
                open_lab = None
    assert open_lab is None, tags

    # roundtrip: every span overlapping >=1 token comes back with the
    # right label and exactly the overlapped token range
    ents = decode_bilou(tags)
    expect = []
    for s in spans:
        toks = [
            i for i, (ts, te) in enumerate(offsets)
            if not (ts == te == 0) and te > s["start"] and ts < s["end"]
        ]
        if toks:
            expect.append((s["label"], min(toks), max(toks)))
    assert sorted(ents) == sorted(expect)

    # specials carry -100
    for (ts, te), lid in zip(offsets, label_ids):
        if ts == te == 0:
            assert lid == -100


@given(_text_and_spans())
@settings(max_examples=300, deadline=None)
def test_scrub_replaces_exactly_the_spans(case):
    text, spans = case
    tokens, offsets, _ = tokenize_with_offsets(text)
    spans = _token_disjoint(spans, offsets)
    ents = []
    for s in spans:
        toks = [
            i for i, (ts, te) in enumerate(offsets)
            if not (ts == te == 0) and te > s["start"] and ts < s["end"]
        ]
        if toks:
            ents.append((s["label"], min(toks), max(toks),
                         s["start"], s["end"]))
    scrubbed = scrub_text(text, ents)
    # outside-span text preserved, spans replaced by typed placeholders,
    # in order
    rebuilt, pos = [], 0
    for lab, _a, _b, cs, ce in sorted(ents, key=lambda e: e[3]):
        rebuilt.append(text[pos:cs])
        rebuilt.append(f"[{lab}]")
        pos = ce
    rebuilt.append(text[pos:])
    assert scrubbed == "".join(rebuilt)
    # idempotence: scrubbing the scrubbed text with no entities is a
    # no-op, and placeholders survive
    assert scrub_text(scrubbed, []) == scrubbed
