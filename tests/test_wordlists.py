"""Vocabulary hygiene: the O-only filler must be disjoint from every
PII gazetteer so noise can't turn filler prose into gazetteer hits."""

from pii_spark.wordlists import (
    CITIES,
    COUNTRIES,
    FILLER_EN,
    FIRST_NAMES,
    LAST_NAMES,
    STATES,
    STREET_FIRST,
)


def test_filler_disjoint_from_pii_vocab():
    filler = set(FILLER_EN)
    pii_words = set(FIRST_NAMES) | set(LAST_NAMES)
    pii_words |= {w.lower() for c in CITIES for w in c.split()}
    pii_words |= {w.lower() for n, _ in STATES for w in n.split()}
    pii_words |= {w.lower() for n, _ in COUNTRIES for w in n.split()}
    pii_words |= {w.lower() for w in STREET_FIRST}
    overlap = filler & pii_words
    assert not overlap, f"filler words collide with PII vocab: {overlap}"


def test_no_pii_trigger_substrings_in_names():
    # the inside-span typo chain rewrites gmail/yahoo/com substrings
    # (generation.py:690-694); names must not contain them or typo noise
    # would corrupt name spans
    for w in FIRST_NAMES + LAST_NAMES:
        for bad in ("gmail", "yahoo"):
            assert bad not in w
