"""Corpus-level duplicate-substring removal (SURVEY R64)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pii_spark.spark.substr_dedup import substring_dedup, substring_dedup_pure

K = 4

# handcrafted corpus: doc 0/1 share an exact 6-token passage (> K);
# doc 2 repeats its own 4-token phrase twice (within-doc duplication
# counts, like a suffix-array match); doc 3 is clean; doc 4 too short
SHARED = "the quick brown fox jumps high"
DOCS = {
    0: f"alpha beta {SHARED} gamma delta",
    1: f"one two three {SHARED} four",
    2: "x y z w p q x y z w r s",
    3: "entirely unique words that never repeat anywhere at all",
    4: "tiny doc",
}


def _run(spark, docs, hashed=False):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    return {
        r.doc_id: r
        for r in substring_dedup(df, k=K, hashed=hashed).collect()
    }


def test_matches_pure_twin_on_handcrafted(spark):
    got = _run(spark, DOCS)
    pure = substring_dedup_pure(DOCS, k=K)
    assert set(got) == set(pure)
    for i in DOCS:
        for f in ("cleaned_text", "n_tokens", "n_removed_tokens"):
            assert got[i][f] == pure[i][f], (i, f)
        assert abs(got[i].frac_removed - pure[i]["frac_removed"]) < 1e-9


def test_semantics(spark):
    got = _run(spark, DOCS)
    # the shared passage is gone from both carriers, context kept
    assert SHARED not in got[0].cleaned_text
    assert SHARED not in got[1].cleaned_text
    assert got[0].cleaned_text.startswith("alpha beta")
    assert got[1].cleaned_text.startswith("one two three")
    # within-doc repeat removed both occurrences
    assert "x y z w" not in got[2].cleaned_text
    # clean doc untouched; short doc untouched
    assert got[3].cleaned_text == DOCS[3]
    assert got[3].n_removed_tokens == 0
    assert got[4].cleaned_text == DOCS[4]
    assert got[4].n_removed_tokens == 0


def test_hashed_variant_identical(spark):
    """The xxhash64 census (production shuffle of 8-byte longs) must
    produce the same rows as the string census at check scale."""
    assert {i: r.asDict() for i, r in _run(spark, DOCS).items()} == {
        i: r.asDict() for i, r in _run(spark, DOCS, hashed=True).items()
    }


def test_null_text_matches_pure_twin(spark):
    """Review r5: NULL text must tokenize as empty (0/0/0.0), not
    propagate NULL through the metrics."""
    docs = {0: None, 1: "some perfectly ordinary words here", 2: ""}
    got = _run(spark, docs)
    pure = substring_dedup_pure(docs, k=K)
    for i in docs:
        assert got[i].cleaned_text == pure[i]["cleaned_text"]
        assert got[i].n_tokens == pure[i]["n_tokens"]
        assert got[i].n_removed_tokens == pure[i]["n_removed_tokens"]
        assert got[i].frac_removed == pure[i]["frac_removed"]
    assert got[0].n_tokens == 0 and got[0].frac_removed == 0.0


def test_fully_duplicated_doc_empties(spark):
    docs = {0: "a b c d e f", 1: "a b c d e f"}
    got = _run(spark, docs)
    for i in (0, 1):
        assert got[i].cleaned_text == ""
        assert got[i].n_removed_tokens == got[i].n_tokens == 6
        assert got[i].frac_removed == 1.0


_VOCAB = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "zz"])
# whitespace soup between words: the ASCII class Java \s matches plus
# NBSP (which it does NOT) — the twin-drift surface (textnorm.py)
_SEP = st.sampled_from([" ", "  ", "\t", "\n", "\r\n", "\x0b", "\f",
                        " \xa0 "])
_CORPORA = st.lists(
    st.one_of(
        st.none(),
        st.tuples(
            st.lists(_VOCAB, min_size=0, max_size=25), _SEP
        ).map(lambda t: t[1].join(t[0])),
    ),
    min_size=1, max_size=8,
)


@given(texts=_CORPORA)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_against_pure_twin(spark, texts):
    docs = dict(enumerate(texts))
    got = _run(spark, docs)
    pure = substring_dedup_pure(docs, k=K)
    for i in docs:
        assert got[i].cleaned_text == pure[i]["cleaned_text"], repr(
            docs[i]
        )
        assert got[i].n_removed_tokens == pure[i]["n_removed_tokens"]
