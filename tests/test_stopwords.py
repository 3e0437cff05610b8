"""Per-language document-frequency census / stopword derivation
(SURVEY R91): exact fractions on a handcrafted corpus, df-not-tf
semantics, the derive→apply sanity loop, and the row-local-dedup
plan shape."""

from pyspark.sql import Row, functions as F

from pii_spark.quality.stopwords import (
    derive_stopwords,
    doc_frequency_census,
)


def test_census_exact_fractions_and_df_semantics(spark):
    d = spark.createDataFrame([
        Row(lang="en", text="the cat the cat the cat"),  # tf=3, df=1
        Row(lang="en", text="the dog sat"),
        Row(lang="en", text="a dog ran"),
        Row(lang="en", text="the end"),
        Row(lang="de", text="der hund der hund"),
        Row(lang="de", text="der baum"),
    ])
    c = {(r.lang, r.word): (r.df_count, r.n_docs)
         for r in doc_frequency_census(d, min_df=1).collect()}
    # document frequency, not term frequency: 'the' counts once per doc
    assert c[("en", "the")] == (3, 4)
    assert c[("en", "cat")] == (1, 4)
    assert c[("de", "der")] == (2, 2)
    assert ("de", "the") not in c  # censuses are per language

    sw = {(r.lang, r.word): r.doc_frac
          for r in derive_stopwords(d, 0.5).collect()}
    assert sw[("en", "the")] == 0.75
    assert sw[("de", "der")] == 1.0
    assert ("en", "cat") not in sw  # 0.25 < threshold
    # min_df default (2) prunes the singleton vocabulary tail
    c2 = {r.word for r in doc_frequency_census(d).collect()}
    assert "cat" not in c2 and "the" in c2


def test_derived_list_recovers_builtin_stopwords(spark):
    """The derive→apply loop sanity: on English PROSE, the derived
    ≥40% list recovers the langid heuristic's hardcoded stopwords —
    a data-driven langid could bootstrap from this census instead of
    the hardcoded list. (The PII-template corpus is deliberately NOT
    used here: its snippets are not prose — max doc_frac ≈0.2 —
    which is itself the argument for deriving lists per corpus.)"""
    topics = ["mill", "bakery", "harbor", "garden", "library",
              "market", "forest", "villag", "stable", "orchard"]
    rows = [
        Row(lang="en", text=(
            f"The {t}{i} keeper said that this was a fine morning, "
            f"with fresh goods from the early cart, and the "
            f"neighbors have agreed that prices for {t} wares are "
            f"fair; this news was welcome, and all of them are "
            f"content with what they have from the {t}."
        ))
        for i in range(5) for t in topics
    ]
    d = spark.createDataFrame(rows)
    got = {r.word for r in derive_stopwords(d, 0.4).collect()}
    builtin = {"the", "and", "that", "this", "with", "from",
               "have", "was", "for", "are"}
    assert builtin <= got, sorted(builtin - got)
    # content words vary per doc and stay OUT of the list
    assert not any(w.startswith("mill") for w in got)


def test_census_plan_is_scale_safe(spark):
    """Per-doc dedup must be ROW-LOCAL (array_distinct inside the
    explode), never a distinct shuffle of (lang, word, doc) triples;
    the census aggregate combines map-side; totals join broadcasts."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = doc_frequency_census(d)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    assert "BroadcastHashJoin" in plan, plan      # totals side
    assert "BatchEvalPython" not in plan
    # exactly ONE exchange pair for the census groupBy + the totals
    # agg — a triple-distinct would add a third
    import re

    n_exch = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exch <= 2, plan
