"""Dolma-style keep-first paragraph dedup (SURVEY R66)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pii_spark.spark.para_dedup import paragraph_dedup, paragraph_dedup_pure

FOOTER = "Copyright Example Corp, all rights reserved."
DOCS = {
    0: f"First article body text here.\n{FOOTER}",
    1: f"Second article, different body.\n{FOOTER}\nExtra closing line.",
    2: f"{FOOTER}\nThird article that leads with the footer.",
    3: "Wholly unique document with no shared lines at all.",
    4: "Self\nSelf",  # within-doc duplicate: first survives
    5: None,
    6: "Spaced\n   \nSpaced",  # ws-only paragraph is structure: kept
}


def _run(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    return {r.doc_id: r for r in paragraph_dedup(df).collect()}


def test_matches_pure_twin_and_keep_first(spark):
    got = _run(spark, DOCS)
    pure = paragraph_dedup_pure(DOCS)
    for i in DOCS:
        for f in ("cleaned_text", "n_paras", "n_removed_paras"):
            assert got[i][f] == pure[i][f], (i, f)
    # the FIRST occurrence (min (doc_id, pos)) survives, later ones go
    assert FOOTER in got[0].cleaned_text
    assert FOOTER not in got[1].cleaned_text
    assert FOOTER not in got[2].cleaned_text
    # non-duplicated content is untouched
    assert got[1].cleaned_text.startswith("Second article")
    assert got[2].cleaned_text.endswith("leads with the footer.")
    assert got[3].cleaned_text == DOCS[3]
    # within-doc repeat: first kept
    assert got[4].cleaned_text == "Self"
    assert got[4].n_removed_paras == 1
    # NULL text → empty, zero counts
    assert got[5].cleaned_text == "" and got[5].n_removed_paras == 0
    # whitespace-only paragraphs never participate, but content dups
    # inside the same doc still collapse
    assert got[6].cleaned_text == "Spaced\n   "


def test_hashed_variant_identical(spark):
    """VERDICT r5 #2: the xxhash64-census production path (8-byte
    shuffle keys, now the default) must agree byte-for-byte with the
    exact string-census path the oracle replicates — on the edge-case
    corpus AND on a real multi-page synthetic corpus."""
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    )
    a = {r.doc_id: r.asDict()
         for r in paragraph_dedup(df, hashed=True).collect()}
    b = {r.doc_id: r.asDict()
         for r in paragraph_dedup(df, hashed=False).collect()}
    assert a == b
    # and on the q_paragraph_dedup-shaped corpus: 3-para pages where
    # every text appears in exactly 3 pages (real cross-doc dedup)
    from pyspark.sql import functions as F

    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    n = d.count()
    pages = (
        d.select("doc_id")
        .withColumn("k", F.explode(F.array(*map(F.lit, (0, 1, 2)))))
        .withColumn("src", (F.col("doc_id") + F.col("k") * 7) % n)
        .join(d.select(F.col("doc_id").alias("src"), "text"), "src")
        .groupBy("doc_id")
        .agg(F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("k", "text"))),
            lambda x: x["text"]), "\n").alias("text"))
    )
    ha = {r.doc_id: r.asDict()
          for r in paragraph_dedup(pages, hashed=True).collect()}
    hb = {r.doc_id: r.asDict()
          for r in paragraph_dedup(pages, hashed=False).collect()}
    assert ha == hb and any(
        v["n_removed_paras"] > 0 for v in ha.values()
    )


def test_layout_independent(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    )
    a = {r.doc_id: r.cleaned_text
         for r in paragraph_dedup(df).collect()}
    b = {r.doc_id: r.cleaned_text
         for r in paragraph_dedup(df.repartition(7)).collect()}
    assert a == b


_PARA = st.sampled_from(
    ["shared footer line", "alpha", "beta", "gamma", "", "   ", "\t"]
)
_CORPORA = st.lists(
    st.one_of(
        st.none(),
        st.lists(_PARA, min_size=0, max_size=6).map("\n".join),
    ),
    min_size=1, max_size=8,
)


@given(texts=_CORPORA)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_against_pure_twin(spark, texts):
    docs = dict(enumerate(texts))
    got = _run(spark, docs)
    pure = paragraph_dedup_pure(docs)
    for i in docs:
        assert got[i].cleaned_text == pure[i]["cleaned_text"], repr(
            docs[i]
        )
        assert got[i].n_removed_paras == pure[i]["n_removed_paras"]
