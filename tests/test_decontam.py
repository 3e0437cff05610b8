"""Decontamination: planted benchmark text is flagged, clean docs are
not; canonical selection keeps the best cluster member."""

from pyspark.sql import functions as F

from pii_spark.spark.decontam import decontaminate, select_canonical


def test_decontaminate_flags_planted_benchmark_text(spark):
    bench_text = ("The quick onyx goblin jumps over the lazy dwarf while "
                  "seventeen zephyrs vex the daft jumbuck repeatedly.")
    from pii_spark.spark.gen_job import generate_corpus

    base = (
        generate_corpus(spark, 40)
        .select(F.monotonically_increasing_id().alias("doc_id"), "text")
        .cache()
    )
    # plant the benchmark passage inside docs 0 and 1; leave the rest
    corpus = base.select(
        "doc_id",
        F.when(F.col("doc_id") < 2,
               F.concat(F.col("text"), F.lit(" " + bench_text)))
        .otherwise(F.col("text")).alias("text"),
    )
    benchmark = spark.createDataFrame(
        [(1000, bench_text)], "doc_id long, text string"
    )
    res = {r.doc_id: (r.n_shared_fp, r.contaminated)
           for r in decontaminate(corpus, benchmark).collect()}
    assert res[0][1] and res[1][1], res  # planted docs flagged
    assert res[0][0] >= 2
    # no clean doc is flagged (an incidental single shared fingerprint
    # may appear; the >=2 threshold must hold them below 'contaminated')
    for d, (_n, c) in res.items():
        if d >= 2:
            assert not c, (d, res[d])
    # the flagged set feeds a drop: left-anti leaves 38 clean docs
    flagged = decontaminate(corpus, benchmark).filter("contaminated")
    clean = corpus.join(flagged.select("doc_id"), "doc_id", "left_anti")
    assert clean.count() == 38


def test_select_canonical_keeps_best_member(spark):
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (7, 20), (8, 20)],
        "doc_id int, cluster int",
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (7, 10), (8, 70)],
        "doc_id int, n_chars int",
    )
    got = {r.cluster: (r.canonical_doc_id, r.canonical_quality)
           for r in select_canonical(clusters, docs).collect()}
    # cluster 10: quality tie 90/90 between docs 2 and 3 → min doc_id
    assert got == {10: (2, 90), 20: (8, 70)}
