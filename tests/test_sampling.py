"""Deterministic sampling operators: layout-independence (the north
rule's retry/partitioning stability applied to draws), exact sizes,
uniformity sanity, and token-budget resolution."""

from pyspark.sql import functions as F

from pii_spark.spark.sampling import (
    ccnet_buckets,
    stratified_sample_n,
    token_budget_sample,
    uniform_sample_n,
)


def _docs(spark, sf="/root/testdata/sf0.01"):
    return spark.read.parquet(f"{sf}/documents.parquet")


def test_uniform_sample_exact_and_layout_stable(spark):
    d = _docs(spark)
    a = sorted(r.doc_id for r in uniform_sample_n(d, 100).collect())
    b = sorted(
        r.doc_id
        for r in uniform_sample_n(d.repartition(13), 100).collect()
    )
    assert len(a) == 100 and a == b  # exact size, layout-independent
    # different seed → different sample (it's actually seeded)
    c = sorted(
        r.doc_id for r in uniform_sample_n(d, 100, seed=7).collect()
    )
    assert c != a
    # uniformity sanity: 20 uniform sources → each ≈ 5 of 100 drawn;
    # no source should dominate or vanish entirely in aggregate
    counts = (
        uniform_sample_n(d, 100).groupBy("source").count().collect()
    )
    assert len(counts) >= 15 and all(r["count"] <= 15 for r in counts), counts


def test_stratified_sample_exact_per_stratum(spark):
    d = _docs(spark)
    s = stratified_sample_n(d, "lang", 12)
    per = {r.lang: r["count"]
           for r in s.groupBy("lang").count().collect()}
    sizes = {r.lang: r["count"]
             for r in d.groupBy("lang").count().collect()}
    for lang, n in sizes.items():
        assert per[lang] == min(12, n), (lang, per[lang], n)
    # layout independence
    s2 = stratified_sample_n(d.repartition(9), "lang", 12)
    assert sorted(r.doc_id for r in s.collect()) == sorted(
        r.doc_id for r in s2.collect()
    )


def test_token_budget_sample(spark):
    d = _docs(spark).withColumn(
        "n_tokens",
        F.size(F.filter(F.split("text", r"\s+"), lambda w: w != "")),
    )
    total = d.agg(F.sum("n_tokens")).collect()[0][0]
    budget = int(total * 0.3)
    s = token_budget_sample(d, budget, "n_tokens")
    got = s.agg(F.sum("n_tokens")).collect()[0][0]
    # within one bucket's resolution of the budget (4096 buckets over
    # 5k docs → buckets hold ~few docs; allow a generous ±5% of total)
    assert abs(got - budget) <= max(0.05 * total, 1), (got, budget)
    # deterministic across layouts
    s2 = token_budget_sample(d.repartition(11), budget, "n_tokens")
    assert sorted(r.doc_id for r in s.collect()) == sorted(
        r.doc_id for r in s2.collect()
    )
    # and the draw is a hash-order prefix: re-running with a bigger
    # budget strictly extends the sample (monotone draws — the property
    # that lets a pipeline "top up" a corpus without resampling)
    s3 = token_budget_sample(d, int(total * 0.6), "n_tokens")
    ids, ids3 = {r.doc_id for r in s.collect()}, {
        r.doc_id for r in s3.collect()
    }
    assert ids <= ids3


def test_token_budget_survives_null_tokens(spark):
    """review r4b: NULL token counts (e.g. a missed join) must not
    poison the driver cumulation."""
    from pyspark.sql import functions as F2

    d = _docs(spark).withColumn(
        "n_tokens",
        F2.when(F2.col("doc_id") % 2 == 0, F2.lit(None).cast("long"))
        .otherwise(F2.lit(10)),
    )
    s = token_budget_sample(d, 500, "n_tokens")
    got = s.agg(F2.sum("n_tokens")).collect()[0][0]
    assert got is not None and abs(got - 500) <= 200


def test_ccnet_buckets_balanced_ordered_stable(spark):
    """CCNet head/middle/tail (R65): per-lang buckets are equal-size
    (±1), score-ordered (head ≤ middle ≤ tail boundary-wise), and
    layout-independent."""
    d = _docs(spark)
    out = ccnet_buckets(d, "n_chars").cache()
    rows = out.select("lang", "doc_id", "n_chars", "ccnet_bucket").collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, {}).setdefault(
            r.ccnet_bucket, []
        ).append(r)
    for lang, buckets in by_lang.items():
        sizes = [len(buckets.get(b, [])) for b in
                 ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        if all(sizes):
            assert max(x.n_chars for x in buckets["head"]) <= min(
                x.n_chars for x in buckets["middle"]
            ), lang
            assert max(x.n_chars for x in buckets["middle"]) <= min(
                x.n_chars for x in buckets["tail"]
            ), lang
    # layout independence: identical assignment after a reshuffle
    again = {
        (r.doc_id): r.ccnet_bucket
        for r in ccnet_buckets(d.repartition(13), "n_chars")
        .select("doc_id", "ccnet_bucket").collect()
    }
    assert {r.doc_id: r.ccnet_bucket for r in rows} == again
    out.unpersist()


def test_ccnet_buckets_real_perplexity_path(spark):
    """The production wiring: score with the char-trigram LM (the
    offline KenLM stand-in), bucket per lang — head must have lower
    mean perplexity than tail."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from pii_spark.quality.perplexity import perplexity_batch

    @pandas_udf("double")
    def ppl(texts: pd.Series) -> pd.Series:
        return pd.Series(perplexity_batch(texts.fillna("").tolist()))

    d = _docs(spark).withColumn("ppl", ppl("text"))
    out = ccnet_buckets(d, "ppl", stratum_col="lang")
    stats = {
        (r.lang, r.ccnet_bucket): r.m
        for r in out.groupBy("lang", "ccnet_bucket")
        .agg(F.avg("ppl").alias("m")).collect()
    }
    langs = {k[0] for k in stats}
    assert langs
    for lang in langs:
        if (lang, "head") in stats and (lang, "tail") in stats:
            assert stats[(lang, "head")] < stats[(lang, "tail")], lang


def test_mixture_sample_quotas_and_shortfall(spark):
    """Data-mixing draw: exact largest-remainder quotas, unweighted
    strata excluded, undersized strata yield all rows (shortfall is
    visible, never silently redistributed), deterministic."""
    from pii_spark.spark.sampling import mixture_sample

    d = _docs(spark)
    got = (
        mixture_sample(d, {"src0": 5, "src1": 3, "src2": 2}, 37)
        .groupBy("source").count().collect()
    )
    assert {r.source: r["count"] for r in got} == {
        "src0": 19, "src1": 11, "src2": 7
    }
    # quota larger than the stratum: all 25 rows, shortfall visible
    got2 = (
        mixture_sample(d, {"src0": 9, "src1": 1}, 300)
        .groupBy("source").count().collect()
    )
    by = {r.source: r["count"] for r in got2}
    assert by == {"src0": 25, "src1": 25}  # 270-quota capped at 25
    # determinism across layouts
    a = {r.doc_id for r in
         mixture_sample(d, {"src0": 1}, 10).collect()}
    b = {r.doc_id for r in
         mixture_sample(d.repartition(11), {"src0": 1}, 10).collect()}
    assert a == b and len(a) == 10


def test_bucketed_cut_matches_window_reference(spark):
    """VERDICT r5 #1 exactness pin: the bucketed-histogram-cut
    implementations must produce BYTE-IDENTICAL membership/labels to
    the single-window reference formulations — including score ties,
    NULL scores (now ranked last, the r5 ADVICE fix), a point-mass
    stratum (degenerate one-bin histogram), and strata smaller than
    their quota."""
    from pyspark.sql import Window

    rows = []
    for i in range(400):
        # every 5th doc has a NULL stratum — the window formulations
        # partition NULL like any stratum, and so must the bucketed
        # cuts (a plain equi-join silently dropped these rows; the
        # eqNullSafe fix is review r6)
        lang = None if i % 5 == 0 else ["en", "de", "fr", "pt"][i % 4]
        score = (
            None if i % 37 == 0
            else 5.0 if lang == "pt"          # point mass: one bin
            else float((i * 7919) % 97)        # heavy ties
        )
        rows.append((i, lang, score))
    d = spark.createDataFrame(rows, "doc_id long, lang string, score double")

    # stratified draw vs row_number window reference
    got = sorted(
        r.doc_id for r in stratified_sample_n(
            d, "lang", 30, bucket_bits=4  # tiny buckets → real cuts
        ).collect()
    )
    wref = Window.partitionBy("lang").orderBy(
        F.xxhash64(F.col("doc_id"), F.lit(42)), F.col("doc_id")
    )
    ref = sorted(
        r.doc_id
        for r in d.withColumn("rn", F.row_number().over(wref))
        .filter("rn <= 30").collect()
    )
    assert got == ref

    # mixture draw (incl. an undersized stratum) vs the same reference
    from pii_spark.spark.sampling import mixture_sample

    got_m = sorted(
        r.doc_id for r in mixture_sample(
            d.filter("lang != 'pt' or doc_id < 20"),
            {"en": 5, "de": 3, "pt": 2}, 150, stratum_col="lang",
            bucket_bits=4,
        ).collect()
    )
    quota = {"en": 75, "de": 45, "pt": 30}  # largest remainder on 5/3/2
    ref_m = sorted(
        r.doc_id
        for r in d.filter("lang != 'pt' or doc_id < 20")
        .withColumn("rn", F.row_number().over(wref))
        .filter(F.col("lang").isin(*quota))
        .filter(
            F.col("rn") <= F.coalesce(*[
                F.when(F.col("lang") == s, F.lit(n))
                for s, n in quota.items()
            ])
        ).collect()
    )
    assert got_m == ref_m

    # ccnet labels vs the ntile window reference (NULLS LAST)
    got_c = {
        r.doc_id: r.ccnet_bucket
        for r in ccnet_buckets(d, "score", hist_bits=3).collect()
    }
    wn = Window.partitionBy("lang").orderBy(
        F.col("score").asc_nulls_last(), F.col("doc_id")
    )
    ref_c = {
        r.doc_id: ("head", "middle", "tail")[r.t - 1]
        for r in d.withColumn("t", F.ntile(3).over(wn)).collect()
    }
    assert got_c == ref_c
    # NULL scores landed in the tail, never the head (r5 ADVICE)
    null_ids = {i for i, _, s in rows if s is None}
    assert all(got_c[i] == "tail" for i in null_ids)


def test_skewed_stratum_never_sorts_stratum_wide(spark):
    """VERDICT r5 #1 scale gate: with a 90%-one-lang corpus (the
    dominant-language shape of a real crawl), no executed Window may
    partition by the raw stratum alone — every window spec must
    include the bucket column, so the largest sort task is one bucket,
    not 90% of the corpus."""
    import re

    from pii_spark.spark.sampling import mixture_sample

    d = _docs(spark, "/root/testdata/sf0.01").withColumn(
        "lang",
        F.when(F.col("doc_id") % 10 < 9, "en").otherwise(F.col("lang")),
    )

    def window_specs(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return re.findall(r"windowspecdefinition\(([^)]*)\)", plan)

    for out in (
        stratified_sample_n(d, "lang", 50),
        mixture_sample(d, {"en": 3, "de": 1}, 200, stratum_col="lang"),
        ccnet_buckets(d, "n_chars"),
    ):
        out.collect()  # materialize so AQE finalizes the plan
        specs = window_specs(out)
        assert specs, "expected a boundary window in the plan"
        for spec in specs:
            assert "_bkt" in spec or "_sb" in spec, spec
    # and the draws stay correct under the skew
    s = stratified_sample_n(d, "lang", 50)
    per = {r.lang: r["count"] for r in s.groupBy("lang").count().collect()}
    assert per["en"] == 50


def test_ccnet_heavy_tail_outlier_keeps_boundary_small(spark):
    """VERDICT r6 #1: a single 10^6-perplexity outlier against a
    50–1000 bulk must NOT collapse the histogram — under raw
    equal-width bins it put >99.9% of the stratum into bin 0, turning
    the "exact window over only the straddling bins" into a
    stratum-wide single-task sort. With log-width bins the boundary
    (_tile IS NULL) population stays a small fraction of the stratum.
    Asserted on the row count, not the plan — the plan gate cannot see
    binning geometry."""
    from pii_spark.spark.sampling import _ccnet_marked

    n = 10_000
    rows = [
        (i, "en", 1_000_000.0 if i == 0 else 50.0 + (i * 7919) % 950)
        for i in range(n)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, lang string, ppl double"
    )
    marked = _ccnet_marked(d, "ppl", "lang", 3, 10).cache()
    boundary = marked.filter(F.col("_tile").isNull()).count()
    total = marked.count()
    marked.unpersist()
    assert total == n
    # ≤ n_buckets-1 straddling bins, each ~stratum/2^bits in the
    # log-binned geometry; allow generous slack (5%) — the raw-width
    # failure mode was 99.99%
    assert boundary <= 0.05 * n, boundary
    # and membership is still exactly the ntile window's
    from pyspark.sql import Window

    got = {
        r.doc_id: r.ccnet_bucket
        for r in ccnet_buckets(d, "ppl").collect()
    }
    wn = Window.partitionBy("lang").orderBy(
        F.col("ppl").asc_nulls_last(), F.col("doc_id")
    )
    ref = {
        r.doc_id: ("head", "middle", "tail")[r.t - 1]
        for r in d.withColumn("t", F.ntile(3).over(wn)).collect()
    }
    assert got == ref
    # the outlier itself lands in the tail
    assert got[0] == "tail"


def test_sampling_driver_collects_are_cardinality_bounded(spark):
    """VERDICT r6 #3: the driver-side cuts collect ≤ #strata × 2^bits
    aggregate rows — fine for lang/source strata, fatal for a
    per-domain stratum column on a web crawl. The operators must
    refuse, not OOM the driver."""
    import pytest as _pt

    import pii_spark.spark.sampling as samp
    from pii_spark.spark.sampling import mixture_sample

    d = _docs(spark).withColumn(
        "domain", F.concat(F.lit("d"), F.col("doc_id"))
    )
    old = samp._MAX_DRIVER_ROWS
    samp._MAX_DRIVER_ROWS = 100  # 5k distinct strata >> 100
    try:
        with _pt.raises(ValueError, match="cardinality"):
            stratified_sample_n(d, "domain", 2).collect()
        with _pt.raises(ValueError, match="cardinality"):
            ccnet_buckets(d, "n_chars", stratum_col="domain").collect()
        # mixture_sample is inherently bounded: it filters to the
        # weighted strata (a driver-side dict) BEFORE its collect, so
        # a high-cardinality stratum column is harmless there
        got = mixture_sample(
            d, {"d1": 1, "d2": 1}, 10, stratum_col="domain"
        ).count()
        assert got == 2  # one doc per unique domain stratum
    finally:
        samp._MAX_DRIVER_ROWS = old
    # and the coarse-strata paths still work under the real bound
    assert stratified_sample_n(d, "lang", 5).count() > 0


def test_mixture_sample_rejects_negative_and_types_int_strata(spark):
    import pytest as _pt

    from pii_spark.spark.sampling import mixture_sample

    d = _docs(spark)
    with _pt.raises(ValueError, match="non-negative"):
        mixture_sample(d, {"src0": -1, "src1": 2}, 100)
    # zero weight = explicit exclusion, not an error
    got = mixture_sample(d, {"src0": 1, "src1": 0}, 10) \
        .groupBy("source").count().collect()
    assert {r.source: r["count"] for r in got} == {"src0": 10}
    # integer stratum column works (quota frame typed from the data)
    di = d.withColumn("bucket", (F.col("doc_id") % 3).cast("int"))
    got2 = mixture_sample(
        di, {0: 1, 1: 1}, 20, stratum_col="bucket"
    ).groupBy("bucket").count().collect()
    assert {r.bucket: r["count"] for r in got2} == {0: 10, 1: 10}
