"""Winnowing semantics pin for the xxhash64 scale variant (no DuckDB
twin possible) + a measured cost comparison of the two hash paths.

The md5 variant is oracle-checked; the fast variant must exhibit the
same *winnowing* behavior even though the selected grams differ:
  * exact duplicate docs share their entire fingerprint set;
  * a single-char edit preserves most fingerprints (locality);
  * window structure is identical (same (doc_id, win) key set).
"""

import time

from pyspark.sql import functions as F

from __spark_entry__ import winnow_fps


def _docs_df(spark, n=30):
    from pii_spark.spark.gen_job import generate_corpus

    return (
        generate_corpus(spark, n)
        .select(F.monotonically_increasing_id().alias("_r"), "text")
        .select(F.col("_r").alias("doc_id"), "text")
    )


def test_fast_winnow_semantics_match_md5_variant(spark):
    base = _docs_df(spark).cache()
    dup = base.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    # single-char edit: flip the first char
    edit = base.select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat(F.lit("Z"), F.expr("substring(text, 2)")).alias("text"),
    )
    corpus = base.union(dup).union(edit)

    for fast in (False, True):
        fps = winnow_fps(corpus, fast=fast).cache()
        by_doc = {}
        for r in fps.collect():
            by_doc.setdefault(r.doc_id, set()).add((r.win, r.fp))
        base_ids = [d for d in by_doc if d < 1000]
        assert len(base_ids) > 0
        for d in base_ids:
            # exact duplicate: identical fingerprint set
            assert by_doc[d] == by_doc[d + 1000], (fast, d)
            # 1-char edit: same window structure, most windows unchanged
            wins = {w for w, _ in by_doc[d]}
            ewins = {w for w, _ in by_doc[d + 2000]}
            assert wins == ewins, (fast, d)
            # flipping char 1 only perturbs the gram starting at 1,
            # which lives in window 0 — every other (win, fp) pair is
            # untouched, deterministically
            same = len(by_doc[d] & by_doc[d + 2000])
            assert same >= len(by_doc[d]) - 1, (fast, d, same)
        fps.unpersist()
    base.unpersist()


def test_fast_winnow_is_not_slower(spark):
    """Directional cost check on a few hundred docs (host noise makes a
    strict ratio flaky; the fast path must at least not regress)."""
    docs = _docs_df(spark, 400).cache()
    docs.count()

    def run(fast):
        t0 = time.time()
        winnow_fps(docs, fast=fast).groupBy().count().collect()
        return time.time() - t0

    run(True)  # warm
    # best-of-two per variant, interleaved: the host takes external
    # load waves (BENCH/BASELINE.md) and a single pair can land one
    # variant inside a wave
    t_md5 = min(run(False), run(False))
    t_fast = min(run(True), run(True))
    docs.unpersist()
    assert t_fast <= t_md5 * 1.5, (t_fast, t_md5)


def test_fast_minhash_semantics_match_md5_variant(spark, tmp_path):
    """Band/collision semantics of the xxhash64 minhash variant vs the
    oracle-checked md5 one: on a corpus where every doc is duplicated,
    BOTH variants must report every doc in a >1 bucket for every band
    (identical texts share all band minima regardless of hash)."""
    import pandas as pd

    from __spark_entry__ import q_dedup_minhash, q_dedup_minhash_fast

    docs = _docs_df(spark, 25).toPandas()
    dup = docs.copy()
    dup["doc_id"] += 1000
    pd.concat([docs, dup]).to_parquet(
        tmp_path / "documents.parquet", index=False)

    for q in (q_dedup_minhash, q_dedup_minhash_fast):
        rows = q(spark, str(tmp_path)).collect()
        assert len(rows) == 4, q.__name__  # 4 bands
        for r in rows:
            # every one of the 50 docs collides (min-hash of identical
            # text is identical) → all docs in >1 buckets, ≤25 buckets
            assert r.n_collided_docs == 50, (q.__name__, r)
            assert r.n_buckets <= 25, (q.__name__, r)
