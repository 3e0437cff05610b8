"""Bucketed co-located joins — the shuffle-elimination strategy
SURVEY §2.6/§4 prescribes for repeated large-table joins at 100 TB:
both sides written with bucketBy(k, key) + sortBy(key) join as a
SortMergeJoin with NO Exchange on either side (bucket layout replaces
the shuffle; at cluster scale that is the difference between re-sending
the fact table over the network per join and reading co-located
buckets). Pinned here as a physical-plan gate, like the other
tests/test_plan_quality.py properties.
"""

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    suffix = uuid.uuid4().hex[:8]
    a, b = f"docs_a_{suffix}", f"docs_b_{suffix}"
    (docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
         .mode("overwrite").saveAsTable(a))
    (docs.select("doc_id", "n_chars")
         .write.bucketBy(8, "doc_id").sortBy("doc_id")
         .mode("overwrite").saveAsTable(b))
    yield a, b
    spark.sql(f"DROP TABLE IF EXISTS {a}")
    spark.sql(f"DROP TABLE IF EXISTS {b}")


def test_bucketed_join_eliminates_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    # force the join strategy decision to SMJ (a broadcast would hide
    # the bucket layout's effect at this tiny scale)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(a).join(
            spark.table(b).withColumnRenamed("n_chars", "nc2"), "doc_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # the whole point: bucket layout replaces the shuffle
        assert "Exchange" not in plan, plan
        assert j.count() == spark.table(a).count()
        # correctness of the co-located join result
        bad = j.filter(F.col("n_chars") != F.col("nc2")).count()
        assert bad == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles(spark, tmp_path):
    """Control: the identical join over plain parquet DOES plan an
    Exchange — proving the gate above measures the bucket layout, not
    some session default."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p1, p2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    docs.write.parquet(p1)
    docs.select("doc_id", "n_chars").write.parquet(p2)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.read.parquet(p1).join(
            spark.read.parquet(p2).withColumnRenamed("n_chars", "nc2"),
            "doc_id",
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
