"""AQE runtime skew-join splitting — the second half of the engine's
skew story. The salted repartition (tests/test_plan_quality.py) handles
skew BEFORE UDF stages; for skewed JOIN keys the session relies on
spark.sql.adaptive.skewJoin (enabled in pii_spark.spark.session). This
gate proves the mechanism actually engages — the executed plan carries
SortMergeJoin(skew=true) and a skewed AQEShuffleRead — rather than
merely being configured.

Thresholds are lowered to make a test-sized partition count as skewed;
at cluster scale the defaults (256 MB advisory) play the same role.
The final adaptive plan is only observable on the EXECUTED DataFrame's
own QueryExecution (count()/write() build separate plans), hence the
collect().
"""

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    prev = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        # 95% of the left side shares key 0 — the hot-domain join shape
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string"))
            .alias("payload"),
        )
        right = spark.range(10_000).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        j = left.join(right, "k")
        rows = j.collect()
        assert len(rows) == 190_500  # 190k hot-key + 500 distinct hits
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "AQEShuffleRead" in plan and "skewed" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
