"""Heavy-hitters sketch vs exact counts: presence guarantee, bound
bracketing, and top-k agreement on clearly separated hitters."""

from pyspark.sql import functions as F

from pii_spark.spark.sketches import _space_saving, heavy_hitters


def _skewed_df(spark, n=40_000, parts=8):
    """Zipf-flavored domains: d0 ≈ 25%, d1 ≈ 12%, …, long tail of
    near-unique values (deterministic from id)."""
    return (
        spark.range(n).repartition(parts)
        .select(
            F.when(F.col("id") % 4 == 0, "d0")
            .when(F.col("id") % 8 == 1, "d1")
            .when(F.col("id") % 16 == 2, "d2")
            .when(F.col("id") % 32 == 3, "d3")
            .otherwise(F.concat(F.lit("tail"), F.col("id").cast("string")))
            .alias("domain")
        )
    )


def test_space_saving_unit():
    xs = ["a"] * 50 + ["b"] * 30 + [f"t{i}" for i in range(100)] + ["a"] * 20
    s = _space_saving(iter(xs), capacity=16)
    assert len(s) == 16
    # a appears 70 times; count in [70, 70+err]
    cnt, err = s["a"]
    assert cnt - err <= 70 <= cnt
    assert s["b"][0] - s["b"][1] <= 30 <= s["b"][0]


def test_heavy_hitters_vs_exact(spark):
    df = _skewed_df(spark).cache()
    n = df.count()
    exact = {
        r.domain: r["count"]
        for r in df.groupBy("domain").count().collect()
    }
    hh = heavy_hitters(df, "domain", k=8, capacity=256)
    got = {item: (lo, hi) for item, lo, hi in hh}

    # presence guarantee: every item with freq > n/capacity is found
    for item, c in exact.items():
        if c > n / 256:
            assert item in got, (item, c)
    # bounds bracket the true counts
    for item, (lo, hi) in got.items():
        assert lo <= exact.get(item, 0) <= hi, (item, lo, hi)
    # the separated top-4 are exactly the planted heavy domains, in order
    assert [t[0] for t in hh[:4]] == ["d0", "d1", "d2", "d3"]
    # ...and their bounds are tight enough to order them by lower bound
    assert got["d0"][0] > got["d1"][1] >= got["d1"][0] > got["d2"][1]


def test_heavy_hitters_partitioning_insensitive(spark):
    """The guarantee (presence + bracketing) holds for any layout; the
    top of the ranking is stable across partition counts."""
    a = heavy_hitters(_skewed_df(spark, parts=3), "domain", k=4,
                      capacity=256)
    b = heavy_hitters(_skewed_df(spark, parts=12), "domain", k=4,
                      capacity=256)
    assert [t[0] for t in a] == [t[0] for t in b] == ["d0", "d1", "d2",
                                                      "d3"]
