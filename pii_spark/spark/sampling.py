"""Deterministic corpus sampling — the draw operators a training-data
pipeline runs against a 10^12-document table.

All three operators share one principle: the randomness is a
deterministic per-row hash key ``xxhash64(id, seed)``, never Spark's
``rand()`` (not stable across retries/partitionings — SURVEY §2.8).
Ordering rows by that key IS a seeded random permutation, so a prefix
of it is an exact uniform sample, reproducible on any cluster layout.

* ``uniform_sample_n`` — exact-size uniform sample as the hash-order
  top-n: Spark executes orderBy+limit as a distributed TakeOrdered
  (per-partition top-n, tree-merged) — no global sort shuffle.
* ``stratified_sample_n`` — exact n per stratum via one window
  (row_number over hash order within the stratum): one shuffle on the
  stratum key, the canonical per-group top-n plan.
* ``token_budget_sample`` — "draw documents until ~B tokens": a global
  cumulative sum over hash order would be a single-task bottleneck, so
  the budget threshold is found on a BUCKETED cumulative histogram
  (group the hash key into 2^bits buckets, one small agg, cumulate
  driver-side, pick the bucket where the budget lands) and the sample
  is every doc below the threshold bucket — two passes, no global
  sort, deterministic. Resolution is the bucket granularity: the
  realized token count lands within one bucket's tokens of the budget
  (≈ total/2^bits in expectation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _key(id_col: str, seed: int):
    return F.xxhash64(F.col(id_col), F.lit(seed))


def uniform_sample_n(
    df: DataFrame, n: int, id_col: str = "doc_id", seed: int = 42,
    key_fn=None,
) -> DataFrame:
    """Exact-size seeded uniform sample (hash-permutation prefix).

    ``key_fn(id_col, seed)`` overrides the permutation key — the
    driver's oracle query passes an md5-string key so DuckDB can
    replicate the draw byte-for-byte; production keeps the default
    xxhash64 (8-byte longs, no digest strings shuffled)."""
    key = (key_fn or _key)(id_col, seed)
    return df.orderBy(key, F.col(id_col)).limit(n)


def stratified_sample_n(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
    key_fn=None,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows from each stratum (fewer when a
    stratum is smaller), uniformly within the stratum. ``key_fn`` as in
    ``uniform_sample_n``."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy((key_fn or _key)(id_col, seed), F.col(id_col))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    token_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    bucket_bits: int = 12,
    bucket_expr=None,
) -> DataFrame:
    """Seeded random draw of documents totalling ≈ ``budget_tokens``
    (within one bucket's resolution). Deterministic across layouts.

    Plan: bucket = top ``bucket_bits`` bits of the hash key → ONE small
    aggregation of token sums per bucket (2^bits rows) → driver-side
    cumulative scan picks the cut bucket → the sample is one
    predicate-pushed filter ``bucket <= cut``. No global sort, no
    window over the whole corpus.

    ``bucket_expr`` overrides the default xxhash64-derived bucket with
    any integer column in [0, 2^bucket_bits) — the driver's oracle
    query passes an md5-hex-derived bucket so DuckDB can replicate the
    cut deterministically."""
    n_buckets = 1 << bucket_bits
    # unsigned-shift the 64-bit key into [0, 2^bits)
    bucket = (
        bucket_expr if bucket_expr is not None
        else F.shiftrightunsigned(_key(id_col, seed), 64 - bucket_bits)
    )
    per_bucket = (
        df.select(bucket.alias("_b"), F.col(token_col))
        .groupBy("_b")
        .agg(F.sum(token_col).alias("t"))
        .collect()  # ≤ 2^bits tiny rows by construction
    )
    # an all-NULL-token bucket sums to None (SQL sum semantics) —
    # contributes zero tokens, must not poison the driver arithmetic
    sums = {r._b: (r.t or 0) for r in per_bucket}
    running, cut = 0, -1
    for b in range(n_buckets):
        t = sums.get(b, 0)
        if running + t > budget_tokens and running > 0:
            break
        running += t
        cut = b
        if running >= budget_tokens:
            break
    return df.filter(bucket <= F.lit(cut))


def mixture_sample(
    df: DataFrame,
    weights: dict,
    total_n: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    key_fn=None,
) -> DataFrame:
    """Data-mixing draw: sample ≈``total_n`` rows with per-stratum
    counts proportional to ``weights`` (the DoReMi/Pile-style static
    source-reweighting step). Strata absent from ``weights`` are
    excluded.

    Quotas use largest-remainder apportionment (floor the
    proportional share, hand the leftover rows to the largest
    fractional parts, stratum name as the tie-break) — exact integer
    counts summing to ``total_n``, deterministically. Within a
    stratum the draw is the same seeded hash-permutation prefix as
    ``stratified_sample_n``; a stratum smaller than its quota yields
    all its rows (no silent redistribution — the shortfall is the
    caller's signal that the mix is infeasible). One window + one
    broadcast-size quota join; nothing global."""
    from pyspark.sql import Window

    if any(w < 0 for w in weights.values()):
        # a negative weight would give another stratum a quota above
        # total_n while its own negative quota selects nothing — the
        # call would silently return MORE than total_n rows (review
        # r5b). Zero is fine: quota 0 = explicit exclusion.
        raise ValueError("weights must be non-negative")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    shares = {s: w / total_w * total_n for s, w in weights.items()}
    quotas = {s: int(share) for s, share in shares.items()}
    leftover = total_n - sum(quotas.values())
    for s in sorted(
        shares, key=lambda s: (-(shares[s] - quotas[s]), s)
    )[:leftover]:
        quotas[s] += 1
    from pyspark.sql.types import IntegerType, StructField, StructType

    # quota frame typed from the stratum column's ACTUAL dtype — a
    # hardcoded string schema fails on int stratum keys (review r5b)
    qdf = df.sparkSession.createDataFrame(
        [(s, n) for s, n in sorted(quotas.items())],
        StructType([
            StructField(stratum_col, df.schema[stratum_col].dataType),
            StructField("_quota", IntegerType()),
        ]),
    )
    w = Window.partitionBy(stratum_col).orderBy(
        (key_fn or _key)(id_col, seed), F.col(id_col)
    )
    return (
        df.join(qdf, stratum_col)  # inner: unweighted strata drop out
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


_CCNET_NAMES = {3: ("head", "middle", "tail")}


def ccnet_buckets(
    df: DataFrame,
    score_col: str,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §3.3): within each language, rank documents by an
    LM perplexity score and split into equal-size buckets — head
    (lowest perplexity, best), middle, tail. CCNet trains on head or
    head+middle depending on the target; the bucket label is the
    routing key.

    Rank-based on purpose: ntile needs no percentile-interpolation
    semantics to agree across engines (the paper also cuts at fixed
    FRACTIONS of the per-language distribution, which is exactly what
    equal-size rank buckets are), and the id tie-break makes the split
    deterministic under score ties and any partitioning. ONE window
    per stratum — the same single-shuffle shape as
    ``stratified_sample_n``; nothing global.

    Adds a ``ccnet_bucket`` string column ("head"/"middle"/"tail" for
    the canonical 3, else "b1".."bN")."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.col(score_col), F.col(id_col)
    )
    tile = F.ntile(n_buckets).over(w)
    names = _CCNET_NAMES.get(n_buckets)
    if names:
        label = F.element_at(
            F.array(*[F.lit(x) for x in names]), tile
        )
    else:
        label = F.concat(F.lit("b"), tile.cast("string"))
    return df.withColumn("ccnet_bucket", label)
