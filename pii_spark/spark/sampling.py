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
