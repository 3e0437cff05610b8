"""Deterministic dataset splits (SURVEY §2 X1/X2).

The reference shuffles globally then slices contiguous ranges
(build_datasets.py:124-133: shuffle(seed=42) → 80/10/10). A global sort
is a full-cluster shuffle at 10^12 rows; the scalable equivalent is a
per-row hash split: pmod(xxhash64(key, seed), 10) → 8/1/1. Same
marginal distribution, zero shuffle, stable under retries and
partitioning (Spark's rand() is neither).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import SEED_DEFAULT, TRAIN_RATIO, VAL_RATIO


def split_expr(key: str = "doc_id", seed: int = SEED_DEFAULT) -> Column:
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(10))
    n_train = int(TRAIN_RATIO * 10)
    n_val = int(VAL_RATIO * 10)
    return (
        F.when(bucket < n_train, F.lit("train"))
        .when(bucket < n_train + n_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def with_split(df: DataFrame, key: str = "doc_id",
               seed: int = SEED_DEFAULT) -> DataFrame:
    return df.withColumn("split", split_expr(key, seed))
