"""Bounded-memory frequency sketches for web-scale analytics.

``heavy_hitters`` answers "which domains/urls dominate the corpus"
without the failure mode exact ``groupBy(col).count()`` has at 10^12
rows over 10^9 distinct keys: an unbounded shuffle keyed by every
distinct value. Instead each partition builds a space-saving summary
(Metwally et al. 2005) of fixed ``capacity``, and the driver merges the
per-partition summaries with the mergeable-summaries bound (Agarwal et
al. 2012):

  * per partition: count(item) overestimates by at most err(item), and
    any item whose true partition frequency exceeds
    rows_p / capacity is guaranteed present;
  * merge: upper(item) = Σ_present count_p + Σ_absent threshold_p,
    lower(item) = Σ_present (count_p − err_p) — true count always in
    [lower, upper]; any item with total frequency > N / capacity
    survives the merge.

Driver-side merge is bounded by construction — num_partitions ×
capacity rows, independent of data size — which is exactly why sketch
summaries exist; this is NOT a collect() of data. The per-item eviction
here scans the summary for the minimum (O(capacity)); the classic
stream-summary linked structure makes it O(1) — a constant-factor
swap documented rather than implemented, since Python-side cost is
dominated by Arrow transfer either way.

Exactness twin: tests/test_sketches.py pins presence guarantees and
bound bracketing against exact counts on skewed corpora.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SUMMARY_SCHEMA = T.StructType([
    T.StructField("item", T.StringType()),
    T.StructField("cnt", T.LongType()),
    T.StructField("err", T.LongType()),
    T.StructField("pid", T.IntegerType()),
    T.StructField("threshold", T.LongType()),
])


def _space_saving(values: Iterator[str], capacity: int) -> dict:
    """One space-saving pass: item -> [count, err]."""
    counters: dict[str, list[int]] = {}
    for x in values:
        if x is None:
            continue
        c = counters.get(x)
        if c is not None:
            c[0] += 1
        elif len(counters) < capacity:
            counters[x] = [1, 0]
        else:
            victim = min(counters, key=lambda i: counters[i][0])
            vcount = counters.pop(victim)[0]
            # inherit the evicted minimum: overestimate, bounded err
            counters[x] = [vcount + 1, vcount]
    return counters


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, capacity: int = 256
) -> list[tuple[str, int, int]]:
    """Top-``k`` most frequent values of ``col`` with deterministic
    error bounds: returns [(item, lower, upper)] sorted by lower bound
    descending. Guaranteed to contain every item whose true frequency
    exceeds total_rows / capacity."""

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters = _space_saving(
            (x for pdf in batches for x in pdf[col]), capacity
        )
        # threshold: max count an ABSENT item could have in this
        # partition = the summary's min count when full, else 0
        threshold = (
            min(c[0] for c in counters.values())
            if len(counters) >= capacity else 0
        )
        yield pd.DataFrame(
            [
                {"item": i, "cnt": c[0], "err": c[1], "pid": pid,
                 "threshold": threshold}
                for i, c in counters.items()
            ],
            columns=[f.name for f in _SUMMARY_SCHEMA.fields],
        )

    summaries = (
        df.select(col)
        .mapInPandas(per_partition, _SUMMARY_SCHEMA)
        .collect()  # bounded: partitions × capacity rows BY DESIGN
    )
    thresholds: dict[int, int] = {}
    present: dict[str, dict[int, tuple[int, int]]] = {}
    for r in summaries:
        thresholds[r.pid] = r.threshold
        present.setdefault(r.item, {})[r.pid] = (r.cnt, r.err)
    total_threshold = sum(thresholds.values())
    out = []
    for item, parts in present.items():
        upper = sum(c for c, _ in parts.values()) + (
            total_threshold - sum(thresholds[p] for p in parts)
        )
        lower = sum(c - e for c, e in parts.values())
        out.append((item, max(lower, 0), upper))
    out.sort(key=lambda t: (-t[1], -t[2], t[0]))
    return out[:k]
