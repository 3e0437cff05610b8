"""Distributed training for the char-trigram quality LM.

``perplexity.py`` builds its model at import time from a small seeded
corpus — fine for the shipped artifact, but the REAL deployment trains
the domain LM on (a sample of) the corpus itself, at corpus scale.
This module is that trainer, Spark-first:

  map side  — one ``mapInPandas`` pass holds a per-partition Counter of
              bigrams/trigrams and emits ONE summary frame per
              partition (Python-side partial aggregation: the rows
              shuffled are distinct-gram counts, never raw grams);
  reduce    — a JVM ``groupBy(gram).sum`` merges partials;
  driver    — the merged counts (bounded by the trigram key space,
              not the corpus) become the same add-k-smoothed
              ``logp`` table ``perplexity._build`` produces.

Exactness: trained on the identical corpus, the distributed model is
byte-equal to the single-process one (pinned in tests/test_train_lm.py)
— the distributive property of counting, demonstrated rather than
assumed.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .perplexity import _ALPHABET, _K

_COUNT_SCHEMA = T.StructType([
    T.StructField("kind", T.StringType()),   # 'b'igram / 't'rigram
    T.StructField("gram", T.StringType()),
    T.StructField("n", T.LongType()),
])


def gram_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """(kind, gram, n) totals over the corpus — map-side Python
    Counters, JVM merge."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        big: Counter = Counter()
        tri: Counter = Counter()
        for pdf in batches:
            for t in pdf[col]:
                s = f"  {(t or '').lower()} "
                for i in range(len(s) - 2):
                    big[s[i:i + 2]] += 1
                    tri[s[i:i + 3]] += 1
        rows = [{"kind": "b", "gram": g, "n": int(c)}
                for g, c in big.items()]
        rows += [{"kind": "t", "gram": g, "n": int(c)}
                 for g, c in tri.items()]
        yield pd.DataFrame(
            rows, columns=[f.name for f in _COUNT_SCHEMA.fields])

    return (
        df.select(col)
        .mapInPandas(partial, _COUNT_SCHEMA)
        .groupBy("kind", "gram")
        .agg(F.sum("n").alias("n"))
    )


def train_char_lm(df: DataFrame, col: str = "text") -> dict[str, float]:
    """Corpus → add-k-smoothed trigram logp table (the exact model
    shape ``perplexity.py`` scores with)."""
    counts = gram_counts(df, col).collect()  # bounded by gram space
    big = {r.gram: r.n for r in counts if r.kind == "b"}
    tri = {r.gram: r.n for r in counts if r.kind == "t"}
    return {
        g: math.log((c + _K) / (big[g[:2]] + _K * _ALPHABET))
        for g, c in tri.items()
    }


def perplexity_with(logp: dict[str, float], text: str) -> float:
    """Score a text under a trained table (same semantics as
    ``perplexity.perplexity`` with its shipped model)."""
    unseen = math.log(_K / (_K * _ALPHABET))
    s = f"  {(text or '')[:2000].lower()} "
    n = len(s) - 2
    if n <= 0:
        return float("inf")
    total = sum(logp.get(s[i:i + 3], unseen) for i in range(n))
    return math.exp(-total / n)
