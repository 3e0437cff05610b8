"""Paragraph-level dedup, keep-first (Dolma-style).

The Dolma toolkit (Soldaini et al. 2024, arXiv:2402.00159) dedupes at
paragraph granularity: a paragraph seen before (tracked with a Bloom
filter in their single-pass implementation) is removed, the FIRST
occurrence survives. This differs from duplicate-substring removal
(substr_dedup.py), which removes EVERY copy including the first and
works at arbitrary token spans; here the unit is the paragraph and
one canonical copy is kept — the right semantics when the paragraph
is boilerplate worth keeping once (a license header, a site footer).

Spark-first shape — no Bloom filter, no sequential state:

* "first" is made deterministic as the minimum (id, position)
  occurrence, a total order independent of partitioning (Dolma's
  Bloom order is ingest order; a distributed run needs an explicit
  order to be reproducible);
* one paragraph census ``groupBy(xxhash64(para)).agg(count,
  min(struct(id, pos)))`` (8-byte keys; ``hashed=False`` keeps the
  exact string census for the oracle) — partial-aggregated map-side,
  so a viral boilerplate
  paragraph (10^8 copies of "Subscribe to our newsletter") combines
  to one row per partition instead of colocating all copies on one
  reducer (the window/row_number formulation was rejected for exactly
  that hot-key reason);
* only paragraphs with count > 1 join back (the flagged-only join
  pattern measured in pipeline.py r5: the corpus side then never
  shuffles when AQE broadcasts the duplicated-paragraph set);
* whitespace-only paragraphs are structure, not content: they never
  participate in the census and are always kept.

Reassembly joins surviving paragraphs with the original separator.
Reference analogue: none (the reference dedupes nothing) — SURVEY R66.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NON_WS = "[^ \\t\\n\\x0b\\f\\r]"


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    hashed: bool = True,
) -> DataFrame:
    """(id, text) → (id, cleaned_text, n_paras, n_removed_paras,
    frac_removed): remove every non-first occurrence of a duplicated
    paragraph across the whole corpus. ``sep`` splits paragraphs
    (Dolma uses newline); it is treated as a literal, not a regex.

    ``hashed=True`` (the scale default, VERDICT r5 #2) runs the
    census and the join-back on ``xxhash64(para)`` — 8-byte shuffle
    keys instead of whole paragraph strings on both the aggregation
    AND the join exchange. Same 64-bit tradeoff as
    ``substring_dedup``: at ≳2^32 distinct paragraphs, birthday
    collisions mark a few unique paragraphs as duplicated and drop
    the one that isn't the colliding pair's global first — a tiny
    false-REMOVAL rate, never a missed duplicate. ``hashed=False``
    is exact and is what the DuckDB oracle replicates; the pin test
    asserts the two paths agree on the check corpus."""
    import re as _re

    parts = F.split(
        F.coalesce(F.col(text_col), F.lit("")), _re.escape(sep), -1
    )
    occ = df.select(
        F.col(id_col).alias("_id"), F.posexplode(parts).alias("pos", "para")
    ).withColumn("_content", F.col("para").rlike(_NON_WS))
    pk = F.xxhash64("para") if hashed else F.col("para")
    occ = occ.withColumn("_pk", pk)

    dup = (
        occ.filter("_content")
        .groupBy("_pk")
        .agg(
            F.count("*").alias("c"),
            F.min(F.struct("_id", "pos")).alias("first_occ"),
        )
        .filter(F.col("c") > 1)
        .select("_pk", "first_occ")
    )
    kept = (
        occ.join(dup, "_pk", "left")
        .filter(
            F.col("first_occ").isNull()
            | (F.struct("_id", "pos") == F.col("first_occ"))
        )
        .select("_id", "pos", "para")
    )
    reassembled = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias("cleaned_text"),
        F.count("*").alias("n_kept"),
    )
    base = df.select(
        F.col(id_col).alias("_id"), F.size(parts).alias("n_paras")
    )
    n_removed = F.col("n_paras") - F.coalesce(F.col("n_kept"), F.lit(0))
    return base.join(reassembled, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        F.col("n_paras").cast("long").alias("n_paras"),
        n_removed.cast("long").alias("n_removed_paras"),
        F.round(
            n_removed / F.greatest(F.col("n_paras"), F.lit(1)), 4
        ).alias("frac_removed"),
    )


def paragraph_dedup_pure(texts: dict, sep: str = "\n") -> dict:
    """Pure-Python twin (fuzz target), same keep-first contract."""
    import re

    non_ws = re.compile(_NON_WS)  # \t-style escapes parse identically
    # in Python re and Java regex
    first: dict = {}
    split = {
        i: (t or "").split(sep) for i, t in sorted(texts.items())
    }
    counts: dict = {}
    for i in sorted(split):
        for p, para in enumerate(split[i]):
            if non_ws.search(para):
                counts[para] = counts.get(para, 0) + 1
                first.setdefault(para, (i, p))
    out = {}
    for i in sorted(split):
        keep = [
            para
            for p, para in enumerate(split[i])
            if not non_ws.search(para)
            or counts[para] == 1
            or first[para] == (i, p)
        ]
        n, nr = len(split[i]), len(split[i]) - len(keep)
        out[i] = {
            "cleaned_text": sep.join(keep),
            "n_paras": n,
            "n_removed_paras": nr,
            "frac_removed": round(nr / max(n, 1), 4),
        }
    return out
