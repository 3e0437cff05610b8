"""The full Gopher repetition-rule suite (Rae et al. 2021, table A1).

The pipeline's keep/drop chain already enforces word-level repetition
(rep_ratio) and the driver query q_gopher_repetition checks top-word
share + duplicate word-bigram fraction against a DuckDB oracle. This
module completes the published rule set:

  * duplicate line fraction            (share of lines seen before)
  * duplicate paragraph fraction       (same, blank-line separated)
  * duplicate line CHARACTER fraction  (chars inside repeated lines)
  * top 2-/3-/4-gram character share   (chars covered by the most
                                        frequent word n-gram)

Every metric exists twice, pinned equal by tests/test_gopher.py:

  * ``gopher_stats`` — pure Python (the policy twin);
  * ``gopher_line_exprs`` — the line/paragraph metrics as in-row
    Catalyst expressions (arrays are small — a doc has few lines);
  * ``gopher_ngram_metrics`` — the top-n-gram metrics as ONE explode +
    ONE aggregation + a per-(doc, n) window (the q_gopher_repetition
    plan shape). This was MEASURED, not assumed: an in-row
    aggregate/filter formulation of the n-gram census ran 0.6 s/doc
    (interpreted nested higher-order functions, quadratic per doc) —
    the relational shape does the same work in milliseconds and is the
    plan that survives 100 TB.

Thresholds (Gopher's published ones as defaults) are exposed via
``gopher_flags`` but NOT wired into the pipeline's keep decision —
enabling them is a config policy choice; the shipped keep chain stays
byte-stable.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column
from pyspark.sql import functions as F

# Gopher table A1 thresholds
THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
}


def _words(text: str) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9]+", (text or "").lower()) if w]


def gopher_stats(text: str) -> dict[str, float]:
    """Pure-Python twin of ``gopher_exprs``."""
    text = text or ""
    lines = [ln for ln in text.split("\n") if ln.strip()]
    paras = [p for p in text.split("\n\n") if p.strip()]

    def dup_frac(items):
        if not items:
            return 0.0
        return 1.0 - len(set(items)) / len(items)

    def dup_char_frac(items):
        total = sum(len(i) for i in items)
        if total == 0:
            return 0.0
        c = Counter(items)
        dup_chars = sum(len(i) * n for i, n in c.items() if n > 1)
        return dup_chars / total

    words = _words(text)
    n_word_chars = sum(len(w) for w in words) or 1

    def top_ngram_char_frac(n):
        if len(words) < n:
            return 0.0
        grams = Counter(
            tuple(words[i:i + n]) for i in range(len(words) - n + 1)
        )
        gram, cnt = max(grams.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            # the rule measures REPETITION; a gram seen once covers a
            # large char share of any short document without repeating
            # anything — contributes 0, like the dup-line rules
            return 0.0
        return cnt * sum(len(w) for w in gram) / n_word_chars

    return {
        "dup_line_frac": dup_frac(lines),
        "dup_para_frac": dup_frac(paras),
        "dup_line_char_frac": dup_char_frac(lines),
        "top_2gram_char_frac": top_ngram_char_frac(2),
        "top_3gram_char_frac": top_ngram_char_frac(3),
        "top_4gram_char_frac": top_ngram_char_frac(4),
    }


def gopher_line_exprs(text: Column) -> dict[str, Column]:
    """Line/paragraph repetition metrics as in-row Catalyst
    expressions. The per-element occurrence count in dup_char_frac is
    quadratic in the LINE count of one document — lines per doc are
    dozens, not millions, so this stays cheap and shuffle-free."""
    lines = F.filter(F.split(text, "\n"),
                     lambda x: F.trim(x) != "")
    paras = F.filter(F.split(text, "\n\n"),
                     lambda x: F.trim(x) != "")

    def dup_frac(items):
        n = F.size(items)
        return F.when(
            n > 0, 1.0 - F.size(F.array_distinct(items)) / n
        ).otherwise(F.lit(0.0))

    def dup_char_frac(items):
        total = F.aggregate(
            items, F.lit(0), lambda acc, x: acc + F.length(x)
        )
        dup_chars = F.aggregate(
            items,
            F.lit(0),
            lambda acc, x: acc + F.when(
                F.size(F.filter(items, lambda y: y == x)) > 1,
                F.length(x),
            ).otherwise(F.lit(0)),
        )
        return F.when(total > 0, dup_chars / total).otherwise(F.lit(0.0))

    return {
        "dup_line_frac": dup_frac(lines),
        "dup_para_frac": dup_frac(paras),
        "dup_line_char_frac": dup_char_frac(lines),
    }


def gopher_ngram_metrics(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """(id, text) → (id, top_2gram_char_frac, top_3gram_char_frac,
    top_4gram_char_frac): ONE explode of all three gram sizes, ONE
    count aggregation, one window per (doc, n) — the relational shape
    that scales (see module docstring for the measured in-row
    disaster). Docs with no qualifying gram (too short, or top count
    < 2 — the rule measures repetition) get 0.0."""
    from pyspark.sql import Window

    words = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                     lambda w: w != "")
    base = df.select(
        F.col(id_col).alias("_id"), words.alias("w")
    ).withColumn(
        "_chars",
        F.greatest(
            F.aggregate("w", F.lit(0), lambda a, x: a + F.length(x)),
            F.lit(1),
        ),
    )

    def grams(n):
        return F.when(
            F.size("w") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("w") - n),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.concat_ws(
                        " ",
                        *[F.element_at("w", i + j + 1) for j in range(n)]
                    ).alias("g"),
                ),
            ),
        ).otherwise(F.array())

    exploded = base.select(
        "_id", "_chars",
        F.explode(F.concat(grams(2), grams(3), grams(4))).alias("gr"),
    ).select("_id", "_chars", "gr.n", "gr.g")
    counts = exploded.groupBy("_id", "_chars", "n", "g").agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy("_id", "n").orderBy(
        F.col("c").desc(), F.col("g").desc()
    )
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("c") >= 2))
        .withColumn(
            "frac",
            F.col("c") * (F.length("g") - (F.col("n") - 1)) / F.col("_chars"),
        )
        .groupBy("_id")
        .pivot("n", [2, 3, 4])
        .agg(F.first("frac"))
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(top, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("2"), F.lit(0.0)).alias("top_2gram_char_frac"),
            F.coalesce(F.col("3"), F.lit(0.0)).alias("top_3gram_char_frac"),
            F.coalesce(F.col("4"), F.lit(0.0)).alias("top_4gram_char_frac"),
        )
    )


def gopher_flags(stats: dict, thresholds: dict | None = None) -> dict:
    """Metric dict → per-rule boolean flags (True = rule violated)."""
    t = thresholds or THRESHOLDS
    return {k: stats[k] > v for k, v in t.items()}
