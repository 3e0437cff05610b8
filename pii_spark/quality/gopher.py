"""The full Gopher repetition-rule suite (Rae et al. 2021, table A1).

The pipeline's keep/drop chain already enforces word-level repetition
(rep_ratio) and the driver query q_gopher_repetition checks top-word
share + duplicate word-bigram fraction against a DuckDB oracle. This
module completes the published rule set:

  * duplicate line / paragraph fractions
  * duplicate line / paragraph CHARACTER fractions
  * top 2-/3-/4-gram character share   (chars covered by the most
                                        frequent word n-gram)
  * duplicate 5..10-gram character fractions (chars covered by ANY
    occurrence of a repeated n-gram, overlaps counted once —
    positional coverage, via gopher_dup_ngram_metrics)

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
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def _words(text: str) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9]+", (text or "").lower()) if w]


from .textnorm import NON_WS_RE  # shared twin whitespace contract


def gopher_stats(text: str) -> dict[str, float]:
    """Pure-Python twin of the native metrics. Blank detection uses
    the ASCII class Java \\s matches (quality/textnorm.py) — a local
    hand-spelled class here once omitted \\n and broke parity on
    newline-only paragraphs (review r4d)."""
    text = text or ""
    lines = [ln for ln in text.split("\n") if NON_WS_RE.search(ln)]
    paras = [p for p in text.split("\n\n") if NON_WS_RE.search(p)]

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

    def dup_ngram_char_frac(n):
        """Fraction of word-characters covered by ANY occurrence of a
        repeated n-gram (positional coverage, overlaps counted once —
        the table-A1 'duplicate n-gram' family for n=5..10)."""
        if len(words) < n:
            return 0.0
        grams = [tuple(words[i:i + n])
                 for i in range(len(words) - n + 1)]
        c = Counter(grams)
        covered: set[int] = set()
        for i, g in enumerate(grams):
            if c[g] > 1:
                covered.update(range(i, i + n))
        return sum(len(words[j]) for j in covered) / n_word_chars

    out = {
        "dup_line_frac": dup_frac(lines),
        "dup_para_frac": dup_frac(paras),
        "dup_line_char_frac": dup_char_frac(lines),
        "dup_para_char_frac": dup_char_frac(paras),
        "top_2gram_char_frac": top_ngram_char_frac(2),
        "top_3gram_char_frac": top_ngram_char_frac(3),
        "top_4gram_char_frac": top_ngram_char_frac(4),
    }
    for n in range(5, 11):
        out[f"dup_{n}gram_char_frac"] = dup_ngram_char_frac(n)
    return out


def gopher_line_exprs(text: Column) -> dict[str, Column]:
    """Line/paragraph repetition metrics as in-row Catalyst
    expressions. The per-element occurrence count in dup_char_frac is
    quadratic in the LINE count of one document — lines per doc are
    dozens, not millions, so this stays cheap and shuffle-free. NULL
    text pins to ''; blank detection is rlike(\\S) on both twins
    (F.trim strips only spaces — review r4c)."""
    text = F.coalesce(text, F.lit(""))
    lines = F.filter(F.split(text, "\n"),
                     lambda x: x.rlike(r"\S"))
    paras = F.filter(F.split(text, "\n\n"),
                     lambda x: x.rlike(r"\S"))

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
        "dup_para_char_frac": dup_char_frac(paras),
    }


def _word_base(df, id_col: str, text_col: str):
    """(id, text) → (_id, w array, _chars) — shared scaffolding of the
    relational n-gram metrics (one definition, review r4d: the copies
    had already started drifting)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                     lambda w: w != "")
    return df.select(
        F.col(id_col).alias("_id"), words.alias("w")
    ).withColumn(
        "_chars",
        F.greatest(
            F.aggregate("w", F.lit(0), lambda a, x: a + F.length(x)),
            F.lit(1),
        ),
    )


def _gram_census(base, ns):
    """word base → exploded (_id, _chars, n, i, g): every n-gram of
    every requested size with its start position, one explode."""

    def grams(n):
        return F.when(
            F.size("w") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("w") - n),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    i.alias("i"),
                    F.concat_ws(
                        " ",
                        *[F.element_at("w", i + j + 1) for j in range(n)]
                    ).alias("g"),
                ),
            ),
        ).otherwise(F.array())

    return base.select(
        "_id", "_chars",
        F.explode(F.concat(*[grams(n) for n in ns])).alias("gr"),
    ).select("_id", "_chars", "gr.n", "gr.i", "gr.g")


def _attach_fracs(df, id_col: str, pivoted, ns, name_fmt: str):
    """left-join the pivoted per-(doc, n) fractions back onto every doc
    id, defaulting absent cells (no qualifying gram) to 0.0."""
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(pivoted, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            *[
                F.coalesce(F.col(str(n)), F.lit(0.0))
                .alias(name_fmt.format(n=n))
                for n in ns
            ],
        )
    )


def gopher_ngram_metrics(
    df, id_col: str = "doc_id", text_col: str = "text",
    ns: tuple = (2, 3, 4),
):
    """(id, text) → (id, top_{n}gram_char_frac …): ONE explode of all
    gram sizes, ONE count aggregation, one window per (doc, n) — the
    relational shape that scales (see module docstring for the
    measured in-row disaster). Docs with no qualifying gram (too
    short, or top count < 2 — the rule measures repetition) get 0.0."""
    from pyspark.sql import Window

    counts = _gram_census(_word_base(df, id_col, text_col), ns).groupBy(
        "_id", "_chars", "n", "g"
    ).agg(F.count("*").alias("c"))
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
        .pivot("n", list(ns))
        .agg(F.first("frac"))
    )
    return _attach_fracs(df, id_col, top, ns, "top_{n}gram_char_frac")


def gopher_dup_ngram_metrics(
    df, id_col: str = "doc_id", text_col: str = "text",
    ns: tuple = (5, 6, 7, 8, 9, 10),
):
    """(id, text) → (id, dup_5gram_char_frac … dup_10gram_char_frac):
    the character fraction covered by ANY occurrence of a repeated
    n-gram, overlaps counted once (positional coverage, matching the
    pure twin exactly). Relational plan, same family as
    gopher_ngram_metrics: one explode of all gram sizes with their
    start positions, one duplicate census, covered word positions via
    an interval explode + distinct, then one weighted sum against the
    per-position word lengths."""
    base = _word_base(df, id_col, text_col)
    exploded = _gram_census(base, ns)
    # occurrences of grams seen >1 times, with their start positions
    dup_starts = (
        exploded.groupBy("_id", "_chars", "n", "g")
        .agg(F.count("*").alias("c"), F.collect_list("i").alias("starts"))
        .filter(F.col("c") > 1)
        .select("_id", "_chars", "n",
                F.explode("starts").alias("start"))
    )
    covered = dup_starts.select(
        "_id", "_chars", "n",
        F.explode(
            F.sequence(F.col("start"), F.col("start") + F.col("n") - 1)
        ).alias("idx"),
    ).distinct()
    word_lens = base.select(
        "_id", F.posexplode("w").alias("idx", "_wv")
    ).select("_id", "idx", F.length("_wv").alias("wl"))
    frac = (
        covered.join(word_lens, ["_id", "idx"])
        .groupBy("_id", "n")
        .agg((F.sum("wl") / F.first("_chars")).alias("frac"))
        .groupBy("_id")
        .pivot("n", list(ns))
        .agg(F.first("frac"))
    )
    return _attach_fracs(df, id_col, frac, ns, "dup_{n}gram_char_frac")


def gopher_flags(stats: dict, thresholds: dict | None = None) -> dict:
    """Metric dict → per-rule boolean flags (True = rule violated)."""
    t = thresholds or THRESHOLDS
    return {k: stats[k] > v for k, v in t.items()}
