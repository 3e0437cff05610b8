"""Corpus-level duplicate-substring removal (training-data dedup).

Removes every token span that is part of a substring of ≥ k tokens
occurring more than once in the corpus — the semantics of Lee et al.
2022, *Deduplicating Training Data Makes Language Models Better*
(arXiv:2107.06499), at token granularity. The paper builds a suffix
array; that is a single-machine data structure. The Spark-first shape
rests on an exact identity instead:

    a token position lies inside SOME duplicated substring of
    ≥ k tokens  ⟺  it is covered by SOME duplicated k-gram.

(⇐ a duplicated k-gram IS such a substring. ⇒ any position of a
duplicated substring of length L ≥ k has a k-window fully inside the
substring, and every copy of the substring contains that same window,
so the window itself is duplicated.) So a k-gram census — explode,
count, keep count > 1, union the covered intervals — computes the
paper's removal mask exactly, with no suffix array and no per-doc
state: three shuffles (gram census, coverage distinct, reassembly),
all map-side-combinable or key-local.

Reassembly joins kept tokens with single spaces: the operator is a
TOKEN-level transform (its consumers are tokenizers), so original
inter-token whitespace is deliberately not preserved — both the pure
twin and the DuckDB oracle share this contract.

Scale notes: ``hashed=True`` (the production path) runs the census on
``xxhash64`` of the gram instead of the gram string — the dominant
shuffle carries 8-byte longs instead of ~50-token strings. Check-scale
callers keep ``hashed=False`` so DuckDB can replicate byte-for-byte.

Plan audit (read, not guessed): the gram explode executes exactly
TWICE — once under the census aggregate, once as the probe side of
the coverage join — and is never cached (a TB-scale intermediate has
no business in executor storage). The single-execution alternative, a
``count() over (partition by g)`` window, was rejected: a window
cannot partial-aggregate, so one viral boilerplate gram ("click here
to subscribe …" at 10^8 occurrences) colocates all its rows on one
reducer, while the groupBy census map-side-combines it to one row per
partition. The remaining scans (token rows, per-doc sizes, final
join) are cheap two-column columnar reads. The coverage join shuffles
by gram; ``hashed=True`` makes that the 8-byte shuffle. Reassembly
shuffles by (doc, pos) then by doc — both key-local, skew-free.

Reference analogue: none — the reference repo deduplicates nothing;
this is a §2.9-class LLM-pipeline addition (SURVEY R64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..quality.textnorm import ASCII_WS_RE


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) → (_id, tk array) under the shared ASCII-whitespace
    contract (quality/textnorm.py). NULL text tokenizes as empty (the
    r4c convention every quality expr follows) — without the coalesce,
    split(NULL) propagates NULL through every output metric while the
    pure twin returns 0/0/0.0 (review r5)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda w: w != "",
        ).alias("tk"),
    )


def substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hashed: bool = True,
) -> DataFrame:
    """(id, text) → (id, cleaned_text, n_tokens, n_removed_tokens,
    frac_removed): drop every token covered by a k-gram that occurs
    more than once in the corpus (cross-document AND within-document
    repeats both count, like the paper's suffix-array match).

    ``hashed=True`` runs the census on ``xxhash64(gram)`` (8-byte
    shuffle keys instead of strings). The Lee-et-al-style tradeoff,
    stated honestly: once the corpus holds ≳2^32 DISTINCT k-grams,
    64-bit birthday collisions are expected (~n²/2^65 colliding
    pairs — about one per 2×10^10 distinct grams at n=10^10), and a
    collision marks two unique grams as duplicated, deleting k clean
    tokens per site — a small false-positive deletion rate, never a
    missed duplicate. ``hashed=False`` is exact (and what the DuckDB
    oracle checks); the pin test asserts the two paths agree on the
    check corpus."""
    toks = _tokens(df, id_col, text_col)

    # one (start, gram) row per k-window; short docs contribute none.
    # sequence(0, size-k) would run DESCENDING for size < k — guard it.
    starts = F.when(
        F.size("tk") >= k,
        F.sequence(F.lit(0), F.size("tk") - k),
    ).otherwise(F.array().cast("array<int>"))
    gram = F.array_join(F.slice("tk", F.col("s") + 1, k), " ")
    if hashed:
        gram = F.xxhash64(gram)
    g2 = (
        toks.select("_id", F.explode(starts).alias("s"), "tk")
        .withColumn("g", gram)
        .drop("tk")
    )

    # global census: grams seen > 1 times anywhere in the corpus
    dup = (
        g2.groupBy("g")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select("g")
    )
    # covered token positions = union of the duplicated windows
    cov = (
        g2.join(dup, "g")
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
    )

    tok_rows = toks.select(
        "_id", F.posexplode("tk").alias("pos", "tok")
    )
    kept = tok_rows.join(cov, ["_id", "pos"], "left_anti")
    reassembled = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("cleaned_text"),
        F.count("*").alias("n_kept"),
    )
    base = toks.select("_id", F.size("tk").alias("n_tokens"))
    n_removed = F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))
    return base.join(reassembled, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        n_removed.cast("long").alias("n_removed_tokens"),
        F.round(
            n_removed / F.greatest(F.col("n_tokens"), F.lit(1)), 4
        ).alias("frac_removed"),
    )


def substring_dedup_pure(
    texts: dict, k: int = 8
) -> dict:
    """Pure-Python twin (the fuzz target): id → (cleaned_text,
    n_tokens, n_removed_tokens, frac_removed)."""
    toks = {
        i: [w for w in ASCII_WS_RE.split(t or "") if w]
        for i, t in texts.items()
    }
    from collections import Counter

    census: Counter = Counter()
    for tk in toks.values():
        for s in range(len(tk) - k + 1):
            census[tuple(tk[s:s + k])] += 1
    out = {}
    for i, tk in toks.items():
        covered: set[int] = set()
        for s in range(len(tk) - k + 1):
            if census[tuple(tk[s:s + k])] > 1:
                covered.update(range(s, s + k))
        kept = [w for p, w in enumerate(tk) if p not in covered]
        n, nr = len(tk), len(tk) - len(kept)
        out[i] = {
            "cleaned_text": " ".join(kept),
            "n_tokens": n,
            "n_removed_tokens": nr,
            "frac_removed": round(nr / max(n, 1), 4),
        }
    return out
