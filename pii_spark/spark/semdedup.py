"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the embedding space, then drop
near-duplicate vectors WITHIN each cluster by pairwise cosine — the
standard scale trick that turns an O(n²) all-pairs cosine into
per-cluster blocks, exactly like MinHash bands block the lexical tier.

Spark-first plan shape:

* the clustering is ``kmeans.kmeans_fit`` (broadcast centroid joins,
  one hash-agg shuffle per Lloyd iteration);
* the within-cluster pair generation is a self-join of the exploded
  vectors on (cluster, i) with ``u < w`` — the shuffle key is the
  cluster id, so the pair work is per-cluster-block, never all-pairs;
* the keep rule is the one-pass greedy: drop ``w`` when ANY
  lower-id ``u`` in its cluster has ``cos(u, w) >= tau`` (``dup_of`` =
  the lowest such u). The iterated variant ("u must itself be kept")
  changes keep decisions only inside chains of mutual near-dups; the
  one-pass rule is deterministic, single-shuffle, and what the paper's
  released implementation does per cluster batch.

Scale contract (the IVF cell-skew note applies, __spark_entry__
q_ann_ivf_topk): cluster sizes are data-driven — pick ``k ≈ n /
target_cluster_size`` so the per-cluster pair block (size²·dim rows
through one hash-agg) fits a task. A genuinely hot cluster means the
data really is one semantic blob; the per-cluster work is a hash
aggregate (partial agg, no sort), so it costs proportionally more
scan, not a single-task collapse. The pair join is skew-safe for the
same reason the SimHash band verify is: blocks are bounded by
construction when k is sized to the corpus.

Determinism: inherited from kmeans_fit (seeded farthest-point init,
fixed iterations) + the lowest-id tie rule; identical output for any
partitioning/retry, pinned by tests/test_semdedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import _explode, kmeans_fit


def semdedup_decisions(
    df: DataFrame, assign: DataFrame, tau: float
) -> DataFrame:
    """df(vec_id, embedding) + assign(vec_id, cluster[, ...]) →
    (vec_id, cluster, keep, dup_of). ``dup_of`` is the lowest-id
    vector in the same cluster with cosine >= tau (NULL when kept)."""
    ex = _explode(df)
    a = assign.select("vec_id", "cluster")
    exc = ex.join(a, "vec_id")
    pairs = (
        exc.alias("l")
        .join(
            exc.alias("r"),
            (F.col("l.cluster") == F.col("r.cluster"))
            & (F.col("l.i") == F.col("r.i"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .groupBy(
            F.col("l.cluster").alias("cluster"),
            F.col("l.vec_id").alias("u"),
            F.col("r.vec_id").alias("w"),
        )
        .agg(
            F.sum(F.col("l.v") * F.col("r.v")).alias("dot"),
            F.sqrt(F.sum(F.col("l.v") * F.col("l.v"))).alias("nu"),
            F.sqrt(F.sum(F.col("r.v") * F.col("r.v"))).alias("nw"),
        )
        .withColumn(
            # a zero-norm vector (an empty doc after upstream rewrites
            # embeds to the zero vector) has no direction: its cosine
            # is undefined, NOT 1.0 — NULL here, which the tau filter
            # below excludes, so zero vectors are never semantic dups
            # (byte-identical empties are the exact tier's job). A
            # plain division would raise DIVIDE_BY_ZERO under ANSI
            # mode (measured on the 4-stage run_dedup chain).
            "cos",
            F.when(
                (F.col("nu") > 0) & (F.col("nw") > 0),
                F.col("dot") / (F.col("nu") * F.col("nw")),
            ),
        )
    )
    dup = (
        pairs.filter(F.col("cos") >= F.lit(float(tau)))
        .groupBy("w")
        .agg(F.min("u").alias("dup_of"))
    )
    return (
        a.join(dup, a.vec_id == dup.w, "left")
        .select(
            "vec_id",
            "cluster",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


def semdedup(
    df: DataFrame, k: int = 8, iters: int = 5, tau: float = 0.92
) -> tuple[DataFrame, DataFrame]:
    """df(vec_id, embedding) → (decisions(vec_id, cluster, keep,
    dup_of), centroids(cluster, i, cv)). The returned centroid frame
    is the fit's cache — callers that keep it long-lived should
    materialize and unpersist (q_kmeans_clusters does)."""
    assign, cents = kmeans_fit(df, k, iters)
    dec = semdedup_decisions(df, assign, tau)
    # decisions are derived from the cached assign; materialize them
    # before handing both frames out so the caller's first action does
    # not replay the fit lineage after assign is unpersisted
    dec = dec.cache()
    dec.count()
    assign.unpersist()
    return dec, cents
