"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the embedding space, then drop
near-duplicate vectors WITHIN each cluster by pairwise cosine — the
standard scale trick that turns an O(n²) all-pairs cosine into
per-cluster blocks, exactly like MinHash bands block the lexical tier.

Spark-first plan shape:

* the clustering is ``kmeans.kmeans_fit`` (broadcast centroid joins,
  one hash-agg shuffle per Lloyd iteration);
* the within-cluster pair generation has two engines with identical
  decisions (pinned): the exploded self-join on (cluster, i) with
  ``u < w`` — oracle-replayable, shuffle key = cluster id, so the
  pair work is per-cluster-block, never all-pairs — and the
  production ``semdedup_decisions_fast`` (one numpy gram matrix per
  cluster task, measured 6.5× faster at 50k docs);
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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kmeans import _explode, kmeans_assign_blas, kmeans_fit

_DEC_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("cluster", T.IntegerType()),
    T.StructField("keep", T.BooleanType()),
    T.StructField("dup_of", T.LongType()),
])


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


def semdedup_decisions_fast(
    df: DataFrame, assign: DataFrame, tau: float,
    max_block: int = 65536,
) -> DataFrame:
    """BLAS twin of ``semdedup_decisions``: one numpy gram matrix per
    cluster block via ``applyInPandas`` instead of the exploded
    (cluster, dim) self-join — identical decisions (pinned by
    tests/test_semdedup.py on planted geometry AND seeded fuzz), at
    matmul speed instead of |c|²·dim aggregate rows per cluster.

    Scale contract: one cluster = one group = one task, and the gram
    matrix is |c|² float64 in that task's memory — so this variant
    REQUIRES the blocking contract the module documents (k sized to
    the corpus). A block larger than ``max_block`` raises loudly with
    the fix (raise k, or fall back to the join variant, which trades
    memory for shuffle); never a silent cap. float64 arithmetic on
    the same float32-widened values as the SQL path — decisions can
    differ only for cosines within ~1e-15 of tau."""
    a = assign.select("vec_id", "cluster")
    j = df.join(a, "vec_id").select("vec_id", "cluster", "embedding")
    tau_f = float(tau)
    mb = int(max_block)

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > mb:
            raise ValueError(
                f"semdedup cluster block of {len(pdf)} rows exceeds "
                f"max_block={mb}: raise k (target cluster size "
                "n/k) or use the join-based semdedup_decisions"
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        gram = m @ m.T
        denom = np.outer(norms, norms)
        # zero-norm vectors have undefined cosine -> never a dup,
        # matching the SQL path's NULL-cosine guard
        cos = np.where(denom > 0.0, gram / np.where(denom == 0.0, 1.0, denom), -np.inf)
        dup_of = np.full(len(ids), -1, dtype=np.int64)
        for w in range(1, len(ids)):
            us = np.nonzero(cos[w, :w] >= tau_f)[0]
            if len(us):
                dup_of[w] = ids[us[0]]  # ids sorted -> lowest u
        keep = dup_of < 0
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": np.full(len(ids), pdf["cluster"].iloc[0],
                               dtype=np.int32),
            "keep": keep,
            "dup_of": pd.array(
                [None if k_ else int(d) for k_, d in zip(keep, dup_of)],
                dtype="Int64",
            ),
        })

    return j.groupBy("cluster").applyInPandas(block, _DEC_SCHEMA)


def semdedup(
    df: DataFrame, k: int = 8, iters: int = 5, tau: float = 0.92,
    fit_df: DataFrame | None = None, init: str = "farthest",
    pairs: str = "join", max_block: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """df(vec_id, embedding) → (decisions(vec_id, cluster, keep,
    dup_of), centroids(cluster, i, cv)). The returned centroid frame
    is the fit's cache — callers that keep it long-lived should
    materialize and unpersist (q_kmeans_clusters does).

    ``pairs`` picks the within-cluster engine: ``"join"`` (default)
    is the exploded SQL self-join — oracle-replayable, no per-task
    memory footprint; ``"blas"`` is ``semdedup_decisions_fast`` — one
    gram matrix per cluster task (identical decisions, pinned), the
    production speed path; ``max_block`` bounds its block size.

    ``fit_df`` enables the paper's at-scale composition: fit the
    centroids on that (bounded, deterministic) sample, then
    broadcast-assign ALL of ``df`` in one ``kmeans_assign`` pass — the
    full corpus never enters the Lloyd loop or the seed init. ``init``
    is forwarded to ``kmeans_fit`` (use ``"hash"`` when k is sized
    from the corpus — the farthest-point init is one pass PER seed)."""
    if fit_df is None:
        assign, cents = kmeans_fit(df, k, iters, init=init)
    else:
        fit_assign, cents = kmeans_fit(fit_df, k, iters, init=init)
        fit_assign.unpersist()
        # materialize before the decisions self-join reads it twice.
        # The BLAS assign: the join formulation streams n×dim×k agg
        # rows (memory-bandwidth-bound — measured flat past 8 threads,
        # BENCH semdedup_scaling), the matmul moves n×dim floats
        assign = kmeans_assign_blas(df, cents).cache()
        assign.count()
    if pairs == "blas":
        dec = semdedup_decisions_fast(df, assign, tau, max_block)
    elif pairs == "join":
        dec = semdedup_decisions(df, assign, tau)
    else:
        raise ValueError(f"unknown pairs engine {pairs!r}: join|blas")
    # decisions are derived from the cached assign; materialize them
    # before handing both frames out so the caller's first action does
    # not replay the fit lineage after assign is unpersisted
    dec = dec.cache()
    dec.count()
    assign.unpersist()
    return dec, cents
