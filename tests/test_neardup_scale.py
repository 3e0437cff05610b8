"""Scale-safety evidence for the near-dup family (VERDICT r1 #1).

The driver's synthetic corpus is template-heavy — >50% of doc pairs are
genuine near-dups, so candidate pruning is meaningless there (the exact
answer itself is quadratic; oracle equality in CORRECTNESS proves the
prefix-filter rewrite lossless on that data). These tests build
controlled corpora where near-dups are sparse and pin the properties
that matter at 100 TB:

  * prefix filtering: exact result AND candidate pairs << all pairs
    AND no hot join key
  * banded hyperplane LSH: 100% recall on true near-dups (cos >= 0.95,
    the operator's design threshold) AND real candidate pruning
  * within-bucket top-k: finds the true nearest neighbors of the query
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


def _write_documents(tmp_path, texts):
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _write_embeddings(tmp_path, vecs):
    df = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.zeros(len(vecs), dtype=np.int32),
        }
    )
    df.to_parquet(tmp_path / "embeddings.parquet", index=False)
    return str(tmp_path)


@pytest.fixture(scope="module")
def sparse_docs():
    """200 docs of 30 words from a 5000-word vocab: 180 distinct random
    sets (expected pairwise Jaccard ~0.003) + 20 near-dups, each a copy
    of doc i with 2 of 30 words replaced (Jaccard 28/32 = 0.875)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i:04d}" for i in range(5000)]
    base = [
        rng.choice(vocab, size=30, replace=False).tolist() for _ in range(180)
    ]
    texts = [" ".join(ws) for ws in base]
    truth_pairs = set()
    for k in range(20):
        src = k * 7  # spread across the corpus
        ws = list(base[src])
        repl = rng.choice(vocab, size=2, replace=False)
        ws[3], ws[17] = str(repl[0]), str(repl[1])
        truth_pairs.add((src, len(texts)))
        texts.append(" ".join(ws))
    return texts, truth_pairs


def _brute_force_jaccard(texts, t):
    sets = [frozenset(x.lower().split()) for x in texts]
    out = set()
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            inter = len(sets[a] & sets[b])
            if inter and inter / (len(sets[a] | sets[b])) >= t:
                out.add((a, b))
    return out


def test_prefix_filter_exact_and_pruned(spark, tmp_path, sparse_docs):
    texts, truth_pairs = sparse_docs
    sf = _write_documents(tmp_path, texts)
    got = {
        (r.da, r.db)
        for r in entry.q_dedup_ngram_jaccard(spark, sf).collect()
    }
    expect = _brute_force_jaccard(texts, entry._JACCARD_T)
    assert got == expect  # exactness: prefix filtering loses nothing
    assert truth_pairs <= got

    # pruning: rebuild the prefix relation the query uses and check the
    # candidate join is sparse and key-balanced on sparse data
    toks = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                             lambda w: w != "")
                )
            ).alias("w"),
        )
    )
    dfreq = toks.groupBy("w").agg(F.count("*").alias("df"))
    docs = (
        toks.join(dfreq, "w")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "w"))).alias("sw"))
        .select("doc_id", F.size("sw").alias("n"),
                F.expr("transform(sw, s -> s.w)").alias("toks"))
        .withColumn("plen", (F.col("n") - F.floor(
            F.lit(entry._JACCARD_T) * F.col("n"))).cast("int") + F.lit(1))
    )
    pre = docs.select(
        "doc_id", F.explode(F.expr("slice(toks, 1, plen)")).alias("w")
    )
    n_cand = (
        pre.alias("a")
        .join(pre.alias("b"),
              (F.col("a.w") == F.col("b.w"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id").distinct().count()
    )
    n_all = len(texts) * (len(texts) - 1) // 2
    assert n_cand < 0.10 * n_all, f"{n_cand} candidates of {n_all} pairs"
    max_key = pre.groupBy("w").count().agg(F.max("count")).collect()[0][0]
    assert max_key <= 3  # rarest-token prefixes: no hot join key


@pytest.fixture(scope="module")
def planted_embeddings():
    """300 random unit vectors + 20 planted near-dups (cos >= 0.95).
    vec_id 0 gets three planted neighbors so the top-k query has true
    answers in its bucket candidates."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(300, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [v for v in base]
    planted = set()
    srcs = [0, 0, 0] + [5 * k for k in range(1, 18)]
    for src in srcs:
        v = base[src] + rng.normal(scale=0.03, size=64)
        v /= np.linalg.norm(v)
        assert float(v @ base[src]) >= 0.95
        planted.add((src, len(vecs)))
        vecs.append(v)
    return np.asarray(vecs), planted


def test_embedding_lsh_recall_and_pruning(spark, tmp_path, planted_embeddings):
    vecs, planted = planted_embeddings
    sf = _write_embeddings(tmp_path, vecs)
    got = {
        (r.va, r.vb): r.cos
        for r in entry.q_dedup_embedding(spark, sf).collect()
    }
    # design-threshold recall: every planted near-dup (cos >= 0.95)
    # must be found — 16 bands x 8 bits => P(miss) = (1-0.287)^16 ~ 4e-3
    found_planted = planted & set(got)
    assert found_planted == planted, (
        f"missed {planted - set(got)} of {len(planted)} planted near-dups"
    )
    # overall recall vs brute force at the exploratory 0.42 threshold
    E = vecs.astype(np.float64)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    C = E @ E.T
    iu = np.triu_indices(len(E), 1)
    true_pairs = {
        (int(a), int(b))
        for a, b in zip(iu[0][C[iu] >= entry._COS_T],
                        iu[1][C[iu] >= entry._COS_T])
    }
    recall = len(true_pairs & set(got)) / max(len(true_pairs), 1)
    assert recall >= 0.8, f"recall {recall:.3f} over {len(true_pairs)} pairs"
    # precision of the verify stage: nothing below threshold is emitted
    assert all(c >= entry._COS_T for c in got.values())

    # pruning: candidate pairs (pre-verification) stay well below n^2/2
    _, sig = entry._lsh_parts(spark, sf)
    n_cand = (
        sig.alias("a")
        .join(sig.alias("c"),
              (F.col("a.b") == F.col("c.b"))
              & (F.col("a.sig") == F.col("c.sig"))
              & (F.col("a.vec_id") < F.col("c.vec_id")))
        .select("a.vec_id", "c.vec_id").distinct().count()
    )
    n_all = len(vecs) * (len(vecs) - 1) // 2
    assert n_cand < 0.25 * n_all, f"{n_cand} candidates of {n_all} pairs"


def test_lsh_topk_finds_true_neighbors(spark, tmp_path, planted_embeddings):
    vecs, planted = planted_embeddings
    sf = _write_embeddings(tmp_path, vecs)
    lsh_top = [r.vec_id for r in entry.q_ann_lsh_bucket(spark, sf).collect()]
    # the three planted neighbors of vec 0 are its true top-3; the
    # LSH candidate set must surface all of them
    true_neighbors = {b for (a, b) in planted if a == 0}
    assert true_neighbors <= set(lsh_top[:3]), (lsh_top, true_neighbors)
    # and they rank by exact cosine, same as brute force over candidates
    E = vecs.astype(np.float64)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    cos0 = E @ E[0]
    brute_top3 = set(np.argsort(-cos0[1:])[:3] + 1)
    assert set(lsh_top[:3]) == {int(x) for x in brute_top3}


def _write_clustered_embeddings(tmp_path, n_clusters=10, per=40, seed=23):
    """Genuinely clustered embeddings: cluster = centroid + small noise,
    label column = cluster id (the IVF cell key). vec 0 is in cluster 0."""
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs, labels = [], []
    for c in range(n_clusters):
        for _ in range(per):
            v = cents[c] + rng.normal(scale=0.25, size=64)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            labels.append(c)
    # interleave so vec_id 0 is cluster 0 but ids aren't cluster-sorted
    order = rng.permutation(len(vecs))
    zero = next(i for i in order if labels[i] == 0)
    order = [zero] + [i for i in order if i != zero]
    df = pd.DataFrame(
        {
            "vec_id": range(len(order)),
            "embedding": [vecs[i] for i in order],
            "label": np.array([labels[i] for i in order], dtype=np.int32),
        }
    )
    df.to_parquet(tmp_path / "embeddings.parquet", index=False)
    return str(tmp_path), df


def test_ivf_recall_on_clustered(spark, tmp_path):
    """IVF (per-label centroids + nprobe probing) reaches high recall on
    clustered data even at nprobe << k — the property that makes it the
    scale path. The driver testdata is near-random, where recall@10 is
    pinned at 0.7 by the oracle-checked query instead."""
    sf, df = _write_clustered_embeddings(tmp_path)
    ivf = [r.vec_id for r in entry.q_ann_ivf_topk(spark, sf).collect()]
    # brute-force truth in numpy
    E = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    cos0 = E @ E[0]
    brute = list(np.argsort(-cos0[1:])[:10] + 1)
    recall = len(set(ivf) & {int(b) for b in brute}) / 10
    assert recall >= 0.9, (recall, ivf, brute)
    # and the scan fraction is honest: nprobe cells of k
    assert entry._IVF_NPROBE < 10


def test_kmeans_recovers_clusters(spark, tmp_path):
    """Lloyd's k-means (DataFrame-only, deterministic init) recovers the
    planted cluster structure: assignments align with the true labels
    (purity >= 0.9) and the objective decreased from the seed state."""
    from pii_spark.spark.kmeans import kmeans_fit

    sf, df = _write_clustered_embeddings(tmp_path, n_clusters=6, per=30,
                                         seed=31)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    assign, cents = kmeans_fit(emb, k=6, iters=5)
    rows = assign.collect()
    true = dict(zip(df["vec_id"], df["label"]))
    # purity: for each fitted cluster, the dominant true label share
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(int(true[r.vec_id]))
    n_dominant = sum(max(labs.count(x) for x in set(labs))
                     for labs in by_cluster.values())
    purity = n_dominant / len(rows)
    assert purity >= 0.9, purity
    # determinism: a second fit yields identical assignments
    assign2, _ = kmeans_fit(emb, k=6, iters=5)
    a1 = sorted((r.vec_id, r.cluster) for r in rows)
    a2 = sorted((r.vec_id, r.cluster) for r in assign2.collect())
    assert a1 == a2


def test_dedup_clusters_on_sparse(spark, tmp_path, sparse_docs):
    """Connected components over near-dup pairs: on the sparse corpus
    each planted (src, dup) pair is its own 2-member component with the
    src doc as canonical; singletons don't appear (no edges)."""
    texts, truth_pairs = sparse_docs
    sf = _write_documents(tmp_path, texts)
    comps = {r.canonical: r.n_members
             for r in entry.q_dedup_clusters(spark, sf).collect()}
    # every planted pair forms exactly the component {src: 2}
    for src, dup in truth_pairs:
        assert comps.get(src) == 2, (src, comps.get(src))
    assert len(comps) == len(truth_pairs)
