"""SemDeDup (pii_spark/spark/semdedup.py): planted-geometry keep/drop
semantics, the one-pass greedy rule, and partitioning independence.

The q_kmeans_clusters oracle replays the same arithmetic in DuckDB at
sf0.01; these tests pin the module on a corpus whose geometry is
hand-built so every decision is provable by trigonometry.
"""

import math

import pytest
from pyspark.sql import functions as F

from pii_spark.spark.semdedup import semdedup, semdedup_decisions

TAU = 0.95
# two orthogonal cluster directions; within cluster A three vectors at
# 0/15/30 degrees: cos(15°)=.966 >= tau, cos(30°)=.866 < tau — so the
# 15° neighbour chain drops b (dup of a) and c (dup of b) while a-c
# alone would NOT drop; cluster B holds a 40°-apart pair (no drop).
def _vecs():
    def deg(d):
        return (math.cos(math.radians(d)), math.sin(math.radians(d)))

    a, b, c = deg(0), deg(15), deg(30)
    d, e = deg(0), deg(40)
    return [
        (0, [a[0], a[1], 0.0, 0.0]),
        (1, [b[0], b[1], 0.0, 0.0]),
        (2, [c[0], c[1], 0.0, 0.0]),
        (10, [0.0, 0.0, d[0], d[1]]),
        (11, [0.0, 0.0, e[0], e[1]]),
    ]


def _df(spark, partitions=3):
    return spark.createDataFrame(
        _vecs(), "vec_id long, embedding array<float>"
    ).repartition(partitions)


def test_semdedup_planted_geometry(spark):
    dec, cents = semdedup(_df(spark), k=2, iters=3, tau=TAU)
    rows = {r.vec_id: r for r in dec.collect()}
    dec.unpersist()
    cents.unpersist()

    assert len(rows) == 5
    # cluster A chain: b dups a; c dups b (one-pass greedy — c is
    # dropped by the already-dropped b, cos(a,c) < tau)
    assert rows[0].keep and rows[0].dup_of is None
    assert not rows[1].keep and rows[1].dup_of == 0
    assert not rows[2].keep and rows[2].dup_of == 1
    # cluster B pair is 40° apart — below tau, both kept
    assert rows[10].keep and rows[11].keep
    # the two tiers landed in different clusters
    assert rows[0].cluster == rows[1].cluster == rows[2].cluster
    assert rows[10].cluster == rows[11].cluster
    assert rows[0].cluster != rows[10].cluster


def test_semdedup_partitioning_independent(spark):
    outs = []
    for p in (1, 7):
        dec, cents = semdedup(_df(spark, p), k=2, iters=3, tau=TAU)
        outs.append(sorted(
            (r.vec_id, r.cluster, r.keep, r.dup_of) for r in dec.collect()
        ))
        dec.unpersist()
        cents.unpersist()
    assert outs[0] == outs[1]


def test_semdedup_exact_copies_always_drop(spark):
    """Exact copies have cos == 1 regardless of tau < 1 — the planted
    pattern the driver query uses (recrawl-embedding semantics)."""
    base = _df(spark)
    dups = base.filter(F.col("vec_id").isin(0, 10)).select(
        (F.col("vec_id") + 100).alias("vec_id"), "embedding"
    )
    dec, cents = semdedup(
        base.unionByName(dups), k=2, iters=3, tau=0.999
    )
    rows = {r.vec_id: r for r in dec.collect()}
    dec.unpersist()
    cents.unpersist()
    assert not rows[100].keep and rows[100].dup_of == 0
    assert not rows[110].keep and rows[110].dup_of == 10
    # at tau=0.999 the 15° neighbours survive
    assert rows[1].keep and rows[2].keep


def test_semdedup_zero_vectors_never_dup(spark):
    """A zero-norm embedding (an empty doc after upstream rewrites)
    has no direction: its cosine is undefined, so zero vectors must be
    KEPT, never dropped as dups of each other or of anything — and the
    pairs must not raise DIVIDE_BY_ZERO under ANSI mode (measured on
    the 4-stage run_dedup chain before the guard)."""
    vecs = _vecs() + [
        (20, [0.0, 0.0, 0.0, 0.0]),
        (21, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).repartition(3)
    dec, cents = semdedup(df, k=2, iters=3, tau=TAU)
    rows = {r.vec_id: r for r in dec.collect()}
    dec.unpersist()
    cents.unpersist()
    assert rows[20].keep and rows[20].dup_of is None
    assert rows[21].keep and rows[21].dup_of is None
    # the geometry decisions are unchanged by the zero rows
    assert rows[0].keep and not rows[1].keep and not rows[2].keep


def test_semdedup_decisions_requires_assignment_columns(spark):
    d = _df(spark)
    with pytest.raises(Exception):
        semdedup_decisions(d, d.select("vec_id"), tau=TAU).collect()


def test_kmeans_assign_matches_fit_assignment(spark):
    """kmeans_assign(df, cents) on the fit's own input reproduces the
    fit's returned assignment exactly — it IS the factored final pass,
    so the fit-on-a-sample composition changes nothing when the
    'sample' is everything."""
    from pii_spark.spark.kmeans import kmeans_assign, kmeans_fit

    d = _df(spark)
    assign, cents = kmeans_fit(d, k=2, iters=3)
    got = sorted(
        (r.vec_id, r.cluster, round(r.sqdist, 9))
        for r in kmeans_assign(d, cents).collect()
    )
    want = sorted(
        (r.vec_id, r.cluster, round(r.sqdist, 9))
        for r in assign.collect()
    )
    assign.unpersist()
    cents.unpersist()
    assert got == want


def test_semdedup_hash_init_and_sampled_fit(spark):
    """The at-scale composition — one-pass hash seeding + centroids
    fit on a SUBSET, full frame broadcast-assigned — must reach the
    same keep/drop decisions on the planted geometry: tau gating is
    pairwise cosine WITHIN a block, so any reasonable blocking of two
    orthogonal cones yields identical dups. Partitioning-independent
    like every other path."""
    outs = []
    for p in (1, 7):
        d = _df(spark, p)
        fit = d.filter(F.col("vec_id").isin(0, 10))  # one per cone
        dec, cents = semdedup(
            d, k=2, iters=3, tau=TAU, fit_df=fit, init="hash"
        )
        rows = {r.vec_id: r for r in dec.collect()}
        outs.append(sorted(
            (r.vec_id, r.keep, r.dup_of) for r in rows.values()
        ))
        dec.unpersist()
        cents.unpersist()
        assert rows[0].keep and rows[0].dup_of is None
        assert not rows[1].keep and rows[1].dup_of == 0
        assert not rows[2].keep and rows[2].dup_of == 1
        assert rows[10].keep and rows[11].keep
    assert outs[0] == outs[1]


def test_kmeans_fit_dispatch_boundary(spark):
    """The pure driver-side fit (input ≤ driver_bound, the BPE
    pattern) and the distributed loop must produce IDENTICAL
    assignments and centroid relations on the same input, under both
    seedings — so the dispatch is invisible except in job count."""
    from pii_spark.spark.kmeans import kmeans_fit

    for init in ("farthest", "hash"):
        outs = []
        for bound in (0, 100_000):  # 0 forces distributed
            a, c = kmeans_fit(_fuzz_df(spark), k=5, iters=3,
                              init=init, driver_bound=bound)
            outs.append((
                sorted((r.vec_id, r.cluster, round(r.sqdist, 9))
                       for r in a.collect()),
                sorted((r.cluster, r.i, round(r.cv, 9))
                       for r in c.collect()),
            ))
            a.unpersist()
            c.unpersist()
        assert outs[0][0] == outs[1][0], init
        assert outs[0][1] == outs[1][1], init


def test_kmeans_hash_init_unknown_refused(spark):
    from pii_spark.spark.kmeans import kmeans_fit

    with pytest.raises(ValueError, match="init"):
        kmeans_fit(_df(spark), k=2, iters=1, init="random")


def _fuzz_df(spark, n=120, dim=16, partitions=5):
    """Seeded fuzz corpus with engineered near-dups: base vectors plus
    jittered copies whose cosines straddle tau from BOTH sides."""
    rng = __import__("numpy").random.default_rng(7)
    np = __import__("numpy")
    rows = []
    for i in range(n):
        v = rng.normal(size=dim)
        rows.append((i, (v / np.linalg.norm(v)).astype("float32")
                     .tolist()))
        if i % 3 == 0:
            eps = 0.05 if i % 6 == 0 else 0.6
            w = v + eps * rng.normal(size=dim)
            rows.append((i + 10_000,
                         (w / np.linalg.norm(w)).astype("float32")
                         .tolist()))
    rows.append((20_000, [0.0] * dim))  # zero vector in the mix
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(partitions)


def test_semdedup_blas_pairs_match_join_pairs(spark):
    """The gram-matrix engine and the exploded SQL self-join must make
    IDENTICAL decisions — planted geometry, seeded fuzz (near-dups on
    both sides of tau), and a zero vector, across two k values."""
    from pii_spark.spark.semdedup import semdedup_decisions_fast
    from pii_spark.spark.kmeans import kmeans_fit

    for d, k in ((_df(spark), 2), (_fuzz_df(spark), 6)):
        assign, cents = kmeans_fit(d, k=k, iters=3, init="hash")
        sql_rows = sorted(
            (r.vec_id, r.cluster, r.keep, r.dup_of)
            for r in semdedup_decisions(d, assign, TAU).collect()
        )
        fast_rows = sorted(
            (r.vec_id, r.cluster, r.keep, r.dup_of)
            for r in semdedup_decisions_fast(d, assign, TAU).collect()
        )
        assign.unpersist()
        cents.unpersist()
        assert sql_rows == fast_rows
        assert any(not keep for _, _, keep, _ in fast_rows)
        assert any(keep for _, _, keep, _ in fast_rows)


def test_kmeans_assign_blas_matches_join_assign(spark):
    """The matmul-argmin assign and the exploded broadcast-join assign
    must produce IDENTICAL (vec_id, cluster) relations — planted
    geometry and seeded fuzz (incl. the zero vector), across two k
    values and partitionings. Same ranking expression, ties → lowest
    cluster id on both paths."""
    from pii_spark.spark.kmeans import (
        kmeans_assign,
        kmeans_assign_blas,
        kmeans_fit,
    )

    for d, k in ((_df(spark, 4), 2), (_fuzz_df(spark), 6)):
        fit, cents = kmeans_fit(d, k=k, iters=3, init="hash")
        fit.unpersist()
        join_rows = sorted(
            (r.vec_id, r.cluster)
            for r in kmeans_assign(d, cents,
                                   with_sqdist=False).collect()
        )
        blas_rows = sorted(
            (r.vec_id, r.cluster)
            for r in kmeans_assign_blas(d, cents).collect()
        )
        cents.unpersist()
        assert join_rows == blas_rows
        assert len(blas_rows) == d.count()


def test_semdedup_blas_block_bound_refused(spark):
    from pii_spark.spark.semdedup import semdedup_decisions_fast
    from pii_spark.spark.kmeans import kmeans_fit

    d = _df(spark)
    assign, cents = kmeans_fit(d, k=1, iters=1)
    with pytest.raises(Exception, match="max_block"):
        semdedup_decisions_fast(d, assign, TAU, max_block=3).collect()
    assign.unpersist()
    cents.unpersist()


def test_pairwise_d2_chunked_bit_equal():
    """r9 (ADVICE r8 high): the chunked pairwise-d2 must be BIT-equal
    to the unchunked broadcast expression — chunking only bounds the
    (chunk, k, dim) temporary, it performs the identical per-element
    float ops."""
    import numpy as np

    from pii_spark.spark.kmeans import _pairwise_d2

    rng = np.random.default_rng(7)
    v = rng.normal(size=(137, 9))
    cm = rng.normal(size=(11, 9))
    ref = ((v[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
    # budget forces many small chunks (9*11 cells -> step 2)
    got = _pairwise_d2(v, cm, budget_cells=200)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)  # bit-equal, not just close
    # and the single-chunk fast path too
    assert np.array_equal(_pairwise_d2(v, cm), ref)


def test_semdedup_block_budget_defaults():
    """r9 (VERDICT r8 #1): the default blas block cap derives from a
    per-task memory budget — peak bytes (gram + in-place denom + dup
    mask = 17 B/cell) at the cap stay inside the budget, and the old
    65536 default (a ~34 GB gram alone) is gone."""
    from pii_spark.spark.semdedup import (
        _BLOCK_BYTES_BUDGET,
        _default_max_block,
    )

    cap = _default_max_block()
    assert cap * cap * 17 <= _BLOCK_BYTES_BUDGET
    assert 4_000 <= cap < 65_536  # memory-derived, not the old constant


def test_auto_k_raises_clamp_for_block_budget():
    """r9 (VERDICT r8 #1): when the max-clusters clamp would leave
    average blas blocks past a quarter of the block cap, auto_k raises
    k instead of letting blocks grow; the join engine and explicit
    small corpora keep the plain clamp."""
    from pii_spark.spark.semdedup import _default_max_block, auto_k

    cap = _default_max_block()
    # 10M docs, old defaults: clamped k=256 meant ~39k-row blocks
    k = auto_k(10_000_000, cluster_size=512, max_clusters=256,
               pairs="blas")
    assert k > 256
    assert -(-10_000_000 // k) <= cap // 4  # avg block inside budget
    # join engine has no per-task gram matrix: clamp stands
    assert auto_k(10_000_000, 512, 256, pairs="join") == 256
    # small corpus: ordinary ceil-div, never above rows
    assert auto_k(100, 512, 256, pairs="blas") == 1
    assert auto_k(0, 512, 256, pairs="blas") == 1


def test_semdedup_fast_default_cap_refuses_oversize_block(spark):
    """The budget-derived default cap still refuses loudly (never a
    silent cap): a single cluster block larger than an explicit tiny
    max_block raises with the fix in the message, and the DEFAULT cap
    is wired through semdedup()'s blas engine."""
    import pytest as _pytest

    from pii_spark.spark.semdedup import semdedup_decisions_fast

    df = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    assign = df.selectExpr("vec_id", "0 as cluster")
    with _pytest.raises(Exception, match="memory budget"):
        semdedup_decisions_fast(df, assign, tau=0.9, max_block=4).collect()
