"""Sequence packing offsets (SURVEY R87): two-phase distributed
prefix sum == the naive global window, layout independence, boundary
semantics, and the no-global-sort plan gate."""

import pytest
from pyspark.sql import Row, Window, functions as F

from pii_spark.spark.packing import pack_offsets, packing_summary


def _docs(spark, sf="/root/testdata/sf0.01"):
    return spark.read.parquet(f"{sf}/documents.parquet")


def test_pack_offsets_matches_global_window(spark):
    """The bucketed prefix sum must equal the single-window global
    cumsum EXACTLY — offsets, seq ids, every doc."""
    d = _docs(spark)
    got = {
        r.doc_id: (r.start_offset, r.n_tokens, r.seq_first, r.seq_last)
        for r in pack_offsets(d, 512, n_buckets=16).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nt = F.size(
        F.filter(
            F.split(F.coalesce(F.col("text"), F.lit("")),
                    r"[ \t\n\x0b\f\r]+"),
            lambda x: x != "",
        )
    ).cast("long")
    ref = {
        r.doc_id: (r.st, r.nt, r.st // 512,
                   (r.st + max(r.nt, 1) - 1) // 512)
        for r in d.withColumn("nt", nt)
        .withColumn("st", (F.sum("nt").over(w) - F.col("nt")).cast("long"))
        .collect()
    }
    assert got == ref and len(got) == d.count()
    # layout independence
    again = {
        r.doc_id: (r.start_offset, r.n_tokens, r.seq_first, r.seq_last)
        for r in pack_offsets(d.repartition(13), 512, n_buckets=16)
        .collect()
    }
    assert got == again


def test_pack_offsets_boundary_semantics(spark):
    """Handcrafted corpus: contiguous concatenation (each start =
    previous end), boundary-crossing docs flagged, zero-token docs
    occupy no space, and the summary census is exact."""
    rows = [
        Row(doc_id=1, text="a " * 300),   # 300 tokens: seqs 0
        Row(doc_id=2, text="b " * 300),   # 300..599: crosses 512
        Row(doc_id=3, text=""),           # zero tokens at 600
        Row(doc_id=4, text="c " * 12),    # 600..611: seq 1
    ]
    out = {r.doc_id: r for r in
           pack_offsets(spark.createDataFrame(rows), 512).collect()}
    assert out[1].start_offset == 0 and out[1].seq_first == 0 \
        and out[1].seq_last == 0
    assert out[2].start_offset == 300
    assert out[2].seq_first == 0 and out[2].seq_last == 1  # split doc
    assert out[3].start_offset == 600 and out[3].n_tokens == 0
    assert out[3].seq_first == out[3].seq_last == 1
    assert out[4].start_offset == 600 and out[4].seq_last == 1

    s = packing_summary(
        pack_offsets(spark.createDataFrame(rows), 512), 512
    ).collect()[0]
    assert s.total_tokens == 612
    assert s.full_sequences == 1
    assert s.boundary_split_docs == 1


def test_pack_offsets_refusals_and_empty(spark):
    d = spark.createDataFrame(
        [Row(doc_id=None, text="x"), Row(doc_id=1, text="y")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="NULL doc_id"):
        pack_offsets(d, 512)
    with pytest.raises(ValueError, match="seq_len"):
        pack_offsets(d.filter("doc_id is not null"), 0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_offsets(empty, 512).count() == 0
    # duplicate ids: ties in the intra-bucket orderBy(id) would make
    # start_offset tie-order-dependent — refused loudly (review r7)
    dup = spark.createDataFrame(
        [Row(doc_id=1, text="x"), Row(doc_id=1, text="y"),
         Row(doc_id=2, text="z")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="duplicate doc_id"):
        pack_offsets(dup, 512)


def test_pack_offsets_outlier_id_keeps_buckets_balanced(spark):
    """VERDICT r7 #1 (the ccnet planted-outlier pattern, verbatim):
    sequential bulk ids plus ONE corrupt/mixed-scheme xxhash64-range
    id. The r7 equal-width geometry put every bulk row into bucket 0
    (width ≈ outlier/n_buckets) — a single-task sort of the whole
    corpus. Rank-geometry cuts must keep every bucket ≤ ~1.5/n_buckets
    of the rows, and the offsets must stay exact."""
    from pii_spark.spark.packing import _id_bucket_cuts

    n, nb = 4000, 16
    rows = [(i, (i % 7) + 1) for i in range(n)] + [(1 << 62, 3)]
    d = spark.createDataFrame(rows, "doc_id long, nt long")
    cuts = _id_bucket_cuts(d, "doc_id", nb)
    pop: dict[int, int] = {}
    for i, _ in rows:
        b = sum(1 for c in cuts if c <= float(i))
        pop[b] = pop.get(b, 0) + 1
    # err = 1/(4*nb) → any bucket ≤ (1/nb + 2*err) * N = 1.5N/nb
    assert max(pop.values()) <= int(1.5 * (n + 1) / nb) + 1, pop
    assert len(pop) >= nb // 2  # mass actually spreads across buckets

    got = {r.doc_id: r.start_offset
           for r in pack_offsets(d, 512, n_tokens_col="nt",
                                 n_buckets=nb).collect()}
    off, ref = 0, {}
    for i, t in sorted(rows):
        ref[i] = off
        off += t
    assert got == ref


def test_pack_offsets_never_sorts_globally(spark):
    """The scale gate (the sampling-module standard): every executed
    window spec must carry the bucket column — the naive formulation's
    empty-partition global window would sort the corpus in ONE task."""
    import re

    out = pack_offsets(_docs(spark), 512, n_buckets=16)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected the intra-bucket window"
    for spec in specs:
        assert "_bkt" in spec, spec
    # and a real tokenizer column routes through n_tokens_col
    d = _docs(spark).withColumn("my_nt", F.lit(7).cast("long"))
    seven = pack_offsets(d, 512, n_tokens_col="my_nt").collect()
    assert all(r.n_tokens == 7 for r in seven)
    assert sorted(r.start_offset for r in seven) == \
        [7 * i for i in range(len(seven))]


def test_pack_sequences_lossless_and_fixed_length(spark):
    """The shard-writer output: every sequence except the last is
    exactly seq_len tokens, and concatenating all sequences in seq_id
    order reconstructs the concatenation of all docs' tokens in id
    order — packing never loses or reorders a token."""
    import re

    from pii_spark.spark.packing import pack_sequences

    d = _docs(spark, "/root/testdata/sf0.001").limit(120)
    L = 128
    seqs = {r.seq_id: r.tokens
            for r in pack_sequences(d, L, n_buckets=8).collect()}
    ids = sorted(seqs)
    assert ids == list(range(len(ids)))  # dense seq ids from 0
    for s in ids[:-1]:
        assert len(seqs[s]) == L, (s, len(seqs[s]))
    assert 0 < len(seqs[ids[-1]]) <= L
    flat = [t for s in ids for t in seqs[s]]
    ref = []
    for r in d.orderBy("doc_id").collect():
        ref.extend(w for w in re.split(r"[ \t\n\x0b\f\r]+",
                                       r.text or "") if w)
    assert flat == ref
    # layout independence
    seqs2 = {r.seq_id: r.tokens
             for r in pack_sequences(d.repartition(7), L,
                                     n_buckets=8).collect()}
    assert seqs == seqs2


def test_pack_offsets_property_fuzz(spark):
    """Hypothesis sweep over adversarial token-count shapes (zeros,
    huge docs, sparse/dense ids): bucketed offsets == the driver-side
    running sum, always."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        counts=st.lists(
            st.tuples(st.integers(0, 10**6),      # sparse doc ids
                      st.integers(0, 5000)),      # token counts
            min_size=1, max_size=60,
            unique_by=lambda t: t[0],
        ),
        L=st.sampled_from([1, 7, 512]),
    )
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def check(counts, L):
        d = spark.createDataFrame(
            [(i, n) for i, n in counts], "doc_id long, nt long"
        )
        got = {r.doc_id: (r.start_offset, r.seq_first, r.seq_last)
               for r in pack_offsets(d, L, n_tokens_col="nt",
                                     n_buckets=4).collect()}
        off = 0
        for i, n in sorted(counts):
            assert got[i] == (off, off // L, (off + max(n, 1) - 1) // L), \
                (i, n, L)
            off += n

    check()


def test_pack_offsets_survives_hash_range_ids(spark):
    """Review r7: xxhash64-style ids span most of int64; the bucket
    arithmetic must not overflow (ANSI job death / silent wrap).
    Offsets must equal the driver-side running sum in id order."""
    ids = [-(1 << 62) * 3 // 2, -(1 << 61), -12345, 0, 99,
           (1 << 61), (1 << 62) * 3 // 2]
    d = spark.createDataFrame(
        [(i, 10 + k) for k, i in enumerate(ids)],
        "doc_id long, nt long",
    )
    got = {r.doc_id: r.start_offset
           for r in pack_offsets(d, 512, n_tokens_col="nt",
                                 n_buckets=16).collect()}
    off, ref = 0, {}
    for k, i in enumerate(sorted(ids)):
        ref[i] = off
        off += 10 + ids.index(i)
    assert got == ref


def test_packing_composes_with_bpe_tokenizer(spark):
    """Composition: a trained BPE tokenizer's counts drive the packing
    assignment through n_tokens_col — the real pipeline shape
    (tokenizer-aware budgets, not whitespace counts)."""
    from pii_spark.quality.bpe import bpe_tokenize, train_bpe, word_census

    d = _docs(spark, "/root/testdata/sf0.001").limit(80)
    merges = train_bpe(word_census(d), 10)
    tok = bpe_tokenize(d, merges).withColumn(
        "bpe_n", F.size("bpe_tokens").cast("long")
    )
    out = pack_offsets(tok, 256, n_tokens_col="bpe_n", n_buckets=8)
    rows = {r.doc_id: r for r in out.collect()}
    # offsets are the running sum of BPE counts in id order
    off = 0
    for r in tok.select("doc_id", "bpe_n").orderBy("doc_id").collect():
        assert rows[r.doc_id].start_offset == off
        assert rows[r.doc_id].n_tokens == r.bpe_n
        off += r.bpe_n
    total = off
    assert max(x.seq_last for x in rows.values()) == (total - 1) // 256
