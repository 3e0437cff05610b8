"""Semantics pin for the 64-bit xxhash64 SimHash Hamming-pair scale
variant (VERDICT r3 #2). DuckDB has no xxhash64, so no SQL oracle is
possible; instead:

  * losslessness proof: the banded plan's pair set must EQUAL the
    brute-force all-pairs Hamming<=3 set computed in plain Python over
    the collected 64-bit signatures (the same oracle pattern the md5
    variant takes in SQL — banding is a prefilter, never a filter);
  * planted-duplicate pin vs the oracle-checked md5 16-bit variant:
    both variants must report every planted exact-duplicate pair at
    Hamming 0;
  * scale-shape check: the 64-bit bands must actually spread keys
    beyond the md5 variant's 16-values-per-band ceiling (the hot-key
    fix the variant exists for).
"""

import pandas as pd
from pyspark.sql import functions as F

from __spark_entry__ import (
    _simhash_sigs_fast,
    q_simhash_hamming_pairs,
    q_simhash_hamming_pairs_fast,
)

_MASK = (1 << 64) - 1


def _planted_corpus(spark, tmp_path, n=25):
    from pii_spark.spark.gen_job import generate_corpus

    base = (
        generate_corpus(spark, n)
        .select(F.monotonically_increasing_id().alias("doc_id"), "text")
        .toPandas()
    )
    dup = base.copy()
    dup["doc_id"] += 1000
    edit = base.copy()
    edit["doc_id"] += 2000
    edit["text"] = "Z" + edit["text"].str.slice(1)
    pd.concat([base, dup, edit]).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    return sorted(base["doc_id"])


def test_fast_simhash_banding_is_lossless(spark, tmp_path):
    base_ids = _planted_corpus(spark, tmp_path)
    sf = str(tmp_path)
    sigs = {r.doc_id: r.sig for r in _simhash_sigs_fast(spark, sf).collect()}
    expected = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin((sigs[a] ^ sigs[b]) & _MASK).count("1")
            if ham <= 3:
                expected.add((a, b, ham))
    got = {
        (r.da, r.db, r.hamming)
        for r in q_simhash_hamming_pairs_fast(spark, sf).collect()
    }
    assert got == expected
    # the planted exact duplicates are all found, at Hamming 0
    for d in base_ids:
        assert (d, d + 1000, 0) in got, d


def test_fast_and_md5_variants_agree_on_planted_dups(spark, tmp_path):
    base_ids = _planted_corpus(spark, tmp_path)
    sf = str(tmp_path)
    for q in (q_simhash_hamming_pairs, q_simhash_hamming_pairs_fast):
        pairs = {(r.da, r.db): r.hamming for r in q(spark, sf).collect()}
        for d in base_ids:
            assert pairs.get((d, d + 1000)) == 0, (q.__name__, d)


def test_fast_bands_spread_beyond_md5_key_space(spark, tmp_path):
    _planted_corpus(spark, tmp_path)
    sf = str(tmp_path)
    sigs = [r.sig for r in _simhash_sigs_fast(spark, sf).collect()]
    # 25 distinct texts -> 25 signatures; each 16-bit band must place
    # them in more than 16 distinct buckets (the md5 4-bit variant's
    # whole key space) for the hot-key argument to hold
    for b in range(4):
        keys = {(s >> (16 * b)) & 0xFFFF for s in sigs}
        assert len(keys) > 16, (b, len(keys))
