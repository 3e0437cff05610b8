"""Incremental crawl-snapshot dedup (SURVEY R78,
pii_spark/spark/incr_dedup.py): new-snapshot-vs-base-corpus
annotation — exact fingerprint tier, MinHash band near tier, the
precomputed-base-keys path, and the hashed/string path relationship
(exact tier identical; near tier same-semantics, hash-dependent)."""

import pytest
from pyspark.sql import Row, functions as F

from pii_spark.spark.incr_dedup import base_keys, incremental_dedup

# long, shingle-rich texts so band minima are stable under small edits
_A = ("the quick brown fox jumps over the lazy dog while seventeen "
      "green bottles stand quietly on the old stone wall near the "
      "river bend waiting for the morning ferry to arrive ") * 3
_B = ("pack my box with five dozen liquor jugs before the autumn "
      "festival opens its gates to travelling merchants from the "
      "northern valleys carrying woven baskets of dried fruit ") * 3
_C = "completely unrelated tiny page"


def _base(spark):
    return spark.createDataFrame(
        [Row(doc_id=1, text=_A), Row(doc_id=2, text=_B),
         Row(doc_id=3, text=_C)]
    )


def _snap(spark):
    return spark.createDataFrame(
        [
            # byte-identical recrawl of base doc 1
            Row(doc_id=101, text=_A),
            # whitespace/case variant of base doc 3 — the fingerprint
            # normalizes [ \t\n\x0b\f\r]+ and case, so still EXACT
            Row(doc_id=102, text="  Completely\tUNRELATED\r\ntiny  page "),
            # near-recrawl: base doc 2 plus a short appended footer —
            # shares all of B's shingles, so every band minimum is
            # min(B's, footer's) and at least one band collides
            Row(doc_id=103, text=_B + " updated 2026"),
            # novel doc: zero shared shingles with any base doc
            Row(doc_id=104, text="axolotl quartz nebula " * 40),
            # NULL text: normalizes to '' — novel unless base has an
            # empty doc (it doesn't here)
            Row(doc_id=105, text=None),
        ]
    )


def _stages(df):
    return {r.doc_id: r.drop_stage for r in df.collect()}


@pytest.mark.parametrize("hashed", [False, True])
def test_stage_annotation(spark, hashed):
    out = incremental_dedup(_base(spark), _snap(spark), hashed=hashed)
    st = _stages(out)
    assert st[101] == "exact"
    assert st[102] == "exact", "normalized-whitespace recrawl must be exact"
    assert st[103] == "near", "appended-footer recrawl must band-collide"
    assert st[104] is None
    assert st[105] is None
    # full snapshot comes back, annotated — nothing dropped or doubled
    assert sorted(st) == [101, 102, 103, 104, 105]


def test_exact_tier_identical_across_hash_paths(spark):
    """The fingerprint tier is an identity on normalized text, so the
    md5 (oracle) and xxhash64 (production) paths must flag the SAME
    docs as exact. (Near flags are hash-dependent by LSH construction
    — asserted per-path above, not cross-path.)"""
    b, s = _base(spark), _snap(spark)
    ex_str = {k for k, v in _stages(
        incremental_dedup(b, s, hashed=False)).items() if v == "exact"}
    ex_hash = {k for k, v in _stages(
        incremental_dedup(b, s, hashed=True)).items() if v == "exact"}
    assert ex_str == ex_hash == {101, 102}


def test_precomputed_base_keys_path(spark):
    """The monthly-job shape: base keys computed ONCE (per corpus
    version), passed in — must agree byte-for-byte with the inline
    derivation, and the base frame must not be required at all."""
    b, s = _base(spark), _snap(spark)
    fp, sig = base_keys(b, hashed=True)
    via_keys = _stages(
        incremental_dedup(None, s, hashed=True, base_fp=fp, base_sig=sig)
    )
    inline = _stages(incremental_dedup(b, s, hashed=True))
    assert via_keys == inline
    with pytest.raises(ValueError, match="need base"):
        incremental_dedup(None, s, hashed=True)


def test_empty_base_keeps_everything(spark):
    """First snapshot ever: empty base → every doc is novel."""
    empty = _base(spark).filter(F.lit(False))
    st = _stages(incremental_dedup(empty, _snap(spark), hashed=True))
    assert all(v is None for v in st.values())


def test_production_plan_shape(spark):
    """Scale gates on the hashed (production) plan: no cartesian, the
    base key relations are partial-aggregated distincts (map-side
    combine kills viral-shingle hot keys), and no md5/hex anywhere —
    the joins carry 8-byte xxhash64 keys end to end."""
    out = incremental_dedup(_base(spark), _snap(spark), hashed=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "md5" not in plan, "production path must stay 8-byte keys"
    assert "xxhash64" in plan
    # every Exchange under the key-census aggregates is preceded by a
    # partial HashAggregate in the formatted plan; cheap proxy: the
    # plan contains paired HashAggregate levels (partial+final)
    assert plan.count("HashAggregate") >= 4, plan


def test_driver_query_matches_module(spark, sf_dir="/root/testdata/sf0.001"):
    """The registered driver query is the module with hashed=False over
    the deterministic base/snapshot split — recompute the census arm
    independently here as a cross-check of the query's own arithmetic:
    dropped rows + kept census must account for every snapshot doc."""
    import __spark_entry__ as entry

    out = entry.queries()["incremental_dedup"](spark, sf_dir)
    rows = out.collect()
    n_dropped = sum(1 for r in rows if r.probe == "dropped")
    census_total = sum(r.n for r in rows if r.probe == "census")
    census_dropped = sum(
        r.n for r in rows if r.probe == "census" and r.stage != "kept"
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_snap = (
        d.filter(F.col("doc_id") % 4 == 0).count()
        + d.filter(F.col("doc_id") % 10 == 1).count()
        + d.filter(F.col("doc_id") % 10 == 3).count()
    )
    assert census_total == n_snap
    assert census_dropped == n_dropped
    # the planted byte-identical recrawls guarantee a nonempty exact
    # tier; the planted footer variants guarantee near candidates
    assert any(r.stage == "exact" for r in rows if r.probe == "dropped")


def test_hash_path_mismatches_refuse_loudly(spark, tmp_path):
    """Review r7: md5-path (string) key relations silently match
    nothing against xxhash64 consumers — every consumer must refuse,
    not no-op."""
    import json

    import pytest
    from pyspark.sql import Row

    from pii_spark.spark.incr_dedup import (
        append_key_delta,
        base_keys,
        drop_recrawls,
    )

    d = spark.createDataFrame(
        [Row(doc_id=i, text=f"some document body number {i}")
         for i in range(5)]
    )
    fp_str, _ = base_keys(d, hashed=False)  # md5 path: string keys
    with pytest.raises(ValueError, match="BIGINT xxhash64"):
        drop_recrawls(d.withColumnRenamed("doc_id", "url"), fp_str)

    keys = tmp_path / "md5keys"
    fp, sig = base_keys(d, hashed=False)
    fp.write.parquet(str(keys / "fp.parquet"))
    sig.write.parquet(str(keys / "sig.parquet"))
    (keys / "keys_meta.json").write_text(json.dumps(
        {"shingle_len": 12, "stride": 5, "bands": 4,
         "text_col": "text", "hashed": False}))
    with pytest.raises(ValueError, match="hashed=false"):
        append_key_delta(spark, d, str(keys))
