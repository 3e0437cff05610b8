"""Recrawl dropping in the production jobs (SURVEY R79): base-corpus
keys precomputed once (jobs/run_base_keys.py semantics via base_keys),
then the batch and streaming quality jobs anti-join every group/batch
against them — the exact tier of incremental dedup fused into the
ingest chain — with key-set drift refused on resume/restart."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

ROOT = Path(__file__).resolve().parents[1]

from pii_spark.spark.gen_job import generate_corpus
from pii_spark.spark.incr_dedup import (
    base_keys,
    drop_recrawls,
    recrawl_keys_identity,
)


def _write_keys(spark, corpus_df, keys_dir) -> str:
    import json

    fp, sig = base_keys(corpus_df, id_col="url", hashed=True)
    fp.write.mode("overwrite").parquet(str(keys_dir / "fp.parquet"))
    sig.write.mode("overwrite").parquet(str(keys_dir / "sig.parquet"))
    # what jobs/run_base_keys.py records (defaults of base_keys)
    (keys_dir / "keys_meta.json").write_text(json.dumps(
        {"shingle_len": 12, "stride": 5, "bands": 4,
         "text_col": "text"}
    ))
    return str(keys_dir)


@pytest.fixture(scope="module")
def base_and_snapshot(spark, tmp_path_factory):
    """base = docs 0..39 of the deterministic corpus; snapshot = docs
    30..59 written as parquet — a 10-doc overlap of byte-identical
    texts (recrawls) plus 20 novel docs."""
    tmp = tmp_path_factory.mktemp("recrawl")
    corpus = generate_corpus(spark, 60).cache()
    snap_dir = str(tmp / "snap")
    # deterministic cohorts via the url sort order (limit() without an
    # order is shuffle-dependent)
    urls = [r.url for r in corpus.select("url").orderBy("url").collect()]
    base_urls, snap_urls = set(urls[:40]), set(urls[30:])
    base_df = corpus.filter(F.col("url").isin(list(base_urls)))
    snap_df = corpus.filter(F.col("url").isin(list(snap_urls)))
    keys_dir = _write_keys(spark, base_df, tmp / "keys")
    snap_df.repartition(2).write.mode("overwrite").parquet(snap_dir)
    other_keys = _write_keys(
        spark, corpus.filter(F.col("url").isin(urls[:10])), tmp / "keys2"
    )
    corpus.unpersist()
    return {
        "keys": keys_dir,
        "other_keys": other_keys,
        "snap_dir": snap_dir,
        "overlap": set(urls[30:40]),
        "novel": set(urls[40:]),
        "tmp": tmp,
    }


def test_drop_recrawls_expr(spark, base_and_snapshot):
    ctx = base_and_snapshot
    fp_df = spark.read.parquet(f"{ctx['keys']}/fp.parquet")
    snap = spark.read.parquet(ctx["snap_dir"])
    kept = {r.url for r in drop_recrawls(snap, fp_df).select("url").collect()}
    assert kept == ctx["novel"], "exactly the base-overlap docs drop"


def test_batch_job_recrawl_drop_and_drift_guard(spark, base_and_snapshot):
    from pii_spark.spark.jobs import run_quality_job

    ctx = base_and_snapshot
    out_dir = str(ctx["tmp"] / "out")
    audit_dir = str(ctx["tmp"] / "audit")
    out = run_quality_job(
        spark, ctx["snap_dir"], out_dir, audit_dir, groups=2,
        run_id="rc1", recrawl_keys=ctx["keys"],
    )
    urls = {r.url for r in out.read(spark).select("url").collect()}
    assert urls == ctx["novel"]

    # resume with the SAME keys: no-op (ledger complete)
    out2 = run_quality_job(
        spark, ctx["snap_dir"], out_dir, audit_dir, groups=2,
        run_id="rc2", recrawl_keys=ctx["keys"],
    )
    assert {r.url for r in out2.read(spark).select("url").collect()} \
        == ctx["novel"]

    # resume with DIFFERENT keys (a new corpus version): refuse loudly
    with pytest.raises(RuntimeError, match="recrawl key set"):
        run_quality_job(
            spark, ctx["snap_dir"], out_dir, audit_dir, groups=2,
            recrawl_keys=ctx["other_keys"],
        )
    # and with NO keys at all: same refusal (semantics would differ)
    with pytest.raises(RuntimeError, match="recrawl key set"):
        run_quality_job(
            spark, ctx["snap_dir"], out_dir, audit_dir, groups=2,
        )


def test_streaming_job_recrawl_drop_and_restart_guard(
    spark, base_and_snapshot
):
    from pii_spark.spark.streaming import run_streaming_job

    ctx = base_and_snapshot
    out_dir = str(ctx["tmp"] / "sout")
    ck = str(ctx["tmp"] / "ck")
    out = run_streaming_job(
        spark, ctx["snap_dir"], out_dir, ck, recrawl_keys=ctx["keys"],
    )
    urls = {r.url for r in out.read(spark).select("url").collect()}
    assert urls == ctx["novel"]

    # restart under a different key set refuses before processing
    with pytest.raises(RuntimeError, match="recrawl key set"):
        run_streaming_job(
            spark, ctx["snap_dir"], out_dir, ck,
            recrawl_keys=ctx["other_keys"],
        )
    with pytest.raises(RuntimeError, match="recrawl key set"):
        run_streaming_job(spark, ctx["snap_dir"], out_dir, ck)


def test_snapshot_dedup_cli(spark, base_and_snapshot, tmp_path):
    """jobs/run_snapshot_dedup.py — the full two-tier batch job over
    precomputed keys, driven as a real subprocess: recrawled docs
    filtered out, novel docs written, census printed."""
    import subprocess
    import sys

    ctx = base_and_snapshot
    out = str(tmp_path / "novel")
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_snapshot_dedup.py"),
         "--input", ctx["snap_dir"], "--keys", ctx["keys"],
         "--output", out],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "snapshot dedup census" in r.stdout
    kept = {row.url for row in spark.read.parquet(out).collect()}
    # every base-overlap doc dropped at the exact tier; near tier may
    # additionally drop generator near-dups among the novel cohort
    assert kept.isdisjoint(ctx["overlap"])
    assert kept <= ctx["novel"] and kept

    # a signature-geometry mismatch with the recorded keys refuses
    # loudly (near-tier hashes over different shingles would silently
    # match nothing — review r6b)
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_snapshot_dedup.py"),
         "--input", ctx["snap_dir"], "--keys", ctx["keys"],
         "--output", out, "--shingle-len", "8"],
        capture_output=True, text=True, cwd=ROOT, timeout=120,
    )
    assert r.returncode != 0
    assert "does not match the keys' recorded" in (r.stderr + r.stdout)


def test_keys_identity_tracks_content(spark, base_and_snapshot, tmp_path):
    ctx = base_and_snapshot
    a = recrawl_keys_identity(ctx["keys"])
    assert a == recrawl_keys_identity(ctx["keys"]), "deterministic"
    assert a != recrawl_keys_identity(ctx["other_keys"])
    with pytest.raises(FileNotFoundError, match="run_base_keys"):
        recrawl_keys_identity(str(tmp_path))
