"""Grand lifecycle scenario — the operation sequence a production
table actually sees, composed end-to-end: batch job (path mode, with
mid-run compaction) → streaming append of a second crop → re-crawl
upsert → right-to-be-forgotten → expiry → orphan GC → resume no-op.
Cross-feature interactions (group ledger vs row-level snapshots vs
stream ledger vs maintenance) are exactly where past rounds found real
bugs; this pins the composition, not just the parts."""

from pyspark.sql import functions as F

from pii_spark.icelite.catalog import IceliteTable
from pii_spark.spark.gen_job import generate_corpus
from pii_spark.spark.jobs import run_forget_job, run_quality_job
from pii_spark.spark.streaming import run_streaming_job


def test_full_table_lifecycle(spark, tmp_path):
    out_dir, audit_dir = str(tmp_path / "out"), str(tmp_path / "audit")

    # 1. batch crop via path mode with compaction interleaved
    crop1 = str(tmp_path / "crop1")
    generate_corpus(spark, 60).repartition(4).write.parquet(crop1)
    out = run_quality_job(spark, crop1, out_dir, audit_dir, groups=4,
                          run_id="batch1", compact_every=2)
    assert out.read(spark).count() == 60
    assert out.committed_groups() == set(range(4))

    # 2. streaming crop on the same table (its own ledger namespace)
    crop2 = str(tmp_path / "crop2")
    generate_corpus(spark, 940).selectExpr(
        "concat('https://stream.example.com/', url) AS url",
        "warc_ts", "html", "text", "lang",
    ).limit(20).write.parquet(crop2)
    out = run_streaming_job(spark, crop2, out_dir,
                            str(tmp_path / "ckpt"))
    assert out.read(spark).count() == 80

    # 3. re-crawl upsert: two urls get fresh scrubbed text
    victims = [r.url for r in out.read(spark).limit(2).collect()]
    recrawl = out.read(spark).filter(
        F.col("url").isin(victims)
    ).withColumn("scrubbed_text", F.lit("RECRAWLED"))
    out.upsert(spark, recrawl, keys=["url"])
    got = {r.url: r.scrubbed_text for r in out.read(spark).collect()}
    assert len(got) == 80
    assert all(got[u] == "RECRAWLED" for u in victims)

    # 4. erasure of one re-crawled and one untouched url
    other = next(u for u in got if u not in victims)
    n = run_forget_job(spark, out_dir, audit_dir,
                       [victims[0], other], run_id="erase",
                       expire_now=True)
    assert n == 2
    assert out.read(spark).count() == 78
    # erased urls gone at every READABLE version (expire_now reclaimed
    # pre-delete history)
    for s in out.snapshots():
        rows = {r.url for r in out.read(spark, s.version).collect()}
        assert victims[0] not in rows and other not in rows

    # 5. orphan GC with an aged planted orphan; nothing live touched
    import os
    import time

    orphan = out._write_data(out.read(spark).limit(1))
    os.utime(orphan, (time.time() - 9999,) * 2)
    assert out.gc_orphans(grace_s=3600) == [orphan]
    assert out.read(spark).count() == 78

    # 6. batch resume over crop1 is a pure no-op (ledger survived
    # compaction + upsert + delete + expiry + gc)
    v = out.current_version()
    out2 = run_quality_job(spark, crop1, out_dir, audit_dir, groups=4,
                           run_id="batch2")
    assert out2.current_version() == v
    # ...and the streaming checkpoint replays nothing either
    out3 = run_streaming_job(spark, crop2, out_dir,
                             str(tmp_path / "ckpt"))
    assert out3.current_version() == v
    assert out3.read(spark).count() == 78

    # 7. audit trail: batch groups + erasure rows all present
    audit = IceliteTable(audit_dir).read(spark).collect()
    runs = {r.run_id for r in audit}
    assert {"batch1", "erase"} <= runs
    assert sum(r.docs_in for r in audit if r.run_id == "batch1") == 60
