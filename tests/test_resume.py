"""Checkpoint-resume + lineage: a killed job restarts from the last
committed snapshot, reprocesses nothing, and produces identical output
(north-rule requirement; SURVEY §5 test plan items 5-6)."""

import pytest

from pii_spark.icelite.catalog import IceliteTable
from pii_spark.spark.gen_job import generate_corpus
from pii_spark.spark.jobs import run_quality_job

N = 160
GROUPS = 4


def _rows(spark, table):
    return sorted(
        (r.url, r.keep, r.scrubbed_text)
        for r in table.read(spark).collect()
    )


def test_resume_after_injected_failure(spark, tmp_path):
    corpus = generate_corpus(spark, N).cache()

    # uninterrupted reference run
    ref = run_quality_job(
        spark, corpus, str(tmp_path / "ref"), str(tmp_path / "ref_audit"),
        groups=GROUPS, run_id="ref",
    )
    ref_rows = _rows(spark, ref)

    # killed run: crashes after 2 group commits
    with pytest.raises(RuntimeError, match="injected failure"):
        run_quality_job(
            spark, corpus, str(tmp_path / "out"), str(tmp_path / "audit"),
            groups=GROUPS, run_id="run1", fail_after_groups=2,
        )
    out = IceliteTable(str(tmp_path / "out"))
    committed_before = out.committed_groups()
    assert len(committed_before) == 2

    # resume: only the remaining groups are processed
    out = run_quality_job(
        spark, corpus, str(tmp_path / "out"), str(tmp_path / "audit"),
        groups=GROUPS, run_id="run2",
    )
    assert out.committed_groups() == set(range(GROUPS))
    # groups committed before the crash were NOT reprocessed: their
    # snapshots still carry the first run's id
    for snap in out.snapshots():
        if snap.summary.get("group") in committed_before:
            assert snap.summary["run_id"] == "run1"

    # identical output to the uninterrupted run (byte-identical rows)
    assert _rows(spark, out) == ref_rows


def test_audit_lineage_rows(spark, tmp_path):
    corpus = generate_corpus(spark, 80).cache()
    run_quality_job(
        spark, corpus, str(tmp_path / "o"), str(tmp_path / "a"),
        groups=2, run_id="auditrun",
    )
    audit = IceliteTable(str(tmp_path / "a")).read(spark).collect()
    assert sum(r.docs_in for r in audit) == 80
    for r in audit:
        assert r.docs_in == r.docs_kept + r.docs_dropped
        assert r.run_id == "auditrun"
        assert r.snapshot_id is not None and r.wall_ms >= 0


def test_time_travel(spark, tmp_path):
    corpus = generate_corpus(spark, 40).cache()
    t = run_quality_job(
        spark, corpus, str(tmp_path / "t"), str(tmp_path / "ta"), groups=2
    )
    v1 = t.read(spark, version=1).count()
    v2 = t.read(spark, version=2).count()
    assert v1 < v2 == 40  # snapshot 1 = first group only
