"""Composable dedup job (jobs/run_dedup.py stages, driven in-process)."""

import subprocess
import sys
from pathlib import Path

from pii_spark.icelite.catalog import IceliteTable

ROOT = Path(__file__).resolve().parents[1]

SHARED_PARA = "Subscribe to our newsletter for weekly updates."
SHARED_SPAN = "the quick brown fox jumps over the lazy sleeping dog"
DOCS = [
    (0, f"Unique opening line one.\n{SHARED_PARA}"),
    (1, f"Unique opening line two.\n{SHARED_PARA}"),
    (2, f"Article about foxes where {SHARED_SPAN} happily today."),
    (3, f"Other piece noting {SHARED_SPAN} in the meadow."),
    (4, "An exact duplicate document body."),
    (5, "An exact duplicate document body."),
    (6, "A perfectly clean and unique document with nothing shared."),
]


def test_dedup_job_cli(spark, tmp_path):
    src = str(tmp_path / "in")
    spark.createDataFrame(DOCS, "doc_id long, text string") \
        .write.parquet(src)
    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
         "--input", src, "--output", out_dir,
         "--stages", "exact,paragraph,substring", "--k", "8"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "committed snapshot" in r.stdout

    t = IceliteTable(out_dir)
    rows = {x.doc_id: x.text for x in t.read(spark).collect()}
    # exact: one of the twin docs survives (min doc_id wins)
    assert 4 in rows and 5 not in rows
    # paragraph: the shared footer survives only in its first page
    assert SHARED_PARA in rows[0]
    assert SHARED_PARA not in rows[1]
    assert rows[1].startswith("Unique opening line two.")
    # substring: the 10-token shared span is gone from BOTH carriers
    assert SHARED_SPAN not in rows[2] and SHARED_SPAN not in rows[3]
    assert rows[2].startswith("Article about foxes")
    # clean doc untouched end to end
    assert rows[6] == DOCS[6][1]
    # audit summary records the chain and per-stage deltas
    s = t.snapshot().summary
    assert s["dedup_stages"] == "exact,paragraph,substring"
    assert s["removed_exact_rows"] == 1
    assert s["removed_paragraph_rows"] == 0
    assert s["removed_paragraph_chars"] > 0
    assert s["removed_substring_chars"] > 0


def test_dedup_job_preserves_untouched_whitespace_and_validates_ids(
    spark, tmp_path
):
    """Review r5b: a doc with no duplicated span keeps its original
    bytes (newlines included) through the substring stage; NULL or
    duplicate ids abort loudly before any rewrite."""
    src = str(tmp_path / "in2")
    docs = [
        (0, "line one\nline two\nno duplicated spans in here at all"),
        (1, "totally different words that share nothing with zero"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(src)
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
         "--input", src, "--output", str(tmp_path / "out2"),
         "--stages", "substring", "--k", "4"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = {x.doc_id: x.text for x in
            IceliteTable(str(tmp_path / "out2")).read(spark).collect()}
    assert rows[0] == docs[0][1]  # newlines intact
    assert "'substring': {'rows': 0, 'chars': 0}" in r.stdout

    # NULL id refused
    src3 = str(tmp_path / "in3")
    spark.createDataFrame([(None, "a"), (1, "b")],
                          "doc_id long, text string").write.parquet(src3)
    r3 = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
         "--input", src3, "--output", str(tmp_path / "out3"),
         "--stages", "exact"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r3.returncode != 0 and "NULL doc_id" in (r3.stderr + r3.stdout)

    # duplicate stage names refused
    r4 = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
         "--input", src, "--output", str(tmp_path / "out4"),
         "--stages", "exact,exact"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r4.returncode != 0 and "unique" in (r4.stderr + r4.stdout)


BASE = ("The committee convened on Tuesday to review the annual budget "
        "proposal, covering infrastructure, education funding, and the "
        "municipal water treatment upgrade planned for next spring.")


def test_dedup_job_semantic_stage(spark, tmp_path):
    """SemDeDup as a chain stage: exact twins fall in the exact tier,
    the near-paraphrase (hashed-3-gram cosine 0.954 vs tau 0.92) falls
    in the semantic tier keeping the lowest id, the unrelated doc
    (cosine 0.25) survives; audit summary records k/tau actually used."""
    docs = [
        (0, BASE),
        (1, BASE),                            # exact twin -> exact tier
        (2, BASE + " Attendance was high."),  # near-dup -> semantic tier
        (3, "Quantum entanglement experiments at the lab produced "
            "unexpected readings yesterday."),
    ]
    src = str(tmp_path / "sem_in")
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(src)
    out_dir = str(tmp_path / "sem_out")
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
         "--input", src, "--output", out_dir,
         "--stages", "exact,semantic", "--sem-clusters", "2"],
        capture_output=True, text=True, cwd=ROOT, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    t = IceliteTable(out_dir)
    kept = sorted(x.doc_id for x in t.read(spark).collect())
    assert kept == [0, 3]
    s = t.snapshot().summary
    assert s["removed_exact_rows"] == 1
    assert s["removed_semantic_rows"] == 1
    assert s["sem_k"] == 2 and s["sem_tau"] == 0.92 and s["sem_dim"] == 64
    # 4 docs < the default fit-sample floor: full fit, hash seeding
    assert s["sem_init"] == "hash" and s["sem_fit_sampled"] is False


def test_dedup_job_full_chain_with_semantic(spark, tmp_path):
    """All four stages composed — the regression pin for two measured
    failures: (1) the k-means fit re-embeds the upstream censuses'
    logical plan per iteration, so without eager lineage truncation
    before the fit the DRIVER heap OOMs on a 6-doc corpus; (2) the
    substring tier empties doc 0's body (its whole text was one
    duplicated span), the empty doc embeds to the zero vector, and an
    unguarded cosine raises DIVIDE_BY_ZERO under ANSI mode. The empty
    doc must be KEPT (dropping empties is the quality filter's job,
    not dedup's)."""
    shared_para = "Subscribe to our newsletter for weekly updates."
    docs = [
        (0, BASE),
        (1, BASE),                            # exact twin
        (2, BASE + " Attendance was high."),  # shares BASE as a span
        (3, f"Unique opening line.\n{shared_para}"),
        (4, f"Second unique opening.\n{shared_para}"),
        (5, "Quantum entanglement experiments at the lab produced "
            "unexpected readings yesterday and the day before too."),
    ]
    src = str(tmp_path / "chain_in")
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(src)
    out_dir = str(tmp_path / "chain_out")
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
         "--input", src, "--output", out_dir,
         "--stages", "exact,paragraph,substring,semantic",
         "--k", "8", "--sem-clusters", "2"],
        capture_output=True, text=True, cwd=ROOT, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    t = IceliteTable(out_dir)
    rows = {x.doc_id: x.text for x in t.read(spark).collect()}
    # exact dropped doc 1; everything else survives as ROWS — the
    # substring tier emptied doc 0 (zero vector, kept, not a dup)
    assert sorted(rows) == [0, 2, 3, 4, 5]
    assert rows[0].strip() == ""
    assert "Attendance was high" in rows[2] and BASE not in rows[2]
    s = t.snapshot().summary
    assert s["removed_exact_rows"] == 1
    assert s["removed_semantic_rows"] == 0


def test_dedup_job_semantic_refusals(spark, tmp_path):
    """Non-integral ids and out-of-range tau abort before any rewrite."""
    src = str(tmp_path / "sem_bad")
    spark.createDataFrame([("a", "x"), ("b", "y")],
                          "doc_id string, text string").write.parquet(src)
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
         "--input", src, "--output", str(tmp_path / "sem_bad_out"),
         "--stages", "semantic"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode != 0
    assert "integral" in (r.stderr + r.stdout)

    src2 = str(tmp_path / "sem_bad2")
    spark.createDataFrame([(0, "x")], "doc_id long, text string") \
        .write.parquet(src2)
    r2 = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
         "--input", src2, "--output", str(tmp_path / "sem_bad2_out"),
         "--stages", "semantic", "--sem-tau", "1.5"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r2.returncode != 0
    assert "sem-tau" in (r2.stderr + r2.stdout)
