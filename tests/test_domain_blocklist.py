"""Domain-blocklist curation loop (SURVEY R89): score a corpus →
derive the blocklist from committed quality signals (maintenance CLI)
→ apply it at ingest on the next run (batch + streaming), identity-
guarded on resume like every other semantics knob."""

import subprocess
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

ROOT = Path(__file__).resolve().parents[1]

_CLEAN = ("The quick brown fox jumps over the lazy dog near the old "
          "river bank, and this fine story was told with great care "
          "for all patient readers of the village gazette today. ")
_JUNK = "zzz xx qq {{{ lorem ipsum }}} " * 3


_MORE = ("Chapter %d recounts how the miller and the baker walked to "
         "the northern market while discussing weather, crops, music, "
         "letters, and the coming autumn festival with enthusiasm; "
         "later the children gathered apples, pears, and plums before "
         "supper was served in the long warm hall. ")


def _corpus(spark, tmp_path):
    rows = []
    for i in range(12):
        rows.append((f"https://good{i % 3}.example/p/{i}", None, None,
                     _CLEAN + _MORE % i + _MORE % (i + 50), "en"))
    for i in range(6):
        rows.append((f"https://junk.example/p/{i}", None, None,
                     _JUNK, "en"))
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    ).repartition(2).write.mode("overwrite").parquet(d)
    return d


def test_derive_then_apply_blocklist_loop(spark, tmp_path):
    from pii_spark.spark.jobs import run_quality_job

    corpus = _corpus(spark, tmp_path)
    # pass 1: plain quality job — junk.example drops at quality time
    t1 = run_quality_job(spark, corpus, str(tmp_path / "t1"),
                         str(tmp_path / "a1"), groups=2)
    kept = t1.read(spark).filter("keep")
    assert kept.filter(F.col("url").contains("junk.example")).count() == 0

    # derive: domains with keep_rate < 0.5 over >= 3 docs
    bl = str(tmp_path / "blocklist")
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_maintenance.py"),
         "--table", str(tmp_path / "t1"),
         "--derive-blocklist", bl, "--blocklist-max-keep-rate", "0.5"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "blocklist: 1 domains" in r.stdout
    got = spark.read.parquet(bl).collect()
    assert [x.domain for x in got] == ["junk.example"]
    assert got[0].reason == "low_keep_rate"

    # pass 2 (next crawl): the blocklist drops junk.example BEFORE the
    # pipeline — those docs never appear in the output at all
    t2 = run_quality_job(spark, corpus, str(tmp_path / "t2"),
                         str(tmp_path / "a2"), groups=2,
                         domain_blocklist=bl)
    urls2 = {r2.url for r2 in t2.read(spark).collect()}
    assert len(urls2) == 12
    assert all("junk.example" not in u for u in urls2)

    # resume without (or with a different) blocklist refuses
    with pytest.raises(RuntimeError, match="domain blocklist"):
        run_quality_job(spark, corpus, str(tmp_path / "t2"),
                        str(tmp_path / "a2"), groups=2)
    # same blocklist: clean no-op resume
    t2b = run_quality_job(spark, corpus, str(tmp_path / "t2"),
                          str(tmp_path / "a2"), groups=2,
                          domain_blocklist=bl)
    assert t2b.read(spark).count() == 12
    # a missing/empty blocklist dir refuses loudly up front
    with pytest.raises(FileNotFoundError, match="derive-blocklist"):
        run_quality_job(spark, corpus, str(tmp_path / "t3"),
                        str(tmp_path / "a3"), groups=2,
                        domain_blocklist=str(tmp_path / "nope"))


def test_streaming_blocklist_and_restart_guard(spark, tmp_path):
    from pii_spark.spark.streaming import run_streaming_job

    corpus = _corpus(spark, tmp_path)
    bl = str(tmp_path / "bl")
    spark.createDataFrame(
        [("junk.example",)], "domain string"
    ).write.parquet(bl)
    out, ck = str(tmp_path / "sout"), str(tmp_path / "ck")
    t = run_streaming_job(spark, corpus, out, ck, domain_blocklist=bl)
    urls = {r.url for r in t.read(spark).collect()}
    assert len(urls) == 12 and all("junk" not in u for u in urls)
    with pytest.raises(RuntimeError, match="domain blocklist"):
        run_streaming_job(spark, corpus, out, ck)


def test_url_domain_normalization_closes_bypass(spark, tmp_path):
    """Review r7: hosts are case-insensitive and userinfo/port
    spellings name the same origin — every equivalent spelling of a
    blocklisted domain must drop."""
    from pii_spark.spark.jobs import drop_blocklisted_domains

    bl = spark.createDataFrame([("junk.example",)], "domain string")
    d = spark.createDataFrame(
        [(u, "t") for u in (
            "https://JUNK.example/x",
            "https://junk.example:443/x",
            "https://a@junk.example/x",
            "https://User:Pw@JUNK.EXAMPLE:8080/deep?q=1",
            "https://fine.example/x",
            "https://junk.example.evil.com/x",  # different host: keep
        )],
        "url string, text string",
    )
    kept = {r.url for r in drop_blocklisted_domains(d, bl).collect()}
    assert kept == {"https://fine.example/x",
                    "https://junk.example.evil.com/x"}
    # derivation uses the SAME definition, so mixed-case crawl urls
    # aggregate into one domain row
    from pii_spark.spark.jobs import url_domain

    doms = {r.d for r in d.select(url_domain(F.col("url")).alias("d"))
            .collect()}
    assert "junk.example" in doms and "JUNK.example" not in doms


def test_blocklist_suffix_and_schemeless_matching(spark):
    """Review r7b: externally curated registered-domain lists must
    catch subdomains ('evil.spam.example' under a 'spam.example'
    entry) and scheme-less urls must not bypass the filter entirely.
    The offline eTLD+1 approximation's limits are pinned too: a
    3-label blocklist entry matches exactly only, and lookalike hosts
    never over-drop."""
    from pii_spark.spark.jobs import drop_blocklisted_domains, url_domain

    bl = spark.createDataFrame(
        [("spam.example",), ("sub.deep.example",)], "domain string"
    )
    d = spark.createDataFrame(
        [(u, "t") for u in (
            "https://spam.example/x",            # exact: drop
            "https://evil.spam.example/x",       # subdomain: drop
            "https://a.b.spam.example/x",        # deep subdomain: drop
            "spam.example/landing",              # scheme-less: drop
            "https://notspam.example/x",         # lookalike: keep
            "https://sub.deep.example/x",        # 3-label exact: drop
            "https://x.sub.deep.example/x",      # under 3-label entry:
                                                 # kept (documented
                                                 # eTLD+1 limit)
            "https://fine.example/x",            # keep
        )],
        "url string, text string",
    )
    kept = {r.url for r in drop_blocklisted_domains(d, bl).collect()}
    assert kept == {"https://notspam.example/x",
                    "https://x.sub.deep.example/x",
                    "https://fine.example/x"}
    # scheme-less extraction itself (was '' pre-r8)
    doms = {r.u: r.d for r in spark.createDataFrame(
        [("spam.example/landing",), ("https://spam.example/x",)],
        "u string",
    ).select("u", url_domain(F.col("u")).alias("d")).collect()}
    assert doms["spam.example/landing"] == "spam.example"
    assert doms["https://spam.example/x"] == "spam.example"


def test_derive_blocklist_score_criterion(spark, tmp_path):
    """--blocklist-max-score: the classifier-score criterion (needs a
    clf_score column; refuses without one), with reason='low_score',
    composable with the keep-rate criterion."""
    from pii_spark.icelite.catalog import IceliteTable

    t = IceliteTable(str(tmp_path / "table"))
    rows = []
    for i in range(6):
        rows.append(("https://good.example/p/%d" % i, True, 50.0))
        rows.append(("https://lowscore.example/p/%d" % i, True, -40.0))
        rows.append(("https://dropped.example/p/%d" % i, False, 10.0))
    t.append(
        spark.createDataFrame(
            rows, "url string, keep boolean, clf_score double"
        ),
        summary={"group": 0},
    )
    bl = str(tmp_path / "bl")
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_maintenance.py"),
         "--table", str(tmp_path / "table"),
         "--derive-blocklist", bl,
         "--blocklist-max-score", "0",
         "--blocklist-max-keep-rate", "0.5"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {x.domain: x.reason for x in spark.read.parquet(bl).collect()}
    assert got == {"lowscore.example": "low_score",
                   "dropped.example": "low_keep_rate"}

    # the score criterion without a clf_score column refuses loudly
    t2 = IceliteTable(str(tmp_path / "plain"))
    t2.append(
        spark.createDataFrame(
            [("https://a/1", True)], "url string, keep boolean"
        ),
        summary={"group": 0},
    )
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_maintenance.py"),
         "--table", str(tmp_path / "plain"),
         "--derive-blocklist", str(tmp_path / "bl2"),
         "--blocklist-max-score", "0"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode != 0
    assert "needs a clf_score column" in (r.stderr + r.stdout)
