"""Corpus datasheet (`run_maintenance --report`): the stats a curated
corpus publishes with every snapshot, from bounded driver collects
only — one quality_report wide row, one quantile row, the language
census, and a top-k domain list."""

import json
import subprocess
import sys
from pathlib import Path

from pii_spark.icelite.catalog import IceliteTable

ROOT = Path(__file__).resolve().parents[1]

_PROSE = ("The harbor keeper said this was a fine morning, with fresh "
          "goods from the early cart, and the neighbors agreed that "
          "prices for all wares are fair and reasonable this season.")


def test_report_datasheet(spark, tmp_path):
    rows = [
        (f"https://big.example/{i}",
         _PROSE + f" Extra sentence number {i}.",
         True, "en", 0.9 - i * 0.1)
        for i in range(4)
    ] + [
        ("https://small.example/0", _PROSE, True, "fr", 0.5),
        ("https://junk.example/0", "zz qq", False, "en", 0.1),
    ]
    df = spark.createDataFrame(
        rows, "url string, scrubbed_text string, keep boolean, "
              "lang_pred string, clf_score double")
    t = IceliteTable(str(tmp_path / "tbl"))
    t.overwrite(df, summary={"source": "unit"})

    out = tmp_path / "datasheet.json"
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_maintenance.py"),
         "--table", str(tmp_path / "tbl"),
         "--report", str(out), "--report-top-domains", "2"],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(out.read_text())

    assert rep["n_rows"] == 6
    assert rep["keep_rate"] == round(5 / 6, 4)
    assert rep["snapshot_summary"]["source"] == "unit"
    assert rep["text_col"] == "scrubbed_text"
    # distribution stats describe the kept corpus only
    assert rep["quality"]["n_docs"] == 5
    assert rep["lang_mix"] == {"en": 4, "fr": 1}
    # exact percentiles over the kept scores [0.5, 0.6, 0.7, 0.8, 0.9]
    p10, p50, p90 = rep["clf_score_p10_p50_p90"]
    assert (p10, p50, p90) == (0.54, 0.7, 0.86)
    # top-k domains, count-desc, over the KEPT corpus only — the
    # dropped junk.example domain must be absent, not merely outranked
    assert rep["top_domains"] == [
        {"domain": "big.example", "n": 4},
        {"domain": "small.example", "n": 1},
    ]


def test_report_without_optional_columns(spark, tmp_path):
    """A table with only (url, text): the datasheet still writes, with
    the optional sections absent rather than crashing or fabricating."""
    df = spark.createDataFrame(
        [(f"https://a.example/{i}", _PROSE) for i in range(3)],
        "url string, text string")
    t = IceliteTable(str(tmp_path / "plain"))
    t.overwrite(df, summary={})
    out = tmp_path / "plain.json"
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_maintenance.py"),
         "--table", str(tmp_path / "plain"), "--report", str(out)],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(out.read_text())
    assert rep["n_rows"] == 3 and rep["text_col"] == "text"
    assert "keep_rate" not in rep
    assert "lang_mix" not in rep and "clf_score_p10_p50_p90" not in rep
    assert rep["quality"]["n_docs"] == 3
