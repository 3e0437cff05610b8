"""The classifier job CLI (jobs/run_classifier.py): train persists the
integer census + meta, score applies it to a different corpus —
driven as a real subprocess like the other job CLIs."""

import json
import subprocess
import sys
from pathlib import Path

from pyspark.sql import Row

ROOT = Path(__file__).resolve().parents[1]

_CLEAN = ("the quick brown fox and the lazy dog are friends from the "
          "old farm, and this story was told with care for all readers "
          "that have patience. ")
_JUNK = "zxqv kjhw pqzt vvnm xkcd qwfp zzgl hmmt "


def _run(args):
    return subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_classifier.py"), *args],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )


def test_train_then_score_cli(spark, tmp_path):
    train_dir = str(tmp_path / "train")
    spark.createDataFrame(
        [Row(url=f"https://c/{i}", text=_CLEAN * 2) for i in range(10)]
        + [Row(url=f"https://j/{i}", text=_JUNK * 3) for i in range(10)]
    ).write.parquet(train_dir)
    snap_dir = str(tmp_path / "snap")
    spark.createDataFrame(
        [Row(url="https://c/new", text=_CLEAN + "a new tale ending."),
         Row(url="https://j/new", text=_JUNK * 2 + "qq zz")]
    ).write.parquet(snap_dir)

    model = tmp_path / "model"
    r = _run(["train", "--input", train_dir, "--model", str(model)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "trained:" in r.stdout
    meta = json.loads((model / "meta.json").read_text())
    assert meta["hashed"] is True and set(meta["labels"]) == {"0", "1"}

    out = str(tmp_path / "scores")
    r = _run(["score", "--input", snap_dir, "--model", str(model),
              "--output", out])
    assert r.returncode == 0, r.stderr[-2000:]
    got = {r2.url: r2 for r2 in spark.read.parquet(out).collect()}
    assert got["https://c/new"].predict_pos
    assert not got["https://j/new"].predict_pos
    assert got["https://c/new"].score > got["https://j/new"].score
