"""Composed dedup chain at sf0.1 scale (VERDICT r5 #7): drive the
REAL jobs/run_dedup.py CLI (its own spark-submit-shaped process) over
bench.py's 50k-doc generated corpus with planted duplicates for every
stage, then assert the per-stage row/char deltas and the rewritten
bytes against the pure twins — the paragraph twin over the full
corpus, exact/substring against closed-form expectations, and a
deterministic untouched-doc sample against byte identity."""

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

ROOT = Path(__file__).resolve().parents[1]
N = 50_000
COPIES = range(49_000, 49_500)        # exact dups of docs 0..499
FOOTER_DOCS = range(1_000, 1_300)     # shared footer paragraph
BLOCK_DOCS = range(2_000, 2_040)      # shared 60-token span
FOOTER = ("CALL-TO-ACTION subscribe to the example newsletter "
          "right away today.")
BLOCK = " ".join(f"plantedblocktoken{j}" for j in range(60))
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.1/documents.parquet"),
    reason="sf0.1 testdata not present",
)
def test_dedup_chain_sf01_against_twins(spark, tmp_path):
    from pii_spark.icelite.catalog import IceliteTable
    from pii_spark.spark.gen_job import generate_corpus
    from pii_spark.spark.para_dedup import paragraph_dedup_pure

    base = generate_corpus(spark, N, partitions=32).select(
        "doc_id", "text"
    )
    planted = base.select(
        "doc_id",
        F.when(
            F.col("doc_id").between(FOOTER_DOCS[0], FOOTER_DOCS[-1]),
            F.concat("text", F.lit("\n" + FOOTER)),
        ).when(
            F.col("doc_id").between(BLOCK_DOCS[0], BLOCK_DOCS[-1]),
            F.concat("text", F.lit(" " + BLOCK)),
        ).otherwise(F.col("text")).alias("text"),
    )
    copies = (
        base.filter(F.col("doc_id") < len(COPIES))
        .select((F.col("doc_id") + COPIES[0]).alias("doc_id"), "text")
    )
    corpus = planted.filter(
        ~F.col("doc_id").between(COPIES[0], COPIES[-1])
    ).unionByName(copies)
    src = str(tmp_path / "in")
    corpus.write.parquet(src)

    texts = {r.doc_id: r.text for r in corpus.collect()}
    assert len(texts) == N
    # precondition for the exact-stage expectation: the only exact
    # duplicates are the planted copies
    assert len(set(texts.values())) == N - len(COPIES)

    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
         "--input", src, "--output", out_dir,
         "--stages", "exact,paragraph,substring", "--k", "50"],
        capture_output=True, text=True, cwd=ROOT, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # ---- pure-twin expectations ------------------------------------
    post_exact = {
        i: t for i, t in texts.items() if i not in COPIES
    }
    para_twin = paragraph_dedup_pure(post_exact)
    post_para = {i: v["cleaned_text"] for i, v in para_twin.items()}
    exp_sub = {}
    for i in BLOCK_DOCS:
        toks = [w for w in _WS.split(post_para[i]) if w]
        assert toks[-60:] == BLOCK.split(" ")
        exp_sub[i] = " ".join(toks[:-60])

    t = IceliteTable(out_dir)
    got = {x.doc_id: x.text for x in t.read(spark).collect()}
    s = t.snapshot().summary

    # ---- per-stage deltas ------------------------------------------
    assert s["removed_exact_rows"] == len(COPIES)
    assert s["removed_paragraph_rows"] == 0
    exp_para_chars = sum(
        len(post_exact[i]) - len(post_para[i]) for i in post_exact
    )
    # the planted footer fired (299 removals) on top of any natural
    # paragraph dups the generator produced
    assert exp_para_chars >= 299 * len(FOOTER)
    assert s["removed_paragraph_chars"] == exp_para_chars
    exp_sub_chars = sum(
        len(post_para[i]) - len(exp_sub[i]) for i in BLOCK_DOCS
    )
    assert s["removed_substring_rows"] == 0
    assert s["removed_substring_chars"] == exp_sub_chars

    # ---- rewritten bytes vs twins ----------------------------------
    assert len(got) == N - len(COPIES)
    assert FOOTER in got[FOOTER_DOCS[0]]          # keep-first survivor
    for i in list(FOOTER_DOCS)[1:50]:             # sampled footer docs
        assert FOOTER not in got[i]
        assert got[i] == post_para[i], i
    for i in BLOCK_DOCS:                          # all span carriers
        assert "plantedblocktoken" not in got[i]
        assert got[i] == exp_sub[i], i
    # deterministic untouched sample: byte identity end to end
    untouched = [
        i for i in range(3_000, 49_000, 97)
        if post_para[i] == texts[i]
    ]
    assert len(untouched) > 400
    for i in untouched:
        assert got[i] == texts[i], i
