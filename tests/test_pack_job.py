"""The training-shard last mile (VERDICT r7 #1 + missing #2): persist
the BPE tokenizer as an identity-guarded artifact, export the curated
table as packed shards via the CLI chain, consume the CCNet routing
table at export time — and refuse loudly on identity drift."""

import json
import subprocess
import sys
from pathlib import Path

import pytest
from pyspark.sql import Row, functions as F

ROOT = Path(__file__).resolve().parents[1]

_TEXT = ("the quick brown fox jumps over the lazy dog and tells a "
         "long story about the farm where every reader finds some "
         "patience and care for words. ")


def _run(job, args):
    return subprocess.run(
        [sys.executable, str(ROOT / "jobs" / job), *args],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )


def _corpus_rows(n=12):
    return [
        Row(url=f"https://c{i % 3}.example/{i}",
            scrubbed_text=_TEXT + f"tail marker w{i} " * (i % 4 + 1),
            keep=(i % 6 != 5))
        for i in range(n)
    ]


def test_tokenizer_and_pack_cli_chain(spark, tmp_path):
    """run_tokenizer → run_pack: shards are fixed-length, lossless
    against the pure encoder in xxhash64(url) order, dropped-keep rows
    never export, and pack_meta records the tokenizer identity."""
    from pii_spark.quality.bpe import (
        _EOW,
        bpe_encode_pure,
        bpe_model_identity,
        load_bpe_model,
    )

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(_corpus_rows()).write.parquet(corpus)

    model = tmp_path / "tok"
    r = _run("run_tokenizer.py",
             ["--input", corpus, "--model", str(model), "--merges", "12",
              "--text-col", "scrubbed_text", "--sample-n", "10"])
    assert r.returncode == 0, r.stderr[-2000:]
    merges, meta = load_bpe_model(spark, str(model))
    assert len(merges) == 12 and meta["sample"].startswith("uniform:10")
    tok_id = bpe_model_identity(str(model))
    assert tok_id == bpe_model_identity(str(model))  # deterministic

    out = tmp_path / "shards"
    L = 64
    r = _run("run_pack.py",
             ["--input", corpus, "--input-format", "parquet",
              "--tokenizer-model", str(model), "--output", str(out),
              "--seq-len", str(L), "--n-buckets", "8"])
    assert r.returncode == 0, r.stderr[-2000:]
    pm = json.loads((out / "pack_meta.json").read_text())
    assert pm["tokenizer"] == tok_id and pm["seq_len"] == L
    assert pm["route_table"] == "none"

    seqs = {s.seq_id: s.tokens for s in
            spark.read.parquet(str(out / "shards.parquet")).collect()}
    ids = sorted(seqs)
    assert ids == list(range(len(ids)))
    for s in ids[:-1]:
        assert len(seqs[s]) == L
    assert 0 < len(seqs[ids[-1]]) <= L

    # lossless vs the pure encoder, docs in xxhash64(url) order,
    # keep=False rows absent
    import re

    kept = [r2 for r2 in _corpus_rows() if r2.keep]
    order = {
        r3.url: r3.h
        for r3 in spark.createDataFrame([(k.url,) for k in kept], "url string")
        .select("url", F.xxhash64("url").alias("h")).collect()
    }
    ref = []
    for doc in sorted(kept, key=lambda d: order[d.url]):
        for w in re.split(r"[ \t\n\x0b\f\r]+", doc.scrubbed_text.lower()):
            if w:
                ref.extend(bpe_encode_pure(w, merges))
    flat = [t for s in ids for t in seqs[s]]
    assert flat == ref
    assert pm["total_tokens"] == len(ref)
    assert flat and flat[-1].endswith(_EOW)  # word-terminated stream


def test_pack_refuses_identity_drift(spark, tmp_path):
    """Shards written under tokenizer A must refuse a rewrite under
    tokenizer B (different token universe) unless --force."""
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(_corpus_rows(8)).write.parquet(corpus)
    tok_a, tok_b = tmp_path / "tok_a", tmp_path / "tok_b"
    for model, merges in ((tok_a, "10"), (tok_b, "4")):
        r = _run("run_tokenizer.py",
                 ["--input", corpus, "--model", str(model),
                  "--merges", merges, "--text-col", "scrubbed_text"])
        assert r.returncode == 0, r.stderr[-2000:]

    out = tmp_path / "shards"
    base = ["--input", corpus, "--input-format", "parquet",
            "--output", str(out), "--seq-len", "32"]
    r = _run("run_pack.py", base + ["--tokenizer-model", str(tok_a)])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run("run_pack.py", base + ["--tokenizer-model", str(tok_b)])
    assert r.returncode != 0
    assert "different inputs" in (r.stderr + r.stdout)
    r = _run("run_pack.py",
             base + ["--tokenizer-model", str(tok_b), "--force"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads((out / "pack_meta.json").read_text())["n_merges"] == 4


def test_route_weight_filter_semantics(spark):
    """Library level: tail=0 drops the bucket, head=1 keeps it whole,
    fractional weights draw deterministically (same membership across
    partitionings), unrouted docs are dropped, weight>1 refuses."""
    from pii_spark.spark.sampling import route_weight_filter

    docs = spark.createDataFrame(
        [Row(url=f"https://d/{i}", text=f"doc {i}") for i in range(60)]
    )
    route = spark.createDataFrame(
        [Row(url=f"https://d/{i}",
             ccnet_bucket=("head" if i < 20 else
                           "middle" if i < 40 else "tail"))
         for i in range(50)]  # 50-59 unrouted
    )
    w = {"head": 1.0, "middle": 0.5, "tail": 0.0}
    got = route_weight_filter(docs, route, w).collect()
    by_bucket: dict = {}
    for r in got:
        by_bucket.setdefault(r.ccnet_bucket, set()).add(r.url)
    assert len(by_bucket.get("head", ())) == 20
    assert "tail" not in by_bucket
    mid = by_bucket.get("middle", set())
    assert 0 < len(mid) < 20  # fractional draw actually thins
    assert all(int(u.rsplit("/", 1)[1]) < 50 for b in by_bucket.values()
               for u in b)  # unrouted dropped
    # deterministic across layouts
    again = {r.url for r in route_weight_filter(
        docs.repartition(7), route.repartition(3), w).collect()}
    assert again == {r.url for r in got}
    with pytest.raises(ValueError, match="keep probabilities"):
        route_weight_filter(docs, route, {"head": 1.5})


def test_pack_job_consumes_route_table_cli(spark, tmp_path):
    """The CLI loop closed end to end: a routing table derived over
    the corpus gates the export — tail docs' tokens are absent from
    the shards, and the route identity is recorded."""
    from pii_spark.quality.bpe import bpe_encode_pure, load_bpe_model

    rows = _corpus_rows(12)
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(rows).write.parquet(corpus)
    model = tmp_path / "tok"
    r = _run("run_tokenizer.py",
             ["--input", corpus, "--model", str(model), "--merges", "6",
              "--text-col", "scrubbed_text"])
    assert r.returncode == 0, r.stderr[-2000:]

    # route every KEPT doc; make one bucket carry a unique marker word
    kept = [x for x in rows if x.keep]
    route_dir = str(tmp_path / "route")
    spark.createDataFrame(
        [Row(url=x.url,
             ccnet_bucket=("tail" if x.url.endswith(("/0", "/1", "/2"))
                           else "head"))
         for x in kept]
    ).write.parquet(route_dir)

    out = tmp_path / "shards"
    r = _run("run_pack.py",
             ["--input", corpus, "--input-format", "parquet",
              "--tokenizer-model", str(model), "--output", str(out),
              "--seq-len", "48", "--route-table", route_dir,
              "--route-weights", "head=1.0,tail=0.0"])
    assert r.returncode == 0, r.stderr[-2000:]
    pm = json.loads((out / "pack_meta.json").read_text())
    assert pm["route_table"] != "none"
    assert pm["route_weights"] == {"head": 1.0, "tail": 0.0}

    merges, _ = load_bpe_model(spark, str(model))
    flat = "".join(
        t for s in spark.read.parquet(str(out / "shards.parquet")).collect()
        for t in s.tokens
    )
    # tail docs 0..2 carry "w0"/"w1"/"w2" markers; head docs carry
    # w3/w4/... — check a tail-only marker is gone, a head one present
    tail_marker = "".join(bpe_encode_pure("w1", merges))
    head_marker = "".join(bpe_encode_pure("w3", merges))
    assert head_marker in flat
    assert tail_marker not in flat


def test_pack_decontam_drops_benchmark_overlaps(spark, tmp_path):
    """r8: the --decontam-benchmark consumer — a corpus doc whose text
    a benchmark/eval set contains is dropped at export time, the drop
    count lands in pack_meta, and exporting against a DIFFERENT
    benchmark set refuses loudly (the drift-guard class)."""
    # pairwise non-overlapping docs (every word carries the doc index)
    # so ONLY the planted benchmark copy shares 8-gram fingerprints
    rows = [
        Row(url=f"https://d.example/{i}",
            scrubbed_text=(f"alpha{i} bravo{i} charlie{i} delta{i} "
                           f"echo{i} foxtrot{i} golf{i} hotel{i} ") * 4,
            keep=True)
        for i in range(8)
    ]
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(rows).write.parquet(corpus)

    model = tmp_path / "tok"
    r = _run("run_tokenizer.py",
             ["--input", corpus, "--model", str(model), "--merges", "8",
              "--text-col", "scrubbed_text"])
    assert r.returncode == 0, r.stderr[-2000:]

    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [Row(text=rows[3].scrubbed_text)]
    ).write.parquet(bench)

    out = tmp_path / "shards"
    r = _run("run_pack.py",
             ["--input", corpus, "--input-format", "parquet",
              "--tokenizer-model", str(model), "--output", str(out),
              "--seq-len", "48", "--decontam-benchmark", bench])
    assert r.returncode == 0, r.stderr[-2000:]
    pm = json.loads((out / "pack_meta.json").read_text())
    assert pm["n_contaminated_dropped"] == 1
    assert pm["benchmark"].endswith(":2") and pm["benchmark"] != "none"

    from pii_spark.quality.bpe import bpe_encode_pure, load_bpe_model

    merges, _ = load_bpe_model(spark, str(model))
    flat = "".join(
        t for s in spark.read.parquet(str(out / "shards.parquet")).collect()
        for t in s.tokens
    )
    gone = "".join(bpe_encode_pure("alpha3", merges))
    kept_marker = "".join(bpe_encode_pure("alpha4", merges))
    assert kept_marker in flat
    assert gone not in flat

    # identity drift: a different benchmark set against the same shard
    # dir refuses without --force, proceeds with it
    bench2 = str(tmp_path / "bench2")
    spark.createDataFrame(
        [Row(text=rows[5].scrubbed_text)]
    ).write.parquet(bench2)
    r = _run("run_pack.py",
             ["--input", corpus, "--input-format", "parquet",
              "--tokenizer-model", str(model), "--output", str(out),
              "--seq-len", "48", "--decontam-benchmark", bench2])
    assert r.returncode != 0
    assert "different inputs" in (r.stderr + r.stdout)
    r = _run("run_pack.py",
             ["--input", corpus, "--input-format", "parquet",
              "--tokenizer-model", str(model), "--output", str(out),
              "--seq-len", "48", "--decontam-benchmark", bench2,
              "--force"])
    assert r.returncode == 0, r.stderr[-2000:]
    pm2 = json.loads((out / "pack_meta.json").read_text())
    assert pm2["n_contaminated_dropped"] == 1
    assert pm2["benchmark"] != pm["benchmark"]


def test_route_weight_filter_refuses_uncovered_bucket(spark):
    """r9 (ADVICE r8 medium): a table bucket with no weight used to
    silently coalesce to keep-probability 0.0 (a typo'd --route-weights
    key dropped its real bucket wholesale); it now refuses loudly.
    Extra weight keys naming buckets the table lacks stay harmless
    (the default 3-bucket flag against a 2-bucket table)."""
    from pii_spark.spark.sampling import route_weight_filter

    docs = spark.createDataFrame(
        [Row(url=f"https://d/{i}", text=f"doc {i}") for i in range(10)]
    )
    route = spark.createDataFrame(
        [Row(url=f"https://d/{i}",
             ccnet_bucket="head" if i < 5 else "tail")
         for i in range(10)]
    )
    # typo'd key: 'tial' leaves the real 'tail' bucket uncovered
    with pytest.raises(ValueError, match="have no weight"):
        route_weight_filter(docs, route, {"head": 1.0, "tial": 0.0})
    # superset weights are fine: 'middle' gates nothing here
    got = route_weight_filter(
        docs, route, {"head": 1.0, "middle": 1.0, "tail": 0.0}
    ).collect()
    assert {r.url for r in got} == {f"https://d/{i}" for i in range(5)}


def test_pack_refuses_route_weights_drift(spark, tmp_path):
    """r9 (ADVICE r8 medium): re-exporting over an existing shard dir
    with different --route-weights used to pass the identity guard and
    silently change training membership; it now refuses without
    --force."""
    rows = _corpus_rows(8)
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(rows).write.parquet(corpus)
    model = tmp_path / "tok"
    r = _run("run_tokenizer.py",
             ["--input", corpus, "--model", str(model), "--merges", "6",
              "--text-col", "scrubbed_text"])
    assert r.returncode == 0, r.stderr[-2000:]
    kept = [x for x in rows if x.keep]
    route_dir = str(tmp_path / "route")
    spark.createDataFrame(
        [Row(url=x.url,
             ccnet_bucket="tail" if x.url.endswith("/0") else "head")
         for x in kept]
    ).write.parquet(route_dir)

    out = tmp_path / "shards"
    base = ["--input", corpus, "--input-format", "parquet",
            "--tokenizer-model", str(model), "--output", str(out),
            "--seq-len", "32", "--route-table", route_dir]
    r = _run("run_pack.py",
             base + ["--route-weights", "head=1.0,tail=0.0"])
    assert r.returncode == 0, r.stderr[-2000:]
    # same identities except the weights: must refuse
    r = _run("run_pack.py",
             base + ["--route-weights", "head=1.0,tail=1.0"])
    assert r.returncode != 0
    assert "different inputs" in (r.stderr + r.stdout)
    # and --force rewrites deliberately, recording the new weights
    r = _run("run_pack.py",
             base + ["--route-weights", "head=1.0,tail=1.0", "--force"])
    assert r.returncode == 0, r.stderr[-2000:]
    pm = json.loads((out / "pack_meta.json").read_text())
    assert pm["route_weights"] == {"head": 1.0, "tail": 1.0}
