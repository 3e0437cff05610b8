"""Streaming driver: availableNow + checkpoint gives exactly-once
file-level resume; batch and streaming outputs are byte-identical."""

from pii_spark.spark.gen_job import generate_corpus
from pii_spark.spark.pipeline import run_pipeline
from pii_spark.spark.streaming import run_streaming_job


def test_streaming_matches_batch_and_checkpoints(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    corpus = generate_corpus(spark, 120, partitions=4)
    corpus.write.parquet(corpus_dir)

    out = run_streaming_job(
        spark, corpus_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        max_files_per_trigger=2, partitions=4,
    )
    got = {
        r.url: (r.keep, r.scrubbed_text) for r in out.read(spark).collect()
    }
    assert len(got) == 120
    assert out.current_version() >= 2  # several micro-batch commits

    batch = {
        r.url: (r.keep, r.scrubbed_text)
        for r in run_pipeline(spark.read.parquet(corpus_dir),
                              partitions=4).collect()
    }
    assert got == batch  # streaming ≡ batch, byte-identical

    # re-run with the same checkpoint: nothing new to process
    v_before = out.current_version()
    out2 = run_streaming_job(
        spark, corpus_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        partitions=4,
    )
    assert out2.read(spark).count() == 120
    assert out2.current_version() == v_before  # no duplicate commits
