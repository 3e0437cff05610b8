"""Structured Streaming driver for the pipeline (SURVEY §2.9).

The batch pipeline is bounded, but the north rule's checkpoint-resume
requirement maps naturally onto Structured Streaming's own mechanism:
``readStream`` over the corpus directory + ``trigger(availableNow)`` +
``checkpointLocation`` gives exactly-once file-level progress tracking
for free — a killed run restarts from the last committed offset log and
never reprocesses a finished input file. This complements (and at file
granularity, subsumes) the icelite group ledger in jobs.py.

Every micro-batch runs the SAME run_pipeline plan via foreachBatch and
appends to an icelite table, so batch and streaming outputs are
byte-identical for identical inputs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..icelite.catalog import IceliteTable
from ..schema import CORPUS
from .pipeline import run_pipeline


def run_streaming_job(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    partitions: int | None = None,
) -> IceliteTable:
    """Process all currently-available corpus files exactly once."""
    out = IceliteTable(out_dir)

    reader = (
        spark.readStream.schema(CORPUS)
        .option("maxFilesPerTrigger", max_files_per_trigger or 8)
    )
    stream = reader.parquet(corpus_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        result = run_pipeline(batch_df, partitions=partitions)
        out.append(result, summary={"stream_batch": int(batch_id)})

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out
