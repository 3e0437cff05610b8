"""Resumable pipeline job: partition-group commits + lineage audit.

The north rule requires a killed job to restart from the last committed
snapshot with no reprocessing and identical output. Mechanism:

  * the input is split into G deterministic groups by
    pmod(xxhash64(url), G) — a pure row-level function, independent of
    physical partitioning;
  * each group is processed and committed as ONE icelite snapshot whose
    summary records the group id (the snapshot log IS the ledger);
  * on restart, committed groups are skipped; because every stage is a
    pure function of the row (seeded RNG, no global state), the rerun
    groups produce byte-identical rows, so the final table is identical
    to an uninterrupted run;
  * per-(group, spark-partition) lineage rows — docs in/kept/dropped,
    spans scrubbed, wall time, snapshot id — are appended to an icelite
    ``audit`` table after each group commit.

At cluster scale G bounds the blast radius of a failure: work lost on a
kill is at most one group's worth.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..icelite.catalog import IceliteTable
from .pipeline import run_pipeline


def _backfill_missing_audit(spark, out: IceliteTable, audit: IceliteTable,
                            done: set, run_id: str) -> None:
    """ADVICE r1: a crash between the output commit and the audit
    append would permanently lose that group's lineage (the group is in
    committed_groups, so resume skips it). On every start, detect
    output-committed groups with no audit rows and backfill a
    reconciliation row (partition_id = -1) recomputed from the
    committed snapshot's own data files."""
    missing = done - audit.committed_groups()
    if not missing:
        return
    from ..schema import AUDIT

    by_group = {
        s.summary.get("group"): s
        for s in out.snapshots()
        if "group" in s.summary
    }
    for g in sorted(missing):
        snap = by_group.get(g)
        if snap is None:
            continue  # group's manifest was expired; stats unrecoverable
        parent_dirs = set()
        if snap.version > 1:
            parent = out.snapshot(snap.version - 1)
            if parent is None:
                # parent manifest expired: cannot attribute which data
                # dirs this commit added — skip rather than mis-count
                continue
            parent_dirs = set(parent.data_dirs)
        new_dirs = [d for d in snap.data_dirs if d not in parent_dirs]
        stats = (
            spark.read.parquet(*new_dirs)
            .agg(
                F.count("*").alias("docs_in"),
                F.sum(F.col("keep").cast("long")).alias("docs_kept"),
                F.sum(F.size("spans").cast("long")).alias("spans_scrubbed"),
            )
            .collect()[0]
        )
        adf = spark.createDataFrame(
            [(
                run_id, snap.snapshot_id, -1, [f"group={g}", "backfill"],
                int(stats.docs_in), int(stats.docs_kept or 0),
                int(stats.docs_in - (stats.docs_kept or 0)),
                int(stats.spans_scrubbed or 0), 0, None,
            )],
            schema=AUDIT,
        ).withColumn("committed_at", F.current_timestamp())
        audit.append(adf, summary={"group": g, "run_id": run_id,
                                   "backfill": True})


def run_quality_job(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    audit_dir: str,
    groups: int = 8,
    run_id: str | None = None,
    partitions: int | None = None,
    fail_after_groups: int | None = None,
) -> IceliteTable:
    """Run the quality+scrub pipeline over ``corpus`` with checkpointed
    group commits. ``fail_after_groups`` injects a crash for the resume
    test."""
    run_id = run_id or uuid.uuid4().hex[:12]
    out = IceliteTable(out_dir)
    audit = IceliteTable(audit_dir)
    done = out.committed_groups()
    _backfill_missing_audit(spark, out, audit, done, run_id)

    grp = F.pmod(F.xxhash64(F.col("url")), F.lit(groups))
    processed = 0
    for g in range(groups):
        if g in done:
            continue
        t0 = time.time()
        part = corpus.where(grp == g)
        result = run_pipeline(part, partitions=partitions).withColumn(
            "_pid", F.spark_partition_id()
        )
        result = result.cache()
        stats = (
            result.groupBy("_pid")
            .agg(
                F.count("*").alias("docs_in"),
                F.sum(F.col("keep").cast("long")).alias("docs_kept"),
                F.sum(F.size("spans").cast("long")).alias("spans_scrubbed"),
            )
            .collect()
        )
        snap = out.append(
            result.drop("_pid"), summary={"group": g, "run_id": run_id}
        )
        wall_ms = int((time.time() - t0) * 1000)
        audit_rows = [
            {
                "run_id": run_id,
                "snapshot_id": snap.snapshot_id,
                "partition_id": int(r["_pid"]),
                "input_files": [f"group={g}"],
                "docs_in": int(r["docs_in"]),
                "docs_kept": int(r["docs_kept"] or 0),
                "docs_dropped": int(r["docs_in"] - (r["docs_kept"] or 0)),
                "spans_scrubbed": int(r["spans_scrubbed"] or 0),
                "wall_ms": wall_ms,
            }
            for r in stats
        ]
        from ..schema import AUDIT

        adf = spark.createDataFrame(
            [
                (
                    a["run_id"], a["snapshot_id"], a["partition_id"],
                    a["input_files"], a["docs_in"], a["docs_kept"],
                    a["docs_dropped"], a["spans_scrubbed"], a["wall_ms"],
                    None,
                )
                for a in audit_rows
            ],
            schema=AUDIT,
        ).withColumn("committed_at", F.current_timestamp())
        audit.append(adf, summary={"group": g, "run_id": run_id})
        result.unpersist()
        processed += 1
        if fail_after_groups is not None and processed >= fail_after_groups:
            raise RuntimeError(
                f"injected failure after {processed} group commits"
            )
    return out
