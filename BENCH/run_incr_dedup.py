"""Time incremental snapshot-vs-base dedup (SURVEY R78/R79) at bench
scale and append to BENCH/dedup_ops.json.

Shape mirrors the production workflow so the numbers decompose the way
the cost does at 100 TB:

  * PRECOMPUTE (amortized, once per corpus version): base_keys over
    the 50k-doc generated corpus, materialized to parquet — the
    fingerprint census + the shingle-explode band-min census.
  * PER-SNAPSHOT (the monthly marginal cost): incremental_dedup over a
    10k-doc snapshot (5k byte-identical recrawls of base docs under
    new ids + 5k fresh docs from a different seed) joining the
    PRE-READ key tables — the corpus is never rescanned.

Run from the repo root:  python BENCH/run_incr_dedup.py [reps]
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    os.chdir(ROOT)
    from pyspark.sql import SparkSession, functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("incr_dedup_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pii_spark.spark.gen_job import generate_corpus
    from pii_spark.spark.incr_dedup import base_keys, incremental_dedup

    base = (
        generate_corpus(spark, 50_000, partitions=cpus * 2)
        .select("doc_id", "text").cache()
    )
    n_base = base.count()
    snap = (
        base.filter(F.col("doc_id") % 10 == 0)
        .limit(5_000)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        .unionByName(
            generate_corpus(spark, 5_000, seed=7)
            .select(
                (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
                "text",
            )
        )
        .cache()
    )
    n_snap = snap.count()

    import tempfile

    keys_dir = Path(tempfile.mkdtemp(prefix="incr_keys_"))
    pre_walls, snap_walls, census = [], [], None
    for _ in range(reps):
        t0 = time.time()
        fp, sig = base_keys(base, hashed=True)
        fp.write.mode("overwrite").parquet(str(keys_dir / "fp.parquet"))
        sig.write.mode("overwrite").parquet(str(keys_dir / "sig.parquet"))
        pre_walls.append(round(time.time() - t0, 2))

        fp_df = spark.read.parquet(str(keys_dir / "fp.parquet"))
        sig_df = spark.read.parquet(str(keys_dir / "sig.parquet"))
        t0 = time.time()
        out = incremental_dedup(
            None, snap, base_fp=fp_df, base_sig=sig_df, hashed=True
        )
        census = {
            (r.drop_stage or "kept"): r.n
            for r in out.groupBy("drop_stage")
            .agg(F.count("*").alias("n")).collect()
        }
        snap_walls.append(round(time.time() - t0, 2))

    load = round(os.getloadavg()[0], 2)
    path = ROOT / "BENCH" / "dedup_ops.json"
    doc = json.loads(path.read_text())
    doc["incremental_dedup_50k_base_10k_snap"] = {
        "precompute_walls_sec": pre_walls,
        "per_snapshot_walls_sec": snap_walls,
        "n_base": n_base,
        "n_snap": n_snap,
        "census": census,
        "load_at_end": load,
        "note": (
            "precompute = base_keys (fingerprint census + shingle "
            "band-min census) materialized to parquet, paid once per "
            "corpus version; per-snapshot = the monthly marginal cost "
            "joining the pre-read key tables — the base corpus is "
            "never rescanned. 5k of the 10k snapshot docs are planted "
            "byte-identical recrawls (expect census.exact ~5k)."
        ),
    }
    doc["timestamp"] = time.strftime("%Y-%m-%d %H:%M")
    path.write_text(json.dumps(doc, indent=2))
    print(json.dumps(doc["incremental_dedup_50k_base_10k_snap"]))
    spark.stop()


if __name__ == "__main__":
    main()
