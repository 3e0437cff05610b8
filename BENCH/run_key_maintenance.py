"""Measure the incremental key-maintenance economics (SURVEY R84):
at bench scale (50k-doc base, 10k-doc novel delta, local[32]),

  * full base_keys precompute over the base (the one-off),
  * append_key_delta over the delta (the NEW monthly step),
  * full base_keys recompute over base ∪ delta (the OLD monthly step
    the append replaces — grows with corpus size; the append doesn't).

Appends a "key_maintenance" record to BENCH/dedup_ops.json.
Run from the repo root:  python BENCH/run_key_maintenance.py [reps]
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
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("key_maintenance_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pii_spark.spark.gen_job import generate_corpus
    from pii_spark.spark.incr_dedup import append_key_delta, base_keys

    full = generate_corpus(spark, 60_000, partitions=cpus * 2) \
        .select("url", "text").cache()
    full.count()
    base = full.limit(0).unionByName(full).filter(
        "xxhash64(url) % 6 != 0")          # ~50k
    delta = full.filter("xxhash64(url) % 6 = 0")  # ~10k

    import shutil
    import tempfile

    rec = {"base_docs": base.count(), "delta_docs": delta.count()}
    pre_w, app_w, full_w = [], [], []
    for _ in range(reps):
        keys = tempfile.mkdtemp(prefix="keys_bench_")
        t0 = time.time()
        fp, sig = base_keys(base, id_col="url", hashed=True)
        fp.write.mode("overwrite").parquet(f"{keys}/fp.parquet")
        sig.write.mode("overwrite").parquet(f"{keys}/sig.parquet")
        pre_w.append(round(time.time() - t0, 2))
        Path(keys, "keys_meta.json").write_text(json.dumps(
            {"shingle_len": 12, "stride": 5, "bands": 4,
             "text_col": "text"}))

        t0 = time.time()
        n_fp, n_sig = append_key_delta(spark, delta, keys, id_col="url")
        app_w.append(round(time.time() - t0, 2))
        rec["appended"] = [n_fp, n_sig]

        t0 = time.time()
        fp2, sig2 = base_keys(full, id_col="url", hashed=True)
        out2 = tempfile.mkdtemp(prefix="keys_full_")
        fp2.write.mode("overwrite").parquet(f"{out2}/fp.parquet")
        sig2.write.mode("overwrite").parquet(f"{out2}/sig.parquet")
        full_w.append(round(time.time() - t0, 2))
        shutil.rmtree(keys), shutil.rmtree(out2)

    rec.update({
        "base_precompute_walls_sec": pre_w,
        "delta_append_walls_sec": app_w,
        "full_recompute_walls_sec": full_w,
        "note": (
            "the monthly step was full_recompute (cost grows with "
            "CORPUS size); it is now delta_append (cost grows with "
            "DELTA size: delta shingle explode + anti-join against "
            "the compact key tables). Measured honestly: at this "
            "check scale (base only 6x the delta, ~2s Spark floor on "
            "every job) the two are comparable — the separation is "
            "asymptotic, corpus >> snapshot; what the walls DO show "
            "is that append cost is bounded by delta work, and the "
            "equivalence test pins that the cheap path produces "
            "identical key sets."
        ),
    })
    path = ROOT / "BENCH" / "dedup_ops.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data["key_maintenance"] = rec
    path.write_text(json.dumps(data, indent=1))
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
