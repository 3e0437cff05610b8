"""Per-leg micro-bench harness for the optimization round (guide §1.4).

NOT the driver bench — bench.py is frozen for measurement. This file
exists to A/B single legs quickly with reps, using the same session
config and data as bench.py. Usage:

    python bench_extra.py minhash ann quality            # quick legs
    python bench_extra.py pipeline f1_joins              # UDF legs
    SPARK_GRAFT_REPS=5 python bench_extra.py minhash

Prints per-leg seconds for every rep plus min/median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
_N_BY_SF = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 50_000}


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from pii_spark.spark.gen_job import generate_corpus, generate_full
    from pii_spark.spark.metrics import entity_confusion, entity_rows
    from pii_spark.spark.pipeline import run_pipeline
    from pii_spark.spark.session import get_spark

    legs = sys.argv[1:] or ["minhash", "ann_topk", "quality"]
    sf_name = Path(SF_DIR).name
    n_docs = _N_BY_SF.get(sf_name, 50_000)

    spark = get_spark(app="pii_spark_bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    def _steal() -> int:
        try:
            with open("/proc/stat") as fh:
                return int(fh.readline().split()[8])
        except (OSError, IndexError, ValueError):
            return 0

    results: dict[str, dict] = {}

    def timed(name, fn, warm_fn=None):
        if warm_fn:
            warm_fn()
        samples, steals = [], []
        for _ in range(REPS):
            s0, t0 = _steal(), time.time()
            fn()
            wall = time.time() - t0
            samples.append(round(wall, 3))
            steals.append(round((_steal() - s0) / 100.0 / wall, 3))
        results[name] = {
            "samples": samples, "stolen": steals,
            "min": min(samples), "median": statistics.median(samples),
        }
        print(name, json.dumps(results[name]), flush=True)

    corpus = None
    if "pipeline" in legs:
        corpus = generate_corpus(spark, n_docs, partitions=CPUS * 2).cache()
        corpus.count()
        warm = generate_corpus(spark, 8_000, partitions=CPUS * 2)
        run_pipeline(warm).agg(F.count("*")).collect()
        timed("pipeline", lambda: run_pipeline(corpus, partitions=CPUS * 2)
              .agg(F.sum(F.col("keep").cast("long")), F.sum(F.size("spans")))
              .collect())
    if "minhash" in legs:
        timed("minhash",
              lambda: entry.q_dedup_minhash(spark, SF_DIR).collect(),
              warm_fn=lambda: entry.q_dedup_minhash(spark, SF_DIR).collect())
    if "ann_topk" in legs:
        timed("ann_topk",
              lambda: entry.q_ann_cosine_topk(spark, SF_DIR).collect(),
              warm_fn=lambda: entry.q_ann_cosine_topk(spark, SF_DIR).collect())
    if "quality" in legs:
        timed("quality",
              lambda: entry.q_quality_heuristics(spark, SF_DIR).collect(),
              warm_fn=lambda: entry.q_quality_heuristics(spark, SF_DIR)
              .collect())
    if "f1_joins" in legs:
        if corpus is None:
            warm = generate_corpus(spark, 2_000, partitions=CPUS * 2)
            run_pipeline(warm).agg(F.count("*")).collect()

        def f1_joins():
            full = generate_full(spark, 2_000).where("lang = 'en'").cache()
            truth = full.select("doc_id", "text", "spans")
            pred = (
                run_pipeline(full, with_doc_id=True)
                .select("doc_id", "spans")
                .join(full.select("doc_id", "text"), "doc_id")
            )
            entity_confusion(entity_rows(truth), entity_rows(pred)).collect()
            full.unpersist()

        timed("f1_joins", f1_joins)

    print(json.dumps({k: v["min"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
