"""Skew evidence (north rule: explicit salted-key repartitioning to
defuse domain skew) — measured, not asserted.

The generated corpus is domain-skewed by construction (one hot domain
~30% of rows, FIXTURES.md §1). This script runs the SAME pipeline UDF
leg twice over the same cached corpus:

  * domain-keyed: repartition(P, domain) — what a naive "group by site"
    layout does; the hot domain lands in one partition and its task
    serializes ~30% of all compute
  * salted: salted_repartition(P) — xxhash64(url, salt), the pipeline's
    actual strategy

and writes BENCH/skew.json with per-partition row spread + wall times.

    python BENCH/run_skew.py [n_docs] [partitions]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main(n_docs: int = 20_000, partitions: int = 16) -> None:
    from pyspark.sql import functions as F

    from pii_spark.spark.gen_job import generate_corpus
    from pii_spark.spark.pipeline import enrich_udf, salted_repartition
    from pii_spark.spark.session import get_spark

    spark = get_spark(app="pii_skew", master="local[16]",
                      shuffle_partitions=partitions)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = generate_corpus(spark, n_docs, partitions=32).cache()
    corpus.count()
    domain = F.regexp_extract("url", r"https://([^/]+)/", 1)

    def run(df):
        t0 = time.time()
        (df.withColumn("e", enrich_udf()(F.col("text")))
         .agg(F.sum(F.size("e.spans"))).collect())
        return round(time.time() - t0, 2)

    def spread(df):
        rows = (df.withColumn("pid", F.spark_partition_id())
                .groupBy("pid").count().collect())
        counts = [r["count"] for r in rows]
        return {
            "n_partitions": len(counts),
            "max_share": round(max(counts) / sum(counts), 4),
            "ideal_share": round(1 / partitions, 4),
        }

    domain_df = corpus.repartition(partitions, domain)
    salted_df = salted_repartition(corpus, partitions)

    # warm workers + caches on a throwaway pass
    run(salted_repartition(corpus.limit(4000), partitions))

    report = {
        "n_docs": n_docs,
        "partitions": partitions,
        "domain_keyed": {"spread": spread(domain_df),
                         "wall_sec": run(domain_df)},
        "salted": {"spread": spread(salted_df),
                   "wall_sec": run(salted_df)},
    }
    report["salting_speedup"] = round(
        report["domain_keyed"]["wall_sec"] / report["salted"]["wall_sec"], 2
    )
    print(json.dumps(report))
    (ROOT / "BENCH" / "skew.json").write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
