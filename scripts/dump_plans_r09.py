"""Dump .explain('formatted') for the bench-leg queries into
plans/r09/<name>_<tag>.txt (tag = before/after). Usage:

    python scripts/dump_plans_r09.py before [sf_dir]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = Path(__file__).resolve().parents[1] / "plans" / "r09"
OUT.mkdir(parents=True, exist_ok=True)


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from pii_spark.spark.gen_job import generate_corpus, generate_full
    from pii_spark.spark.metrics import entity_confusion, entity_rows
    from pii_spark.spark.pipeline import run_pipeline
    from pii_spark.spark.session import get_spark

    spark = get_spark(app="plan_dump", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name, df):
        p = OUT / f"{name}_{TAG}.txt"
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        p.write_text(plan)
        print(f"wrote {p} ({len(plan)} bytes)")

    dump("dedup_minhash", entry.q_dedup_minhash(spark, SF))
    dump("ann_cosine_topk", entry.q_ann_cosine_topk(spark, SF))
    dump("quality_heuristics", entry.q_quality_heuristics(spark, SF))

    corpus = generate_corpus(spark, 400, partitions=4)
    dump("pipeline", run_pipeline(corpus, partitions=8)
         .agg(F.sum(F.col("keep").cast("long")), F.sum(F.size("spans"))))

    full = generate_full(spark, 400).where("lang = 'en'")
    truth = full.select("doc_id", "text", "spans")
    pred = (
        run_pipeline(full, with_doc_id=True)
        .select("doc_id", "spans")
        .join(full.select("doc_id", "text"), "doc_id")
    )
    dump("f1_joins", entity_confusion(entity_rows(truth), entity_rows(pred)))
    spark.stop()


if __name__ == "__main__":
    main()
