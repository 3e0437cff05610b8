"""spark-submit entry point for corpus deduplication.

    spark-submit --py-files dist/pii_spark.zip \\
        jobs/run_dedup.py \\
        --input  /path/to/corpus_parquet \\
        --output /path/to/out_table \\
        --stages exact,paragraph,substring \\
        [--k 50] [--id-col doc_id] [--text-col text]

Stages run in the order given, each feeding the next:

  exact      drop full-document duplicates (hash groupBy; the
             deterministic winner is the min id, matching the
             catalog's dedup convention)
  paragraph  keep-first paragraph dedup (Dolma semantics,
             pii_spark/spark/para_dedup.py) — rewrites text
  substring  duplicate >=k-token span removal (Lee et al. 2022,
             pii_spark/spark/substr_dedup.py, xxhash64 census) —
             rewrites text

The output is an icelite table whose snapshot summary records the
stage chain and per-stage row/char deltas — the audit trail a corpus
rewrite needs. This is a one-shot job (the censuses are corpus-global,
so there is no partial-group resume; rerun idempotently overwrites).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STAGES = ("exact", "paragraph", "substring")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--stages", default="exact,paragraph,substring")
    ap.add_argument("--k", type=int, default=50,
                    help="min duplicated span length in tokens "
                         "(substring stage)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    bad = [s for s in stages if s not in STAGES]
    if bad:
        ap.error(f"unknown stage(s) {bad}; valid: {STAGES}")

    from pyspark.sql import functions as F

    from pii_spark.icelite.catalog import IceliteTable
    from pii_spark.spark.session import get_spark

    spark = get_spark(app="pii_dedup_job")
    try:
        df = spark.read.parquet(args.input)
        idc, txc = args.id_col, args.text_col
        deltas: dict = {}

        def stats(frame):
            r = frame.agg(
                F.count("*").alias("rows"),
                F.sum(F.length(F.coalesce(F.col(txc), F.lit(""))))
                .alias("chars"),
            ).collect()[0]
            return int(r.rows), int(r.chars or 0)

        rows, chars = stats(df)
        for s in stages:
            if s == "exact":
                from pyspark.sql import Window

                w = Window.partitionBy(F.md5(F.coalesce(
                    F.col(txc), F.lit("")))).orderBy(idc)
                df = (
                    df.withColumn("_rn", F.row_number().over(w))
                    .filter("_rn = 1").drop("_rn")
                )
            elif s == "paragraph":
                from pii_spark.spark.para_dedup import paragraph_dedup

                cleaned = paragraph_dedup(
                    df, id_col=idc, text_col=txc
                ).select(idc, F.col("cleaned_text").alias(txc))
                df = df.drop(txc).join(cleaned, idc)
            elif s == "substring":
                from pii_spark.spark.substr_dedup import substring_dedup

                cleaned = substring_dedup(
                    df, id_col=idc, text_col=txc, k=args.k, hashed=True
                ).select(idc, F.col("cleaned_text").alias(txc))
                df = df.drop(txc).join(cleaned, idc)
            # per-stage delta: forces the stage (each census is a
            # corpus-global barrier anyway) and records the audit row
            r2, c2 = stats(df)
            deltas[s] = {"rows": rows - r2, "chars": chars - c2}
            rows, chars = r2, c2

        out = IceliteTable(args.output)
        snap = out.overwrite(
            df,
            summary={"dedup_stages": ",".join(stages), "k": args.k,
                     **{f"removed_{s}_{m}": v
                        for s, d in deltas.items()
                        for m, v in d.items()}},
        )
        print(
            f"committed snapshot v{snap.version}: {rows} rows, "
            f"{chars} chars; removed per stage: {deltas}"
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
