"""Dedup a crawl snapshot against the base corpus (SURVEY R78 as a
job): both tiers of `incremental_dedup` — exact fingerprint AND
MinHash band near-dup — joining the precomputed key tables from
`jobs/run_base_keys.py`. The base corpus itself is never read.

    spark-submit jobs/run_snapshot_dedup.py \
        --input /data/snapshot --keys /data/corpus_v3_keys \
        --output /data/snapshot_novel [--mode annotate]

``--mode filter`` (default) writes only the novel docs (the rows a
corpus-append job would ingest); ``--mode annotate`` writes every
snapshot row with its ``drop_stage`` (exact / near / NULL) for
inspection. The per-stage census is printed either way.

This is the full-strength batch tier; the quality jobs' lighter
``--recrawl-keys`` flag applies only the exact tier in-line (streaming-
safe). A monthly pipeline composes them: snapshot → THIS job (both
tiers) → run_quality over the novel remainder → run_base_keys over the
grown corpus for next month.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="snapshot corpus (parquet dir)")
    ap.add_argument("--keys", required=True,
                    help="jobs/run_base_keys.py output dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=["filter", "annotate"],
                    default="filter")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--shingle-len", type=int, default=12)
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument("--bands", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pii_spark.spark.incr_dedup import incremental_dedup
    from pii_spark.spark.session import get_spark

    spark = get_spark(app="pii_snapshot_dedup")
    try:
        keys = Path(args.keys)
        snap = spark.read.parquet(args.input)
        # the tier-2 join-back keys on id — NULL/duplicate ids would
        # silently mis-attribute stages (same loud validation as
        # run_dedup.py)
        idc = args.id_col
        n_null = snap.filter(F.col(idc).isNull()).count()
        if n_null:
            raise SystemExit(
                f"{n_null} rows have NULL {idc}; assign ids first"
            )
        n_dup = snap.groupBy(idc).count().filter("count > 1").count()
        if n_dup:
            raise SystemExit(
                f"{n_dup} {idc} values are duplicated; ids must be "
                "unique for stage attribution"
            )
        out = incremental_dedup(
            None,
            snap,
            id_col=idc,
            text_col=args.text_col,
            shingle_len=args.shingle_len,
            stride=args.stride,
            bands=args.bands,
            hashed=True,
            base_fp=spark.read.parquet(str(keys / "fp.parquet")),
            base_sig=spark.read.parquet(str(keys / "sig.parquet")),
        )
        if args.mode == "filter":
            out.filter(F.col("drop_stage").isNull()).drop(
                "drop_stage"
            ).write.mode("overwrite").parquet(args.output)
        else:
            out.write.mode("overwrite").parquet(args.output)
        # census from the committed output where possible, plus the
        # in-plan annotation for the filtered-away stages
        census = {
            (r.drop_stage or "kept"): r.n
            for r in out.groupBy("drop_stage")
            .agg(F.count("*").alias("n")).collect()
        }
        print(f"snapshot dedup census: {census} -> {args.output}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
