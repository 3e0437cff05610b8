"""Export the curated corpus as packed training shards — the last
mile of the training-data pipeline (VERDICT r7 #1).

    spark-submit --py-files dist/pii_spark.zip \\
        jobs/run_pack.py \\
        --input /data/quality_table --tokenizer-model /data/tokenizer \\
        --output /data/shards --seq-len 2048 \\
        [--route-table /data/routing \\
         --route-weights head=1.0,middle=0.5,tail=0.0]

Chain: read the committed quality table (keep rows only) → optionally
apply the CCNet routing table (per-bucket deterministic down-weighting
— the `--route-buckets` consumer, VERDICT r7 missing #2) → optionally
drop benchmark-contaminated docs (``--decontam-benchmark``: winnowed
fingerprints of the eval set broadcast against the corpus — the
r8 production consumer of spark/decontam.py; contamination must be
removed at EXPORT time or eval scores silently inflate) → BPE-encode
the scrubbed text with the persisted tokenizer → two-phase prefix-sum
packing → write ``shards.parquet`` (seq_id, tokens; every sequence
except the last exactly ``--seq-len`` tokens) + ``pack_meta.json``.

Identity guard: the tokenizer's, routing table's, and benchmark set's
content identities (and the packing geometry) are recorded in
pack_meta.json; re-exporting over an existing shard dir under
DIFFERENT inputs refuses loudly unless ``--force`` — shards from two
token universes must never mix (the classifier/recrawl-keys
drift-guard class).

Concatenation order: docs are ordered by ``xxhash64(id)`` — a
deterministic shuffle, which is exactly what a pretraining shard
writer wants (sequential crawl order would correlate neighbors).
Duplicate ids are refused loudly by ``pack_offsets``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _parse_weights(spec: str) -> dict:
    out: dict = {}
    for part in spec.split(","):
        name, _, val = part.partition("=")
        if not name or not val:
            raise SystemExit(
                f"bad --route-weights entry {part!r}; expected "
                "bucket=weight[,bucket=weight...]"
            )
        out[name.strip()] = float(val)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="committed quality table (icelite dir) or a "
                         "parquet dir with --input-format parquet")
    ap.add_argument("--input-format", choices=["icelite", "parquet"],
                    default="icelite")
    ap.add_argument("--tokenizer-model", required=True,
                    help="jobs/run_tokenizer.py model dir")
    ap.add_argument("--output", required=True, help="shard dir")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--text-col", default="scrubbed_text")
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--n-buckets", type=int, default=1024,
                    help="prefix-sum bucket count (per-sort-task bound)")
    ap.add_argument("--route-table", default=None,
                    help="run_maintenance.py --route-buckets output: "
                         "only routed docs export, down-weighted per "
                         "--route-weights")
    ap.add_argument("--route-weights", default="head=1.0,middle=1.0,tail=0.0",
                    help="bucket=keep-probability list (CCNet default: "
                         "keep head+middle, drop tail)")
    ap.add_argument("--decontam-benchmark", default=None,
                    help="benchmark/eval parquet dir (any schema with "
                         "a text column): docs sharing winnowed "
                         "fingerprints with it are dropped before "
                         "packing")
    ap.add_argument("--decontam-min-shared", type=int, default=2,
                    help="shared-fingerprint threshold (1 shared "
                         "8-gram minimum can be coincidence; 2 almost "
                         "never is)")
    ap.add_argument("--force", action="store_true",
                    help="rewrite shards even under changed input "
                         "identities")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pii_spark.quality.bpe import (
        bpe_model_identity,
        bpe_tokenize,
        load_bpe_model,
    )
    from pii_spark.spark.packing import pack_sequences
    from pii_spark.spark.session import get_spark

    tok_id = bpe_model_identity(args.tokenizer_model)
    route_id = "none"
    weights = None
    if args.route_table is not None:
        from pii_spark.spark.sampling import route_table_identity

        route_id = route_table_identity(args.route_table)
        weights = _parse_weights(args.route_weights)
    bench_id = "none"
    if args.decontam_benchmark is not None:
        from pii_spark.spark.decontam import benchmark_identity

        bench_id = (f"{benchmark_identity(args.decontam_benchmark)}"
                    f":{args.decontam_min_shared}")

    out_dir = Path(args.output)
    meta_path = out_dir / "pack_meta.json"
    # r9 (ADVICE r8 medium): route_weights / id_col / n_buckets are part
    # of training-set membership identity — re-exporting with different
    # weights (tail=0.0 -> 1.0) used to pass the guard and silently
    # change membership, exactly the drift class the guard refuses.
    current = {"tokenizer": tok_id, "route_table": route_id,
               "benchmark": bench_id,
               "seq_len": args.seq_len, "text_col": args.text_col,
               "route_weights": weights, "id_col": args.id_col,
               "n_buckets": args.n_buckets}
    if meta_path.exists() and not args.force:
        prev = json.loads(meta_path.read_text())
        stale = {k: (prev.get(k), v) for k, v in current.items()
                 if prev.get(k) != v}
        if stale:
            raise SystemExit(
                f"shard dir {args.output} was written under different "
                f"inputs ({stale}) — rewriting would silently change "
                "the token universe / membership; pass --force to "
                "rewrite deliberately"
            )

    spark = get_spark(app="pii_pack_export")
    try:
        if args.input_format == "icelite":
            from pii_spark.icelite.catalog import IceliteTable

            df = IceliteTable(args.input).read(spark)
        else:
            df = spark.read.parquet(args.input)
        if "keep" in df.columns:
            df = df.filter(F.col("keep"))
        if args.route_table is not None:
            from pii_spark.spark.sampling import route_weight_filter

            route = spark.read.parquet(args.route_table)
            df = route_weight_filter(
                df, route, weights, id_col=args.id_col
            )
        n_contaminated = 0
        if args.decontam_benchmark is not None:
            from pii_spark.spark.decontam import decontaminate

            bench = spark.read.parquet(args.decontam_benchmark)
            if "text" not in bench.columns:
                raise SystemExit(
                    f"--decontam-benchmark {args.decontam_benchmark} "
                    "has no 'text' column"
                )
            bench = bench.select(
                F.xxhash64("text").alias("doc_id"), "text"
            )
            flags = decontaminate(
                df.select(F.col(args.id_col).alias("doc_id"),
                          F.col(args.text_col).alias("text")),
                bench, min_shared=args.decontam_min_shared,
            )
            # contaminated-first then anti-join (decontam.py docstring:
            # anti-joining the whole flag relation would also drop
            # clean docs sharing one coincidental fingerprint)
            bad = flags.filter("contaminated").select(
                F.col("doc_id").alias(args.id_col)
            )
            n_contaminated = bad.count()
            # r9 (VERDICT r8 #3): contamination is rare by nature, but
            # an adversarial benchmark overlapping most of the corpus
            # would make this broadcast corpus-sized — match the repo's
            # "bounded by construction or refuse" standard with a row
            # bound, falling back to the shuffle anti-join (correct at
            # any size, just one more exchange) past it.
            if n_contaminated <= 5_000_000:
                df = df.join(F.broadcast(bad), args.id_col, "left_anti")
            else:
                df = df.join(bad, args.id_col, "left_anti")
        merges, tok_meta = load_bpe_model(spark, args.tokenizer_model)
        tok = bpe_tokenize(df, merges, text_col=args.text_col)
        # deterministic shuffle order; collisions/dup urls refuse loudly
        keyed = tok.withColumn("_pack_id", F.xxhash64(F.col(args.id_col)))
        seqs = pack_sequences(
            keyed, args.seq_len, id_col="_pack_id",
            tokens_col="bpe_tokens", n_buckets=args.n_buckets,
        )
        shards_path = str(out_dir / "shards.parquet")
        # r9 (ADVICE r8 low): drop the old meta BEFORE overwriting the
        # shards — a crash between shard overwrite and meta rewrite
        # used to leave NEW shards beside a STALE meta describing the
        # previous tokenizer/route/benchmark identities. A meta-less
        # shard dir is detectably incomplete; a mismatched one lies.
        if meta_path.exists():
            meta_path.unlink()
        seqs.write.mode("overwrite").parquet(shards_path)

        stats = (
            spark.read.parquet(shards_path)
            .agg(
                F.count("*").alias("n_sequences"),
                F.sum(F.size("tokens")).alias("total_tokens"),
                F.sum((F.size("tokens") == args.seq_len).cast("long"))
                .alias("full_sequences"),
            )
            .collect()[0]
        )
        out_dir.mkdir(parents=True, exist_ok=True)
        meta_path.write_text(json.dumps(
            {**current,
             "n_merges": int(tok_meta.get("n_merges", len(merges))),
             "route_weights": weights,
             "n_contaminated_dropped": int(n_contaminated),
             "n_sequences": int(stats.n_sequences or 0),
             "total_tokens": int(stats.total_tokens or 0),
             "full_sequences": int(stats.full_sequences or 0)},
            indent=1,
        ))
        print(f"packed {stats.total_tokens or 0} tokens into "
              f"{stats.n_sequences or 0} sequences "
              f"({stats.full_sequences or 0} full at {args.seq_len}) "
              f"-> {args.output}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
