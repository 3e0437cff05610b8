"""Train and persist the BPE tokenizer as a production artifact.

    spark-submit --py-files dist/pii_spark.zip \\
        jobs/run_tokenizer.py \\
        --input /data/corpus --model /data/tokenizer \\
        --merges 32000 [--sample-n 2000000] [--text-col scrubbed_text]

The model dir holds ``merges.parquet`` (rank, left, right — rank is
the encode priority) and ``meta.json`` (merge count, sample spec,
text column). Its content identity (`bpe_model_identity`) is recorded
by `jobs/run_pack.py` per export, so shards written under different
tokenizers can never silently mix (the classifier-model pattern).

``--sample-n`` draws a seeded uniform sample BEFORE the word census —
the composition every real tokenizer trainer uses (the census is the
only corpus-sized pass; the merge loop is census-sized, and a sampled
census fits the driver, where `train_bpe` auto-dispatches to the
byte-equal pure trainer).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="corpus dir (parquet, or a committed icelite "
                         "table with --input-format icelite)")
    ap.add_argument("--input-format", choices=["parquet", "icelite"],
                    default="parquet")
    ap.add_argument("--model", required=True, help="tokenizer model dir")
    ap.add_argument("--merges", type=int, required=True,
                    help="number of BPE merge rules to learn")
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="url",
                    help="sample permutation key (--sample-n)")
    ap.add_argument("--sample-n", type=int, default=None,
                    help="train on a seeded uniform sample of this "
                         "many docs instead of the full corpus")
    ap.add_argument("--sample-seed", type=int, default=42)
    args = ap.parse_args()

    from pii_spark.quality.bpe import save_bpe_model, train_bpe, word_census
    from pii_spark.spark.session import get_spark

    spark = get_spark(app="pii_tokenizer_train")
    try:
        if args.input_format == "icelite":
            from pii_spark.icelite.catalog import IceliteTable
            from pyspark.sql import functions as F

            corpus = IceliteTable(args.input).read(spark)
            if "keep" in corpus.columns:
                corpus = corpus.filter(F.col("keep"))
        else:
            corpus = spark.read.parquet(args.input)
        sample_spec = "full"
        if args.sample_n is not None:
            from pii_spark.spark.sampling import uniform_sample_n

            corpus = uniform_sample_n(
                corpus, args.sample_n, id_col=args.id_col,
                seed=args.sample_seed,
            )
            sample_spec = f"uniform:{args.sample_n}:seed{args.sample_seed}"
        census = word_census(corpus, text_col=args.text_col)
        merges = train_bpe(census, args.merges, min_count=args.min_count)
        save_bpe_model(
            spark, merges, args.model,
            extra_meta={"min_count": args.min_count,
                        "text_col": args.text_col,
                        "sample": sample_spec},
        )
        print(f"trained {len(merges)} merges "
              f"(requested {args.merges}) -> {args.model}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
