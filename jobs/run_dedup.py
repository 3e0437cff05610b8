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
  semantic   SemDeDup (Abbas et al. 2023, pii_spark/spark/semdedup.py):
             embed surviving docs with the deterministic hashed-3-gram
             embedder, k-means-cluster the vectors, drop within-cluster
             cosine near-duplicates (keep = lowest id). Put it AFTER
             exact/paragraph/substring — the lexical tiers are cheaper
             per doc and shrink the embedding work. k is auto-sized as
             ceil(rows / --sem-cluster-size), clamped to
             --sem-max-clusters (the k actually used is recorded in
             the audit summary, never silently). At-scale shape is the
             paper's: centroids fit on a deterministic hash-sample
             (--sem-fit-sample) with one-pass 'hash' seeding
             (--sem-init), then ONE broadcast-assign pass over the
             corpus — the big relation never enters the Lloyd loop.

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

STAGES = ("exact", "paragraph", "substring", "semantic")


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
    ap.add_argument("--sem-tau", type=float, default=0.92,
                    help="semantic stage: within-cluster cosine "
                         "threshold for a drop")
    ap.add_argument("--sem-dim", type=int, default=64,
                    help="semantic stage: hashed-3-gram embedding dim")
    ap.add_argument("--sem-iters", type=int, default=5,
                    help="semantic stage: Lloyd iterations")
    ap.add_argument("--sem-clusters", type=int, default=0,
                    help="semantic stage: explicit k (0 = auto from "
                         "--sem-cluster-size, clamped)")
    ap.add_argument("--sem-cluster-size", type=int, default=512,
                    help="semantic stage: target docs per cluster when "
                         "k is auto-sized")
    ap.add_argument("--sem-max-clusters", type=int, default=256,
                    help="semantic stage: auto-k clamp (the farthest "
                         "init is one driver pass per cluster; see "
                         "--sem-init hash)")
    ap.add_argument("--sem-init", default="hash",
                    choices=("hash", "farthest"),
                    help="semantic stage: k-means seeding — 'hash' is "
                         "one pass for any k (the at-scale default), "
                         "'farthest' spreads seeds best but costs one "
                         "pass per cluster")
    ap.add_argument("--sem-pairs", default="blas",
                    choices=("blas", "join"),
                    help="semantic stage: within-cluster pair engine "
                         "— 'blas' is one gram matrix per cluster "
                         "task (identical decisions, pinned; the "
                         "speed path), 'join' is the exploded SQL "
                         "self-join (no per-task memory footprint)")
    ap.add_argument("--sem-fit-sample", type=int, default=100_000,
                    help="semantic stage: fit centroids on a "
                         "deterministic hash-sample of ~this many "
                         "docs, then broadcast-assign everyone "
                         "(SemDeDup's at-scale composition); 0 fits "
                         "on the full corpus")
    args = ap.parse_args()
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    bad = [s for s in stages if s not in STAGES]
    if bad:
        ap.error(f"unknown stage(s) {bad}; valid: {STAGES}")
    if len(set(stages)) != len(stages):
        # the audit summary keys by stage name; a repeated stage would
        # silently overwrite its first occurrence's delta (review r5b).
        # Re-running a stage is a second job run, not a chain entry.
        ap.error("stages must be unique; rerun the job for a second "
                 "pass of the same stage")

    from pyspark.sql import functions as F

    from pii_spark.icelite.catalog import IceliteTable
    from pii_spark.spark.session import get_spark

    spark = get_spark(app="pii_dedup_job")
    try:
        df = spark.read.parquet(args.input)
        idc, txc = args.id_col, args.text_col
        # a rewrite job must not silently lose or multiply rows: the
        # stage join-backs key on id, so NULL ids would vanish (NULL
        # never equi-joins) and duplicate ids would multiply (review
        # r5b). Validate loudly up front — two id-column aggregates.
        n_null = df.filter(F.col(idc).isNull()).count()
        if n_null:
            raise SystemExit(
                f"{n_null} rows have NULL {idc}; assign ids first"
            )
        n_dup = (
            df.groupBy(idc).count().filter("count > 1").count()
        )
        if n_dup:
            raise SystemExit(
                f"{n_dup} {idc} values are duplicated; ids must be "
                "unique for a corpus rewrite"
            )
        if "semantic" in stages:
            # the embedder keys vectors on an int64 vec_id cast from the
            # id column — refuse a non-integral id BEFORE any stage
            # rewrites anything, not mid-chain
            dt = dict(df.dtypes)[idc]
            if dt not in ("tinyint", "smallint", "int", "bigint"):
                raise SystemExit(
                    f"semantic stage requires an integral {idc} "
                    f"(got {dt}): embeddings key on int64 vec_id"
                )
            if not (0.0 < args.sem_tau <= 1.0):
                raise SystemExit(
                    f"--sem-tau must be in (0, 1], got {args.sem_tau}"
                )
            for knob in ("sem_dim", "sem_iters", "sem_cluster_size",
                         "sem_max_clusters"):
                if getattr(args, knob) < 1:
                    raise SystemExit(
                        f"--{knob.replace('_', '-')} must be >= 1, "
                        f"got {getattr(args, knob)}"
                    )
            if args.sem_fit_sample < 0 or args.sem_clusters < 0:
                raise SystemExit(
                    "--sem-fit-sample / --sem-clusters must be >= 0"
                )
        deltas: dict = {}
        extra_summary: dict = {}

        def stats(frame):
            r = frame.agg(
                F.count("*").alias("rows"),
                F.sum(F.length(F.coalesce(F.col(txc), F.lit(""))))
                .alias("chars"),
            ).collect()[0]
            return int(r.rows), int(r.chars or 0)

        rows, chars = stats(df)
        prev = None
        for s in stages:
            release: list = []
            if s == "exact":
                # skew-safe winner selection: groupBy + min partial-
                # aggregates map-side, so a viral page duplicated 10^8
                # times combines to one row per partition instead of
                # colocating every copy on one window reducer (review
                # r5b — same reasoning as para_dedup's census)
                h = F.md5(F.coalesce(F.col(txc), F.lit("")))
                keep_ids = (
                    df.select(h.alias("_h"), F.col(idc).alias("_i"))
                    .groupBy("_h")
                    .agg(F.min("_i").alias(idc))
                    .select(idc)
                )
                df = df.join(keep_ids, idc, "left_semi")
            elif s == "paragraph":
                from pii_spark.spark.para_dedup import paragraph_dedup

                cleaned = paragraph_dedup(
                    df, id_col=idc, text_col=txc
                ).select(idc, F.col("cleaned_text").alias(txc))
                df = df.drop(txc).join(cleaned, idc)
            elif s == "substring":
                from pii_spark.spark.substr_dedup import substring_dedup

                # replace text ONLY where a span was actually removed:
                # substring_dedup reassembles tokens with single
                # spaces, and rewriting untouched docs would destroy
                # their original whitespace corpus-wide and inflate
                # the chars audit with whitespace collapse (review
                # r5b). Touched docs do get token-joined text — the
                # documented contract of the operator.
                ss = substring_dedup(
                    df, id_col=idc, text_col=txc, k=args.k, hashed=True
                ).select(idc, "cleaned_text", "n_removed_tokens")
                df = (
                    df.join(ss, idc)
                    .withColumn(
                        txc,
                        F.when(
                            F.col("n_removed_tokens") > 0,
                            F.col("cleaned_text"),
                        ).otherwise(F.col(txc)),
                    )
                    .drop("cleaned_text", "n_removed_tokens")
                )
            elif s == "semantic":
                if rows == 0:
                    deltas[s] = {"rows": 0, "chars": 0}
                    continue
                from pii_spark.spark.embed import embed_documents
                from pii_spark.spark.semdedup import semdedup

                # r9 (VERDICT r8 #1): auto_k raises the
                # --sem-max-clusters clamp back up when it would push
                # the average blas block past the per-task memory
                # budget (the old defaults OOMed at 10M docs before
                # the block guard could refuse); an explicit
                # --sem-clusters stays the operator's choice, with the
                # in-task refusal as the backstop.
                from pii_spark.spark.semdedup import auto_k

                k_sem = args.sem_clusters or auto_k(
                    rows, args.sem_cluster_size, args.sem_max_clusters,
                    pairs=args.sem_pairs,
                )
                k_sem = max(1, min(k_sem, rows))
                emb = embed_documents(
                    df, dim=args.sem_dim, id_col=idc, text_col=txc
                )
                # the k-means fit iterates and self-joins over this
                # frame, embedding its logical plan MANY times into the
                # fit's trees; persist does NOT truncate the plan, so
                # after paragraph/substring the optimizer re-analyzes
                # the whole upstream census chain per iteration and the
                # driver heap blows up (measured: heap OOM on the
                # 4-stage chain at 6 docs). Checkpoint eagerly — the
                # blocked relation is only (vec_id, dim floats), never
                # the text table.
                emb = emb.localCheckpoint(eager=True)
                fit_df = None
                if 0 < args.sem_fit_sample < rows:
                    # deterministic Bernoulli-by-hash sample: one
                    # filter scan, no global sort — approximate size
                    # is fine for a centroid fit. xxhash64 of the id,
                    # NOT of the text: re-sampling is stable across
                    # text rewrites by earlier stages. 2^30 modulus +
                    # a floor of 1: an int() of frac*granularity would
                    # truncate to 0 past rows > granularity*sample and
                    # silently run the full-corpus fit the flag exists
                    # to avoid (review r8b).
                    mod = 1 << 30
                    thr = max(1, int(args.sem_fit_sample / rows * mod))
                    fit_df = emb.filter(
                        F.pmod(F.xxhash64(F.col("vec_id")),
                               F.lit(mod)) < F.lit(thr)
                    )
                    if fit_df.isEmpty():
                        fit_df = None  # tiny corpus: fit on everything
                dec, cents = semdedup(
                    emb, k=k_sem, iters=args.sem_iters,
                    tau=args.sem_tau, fit_df=fit_df,
                    init=args.sem_init, pairs=args.sem_pairs,
                )
                keep = dec.filter("keep").select(
                    F.col("vec_id").alias(idc)
                )
                df = df.join(keep, idc, "left_semi")
                # dec/cents are cached inside semdedup; they back this
                # stage's lazy semi-join, so they are released only
                # AFTER the stats action below materializes df
                release += [dec, cents]
                extra_summary.update(
                    sem_k=k_sem, sem_tau=args.sem_tau,
                    sem_dim=args.sem_dim, sem_init=args.sem_init,
                    sem_pairs=args.sem_pairs,
                    sem_fit_sampled=bool(fit_df is not None),
                )
            # persist each stage before its stats action: without it,
            # every stats() and the final overwrite would re-execute
            # the whole upstream chain — with 3 stages the first
            # census would run 4x (review r5b)
            df = df.persist()
            r2, c2 = stats(df)
            if prev is not None:
                prev.unpersist()
            for fr in release:
                fr.unpersist()
            prev = df
            deltas[s] = {"rows": rows - r2, "chars": chars - c2}
            rows, chars = r2, c2

        out = IceliteTable(args.output)
        snap = out.overwrite(
            df,
            summary={"dedup_stages": ",".join(stages), "k": args.k,
                     **extra_summary,
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
