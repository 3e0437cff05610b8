"""Measure the SemDeDup semantic tier over bench.py's 50k-doc
generated corpus (local[32]): deterministic embedding, the production
composition (hash-sample fit -> one-pass hash seeding -> broadcast
assign -> per-cluster pair blocks), and BOTH pair engines — the
gram-matrix applyInPandas path vs the exploded SQL self-join — plus
the init-cost comparison (farthest = one driver pass PER seed vs hash
= one pass total). Appends a "semdedup_r8" record to
BENCH/dedup_ops.json.

Run from the repo root:  python BENCH/run_semdedup.py
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    os.chdir(ROOT)
    from pyspark.sql import SparkSession, functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("semdedup_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pii_spark.spark.embed import embed_documents
    from pii_spark.spark.gen_job import generate_corpus
    from pii_spark.spark.kmeans import kmeans_fit
    from pii_spark.spark.semdedup import semdedup

    n_docs, dim, fit_sample, cluster_size = 50_000, 64, 5_000, 512
    k = min(256, -(-n_docs // cluster_size))

    corpus = generate_corpus(spark, n_docs, partitions=cpus * 2) \
        .select("doc_id", "text").cache()
    corpus.count()

    rec = {"n_docs": n_docs, "cpus": cpus, "dim": dim, "k": k,
           "fit_sample": fit_sample, "tau": 0.92}

    t0 = time.time()
    emb = embed_documents(corpus, dim=dim).localCheckpoint(eager=True)
    rec["embed_wall_sec"] = round(time.time() - t0, 2)

    frac = fit_sample / n_docs
    fit_df = emb.filter(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(1_000_000))
        < F.lit(int(frac * 1_000_000))
    )

    for pairs in ("blas", "join"):
        t0 = time.time()
        dec, cents = semdedup(emb, k=k, iters=5, tau=0.92,
                              fit_df=fit_df, init="hash", pairs=pairs)
        n_drop = dec.filter(~F.col("keep")).count()
        rec[f"semantic_tier_{pairs}_wall_sec"] = round(
            time.time() - t0, 2)
        rec[f"semantic_tier_{pairs}_n_dropped"] = int(n_drop)
        dec.unpersist()
        cents.unpersist()

    # init cost at equal k on the same 5k fit sample
    for init in ("hash", "farthest"):
        t0 = time.time()
        a, c = kmeans_fit(fit_df, k=16, iters=5, init=init)
        a.unpersist()
        c.unpersist()
        rec[f"fit_k16_{init}_wall_sec"] = round(time.time() - t0, 2)

    rec["note"] = (
        "production path = hash-sample fit + hash init + broadcast "
        "assign + blas pair blocks; the join engine is the "
        "oracle-replayable twin (identical decisions, pinned) and "
        "pays |c|^2*dim aggregate rows per cluster; farthest init "
        "pays one driver pass per seed even on the sample"
    )

    path = ROOT / "BENCH" / "dedup_ops.json"
    d = json.loads(path.read_text())
    d["semdedup_r8"] = rec
    path.write_text(json.dumps(d, indent=1))
    print(json.dumps(rec, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
