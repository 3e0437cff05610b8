"""Time the composed dedup chain (jobs/run_dedup.py, exact →
paragraph → substring, k=50) over bench.py's 50k-doc generated
corpus and append the result to BENCH/dedup_ops.json (VERDICT r5 #7
— the file previously carried single-operator timings only).

Run from the repo root:  python BENCH/run_dedup_chain.py [reps]
This process's Spark session only GENERATES the 50k-doc corpus; the
chain itself runs as the real jobs/run_dedup.py CLI subprocess, so the
recorded walls INCLUDE the subprocess JVM/Spark startup (~15s — the
dedup_ops.json note says so next to the numbers). That is deliberate:
the number a user sees for "run the dedup job" is the spark-submit
wall; per-operator chain-only costs are the separate
substring_dedup/paragraph_dedup entries in the same file.
"""

import json
import os
import subprocess
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
        .appName("dedup_chain_bench")
        .getOrCreate()
    )
    from pii_spark.spark.gen_job import generate_corpus

    corpus = generate_corpus(spark, 50_000, partitions=cpus * 2) \
        .select("doc_id", "text").cache()
    corpus.count()

    import tempfile

    src = tempfile.mkdtemp(prefix="dedup_chain_src_")
    corpus.write.mode("overwrite").parquet(src)

    walls, deltas = [], None
    for rep in range(reps):
        out = tempfile.mkdtemp(prefix="dedup_chain_out_")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, str(ROOT / "jobs" / "run_dedup.py"),
             "--input", src, "--output", out,
             "--stages", "exact,paragraph,substring", "--k", "50"],
            capture_output=True, text=True, cwd=ROOT, timeout=1800,
        )
        wall = time.time() - t0
        if r.returncode != 0:
            raise SystemExit(r.stderr[-2000:])
        walls.append(round(wall, 2))
        for ln in r.stdout.splitlines():
            if "removed per stage" in ln:
                deltas = ln.split("removed per stage:", 1)[1].strip()
        print(f"rep {rep}: {wall:.1f}s  {deltas}")

    path = ROOT / "BENCH" / "dedup_ops.json"
    data = json.loads(path.read_text())
    data["dedup_chain_exact_para_substr_k50"] = {
        "walls_sec": walls,
        "note": ("full CLI subprocess incl. its own Spark startup "
                 "(~15s of each wall); per-stage deltas: "
                 f"{deltas}"),
        "loadavg": os.getloadavg()[0],
    }
    data["timestamp"] = time.strftime("%Y-%m-%d %H:%M")
    path.write_text(json.dumps(data, indent=2) + "\n")
    print("updated", path)
    spark.stop()


if __name__ == "__main__":
    main()
