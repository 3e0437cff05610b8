"""Driver-mimic: run each queries() entry on Spark AND its oracle_sql()
on DuckDB, compare row count + column names + order-insensitive values
(floats rounded to 6dp before compare). Dev tool for __spark_entry__."""

from __future__ import annotations

import datetime
import math
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from pii_spark.spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir: str = "/root/testdata/sf0.001", only: str | None = None):
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and only not in name:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            failed.append(name)
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} != {dcols}")
            failed.append(name)
            continue
        if sorted(srows) != sorted(drows):
            print(f"FAIL {name}: values differ "
                  f"({len(srows)} vs {len(drows)} rows)")
            sset, dset = set(srows), set(drows)
            for x in list(sset - dset)[:3]:
                print("   spark-only:", x)
            for x in list(dset - sset)[:3]:
                print("   duck-only :", x)
            failed.append(name)
            continue
        print(f"ok   {name}: {len(srows)} rows match")
    print("\nFAILED:", failed or "none")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
