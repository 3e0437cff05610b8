"""JSONL raw-corpus source/sink (SURVEY §2 S1/S2).

The reference's raw corpus is one JSON object per line:
{"text": str, "spans": [{"start","end","label"}...]}
(pii_synth/generation.py:908-929; reader build_datasets.py:19-27).

Spark-first: the JSON reader drops blank lines natively and malformed
lines go to _corrupt_record under PERMISSIVE mode instead of crashing
the job (never eval()/json.loads in a driver loop). For byte-stable
golden files the sink renders each row with to_json and writes text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import SPAN

RAW_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
    ]
)

RAW_SCHEMA_PERMISSIVE = T.StructType(
    RAW_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
)


def write_jsonl(df: DataFrame, path: str) -> None:
    """{text, spans} rows → one JSON object per line (S1)."""
    df.select(
        F.to_json(F.struct(F.col("text"), F.col("spans"))).alias("value")
    ).write.mode("overwrite").text(path)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL → rows; blank lines skipped, malformed lines dropped after
    being counted into _corrupt_record (F3/F6 semantics)."""
    df = spark.read.schema(RAW_SCHEMA_PERMISSIVE).option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    return df.filter(F.col("_corrupt_record").isNull()).select("text", "spans")
