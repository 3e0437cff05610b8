"""Real-world-style evaluation job (EP3 — evaluation/model_evaluation.py
re-expressed Spark-first).

Input: an ai4privacy-shaped table
    (id long, source_text string, span_labels string, language string)
where span_labels is a JSON-encoded [[start, end, FOREIGN_LABEL], ...].

Stages, mirroring the reference line by line:
    filter language == 'English'            (:27)
    deterministic head-N                    (:31, select(range(300)))
    skip len(text) < 10                     (:239-240)
    parse + label-space map (NEVER eval())  (:76-156, F6 swallow)
    model predictions                       (pipeline scrub UDF)
    entity-level confusion                  (seqeval-equivalent joins)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import SPAN
from .metrics import entity_confusion, entity_rows
from .pipeline import run_pipeline


def _parse_fn(
    batches: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    from ..evalmap import parse_span_labels

    for texts, labels in batches:
        yield pd.Series(
            [parse_span_labels(lab, txt) for txt, lab in zip(texts, labels)]
        )


def parse_spans_udf():
    return F.pandas_udf(_parse_fn, T.ArrayType(SPAN))


def convert_eval_table(df: DataFrame, limit_n: int = 300) -> DataFrame:
    """ai4privacy shape → (doc_id, text, spans), English only, parse
    failures dropped (the reference swallows them, :150-151)."""
    out = (
        df.filter(F.col("language") == "English")
        .filter(F.col("id") < limit_n)            # deterministic head-N
        .filter(F.length("source_text") >= 10)    # skip-short rule
        .select(
            F.col("id").alias("doc_id"),
            F.col("source_text").alias("text"),
            parse_spans_udf()(F.col("source_text"), F.col("span_labels"))
            .alias("spans"),
        )
        .filter(F.col("spans").isNotNull())
    )
    return out


def aligned_truth_pred(
    df: DataFrame, limit_n: int = 300
) -> tuple[DataFrame, DataFrame]:
    """(truth, pred) — the converted ground truth and the pipeline's
    predictions joined back to the same texts, both cached (pred's
    lineage replays truth). Callers unpersist both. Split out of
    ``evaluate_full`` so the driver query can MATERIALIZE the decoded
    entity tuples and hand the confusion arithmetic to the SQL oracle
    (VERDICT r7 #6)."""
    truth = convert_eval_table(df, limit_n).cache()
    corpus = truth.select(
        "doc_id",
        F.concat(F.lit("https://eval.example.com/"), F.col("doc_id"))
        .alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    pred = (
        run_pipeline(corpus, with_doc_id=True)
        .select("doc_id", "spans")
        .join(truth.select("doc_id", "text"), "doc_id")
    ).cache()
    return truth, pred


def evaluate_full(
    df: DataFrame, limit_n: int = 300
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full EP3: returns (confusion_rows, truth, pred) so callers can
    also compute token accuracy (model_evaluation.py:322) over the same
    aligned frames."""
    truth, pred = aligned_truth_pred(df, limit_n)
    conf = entity_confusion(entity_rows(truth), entity_rows(pred))
    return conf, truth, pred


def evaluate(df: DataFrame, limit_n: int = 300) -> DataFrame:
    """Converted truth vs pipeline predictions → per-label TP/FP/FN.
    Materializes the (tiny) confusion table and releases the cached
    truth/pred frames so repeated calls don't pin storage memory."""
    conf, truth, pred = evaluate_full(df, limit_n)
    # re-create the tiny table from collected rows: releases the cached
    # inputs AND leaves no storage entry behind (repeated calls clean)
    rows = conf.collect()
    truth.unpersist()
    pred.unpersist()
    return df.sparkSession.createDataFrame(rows, conf.schema)


def save_results(confusion_rows, path: str, num_examples: int,
                 model: str = "pii_spark.detect (deterministic)",
                 test_dataset: str | None = None,
                 accuracy: float | None = None,
                 per_label: bool = True) -> dict:
    """Metrics JSON sink, shaped like the reference's
    evaluation/evaluation_results.json (model_evaluation.py:360-378)."""
    import json

    tp = sum(r.tp for r in confusion_rows)
    fp = sum(r.fp for r in confusion_rows)
    fn = sum(r.fn for r in confusion_rows)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    metrics = {"precision": precision, "recall": recall, "f1": f1}
    if accuracy is not None:
        metrics["accuracy"] = accuracy
    out = {
        "model": model,
        **({"test_dataset": test_dataset} if test_dataset else {}),
        "num_examples": num_examples,
        "metrics": metrics,
        "entity_counts": {"true_total": tp + fn, "predicted_total": tp + fp},
    }
    if per_label and all(hasattr(r, "label") for r in confusion_rows):
        out["per_label"] = {
            r.label: {
                "tp": r.tp, "fp": r.fp, "fn": r.fn,
                "precision": r.tp / (r.tp + r.fp) if r.tp + r.fp else 0.0,
                "recall": r.tp / (r.tp + r.fn) if r.tp + r.fn else 0.0,
            }
            for r in sorted(confusion_rows, key=lambda r: r.label)
        }
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    return out
