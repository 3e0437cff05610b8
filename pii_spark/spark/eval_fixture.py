"""Deterministic ai4privacy-shaped evaluation fixture (VERDICT r1 #4).

The reference evaluates on 300 English rows of
ai4privacy/pii-masking-300k (evaluation/model_evaluation.py:24-31) and
ships the resulting metrics as evaluation/evaluation_results.json. That
dataset is unreachable offline, so this module synthesizes a corpus
with the SAME record shape and the same adversarial properties the
reference's converter must survive:

    (id long, source_text string, span_labels string, language string)

  * span_labels is a JSON-encoded [[start, end, FOREIGN_LABEL], ...]
    using ai4privacy's label names (GIVENNAME1, TEL, SOCIALNUMBER, ...)
    — exercising the label-space mapping (model_evaluation.py:93-128)
  * some rows carry foreign labels OUR mapping does not know
    (CREDITCARDNUMBER, AGEYEARS) — the reference drops unknowns, which
    turns the pipeline's correct CREDIT_CARD/AGE predictions into FPs,
    reproducing the over-prediction dynamic it reports (README.md:253)
  * every 29th row has malformed span_labels JSON (parse-swallow path,
    model_evaluation.py:150-151)
  * every 17th row is language='French' (filtered, :27)

Text + truth spans come from the same seeded grammar as the training
corpus, so the fixture is fully deterministic: rebuilding it with the
same (n, seed) is byte-identical.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..textgrammar.generator import build_example, rng_for

EVAL_FIXTURE_SEED = 2026

# our label → plausible ai4privacy foreign names; the reference's
# mapping (evalmap.LABEL_MAPPING) inverts the known ones and drops the
# deliberately-unknown ones
_FOREIGN = {
    "PERSON": ("GIVENNAME1", "GIVENNAME2", "LASTNAME1", "USERNAME", "NAME"),
    "EMAIL": ("EMAIL",),
    "PHONE": ("TEL",),
    "SSN": ("SOCIALNUMBER",),
    "ADDRESS": ("STREET", "CITY", "STATE", "POSTCODE"),
    "DATE": ("DATE", "BOD"),
    "ORG": ("COMPANY",),
    "CREDIT_CARD": ("CREDITCARDNUMBER",),  # unknown to the mapping
    "AGE": ("AGEYEARS",),                  # unknown to the mapping
}


def eval_fixture_rows(n: int = 300, seed: int = EVAL_FIXTURE_SEED):
    """n deterministic ai4privacy-shaped rows."""
    rows = []
    for i in range(n):
        ex = build_example(seed, i)
        rng = rng_for(seed + 1, i)
        spans = [
            [s["start"], s["end"],
             str(_FOREIGN[s["label"]][int(rng.integers(
                 len(_FOREIGN[s["label"]])))])]
            for s in ex["spans"]
        ]
        span_labels = json.dumps(spans)
        language = "English" if ex["lang"] == "en" else "French"
        if i % 17 == 0:
            language = "French"
        if i % 29 == 0:
            span_labels = span_labels[:-1] + ", [broken"  # malformed JSON
        rows.append((i, ex["text"], span_labels, language))
    return rows


_EVAL_SCHEMA = "id long, source_text string, span_labels string, language string"


def eval_fixture_df(spark: SparkSession, n: int = 300,
                    seed: int = EVAL_FIXTURE_SEED) -> DataFrame:
    return spark.createDataFrame(eval_fixture_rows(n, seed), _EVAL_SCHEMA)
