"""Committed real-world-style eval run (VERDICT r1 #4).

Builds the deterministic ai4privacy-shaped fixture (300 rows,
pii_spark/spark/eval_fixture.py), runs the full EP3 evaluation job
(evaluation/model_evaluation.py re-expressed as Spark joins), and
writes evaluation/evaluation_results.json in the reference's format
(model_evaluation.py:360-378) so the two result files sit side by side.

    python scripts/run_eval.py [n]
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main(n: int = 300) -> None:
    from pii_spark.spark.eval_fixture import EVAL_FIXTURE_SEED, eval_fixture_df
    from pii_spark.spark.evaljob import evaluate_full, save_results
    from pii_spark.spark.metrics import token_accuracy
    from pii_spark.spark.session import get_spark

    spark = get_spark(app="pii_eval", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    fixture = eval_fixture_df(spark, n)
    conf_df, truth, pred = evaluate_full(fixture, limit_n=n)
    conf = conf_df.collect()
    acc = token_accuracy(truth, pred)
    num_examples = truth.count()

    out_path = ROOT / "evaluation" / "evaluation_results.json"
    out_path.parent.mkdir(exist_ok=True)
    result = save_results(
        conf,
        str(out_path),
        num_examples=num_examples,
        test_dataset=(
            f"synthetic ai4privacy-shaped fixture "
            f"(eval_fixture.py n={n} seed={EVAL_FIXTURE_SEED}; "
            "real ai4privacy/pii-masking-300k is unreachable offline)"
        ),
        accuracy=acc,
    )
    m = result["metrics"]
    print(f"examples={num_examples} "
          f"P={m['precision']:.4f} R={m['recall']:.4f} F1={m['f1']:.4f} "
          f"acc={m['accuracy']:.4f} "
          f"true={result['entity_counts']['true_total']} "
          f"pred={result['entity_counts']['predicted_total']}")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
