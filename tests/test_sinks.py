"""CoNLL sink (S7), token accuracy (A4), metrics JSON sink (S8),
label-map side files (S3)."""

import json

from pii_spark.config import ID2LABEL, LABEL2ID
from pii_spark.spark.conll import conll_lines, write_conll
from pii_spark.spark.gen_job import generate_full
from pii_spark.spark.metrics import token_accuracy


def test_conll_lines_format(spark):
    df = spark.createDataFrame(
        [(1, "ssn 123456789 ok",
          [{"start": 4, "end": 13, "label": "SSN"}])],
        "doc_id long, text string,"
        " spans array<struct<start:int,end:int,label:string>>",
    )
    [row] = conll_lines(df).collect()
    lines = row.value.splitlines()
    assert "ssn\tO" in lines
    assert "123456789\tU-SSN" in lines
    assert all("\t" in ln for ln in lines)
    # specials (-100 / BOS / EOS) are skipped (write_conll.py:24-26)
    assert not any(ln.startswith("<s>") for ln in lines)


def test_write_conll_file(spark, tmp_path):
    full = generate_full(spark, 20).select("doc_id", "text", "spans")
    out = str(tmp_path / "conll")
    write_conll(full, out)
    text = "\n".join(
        r.value for r in spark.read.text(out).collect()
    )
    assert "\t" in text


def test_token_accuracy_perfect_and_partial(spark):
    text = "call 555-123-4567 now"
    spans = [{"start": 5, "end": 17, "label": "PHONE"}]
    df = spark.createDataFrame(
        [(1, text, spans)],
        "doc_id long, text string,"
        " spans array<struct<start:int,end:int,label:string>>",
    )
    assert token_accuracy(df, df) == 1.0
    empty = spark.createDataFrame(
        [(1, text, [])],
        "doc_id long, text string,"
        " spans array<struct<start:int,end:int,label:string>>",
    )
    acc = token_accuracy(df, empty)
    assert 0.0 < acc < 1.0  # O tokens agree, PHONE tokens don't


def test_metrics_json_sink(tmp_path):
    from types import SimpleNamespace

    from pii_spark.spark.evaljob import save_results

    rows = [SimpleNamespace(tp=8, fp=2, fn=1)]
    out = save_results(rows, str(tmp_path / "r.json"), num_examples=10)
    loaded = json.loads((tmp_path / "r.json").read_text())
    assert loaded["metrics"]["precision"] == 0.8
    assert loaded["entity_counts"]["true_total"] == 9
    assert out == loaded


def test_label_maps_roundtrip(tmp_path):
    # S3 side files: label2id/id2label JSON (config_and_labels.py:48-60)
    p = tmp_path / "label2id.json"
    p.write_text(json.dumps(LABEL2ID))
    assert {ID2LABEL[v] for v in json.loads(p.read_text()).values()} == set(
        LABEL2ID
    )
