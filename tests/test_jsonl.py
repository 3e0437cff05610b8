"""JSONL source/sink round trip (S1/S2): blank-line skip, corrupt-line
drop, span struct fidelity."""

from pii_spark.spark.gen_job import generate_full
from pii_spark.spark.jsonl import read_jsonl, write_jsonl


def test_jsonl_roundtrip(spark, tmp_path):
    full = generate_full(spark, 30).select("text", "spans")
    path = str(tmp_path / "pii_jsonl")
    write_jsonl(full, path)
    back = read_jsonl(spark, path)
    orig = {r.text: [tuple(s) for s in r.spans] for r in full.collect()}
    got = {r.text: [tuple(s) for s in (r.spans or [])] for r in back.collect()}
    assert got == orig


def test_jsonl_corrupt_and_blank_lines(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "part-0.txt").write_text(
        '{"text": "ok doc", "spans": []}\n'
        "\n"
        "not json at all {\n"
        '{"text": "two", "spans": [{"start": 0, "end": 3, "label": "ORG"}]}\n'
    )
    rows = read_jsonl(spark, str(p)).collect()
    texts = {r.text for r in rows}
    assert texts == {"ok doc", "two"}
