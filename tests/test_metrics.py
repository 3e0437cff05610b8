"""Metric-unit fixtures (FIXTURES.md §6): hand-computed TP/FP/FN cases
pin the join-based seqeval-equivalent metric."""

from pii_spark.spark.metrics import f1_report


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, text string,"
        " spans array<struct<start:int,end:int,label:string>>",
    )


def test_exact_match_and_boundary_miss(spark):
    text = "Contact John Smith at 555-123-4567 now"
    truth = _df(spark, [
        (1, text, [
            {"start": 8, "end": 18, "label": "PERSON"},
            {"start": 22, "end": 34, "label": "PHONE"},
        ]),
    ])
    # pred: PERSON exact; PHONE boundary off by one token → FP+FN
    pred = _df(spark, [
        (1, text, [
            {"start": 8, "end": 18, "label": "PERSON"},
            {"start": 22, "end": 29, "label": "PHONE"},
        ]),
    ])
    rep = f1_report(truth, pred)
    assert rep["labels"]["PERSON"]["f1"] == 1.0
    assert rep["labels"]["PHONE"]["tp"] == 0
    assert rep["labels"]["PHONE"]["fp"] == 1
    assert rep["labels"]["PHONE"]["fn"] == 1


def test_type_mismatch_counts_twice(spark):
    text = "value 123456789 end"
    truth = _df(spark, [(1, text, [{"start": 6, "end": 15, "label": "SSN"}])])
    pred = _df(spark, [(1, text, [{"start": 6, "end": 15, "label": "PHONE"}])])
    rep = f1_report(truth, pred)
    assert rep["labels"]["SSN"]["fn"] == 1
    assert rep["labels"]["PHONE"]["fp"] == 1
    assert rep["micro"]["f1"] == 0.0


def test_micro_and_weighted(spark):
    text = "a@gmail.com and 999-88-7777 and x"
    spans = [
        {"start": 0, "end": 11, "label": "EMAIL"},
        {"start": 16, "end": 27, "label": "SSN"},
    ]
    truth = _df(spark, [(1, text, spans)])
    pred = _df(spark, [(1, text, spans[:1])])  # miss the SSN
    rep = f1_report(truth, pred)
    assert rep["labels"]["EMAIL"]["f1"] == 1.0
    assert rep["micro"]["recall"] == 0.5
    assert abs(rep["weighted_f1"] - 0.5) < 1e-9


def test_ip_excluded_from_metric(spark):
    text = "IPv4 10.1.2.3 only"
    truth = _df(spark, [(1, text, [])])
    pred = _df(spark, [(1, text, [{"start": 5, "end": 13, "label": "IP"}])])
    rep = f1_report(truth, pred)
    assert not rep["labels"]  # IP spans never reach the F1 join
