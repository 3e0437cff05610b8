"""Independent twins for the driver's `no_oracle` queries (VERDICT r2
missing #2): each non-SQL-expressible query gets a second, structurally
DIFFERENT implementation whose agreement is the correctness evidence
the DuckDB oracle can't provide.

  * pii_f1 / eval_confusion → a pure-Python seqeval-style scanner +
    Counter confusion (no joins, no decode_bilou) vs the Spark
    full-outer-join metrics.
  * kmeans_clusters → a numpy Lloyd's reimplementation with the same
    deterministic farthest-point init vs the DataFrame fit, compared on
    exact assignments and inertia.
  * synth_corpus → a single-process driver loop over build_example vs
    the distributed mapInPandas generation, compared on the exact
    kind/lang/span census (plus structural invariants).
"""

from collections import Counter

import numpy as np
from pyspark.sql import functions as F


# ---------------------------------------------------------------- seqeval twin

def _scan_chunks(tags: list[str]) -> set[tuple[str, int, int]]:
    """Entity chunks from a BILOU tag sequence — an independent scanner
    (decode_bilou is the implementation under test). Input sequences
    come from spans_to_token_labels and must be well-formed; malformed
    structure is an assertion failure, not leniency."""
    out: set[tuple[str, int, int]] = set()
    i, n = 0, len(tags)
    while i < n:
        t = tags[i]
        if t.startswith("U-"):
            out.add((t[2:], i, i))
            i += 1
        elif t.startswith("B-"):
            lab = t[2:]
            j = i + 1
            while j < n and tags[j] == f"I-{lab}":
                j += 1
            assert j < n and tags[j] == f"L-{lab}", f"malformed BILOU at {i}"
            out.add((lab, i, j))
            i = j + 1
        else:
            assert t == "O", f"orphan {t} at {i}"
            i += 1
    return out


def _pure_confusion(truth_by_doc: dict, pred_by_doc: dict) -> dict:
    """Per-label {tp, fn, fp} via set intersection per doc — no joins."""
    from pii_spark.labeling import spans_to_token_labels
    from pii_spark.tokenizer import tokenize_with_offsets

    def chunks(text, spans):
        _, offsets, _ = tokenize_with_offsets(text or "")
        norm = [
            {"start": int(s["start"]), "end": int(s["end"]),
             "label": s["label"]}
            for s in (spans or [])
            if s["label"] != "IP"  # IP is scrubbed but not an F1 label
        ]
        tags, _ = spans_to_token_labels(offsets, norm)
        return _scan_chunks(["O" if t is None else t for t in tags])

    conf: Counter = Counter()
    for doc_id in set(truth_by_doc) | set(pred_by_doc):
        t_text, t_spans = truth_by_doc.get(doc_id, ("", []))
        p_text, p_spans = pred_by_doc.get(doc_id, (t_text, []))
        T = chunks(t_text, t_spans)
        P = chunks(p_text, p_spans)
        for lab, a, b in T & P:
            conf[(lab, "tp")] += 1
        for lab, a, b in T - P:
            conf[(lab, "fn")] += 1
        for lab, a, b in P - T:
            conf[(lab, "fp")] += 1
    labels = {lab for lab, _ in conf}
    return {
        lab: {
            "tp": conf[(lab, "tp")],
            "fn": conf[(lab, "fn")],
            "fp": conf[(lab, "fp")],
        }
        for lab in labels
    }


def test_f1_join_metrics_match_pure_seqeval(spark):
    """entity_confusion (full-outer join + decode_bilou) must agree
    with the scanner/Counter twin on real pipeline predictions."""
    from pii_spark.spark.gen_job import generate_full
    from pii_spark.spark.metrics import entity_confusion, entity_rows
    from pii_spark.spark.pipeline import run_pipeline

    full = generate_full(spark, 80).where("lang = 'en'").cache()
    truth = full.select("doc_id", "text", "spans")
    pred = (
        run_pipeline(full, with_doc_id=True)
        .select("doc_id", "spans")
        .join(full.select("doc_id", "text"), "doc_id")
    )
    spark_conf = {
        r.label: {"tp": r.tp, "fn": r.fn, "fp": r.fp}
        for r in entity_confusion(
            entity_rows(truth), entity_rows(pred)
        ).collect()
    }

    t_rows = truth.collect()
    p_rows = pred.collect()
    full.unpersist()
    to_dicts = lambda spans: [
        {"start": s["start"], "end": s["end"], "label": s["label"]}
        for s in (spans or [])
    ]
    pure = _pure_confusion(
        {r.doc_id: (r.text, to_dicts(r.spans)) for r in t_rows},
        {r.doc_id: (r.text, to_dicts(r.spans)) for r in p_rows},
    )
    assert spark_conf == pure
    # and the corpus actually exercised the metric (non-trivial truth)
    assert sum(v["tp"] + v["fn"] for v in pure.values()) > 50


def test_eval_confusion_matches_pure_seqeval(spark):
    """The EP3 eval job's confusion rows against the same pure twin,
    over the ai4privacy-shaped fixture (exercises parse + label-space
    mapping + pipeline + joins end to end)."""
    from pii_spark.evalmap import parse_span_labels
    from pii_spark.spark.eval_fixture import eval_fixture_df
    from pii_spark.spark.evaljob import evaluate_full

    conf, truth, pred = evaluate_full(eval_fixture_df(spark, 60), limit_n=60)
    spark_conf = {
        r.label: {"tp": r.tp, "fn": r.fn, "fp": r.fp}
        for r in conf.collect()
    }
    t_rows = truth.collect()
    p_rows = pred.collect()
    truth.unpersist()
    pred.unpersist()
    to_dicts = lambda spans: [
        {"start": s["start"], "end": s["end"], "label": s["label"]}
        for s in (spans or [])
    ]
    pure = _pure_confusion(
        {r.doc_id: (r.text, to_dicts(r.spans)) for r in t_rows},
        {r.doc_id: (r.text, to_dicts(r.spans)) for r in p_rows},
    )
    assert spark_conf == pure
    assert parse_span_labels is not None  # fixture path imported OK


# ---------------------------------------------------------------- kmeans twin

def _numpy_lloyds(ids: np.ndarray, V: np.ndarray, k: int, iters: int):
    """Brute-force Lloyd's with the SAME deterministic rules as
    kmeans_fit: farthest-point init from the lowest vec_id (ties →
    lowest vec_id), squared-L2 assignment (ties → lowest cluster),
    mean update, empty clusters dropped from the centroid set, and
    (r8) a final reassignment against the converged centroids so the
    returned (assignment, centroids, sqdist) triple is
    self-consistent — what the kmeans_clusters oracle replays."""
    order = np.argsort(ids, kind="stable")
    ids, V = ids[order], V[order].astype(np.float64)
    seeds = [0]  # lowest vec_id
    for _ in range(1, k):
        d = np.min(
            ((V[:, None, :] - V[seeds][None, :, :]) ** 2).sum(axis=2),
            axis=1,
        )
        # max min-distance, ties → lowest vec_id (ids sorted ascending)
        seeds.append(int(np.argmax(d)))
    cents = {c: V[s].copy() for c, s in enumerate(seeds)}
    assign = None
    for _ in range(iters):
        live = sorted(cents)
        C = np.stack([cents[c] for c in live])
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.array([live[j] for j in d2.argmin(axis=1)])
        cents = {
            c: V[assign == c].mean(axis=0) for c in live if (assign == c).any()
        }
    live = sorted(cents)
    C = np.stack([cents[c] for c in live])
    d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    j = d2.argmin(axis=1)
    assign = np.array([live[x] for x in j])
    sq = d2[np.arange(len(V)), j]
    return dict(zip(ids.tolist(), assign.tolist())), float(sq.sum())


def test_kmeans_matches_numpy_lloyds(spark):
    from pii_spark.spark.kmeans import kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows])

    # driver_bound=0 forces the DISTRIBUTED loop — this twin is what
    # pins it now that driver-fitting inputs auto-dispatch to the
    # pure fit (which shares the twin's arithmetic)
    assign_df, cents = kmeans_fit(emb.select("vec_id", "embedding"),
                                  k=6, iters=4, driver_bound=0)
    got = {r.vec_id: r.cluster for r in assign_df.collect()}
    inertia = assign_df.agg(F.sum("sqdist")).collect()[0][0]
    assign_df.unpersist()
    cents.unpersist()

    want, want_inertia = _numpy_lloyds(ids, V, k=6, iters=4)
    assert got == want
    assert abs(inertia - want_inertia) <= 1e-6 * max(1.0, want_inertia)


# ------------------------------------------------------------ synth mix twin

def test_synth_corpus_census_matches_driver_loop(spark):
    """Distributed generation must equal a single-process loop over
    build_example exactly (partition independence), and the census must
    satisfy the grammar's structural invariants."""
    from pii_spark.spark.gen_job import generate_full
    from pii_spark.textgrammar.generator import build_example

    n, seed = 300, 42
    dist = {
        (r.kind, r.lang): (r.n_docs, r.n_spans)
        for r in generate_full(spark, n, seed, partitions=7)
        .groupBy("kind", "lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.size("spans")).alias("n_spans"))
        .collect()
    }
    census: Counter = Counter()
    spans_by_key: Counter = Counter()
    for i in range(n):
        row = build_example(seed, i)
        key = (row["kind"], row["lang"])
        census[key] += 1
        spans_by_key[key] += len(row["spans"])
        if row["kind"] in ("o_only", "hard_negative", "non_english"):
            assert row["spans"] == []
        else:
            assert len(row["spans"]) >= 1
            for s in row["spans"]:
                assert 0 <= s["start"] < s["end"] <= len(row["text"])
    want = {k: (census[k], spans_by_key[k]) for k in census}
    assert dist == want
    assert census[("positive", "en")] > 0
    assert sum(v for (k, _), v in census.items() if k == "non_english") > 0
