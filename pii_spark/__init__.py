"""pii_spark — a PySpark-native quality-filter + PII-scrub engine.

Re-implements the semantics of the reference pipeline
(tursunait/roberta-pii-detector, studied read-only at /root/reference)
as an idiomatic Spark DataFrame + vectorized Arrow-UDF pipeline:

  corpus (url, warc_ts, html, text, lang)
    -> language-ID -> char-LM perplexity -> C4/Gopher heuristics
    -> two-stage PII detection (regex stage + batched token-classifier
       stage served in mapInPandas with softmax + confidence threshold
       0.3 + BILOU decode, mirroring evaluation/model_evaluation.py)
    -> keep/drop decision + byte-stable scrubbed text per url
    -> Iceberg-style snapshot commits with per-partition lineage/audit
       rows and checkpoint resume.

Everything is deterministic: per-row randomness is keyed on
(seed, doc_id), never on global RNG state (the reference seeds global
`random` + Faker once, pii_synth/generation.py:898-899, which is not
retry-safe on a cluster).
"""

__version__ = "0.1.0"
