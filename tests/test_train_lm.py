"""Distributed LM trainer == single-process builder, byte-for-byte,
on the identical corpus — and scoring parity through the shipped
perplexity path."""

import math
import re

from pii_spark.quality import perplexity as P
from pii_spark.quality.train_lm import perplexity_with, train_char_lm
from pii_spark.textgrammar.templates import TEMPLATES
from pii_spark.wordlists import FILLER_EN, FIRST_NAMES, LAST_NAMES


def _build_corpus_lines() -> list[str]:
    """The exact corpus perplexity._build constructs."""
    import numpy as np

    rng = np.random.default_rng([42, 777])
    corpus = []
    for _ in range(300):
        corpus.append(
            " ".join(
                FILLER_EN[int(rng.integers(0, len(FILLER_EN)))]
                for _ in range(10)
            )
        )
    for t in TEMPLATES:
        corpus.append(re.sub(r"\{[a-z_]+\}", "x", t))
    corpus.extend(FIRST_NAMES)
    corpus.extend(LAST_NAMES)
    return corpus


def test_distributed_training_matches_single_process(spark):
    lines = _build_corpus_lines()
    df = spark.createDataFrame([(ln,) for ln in lines], ["text"])
    # several partitions: the partial-count merge is what's under test
    trained = train_char_lm(df.repartition(7))
    assert set(trained) == set(P._LOGP)
    for g, lp in trained.items():
        assert math.isclose(lp, P._LOGP[g], rel_tol=0, abs_tol=1e-12), g

    # scoring through the trained table == the shipped scorer
    samples = [
        "the quick brown fox jumps over the lazy dog",
        "zqxv##jk%%wpm^^ffgh**aa",
        "",
    ]
    for s in samples:
        assert math.isclose(
            perplexity_with(trained, s), P.perplexity(s),
            rel_tol=1e-12,
        ), s


def test_training_scales_with_corpus(spark):
    """Train on the real documents table: the domain-adapted model must
    score in-domain text lower than junk (the property the quality
    filter relies on)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_char_lm(docs.filter("lang = 'en'"))
    sample = docs.filter("lang = 'en'").select("text").first().text
    assert perplexity_with(model, sample) < perplexity_with(
        model, "zqxv##jk%%wpm^^ffgh**aa zzqk xjv"
    )
