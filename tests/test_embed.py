"""Document embedder: determinism across layouts, cosine geometry
(duplicates at 1.0, near-dups high, unrelated low), and the end-to-end
text → embed → brute-force-cosine near-dup loop."""

import numpy as np
from pyspark.sql import functions as F

from pii_spark.spark.embed import embed_documents, embed_text


def test_embed_unit_geometry():
    a = embed_text("the quick brown fox jumps over the lazy dog")
    a2 = embed_text("the quick brown fox jumps over the lazy dog")
    near = embed_text("the quick brown fox jumped over the lazy dog")
    far = embed_text("zzz qqq 12345 ##### totally different payload")
    assert np.allclose(a, a2)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-6
    assert float(a @ near) > 0.85
    assert float(a @ far) < 0.5


def test_embed_layout_stable_and_feeds_ann(spark):
    from pii_spark.spark.gen_job import generate_corpus

    base = (
        generate_corpus(spark, 30)
        .select(F.monotonically_increasing_id().alias("doc_id"), "text")
        .cache()
    )
    # plant one near-duplicate pair: doc 1000 = doc 0 with a char edit
    corpus = base.unionByName(
        base.filter("doc_id = 0").select(
            F.lit(1000).alias("doc_id"),
            F.concat(F.lit("Z"), F.expr("substring(text, 2)"))
            .alias("text"),
        )
    )
    e1 = {r.vec_id: r.embedding
          for r in embed_documents(corpus).collect()}
    e2 = {r.vec_id: r.embedding
          for r in embed_documents(corpus.repartition(7)).collect()}
    assert e1.keys() == e2.keys()
    for k in e1:
        assert np.allclose(e1[k], e2[k]), k  # layout-independent

    # the planted near-dup pair is the top cosine match for doc 0
    v0 = np.array(e1[0])
    sims = sorted(
        ((float(v0 @ np.array(v)), k) for k, v in e1.items() if k != 0),
        reverse=True,
    )
    assert sims[0][1] == 1000 and sims[0][0] > 0.9, sims[:3]
