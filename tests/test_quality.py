"""Quality stages: langid, perplexity, heuristics — including the
native-Catalyst == pure-Python parity pin."""

from pii_spark.config import QUALITY
from pii_spark.quality.heuristics import passes_heuristics, quality_stats
from pii_spark.quality.langid import classify
from pii_spark.quality.perplexity import perplexity
from pii_spark.textgrammar.generator import build_example


def test_langid_clean_texts():
    assert classify("the quick update arrived after lunch and everyone")[0] == "en"
    assert classify("der und die das nicht mit auf für ist werden")[0] == "de"
    assert classify("le de un être et il avoir ne je que dans pour")[0] == "fr"
    assert classify("el la de que y en un ser se por con para como")[0] == "es"


def test_langid_on_corpus():
    ok = tot = 0
    for i in range(400):
        ex = build_example(42, i)
        if ex["lang"] in ("de", "fr", "es"):
            tot += 1
            ok += classify(ex["text"])[0] == ex["lang"]
    assert ok == tot  # non-English docs never misroute


def test_perplexity_ordering():
    en = "meeting went well discussed the new features roadmap"
    junk = "zqxv##jk%%wpm^^ffgh**aa zzqk xjv"
    assert perplexity(en) < perplexity(junk)
    assert perplexity(en) < QUALITY["max_ppl"]


def test_heuristics_rules():
    assert passes_heuristics("a reasonable english sentence with words")
    assert not passes_heuristics("x y")                      # min_words
    assert not passes_heuristics("spam " * 40)               # repetition
    assert not passes_heuristics("#### $$$$ %%%% ^^^^ &&&&")  # symbols


def test_native_exprs_match_pure(spark):
    from pyspark.sql import functions as F

    from pii_spark.spark.pipeline import quality_exprs

    texts = [build_example(42, i)["text"] for i in range(120)]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.withColumns(quality_exprs()).collect()
    for r in rows:
        s = quality_stats(r.text)
        assert r.n_words == int(s["n_words"]), r.text
        assert abs(r.mean_word_len - s["mean_word_len"]) < 1e-9
        assert abs(r.symbol_ratio - s["symbol_ratio"]) < 1e-9
        assert abs(r.digit_ratio - s["digit_ratio"]) < 1e-9
        assert abs(r.rep_ratio - s["rep_ratio"]) < 1e-9
