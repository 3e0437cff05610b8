"""HTML → text extraction (pii_spark/spark/html.py): handcrafted pages
exercise every rule — script/style/comment removal, block-tag line
breaks, entity decode, whitespace normalization."""

from pyspark.sql import functions as F

from pii_spark.spark.html import html_text_expr


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        html_text_expr(F.encode(F.col("html"), "utf-8")).alias("t")
    ).collect()[0].t


def test_script_style_comment_removed(spark):
    out = _extract(spark, "<html><script>alert('x > 1')</script>"
                          "<style>a{}</style><!-- hidden -->"
                          "<body>visible</body></html>")
    assert out == "visible"
    assert "alert" not in out and "hidden" not in out


def test_block_tags_become_linebreaks(spark):
    out = _extract(spark, "<p>one</p><p>two</p><div>three</div>")
    assert out == "one\ntwo\nthree"


def test_entities_decoded(spark):
    out = _extract(spark, "<p>Tom &amp; Jerry &lt;3 &quot;cheese&quot;"
                          " &#39;ok&#39;&nbsp;end</p>")
    assert out == 'Tom & Jerry <3 "cheese" \'ok\' end'


def test_inline_tags_and_whitespace(spark):
    out = _extract(spark, "<p>a <b>bold</b>   and <i>italic</i>\r\n"
                          "word</p>\n\n\n<p>next</p>")
    assert out == "a bold and italic\nword\nnext"


def test_nested_and_attributed_tags(spark):
    out = _extract(spark, '<div class="x" data-y="1"><span>inner'
                          "</span></div><br/>tail")
    assert out == "inner\ntail"


def test_escaped_entities_not_double_decoded(spark):
    """'&amp;lt;' is a page DISPLAYING the literal text '&lt;' — it must
    decode to '&lt;', not be double-decoded to '<'."""
    out = _extract(spark, "<p>use &amp;lt; to write a less-than sign</p>")
    assert out == "use &lt; to write a less-than sign"
    out2 = _extract(spark, "<p>&amp;quot; and &amp;nbsp; stay escaped</p>")
    assert out2 == "&quot; and &nbsp; stay escaped"
