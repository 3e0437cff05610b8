"""HTML → text extraction as pure Catalyst expressions (the canonical
Common-Crawl step upstream of the quality filter: the corpus table
carries ``html binary``; real pipelines derive ``text`` from it).

Whole-stage-codegen regexp pipeline — no UDF:
    decode utf-8
    → drop <script>/<style> blocks and <!-- comments -->
    → block-level tags become newlines (so 'a</p><p>b' keeps a boundary)
    → remaining tags stripped
    → the 6 ubiquitous entities decoded
    → whitespace normalized per line, blank lines collapsed, trimmed

This is the regex-tier extractor (what trafilatura calls the baseline);
a DOM-quality extractor would be a Pandas UDF, but the regex tier is
what survives 10^12 documents and is bit-reproducible across engines
(tests pin Spark == DuckDB on the same expressions).

Known regex-tier limitations (probed, accepted): an UNCLOSED <script>
block leaks its body as text (the lazy match needs the closing tag),
and an unescaped bare '< 6 and 7 >' is eaten by the tag stripper —
well-formed pages escape these; a DOM pass is the upgrade path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK_TAGS = (
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|"
    r"footer|blockquote)[^>]*>"
)

# &amp; decodes LAST: decoding it first turns escaped entities
# ('&amp;lt;' — a page showing the literal text '&lt;') into '&lt;'
# which the later pass double-decodes to '<' (review r2b)
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_text_expr(html_col: Column) -> Column:
    """binary/string html → extracted plain text."""
    t = F.decode(html_col, "utf-8")
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, _BLOCK_TAGS, "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        # literal replace (not regex): '&' in the replacement is inert
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")          # within-line
    t = F.regexp_replace(t, r" ?\n ?", "\n")             # around breaks
    t = F.regexp_replace(t, r"\n{2,}", "\n")             # blank lines
    t = F.regexp_replace(t, r"^\n+|\n+$", "")           # edge breaks
    return F.trim(t)
