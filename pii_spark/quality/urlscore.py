"""URL keyword scoring — the token tier of crawl URL filtering.

Production web pipelines filter URLs in two tiers (RefinedWeb
§3.1.2 / the UT1-blocklist tradition): an exact domain blocklist
(already implemented as the broadcast-anti-join `domain_filter`
query) and a WEIGHTED KEYWORD SCORE over the URL string itself, which
catches spam/adult paths on otherwise-unlisted hosts.

Same operator shape as quality/toxicity.py, applied to the url: a
small demonstration lexicon (config-swappable for a maintained list),
two word-boundary regexp passes in pure Catalyst — whole-stage
codegen, zero shuffle, linear at any corpus size — plus a pure-Python
twin and a DuckDB oracle fragment kept in lockstep. URL tokens are
matched on the lowercased url with separators (``/-_.?=&``) first
replaced by spaces so they all act as word boundaries; ``\\b`` alone
would miss ``_`` (a word character in both Java and Python regex, so
``free_pills_casino`` scored zero before the replace — review r5
ADVICE).

Score: (w1 hits + 3 * w2 hits); a url scoring ≥ ``URL_SCORE_FLAG``
is flagged (the caller drops or routes it). Weights are integers and
the score is a count, not a ratio — URL length carries no signal.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII demonstration lexicon (swap for UT1 or a maintained list):
# w1 = spam-ish, w2 = strong signals
URL_W1 = ("free", "casino", "pills", "discount", "winner", "cheap")
URL_W2 = ("porn", "xxx", "adult", "escort", "gambling")
URL_SCORE_FLAG = 3

URL_RE_W1 = r"\b(" + "|".join(URL_W1) + r")\b"
URL_RE_W2 = r"\b(" + "|".join(URL_W2) + r")\b"

# url separators normalized to spaces BEFORE the \b match — '_' is a
# word char, so without this 'free_pills' never matches. Kept as a
# char class (not \W) so all three engines (Java, Python re, DuckDB
# RE2) agree byte-for-byte.
URL_SEP_RE = r"[-_/.?=&]"

_P1 = re.compile(URL_RE_W1)
_P2 = re.compile(URL_RE_W2)
_PSEP = re.compile(URL_SEP_RE)


def url_score_stats(url: str) -> dict:
    """Pure-Python twin."""
    u = _PSEP.sub(" ", (url or "").lower())
    h1, h2 = len(_P1.findall(u)), len(_P2.findall(u))
    score = h1 + 3 * h2
    return {
        "url_hits_w1": h1,
        "url_hits_w2": h2,
        "url_score": score,
        "url_flagged": score >= URL_SCORE_FLAG,
    }


def url_score_exprs(url: Column) -> dict[str, Column]:
    """Native Spark columns (two codegen regex passes, no UDF)."""
    u = F.regexp_replace(
        F.lower(F.coalesce(url, F.lit(""))), URL_SEP_RE, " "
    )
    h1 = F.size(F.regexp_extract_all(u, F.lit(URL_RE_W1), F.lit(1)))
    h2 = F.size(F.regexp_extract_all(u, F.lit(URL_RE_W2), F.lit(1)))
    score = h1 + h2 * F.lit(3)
    return {
        "url_hits_w1": h1,
        "url_hits_w2": h2,
        "url_score": score,
        "url_flagged": score >= F.lit(URL_SCORE_FLAG),
    }
