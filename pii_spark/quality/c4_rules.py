"""C4 line-level cleaning rules (Raffel et al. 2020, §2.2) — the other
half of the north rule's "C4/Gopher heuristic quality rules".

C4 cleans at LINE granularity before judging the document (the
paper's constants, §2.2: "discarded any page with fewer than 3
sentences and only retained lines that contained at least 5 words"):

  * keep only lines ending in terminal punctuation (. ! ? ")
  * drop lines with fewer than 5 words
  * drop lines containing boilerplate markers ("javascript",
    "cookie policy", "terms of use", "privacy policy")
  * drop any document containing "lorem ipsum" or a curly brace
    (code), and documents with fewer than 3 surviving lines

Two pinned-equal implementations:
  * ``c4_clean`` — pure Python: (kept_text, n_kept, n_dropped, keep);
  * ``c4_exprs`` — native Catalyst expressions building the SAME
    cleaned text in-row (split → filter → array_join; a doc's line
    count is small, so in-row is the right plan here — unlike the
    n-gram census, see quality/gopher.py's measured lesson).

Like the Gopher extension, these rules are policy-exposed, not wired
into the shipped keep chain (byte-stability of the committed pipeline).

Granularity note: C4 is defined over extracted web text WITH line
structure. A corpus of single-line documents (the driver's synthetic
testdata) fails the ≥3-surviving-lines rule wholesale by construction —
apply a sentence splitter upstream (e.g. split on '. ') before these
rules on such corpora, as the tests do for the generated texts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TERMINAL = (".", "!", "?", '"')
_BOILERPLATE = ("javascript", "cookie policy", "terms of use",
                "privacy policy")
# Raffel et al. 2020 §2.2, verbatim constants: lines need >= 5 words,
# pages need >= 3 surviving sentences (review r4d caught these two
# inverted)
_MIN_LINE_WORDS = 5
_MIN_LINES = 3

# whitespace is the shared ASCII contract (quality/textnorm.py):
# str.strip()/str.split() are Unicode-aware while F.trim trims only
# spaces and Java \s is ASCII, so CRLF/tab/NBSP documents diverged
# between locally spelled twins (reviews r4c/r4d)
from .textnorm import ASCII_WS, ascii_words  # noqa: E402


def _line_ok(line: str) -> bool:
    s = line.strip(ASCII_WS)
    if not s.endswith(_TERMINAL):
        return False
    if len(ascii_words(s)) < _MIN_LINE_WORDS:
        return False
    low = s.lower()
    return not any(b in low for b in _BOILERPLATE)


def c4_clean(text: str) -> dict:
    """Pure-Python twin: line-filter the doc and judge the remainder."""
    lines = (text or "").split("\n")
    kept = [ln for ln in lines if _line_ok(ln)]
    low = (text or "").lower()
    doc_ok = (
        "lorem ipsum" not in low
        and "{" not in (text or "")
        and len(kept) >= _MIN_LINES
    )
    return {
        "cleaned_text": "\n".join(kept),
        "n_kept_lines": len(kept),
        "n_dropped_lines": len(lines) - len(kept),
        "keep": doc_ok,
    }


def c4_exprs(text: Column) -> dict[str, Column]:
    """The same cleaning as in-row Catalyst expressions. NULL text is
    pinned to '' first so the twins agree on null rows (bare F.split
    would propagate NULL into every output — review r4c)."""
    text = F.coalesce(text, F.lit(""))
    lines = F.split(text, "\n")

    def ok(ln: Column) -> Column:
        # strip the ASCII \s class, matching the pure twin (F.trim
        # removes only spaces)
        s = F.regexp_replace(ln, r"^\s+|\s+$", "")
        low = F.lower(s)
        terminal = F.substring(s, -1, 1).isin(*_TERMINAL)
        words = F.size(F.filter(F.split(s, r"\s+"), lambda w: w != ""))
        boiler = None
        for b in _BOILERPLATE:
            c = F.contains(low, F.lit(b))
            boiler = c if boiler is None else (boiler | c)
        return terminal & (words >= _MIN_LINE_WORDS) & ~boiler

    kept = F.filter(lines, ok)
    low_doc = F.lower(text)
    doc_ok = (
        ~F.contains(low_doc, F.lit("lorem ipsum"))
        & ~F.contains(text, F.lit("{"))
        & (F.size(kept) >= _MIN_LINES)
    )
    return {
        "cleaned_text": F.array_join(kept, "\n"),
        "n_kept_lines": F.size(kept),
        "n_dropped_lines": F.size(lines) - F.size(kept),
        "keep": doc_ok,
    }
