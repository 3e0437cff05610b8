"""Toxicity scoring — the "toxicity" half of the north rule's
"PII/toxicity-scrub" requirement.

Operator shape, not lexicon quality, is the point: a weighted
word-boundary lexicon match evaluated as pure Catalyst expressions
(whole-stage codegen, no UDF), exactly the plan a production deployment
runs with a maintained lexicon (e.g. a Jigsaw-style blocklist) swapped
in via config. The demonstration lexicon here is deliberately small and
mild; at 100 TB the same two regexp_extract_all passes per row scale
linearly with zero shuffle.

Three coordinated implementations, pinned equal by tests:
  * ``toxicity_stats`` — pure Python (the keep/drop twin used by
    tests/test_pipeline_e2e.py);
  * ``toxicity_exprs`` — native Spark columns (the pipeline path);
  * the DuckDB SQL fragment in ``__spark_entry__.oracle_sql()``
    (quality_heuristics oracle) — same ASCII lexicon and
    ``\\b``-bounded regex.

Boundary-semantics caveat: Python re and Java regex (the two PIPELINE
implementations — the ones that must agree for keep/drop) both use
Unicode word boundaries and match identically. DuckDB's RE2 uses
ASCII-only ``\\b``, so a lexicon word directly abutting a non-ASCII
letter (e.g. ``hateé``) counts in the oracle but not in the engine;
RE2 has no lookarounds to emulate the Unicode rule. The driver
testdata is ASCII so the oracle holds there; a non-ASCII corpus needs
the oracle's tox columns dropped or the lexicon matched on a
pre-tokenized words array on both sides.

Score: (weight-1 hits + 2 * weight-2 hits) / max(n_words, 1). A doc
whose score exceeds ``QUALITY["max_tox_score"]`` is dropped with
drop_reason='toxicity'.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII-only so lower() agrees across Python/Java/RE2; word-boundary
# matched, so substrings ("skill", "trashy") never count
TOX_W1 = ("damn", "crap", "trash", "garbage", "dumb", "ugly", "loser")
TOX_W2 = ("hate", "kill", "stupid", "idiot", "moron", "scum",
          "disgusting")

TOX_RE_W1 = r"\b(" + "|".join(TOX_W1) + r")\b"
TOX_RE_W2 = r"\b(" + "|".join(TOX_W2) + r")\b"

_P1 = re.compile(TOX_RE_W1)
_P2 = re.compile(TOX_RE_W2)


from .textnorm import ascii_words  # shared twin whitespace contract


def toxicity_stats(text: str) -> dict[str, float]:
    """Pure-Python twin of ``toxicity_exprs`` (pinned equal, including
    on non-ASCII whitespace — see quality/textnorm.py)."""
    low = (text or "").lower()
    h1 = len(_P1.findall(low))
    h2 = len(_P2.findall(low))
    n_words = len(ascii_words(text)) or 1
    hits = h1 + 2 * h2
    return {"tox_hits": float(hits), "tox_score": hits / n_words}


def toxicity_exprs(text: Column, n_words: Column) -> dict[str, Column]:
    """Native-expression toxicity columns: two regexp_extract_all
    passes (one per weight class) over the lowered text."""
    low = F.lower(text)
    h1 = F.size(F.regexp_extract_all(low, F.lit(TOX_RE_W1), F.lit(0)))
    h2 = F.size(F.regexp_extract_all(low, F.lit(TOX_RE_W2), F.lit(0)))
    hits = (h1 + 2 * h2).cast("int")
    return {
        "tox_hits": hits,
        "tox_score": hits / F.greatest(n_words, F.lit(1)),
    }
