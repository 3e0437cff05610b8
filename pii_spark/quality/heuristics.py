"""C4/Gopher-style heuristic quality rules.

Pure-Python reference implementations (used by the generator to derive
``expected_keep`` goldens and by unit tests); the Spark pipeline
evaluates the SAME rules as native Catalyst expressions
(pii_spark.spark.pipeline.quality_exprs) so they run inside whole-stage
codegen — the two implementations are pinned equal by
tests/test_quality.py.

Rules (thresholds in pii_spark.config.QUALITY):
  * word count within [min_words, max_words]        (Gopher)
  * mean word length within band                     (Gopher)
  * symbol ratio ≤ max                               (Gopher # / … rule)
  * repetition ratio 1 - distinct/total ≤ max        (Gopher dedup rule)
  * digit ratio ≤ max, alpha ratio ≥ min             (C4-ish)
The generalization of the reference's only quality filter — the
min-length skip at evaluation/model_evaluation.py:239-240 — is the
min_words rule.
"""

from __future__ import annotations

from ..config import QUALITY


# shared whitespace contract — see quality/textnorm.py (the twins must
# match Java \s, not Python's Unicode whitespace; hypothesis fuzz r4)
from .textnorm import ASCII_WS_SET, ascii_words


def quality_stats(text: str) -> dict[str, float]:
    words = ascii_words(text)
    n_words = len(words)
    n_chars = len(text)
    nonspace = [c for c in text if c not in ASCII_WS_SET]
    n_ns = len(nonspace) or 1
    n_alpha = sum(c.isalpha() for c in nonspace)
    n_digit = sum(c.isdigit() for c in nonspace)
    n_sym = n_ns - n_alpha - n_digit
    mean_wl = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    distinct = len({w.lower() for w in words})
    rep_ratio = 1.0 - (distinct / n_words) if n_words else 1.0
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "mean_word_len": mean_wl,
        "symbol_ratio": n_sym / n_ns,
        "digit_ratio": n_digit / n_ns,
        "alpha_ratio": n_alpha / n_ns,
        "rep_ratio": rep_ratio,
    }


def passes_heuristics(text: str, q: dict | None = None) -> bool:
    q = q or QUALITY
    s = quality_stats(text)
    return (
        q["min_words"] <= s["n_words"] <= q["max_words"]
        and q["min_mean_word_len"] <= s["mean_word_len"] <= q["max_mean_word_len"]
        and s["symbol_ratio"] <= q["max_symbol_ratio"]
        and s["rep_ratio"] <= q["max_rep_ratio"]
        and s["digit_ratio"] <= q["max_digit_ratio"]
        and s["alpha_ratio"] >= q["min_alpha_ratio"]
    )
