"""Character-trigram language-model perplexity (KenLM-style, offline).

The north rule scores documents with a KenLM n-gram perplexity; offline
we ship a deterministic char-trigram LM with add-k smoothing trained at
import time on seeded English text from the generator's own closed
vocabulary (wordlists + template literals). Same UDF surface a real
KenLM binary would have: ``perplexity(text) -> float`` (per-char ppl).
"""

from __future__ import annotations

import math

import numpy as np

from ..textgrammar.templates import TEMPLATES
from ..wordlists import FILLER_EN, FIRST_NAMES, LAST_NAMES

_K = 0.1
_ALPHABET = 96  # effective smoothing vocabulary


def _build() -> dict[str, float]:
    rng = np.random.default_rng([42, 777])
    corpus: list[str] = []
    for _ in range(300):
        corpus.append(
            " ".join(
                FILLER_EN[int(rng.integers(0, len(FILLER_EN)))]
                for _ in range(10)
            )
        )
    # template literals + names so positive docs score in-distribution
    import re as _re

    for t in TEMPLATES:
        corpus.append(_re.sub(r"\{[a-z_]+\}", "x", t))
    corpus.extend(FIRST_NAMES)
    corpus.extend(LAST_NAMES)

    bigram: dict[str, int] = {}
    trigram: dict[str, int] = {}
    for line in corpus:
        s = f"  {line.lower()} "
        for i in range(len(s) - 2):
            bigram[s[i : i + 2]] = bigram.get(s[i : i + 2], 0) + 1
            trigram[s[i : i + 3]] = trigram.get(s[i : i + 3], 0) + 1
    logp = {}
    for tri, c in trigram.items():
        logp[tri] = math.log((c + _K) / (bigram[tri[:2]] + _K * _ALPHABET))
    return logp


_LOGP = _build()
_UNSEEN = math.log(_K / (_K * _ALPHABET))  # unseen trigram, unseen bigram


def perplexity(text: str) -> float:
    """Per-character perplexity under the English char-trigram LM."""
    s = f"  {(text or '')[:2000].lower()} "
    n = len(s) - 2
    if n <= 0:
        return float("inf")
    total = 0.0
    for i in range(n):
        total += _LOGP.get(s[i : i + 3], _UNSEEN)
    return math.exp(-total / n)


def perplexity_batch(texts) -> list[float]:
    return [perplexity(t) for t in texts]
