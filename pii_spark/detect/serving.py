"""Batched token-classification serving — the "model stage".

Reproduces the reference's serving semantics end to end
(evaluation/model_evaluation.py:243-281), replacing the RoBERTa forward
pass with the deterministic candidate scorer (candidates.py), which
plays the role of a model trained to convergence on this synthetic
distribution:

  tokenize (offsets)                       → tokenizer.py
  per-token logits [seq, 37]               → _logits_for_doc
  softmax → max prob                       → numpy, vectorized
  confidence < 0.3 and pred != O → force O → model_evaluation.py:259-269
  id2label decode                          → :272
  special-token strip ((0,0) offsets)      → :275-281
  BILOU → entity spans                     → labeling.decode_bilou

Unlike the reference's batch-size-1 loop (:233, the #1 anti-pattern
SURVEY §4 flags), ``serve_batch`` processes whole Arrow batches and is
what the Spark pipeline calls from mapInPandas.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

from ..config import CONFIDENCE_THRESHOLD, ID2LABEL, LABEL2ID, NUM_LABELS
from ..labeling import decode_bilou, spans_to_token_labels
from ..tokenizer import tokenize_with_offsets
from .candidates import Candidate, detect_spans

# logit placed on the winning BILOU tag such that softmax over 37 labels
# yields exactly the candidate's confidence: L = ln(c*(K-1)/(1-c))
_K1 = NUM_LABELS - 1


def _conf_logit(conf: float) -> float:
    conf = min(max(conf, 1e-4), 1 - 1e-4)
    return math.log(conf * _K1 / (1.0 - conf))


class DocResult(NamedTuple):
    tokens: list[str]
    offsets: list[tuple[int, int]]
    tags: list[str]                      # post-threshold BILOU tags
    entities: list[tuple[str, int, int, int, int]]
    # (label, tok_first, tok_last, char_start, char_end)


def _logits_for_doc(
    text: str, offsets: list[tuple[int, int]], cands: list[Candidate]
) -> np.ndarray:
    n = len(offsets)
    logits = np.zeros((n, NUM_LABELS), dtype=np.float32)
    logits[:, LABEL2ID["O"]] = _conf_logit(0.985)
    spans = [{"start": c.start, "end": c.end, "label": c.label} for c in cands]
    tags, _ = spans_to_token_labels(offsets, spans)
    # map each token back to its candidate to carry per-candidate conf
    for c in cands:
        logit = _conf_logit(c.conf)
        for t, (ts, te) in enumerate(offsets):
            if ts == te == 0:
                continue
            if te > c.start and ts < c.end and tags[t] != "O":
                logits[t, LABEL2ID["O"]] = 0.0
                logits[t, LABEL2ID.get(tags[t], 0)] = logit
    return logits


def serve_doc(text: str, scrub_ip: bool = True) -> DocResult:
    tokens, offsets, _ = tokenize_with_offsets(text)
    cands = detect_spans(text)
    if not scrub_ip:
        cands = [c for c in cands if c.label != "IP"]
    logits = _logits_for_doc(text, offsets, cands)

    # softmax + confidence threshold (model_evaluation.py:253-269)
    z = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(z)
    probs /= probs.sum(axis=1, keepdims=True)
    pred = probs.argmax(axis=1)
    maxp = probs.max(axis=1)
    pred = np.where((maxp < CONFIDENCE_THRESHOLD) & (pred != 0), 0, pred)

    tags = [ID2LABEL[int(p)] for p in pred]
    # special tokens → O for decoding (offset (0,0), :275-281)
    tags = [
        "O" if ts == te == 0 else tag
        for tag, (ts, te) in zip(tags, offsets)
    ]
    ents = decode_bilou(tags)
    entities = [
        (lab, a, b, offsets[a][0], offsets[b][1]) for lab, a, b in ents
    ]
    return DocResult(tokens, offsets, tags, entities)


def serve_batch(texts, scrub_ip: bool = True) -> list[DocResult]:
    """Arrow-batch serving entry point (called from mapInPandas)."""
    return [serve_doc(t or "", scrub_ip) for t in texts]
