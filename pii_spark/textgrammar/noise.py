"""Noise + obfuscation transforms, span-safe.

Reproduces the reference's noise semantics:
  * outside-span noise (generation.py:620-673): length-preserving char
    substitution (p=.08, keyboard-neighbor table :596-606 with 0.7
    neighbor pick), case flip (p=.05), adjacent swap (p=.03) — only on
    characters not covered by a PII span.
  * inside-span noise (generation.py:676-706): per doc p=.1, per span
    p=.15 — typo substitutions (gmail→gmial, yahoo→yaho, com→con),
    spacing ('-' → ' - ', '.' → ' . '), case scramble.
  * email obfuscation (generation.py:708-739) and phone obfuscation
    (:742-751), applied to 20% of EMAIL/PHONE fields.

Intentional divergence from the reference (documented in SURVEY §2 M5/M6):
the reference's length-changing transforms (spacing noise :696-704,
obfuscation splices :811-817) do NOT re-shift the other spans, silently
corrupting their offsets. Here every length-changing edit re-shifts all
affected spans, so ground-truth offsets stay byte-exact.
"""

from __future__ import annotations

import string

import numpy as np

from ..config import (
    NOISE_CASE_PROB,
    NOISE_CHAR_SUB_PROB,
    NOISE_PII_SPAN_PROB,
    NOISE_SWAP_PROB,
)
from .fields import pick

KEYBOARD_NEIGHBORS = {
    "a": "qs", "s": "qweadz", "d": "ersfxc", "f": "rtdgcv", "g": "tyfhbv",
    "h": "yugjbn", "j": "uikhmn", "k": "ioljm", "l": "opk",
}
_FALLBACK_POOL = string.ascii_letters + string.digits + " .,-_"

Span = tuple[int, int, str]  # (start, end, label)


def _random_neighbor(rng: np.random.Generator, c: str) -> str:
    lower = c.lower()
    if lower in KEYBOARD_NEIGHBORS and rng.random() < 0.7:
        repl = pick(rng, KEYBOARD_NEIGHBORS[lower])
        return repl.upper() if c.isupper() else repl
    return pick(rng, _FALLBACK_POOL)


def apply_noise_outside_spans(
    rng: np.random.Generator, text: str, spans: list[Span]
) -> str:
    """Length-preserving noise on characters outside all spans."""
    n = len(text)
    if n == 0:
        return text
    protected = bytearray(n)
    for s, e, _ in spans:
        for i in range(max(0, s), min(n, e)):
            protected[i] = 1

    chars = list(text)
    i = 0
    while i < n:
        if protected[i]:
            i += 1
            continue
        if rng.random() < NOISE_CHAR_SUB_PROB:
            chars[i] = _random_neighbor(rng, chars[i])
        if rng.random() < NOISE_CASE_PROB:
            c = chars[i]
            if c.isalpha():
                chars[i] = c.upper() if c.islower() else c.lower()
        if rng.random() < NOISE_SWAP_PROB and i + 1 < n and not protected[i + 1]:
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
            i += 2
            continue
        i += 1
    return "".join(chars)


# typo chain mirrors generation.py:690-694 (the second gmail/yahoo replace
# in the reference is a no-op after the first fires)
_TYPO_CHAIN = (("gmail", "gmial"), ("yahoo", "yaho"), ("com", "con"))


def _noise_one_span(rng: np.random.Generator, piece: str) -> str:
    kind = pick(rng, ("typo", "spacing", "case"))
    if kind == "typo":
        for src, dst in _TYPO_CHAIN:
            piece = piece.replace(src, dst)
        return piece
    if kind == "spacing":
        return piece.replace("-", " - ").replace(".", " . ")
    return "".join(
        c.upper() if rng.random() < 0.3 else c.lower() for c in piece
    )


def apply_noise_inside_spans(
    rng: np.random.Generator,
    text: str,
    spans: list[Span],
    span_prob: float = NOISE_PII_SPAN_PROB,
) -> tuple[str, list[Span]]:
    """Mutate span contents with p=span_prob each; re-shift all offsets."""
    new_spans = list(spans)
    order = sorted(range(len(spans)), key=lambda k: spans[k][0])
    delta_total = 0
    out = text
    for k in order:
        s, e, lab = new_spans[k]
        s += delta_total
        e += delta_total
        if rng.random() < span_prob:
            piece = out[s:e]
            mutated = _noise_one_span(rng, piece)
            d = len(mutated) - len(piece)
            out = out[:s] + mutated + out[e:]
            e += d
            delta_total += d
        new_spans[k] = (s, e, lab)
    return out, new_spans


# ---------------------------------------------------------------- obfuscation

def obfuscate_email(rng: np.random.Generator, email: str) -> str:
    """generation.py:708-739 — 12 obfuscated email surface forms."""
    if "@" not in email:
        return email
    local, domain = email.split("@", 1)
    parts = domain.split(".")
    variations = [
        email,
        f"{local} at {domain}",
        f"{local}[at]{domain}",
        f"{local} (at) {domain}",
        f"{local} AT {domain}",
        f"{local} @ {domain}",
        f"{local} [AT] {domain}",
    ]
    if len(parts) >= 2:
        variations += [
            f"{local} dot {parts[0]} dot {parts[1]}",
            f"{local}[at]{parts[0]}[dot]{parts[1]}",
            f"{local} @ {parts[0]} . {parts[1]}",
        ]
    variations.append(email.replace(".", " dot "))
    variations.append(email.replace("@", " at ").replace(".", " dot "))
    return pick(rng, variations)


def obfuscate_phone(rng: np.random.Generator, phone: str) -> str:
    """generation.py:742-751 — digit-only respacings."""
    digits = "".join(c for c in phone if c.isdigit())
    if not digits:
        return phone
    variants = [
        " ".join(digits),
        "-".join(digits[i : i + 3] for i in range(0, len(digits), 3)),
        digits[:3] + " " + digits[3:6] + " " + digits[6:],
    ]
    return pick(rng, variants)
