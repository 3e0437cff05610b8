"""Span scrubbing (M15).

The reference frames the system as "detecting and masking sensitive
entities" (README.md:6) but ships no masking code; this makes it
concrete: detected spans are replaced with typed placeholders
('[EMAIL]', '[PHONE]', …) in one deterministic pass. Byte-stable: the
output is a pure function of (text, spans), spans are applied in
ascending start order, and overlaps were already resolved upstream —
so the scrubbed text is identical across partitionings, retries and
cluster sizes (the north rule's byte-identical-per-url invariant).
"""

from __future__ import annotations

from ..config import SCRUB_TYPES, placeholder


def scrub_text(text: str, spans: list[tuple]) -> str:
    """spans: iterable of (label, char_start, char_end) — any extra
    leading/trailing tuple fields are tolerated (serving emits
    (label, tok_first, tok_last, char_start, char_end))."""
    norm = []
    for sp in spans:
        if len(sp) == 3:
            lab, s, e = sp
        else:
            lab, _, _, s, e = sp
        if lab in SCRUB_TYPES and 0 <= s < e <= len(text):
            norm.append((s, e, lab))
    norm.sort()
    out = []
    cursor = 0
    for s, e, lab in norm:
        if s < cursor:
            continue  # defensive: overlaps already resolved upstream
        out.append(text[cursor:s])
        out.append(placeholder(lab))
        cursor = e
    out.append(text[cursor:])
    return "".join(out)
