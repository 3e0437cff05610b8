"""Deterministic corpus generator (pure Python; Spark wraps it in an
Arrow UDF — see pii_spark.spark.gen_job).

Reproduces the reference's corpus semantics:
  * template fill with char-span tracking        (generation.py:520-548)
  * variable-length docs: 1 / 2-3 / 4-7 templates (generation.py:550-592)
  * 20% email/phone obfuscation                   (generation.py:804-817)
  * outside- and inside-span noise                (generation.py:620-706)
  * O-only examples: 2-sentence filler ±"Ref #N." (generation.py:831-840)
  * hard negatives: GUID/MAC/SHA1/IPv4/invalid-card/@handle/Ref/Acct
                                                  (generation.py:756-775)
  * mix 35% positive / 50% O-only / 15% hard-neg  (config_and_labels.py:12-14)

Divergences (documented, SURVEY §2 M5/M6 + §1): randomness is keyed on
(seed, doc_id) instead of global state; length-changing edits re-shift
spans; repeated template slots record ALL occurrences (the reference's
dict keeps only the last, losing spans for templates like
"Attendees: {person}, {person}, {person}"); O-only filler is English
rather than latin lorem so the language-ID stage is meaningful.

The corpus row shape is fixed by BASELINE.json input_hint:
(url string, warc_ts timestamp, html binary, text string, lang string).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

import numpy as np

from ..config import (
    HARDNEG_RATIO,
    NOISE_PII_DOC_PROB,
    O_ONLY_RATIO,
    OBFUSCATE_PROB,
    SEED_DEFAULT,
)
from ..wordlists import DOMAINS, FILLER_EN, LANG_WORDS, URL_PATH_WORDS
from .fields import (
    LOWER,
    _letters,
    _ri,
    pick,
    sample_credit_card,
    sample_fields,
    sample_user_name,
)
from .noise import (
    Span,
    apply_noise_inside_spans,
    apply_noise_outside_spans,
    obfuscate_email,
    obfuscate_phone,
)
from .templates import TEMPLATES

FIELD2LABEL = {
    "person": "PERSON",
    "org": "ORG",
    "address": "ADDRESS",
    "email": "EMAIL",
    "phone": "PHONE",
    "ssn": "SSN",
    "credit_card": "CREDIT_CARD",
    "date": "DATE",
    "age": "AGE",
}


def rng_for(seed: int, doc_id: int) -> np.random.Generator:
    """Per-row generator keyed on (seed, doc_id) — retry/partition safe."""
    return np.random.default_rng([seed, doc_id])


# ---------------------------------------------------------------- template fill

def fill_template(template: str, fields: dict[str, str]) -> tuple[str, list[Span]]:
    """generation.py:520-548 — splice values, track char spans.

    Records a span for EVERY slot occurrence (divergence: the reference
    keeps only the last occurrence per field)."""
    text_parts: list[str] = []
    spans: list[Span] = []
    cursor = 0
    i = 0
    while i < len(template):
        if template[i] == "{" and "}" in template[i:]:
            j = template.index("}", i)
            key = template[i + 1 : j]
            value = fields[key]
            spans.append((cursor, cursor + len(value), FIELD2LABEL[key]))
            text_parts.append(value)
            cursor += len(value)
            i = j + 1
        else:
            text_parts.append(template[i])
            cursor += 1
            i += 1
    return "".join(text_parts), spans


def build_positive_example(rng: np.random.Generator) -> tuple[str, list[Span]]:
    """generation.py:785-829 — fill, obfuscate 20%, noise outside, 10% inside."""
    template = pick(rng, TEMPLATES)
    fields = sample_fields(rng)
    text, spans = fill_template(template, fields)

    # obfuscate EMAIL/PHONE spans (20%), re-shifting later spans
    out = text
    delta = 0
    new_spans: list[Span] = []
    for s, e, lab in spans:  # spans are in start order by construction
        s += delta
        e += delta
        if lab == "EMAIL" and rng.random() < OBFUSCATE_PROB:
            ob = obfuscate_email(rng, out[s:e])
            out = out[:s] + ob + out[e:]
            delta += len(ob) - (e - s)
            e = s + len(ob)
        elif lab == "PHONE" and rng.random() < OBFUSCATE_PROB:
            ob = obfuscate_phone(rng, out[s:e])
            out = out[:s] + ob + out[e:]
            delta += len(ob) - (e - s)
            e = s + len(ob)
        new_spans.append((s, e, lab))

    out = apply_noise_outside_spans(rng, out, new_spans)
    if rng.random() < NOISE_PII_DOC_PROB:
        out, new_spans = apply_noise_inside_spans(rng, out, new_spans)
    return out, new_spans


def build_variable_length_example(rng: np.random.Generator) -> tuple[str, list[Span]]:
    """generation.py:550-592 — short=1 / medium=2-3 / long=4-7 templates."""
    kind = pick(rng, ("short", "medium", "long"))
    if kind == "short":
        n = 1
    elif kind == "medium":
        n = _ri(rng, 2, 3)
    else:
        n = _ri(rng, 4, 7)
    texts: list[str] = []
    all_spans: list[Span] = []
    cursor = 0
    for _ in range(n):
        t, sp = build_positive_example(rng)
        texts.append(t)
        all_spans.extend((s + cursor, e + cursor, lab) for s, e, lab in sp)
        cursor += len(t) + 1  # +1 for joining space
    return " ".join(texts), all_spans


# ---------------------------------------------------------------- O-only / hard-neg

def _sentence(rng: np.random.Generator, words: tuple[str, ...]) -> str:
    n = _ri(rng, 6, 12)
    toks = [pick(rng, words) for _ in range(n)]
    toks[0] = toks[0][:1].upper() + toks[0][1:]
    return " ".join(toks) + "."


def build_o_only_example(rng: np.random.Generator) -> tuple[str, list[Span]]:
    """generation.py:831-840 — 2-sentence filler, 30% + ' Ref #NNNNN.'"""
    text = _sentence(rng, FILLER_EN) + " " + _sentence(rng, FILLER_EN)
    if rng.random() < 0.3:
        text += f" Ref #{_ri(rng, 10000, 99999)}."
    text = apply_noise_outside_spans(rng, text, [])
    return text, []


def _uuid4(rng) -> str:
    hx = "0123456789abcdef"
    p = lambda k: _letters(rng, hx, k)  # noqa: E731
    return f"{p(8)}-{p(4)}-4{p(3)}-{pick(rng, '89ab')}{p(3)}-{p(12)}"


def _mac(rng) -> str:
    hx = "0123456789abcdef"
    return ":".join(_letters(rng, hx, 2) for _ in range(6))


def _ipv4(rng) -> str:
    return ".".join(str(_ri(rng, 1, 254)) for _ in range(4))


def hard_negative_strings(rng: np.random.Generator) -> list[str]:
    """generation.py:756-775 — the 10 'looks sensitive, labeled O' shapes."""
    hx = "0123456789abcdef"
    valid_card = sample_credit_card(rng)
    return [
        f"GUID {_uuid4(rng)}",
        f"MAC {_mac(rng)}",
        f"SHA1 {_letters(rng, hx, 40)}",
        f"IPv4 {_ipv4(rng)}",
        f"Card {valid_card[:-1]} (missing digit)",
        f"Handle @{sample_user_name(rng)}",
        f"Ref #{_ri(rng, 10000, 99999)}",
        f"Acct {_ri(rng, 10_000_000, 99_999_999)} checksum pending",
        f"public: MAC {_mac(rng)}",
        f"professor: SHA1 {_letters(rng, hx, 40)}",
    ]


def build_hard_negative_example(rng: np.random.Generator) -> tuple[str, list[Span]]:
    text = pick(rng, hard_negative_strings(rng))
    text = apply_noise_outside_spans(rng, text, [])
    return text, []


def build_non_english_text(rng: np.random.Generator, lang: str) -> str:
    if lang == "zz":  # junk: random letter/symbol tokens
        toks = []
        for _ in range(_ri(rng, 8, 20)):
            toks.append(_letters(rng, LOWER + "##@@%%^^**", _ri(rng, 2, 12)))
        return " ".join(toks)
    words = LANG_WORDS[lang]
    n_sent = _ri(rng, 2, 4)
    return " ".join(_sentence(rng, words) for _ in range(n_sent))


# ---------------------------------------------------------------- full rows

_EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
_LANG_POOL = ("de", "fr", "es", "zz")
# cumulative kind thresholds over the en docs: pos 35% / O-only 50% / hn 15%
_POS_FRAC = 1.0 - O_ONLY_RATIO - HARDNEG_RATIO


def build_example(seed: int, doc_id: int) -> dict[str, Any]:
    """One corpus row + ground-truth spans, fully determined by (seed, doc_id)."""
    rng = rng_for(seed, doc_id)

    lang_roll = rng.random()
    if lang_roll < 0.8:
        lang = "en"
        kind_roll = rng.random()
        if kind_roll < _POS_FRAC:
            kind = "positive"
            text, spans = build_variable_length_example(rng)
        elif kind_roll < _POS_FRAC + O_ONLY_RATIO:
            kind = "o_only"
            text, spans = build_o_only_example(rng)
        else:
            kind = "hard_negative"
            text, spans = build_hard_negative_example(rng)
    else:
        lang = _LANG_POOL[int(lang_roll * 20) % 4]
        kind = "non_english"
        text, spans = build_non_english_text(rng, lang), []

    # skewed URL: first domain "hot" ≈30% (FIXTURES.md §1 → salted repartition)
    domain = DOMAINS[0] if rng.random() < 0.30 else pick(rng, DOMAINS[1:])
    url = f"https://{domain}/{pick(rng, URL_PATH_WORDS)}/{doc_id}"
    warc_ts = _EPOCH + _dt.timedelta(seconds=(doc_id * 9973) % (30 * 86400))
    html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"

    return {
        "doc_id": doc_id,
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": text,
        "lang": lang,
        "kind": kind,
        "spans": [
            {"start": s, "end": e, "label": lab} for s, e, lab in spans
        ],
    }
