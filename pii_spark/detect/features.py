"""Token featurization for the trained classifier head.

Hashed sparse features per token, designed for the corpus's noise
profile: character 3-grams of the token AND its neighbors survive the
8%-per-char substitution noise that defeats exact context matching
('Attendees'→'AtGendees' still shares 'tte','nde','ees' grams).

Feature families (all hashed into one 2^17 space):
  * token identity (lowercased), neighbors ±1, ±2
  * char 3-grams of token and neighbors ±1
  * shape signatures (case/digit pattern, length bucket) for t-1, t, t+1
  * gazetteer memberships (first/last/city/street/state/cc/filler/unit)
  * rule-candidate overlay: the hand-built detector's label+confidence
    at this token (the trained head learns when to trust/override it)
  * adjacent separator characters
"""

from __future__ import annotations

import re

import numpy as np

from .gazetteer import (
    CITY_1,
    COUNTRY_CODES,
    FILLERS,
    FIRSTS,
    LASTS,
    STATE_ABBRS,
    STREET_FIRSTS,
    STREET_SUFFIXES_L,
)

DIM = 1 << 18
FEATURE_VERSION = 2  # bump on ANY change to hashing/feature families
_MASK = DIM - 1


_H_CACHE: dict[str, int] = {}


def _h(s: str) -> int:
    v = _H_CACHE.get(s)
    if v is not None:
        return v
    h = 2166136261
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    v = h & _MASK
    if len(_H_CACHE) > 2_000_000:
        _H_CACHE.clear()
    _H_CACHE[s] = v
    return v


_SHAPE_RE = [
    (re.compile(r"^[a-z]+$"), "x"),
    (re.compile(r"^[A-Z][a-z]+$"), "Xx"),
    (re.compile(r"^[A-Z]+$"), "X"),
    (re.compile(r"^\d+$"), "d"),
    (re.compile(r"^[a-z]+\d+$"), "xd"),
    (re.compile(r"^[A-Z]\d+$"), "Xd"),
    (re.compile(r"^\d+[a-z]+$"), "dx"),
]


_SHAPE_CACHE: dict[str, str] = {}


def _shape(tok: str) -> str:
    v = _SHAPE_CACHE.get(tok)
    if v is not None:
        return v
    v = None
    for rx, name in _SHAPE_RE:
        if rx.match(tok):
            v = f"{name}{min(len(tok), 9)}"
            break
    if v is None:
        if len(tok) == 1 and not tok.isalnum():
            v = f"p{tok}"
        else:
            v = f"m{min(len(tok), 9)}"
    if len(_SHAPE_CACHE) > 500_000:
        _SHAPE_CACHE.clear()
    _SHAPE_CACHE[tok] = v
    return v


_GRAM_CACHE: dict[tuple[str, str], list[str]] = {}


def _grams(tok: str, pre: str) -> list[str]:
    key = (pre, tok)
    v = _GRAM_CACHE.get(key)
    if v is None:
        s = f"^{tok.lower()}$"
        v = [f"{pre}{s[i:i+3]}" for i in range(min(len(s) - 2, 12))]
        if len(_GRAM_CACHE) > 500_000:
            _GRAM_CACHE.clear()
        _GRAM_CACHE[key] = v
    return v


def _gaz_feats(low: str) -> list[str]:
    out = []
    if low in FIRSTS:
        out.append("g=f")
    if low in LASTS:
        out.append("g=l")
    if low in FILLERS:
        out.append("g=w")
    if low in CITY_1:
        out.append("g=c")
    if low in STREET_FIRSTS:
        out.append("g=s")
    if low in STREET_SUFFIXES_L:
        out.append("g=sx")
    up = low.upper()
    if up in STATE_ABBRS:
        out.append("g=st")
    if up in COUNTRY_CODES:
        out.append("g=cc")
    return out


def featurize_doc(
    text: str,
    tokens: list[str],
    offsets: list[tuple[int, int]],
    cand_tags: list[str],
    cand_confs: list[float],
) -> list[np.ndarray]:
    """Per-token hashed feature-index arrays. tokens/offsets include the
    BOS/EOS specials (offset (0,0)); cand_tags is the rule detector's
    BILOU overlay with '' where no candidate covers the token."""
    n = len(tokens)
    lows = [t.lower() for t in tokens]
    shapes = [_shape(t) for t in tokens]
    out = []
    for i in range(n):
        if offsets[i] == (0, 0):
            out.append(np.empty(0, dtype=np.int32))
            continue
        f: list[str] = ["b"]
        f.append(f"t={lows[i]}")
        f.append(f"s={shapes[i]}")
        f.append(f"tp={lows[i][:4]}")   # prefix/suffix stubs survive
        f.append(f"ts={lows[i][-4:]}")  # trailing glue better than ids
        f.extend(_grams(tokens[i], "g3="))
        f.extend(_gaz_feats(lows[i]))
        for d, tag in ((-2, "pp"), (-1, "p"), (1, "n"), (2, "nn")):
            j = i + d
            if 0 <= j < n:
                f.append(f"{tag}={lows[j]}")
                f.append(f"{tag}s={shapes[j]}")
                f.extend(_grams(tokens[j], f"{tag}3="))
                if d in (-1, 1):
                    f.extend(f"{tag}{x}" for x in _gaz_feats(lows[j]))
            else:
                f.append(f"{tag}=~")
        # adjacent raw characters (separator signals: ':', '#', '@', '|')
        s0, e0 = offsets[i]
        f.append(f"pc={text[s0-1] if s0 > 0 else '^'}")
        f.append(f"nc={text[e0] if e0 < len(text) else '$'}")
        # rule-candidate overlay
        if cand_tags[i]:
            f.append(f"c={cand_tags[i]}")
            f.append(f"cl={cand_tags[i].split('-')[-1]}")
            f.append(f"cc={cand_tags[i]}:{'hi' if cand_confs[i] >= 0.8 else 'lo'}")
        else:
            f.append("c=~")
        prev_tag = cand_tags[i - 1] if i > 0 else "^"
        next_tag = cand_tags[i + 1] if i + 1 < n else "$"
        f.append(f"cp={prev_tag or '~'}")
        f.append(f"cn={next_tag or '~'}")
        out.append(np.fromiter((_h(x) for x in f), dtype=np.int32))
    return out
