"""Gazetteers for the token-classification ("model") stage.

The reference's RoBERTa model effectively memorized Faker's closed
vocabulary from the synthetic training corpus (README.md:219-223 vs
:248-252 — near-perfect synthetic F1, 37% real-world F1). Our offline
stand-in makes that explicit: the model stage's name/place features are
gazetteers built from the same word lists the generator draws from
(pii_spark.wordlists), exactly as a model trained on that corpus would
behave. All lookups are lowercased — inside-span case-scramble noise
(generation.py:699-701) must not break recall.
"""

from __future__ import annotations

from ..wordlists import (
    CITIES,
    COMPANY_SUFFIXES,
    COUNTRIES,
    FILLER_EN,
    FIRST_NAMES,
    LAST_NAMES,
    STATES,
    STREET_FIRST,
    STREET_SUFFIXES,
)

FIRSTS = frozenset(FIRST_NAMES)
LASTS = frozenset(LAST_NAMES)
FILLERS = frozenset(FILLER_EN)

# token-tuple sets (lowercased) for multi-token matching
CITY_SEQS = frozenset(tuple(c.lower().split()) for c in CITIES)
STATE_NAME_SEQS = frozenset(tuple(n.lower().split()) for n, _ in STATES)
COUNTRY_NAME_SEQS = frozenset(tuple(n.lower().split()) for n, _ in COUNTRIES)
# single-token place names (glue-tolerant lookup path)
CITY_1 = frozenset(s[0] for s in CITY_SEQS if len(s) == 1)
STATE_1 = frozenset(s[0] for s in STATE_NAME_SEQS if len(s) == 1)
COUNTRY_1 = frozenset(s[0] for s in COUNTRY_NAME_SEQS if len(s) == 1)
STATE_ABBRS = frozenset(a for _, a in STATES)
COUNTRY_CODES = frozenset(c for _, c in COUNTRIES)

STREET_FIRSTS = frozenset(w.lower() for w in STREET_FIRST)
STREET_SUFFIXES_L = frozenset(w.lower() for w in STREET_SUFFIXES)

# company suffix token tuples ("and Sons" is two tokens)
ORG_SUFFIX_SEQS = frozenset(tuple(s.lower().split()) for s in COMPANY_SUFFIXES)

# tokens that must never be read as PERSON initials: hard-negative
# anchors (generation.py:756-775) plus 2-4 letter template-literal words
# — noise case-scrambles them ('CaLl', 'NAme') and the initials matcher
# compares fuzzily (edit-1 + anagram), so the list errs on the large side
INITIALS_BLOCKLIST = frozenset(
    {"MAC", "SHA1", "GUID", "IPV4", "REF", "ACCT", "CARD", "SSN", "DOB",
     "ID", "PSA", "TIFU", "DM", "AT", "TO", "EXP", "DON", "SHARE",
     "CALL", "NAME", "YOUR", "ZOOM", "FROM", "HIRE", "AGE", "DATE", "PHONE",
     "BORN", "DEPT", "HMU", "DIAL", "ATTN", "MEET", "LINK", "SENT",
     "JUST", "INFO", "MINE", "LOST", "WTF", "IDK", "USER", "DEAR",
     "WITH", "EMAIL", "TEL", "FULL", "SHIP", "YO", "UR", "OK", "SO",
     "HI", "ME", "MY", "IF", "US", "UP", "ALL", "BUT", "NOT", "FOR",
     "AND", "THE", "WAS", "HAS", "HAVE", "THEY", "WONT", "THEM", "THIS",
     "ON", "BY", "IN", "OR", "OF", "AN", "AS", "IS", "IT", "PH"}
)

MAX_SEQ_LEN = max(
    max((len(s) for s in CITY_SEQS), default=1),
    max((len(s) for s in STATE_NAME_SEQS), default=1),
    max((len(s) for s in COUNTRY_NAME_SEQS), default=1),
)
