"""Deterministic PII field samplers.

Re-implements the reference's Faker-backed field grammar
(pii_synth/generation.py:35-390) with seeded numpy Generators — every
format branch in the reference appears here (FIXTURES.md §3 is the
coverage contract; the regex/model detectors must cover each branch).

All samplers take an ``rng`` (numpy.random.Generator keyed on
(seed, doc_id) by the caller) — never global RNG state, so generation is
retry- and partitioning-safe, unlike the reference's global seeding
(generation.py:898-899).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..wordlists import (
    CITIES,
    COMPANY_SUFFIXES,
    COUNTRIES,
    EMAIL_DOMAINS,
    FILLER_EN,
    FIRST_NAMES,
    LAST_NAMES,
    STATES,
    STREET_FIRST,
    STREET_SUFFIXES,
)

MONTH_NAMES = (
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
)
MONTH_SHORT = tuple(m[:3] for m in MONTH_NAMES)

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def pick(rng: np.random.Generator, seq: Sequence):
    return seq[int(rng.integers(0, len(seq)))]


def _ri(rng: np.random.Generator, lo: int, hi: int) -> int:
    """random integer in [lo, hi] inclusive (like random.randint)."""
    return int(rng.integers(lo, hi + 1))


def _letters(rng, pool: str, k: int) -> str:
    return "".join(pick(rng, pool) for _ in range(k))


def _cap(w: str) -> str:
    return w[:1].upper() + w[1:]


# ---------------------------------------------------------------- person

def sample_user_name(rng) -> str:
    """Stand-in for Faker.user_name(): name/word + separator/digit forms."""
    branch = _ri(rng, 0, 4)
    if branch == 0:
        return pick(rng, FIRST_NAMES) + str(_ri(rng, 10, 99))
    if branch == 1:
        return pick(rng, LAST_NAMES) + str(_ri(rng, 10, 99))
    if branch == 2:
        return f"{pick(rng, FIRST_NAMES)}.{pick(rng, LAST_NAMES)}"
    if branch == 3:
        return f"{pick(rng, FIRST_NAMES)}_{pick(rng, LAST_NAMES)}"
    return pick(rng, FIRST_NAMES)[0] + pick(rng, LAST_NAMES)


def sample_real_name(rng) -> str:
    """Faker.name() analogue: 'First Last', 10% with middle initial."""
    first = _cap(pick(rng, FIRST_NAMES))
    last = _cap(pick(rng, LAST_NAMES))
    if rng.random() < 0.10:
        return f"{first} {pick(rng, UPPER)}. {last}"
    return f"{first} {last}"


def sample_person(rng) -> str:
    """generation.py:51-118 — 50% real names, 50% username patterns."""
    if rng.random() < 0.5:
        return sample_real_name(rng)
    branch = _ri(rng, 0, 21)
    if branch == 0:
        return sample_user_name(rng)
    if branch == 1:
        return pick(rng, FIRST_NAMES) + str(_ri(rng, 100, 999))
    if branch == 2:
        return pick(rng, FILLER_EN) + str(_ri(rng, 10, 99))
    if branch == 3:
        return _letters(rng, LOWER, _ri(rng, 8, 15)) + str(_ri(rng, 1, 999))
    if branch == 4:  # numbers at start
        return str(_ri(rng, 10, 99)) + sample_user_name(rng)
    if branch == 5:  # single letter + 6 digits
        return pick(rng, UPPER) + str(_ri(rng, 100000, 999999))
    if branch == 6:  # single letter + 2 digits
        return pick(rng, UPPER) + str(_ri(rng, 10, 99))
    if branch == 7:
        return _letters(rng, UPPER, 2)
    if branch == 8:
        return _letters(rng, UPPER, 3)
    if branch == 9:
        return _letters(rng, UPPER, 4)
    if branch == 10:
        return f"{pick(rng, FIRST_NAMES)}.{pick(rng, LAST_NAMES)}"
    if branch == 11:
        return f"{pick(rng, FIRST_NAMES)}.{pick(rng, LAST_NAMES)}" + str(_ri(rng, 10, 99))
    if branch == 12:
        return _letters(rng, LOWER, _ri(rng, 12, 18)) + str(_ri(rng, 10, 999))
    if branch == 13:
        return _letters(rng, LOWER, _ri(rng, 15, 20)) + str(_ri(rng, 100000, 999999))
    if branch == 14:  # year at start + username
        return str(_ri(rng, 1950, 2010)) + sample_user_name(rng)
    if branch == 15:
        return (str(_ri(rng, 1950, 2010))
                + f"{pick(rng, FIRST_NAMES)}.{pick(rng, LAST_NAMES)}")
    if branch == 16:
        return _letters(rng, LOWER, _ri(rng, 6, 10)) + str(_ri(rng, 10, 99))
    if branch == 17:
        return _letters(rng, LOWER, _ri(rng, 8, 12)) + str(_ri(rng, 1000, 9999))
    if branch == 18:
        return f"{pick(rng, FIRST_NAMES)}_{pick(rng, LAST_NAMES)}"
    if branch == 19:
        return f"{pick(rng, FIRST_NAMES)}_{pick(rng, LAST_NAMES)}" + str(_ri(rng, 1, 99))
    if branch == 20:
        return pick(rng, FIRST_NAMES)  # bare lowercase first name
    return sample_user_name(rng)


# ---------------------------------------------------------------- org

def sample_org(rng) -> str:
    """Faker.company() analogue — closed grammar over LAST_NAMES."""
    a = _cap(pick(rng, LAST_NAMES))
    b = _cap(pick(rng, LAST_NAMES))
    c = _cap(pick(rng, LAST_NAMES))
    branch = _ri(rng, 0, 3)
    if branch == 0:
        return f"{a} {pick(rng, COMPANY_SUFFIXES)}"
    if branch == 1:
        return f"{a}-{b}"
    if branch == 2:
        return f"{a}, {b} and {c}"
    return f"{a} {b} {pick(rng, COMPANY_SUFFIXES)}"


# ---------------------------------------------------------------- ssn

def sample_ssn(rng) -> str:
    """generation.py:120-153 — 11 ID-number formats."""
    branch = _ri(rng, 0, 10)
    if branch == 0:
        return f"{_ri(rng,100,999)}-{_ri(rng,10,99)}-{_ri(rng,1000,9999)}"
    if branch == 1:
        return str(_ri(rng, 100000000, 999999999))
    if branch == 2:
        return pick(rng, UPPER) + str(_ri(rng, 10000000, 99999999))
    if branch == 3:
        return f"{_ri(rng,1000,9999)}-{_ri(rng,1000,9999)}-{_ri(rng,1000,9999)}"
    if branch == 4:
        return pick(rng, UPPER) + str(_ri(rng, 1000000, 9999999))
    if branch == 5:
        return f"{_ri(rng,100,999)} {_ri(rng,100,999)} {_ri(rng,1000,9999)}"
    if branch == 6:
        return f"{_ri(rng,100,999)}.{_ri(rng,100,999)}.{_ri(rng,1000,9999)}"
    if branch == 7:
        return "0" + str(_ri(rng, 100000000, 999999999))
    if branch == 8:
        return "0" + str(_ri(rng, 10000000, 99999999))
    return (f"{_ri(rng,10,99)}.{_ri(rng,10,99)}.{_ri(rng,10,99)}."
            f"{_ri(rng,10,99)}.{pick(rng, UPPER)}{_ri(rng,10,99)}.{_ri(rng,1,9)}")


# ---------------------------------------------------------------- age

def sample_age(rng) -> str:
    """generation.py:155-178 — 22 age surface forms."""
    a = _ri(rng, 1, 99)
    forms = (
        f"{a}M", f"{a}F", f"M{a}", f"F{a}", f"{a}m", f"{a}f",
        f"({a}M)", f"({a}F)", f"{a} years old", f"{a}yo", str(a),
        f"[{a}M]", f"[{a}F]", f"{a} year old", f"{a}-year-old",
        f"age {a}", f"I'm {a}", f"i'm {a}",
        f"{a}M/{_ri(rng,18,65)}F", f"({a})", f"{a} M", f"{a} F",
    )
    return pick(rng, forms)


# ---------------------------------------------------------------- phone

def _base_phone(rng) -> str:
    return f"{_ri(rng,200,999)}-{_ri(rng,200,999)}-{_ri(rng,1000,9999)}"


def sample_phone(rng) -> str:
    """generation.py:180-234 — base NNN-NNN-NNNN + 25 variation branches."""
    phone = _base_phone(rng)
    branch = _ri(rng, 0, 24)
    if branch == 0:
        return phone
    if branch == 1:
        return phone.replace("-", " ")
    if branch == 2:
        return phone.replace("-", ".")
    if branch == 3:
        return phone.replace("-", "")
    if branch == 4:
        return phone[-8:]
    if branch == 5:
        return phone[-4:]
    if branch == 6:
        return f"xxx-xxx-{phone[-4:]}"
    if branch == 7:
        return f"***-***-{phone[-4:]}"
    if branch == 8:
        return f"ends in {phone[-4:]}"
    if branch == 9:
        return f"call me at {phone}"
    if branch == 10:
        return phone.replace("-", "/")
    if branch == 11:
        return f"+1 {phone}"
    if branch == 12:
        return f"tel: {phone}"
    if branch == 13:
        return f"phone: {phone}"
    if branch == 14:
        return (f"+{_ri(rng,1,999)}{_ri(rng,100,999)}-"
                f"{_ri(rng,100,999)}-{_ri(rng,1000,9999)}")
    if branch == 15:
        return (f"+{_ri(rng,1,99)}-{_ri(rng,100,999)}."
                f"{_ri(rng,100,999)}.{_ri(rng,1000,9999)}")
    if branch == 16:
        return (f"+{_ri(rng,1,99)}-{_ri(rng,100,999)}-"
                f"{_ri(rng,100,999)}.{_ri(rng,1000,9999)}")
    if branch == 17:
        return (f"0{_ri(rng,1000,9999)}.{_ri(rng,100,999)}."
                f"{_ri(rng,100,999)}-{_ri(rng,1000,9999)}")
    if branch == 18:
        return f"+{_ri(rng,10,999)}{_ri(rng,1000,9999)} {_ri(rng,1000,9999)}"
    if branch == 19:
        return f"0{_ri(rng,10,99)} {_ri(rng,1000,9999)}.{_ri(rng,1000,9999)}"
    if branch == 20:
        return f"{_ri(rng,1000,9999)}-{_ri(rng,100,999)}-{_ri(rng,1000,9999)}"
    if branch == 21:
        return (f"+{_ri(rng,1,99)} {_ri(rng,10,99)}-"
                f"{_ri(rng,100,999)} {_ri(rng,1000,9999)}")
    if branch == 22:
        return f"00{_ri(rng,10,99)}-{_ri(rng,1000,9999)}"
    if branch == 23:
        return (f"+{_ri(rng,1,99)} {_ri(rng,100,999)} "
                f"{_ri(rng,100,999)} {_ri(rng,1000,9999)}")
    return phone.replace("(", "").replace(")", "")


# ---------------------------------------------------------------- date

def _ordinal_suffix(d: int) -> str:
    if 10 <= d % 100 <= 20:
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(d % 10, "th")


def sample_date(rng) -> str:
    """generation.py:236-288 — 17 date surface forms."""
    year = _ri(rng, 1950, 2039)
    month = _ri(rng, 1, 12)
    day = _ri(rng, 1, 28)
    mn = MONTH_NAMES[month - 1]
    ms = MONTH_SHORT[month - 1]
    sfx = _ordinal_suffix(day)
    forms = (
        f"{year}-{month:02d}-{day:02d}",
        f"{month:02d}/{day:02d}/{year}",
        f"{day:02d}/{month:02d}/{year}",
        f"{mn} {day}, {year}",
        f"{ms} {day}, {year}",
        str(year),
        f"born in {year}",
        f"{month:02d}/{day:02d}/{year % 100}",
        f"{month}/{day}/{year}",
        f"{day}/{month}/{year}",
        f"{mn} {year}",
        f"birthday: {month}/{day}",
        f"{year}-{month:02d}-{day:02d}T00:00:00",
        f"{mn}/{day}",
        f"{day}{sfx} {mn} {year}",
        f"{mn} {day}{sfx}, {year}",
        f"{ms} {day}{sfx}, {year}",
    )
    return pick(rng, forms)


# ---------------------------------------------------------------- address

def _postcode(rng) -> str:
    if rng.random() < 0.25:
        return f"{_ri(rng,10000,99999)}-{_ri(rng,1000,9999)}"  # ZIP+4
    return f"{_ri(rng,10000,99999)}"


def _street_name(rng) -> str:
    return f"{pick(rng, STREET_FIRST)} {pick(rng, STREET_SUFFIXES)}"


def _street_address(rng) -> str:
    addr = f"{_ri(rng,1,9999)} {_street_name(rng)}"
    if rng.random() < 0.2:
        addr += f", Apt. {_ri(rng,1,999)}"
    return addr


def sample_full_address(rng) -> str:
    state = pick(rng, STATES)
    return (f"{_street_address(rng)}, {pick(rng, CITIES)}, "
            f"{state[1]} {_postcode(rng)}")


def sample_address(rng) -> str:
    """generation.py:290-348 — 80% components, 20% full addresses;
    component pool weighted like the reference's repeated entries."""
    if rng.random() < 0.2:
        return sample_full_address(rng)
    branch = _ri(rng, 0, 29)
    if branch <= 1:   # country codes ×2
        return pick(rng, COUNTRIES)[1]
    if branch == 2:
        return str(_ri(rng, 1, 9999))       # building number
    if branch == 3:
        return str(_ri(rng, 1, 999))
    if branch <= 5:   # state abbrs ×2
        return pick(rng, STATES)[1]
    if branch <= 8:   # street names ×3
        return _street_name(rng)
    if branch <= 12:  # cities ×4
        return pick(rng, CITIES)
    if branch <= 15:  # postcodes ×3
        return _postcode(rng)
    if branch == 16:  # just first part of ZIP+4
        return f"{_ri(rng,10000,99999)}"
    if branch == 17:
        return f"{_postcode(rng)}, {_postcode(rng)}"
    if branch <= 19:  # street addresses ×2
        return _street_address(rng)
    if branch <= 22:  # countries ×3
        return pick(rng, COUNTRIES)[0]
    if branch == 23:
        return pick(rng, STATES)[0]
    if branch == 24:
        return f"Apartment {_ri(rng,1,999)}"
    if branch == 25:
        return f"Suite {_ri(rng,1,999)}"
    if branch == 26:
        return f"Floor {_ri(rng,1,50)}"
    return pick(rng, CITIES)


# ---------------------------------------------------------------- email

def sample_email(rng) -> str:
    """generation.py:350-390 — 70% standard, 30% custom patterns."""
    dom = pick(rng, EMAIL_DOMAINS)
    if rng.random() < 0.7:
        branch = _ri(rng, 0, 3)
        first, last = pick(rng, FIRST_NAMES), pick(rng, LAST_NAMES)
        if branch == 0:
            return f"{first}.{last}@{dom}"
        if branch == 1:
            return f"{first}{_ri(rng,1,99)}@{dom}"
        if branch == 2:
            return f"{first[0]}{last}@{dom}"
        return f"{last}.{first}@{dom}"
    branch = _ri(rng, 0, 8)
    if branch == 0:
        return f"{_letters(rng, UPPER, 2)}@{dom}"
    if branch == 1:
        return f"{_letters(rng, LOWER, 2)}@{dom}"
    if branch == 2:
        return f"{_letters(rng, LOWER, _ri(rng,5,10))}{_ri(rng,1,999):03d}@{dom}"
    if branch == 3:
        return f"{_letters(rng, LOWER, _ri(rng,10,15))}{_ri(rng,100,999)}@{dom}"
    if branch == 4:
        return f"{pick(rng, FIRST_NAMES)}{pick(rng, LAST_NAMES)}@{dom}"
    if branch == 5:
        return f"{pick(rng, FIRST_NAMES)[0]}{pick(rng, LAST_NAMES)}@{dom}"
    if branch == 6:
        return f"{pick(rng, LAST_NAMES)}{_ri(rng,1,99)}@{dom}"
    if branch == 7:
        return f"{pick(rng, FIRST_NAMES)}_{pick(rng, LAST_NAMES)}@{dom}"
    return f"{pick(rng, FIRST_NAMES)}.{pick(rng, LAST_NAMES)}@{dom}"


# ---------------------------------------------------------------- credit card

def luhn_check_digit(digits: str) -> int:
    """Check digit that makes digits+d pass the Luhn checksum."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 0:  # positions that get doubled once check digit appended
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return (10 - total % 10) % 10


def luhn_valid(digits: str) -> bool:
    if not digits.isdigit() or len(digits) < 12:
        return False
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def sample_credit_card(rng) -> str:
    """Faker.credit_card_number analogue: Luhn-valid 13-19 digits
    (mostly 16). Validity matters: the hard-negative 'missing digit'
    card (generation.py:763-768) must FAIL Luhn so the detector can
    reject it."""
    n = pick(rng, (13, 15, 16, 16, 16, 16, 19))
    body = str(_ri(rng, 1, 9)) + "".join(str(_ri(rng, 0, 9)) for _ in range(n - 2))
    return body + str(luhn_check_digit(body))


# ---------------------------------------------------------------- aggregate

def sample_fields(rng) -> dict[str, str]:
    """generation.py:35-49 — one instance of each field per template."""
    return {
        "person": sample_person(rng),
        "org": sample_org(rng),
        "address": sample_address(rng),
        "email": sample_email(rng),
        "phone": sample_phone(rng),
        "ssn": sample_ssn(rng),
        "credit_card": sample_credit_card(rng),
        "date": sample_date(rng),
        "age": sample_age(rng),
    }
