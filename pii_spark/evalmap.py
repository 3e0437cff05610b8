"""ai4privacy-style label-space mapping (SURVEY §2 M11).

Mirrors evaluation/model_evaluation.py:93-128 (expanded mapping) and
:184-197 (model-side mapping): foreign labels → our 9 entity types;
unknown labels are dropped. Also the safe replacement for the
reference's ``eval(span_labels)`` (:85 — never eval untrusted text):
spans arrive as a JSON string and malformed rows map to None
(F6 parse-failure path).
"""

from __future__ import annotations

import json

# evaluation/model_evaluation.py:94-128
LABEL_MAPPING = {
    "USERNAME": "PERSON",
    "LASTNAME1": "PERSON",
    "LASTNAME2": "PERSON",
    "LASTNAME3": "PERSON",
    "GIVENNAME1": "PERSON",
    "GIVENNAME2": "PERSON",
    "NAME": "PERSON",
    "EMAIL": "EMAIL",
    "TEL": "PHONE",
    "SOCIALNUMBER": "SSN",
    "STREET": "ADDRESS",
    "CITY": "ADDRESS",
    "STATE": "ADDRESS",
    "POSTCODE": "ADDRESS",
    "BUILDING": "ADDRESS",
    "SECADDRESS": "ADDRESS",
    "COUNTRY": "ADDRESS",
    "DATE": "DATE",
    "BOD": "DATE",
    "COMPANY": "ORG",
}

# evaluation/model_evaluation.py:184-197
MODEL_SIDE_MAPPING = {
    "NAME": "PERSON",
    "PERSON": "PERSON",
    "EMAIL": "EMAIL",
    "PHONE": "PHONE",
    "PHONE_NUMBER": "PHONE",
    "ADDRESS": "ADDRESS",
    "DATE": "DATE",
    "AGE": "AGE",
    "SSN": "SSN",
    "CREDIT_CARD": "CREDIT_CARD",
    "ORGANIZATION": "ORG",
    "ORG": "ORG",
}


def parse_span_labels(span_labels_json: str | None, text: str) -> list[dict] | None:
    """JSON '[[start, end, LABEL], ...]' → mapped span dicts; None on
    parse failure (the reference swallows these, :150-151). Spans with
    out-of-range offsets are dropped (valid-span guard, :141)."""
    if not span_labels_json:
        return None
    try:
        raw = json.loads(span_labels_json)
    except (ValueError, TypeError):
        return None
    if not isinstance(raw, list):
        return None
    out = []
    n = len(text or "")
    for item in raw:
        if not isinstance(item, (list, tuple)) or len(item) < 3:
            continue
        start, end, label = item[0], item[1], item[2]
        mapped = LABEL_MAPPING.get(str(label))
        if mapped is None:
            continue
        if not (isinstance(start, int) and isinstance(end, int)):
            continue
        if not (0 <= start < n and 0 < end <= n):
            continue
        out.append({"start": start, "end": end, "label": mapped})
    return out
