"""Driver-contract invariants + README count derivation (ADVICE r2:
the documented query counts drifted from queries(); derive them so
they can't)."""

import re
from pathlib import Path

import __spark_entry__ as E


def test_readme_query_counts_derive_from_registry():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q), "oracle without a query"
    readme = Path(__file__).resolve().parents[1] / "README.md"
    m = re.search(
        r"(\d+) driver queries \((\d+) with byte-matching DuckDB oracles\)",
        readme.read_text(),
    )
    assert m, "README query-count sentence missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(q), len(o)), (
        f"README says {m.group(0)!r} but registry has "
        f"{len(q)} queries / {len(o)} oracles — update README.md"
    )


def test_every_query_is_callable():
    for name, fn in E.queries().items():
        assert callable(fn), name


def test_registry_within_driver_cap():
    """The correctness driver records at most 50 queries per round
    (r1: 27/27, r2: 40/40, r3: 50 of 51 registered — synth_corpus got
    no row). Exceeding the cap silently drops coverage; consolidate
    entries instead (VERDICT r3 #1)."""
    assert len(E.queries()) <= 50, (
        f"{len(E.queries())} queries registered but the driver records "
        "at most 50 — consolidate (see q_scale_fast_variants)"
    )
