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
