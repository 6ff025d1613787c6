"""The coverage matrix cannot drift from the driver contract (round-4
verdict #7): every queries() entry has an oracle_sql() entry, and the
count README.md advertises matches the code."""

from __future__ import annotations

import re


def test_queries_and_oracles_align():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(q) == set(o), (set(q) ^ set(o))
    assert len(q) >= 30
    # every callable is actually callable, every oracle a non-empty string
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_readme_count_matches_contract():
    import __spark_entry__ as e

    n = len(e.queries())
    with open("README.md") as f:
        readme = f.read()
    m = re.search(r"driver contract: (\d+) queries, ALL (\d+) with exact "
                  r"DuckDB oracles", readme)
    assert m, "README.md driver-contract line missing or reworded"
    assert int(m.group(1)) == int(m.group(2)) == n, (
        f"README advertises {m.group(1)}/{m.group(2)} driver queries but "
        f"__spark_entry__ has {n} — update the README matrix")
