"""Driver-contract registry invariants (__spark_entry__.py).

The driver's correctness gate checks only a bounded prefix (~50) of
``queries()``, so `_rotated_names()` MUST front every query that has never
had a fully-green driver row — otherwise a registry edit could silently
push a pending query out of the gate window forever (VERDICT r5 item 6).
No Spark session needed; these run on the registry alone.
"""

from __future__ import annotations

import importlib


def _entry():
    import __spark_entry__ as e

    importlib.reload(e)
    return e


def test_never_green_precede_ever_green():
    e = _entry()
    names = e._rotated_names()
    green = e._driver_verified()
    statuses = [n in green for n in names]
    # once we hit the first ever-green name, every later name is ever-green
    if True in statuses:
        first_green = statuses.index(True)
        assert all(statuses[first_green:]), (
            "ever-green query ordered before a never-green one — the gate "
            "window would skip a pending query"
        )


def test_rotation_preserves_registration_order_within_groups():
    from tagtree_spark import queries as _q

    e = _entry()
    names = e._rotated_names()
    green = e._driver_verified()
    reg = list(_q.QUERIES)
    assert [n for n in names if n not in green] == [n for n in reg if n not in green]
    assert [n for n in names if n in green] == [n for n in reg if n in green]


def test_rotation_is_a_permutation_of_the_registry():
    from tagtree_spark import queries as _q

    e = _entry()
    assert sorted(e._rotated_names()) == sorted(_q.QUERIES)
    assert set(e.queries()) == set(_q.QUERIES)


def test_every_query_has_oracle_or_documented_omission():
    """Each queries() entry needs an oracle_sql() entry; genuinely
    non-SQL-expressible ops may omit one but must be rare and known."""
    from tagtree_spark import queries as _q

    missing = [n for n in _q.QUERIES if n not in _q.ORACLE]
    assert missing == [], f"queries without oracle SQL: {missing}"
