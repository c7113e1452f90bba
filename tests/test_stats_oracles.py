"""Triangulate the r10b rank-statistics ORACLES against O(n²) pure-Python
brute force on hypothesis-generated data: parity already proves
Spark ≡ DuckDB; this proves the shared algebra equals the NAIVE
textbook definitions (midranks, pair concordance, tie-corrected H) — a
third independent derivation, no Spark session needed."""

from __future__ import annotations

import datetime as _dt

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def _con(rows):
    df = pd.DataFrame(
        rows, columns=["event_type", "user_id", "value", "day", "event_id"]
    )
    df["ts"] = [
        _dt.datetime(2024, 1, 1) + _dt.timedelta(days=int(d), seconds=int(e))
        for d, e in zip(df["day"], df["event_id"])
    ]
    con = duckdb.connect()
    con.register("events", df[["event_type", "user_id", "value", "ts", "event_id"]])
    return con


def _midranks(xs):
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        mid = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = mid
        i = j + 1
    return ranks


ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=30),
        st.sampled_from([0.25 * k for k in range(12)]),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=8,
    max_size=60,
)


@settings(max_examples=40, deadline=None)
@given(rows=ROWS)
def test_spearman_oracle_vs_bruteforce(rows):
    from tagtree_spark.queries_ext import _q303_oracle

    rows = [(t, u, v, d, i) for i, (t, u, v, d) in enumerate(rows)]
    got = {r[0]: r for r in _con(rows).execute(_q303_oracle()).fetchall()}
    for t in ("a", "b"):
        sub = [r for r in rows if r[0] == t]
        if not sub:
            assert t not in got
            continue
        rx = _midranks([r[2] for r in sub])
        ry = _midranks([r[3] for r in sub])
        n = len(sub)
        mx = sum(rx) / n
        my = sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        dx = sum((a - mx) ** 2 for a in rx)
        dy = sum((b - my) ** 2 for b in ry)
        row = got[t]
        assert row[1] == n
        if dx > 0 and dy > 0:
            rho = num / (dx * dy) ** 0.5
            assert abs(row[5] - rho) < 1e-9, (t, row[5], rho)
        else:
            assert row[5] is None


@settings(max_examples=40, deadline=None)
@given(rows=ROWS)
def test_kendall_oracle_vs_bruteforce(rows):
    from tagtree_spark.queries_ext import _q313_oracle

    rows = [(t, u, v, d, i) for i, (t, u, v, d) in enumerate(rows)]
    got = {r[0]: r for r in _con(rows).execute(_q313_oracle()).fetchall()}
    for t in ("a", "b"):
        sub = [(r[2], r[3]) for r in rows if r[0] == t]
        if not sub:
            continue
        C = D = 0
        for i in range(len(sub)):
            for j in range(i + 1, len(sub)):
                dv = (sub[i][0] > sub[j][0]) - (sub[i][0] < sub[j][0])
                dd = (sub[i][1] > sub[j][1]) - (sub[i][1] < sub[j][1])
                if dv * dd > 0:
                    C += 1
                elif dv * dd < 0:
                    D += 1
        row = got[t]
        assert row[2] == C - D, (t, row[2], C - D)
        assert row[3] == C + D


@settings(max_examples=40, deadline=None)
@given(rows=ROWS)
def test_kruskal_oracle_vs_bruteforce(rows):
    from tagtree_spark.queries_ext import _q301_oracle

    rows = [(t, u, v, d, i) for i, (t, u, v, d) in enumerate(rows)]
    got = {r[0]: r for r in _con(rows).execute(_q301_oracle()).fetchall()}
    for t in ("a", "b"):
        sub = [r for r in rows if r[0] == t]
        if not sub:
            continue
        groups = {g: [] for g in (0, 1, 2)}
        for r in sub:
            groups[r[1] % 3].append(r[2])
        ranks = _midranks([r[2] for r in sub])
        n = len(sub)
        idx = 0
        rsum = {0: 0.0, 1: 0.0, 2: 0.0}
        for r, rk in zip(sub, ranks):
            rsum[r[1] % 3] += rk
            idx += 1
        if any(len(v) == 0 for v in groups.values()):
            # h_adj guarded NULL; blocks still emitted
            if t in got:
                assert got[t][9] is None
            continue
        h = (12.0 / (n * (n + 1))) * sum(
            rsum[g] ** 2 / len(groups[g]) for g in (0, 1, 2)
        ) - 3 * (n + 1)
        from collections import Counter

        ties = Counter([r[2] for r in sub])
        tie_c = sum(c**3 - c for c in ties.values())
        if tie_c < n**3 - n:
            h_adj = h / (1 - tie_c / (n**3 - n))
            assert abs(got[t][9] - h_adj) < 1e-9, (t, got[t][9], h_adj)
        else:
            assert got[t][9] is None
