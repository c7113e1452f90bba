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


@settings(max_examples=40, deadline=None)
@given(rows=ROWS)
def test_mad_oracle_vs_bruteforce(rows):
    from tagtree_spark.queries_ext import _ORACLE_REG

    rows = [(t, u, v, d, i) for i, (t, u, v, d) in enumerate(rows)]
    sql = _ORACLE_REG["q324_mad_outliers"]
    got = {r[0]: r for r in _con(rows).execute(sql).fetchall()}
    for t in ("a", "b"):
        svals = sorted(round(r[2] * 1024) for r in rows if r[0] == t)
        if not svals:
            continue
        n = len(svals)
        med = svals[(n + 1) // 2 - 1]
        devs = sorted(abs(s - med) for s in svals)
        mad = devs[(n + 1) // 2 - 1]
        outl = sum(1 for s in svals if abs(s - med) > 3 * mad)
        assert got[t][1:] == (n, med, mad, outl), (t, got[t], (n, med, mad, outl))


@settings(max_examples=40, deadline=None)
@given(rows=ROWS)
def test_theil_sen_oracle_vs_bruteforce(rows):
    from tagtree_spark.queries_ext import _ORACLE_REG

    rows = [(t, u, v, d, i) for i, (t, u, v, d) in enumerate(rows)]
    sql = _ORACLE_REG["q325_theil_sen"]
    got = {r[0]: r for r in _con(rows).execute(sql).fetchall()}
    for t in ("a", "b"):
        daily = {}
        for r in rows:
            if r[0] == t:
                sm, c = daily.get(r[3], (0, 0))
                daily[r[3]] = (sm + round(r[2] * 1024), c + 1)
        days = sorted(daily)
        pairs = []
        for ii in range(len(days)):
            for jj in range(ii + 1, len(days)):
                di, dj = days[ii], days[jj]
                (si, ci), (sj, cj) = daily[di], daily[dj]
                num = sj * ci - si * cj
                den = ci * cj * (dj - di)
                pairs.append((num / den, di, dj, num, den))
        if not pairs:
            assert t not in got
            continue
        pairs.sort(key=lambda p: (p[0], p[1], p[2]))
        sel = pairs[(len(pairs) + 1) // 2 - 1]
        row = got[t]
        # oracle days are absolute epoch days; fixture day 0 = 2024-01-01
        assert (row[1], row[2], row[3], row[4], row[5]) == (
            len(pairs), sel[1] + 19723, sel[2] + 19723, sel[3], sel[4],
        ), (t, row, sel)


@settings(max_examples=30, deadline=None)
@given(rows=ROWS)
def test_t_closeness_oracle_vs_bruteforce(rows):
    from tagtree_spark.queries_ext import _ORACLE_REG

    rows = [(t, u, v, d, i) for i, (t, u, v, d) in enumerate(rows)]
    sql = _ORACLE_REG["q321_t_closeness"]
    got = {r[0]: r for r in _con(rows).execute(sql).fetchall()}
    vals = sorted({r[2] for r in rows})
    n_glob = len(rows)
    m = len(vals)
    for g in range(10):
        gv = [r[2] for r in rows if r[1] % 10 == g]
        cum_g = cum_all = 0
        num = 0
        for v in vals:
            cum_g += sum(1 for x in gv if x == v)
            cum_all += sum(1 for r in rows if r[2] == v)
            num += abs(cum_g * n_glob - cum_all * len(gv))
        row = got[g]
        assert (row[1], row[2], row[3]) == (len(gv), m, num), (g, row, (len(gv), m, num))


@settings(max_examples=30, deadline=None)
@given(rows=ROWS)
def test_gini_oracle_vs_bruteforce(rows):
    from tagtree_spark.queries_ext import _ORACLE_REG

    rows = [(t, u, v, d, i) for i, (t, u, v, d) in enumerate(rows)]
    sql = _ORACLE_REG["q337_gini_concentration"]
    got = {r[0]: r for r in _con(rows).execute(sql).fetchall()}
    for t in ("a", "b"):
        from collections import Counter

        counts = Counter(r[1] for r in rows if r[0] == t)
        if not counts:
            continue
        xs = sorted(counts.values())
        n, tot = len(xs), sum(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        row = got[t]
        assert (row[1], row[2], row[3], row[4]) == (n, tot, num, n * tot), (t, row)


@settings(max_examples=30, deadline=None)
@given(rows=ROWS)
def test_conformal_oracle_vs_bruteforce(rows):
    from tagtree_spark.queries_ext import _ORACLE_REG

    rows = [(t, u, v, d, i) for i, (t, u, v, d) in enumerate(rows)]
    sql = _ORACLE_REG["q335_conformal_coverage"]
    got = {r[0]: r for r in _con(rows).execute(sql).fetchall()}
    for t in ("a", "b"):
        cal = sorted(round(r[2] * 1024) for r in rows if r[0] == t and r[1] % 2 == 0)
        tst = [round(r[2] * 1024) for r in rows if r[0] == t and r[1] % 2 == 1]
        if not cal or not tst:
            assert t not in got
            continue
        n = len(cal)
        med = cal[(n + 1) // 2 - 1]
        scores = sorted(abs(s - med) for s in cal)
        # exact ceil(0.9(n+1)) — the engines do DECIMAL arithmetic, so the
        # reference must not round through a float 0.9
        r_ = min(-(-9 * (n + 1) // 10), n)
        qhat = scores[r_ - 1]
        ncov = sum(1 for s in tst if abs(s - med) <= qhat)
        row = got[t]
        assert (row[1], row[2], row[3], row[4], row[5]) == (
            n, med, qhat, len(tst), ncov,
        ), (t, row)
