"""Generative property test: resolve_label_matchers over arbitrary small
label universes must agree with an independent Python brute-force model of
the reference's semantics (positives intersect; negatives subtract; series
lacking a negated name survive when positives exist; all-negative form
requires the name present with a non-matching value; regex fully anchored).
"""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from tagtree_spark.tsdb.matchers import LabelMatcher, MatchOp, resolve_label_matchers

NAMES = ("a", "b")
VALUES = ("x", "y", "z")
REGEXES = ("x", "x|y", "[xy]", "z.*", ".")

_T = dt.datetime(2024, 1, 1)

series_st = st.lists(
    st.dictionaries(st.sampled_from(NAMES), st.sampled_from(VALUES), max_size=2),
    min_size=1,
    max_size=6,
)

matcher_st = st.one_of(
    st.builds(
        LabelMatcher,
        st.sampled_from([MatchOp.EQL, MatchOp.NEQ, MatchOp.LSS, MatchOp.GTR, MatchOp.LTE, MatchOp.GTE]),
        st.sampled_from(NAMES),
        st.sampled_from(VALUES),
    ),
    st.builds(
        LabelMatcher,
        st.sampled_from([MatchOp.EQL_REGEX, MatchOp.NEQ_REGEX]),
        st.sampled_from(NAMES),
        st.sampled_from(REGEXES),
    ),
)


def _pos_match(m: LabelMatcher, labels: dict[str, str]) -> bool:
    """The positive form of a matcher against one label set (name must be
    present — absent names never positively match)."""
    v = labels.get(m.name)
    if v is None:
        return False
    if m.op in (MatchOp.EQL, MatchOp.NEQ):
        return v == m.value
    if m.op in (MatchOp.EQL_REGEX, MatchOp.NEQ_REGEX):
        return re.fullmatch(f"(?:{m.value})", v) is not None
    if m.op is MatchOp.LSS:
        return v < m.value
    if m.op is MatchOp.GTR:
        return v > m.value
    if m.op is MatchOp.LTE:
        return v <= m.value
    return v >= m.value


def brute_resolve(series: list[dict[str, str]], matchers: list[LabelMatcher]) -> set[int]:
    positives = [m for m in matchers if m.positive]
    negatives = [m for m in matchers if not m.positive]
    tsids = range(1, len(series) + 1)
    if positives:
        cand = {t for t in tsids if all(_pos_match(m, series[t - 1]) for m in positives)}
    else:
        cand = {t for t in tsids if any(m.name in series[t - 1] for m in negatives)}
    excl = {t for t in tsids if any(_pos_match(m, series[t - 1]) for m in negatives)}
    return cand - excl


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from tagtree_spark.session import get_spark

        _spark = get_spark("matcher-prop", cpus=4)
    return _spark


@settings(max_examples=25, deadline=None)
@given(series_st, st.lists(matcher_st, min_size=1, max_size=3))
def test_resolve_matches_brute_force(series, matchers):
    spark = _get_spark()
    rows = [
        (name, value, tsid, _T, _T)
        for tsid, labels in enumerate(series, start=1)
        for name, value in labels.items()
    ]
    schema = (
        "name string, value string, tsid long, "
        "first_seen timestamp, last_seen timestamp"
    )
    postings = spark.createDataFrame(rows, schema)
    got = {r.tsid for r in resolve_label_matchers(postings, matchers).collect()}
    expect = brute_resolve(series, matchers)
    assert got == expect, (series, matchers)


@given(
    st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), st.integers(1, 40)),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 64),
)
@settings(max_examples=8, deadline=None)
def test_pack_sequences_invariants(rows, budget):
    """Packing invariants for arbitrary shard/token distributions:
    offsets are contiguous per shard, seq ranges are consistent with the
    token counts, and totals are preserved."""
    spark = _get_spark()
    from tagtree_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{j}" for j in range(n)), shard, shard, n)
            for i, (shard, n) in enumerate(rows)
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = pack_sequences(docs, budget=budget).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        expect_off = 0
        for r in rs:
            assert r.start_offset == expect_off
            assert r.begin_seq == r.start_offset // budget
            last_tok = r.start_offset + max(r.n_tokens - 1, 0)
            assert r.end_seq == last_tok // budget
            assert r.begin_seq <= r.end_seq
            expect_off += r.n_tokens


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=12),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=8, deadline=None)
def test_repetition_features_matches_python(word_lists):
    """repetition_features ≡ a pure-Python reference for arbitrary token
    streams (dup fractions, bigram sets, immediate repeats)."""
    spark = _get_spark()
    from tagtree_spark.operators.text import repetition_features

    docs = spark.createDataFrame(
        [(i, " ".join(ws), "en", "s", 0) for i, ws in enumerate(word_lists)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r.doc_id: r for r in repetition_features(docs).collect()}
    for i, ws in enumerate(word_lists):
        grams = [f"{ws[j]} {ws[j+1]}" for j in range(len(ws) - 1)]
        r = out[i]
        assert r.n_tokens == len(ws)
        assert r.n_uniq_tokens == len(set(ws))
        assert r.n_2grams == len(grams)
        assert r.n_uniq_2grams == len(set(grams))
        assert r.n_repeat_pairs == sum(ws[j] == ws[j + 1] for j in range(len(ws) - 1))
        assert r.dup_token_frac == (len(ws) - len(set(ws))) / len(ws)


@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50)),
        min_size=2,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None)
def test_counter_stats_matches_python(rows):
    """counter_stats ≡ a pure-Python reference: per-series ordered deltas,
    positive-delta sum, reset count."""
    import datetime as dt

    spark = _get_spark()
    from tagtree_spark.tsdb.promql import counter_stats

    base = dt.datetime(2024, 1, 1)
    data = [
        (tsid, base + dt.timedelta(minutes=i), float(v))
        for i, (tsid, v) in enumerate(rows)
    ]
    samples = spark.createDataFrame(data, "tsid long, ts timestamp, value double")
    out = {r.tsid: r for r in counter_stats(samples).collect()}
    series: dict = {}
    for tsid, ts, v in data:
        series.setdefault(tsid, []).append((ts, v))
    for tsid, pts in series.items():
        pts.sort()
        vals = [v for _, v in pts]
        deltas = [b - a for a, b in zip(vals, vals[1:])]
        r = out[tsid]
        assert r.n_samples == len(vals)
        assert r.increase == sum(d for d in deltas if d > 0)
        assert r.n_resets == sum(1 for d in deltas if d < 0)
